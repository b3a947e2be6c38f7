"""Name the finger-spin ~430 basin from eval traces (VERDICT r4 item 1).

Across recipes (h128/h256, entropy 0.005/0.01) roughly 2 of 3 seeds
converge to eval ~400-440 while the third reaches ~955-965. This tool
trains a short (default 25M-step) PPO run on the chip for given seeds,
then rolls out instrumented eval episodes recording the spinner hinge
velocity qd[2] and reward at every step, and prints per-episode strategy
statistics:

  ret        episode return (sum of {hinge vel <= -15} indicators)
  vel_mean   mean hinge velocity over the episode (spin is NEGATIVE)
  vel_p10/50/90  velocity percentiles
  frac_fast  fraction of steps at/below -15 rad/s (== ret/1000)
  onsets     number of 0->1 reward transitions (burst count)
  streak     longest consecutive-reward run
  touch      mean total fingertip contact force (log1p'd obs scale)

Interpretation key: a "flick" strategy shows many onsets + short streaks +
velocity oscillating through the threshold; a "press-and-drive" strategy
shows 1-3 onsets and a streak ~ episode length; a "slow spin" strategy
shows vel_mean just above -15 with frac_fast ~ 0.4.

Usage: python tools/diag_spin_basin.py [seed ...]   (owns the TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_surreal")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from surreal_tpu.algos.ppo import PPOConfig
from surreal_tpu.envs import base as env_base
from surreal_tpu.models.z_filter import zfilter_normalize
from surreal_tpu.train import PPOTrainer

EPISODES = 16
STEPS = int(float(os.environ.get("DIAG_STEPS", "25_000_000".replace("_", ""))))
# num_minibatches: PPOConfig default 4 = minibatch 4096 (the basin-breaker,
# results/diag_spin_basin_r5.txt); DIAG_MB=8 reproduces the CLI default
# that converges to the ~430 flick basin.
MB = int(os.environ.get("DIAG_MB", "4"))
# Network width: the accidental control that cracked the basin — the r5
# probes showed hidden (256,256) converges to ~430-630 on 2/3 seeds while
# (64,64) solves every seed (926.4 mean). DIAG_HIDDEN=256 traces the
# overparameterized net's strategy.
HIDDEN = int(os.environ.get("DIAG_HIDDEN", "64"))


def traced_eval(trainer, episodes=EPISODES, seed=123):
    """evaluate() with (hinge velocity, reward) recorded per step."""
    policy_fn, params, zf = trainer.deterministic_policy()
    env = trainer.env
    flatten = getattr(trainer, "_flatten", None) or env_base.flatten_obs
    reset_fn, step_fn = env_base.vectorize(env)
    key = jax.random.PRNGKey(seed)
    k_reset, k_run = jax.random.split(key)

    def run():
        env_state, ts = reset_fn(jax.random.split(k_reset, episodes))
        obs = flatten(ts.obs)

        def step(carry, key_t):
            env_state, obs = carry
            o = zfilter_normalize(zf, obs) if zf is not None else obs
            action = policy_fn(params, o)  # deterministic: mean action
            env_state, ts = step_fn(env_state, action)
            touch = ts.obs["touch"].sum(-1)
            out = (env_state.qd[:, 2], ts.reward, touch)
            return (env_state, flatten(ts.carry_obs)), out

        keys = jax.random.split(k_run, env.episode_steps)
        _, (vel, rew, touch) = jax.lax.scan(step, (env_state, obs), keys)
        return vel, rew, touch  # (T, episodes)

    return [np.asarray(x) for x in jax.jit(run)()]


def episode_stats(vel, rew, touch):
    """Per-episode strategy table + a velocity histogram."""
    T, E = vel.shape
    print(f"{'ep':>3} {'ret':>6} {'vel_mean':>9} {'p10':>7} {'p50':>7} "
          f"{'p90':>7} {'frac<=-15':>9} {'onsets':>6} {'streak':>6} {'touch':>6}")
    for e in range(E):
        v, r = vel[:, e], rew[:, e]
        on = np.sum((r[1:] > 0.5) & (r[:-1] < 0.5)) + (r[0] > 0.5)
        # longest consecutive streak of reward
        best = cur = 0
        for x in r:
            cur = cur + 1 if x > 0.5 else 0
            best = max(best, cur)
        print(f"{e:>3} {r.sum():>6.0f} {v.mean():>9.2f} "
              f"{np.percentile(v, 10):>7.2f} {np.percentile(v, 50):>7.2f} "
              f"{np.percentile(v, 90):>7.2f} {(v <= -15).mean():>9.3f} "
              f"{on:>6.0f} {best:>6.0f} {touch[:, e].mean():>6.2f}")
    hist, edges = np.histogram(vel, bins=[-40, -30, -20, -15, -10, -5, 0, 5, 40])
    print("velocity histogram (all episodes):")
    for i in range(len(hist)):
        print(f"  [{edges[i]:>6.1f},{edges[i+1]:>6.1f}): {hist[i]/vel.size:.3f}")


def main(seeds):
    cfg = PPOConfig(entropy_coef=0.005, lr_max_scale=2.0, num_minibatches=MB)
    for seed in seeds:
        print(f"===== finger-spin seed {seed}: train {STEPS:.0e} steps "
              f"(h128, mb{MB}, hidden {HIDDEN}) =====", flush=True)
        tr = PPOTrainer("finger-spin", cfg, num_envs=128, seed=seed,
                        hidden=(HIDDEN, HIDDEN))
        iters = max(1, STEPS // tr.steps_per_iteration)
        tr.run(iters, log_every=max(1, iters // 5))
        ev = tr.evaluate(episodes=EPISODES, seed=123)
        print(f"eval: {ev['return_mean']:.1f} ± {ev['return_std']:.1f}")
        episode_stats(*traced_eval(tr))


if __name__ == "__main__":
    main([int(s) for s in sys.argv[1:]] or [2, 1])
