"""finger-turn_easy bimodality diagnosis (VERDICT r4 item 4).

turn_easy sits at 582 ± 482 with 0-or-1000 episodes while its HARD sibling
scores 863/922 under the identical recipe — the loudest learning-quality
anomaly. Oracle comparison (dm_control suite/finger.py `Turn`) shows the
two tasks differ ONLY by target radius (easy .07 strictly contains hard
.03), so the env semantics cannot make easy harder; this tool asks what
the zero episodes ARE.

Trains PPO for `DIAG_STEPS` (default 25M) steps, then rolls out eval
episodes recording the signed distance-to-target and reward per step, and
prints per-episode:

  ret          episode return
  init_err°    initial |angle(spinner tip) - angle(target)| in degrees
  init_dist    signed dist at t=0 (negative = born inside the target)
  min_dist     closest approach over the episode
  t_first      first step with reward (-1 = never)
  frac_in      fraction of steps inside the target
  exits        number of leave-target transitions

Interpretation: zero episodes with init_err ~180° and min_dist >> 0 mean
the policy never rotates the spinner far — a "small-correction" policy;
zero episodes with min_dist <= 0 but tiny frac_in mean reach-and-leave
(can't hold); init_dist < 0 rows measure the free-reward-at-birth rate
(analytically ~17% for easy vs ~7% for hard).

Usage: python tools/diag_turn_easy.py [seed ...]   (owns the TPU)
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
from surreal_tpu.envs.finger import _SPINNER_BODY
from surreal_tpu.models.z_filter import zfilter_normalize
from surreal_tpu.train import PPOTrainer

EPISODES = 32
STEPS = int(os.environ.get("DIAG_STEPS", "25000000"))


def traced_eval(trainer, episodes=EPISODES, seed=123):
    policy_fn, params, zf = trainer.deterministic_policy()
    env = trainer.env
    flatten = env_base.flatten_obs
    reset_fn, step_fn = env_base.vectorize(env)
    k_reset, k_run = jax.random.split(jax.random.PRNGKey(seed))

    def dist_of(q):  # signed distance of spinner tip to target surface
        tip_rel, pos, _ = env._spinner_tip(q[:3])
        target_rel = q[5:7] - pos[_SPINNER_BODY]
        return (jnp.linalg.norm(target_rel - tip_rel) - env.target_radius,
                jnp.arctan2(tip_rel[0], tip_rel[1]),
                jnp.arctan2(target_rel[0], target_rel[1]))

    v_dist = jax.vmap(dist_of)

    def run():
        env_state, ts = reset_fn(jax.random.split(k_reset, episodes))
        obs = flatten(ts.obs)
        d0, a_tip0, a_tgt0 = v_dist(env_state.q)

        def step(carry, key_t):
            env_state, obs = carry
            o = zfilter_normalize(zf, obs) if zf is not None else obs
            action = policy_fn(params, o)
            env_state, ts = step_fn(env_state, action)
            d, _, _ = v_dist(env_state.q)
            return (env_state, flatten(ts.carry_obs)), (d, ts.reward)

        keys = jax.random.split(k_run, env.episode_steps)
        _, (dist, rew) = jax.lax.scan(step, (env_state, obs), keys)
        return d0, a_tip0, a_tgt0, dist, rew

    return [np.asarray(x) for x in jax.jit(run)()]


def report(d0, a_tip0, a_tgt0, dist, rew):
    T, E = dist.shape
    err0 = np.degrees(np.abs(np.angle(np.exp(1j * (a_tip0 - a_tgt0)))))
    order = np.argsort(err0)
    print(f"{'ep':>3} {'ret':>6} {'init_err°':>9} {'init_dist':>9} "
          f"{'min_dist':>8} {'t_first':>7} {'frac_in':>7} {'exits':>5}")
    for e in order:
        r, d = rew[:, e], dist[:, e]
        inside = r > 0.5
        t_first = int(np.argmax(inside)) if inside.any() else -1
        exits = int(np.sum(inside[:-1] & ~inside[1:]))
        print(f"{e:>3} {r.sum():>6.0f} {err0[e]:>9.1f} {d0[e]:>9.3f} "
              f"{d.min():>8.3f} {t_first:>7} {inside.mean():>7.3f} {exits:>5}")
    zero = rew.sum(0) < 50
    if zero.any() and (~zero).any():
        print(f"\nzero-episode mean init_err {err0[zero].mean():.1f}° vs "
              f"solved-episode mean {err0[~zero].mean():.1f}°")
    print(f"born-inside rate: {(d0 <= 0).mean():.3f} (analytic ~0.17 easy)")


def main(seeds):
    cfg = PPOConfig(entropy_coef=0.005, lr_max_scale=2.0)
    for seed in seeds:
        print(f"===== finger-turn_easy seed {seed}: train {STEPS:.0e} "
              f"steps =====", flush=True)
        tr = PPOTrainer("finger-turn_easy", cfg, num_envs=128, seed=seed)
        iters = max(1, STEPS // tr.steps_per_iteration)
        tr.run(iters, log_every=max(1, iters // 5))
        ev = tr.evaluate(episodes=EPISODES, seed=123)
        print(f"eval: {ev['return_mean']:.1f} ± {ev['return_std']:.1f}")
        report(*traced_eval(tr))


if __name__ == "__main__":
    main([int(s) for s in sys.argv[1:]] or [0])
