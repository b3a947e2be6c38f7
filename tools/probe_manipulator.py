"""Manipulator contact-model probe: does the implicit-impulse metric that
fixed finger-spin (results/finger_probe_r4.txt) also help grasping?

bring_ball sits at eval ~0.6 (r3; dm_control's published baselines also
score ~0 there, so this probes for a lift, not a pass/fail). Short PPO
probes per (implicit_impulse, contact_timeconst) variant.

Usage: python tools/probe_manipulator.py [variant ...]   (owns the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_surreal")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from surreal_tpu.algos.ppo import PPOConfig
from surreal_tpu.envs.manipulator import Manipulator
from surreal_tpu.envs.physics import engine
from surreal_tpu.train import PPOTrainer

VARIANTS = {
    "base": {},
    "implicit": dict(implicit_impulse=True),
    "implicit_stiff": dict(implicit_impulse=True, contact_timeconst=0.0025),
}


def probe(name, prop="ball", steps=8_000_000):
    env = Manipulator(prop=prop)
    if VARIANTS[name]:
        env.model = env.model.replace(**VARIANTS[name])
        env._step_fn = engine.make_stepper(
            env.model, n_substeps=env.n_substeps, return_impulses=True)
    cfg = PPOConfig(horizon=128, epochs=4, num_minibatches=8,
                    entropy_coef=0.01, lr_max_scale=2)
    tr = PPOTrainer(env, cfg, num_envs=128, seed=0, hidden=(256, 256))
    iters = steps // tr.steps_per_iteration
    t0 = time.perf_counter()
    logs = tr.run(iters, log_every=max(iters // 10, 1))
    best = max(m.get("episode_return", 0.0) for m in logs)
    ev = tr.evaluate(episodes=32, seed=123)
    print(f"{name}/{prop}: best_train {best:.2f} eval {ev['return_mean']:.2f} "
          f"± {ev['return_std']:.2f} (max {ev['return_max']:.1f}) "
          f"wall {time.perf_counter() - t0:.0f}s", flush=True)
    return float(ev["return_mean"])


if __name__ == "__main__":
    for v in (sys.argv[1:] or list(VARIANTS)):
        probe(v)
