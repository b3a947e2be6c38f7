"""Finger-spin contact-model variant sweep: short PPO probes on the chip.

The r3 full run with stiff_dynamic push + cone flatlined at 0.0 (the
fingertip is ejected on contact; no press-and-sweep possible). This probe
trains 8M-step PPO for each (pair_push, pair_cone) variant and reports the
best training return + eval — the selection metric for the default.

Usage: python tools/probe_finger.py [variant ...]   (owns the TPU)
Variants: soft_cone soft_box stiff_cone
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
from surreal_tpu.envs.finger import Finger
from surreal_tpu.envs.physics import engine
from surreal_tpu.train import PPOTrainer

VARIANTS = {
    "soft_cone": dict(pair_push="soft", pair_cone=True),
    "soft_box": dict(pair_push="soft", pair_cone=False),  # exact r2 physics
    "stiff_cone": dict(pair_push="stiff_dynamic", pair_cone=True),
    # r4: impulses through the implicitly-damped metric (M + h·diag(D))⁻¹,
    # MuJoCo's Euler semantics. The matched-state flick probe: oracle peak
    # hinge ω 8.53; stiff_implicit 7.05 (vs 1.58 for soft_cone) with the
    # finger's recoil damped (proximal +1.8 vs +3.0 under M⁻¹) — the
    # candidate that transfers MuJoCo-scale momentum without the r3
    # ejection flatline.
    "soft_implicit": dict(pair_push="soft", pair_cone=True,
                          implicit_impulse=True),
    "stiff_implicit": dict(pair_push="stiff_dynamic", pair_cone=True,
                           implicit_impulse=True),
}


def probe(name, steps=8_000_000):
    env = Finger(task="spin")
    env.model = env.model.replace(**VARIANTS[name])
    env._step_fn = engine.make_stepper(env.model, n_substeps=2, return_impulses=True)
    cfg = PPOConfig(horizon=128, epochs=4, num_minibatches=8,
                    entropy_coef=0.005, lr_max_scale=2)
    tr = PPOTrainer(env, cfg, num_envs=128, seed=0, hidden=(256, 256))
    iters = steps // tr.steps_per_iteration
    t0 = time.perf_counter()
    logs = tr.run(iters, log_every=max(iters // 10, 1))
    best = max(m.get("episode_return", 0.0) for m in logs)
    ev = tr.evaluate(episodes=16, seed=123)
    print(f"{name}: best_train {best:.1f} eval {ev['return_mean']:.1f} "
          f"± {ev['return_std']:.1f} (max {ev['return_max']:.0f}) "
          f"wall {time.perf_counter() - t0:.0f}s", flush=True)
    return best, float(ev["return_mean"])


if __name__ == "__main__":
    for v in (sys.argv[1:] or list(VARIANTS)):
        probe(v)
