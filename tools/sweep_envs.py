"""Throughput vs num_envs sweep on the real chip (round-2 verdict #10).

Measures steady-state env-steps/s for PPO at num_envs in {128..2048} on
state cheetah, pixel cheetah, and state hopper (contact-rich; showed a
surprising 128->256 env cliff in the r3 queue). Writes a BASELINE.md-ready
table to results/scaling_envs_r4.txt.

Usage: python tools/sweep_envs.py   (owns the TPU; run alone)
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
from surreal_tpu.train import PPOTrainer

OUT = os.path.join(os.path.dirname(__file__), "..", "results", "scaling_envs_r4.txt")
SWEEP = [128, 256, 512, 1024, 2048]
CASES = [
    ("cheetah-state", "cheetah-run", False),
    ("hopper-state", "hopper-stand", False),
    ("cheetah-pixel", "cheetah-run", True),
]


def measure(env_name, pixel, num_envs, iters=20):
    cfg = PPOConfig(horizon=128, epochs=4, num_minibatches=8)
    kw = {}
    if pixel:
        kw = dict(pixel_obs=True,
                  pixel_kwargs=dict(frame_stack=3, grayscale=True, action_repeat=4))
        if num_envs > 512:
            return None  # pixel rollout buffers exceed sane HBM past 512
    tr = PPOTrainer(env_name, cfg, num_envs=num_envs, seed=0, hidden=(256, 256), **kw)
    tr.run(2, log_every=2)  # compile + warmup
    t0 = time.perf_counter()
    logs = tr.run(iters, log_every=iters)
    dt = time.perf_counter() - t0
    sps = iters * tr.steps_per_iteration / dt
    del tr
    return sps


def main():
    lines = [f"# num_envs throughput sweep (horizon 128, PPO 4x8), "
             f"{time.strftime('%Y-%m-%d')}",
             f"# backend: {jax.default_backend()} {jax.devices()[0].device_kind}",
             f"{'case':15s} " + " ".join(f"{n:>9d}" for n in SWEEP)]
    for label, env_name, pixel in CASES:
        row = [f"{label:15s}"]
        for n in SWEEP:
            try:
                sps = measure(env_name, pixel, n)
            except Exception as e:  # record the failure mode, keep sweeping
                print(f"{label} @ {n}: {type(e).__name__}: {e}", flush=True)
                sps = None
            row.append(f"{sps:9.0f}" if sps else f"{'-':>9s}")
            print(f"{label} @ {n}: {row[-1].strip()} env-steps/s", flush=True)
        lines.append(" ".join(row))
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", os.path.relpath(OUT))


if __name__ == "__main__":
    main()
