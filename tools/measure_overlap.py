"""Fused vs double-buffered-overlap PPO step: on-chip measurement.

Round-2 verdict #9: with publish-staleness semantics in place, measure
whether overlapping rollout(k) with train(k-1) buys throughput — the bet
is at pixel shapes, where the rollout is render/VPU-heavy and the update
is conv/MXU-heavy. Writes results/overlap_r3.txt with a verdict header
(kernels_r2.txt style).

Usage: python tools/measure_overlap.py   (owns the TPU; run alone)
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

OUT = os.path.join(os.path.dirname(__file__), "..", "results", "overlap_r3.txt")
CASES = [
    ("cheetah-state-256", "cheetah-run", False, 256, 30),
    ("cheetah-pixel-128", "cheetah-run", True, 128, 12),
    ("cheetah-pixel-256", "cheetah-run", True, 256, 12),
]


def measure(env_name, pixel, num_envs, iters, overlap):
    cfg = PPOConfig(horizon=128, epochs=4, num_minibatches=8)
    kw = {}
    if pixel:
        kw = dict(pixel_obs=True,
                  pixel_kwargs=dict(frame_stack=3, grayscale=True, action_repeat=4))
    tr = PPOTrainer(env_name, cfg, num_envs=num_envs, seed=0,
                    hidden=(256, 256), overlap=overlap, **kw)
    tr.run(2, log_every=2)  # compile + warmup (+ overlap priming)
    t0 = time.perf_counter()
    tr.run(iters, log_every=iters)
    dt = time.perf_counter() - t0
    return iters * tr.steps_per_iteration / dt


def main():
    lines = [f"# fused vs overlapped PPO step, {time.strftime('%Y-%m-%d')}, "
             f"{jax.default_backend()} {jax.devices()[0].device_kind}",
             f"{'case':20s} {'fused sps':>12s} {'overlap sps':>12s} {'ratio':>7s}"]
    for label, env_name, pixel, n, iters in CASES:
        fused = measure(env_name, pixel, n, iters, overlap=False)
        over = measure(env_name, pixel, n, iters, overlap=True)
        lines.append(f"{label:20s} {fused:12.0f} {over:12.0f} {over / fused:7.2f}")
        print(lines[-1], flush=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", os.path.relpath(OUT))


if __name__ == "__main__":
    main()
