"""Solver-sweep-count lever: throughput + learning-stability probe.

The num_envs sweep showed throughput is bound by the per-step physics
chain; the projected-Jacobi solver runs 20 sweeps everywhere (chosen
conservatively when the r2 divergence was fixed). This probe measures,
on chip, env-steps/s AND a short hopper-stand learning check at 10/14/20
sweeps — the datapoint that tells round 4 whether halving sweeps is free
throughput or a stability trap.

Usage: python tools/probe_solver_iters.py   (owns the TPU)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_surreal")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from surreal_tpu.algos.ppo import PPOConfig
from surreal_tpu.envs.physics import engine
from surreal_tpu.train import PPOTrainer

OUT = os.path.join(os.path.dirname(__file__), "..", "results", "solver_iters_r3.txt")
_orig = engine._project_jacobi


def with_iters(n):
    engine.constraint_project = (
        lambda m, q, v, M_inv, h, n_iter=10, solver="jacobi":
        _orig(m, q, v, M_inv, h, n_iter=n)
    )
    engine.constraint_project_impulses = (
        lambda m, q, v, M_inv, h, n_iter=20:
        _orig(m, q, v, M_inv, h, n_iter=n, return_impulses=True)
    )


def measure(env_name, n_iter, train_iters=0):
    with_iters(n_iter)
    cfg = PPOConfig(horizon=128, epochs=4, num_minibatches=8)
    tr = PPOTrainer(env_name, cfg, num_envs=256, seed=0, hidden=(256, 256))
    tr.run(2, log_every=2)
    t0 = time.perf_counter()
    tr.run(20, log_every=20)
    sps = 20 * tr.steps_per_iteration / (time.perf_counter() - t0)
    ret = None
    if train_iters:
        logs = tr.run(train_iters, log_every=max(train_iters // 5, 1))
        ret = max(m.get("episode_return", 0.0) for m in logs)
    del tr
    return sps, ret


def main():
    lines = [f"# solver Jacobi sweep-count probe, {time.strftime('%Y-%m-%d')}, "
             f"{jax.default_backend()}",
             f"{'env':15s} {'sweeps':>7s} {'sps':>9s} {'best_ret':>9s}"]
    for env_name, train_iters in [("cheetah-run", 0), ("hopper-stand", 300)]:
        for n in (20, 14, 10):
            sps, ret = measure(env_name, n, train_iters)
            lines.append(f"{env_name:15s} {n:7d} {sps:9.0f} "
                         f"{ret if ret is not None else float('nan'):9.1f}")
            print(lines[-1], flush=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", os.path.relpath(OUT))


if __name__ == "__main__":
    main()
