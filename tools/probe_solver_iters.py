"""Solver-sweep-count lever: throughput + learning-stability probe (r5).

Post-Cholesky, the constraint-solver Jacobi sweeps are the top remaining
device-time block (results/profile_cheetah_256_r4.txt:
%multiply_reduce_fusion.45 ×7680). The projected-Jacobi solver runs 20
sweeps everywhere (chosen conservatively at the r2 divergence fix, BEFORE
the 4.4× Cholesky speedup made the sweeps proportionally expensive).
This probe measures on chip, per sweep count: env-steps/s on cheetah-256
and hopper-128, plus learning checks (cheetah 15M eval; hopper-stand 10M
max train return) — the data for VERDICT r4 item 8's verdict: ≥1.3× on
the cheetah headline, or "irreducible at current semantics".

Patches engine._project_jacobi's sweep count (the single solver core all
constraint paths go through — engine.py constraint_project{,_impulses}).

Usage: python tools/probe_solver_iters.py   (owns the TPU)
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
from surreal_tpu.envs.physics import engine
from surreal_tpu.train import PPOTrainer

OUT = os.path.join(os.path.dirname(__file__), "..", "results", "solver_iters_r5.txt")
_orig = engine._project_jacobi


def with_iters(n):
    """Override the sweep count in the Jacobi solver core (all paths)."""
    def patched(m, q, v, M_inv, h, n_iter=20, **kw):
        return _orig(m, q, v, M_inv, h, n_iter=n, **kw)

    engine._project_jacobi = _orig if n is None else patched


def measure(env_name, n_iter, num_envs, train_steps=0, eval_after=False):
    with_iters(n_iter)
    cfg = PPOConfig()
    tr = PPOTrainer(env_name, cfg, num_envs=num_envs, seed=0)
    tr.run(2, log_every=2)  # warmup + compile
    t0 = time.perf_counter()
    tr.run(20, log_every=20)
    sps = 20 * tr.steps_per_iteration / (time.perf_counter() - t0)
    ret = ev = None
    if train_steps:
        iters = int(train_steps // tr.steps_per_iteration)
        logs = tr.run(iters, log_every=max(iters // 5, 1))
        ret = max(m.get("episode_return", 0.0) for m in logs)
        if eval_after:
            ev = tr.evaluate(episodes=32, seed=123)["return_mean"]
    del tr
    with_iters(None)
    return sps, ret, ev


def main():
    out = open(OUT + ".partial", "w")

    def log(msg):
        print(msg, flush=True)
        out.write(msg + "\n")
        out.flush()

    log("# solver sweep-count probe r5 (current engine, f32 assembly)")
    log(f"{'env':>14} {'sweeps':>6} {'sps':>9} {'max_train_ret':>13} {'eval':>7}")
    for n in (20, 12, 8):
        sps, _, _ = measure("cheetah-run", n, 256)
        log(f"{'cheetah-256':>14} {n:>6} {sps:>9.0f} {'':>13} {'':>7}")
    # learning checks at the aggressive end vs baseline
    for env, envs, steps, n in (
        ("cheetah-run", 256, 15_000_000, 10),
        ("cheetah-run", 256, 15_000_000, 20),
    ):
        sps, ret, ev = measure(env, n, envs, train_steps=steps,
                               eval_after=(env == "cheetah-run"))
        log(f"{env+'-'+str(envs):>14} {n:>6} {sps:>9.0f} {ret:>13.1f} "
            f"{(f'{ev:.1f}' if ev is not None else ''):>7}")
    out.close()
    os.replace(OUT + ".partial", OUT)
    print("wrote", os.path.relpath(OUT))


if __name__ == "__main__":
    main()
