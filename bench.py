"""Headline benchmark: PPO env-steps/s per chip on dm_control Cheetah-Run.

BASELINE config 2 (BASELINE.md): PPO + GAE, 256 vectorized envs, 1 chip.
The reference denominator is the measured CPU Surreal-style actor loop
(dm_control cheetah + torch MLP policy, 1 thread): ~4,800 env-steps/s;
the north-star target is >= 10x (>= 48k env-steps/s per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever backend JAX selects (the driver runs it on the real TPU).
"""

import json
import os
import sys
import time

CPU_REFERENCE_STEPS_PER_S = 4800.0  # measured, see BASELINE.md

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 256))
HORIZON = int(os.environ.get("BENCH_HORIZON", 128))
WARMUP_ITERS = int(os.environ.get("BENCH_WARMUP_ITERS", 2))
TIMED_ITERS = int(os.environ.get("BENCH_ITERS", 30))


def main():
    import jax

    # Persist compiled executables across runs. NOTE (measured, round 2):
    # on the axon remote-compile path a persistent-cache HIT does not reduce
    # wall time (~115 s to load/compile the fused step either way), so the
    # real timeout fix vs round 1 (BENCH_r01 rc=124) is the smaller
    # warmup/iteration budget below: total cold run ~160 s.
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from surreal_tpu.algos.ppo import PPOConfig
    from surreal_tpu.train import PPOTrainer

    import jax.numpy as jnp

    cfg = PPOConfig(horizon=HORIZON, epochs=4, num_minibatches=8, lr=3e-4)
    # BENCH_DTYPE=bfloat16 runs the network compute in bf16 (MXU-native;
    # params/GAE stay f32) — an experiment knob, f32 is the default.
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "float32"))
    trainer = PPOTrainer(
        "cheetah-run", cfg, num_envs=NUM_ENVS, seed=0, hidden=(256, 256),
        compute_dtype=dtype,
    )

    # Warmup (compile) then timed steady-state iterations.
    trainer.run(WARMUP_ITERS, log_every=WARMUP_ITERS)
    jax.block_until_ready(trainer.obs)
    t0 = time.perf_counter()
    trainer.run(TIMED_ITERS, log_every=TIMED_ITERS)
    jax.block_until_ready(trainer.obs)
    dt = time.perf_counter() - t0

    steps = TIMED_ITERS * trainer.steps_per_iteration
    sps = steps / dt
    result = {
        "metric": "ppo_cheetah_env_steps_per_s_per_chip",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / CPU_REFERENCE_STEPS_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
