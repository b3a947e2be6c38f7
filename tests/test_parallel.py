"""Sharded execution correctness on the 8-device virtual CPU mesh
(SURVEY.md §4: multi-device tests on one host; golden agreement between
sharded and single-device paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.algos import ppo
from surreal_tpu.envs import base as env_base
from surreal_tpu.envs import make_env
from surreal_tpu.models.actor_critic import PPOActorCritic
from surreal_tpu.ops.returns import discounted_reverse_scan
from surreal_tpu.parallel import (
    make_mesh, make_sharded_ppo_step, param_sync_init, param_sync_refresh,
    shard_env_batch, time_sharded_reverse_scan,
)
from surreal_tpu.parallel.dp import replicate
from surreal_tpu.parallel.mesh import TIME_AXIS

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")


def test_time_sharded_scan_matches_full():
    rng = np.random.RandomState(0)
    T, B = 64, 4
    x = jnp.array(rng.randn(T, B).astype(np.float32))
    c = jnp.array(rng.uniform(0.8, 1.0, (T, B)).astype(np.float32))
    mesh = make_mesh(data=1, time=8)
    got = time_sharded_reverse_scan(mesh, x, c)
    want = discounted_reverse_scan(x, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_param_sync_versioned_lag():
    p0 = {"w": jnp.zeros(3)}
    sync = param_sync_init(p0)
    p1 = {"w": jnp.ones(3)}
    # not yet due
    s1 = param_sync_refresh(sync, p1, jnp.asarray(1), publish_every=3)
    assert float(s1.actor_params["w"][0]) == 0.0
    s2 = param_sync_refresh(s1, p1, jnp.asarray(3), publish_every=3)
    assert float(s2.actor_params["w"][0]) == 1.0
    assert int(s2.version) == 3


def test_sharded_ppo_step_runs_and_syncs_params():
    """The sharded train step must keep replicated params identical across
    shards and produce finite metrics."""
    mesh = make_mesh(data=8)
    env = make_env("cartpole-balance")
    cfg = ppo.PPOConfig(horizon=4, epochs=1, num_minibatches=1)
    net = PPOActorCritic(action_dim=env.action_dim, hidden=(16, 16))
    obs_dim = env_base.obs_flat_dim(env)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    state = ppo.init_state(cfg, params, obs_dim)

    B = 16
    reset_fn, step_fn = env_base.vectorize(env)
    env_state, ts0 = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(1), B))
    obs = env_base.flatten_obs(ts0.obs)
    ep_ret = jnp.zeros((B,), jnp.float32)

    state = replicate(mesh, state)
    env_state = shard_env_batch(mesh, env_state)
    obs = shard_env_batch(mesh, obs)
    ep_ret = shard_env_batch(mesh, ep_ret)

    step = make_sharded_ppo_step(cfg, net.apply, step_fn, env_base.flatten_obs, mesh)
    state2, env_state, obs, ep_ret, metrics = step(
        state, env_state, obs, ep_ret, jax.random.PRNGKey(2)
    )
    m = jax.device_get(metrics)
    assert all(np.isfinite(v) for v in jax.tree.leaves(m))
    # params changed and are fully replicated (single value per device OK)
    w2 = state2.params["params"]["mean_head"]["kernel"]
    assert w2.sharding.is_fully_replicated
    # and a second step composes
    state3, *_ = step(state2, env_state, obs, ep_ret, jax.random.PRNGKey(3))
    assert int(state3.update_step) == 2


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
