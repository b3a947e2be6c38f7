"""Sharded execution correctness on the 8-device virtual CPU mesh
(SURVEY.md §4: multi-device tests on one host; golden agreement between
sharded and single-device paths)."""

import dataclasses

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


def _cartpole_ppo_setup(B, cfg):
    env = make_env("cartpole-balance")
    net = PPOActorCritic(action_dim=env.action_dim, hidden=(16, 16))
    obs_dim = env_base.obs_flat_dim(env)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    state = ppo.init_state(cfg, params, obs_dim)
    reset_fn, step_fn = env_base.vectorize(env)
    env_state, ts0 = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(1), B))
    obs = env_base.flatten_obs(ts0.obs)
    ep_ret = jnp.zeros((B,), jnp.float32)
    return env, net, step_fn, state, env_state, obs, ep_ret


def test_sharded_ppo_step_golden_vs_vmap():
    """GOLDEN: the 8-shard shard_map train step must tolerance-match a
    single-device vmap-with-axis_name reference running the IDENTICAL
    per-shard program (same fold_in keys, same pmean semantics) — the
    sharded-vs-single agreement test SURVEY.md §4 requires."""
    from surreal_tpu.parallel.mesh import DATA_AXIS

    S, per = 8, 2
    B = S * per
    cfg = ppo.PPOConfig(horizon=6, epochs=2, num_minibatches=1)
    env, net, step_fn, state, env_state, obs, ep_ret = _cartpole_ppo_setup(B, cfg)

    # --- sharded path (the product path: PPOTrainer(mesh=...)) ---
    mesh = make_mesh(data=S)
    sh_state = replicate(mesh, state)
    sh = make_sharded_ppo_step(cfg, net.apply, step_fn, env_base.flatten_obs, mesh)
    sh_env, sh_obs, sh_ret = (shard_env_batch(mesh, x) for x in (env_state, obs, ep_ret))
    for i in range(2):
        sh_state, sh_env, sh_obs, sh_ret, sh_metrics = sh(
            sh_state, sh_env, sh_obs, sh_ret, jax.random.PRNGKey(10 + i)
        )

    # --- reference: vmap over an explicit shard axis with the same
    # axis_name (pmean/psum over vmap axes are exact collectives) ---
    def ref_step(state, env_state, obs, ep_ret, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        state, env_state, obs, ep_ret, metrics = ppo.train_step(
            cfg, net.apply, step_fn, env_base.flatten_obs,
            state, env_state, obs, ep_ret, key, axis_name=DATA_AXIS,
        )
        metrics = {
            k: (jax.lax.psum(v, DATA_AXIS) if k in ("episodes_done", "episode_return_sum")
                else jax.lax.pmean(v, DATA_AXIS))
            for k, v in metrics.items()
        }
        return state, env_state, obs, ep_ret, metrics

    vstep = jax.jit(jax.vmap(ref_step, in_axes=(0, 0, 0, 0, None), axis_name=DATA_AXIS))
    to_shards = lambda t: jax.tree.map(lambda x: x.reshape((S, per) + x.shape[1:]), t)
    r_state = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape), state)
    r_env, r_obs, r_ret = map(to_shards, (env_state, obs, ep_ret))
    for i in range(2):
        r_state, r_env, r_obs, r_ret, r_metrics = vstep(
            r_state, r_env, r_obs, r_ret, jax.random.PRNGKey(10 + i)
        )

    # params (and the whole train state) agree across implementations
    ref0 = jax.tree.map(lambda x: np.asarray(x[0]), r_state)
    got = jax.device_get(sh_state)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref0), strict=True):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=1e-6)
    for k in sh_metrics:
        np.testing.assert_allclose(
            float(sh_metrics[k]), float(r_metrics[k][0]), rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k}",
        )
    # and the env-side carry agrees (physics is deterministic given keys)
    np.testing.assert_allclose(
        np.asarray(sh_obs), np.asarray(r_obs).reshape(B, -1), rtol=1e-5, atol=1e-6
    )


def test_sharded_lstm_ppo_step_runs():
    from surreal_tpu.parallel import make_sharded_ppo_lstm_step

    mesh = make_mesh(data=8)
    B = 16
    cfg = ppo.PPOConfig(horizon=4, epochs=1, num_minibatches=1)
    env = make_env("cartpole-balance")
    net = PPOActorCritic(action_dim=env.action_dim, hidden=(16, 16),
                         use_lstm=True, lstm_size=8)
    obs_dim = env_base.obs_flat_dim(env)
    reset_fn, step_fn = env_base.vectorize(env)
    env_state, ts0 = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(1), B))
    obs = env_base.flatten_obs(ts0.obs)
    carry = net.initial_carry((B,))
    params = net.init(jax.random.PRNGKey(0), obs[:1], jax.tree.map(lambda c: c[:1], carry))
    state = ppo.init_state(cfg, params, obs_dim)
    ep_ret = jnp.zeros((B,), jnp.float32)

    state = replicate(mesh, state)
    env_state, obs, carry, ep_ret = (
        shard_env_batch(mesh, x) for x in (env_state, obs, carry, ep_ret)
    )
    step = make_sharded_ppo_lstm_step(cfg, net.apply, step_fn, env_base.flatten_obs, mesh)
    state, env_state, obs, carry, ep_ret, metrics = step(
        state, env_state, obs, carry, ep_ret, jax.random.PRNGKey(2)
    )
    assert all(np.isfinite(v) for v in jax.tree.leaves(jax.device_get(metrics)))
    assert int(state.update_step) == 1


def test_ppo_trainer_with_mesh():
    """The trainer-level product path: PPOTrainer(mesh=...) — what the CLI
    builds for --session.mesh.data N."""
    from surreal_tpu.train import PPOTrainer

    mesh = make_mesh(data=8)
    cfg = ppo.PPOConfig(horizon=4, epochs=1, num_minibatches=1)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=16, seed=0,
                    hidden=(16, 16), mesh=mesh)
    logs = tr.run(2, log_every=1)
    assert all(np.isfinite(v) for m in logs for v in m.values() if isinstance(v, float))
    assert int(tr.state.update_step) == 2
    ev = tr.evaluate(episodes=2)
    assert np.isfinite(ev["return_mean"])


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_zero_optimizer_matches_replicated_adam():
    """GOLDEN (SURVEY.md §2D sharded optimizer state): ZeRO-sharded Adam
    (moments 1/8 per shard, update chunks all_gather'ed) reproduces the
    replicated Adam trajectory, and the moments really are sharded."""
    from surreal_tpu.train import PPOTrainer

    mesh = make_mesh(data=8)
    cfg = ppo.PPOConfig(horizon=6, epochs=2, num_minibatches=1, use_zfilter=False)
    cfg_z = dataclasses.replace(cfg, zero_optimizer=True)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=16, seed=0,
                    hidden=(16, 16), mesh=mesh)
    trz = PPOTrainer("cartpole-balance", cfg_z, num_envs=16, seed=0,
                     hidden=(16, 16), mesh=mesh)
    tr.run(2, log_every=2)
    trz.run(2, log_every=2)
    a = jax.tree.leaves(tr.state.params)
    b = jax.tree.leaves(trz.state.params)
    for x, y in zip(a, b, strict=True):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-5, atol=1e-7)
    # moments are (8, chunk) with the leading axis split across devices
    from surreal_tpu.parallel.zero import ZeroAdamState

    zstates = [s for s in jax.tree.leaves(
        trz.state.opt_state, is_leaf=lambda x: isinstance(x, ZeroAdamState)
    ) if isinstance(s, ZeroAdamState)]
    assert len(zstates) == 1
    mu = zstates[0].mu
    assert mu.shape[0] == 8
    assert len(mu.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in mu.addressable_shards}
    assert shard_shapes == {(1, mu.shape[1])}
