"""Data-parallel sharding of the fused PPO/DDPG train steps.

Role of the reference's scale-out machinery (actor fleet + sharded
parameter server + replay shards, SURVEY.md §2D): the env batch shards
along the `data` mesh axis via `shard_map`; params/optimizer state are
replicated (psum'd gradients keep them in lockstep — the ICI replacement
for ZMQ parameter broadcast); per-shard replay buffers are device-local
(actors hash-route in the reference; here locality is free).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surreal_tpu.algos import ppo
from surreal_tpu.parallel.mesh import DATA_AXIS


def shard_env_batch(mesh: Mesh, tree):
    """Place a (B, ...)-leading pytree with B sharded over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def train_state_spec(state):
    """PartitionSpec pytree for a train state: everything replicated EXCEPT
    ZeRO optimizer moments, which shard their leading (K,) axis over the
    data axis (SURVEY.md §2D sharded optimizer state)."""
    from surreal_tpu.parallel.zero import ZeroAdamState, zero_state_spec

    def spec(node):
        if isinstance(node, ZeroAdamState):
            return zero_state_spec(DATA_AXIS)
        return jax.tree.map(lambda _: P(), node)

    return jax.tree.map(spec, state, is_leaf=lambda x: isinstance(x, ZeroAdamState))


def place_by_spec(mesh: Mesh, tree, spec_tree):
    """device_put each leaf with its NamedSharding from the spec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec_tree
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_ddpg_step(
    cfg,
    actor_apply: Callable,
    critic_apply: Callable,
    env_step: Callable,
    flatten_obs: Callable,
    mesh: Mesh,
    state_spec=None,  # pytree of PartitionSpecs for the train state (ZeRO)
):
    """Data-parallel DDPG train step. The replay ring buffer is sharded
    with the envs (device-LOCAL insert and sampling — the reference's
    sharded replay servers with hash routing, minus the routing); gradients
    pmean across shards keep learner params replicated."""
    from surreal_tpu.algos import ddpg

    def step(state, replay, env_state, obs, ou_state, sigma, ep_ret, key):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, shard_id)
        out = ddpg.train_step(
            cfg, actor_apply, critic_apply, env_step, flatten_obs,
            state, replay, env_state, obs, ou_state, sigma, ep_ret, key,
            axis_name=DATA_AXIS,
        )
        state, replay, env_state, obs, ou_state, ep_ret, metrics = out
        metrics = {
            k: (jax.lax.psum(v, DATA_AXIS) if k in ("episodes_done", "episode_return_sum")
                else jax.lax.pmean(v, DATA_AXIS))
            for k, v in metrics.items()
        }
        return state, replay, env_state, obs, ou_state, ep_ret, metrics

    def build(replay_example):
        # replay arrays are (T_cap, B, ...): shard on axis 1 (the env axis)
        from surreal_tpu.data.replay import ReplayState

        data_spec = jax.tree.map(lambda _: P(None, DATA_AXIS), replay_example.data)
        rspec = ReplayState(data=data_spec, total=P())
        sspec = P() if state_spec is None else state_spec
        sharded = shard_map(
            step,
            mesh=mesh,
            in_specs=(sspec, rspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(sspec, rspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            check_rep=False,
        )
        return jax.jit(sharded, donate_argnums=(1, 2, 3, 4, 6))

    return build


def make_sharded_ppo_lstm_step(
    cfg: ppo.PPOConfig,
    apply_fn: Callable,
    env_step: Callable,
    flatten_obs: Callable,
    mesh: Mesh,
    state_spec=None,  # pytree of PartitionSpecs for the train state (ZeRO)
):
    """LSTM-PPO variant of `make_sharded_ppo_step`: the recurrent carry is
    sharded with the env batch (each shard owns its envs' hidden state)."""
    from surreal_tpu.algos import ppo_lstm

    def step(state, env_state, obs, carry, ep_ret, key):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, shard_id)
        state, env_state, obs, carry, ep_ret, metrics = ppo_lstm.train_step(
            cfg, apply_fn, env_step, flatten_obs,
            state, env_state, obs, carry, ep_ret, key, axis_name=DATA_AXIS,
        )
        metrics = {
            k: (jax.lax.psum(v, DATA_AXIS) if k in ("episodes_done", "episode_return_sum")
                else jax.lax.pmean(v, DATA_AXIS))
            for k, v in metrics.items()
        }
        return state, env_state, obs, carry, ep_ret, metrics

    sspec = P() if state_spec is None else state_spec
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(sspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(sspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(1, 2, 3, 4))


def make_sharded_ppo_overlap_step(
    cfg: ppo.PPOConfig,
    apply_fn: Callable,
    env_step: Callable,
    flatten_obs: Callable,
    mesh: Mesh,
    state_spec=None,
):
    """Sharded double-buffered variant (ppo.train_step_overlapped): the
    pending trajectory shards with the env batch on its B axis (axis 1 of
    the time-major arrays). Returns (train_step, prime_rollout)."""

    def step(state, env_state, obs, ep_ret, pending, key):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, shard_id)
        state, env_state, obs, ep_ret, traj, metrics = ppo.train_step_overlapped(
            cfg, apply_fn, env_step, flatten_obs,
            state, env_state, obs, ep_ret, pending, key, axis_name=DATA_AXIS,
        )
        metrics = {
            k: (jax.lax.psum(v, DATA_AXIS) if k in ("episodes_done", "episode_return_sum")
                else jax.lax.pmean(v, DATA_AXIS))
            for k, v in metrics.items()
        }
        return state, env_state, obs, ep_ret, traj, metrics

    def prime(state, env_state, obs, ep_ret, key):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, shard_id)
        traj, env_state, obs, ep_ret, _ = ppo.rollout(
            cfg, apply_fn, env_step, flatten_obs, state, env_state, obs, ep_ret, key
        )
        return traj, env_state, obs, ep_ret

    sspec = P() if state_spec is None else state_spec
    tspec = P(None, DATA_AXIS)
    d = P(DATA_AXIS)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(sspec, d, d, d, tspec, P()),
        out_specs=(sspec, d, d, d, tspec, P()),
        check_rep=False,
    )
    primer = shard_map(
        prime, mesh=mesh,
        in_specs=(sspec, d, d, d, P()),
        out_specs=(tspec, d, d, d),
        check_rep=False,
    )
    return (
        jax.jit(sharded, donate_argnums=(1, 2, 3, 4)),
        jax.jit(primer, donate_argnums=(1, 2, 3)),
    )


def make_sharded_ppo_step(
    cfg: ppo.PPOConfig,
    apply_fn: Callable,
    env_step: Callable,
    flatten_obs: Callable,
    mesh: Mesh,
    state_spec=None,  # pytree of PartitionSpecs for the train state (ZeRO)
):
    """Returns a jitted train step running `shard_map`ed over the data axis.

    Inputs: train state replicated (except ZeRO moment chunks — pass
    `state_spec=train_state_spec(state)` when cfg.zero_optimizer);
    (env_state, obs, ep_ret) sharded on their leading env-batch axis; key
    replicated (folded per-shard so each shard rolls out distinct
    randomness). Outputs mirror inputs; metrics are pmean'd (identical on
    every shard).
    """

    def step(state, env_state, obs, ep_ret, key):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, shard_id)
        state, env_state, obs, ep_ret, metrics = ppo.train_step(
            cfg, apply_fn, env_step, flatten_obs,
            state, env_state, obs, ep_ret, key, axis_name=DATA_AXIS,
        )
        # Scalar metrics: make identical across shards so out_specs=P() is valid.
        metrics = {
            k: (jax.lax.psum(v, DATA_AXIS) if k in ("episodes_done", "episode_return_sum")
                else jax.lax.pmean(v, DATA_AXIS))
            for k, v in metrics.items()
        }
        return state, env_state, obs, ep_ret, metrics

    sspec = P() if state_spec is None else state_spec
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(sspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(sspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(1, 2, 3))
