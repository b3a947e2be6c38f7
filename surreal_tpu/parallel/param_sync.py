"""Versioned parameter snapshots (actor-side staleness control).

Role of the reference's parameter server / publisher
(`surreal/distributed/ps/`, SURVEY.md §2): the learner publishes a
versioned ModuleDict every K updates; actors pull the latest and may run
several updates behind. Fused on-device training has ZERO staleness by
default (actors ARE the learner's params), which changes off-policyness
relative to Surreal. This component restores the reference's semantics
when wanted: the rollout uses a SNAPSHOT refreshed every `publish_every`
updates, emulating the pub-sub lag (useful for hyperparameter parity
studies and for async-ish pipelined execution)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParamSyncState:
    actor_params: Any  # snapshot used by rollouts
    version: jax.Array  # learner update step at snapshot time


def param_sync_init(params) -> ParamSyncState:
    return ParamSyncState(
        actor_params=jax.tree.map(jnp.copy, params), version=jnp.asarray(0, jnp.int32)
    )


def param_sync_refresh(
    sync: ParamSyncState, learner_params, learner_step, publish_every: int = 1
) -> ParamSyncState:
    """Adopt learner params when `publish_every` updates have elapsed since
    the snapshot version (trace-safe `where` select)."""
    do = (learner_step - sync.version) >= publish_every
    new_params = jax.tree.map(
        lambda snap, live: jnp.where(do, live, snap), sync.actor_params, learner_params
    )
    return ParamSyncState(
        actor_params=new_params,
        version=jnp.where(do, learner_step, sync.version),
    )
