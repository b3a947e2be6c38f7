"""Z-filter: running mean/std observation normalization.

Role of the reference's `ZFilter` (`surreal/model/z_filter.py`,
SURVEY.md §2): running statistics updated on the learner from incoming
experience and shipped to actors alongside policy parameters. Here the
stats live in the train state (same program as the actors), so "shipping"
is free; updates use the numerically stable parallel Chan et al. merge so
they can be `psum`-combined across data-parallel shards.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZFilterState:
    count: jax.Array  # scalar f32
    mean: jax.Array  # (D,)
    m2: jax.Array  # (D,) sum of squared deviations


def zfilter_init(dim: int, dtype=jnp.float32) -> ZFilterState:
    return ZFilterState(
        count=jnp.asarray(1e-4, dtype),  # small prior avoids div-by-zero
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
    )


def zfilter_update_stats(state: ZFilterState, n, mean_b, m2_b) -> ZFilterState:
    """Chan et al. merge of precomputed batch stats into the running stats."""
    delta = mean_b - state.mean
    tot = state.count + n
    new_mean = state.mean + delta * (n / tot)
    new_m2 = state.m2 + m2_b + delta**2 * state.count * n / tot
    return ZFilterState(count=tot, mean=new_mean, m2=new_m2)


def zfilter_update(state: ZFilterState, batch: jax.Array, axis_name=None) -> ZFilterState:
    """Merge a batch (..., D) into the running stats. With `axis_name`, the
    batch statistics are reduced across the named mesh axis first, so every
    shard applies one identical global update."""
    x = batch.reshape(-1, batch.shape[-1]).astype(state.mean.dtype)
    n = jnp.asarray(x.shape[0], state.count.dtype)
    mean_b = jnp.mean(x, 0)
    if axis_name is not None:
        mean_b = jax.lax.pmean(mean_b, axis_name)
        n = jax.lax.psum(n, axis_name)
    m2_b = jnp.sum((x - mean_b) ** 2, 0)  # about the (global) batch mean
    if axis_name is not None:
        m2_b = jax.lax.psum(m2_b, axis_name)
    return zfilter_update_stats(state, n, mean_b, m2_b)


def zfilter_merge(a: ZFilterState, b: ZFilterState) -> ZFilterState:
    """Merge two independent stat states (for cross-shard reduction)."""
    delta = b.mean - a.mean
    tot = a.count + b.count
    return ZFilterState(
        count=tot,
        mean=a.mean + delta * (b.count / tot),
        m2=a.m2 + b.m2 + delta**2 * a.count * b.count / tot,
    )


def zfilter_std(state: ZFilterState, eps: float = 1e-6) -> jax.Array:
    return jnp.sqrt(state.m2 / jnp.maximum(state.count, 1.0) + eps)


def zfilter_normalize(state: ZFilterState, obs: jax.Array, clip: float = 5.0) -> jax.Array:
    z = (obs - state.mean) / zfilter_std(state)
    return jnp.clip(z, -clip, clip)
