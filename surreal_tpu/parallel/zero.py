"""ZeRO-style sharded optimizer state over the data axis.

SURVEY.md §2D (learner data parallelism): "gradient psum across the data
axis; sharded optimizer state (ZeRO-style via pjit sharding specs)". The
reference has no analog (its learner is one GPU); on TPU the idiomatic
design is: params stay replicated (they're tiny for RL nets and are read
every rollout step), while the Adam moments — pure learner-side state — are
1/K-sharded across the `data` mesh axis (ZeRO stage 1 ≈ half the
optimizer-side HBM at K shards, 15/16 at 16).

Mechanics inside the `shard_map`ed train step: gradients are already
pmean'd (identical on every shard); each shard flattens them, takes its
own 1/K chunk, runs the Adam moment update on that chunk only, and
`all_gather`s the resulting update chunks back into a full update vector.
One extra all_gather of PARAM-sized data per minibatch — rides ICI and is
negligible next to the rollout.

State layout OUTSIDE shard_map: (K, chunk) arrays placed with
PartitionSpec(DATA_AXIS) on the leading axis, so each device materializes
only its (1, chunk) slice; checkpointing via the trainer's full_state
keeps the sharding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class ZeroAdamState(NamedTuple):
    count: jax.Array  # () int32, replicated
    mu: jax.Array  # (K, chunk) first moment, sharded over the data axis
    nu: jax.Array  # (K, chunk) second moment, sharded over the data axis


def _flat_size(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def chunk_size(params, num_shards: int) -> int:
    return -(-_flat_size(params) // num_shards)  # ceil


def scale_by_zero_adam(
    num_shards: int,
    axis_name: str,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-5,
) -> optax.GradientTransformation:
    """Drop-in for `optax.scale_by_adam` whose moments are 1/K-sharded.

    MUST run inside a `shard_map` over `axis_name` with the state's leading
    (K,) axis sharded on that same axis (each shard sees (1, chunk)).
    Gradients must already be identical across shards (pmean'd). The
    returned updates are bit-identical on every shard (all_gather).
    """

    def init(params):
        c = chunk_size(params, num_shards)
        return ZeroAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros((num_shards, c)),
            nu=jnp.zeros((num_shards, c)),
        )

    def update(grads, state, params=None):
        del params
        g, unravel = ravel_pytree(grads)
        c = state.mu.shape[-1]
        shard_id = jax.lax.axis_index(axis_name)
        pad = num_shards * c - g.size
        g_pad = jnp.pad(g, (0, pad))
        my_g = jax.lax.dynamic_slice(g_pad, (shard_id * c,), (c,))

        mu = state.mu[0] * b1 + my_g * (1.0 - b1)
        nu = state.nu[0] * b2 + (my_g * my_g) * (1.0 - b2)
        count = state.count + 1
        mu_hat = mu / (1.0 - b1 ** count.astype(g.dtype))
        nu_hat = nu / (1.0 - b2 ** count.astype(g.dtype))
        my_u = mu_hat / (jnp.sqrt(nu_hat) + eps)

        u = jax.lax.all_gather(my_u, axis_name, tiled=True)[: g.size]
        return unravel(u), ZeroAdamState(
            count=count, mu=mu[None], nu=nu[None]
        )

    return optax.GradientTransformation(init, update)


def zero_state_spec(data_axis: str):
    """PartitionSpec pytree for ZeroAdamState (shard_map in_specs /
    device_put shardings): moments split on the leading K axis."""
    from jax.sharding import PartitionSpec as P

    return ZeroAdamState(count=P(), mu=P(data_axis), nu=P(data_axis))
