"""Time-sharded scans: long-horizon return computation across devices.

Role analog (SURVEY.md §2D "TimeShardedScan"): the reference has no
sequence parallelism (its longest sequence is an LSTM chunk on one GPU).
The RL-equivalent need is GAE / discounted-return computation over very
long horizons; here the TIME axis itself shards over a mesh axis and
block-summary carries are exchanged between shards — the RL analog of
context-parallel / ring-attention decomposition, but for a linear
recurrence (exact, one round of communication).

The recurrence y_t = x_t + c_t * y_{t+1} decomposes per block b as
    y_t = local_t + P_t * carry_b     (P_t = prod of c over [t, block end])
    carry_b = y at first element of block b+1 (0 for the last block).
Block summaries (A_b = P at block start, B_b = local at block start) are
all-gathered (tiny: 2 scalars per batch element per shard) and each shard
computes its own carry by folding the blocks behind it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from surreal_tpu.ops.returns import discounted_reverse_scan
from surreal_tpu.parallel.mesh import TIME_AXIS


def _local_block(x, c):
    """Returns (local scan, suffix products) for one block."""
    local = discounted_reverse_scan(x, c)
    # suffix product P_t = prod c[t:] : reverse scan with x=0? Use log-free
    # associative scan on multiplication.
    P = jax.lax.associative_scan(jnp.multiply, c, reverse=True, axis=0)
    return local, P


def replicated_reverse_scan(x, c, axis_name: str = TIME_AXIS):
    """Per-device form of the time-sharded scan, for use INSIDE an existing
    `shard_map` whose mesh carries `axis_name` (the product trainers' path:
    the data axis shards envs, the time axis splits the GAE scan).

    x, c: (T, ...) arrays REPLICATED along `axis_name` (each time-shard
    holds the full horizon, as produced by the sequential rollout). Each
    shard scans its own T/K block, exchanges the 2-scalar block summaries,
    and the full (T, ...) result is re-gathered — identical on every shard.
    Exact (same linear-recurrence decomposition as
    `time_sharded_reverse_scan`; golden-tested against the local scan).
    """
    K = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    T = x.shape[0]
    assert T % K == 0, f"horizon {T} not divisible by time axis {K}"
    blk = T // K
    x_blk = jax.lax.dynamic_slice_in_dim(x, my * blk, blk, 0)
    c_blk = jax.lax.dynamic_slice_in_dim(c, my * blk, blk, 0)
    local, Pfx = _local_block(x_blk, c_blk)
    A_all = jax.lax.all_gather(Pfx[0], axis_name)  # (K, ...)
    B_all = jax.lax.all_gather(local[0], axis_name)

    def fold(b, carry):
        i = K - 1 - b  # fold from the last block backwards
        use = i > my  # only blocks strictly after mine contribute
        return jnp.where(use, B_all[i] + A_all[i] * carry, carry)

    carry = jax.lax.fori_loop(0, K, fold, jnp.zeros_like(local[0]))
    y_blk = local + Pfx * carry
    y_all = jax.lax.all_gather(y_blk, axis_name)  # (K, blk, ...)
    return y_all.reshape((T,) + x.shape[1:])


def time_sharded_reverse_scan(mesh: Mesh, x, c, axis_name: str = TIME_AXIS):
    """Compute y_t = x_t + c_t y_{t+1} with the T axis sharded over
    `axis_name`. x, c: (T, ...) global arrays (sharded on axis 0)."""

    def kernel(x_blk, c_blk):
        n_blocks = jax.lax.axis_size(axis_name)
        my = jax.lax.axis_index(axis_name)
        local, Pfx = _local_block(x_blk, c_blk)
        # Block summaries at the block's FIRST element.
        A = Pfx[0]  # prod over whole block
        B = local[0]
        A_all = jax.lax.all_gather(A, axis_name)  # (n_blocks, ...)
        B_all = jax.lax.all_gather(B, axis_name)

        # carry for block b = y at first element of block b+1
        # = B_{b+1} + A_{b+1} * carry_{b+1};  carry_{n-1} = 0.
        def fold(b, carry):
            blk = n_blocks - 1 - b  # fold from last block backwards
            use = blk > my  # only blocks strictly after mine contribute
            new = B_all[blk] + A_all[blk] * carry
            return jnp.where(use, new, carry)

        carry = jax.lax.fori_loop(0, n_blocks, fold, jnp.zeros_like(B))
        return local + Pfx * carry

    return shard_map(
        kernel, mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name), check_rep=False,
    )(x, c)
