"""HBM-resident uniform replay buffer.

Role of the reference's replay server (`surreal/replay/base.py`,
`uniform_replay.py`, `aggregator.py` [SURVEY.md §2, §3.3]): standalone
process with ZMQ ingest / sample threads, ring-buffer uniform sampling,
SSAR + n-step aggregation of raw experience into training batches.

TPU-first redesign: the buffer is a pytree of device arrays laid out
time-major per env — (capacity_t, num_envs, ...) — living in HBM inside the
train step. "Ingest" is a dynamic-slice write of the freshly scanned rollout
chunk (donated, no copies off-device); "sampling" is a gather of random
(time, env) coordinates; the n-step aggregation runs on the gathered window
at sample time, which also deduplicates observations exactly like the
reference's SSAR obs-hash dedup (obs are stored once per step, next-obs is
just the t+n gather).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReplayState:
    """Ring buffer over absolute time steps (per lockstep env batch).

    data: pytree of (capacity_t, B, ...) arrays
    total: scalar int32 — monotonic count of inserted time steps
    """

    data: Any
    total: jax.Array

    @property
    def capacity_t(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[0]

    @property
    def num_envs(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[1]


def replay_init(example_step: Any, capacity_t: int) -> ReplayState:
    """`example_step`: pytree of (B, ...) arrays for ONE time step."""
    data = jax.tree.map(
        lambda x: jnp.zeros((capacity_t,) + x.shape, x.dtype), example_step
    )
    return ReplayState(data=data, total=jnp.asarray(0, jnp.int32))


def replay_insert(state: ReplayState, chunk: Any) -> ReplayState:
    """Insert a (T, B, ...) rollout chunk at the ring cursor. T must be a
    static divisor-friendly size; handles wraparound with two slices."""
    T = jax.tree.leaves(chunk)[0].shape[0]
    cap = state.capacity_t
    cursor = state.total % cap

    def write(buf, x):
        # Split the write at the ring edge (static T, dynamic cursor).
        idx = (cursor + jnp.arange(T)) % cap
        return buf.at[idx].set(x)

    data = jax.tree.map(write, state.data, chunk)
    return ReplayState(data=data, total=state.total + T)


def replay_sampleable(state: ReplayState, window: int = 1) -> jax.Array:
    """Number of valid window START positions (absolute indices)."""
    oldest = jnp.maximum(state.total - state.capacity_t, 0)
    return jnp.maximum(state.total - window + 1 - oldest, 0)


def replay_sample_nstep(
    state: ReplayState, key, batch_size: int, n_step: int = 1
) -> Any:
    """Uniformly sample `batch_size` (time, env) windows of length
    n_step + 1. Returns the gathered pytree with leading axes
    (n_step + 1, batch_size, ...) — window[0] is the transition start,
    window[-1] supplies the bootstrap next-obs.

    Caller must ensure `replay_sampleable(state, n_step+1) > 0`.
    """
    window = n_step + 1
    k_t, k_b = jax.random.split(key)
    oldest = jnp.maximum(state.total - state.capacity_t, 0)
    num_valid = jnp.maximum(state.total - window + 1 - oldest, 1)
    a = oldest + jax.random.randint(k_t, (batch_size,), 0, num_valid)  # abs start
    b = jax.random.randint(k_b, (batch_size,), 0, state.num_envs)
    t_idx = (a[None, :] + jnp.arange(window)[:, None]) % state.capacity_t  # (w, batch)

    def gather(buf):
        return buf[t_idx, b[None, :]]

    return jax.tree.map(gather, state.data)
