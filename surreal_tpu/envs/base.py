"""Functional environment API.

Role of the reference's `surreal/env/` layer [SURVEY.md §2]: a uniform env
interface (reset/step, observation spec with modality groups `pixel` /
`low_dim`, action spec) plus `make_env` dispatch. Redesigned TPU-first: an
environment is a pair of PURE functions over an explicit state pytree, so the
whole env batch `vmap`s / `shard_map`s and lives inside the jitted training
program — there are no actor processes.

Conventions (dm_control-compatible):
- Episodes are fixed-length (time-limit truncation); `discount` stays 1.0 at
  the boundary so value bootstrapping is correct.
- `Timestep.done` marks the step AFTER which auto-reset happened; `obs` in
  that timestep is the terminal observation, `state` already holds the reset.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Physics + episode bookkeeping for ONE environment instance."""

    q: jax.Array  # generalized positions (nq,)
    qd: jax.Array  # generalized velocities (nv,)
    t: jax.Array  # steps taken this episode (int32 scalar)
    key: jax.Array  # per-env PRNG key for auto-reset
    info: Any = None  # env-specific extras (e.g. OU-noise state lives elsewhere)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Timestep:
    obs: Mapping[str, jax.Array]  # obs BEFORE auto-reset (terminal obs at `done`) — bootstrap target
    carry_obs: Mapping[str, jax.Array]  # obs of the RETURNED state (post-reset) — next policy input
    reward: jax.Array
    discount: jax.Array  # 0.0 only on true termination; 1.0 on truncation
    done: jax.Array  # bool: episode boundary (either kind)


@dataclasses.dataclass(frozen=True)
class ArraySpec:
    shape: tuple[int, ...]
    dtype: Any
    minimum: float | None = None
    maximum: float | None = None


class Environment:
    """Base class: subclasses implement `_init`, `_physics_step`, `_obs`,
    `_reward`. All methods are pure and trace-safe."""

    episode_steps: int = 1000

    # ---- specs ----
    def obs_spec(self) -> Mapping[str, ArraySpec]:
        raise NotImplementedError

    def action_spec(self) -> ArraySpec:
        raise NotImplementedError

    @property
    def action_dim(self) -> int:
        return self.action_spec().shape[0]

    def obs_dim(self, modality: str = "low_dim") -> int:
        return self.obs_spec()[modality].shape[0]

    # ---- to implement ----
    def _init(self, key: jax.Array) -> tuple[jax.Array, jax.Array]:
        """key -> (q, qd) at episode start (settling included)."""
        raise NotImplementedError

    def _physics_step(
        self, q: jax.Array, qd: jax.Array, action: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """One CONTROL step (internally possibly many physics substeps)."""
        raise NotImplementedError

    def _obs(self, q: jax.Array, qd: jax.Array) -> Mapping[str, jax.Array]:
        raise NotImplementedError

    def _reward(
        self, q: jax.Array, qd: jax.Array, action: jax.Array
    ) -> jax.Array:
        raise NotImplementedError

    # ---- public functional API ----
    def reset(self, key: jax.Array) -> tuple[EnvState, Timestep]:
        init_key, carry_key = jax.random.split(key)
        q, qd = self._init(init_key)
        state = EnvState(q=q, qd=qd, t=jnp.int32(0), key=carry_key)
        obs = self._obs(q, qd)
        ts = Timestep(
            obs=obs,
            carry_obs=obs,
            reward=jnp.zeros((), q.dtype),
            discount=jnp.ones((), q.dtype),
            done=jnp.zeros((), jnp.bool_),
        )
        return state, ts

    def step(self, state: EnvState, action: jax.Array) -> tuple[EnvState, Timestep]:
        """Steps physics; auto-resets when the episode ends (the returned
        Timestep carries the pre-reset terminal obs/reward)."""
        q, qd = self._physics_step(state.q, state.qd, action)
        t = state.t + 1
        # Physics-divergence guard (dm_control raises PhysicsError and ends
        # the episode when state values explode, mjMAXVAL-style; the
        # lockstep equivalent auto-resets just the diverged env). Without
        # this, one env whipping a long undamped chain (swimmer15 under
        # high-entropy exploration, measured r4) NaNs its state, the NaN
        # reaches the shared policy update through obs/reward, and the
        # whole batch dies. Diverged steps score reward 0 and expose the
        # fresh episode's obs (never the garbage state).
        finite = lambda x: jnp.all(jnp.isfinite(x)) & (jnp.max(jnp.abs(x)) < 1e8)
        diverged = ~(finite(q) & finite(qd))
        safe = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)
        q, qd = safe(q), safe(qd)
        reward = self._reward(q, qd, action)
        obs = self._obs(q, qd)
        done = (t >= self.episode_steps) | diverged
        reward = jnp.where(diverged, jnp.zeros_like(reward), reward)
        # Auto-reset: compute fresh state lazily; select by `done`.
        reset_key, carry_key = jax.random.split(state.key)
        q0, qd0 = self._init(reset_key)
        pick = lambda a, b: jnp.where(done, a, b)
        new_state = EnvState(
            q=pick(q0, q),
            qd=pick(qd0, qd),
            t=jnp.where(done, jnp.int32(0), t),
            key=jnp.where(done, carry_key, state.key),
        )
        # Policy input for the NEXT step: the new episode's first obs when
        # auto-reset fired, else the current obs.
        obs0 = self._obs(q0, qd0)
        carry_obs = jax.tree.map(lambda a, b: jnp.where(done, a, b), obs0, obs)
        # a diverged terminal obs is garbage even after NaN-scrubbing:
        # report the fresh obs in its place so value bootstraps stay finite
        obs = jax.tree.map(lambda a, b: jnp.where(diverged, a, b), obs0, obs)
        ts = Timestep(
            obs=obs,
            carry_obs=carry_obs,
            reward=reward,
            discount=jnp.ones((), q.dtype),  # time-limit truncation: bootstrap
            done=done,
        )
        return new_state, ts


def flatten_obs(obs: Mapping[str, jax.Array]) -> jax.Array:
    """Concatenate low-dim obs modalities into one feature vector (sorted
    key order — the role of the reference's obs-concat wrapper). Works for
    batched or unbatched obs; scalar entries are treated as 1-dim."""
    parts = [v for k, v in sorted(obs.items()) if k != "pixel"]
    max_rank = max(p.ndim for p in parts)
    # scalar modalities (e.g. walker 'height') get a trailing feature axis
    parts = [p[..., None] if p.ndim < max_rank else p for p in parts]
    return jnp.concatenate(parts, axis=-1)


def obs_flat_dim(env: "Environment") -> int:
    spec = env.obs_spec()
    total = 0
    for k in sorted(spec.keys()):
        if k == "pixel":
            continue
        shape = spec[k].shape
        total += shape[0] if shape else 1
    return total


def vectorize(env: Environment):
    """Returns (reset_fn, step_fn) over a batch of env instances — vmapped
    for per-instance JAX-native envs; passed through for envs that are
    already batched (host-loop adapters set `batched = True`, and their
    reset takes ONE key for the whole batch).

    This is the TPU replacement for the reference's fleet of actor processes
    (surreal.agent + surreal.env adapters): one lockstep batch under jit.
    """
    if getattr(env, "batched", False):
        return (lambda keys: env.reset(keys[0] if keys.ndim > 1 else keys)), env.step
    reset_fn = jax.vmap(env.reset)
    step_fn = jax.vmap(env.step)
    return reset_fn, step_fn
