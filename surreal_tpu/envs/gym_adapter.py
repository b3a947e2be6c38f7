"""Gym / Gymnasium adapter (host-loop environments).

Role of the reference's Gym adapter (`surreal/env/` make_env "gym:..."
dispatch, SURVEY.md §2): wraps a batch of gymnasium environments behind the
same functional reset/step surface via `jax.experimental.io_callback`, so
the SAME trainers run unchanged.

Honesty note (BASELINE.md): host-loop envs are the reference's architecture,
not this framework's — on the axon TPU topology a host↔device round trip
costs ~0.7 s per step, so gym envs are for CPU-backend use, debugging, and
API parity, NOT the TPU fast path. dm_control domains should use the
JAX-native envs.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs import base


class GymEnv:
    """Batched adapter over gymnasium envs. `batched=True`: the trainers
    call reset/step with batch-leading arrays directly (no vmap)."""

    batched = True

    def __init__(self, env_id: str, num_envs: int, seed: int = 0,
                 episode_steps: int | None = None, **gym_kwargs):
        import gymnasium as gym

        self._envs = gym.vector.SyncVectorEnv(
            [lambda: gym.make(env_id, **gym_kwargs) for _ in range(num_envs)]
        )
        self.num_envs = num_envs
        self._seed = seed
        space = self._envs.single_action_space
        obs_space = self._envs.single_observation_space
        assert len(space.shape) == 1 and len(obs_space.shape) == 1, "flat spaces only"
        self._action_dim = space.shape[0]
        self._obs_dim = obs_space.shape[0]
        self._lo = np.asarray(space.low, np.float32)
        self._hi = np.asarray(space.high, np.float32)
        spec = getattr(self._envs.envs[0], "spec", None)
        self.episode_steps = episode_steps or (
            spec.max_episode_steps if spec and spec.max_episode_steps else 1000
        )

    # ---- specs ----
    def obs_spec(self) -> Mapping[str, base.ArraySpec]:
        return {"observations": base.ArraySpec((self._obs_dim,), jnp.float32)}

    def action_spec(self) -> base.ArraySpec:
        return base.ArraySpec((self._action_dim,), jnp.float32, -1.0, 1.0)

    @property
    def action_dim(self) -> int:
        return self._action_dim

    # ---- host callbacks ----
    def _host_reset(self, _):
        obs, _ = self._envs.reset(seed=self._seed)
        return obs.astype(np.float32)

    def _host_step(self, action):
        a = self._lo + (np.asarray(action) * 0.5 + 0.5) * (self._hi - self._lo)
        obs, reward, terminated, truncated, info = self._envs.step(a)
        done = np.logical_or(terminated, truncated)
        # gymnasium vector envs auto-reset; final obs is in info
        term_obs = obs.copy()
        if "final_observation" in info:
            for i, fo in enumerate(info["final_observation"]):
                if fo is not None:
                    term_obs[i] = fo
        return (
            obs.astype(np.float32),
            term_obs.astype(np.float32),
            reward.astype(np.float32),
            (1.0 - terminated.astype(np.float32)),
            done,
        )

    # ---- functional surface (batched) ----
    def reset(self, key):
        from jax.experimental import io_callback

        B = self.num_envs
        obs = io_callback(
            self._host_reset, jax.ShapeDtypeStruct((B, self._obs_dim), jnp.float32),
            key, ordered=True,
        )
        state = base.EnvState(
            q=jnp.zeros((B, 0)), qd=jnp.zeros((B, 0)),
            t=jnp.zeros((B,), jnp.int32), key=jnp.zeros((B, 2), jnp.uint32),
        )
        o = {"observations": obs}
        ts = base.Timestep(
            obs=o, carry_obs=o, reward=jnp.zeros((B,)),
            discount=jnp.ones((B,)), done=jnp.zeros((B,), jnp.bool_),
        )
        return state, ts

    def step(self, state, action):
        from jax.experimental import io_callback

        B = self.num_envs
        shapes = (
            jax.ShapeDtypeStruct((B, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((B, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.bool_),
        )
        obs, term_obs, reward, discount, done = io_callback(
            self._host_step, shapes, action, ordered=True
        )
        ts = base.Timestep(
            obs={"observations": term_obs},
            carry_obs={"observations": obs},
            reward=reward, discount=discount, done=done,
        )
        return state, ts
