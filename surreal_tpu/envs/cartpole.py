"""Cartpole domain (JAX-native, dm_control-parity).

Task semantics follow dm_control 1.0.43 `suite/cartpole.py`:
- balance / balance_sparse: near-upright init (slider U(-.1,.1), other qpos
  U(-.034,.034), qvel 0.01·N(0,1)); dense reward = upright · small_control ·
  small_velocity · centered (lines 204-221 of the oracle source).
- swingup / swingup_sparse: pole starts hanging down (π + .01·N(0,1)).
- two_poles / three_poles (`_make_model`, cartpole.py:83-104): chained pole
  bodies; the task is Balance(swing_up=True) with the reward generalized as
  upright.mean() over WORLD pole angles (xmat-based `pole_angle_cosine`,
  cartpole.py:141-143) and small_velocity = min over qvel[1:]; swingup init
  sets hinge_1 = π + .01·N and the remaining hinges to .1·N(0,1).
Physics: RK4 at dt=0.01, contacts disabled (matches the compiled MjModel).
Pole world angles are exact prefix sums of the hinge coordinates (all body
frames unrotated, hinge axes +y in the baked chain).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


class Cartpole(base.Environment):
    episode_steps = 1000  # 10 s / 0.01 s control timestep

    def __init__(self, swing_up: bool = False, sparse: bool = False,
                 n_poles: int = 1, dtype=jnp.float32):
        name = "cartpole.npz" if n_poles == 1 else f"cartpole_{n_poles}.npz"
        self.model = pmodel.load(os.path.join(_ASSETS, name))
        self.swing_up = swing_up
        self.sparse = sparse
        self.n_poles = n_poles
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=1)

    def obs_spec(self):
        return {
            "position": base.ArraySpec((1 + 2 * self.n_poles,), self.dtype),
            "velocity": base.ArraySpec((1 + self.n_poles,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((1,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        n = self.n_poles
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if self.swing_up:
            x = 0.01 * jax.random.normal(k1, (), self.dtype)
            theta = jnp.pi + 0.01 * jax.random.normal(k2, (), self.dtype)
            rest = 0.1 * jax.random.normal(k4, (n - 1,), self.dtype)
        else:
            x = jax.random.uniform(k1, (), self.dtype, -0.1, 0.1)
            theta = jax.random.uniform(k2, (), self.dtype, -0.034, 0.034)
            rest = jax.random.uniform(k4, (n - 1,), self.dtype, -0.034, 0.034)
        q = jnp.concatenate([jnp.stack([x, theta]), rest])
        qd = 0.01 * jax.random.normal(k3, (1 + n,), self.dtype)
        return q, qd

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _world_angles(self, q):
        """World rotation of each pole body: exact hinge prefix sums."""
        return jnp.cumsum(q[1:])

    def _obs(self, q, qd):
        phi = self._world_angles(q)
        # oracle bounded_position: cart x + per-pole (xmat zz, xz) pairs
        pairs = jnp.stack([jnp.cos(phi), jnp.sin(phi)], -1).reshape(-1)
        return {
            "position": jnp.concatenate([q[:1], pairs]),
            "velocity": qd,
        }

    def _reward(self, q, qd, action):
        x = q[0]
        cos_phi = jnp.cos(self._world_angles(q))
        ctrl = jnp.clip(action, -1.0, 1.0)
        if self.sparse:
            cart_in_bounds = rewards.tolerance(x, (-0.25, 0.25))
            angle_in_bounds = jnp.prod(rewards.tolerance(cos_phi, (0.995, 1.0)))
            return cart_in_bounds * angle_in_bounds
        upright = jnp.mean((cos_phi + 1) / 2)
        centered = (1 + rewards.tolerance(x, margin=2)) / 2
        small_control = (
            4 + rewards.tolerance(ctrl[0], margin=1, value_at_margin=0, sigmoid="quadratic")
        ) / 5
        small_velocity = (
            1 + jnp.min(rewards.tolerance(qd[1:], margin=5))
        ) / 2
        return upright * small_control * small_velocity * centered
