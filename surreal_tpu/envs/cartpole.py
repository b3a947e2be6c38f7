"""Cartpole domain (JAX-native, dm_control-parity).

Task semantics follow dm_control 1.0.43 `suite/cartpole.py`:
- balance / balance_sparse: near-upright init (slider U(-.1,.1), other qpos
  U(-.034,.034), qvel 0.01·N(0,1)); dense reward = upright · small_control ·
  small_velocity · centered (lines 204-221 of the oracle source).
- swingup / swingup_sparse: pole starts hanging down (π + .01·N(0,1)).
Physics: RK4 at dt=0.01, contacts disabled (matches the compiled MjModel).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "cartpole.npz")


class Cartpole(base.Environment):
    episode_steps = 1000  # 10 s / 0.01 s control timestep

    def __init__(self, swing_up: bool = False, sparse: bool = False, dtype=jnp.float32):
        self.model = pmodel.load(_ASSET)
        self.swing_up = swing_up
        self.sparse = sparse
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=1)

    def obs_spec(self):
        return {
            "position": base.ArraySpec((3,), self.dtype),
            "velocity": base.ArraySpec((2,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((1,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        if self.swing_up:
            x = 0.01 * jax.random.normal(k1, (), self.dtype)
            theta = jnp.pi + 0.01 * jax.random.normal(k2, (), self.dtype)
        else:
            x = jax.random.uniform(k1, (), self.dtype, -0.1, 0.1)
            theta = jax.random.uniform(k2, (), self.dtype, -0.034, 0.034)
        q = jnp.stack([x, theta])
        qd = 0.01 * jax.random.normal(k3, (2,), self.dtype)
        return q, qd

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _obs(self, q, qd):
        x, theta = q[0], q[1]
        return {
            "position": jnp.stack([x, jnp.cos(theta), jnp.sin(theta)]),
            "velocity": qd,
        }

    def _reward(self, q, qd, action):
        x, theta = q[0], q[1]
        ctrl = jnp.clip(action, -1.0, 1.0)
        if self.sparse:
            cart_in_bounds = rewards.tolerance(x, (-0.25, 0.25))
            angle_in_bounds = rewards.tolerance(jnp.cos(theta), (0.995, 1.0))
            return cart_in_bounds * angle_in_bounds
        upright = (jnp.cos(theta) + 1) / 2
        centered = (1 + rewards.tolerance(x, margin=2)) / 2
        small_control = (
            4 + rewards.tolerance(ctrl[0], margin=1, value_at_margin=0, sigmoid="quadratic")
        ) / 5
        small_velocity = (1 + rewards.tolerance(qd[1], margin=5)) / 2
        return upright * small_control * small_velocity * centered
