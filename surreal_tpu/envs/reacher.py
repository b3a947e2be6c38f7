"""Reacher domain (JAX-native, dm_control-parity semantics).

Oracle source (dm_control 1.0.43 `suite/reacher.py`): two-link arm in the
HORIZONTAL (x-y) plane — the manipulation-style task family. easy/hard
differ by target size (.05 / .015).
- init: shoulder ~U(-π,π) (unlimited), wrist ~U(range); target at angle
  ~U(0,2π), radius ~U(.05,.2).
- obs: position=qpos, to_target = target−finger (2-D), velocity=qvel.
- reward: tolerance(‖to_target‖, (0, target_size + finger_size)) — sparse
  indicator.

The per-episode target is appended to `q` as two frozen coordinates so the
standard auto-reset machinery regenerates it (the physics step strips and
re-attaches them).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "reacher.npz")

_FINGER_SIZE = 0.01
_FINGER_BODY = 2  # arm(0) -> hand(1) -> finger(2, jointless/welded)


class Reacher(base.Environment):
    episode_steps = 1000  # 20 s / 0.02 s

    def __init__(self, target_size: float = 0.05, dtype=jnp.float32):
        self.model = pmodel.load(_ASSET)
        assert self.model.plane == "xy"
        self.target_size = float(target_size)
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=1)

    def obs_spec(self):
        return {
            "position": base.ArraySpec((2,), self.dtype),
            "to_target": base.ArraySpec((2,), self.dtype),
            "velocity": base.ArraySpec((2,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((2,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        m = self.model
        shoulder = jax.random.uniform(k1, (), self.dtype, -jnp.pi, jnp.pi)
        lo, hi = m.joint_range[1]
        wrist = jax.random.uniform(k2, (), self.dtype, lo, hi)
        angle = jax.random.uniform(k3, (), self.dtype, 0.0, 2 * jnp.pi)
        radius = jax.random.uniform(k4, (), self.dtype, 0.05, 0.20)
        # oracle: target x = r sin(angle), y = r cos(angle)
        target = jnp.stack([radius * jnp.sin(angle), radius * jnp.cos(angle)])
        q = jnp.concatenate([jnp.stack([shoulder, wrist]), target])
        qd = jnp.zeros((4,), self.dtype)  # target "velocities" stay zero
        return q, qd

    def _physics_step(self, q, qd, action):
        q_phys, target = q[:2], q[2:]
        q2, qd2 = self._step_fn(q_phys, qd[:2], action)
        return jnp.concatenate([q2, target]), jnp.concatenate([qd2, qd[2:]])

    def _finger(self, q_phys):
        pos, _ = engine.fk(self.model, q_phys)
        return pos[_FINGER_BODY]

    def _obs(self, q, qd):
        q_phys, target = q[:2], q[2:]
        return {
            "position": q_phys,
            "to_target": target - self._finger(q_phys),
            "velocity": qd[:2],
        }

    def _reward(self, q, qd, action):
        q_phys, target = q[:2], q[2:]
        dist = jnp.linalg.norm(target - self._finger(q_phys))
        return rewards.tolerance(dist, (0.0, self.target_size + _FINGER_SIZE))
