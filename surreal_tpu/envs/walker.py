"""Planar Walker domain (JAX-native, dm_control-parity semantics).

Oracle semantics (dm_control 1.0.43 `suite/walker.py`):
- tasks: stand (move_speed=0), walk (1), run (8); control timestep 0.025 s
  over physics dt 0.0025 s (10 substeps) — reproduced exactly.
- init: `randomize_limited_and_rotational_joints` — limited joints
  ~ U(jnt_range), unlimited hinges (rooty) ~ U(-π, π), slides unchanged
  (oracle randomizers.py:35).
- obs: per-body planar orientations (xmat xx, xz) = (cos θ, sin θ),
  torso height, qvel (lines 131-137).
- reward: stand_reward = (3·tolerance(h,(1.2,inf),margin=.6) + upright)/4,
  × (5·tolerance(com_vx,(speed,inf),margin=speed/2,value_at_margin=.5,
  'linear') + 1)/6 for moving tasks (lines 139-159).

Contacts are penalty-based (see physics/engine.py docstring).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "walker.npz")

_STAND_HEIGHT = 1.2
_TORSO_Z = 1.3  # world z of torso frame at q=0 (body_pos of torso)


class Walker(base.Environment):
    episode_steps = 1000  # 25 s / 0.025 s control timestep

    def __init__(self, move_speed: float = 1.0, dtype=jnp.float32):
        self.model = pmodel.load(_ASSET)
        self.move_speed = float(move_speed)
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=10)

    def obs_spec(self):
        return {
            "orientations": base.ArraySpec((14,), self.dtype),
            "height": base.ArraySpec((), self.dtype),
            "velocity": base.ArraySpec((9,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((6,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        m = self.model
        lo = jnp.asarray(m.joint_range[:, 0], self.dtype)
        hi = jnp.asarray(m.joint_range[:, 1], self.dtype)
        limited = jnp.asarray(m.limited)
        is_hinge = jnp.asarray([t == pmodel.HINGE for t in m.dof_type])
        u_lim = jax.random.uniform(key, (m.nv,), self.dtype, minval=lo, maxval=hi)
        u_rot = jax.random.uniform(
            jax.random.fold_in(key, 1), (m.nv,), self.dtype, -jnp.pi, jnp.pi
        )
        q = jnp.where(limited, u_lim, jnp.where(is_hinge, u_rot, 0.0))
        qd = jnp.zeros(m.nv, self.dtype)
        return q, qd

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _obs(self, q, qd):
        _, ang = engine.fk(self.model, q)
        orientations = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1).reshape(-1)
        height = q[0] + _TORSO_Z  # rootz is dof 0 (slide along z)
        return {"orientations": orientations, "height": height, "velocity": qd}

    def _reward(self, q, qd, action):
        _, ang = engine.fk(self.model, q)
        torso_upright = jnp.cos(ang[0])
        height = q[0] + _TORSO_Z
        standing = rewards.tolerance(
            height, bounds=(_STAND_HEIGHT, float("inf")), margin=_STAND_HEIGHT / 2
        )
        upright = (1 + torso_upright) / 2
        stand_reward = (3 * standing + upright) / 4
        if self.move_speed == 0:
            return stand_reward
        com_vx = engine.subtree_com_velocity(self.model, q, qd)[0]
        move = rewards.tolerance(
            com_vx,
            bounds=(self.move_speed, float("inf")),
            margin=self.move_speed / 2,
            value_at_margin=0.5,
            sigmoid="linear",
        )
        return stand_reward * (5 * move + 1) / 6
