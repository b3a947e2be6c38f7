"""Hopper domain (JAX-native, dm_control-parity semantics).

Oracle source (dm_control 1.0.43 `suite/hopper.py`):
- stand: reward = tolerance(height, (0.6, 2)) × (small_control+4)/5
- hop:   reward = tolerance(height, (0.6, 2)) × tolerance(speed, (2, inf),
         margin 1, value_at_margin 0.5, 'linear')
- height = torso COM z − foot COM z; speed = subtree COM x-velocity.
- obs: qpos[1:], qvel, touch = log1p(toe/heel touch sensors).
- init: randomize_limited_and_rotational_joints; control dt 0.02 over
  physics dt 0.005 (4 substeps).

Touch synthesis: the oracle's touch sensors read contact normal force at
the toe/heel sites (== the foot capsule endpoints). We estimate the
quasi-static normal force of those contact points from the solver's own
constraint law, F ≈ m_eff · depth / tc² (zero when separated) — same
scale as the PGS impulses at rest.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "hopper.npz")

_STAND_HEIGHT = 0.6
_HOP_SPEED = 2.0


class Hopper(base.Environment):
    episode_steps = 1000  # 20 s / 0.02 s control timestep

    def __init__(self, hopping: bool = False, dtype=jnp.float32):
        self.model = pmodel.load(_ASSET)
        self.hopping = hopping
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=4)
        # torso body index 0, foot body index 4 (torso,pelvis,thigh,calf,foot)
        self._torso, self._foot = 0, 4
        # toe/heel contact-candidate indices: foot capsule endpoints
        cb = np.asarray(self.model.con_body)
        foot_pts = np.where(cb == self._foot)[0]
        # toe = larger local x, heel = smaller
        xs = self.model.con_pos[foot_pts, 0]
        self._toe = int(foot_pts[np.argmax(xs)])
        self._heel = int(foot_pts[np.argmin(xs)])

    def obs_spec(self):
        return {
            "position": base.ArraySpec((6,), self.dtype),
            "velocity": base.ArraySpec((7,), self.dtype),
            "touch": base.ArraySpec((2,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((4,), self.dtype, -1.0, 1.0)

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
        return q, jnp.zeros((m.nv,), self.dtype)

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _touch(self, q, qd):
        m = self.model
        J, depth = engine._contact_kinematics(m, q)
        M_inv = jnp.linalg.inv(engine.mass_matrix(m, q))
        Jn = J[:, 1, :]
        w = jnp.maximum(jnp.einsum("cv,vu,cu->c", Jn, M_inv, Jn), 1e-9)
        force = jnp.maximum(depth, 0.0) / (w * m.contact_timeconst**2)
        return jnp.log1p(jnp.stack([force[self._toe], force[self._heel]]))

    def _obs(self, q, qd):
        return {"position": q[1:], "velocity": qd, "touch": self._touch(q, qd)}

    def _height(self, q):
        coms = engine.com_positions(self.model, q)
        return coms[self._torso, 1] - coms[self._foot, 1]

    def _reward(self, q, qd, action):
        standing = rewards.tolerance(self._height(q), (_STAND_HEIGHT, 2.0))
        if self.hopping:
            speed = engine.subtree_com_velocity(self.model, q, qd)[0]
            hopping = rewards.tolerance(
                speed, bounds=(_HOP_SPEED, float("inf")), margin=_HOP_SPEED / 2,
                value_at_margin=0.5, sigmoid="linear",
            )
            return standing * hopping
        ctrl = jnp.clip(action, -1.0, 1.0)
        small_control = jnp.mean(
            rewards.tolerance(ctrl, margin=1, value_at_margin=0, sigmoid="quadratic")
        )
        return standing * (small_control + 4.0) / 5.0
