"""Swimmer domain (JAX-native, dm_control-parity semantics).

Oracle source (dm_control 1.0.43 `suite/swimmer.py`): procedurally
generated n-link planar swimmer in the horizontal (x-y) plane, propelled
purely by quadratic fluid drag (model option density=3000 — MuJoCo's
inertia-box fluid model, reproduced exactly by `engine.fluid_forces`).

- model (`suite/swimmer.xml` + `_make_model`): head with 3 free planar root
  dofs + (n−1) hinge joints limited to ±360°/n with soft limits
  (solreflimit .05); motors gear 5e-4; physics dt 0.002, control dt 0.03
  (15 substeps); 30 s episodes → 1000 control steps.
- init (`Swimmer.initialize_episode`, swimmer.py:174-190): limited joints
  ~U(range), root orientation ~U(−π, π), root slides 0; target position
  ~U(−.3, .3)² with probability .2 else ~U(−2, 2)².
- obs (`Swimmer.get_observation`, swimmer.py:196-201): joints = qpos[3:],
  to_target = (target − nose) in head frame (`Physics.nose_to_target`,
  swimmer.py:139-145), body_velocities = per-body local (vx, vy, ωz) from
  the velocimeter+gyro site sensors (`Physics.body_velocities`,
  swimmer.py:149-153; sites sit at each body's frame origin).
- reward (`Swimmer.get_reward`, swimmer.py:203-208):
  tolerance(‖nose→target‖, (0, target_size=.1), margin=5·target_size,
  sigmoid='long_tail').

The per-episode target is appended to `q` as two frozen coordinates so the
standard auto-reset machinery regenerates it (reacher.py pattern).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")

_TARGET_SIZE = 0.1  # suite/swimmer.xml: target sphere size ".1"
_NOSE = (0.0, -0.06)  # head-local nose geom pos (swimmer.xml "0 -.06 0")


class Swimmer(base.Environment):
    episode_steps = 1000  # 30 s / 0.03 s

    def __init__(self, n_links: int = 6, dtype=jnp.float32):
        self.model = pmodel.load(os.path.join(_ASSETS, f"swimmer{n_links}.npz"))
        assert self.model.plane == "xy" and self.model.has_fluid
        self.n_links = n_links
        self.dtype = dtype
        self._nv = self.model.nv
        # control dt 0.03 / physics dt 0.002
        self._step_fn = engine.make_stepper(self.model, n_substeps=15)

    def obs_spec(self):
        nv = self._nv
        return {
            "joints": base.ArraySpec((nv - 3,), self.dtype),
            "to_target": base.ArraySpec((2,), self.dtype),
            "body_velocities": base.ArraySpec((3 * self.model.nb,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((self.model.nu,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        m = self.model
        k_rot, k_joints, k_close, k_target = jax.random.split(key, 4)
        rootz = jax.random.uniform(k_rot, (), self.dtype, -jnp.pi, jnp.pi)
        lo = jnp.asarray(m.joint_range[3:, 0], self.dtype)
        hi = jnp.asarray(m.joint_range[3:, 1], self.dtype)
        joints = jax.random.uniform(k_joints, (self._nv - 3,), self.dtype) * (
            hi - lo
        ) + lo
        close = jax.random.bernoulli(k_close, 0.2)
        box = jnp.where(close, 0.3, 2.0).astype(self.dtype)
        target = jax.random.uniform(k_target, (2,), self.dtype, -1.0, 1.0) * box
        q = jnp.concatenate(
            [jnp.zeros((2,), self.dtype), rootz[None], joints, target]
        )
        qd = jnp.zeros((self._nv + 2,), self.dtype)
        return q, qd

    def _physics_step(self, q, qd, action):
        nv = self._nv
        q2, qd2 = self._step_fn(q[:nv], qd[:nv], action)
        return (
            jnp.concatenate([q2, q[nv:]]),
            jnp.concatenate([qd2, qd[nv:]]),
        )

    def _to_target(self, q):
        """(target − nose) in the head frame (MuJoCo body-frame components;
        the engine's world→body map is `_rot(−ang, ·)`)."""
        nv = self._nv
        pos, ang = engine.fk(self.model, q[:nv])
        nose = pos[0] + engine._rot(ang[0], jnp.asarray(_NOSE, q.dtype))
        return engine._rot(-ang[0], q[nv:] - nose)

    def _obs(self, q, qd):
        nv = self._nv
        # site sensors: per-body local (vx, vy) of the frame origin + ωz.
        # Engine angle is the NEGATED MuJoCo planar angle (xy-plane
        # canonicalization), so ωz = −ȧ.
        (pos, ang), (pos_dot, ang_dot) = jax.jvp(
            lambda qq: engine.fk(self.model, qq), (q[:nv],), (qd[:nv],)
        )
        v_local = engine._rot(-ang, pos_dot)  # (nb, 2)
        body_vel = jnp.concatenate([v_local, -ang_dot[:, None]], -1).reshape(-1)
        return {
            "joints": q[3:nv],
            "to_target": self._to_target(q),
            "body_velocities": body_vel,
        }

    def _reward(self, q, qd, action):
        dist = jnp.linalg.norm(self._to_target(q))
        return rewards.tolerance(
            dist,
            (0.0, _TARGET_SIZE),
            margin=5 * _TARGET_SIZE,
            sigmoid="long_tail",
        )
