"""Finger domain: spin / turn_easy / turn_hard (JAX-native, dm_control parity).

Oracle source (dm_control 1.0.43 `suite/finger.py`, `finger.xml`): a 2-dof
planar finger (gravity disabled) interacts with a hinge-mounted spinner via
body-body contact (fingertip/proximal capsules vs the spinner's two
capsules); the spinner hinge has dry friction (frictionloss 0.1).

- physics dt 0.01, control dt 0.02 (2 substeps); episode 20 s = 1000 steps.
- init: proximal/distal ~ U(joint range), hinge ~ U(-π, π),
  rejection-sampled collision-free (oracle loops until ncon == 0).
- obs: position = (proximal, distal, tip − spinner (2,)), velocity = qvel
  (3,), touch = log1p(force) at the touchtop/touchbottom sites — computed
  from the solver's contact impulses on the fingertip pairs, split by which
  side of the fingertip the contact point lies on.
- spin: hinge damping lowered to 0.03 (oracle does this in
  `Spin.initialize_episode`); reward = 1 if hinge velocity ≤ −15 rad/s.
- turn: target on the circle of radius .13 around the hinge at a random
  angle; obs adds target_position and dist_to_target; reward = 1 when the
  spinner tip is inside the target (easy radius .07 / hard .03).

State layout: q = [proximal, distal, hinge, touch_top, touch_bottom
(, target_x, target_z)] — touch and target ride along as frozen/updated
extra coordinates so the standard auto-reset machinery handles them.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs import base
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "finger.npz")

_CTRL_DT = 0.02
_SPIN_VELOCITY = 15.0
_TIP_IN_SPINNER = jnp.array([0.0, 0.13])  # 'tip' site, spinner frame
_SPINNER_POS = jnp.array([0.2, 0.4])  # spinner body origin (= hinge anchor)
_TARGET_RADIUS_FROM_HINGE = 0.13  # cap1 geom_size sum (.04 + .09)
_DISTAL_BODY = 1
_SPINNER_BODY = 2
_FINGERTIP_PAIRS = None  # resolved at init from pair_geoms
_INIT_CANDIDATES = 8


class Finger(base.Environment):
    episode_steps = 1000  # 20 s / 0.02 s

    def __init__(self, task: str = "spin", target_radius: float = 0.07,
                 dtype=jnp.float32):
        assert task in ("spin", "turn")
        m = pmodel.load(_ASSET)
        # Contact model selected by on-chip training probes (round 4; data in
        # results/diag_finger_impulse_r4.txt + results/finger_probe_r4.txt):
        # impulses through the implicitly-damped metric (MuJoCo Euler
        # semantics — the damped finger absorbs recoil instead of being
        # ejected) + a stiff pair push-out (timeconst h/2) that restores the
        # oracle's momentum-transfer scale. finger-spin: 353 (r3 soft model)
        # -> 555-630 across seeds @ 100M; turn tasks par within their
        # all-or-nothing seed variance.
        m = m.replace(implicit_impulse=True, contact_timeconst=0.0025)
        if task == "spin":
            # oracle: Spin.initialize_episode sets hinge damping to .03
            damping = m.damping.copy()
            damping[2] = 0.03
            m = m.replace(damping=damping)
        self.model = m
        self.task = task
        self.target_radius = float(target_radius)
        self.dtype = dtype
        self._step_fn = engine.make_stepper(m, n_substeps=2, return_impulses=True)
        # pairs whose first geom is the fingertip (body 1 = distal)
        gb = np.asarray(m.geom_body)
        self._tip_pairs = np.flatnonzero(gb[np.asarray(m.pair_geoms[:, 0])] == 1)
        assert len(self._tip_pairs) == 2
        self._nq = 5 + (2 if task == "turn" else 0)

    # ---- specs ----
    def obs_spec(self):
        spec = {
            "position": base.ArraySpec((4,), self.dtype),
            "velocity": base.ArraySpec((3,), self.dtype),
            "touch": base.ArraySpec((2,), self.dtype),
        }
        if self.task == "turn":
            spec["target_position"] = base.ArraySpec((2,), self.dtype)
            spec["dist_to_target"] = base.ArraySpec((), self.dtype)
        return spec

    def action_spec(self):
        return base.ArraySpec((2,), self.dtype, -1.0, 1.0)

    # ---- helpers ----
    def _spinner_tip(self, q_phys):
        pos, ang = engine.fk(self.model, q_phys)
        tip = pos[_SPINNER_BODY] + engine._rot(
            ang[_SPINNER_BODY], _TIP_IN_SPINNER.astype(q_phys.dtype)
        )
        return tip - pos[_SPINNER_BODY], pos, ang  # tip relative to spinner

    def _touch_from_impulses(self, q_phys, imp):
        """Split fingertip contact impulses into (top, bottom) site forces
        by the contact point's side in the distal frame (sites at x=±.01)."""
        m = self.model
        fkd = engine.fk_dofs(m, q_phys)
        pos, ang, _, _ = fkd
        gb = np.asarray(m.geom_body)
        p0w = pos[gb] + engine._rot(ang[gb], jnp.asarray(m.geom_p0, q_phys.dtype))
        p1w = pos[gb] + engine._rot(ang[gb], jnp.asarray(m.geom_p1, q_phys.dtype))
        ia = np.asarray(m.pair_geoms[self._tip_pairs, 0])
        ib = np.asarray(m.pair_geoms[self._tip_pairs, 1])
        c_a, c_b = engine._seg_seg_closest(p0w[ia], p1w[ia], p0w[ib], p1w[ib])
        mid = 0.5 * (c_a + c_b)
        # contact point in the distal body frame
        u = engine._rot(-ang[_DISTAL_BODY], mid - pos[_DISTAL_BODY])
        is_top = (u[:, 0] > 0).astype(q_phys.dtype)
        force = imp["pair"][self._tip_pairs] / _CTRL_DT
        return jnp.stack([jnp.sum(force * is_top), jnp.sum(force * (1 - is_top))])

    # ---- env interface ----
    def _init(self, key):
        m = self.model
        kj, kh, kt = jax.random.split(key, 3)
        lo = jnp.asarray(m.joint_range[:2, 0], self.dtype)
        hi = jnp.asarray(m.joint_range[:2, 1], self.dtype)
        joints = jax.random.uniform(
            kj, (_INIT_CANDIDATES, 2), self.dtype, lo, hi
        )
        hinge = jax.random.uniform(
            kh, (_INIT_CANDIDATES, 1), self.dtype, -jnp.pi, jnp.pi
        )
        qs = jnp.concatenate([joints, hinge], -1)  # (K, 3)

        def max_depth(qp):
            _, _, pdepth, _ = engine._pair_kinematics(m, qp)
            _, gdepth = engine._contact_kinematics(m, qp)
            return jnp.maximum(jnp.max(pdepth), jnp.max(gdepth))

        depths = jax.vmap(max_depth)(qs)
        free = depths <= 0.0
        idx = jnp.argmax(free)
        q_phys = jnp.where(jnp.any(free), qs[idx], qs[jnp.argmin(depths)])

        extras = [jnp.zeros((2,), self.dtype)]  # touch
        if self.task == "turn":
            angle = jax.random.uniform(kt, (), self.dtype, -jnp.pi, jnp.pi)
            target = _SPINNER_POS.astype(self.dtype) + (
                _TARGET_RADIUS_FROM_HINGE
                * jnp.stack([jnp.sin(angle), jnp.cos(angle)])
            )
            extras.append(target)
        q = jnp.concatenate([q_phys] + extras)
        return q, jnp.zeros((self._nq,), self.dtype)

    def _physics_step(self, q, qd, action):
        q_phys, qd_phys = q[:3], qd[:3]
        q2, qd2, imp = self._step_fn(q_phys, qd_phys, action)
        touch = self._touch_from_impulses(q2, imp)
        parts = [q2, touch]
        if self.task == "turn":
            parts.append(q[5:])
        return jnp.concatenate(parts), jnp.concatenate(
            [qd2, jnp.zeros((self._nq - 3,), qd2.dtype)]
        )

    def _obs(self, q, qd):
        q_phys = q[:3]
        tip_rel, pos, _ = self._spinner_tip(q_phys)
        obs = {
            "position": jnp.concatenate([q_phys[:2], tip_rel]),
            "velocity": qd[:3],
            "touch": jnp.log1p(jnp.maximum(q[3:5], 0.0)),
        }
        if self.task == "turn":
            target_rel = q[5:] - pos[_SPINNER_BODY]
            obs["target_position"] = target_rel
            obs["dist_to_target"] = (
                jnp.linalg.norm(target_rel - tip_rel) - self.target_radius
            )
        return obs

    def _reward(self, q, qd, action):
        if self.task == "spin":
            return (qd[2] <= -_SPIN_VELOCITY).astype(q.dtype)
        tip_rel, pos, _ = self._spinner_tip(q[:3])
        target_rel = q[5:] - pos[_SPINNER_BODY]
        dist = jnp.linalg.norm(target_rel - tip_rel) - self.target_radius
        return (dist <= 0).astype(q.dtype)
