"""Planar manipulator domain (bring_ball / bring_peg) — JAX-native, dm_control parity.

Oracle source (dm_control 1.0.43 `suite/manipulator.py` + `manipulator.xml`):
a 4-joint planar arm (root/shoulder/elbow/wrist) in the VERTICAL x-z plane
with a two-finger hand (thumb+finger, each with a passive fingertip), a
tendon "grasp" actuator closing both fingers, a soft equality constraint
coupling them, and a free ball prop to be brought to a ghost target. This
is the closest dm_control stand-in for the reference's Robosuite
manipulation surface (SURVEY.md §0/§6; Robosuite is not installable here).

Parity notes (verified in tests/test_manipulator.py):
- physics dt 0.001, control dt 0.01 (10 substeps); episode 10 s = 1000 steps.
- smooth dynamics (FK / M(q) / bias) match MuJoCo to machine precision —
  including the MIRRORED `finger` subtree frames, handled by bake-time
  frame canonicalization (physics/model.py `from_mujoco`).
- init follows the oracle: arm joints ~U(range or ±π), finger symmetrized
  to the thumb, target ~U([-.4,.4]×[.1,.4]) with angle ~U(-π,π), object
  placed in-hand (p=.1) / in-target (p=.1) / uniform with a random x-kick
  (p=.8), rejection-sampled collision-free over a candidate batch.
- obs layout matches dm_control's modalities (arm_pos sin/cos pairs,
  arm_vel, touch, hand/object/target 2-D poses, object_vel) with our
  sorted-key flattening; touch = log1p(mean contact normal force) summed
  per sensor body from the engine's contact impulses (MuJoCo sums site-
  volume sensor forces; body-level aggregation is the planar equivalent —
  each touch site covers exactly the geoms of its body).
- reward: tolerance(‖ball − target‖, (0, .01), margin .02).

The per-episode target pose and the latest touch readings ride in `q`
after the 11 physics dofs (the reacher.py pattern), so base.Environment's
auto-reset machinery regenerates them for free.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_NV = 11
_CLOSE = 0.01  # oracle _CLOSE
_P_IN_HAND = 0.1
_P_IN_TARGET = 0.1
_INIT_CANDIDATES = 16  # random arm poses self-collide often; 16 keeps
#                        P(no free candidate) negligible (oracle loops)
# dm_control's named lookup order (NOT model order)
_ARM_JOINTS = ["arm_root", "arm_shoulder", "arm_elbow", "arm_wrist",
               "finger", "fingertip", "thumb", "thumbtip"]
_TOUCH_BODIES = ["hand", "finger", "thumb", "fingertip", "thumbtip"]


class Manipulator(base.Environment):
    """bring_ball / bring_peg (insert variants need box colliders — out of
    scope like the reference's unused task surface)."""

    episode_steps = 1000  # 10 s / 0.01 s

    def __init__(self, prop: str = "ball", dtype=jnp.float32):
        assert prop in ("ball", "peg")
        self.prop = prop
        asset = os.path.join(
            os.path.dirname(__file__), "assets", f"manipulator_{prop}.npz"
        )
        self.model = pmodel.load(asset)
        m = self.model
        assert m.nv == _NV and m.neq == 1 and m.act_moment is not None
        self.dtype = dtype
        self.n_substeps = 10
        self.control_dt = m.dt * self.n_substeps
        self._step_fn = engine.make_stepper(
            m, n_substeps=self.n_substeps, return_impulses=True
        )

        # --- name metadata from the baked asset ---
        z = np.load(asset, allow_pickle=False)
        joints = [str(s) for s in z["x_joint_names"]]
        bodies = [str(s) for s in z["x_body_names"]]
        sites = [str(s) for s in z["x_site_names"]]
        self._arm_idx = np.asarray([joints.index(j) for j in _ARM_JOINTS])
        self._obj_idx = np.asarray([joints.index(f"{prop}_{d}") for d in "xzy"])
        self._thumb_slot = _ARM_JOINTS.index("thumb")
        self._finger_slot = _ARM_JOINTS.index("finger")
        self._hand_b = bodies.index("hand")
        self._prop_b = bodies.index(prop)  # prop body (pose obs + ball reward)

        def site(name):
            s = sites.index(name)
            return int(z["x_site_body"][s]), np.asarray(z["x_site_pos"][s])

        hb, self._grasp_local = site("grasp")
        assert hb == self._hand_b
        if prop == "peg":
            # peg reward sites: grasp/pinch on the hand side, peg/peg_grasp/
            # peg_pinch/peg_tip on the peg (all site bodies are fixed)
            self._site = {n: site(n) for n in (
                "grasp", "pinch", "peg", "peg_grasp", "peg_pinch", "peg_tip",
            )}
            # target sites live on the (static) target body in dm_control;
            # here the target pose is state, so store their TARGET-frame
            # offsets (identical to the peg-frame offsets of peg/peg_tip).
            self._target_offsets = {
                "target_peg": np.asarray(site("target_peg")[1]),
                "target_peg_tip": np.asarray(site("target_peg_tip")[1]),
            }

        # --- touch sensors: per-body masks over the engine's impulse rows
        # (ground contacts, body-body pairs, wall contacts) ---
        con_body = np.asarray(m.con_body)
        pair_body = np.asarray(m.geom_body)[np.asarray(m.pair_geoms)]  # (npair, 2)
        self._touch_masks = []
        for name in _TOUCH_BODIES:
            b = bodies.index(name)
            self._touch_masks.append({
                "ground": (con_body == b).astype(np.float32),
                "pair": np.any(pair_body == b, axis=1).astype(np.float32),
                "wall": np.tile((con_body == b), m.nwall).astype(np.float32),
            })

    def obs_spec(self):
        s = base.ArraySpec
        return {
            "arm_pos": s((16,), self.dtype),  # (sin, cos) per arm joint
            "arm_vel": s((8,), self.dtype),
            "touch": s((5,), self.dtype),
            "hand_pos": s((4,), self.dtype),  # x, z, qw, qy
            "object_pos": s((4,), self.dtype),
            "object_vel": s((3,), self.dtype),
            "target_pos": s((4,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((5,), self.dtype, -1.0, 1.0)

    # ---- episode init (oracle rejection-sampled; candidate batch here) ----
    def _candidate(self, key):
        m = self.model
        ks = jax.random.split(key, 8)
        lo = jnp.asarray(m.joint_range[self._arm_idx, 0], self.dtype)
        hi = jnp.asarray(m.joint_range[self._arm_idx, 1], self.dtype)
        limited = jnp.asarray(m.limited[self._arm_idx], bool)
        u = jax.random.uniform(ks[0], (8,), self.dtype)
        angles = jnp.where(
            limited, lo + u * (hi - lo), -jnp.pi + u * (2 * jnp.pi)
        )
        angles = angles.at[self._finger_slot].set(angles[self._thumb_slot])

        tx = jax.random.uniform(ks[1], (), self.dtype, -0.4, 0.4)
        tz = jax.random.uniform(ks[2], (), self.dtype, 0.1, 0.4)
        ta = jax.random.uniform(ks[3], (), self.dtype, -jnp.pi, jnp.pi)

        q_arm = jnp.zeros((_NV,), self.dtype).at[self._arm_idx].set(angles)
        pos, ang = engine.fk(m, q_arm)  # ball subtree untouched: arm FK only
        grasp_w = pos[self._hand_b] + engine._rot(
            ang[self._hand_b], jnp.asarray(self._grasp_local, self.dtype)
        )
        # oracle: grasp_direction = site_xmat (xx, zx) = (cos φ, −sin φ);
        # object_angle = π − atan2(dir_z, dir_x)
        phi = ang[self._hand_b]
        angle_ih = jnp.pi - jnp.arctan2(-jnp.sin(phi), jnp.cos(phi))

        r = jax.random.uniform(ks[4], (), self.dtype)
        ox_u = jax.random.uniform(ks[5], (), self.dtype, -0.5, 0.5)
        oz_u = jax.random.uniform(ks[6], (), self.dtype, 0.0, 0.7)
        kA, kB = jax.random.split(ks[7])
        oa_u = jax.random.uniform(kA, (), self.dtype, 0.0, 2 * jnp.pi)
        vx_u = jax.random.uniform(kB, (), self.dtype, -5.0, 5.0)

        in_hand = r < _P_IN_HAND
        in_target = (r >= _P_IN_HAND) & (r < _P_IN_HAND + _P_IN_TARGET)
        ox = jnp.where(in_hand, grasp_w[0], jnp.where(in_target, tx, ox_u))
        oz = jnp.where(in_hand, grasp_w[1], jnp.where(in_target, tz, oz_u))
        oa = jnp.where(in_hand, angle_ih, jnp.where(in_target, ta, oa_u))
        vx = jnp.where(in_hand | in_target, 0.0, vx_u)

        q_phys = q_arm.at[self._obj_idx].set(jnp.stack([ox, oz, oa]))
        qd_phys = jnp.zeros((_NV,), self.dtype).at[self._obj_idx[0]].set(vx)
        return q_phys, qd_phys, jnp.stack([tx, tz, ta])

    def _init(self, key):
        keys = jax.random.split(key, _INIT_CANDIDATES)
        qs, qds, targets = jax.vmap(self._candidate)(keys)
        depths = jax.vmap(lambda q: engine.penetration(self.model, q))(qs)
        free = depths <= 0.0
        idx = jnp.where(jnp.any(free), jnp.argmax(free), jnp.argmin(depths))
        q = jnp.concatenate([qs[idx], targets[idx], jnp.zeros((5,), self.dtype)])
        qd = jnp.concatenate([qds[idx], jnp.zeros((8,), self.dtype)])
        return q, qd

    # ---- dynamics ----
    def _physics_step(self, q, qd, action):
        q_phys, target = q[:_NV], q[_NV : _NV + 3]
        q2, qd2, imp = self._step_fn(q_phys, qd[:_NV], action)
        touch = []
        for mk in self._touch_masks:
            f = sum(
                jnp.sum(jnp.asarray(mk[k], q.dtype) * jnp.maximum(imp[k], 0.0))
                for k in ("ground", "pair", "wall")
            )
            touch.append(jnp.log1p(f / self.control_dt))
        q_new = jnp.concatenate([q2, target, jnp.stack(touch)])
        qd_new = jnp.concatenate([qd2, jnp.zeros((8,), q.dtype)])
        return q_new, qd_new

    # ---- observation / reward ----
    def _obs(self, q, qd):
        m = self.model
        q_phys, target, touch = q[:_NV], q[_NV : _NV + 3], q[_NV + 3 :]
        arm_q = q_phys[self._arm_idx]
        pos, ang = engine.fk(m, q_phys)

        def pose4(b):
            a = ang[b]
            return jnp.concatenate(
                [pos[b], jnp.stack([jnp.cos(a / 2), jnp.sin(a / 2)])]
            )

        tx, tz, ta = target[0], target[1], target[2]
        return {
            "arm_pos": jnp.stack([jnp.sin(arm_q), jnp.cos(arm_q)], -1).reshape(16),
            "arm_vel": qd[self._arm_idx],
            "touch": touch,
            "hand_pos": pose4(self._hand_b),
            "object_pos": pose4(self._prop_b),
            "object_vel": qd[self._obj_idx],
            "target_pos": jnp.stack(
                [tx, tz, jnp.cos(ta / 2), jnp.sin(ta / 2)]
            ),
        }

    def _reward(self, q, qd, action):
        q_phys, target = q[:_NV], q[_NV : _NV + 3]
        pos, ang = engine.fk(self.model, q_phys)

        def is_close(d):
            return rewards.tolerance(d, (0.0, _CLOSE), margin=_CLOSE * 2)

        if self.prop == "ball":
            # oracle Bring._ball_reward: tolerance(site_distance(ball, target))
            dist = jnp.linalg.norm(pos[self._prop_b] - target[:2])
            return is_close(dist)

        # oracle Bring._peg_reward: max(bringing, grasping/3)
        def site_w(name):
            b, local = self._site[name]
            return pos[b] + engine._rot(ang[b], jnp.asarray(local, q.dtype))

        def target_w(name):
            off = jnp.asarray(self._target_offsets[name], q.dtype)
            return target[:2] + engine._rot(target[2], off)

        d = lambda a, b: jnp.linalg.norm(a - b)
        grasping = (
            is_close(d(site_w("peg_grasp"), site_w("grasp")))
            + is_close(d(site_w("peg_pinch"), site_w("pinch")))
        ) / 2.0
        bringing = (
            is_close(d(site_w("peg"), target_w("target_peg")))
            + is_close(d(target_w("target_peg_tip"), site_w("peg_tip")))
        ) / 2.0
        return jnp.maximum(bringing, grasping / 3.0)
