"""Planar articulated rigid-body model description.

Replaces the role MuJoCo's C engine plays in the reference stack
(SURVEY.md §2C): the dm_control benchmark domains targeted by the build
(cartpole, cheetah, walker) are all strictly planar kinematic trees — slide
joints along world x/z and hinge joints about ±y, capsule/box geoms, and
ground-plane contacts only. A planar model is therefore lossless for these
domains (verified against the compiled MjModel fields).

The model is a plain frozen Python object holding small NumPy constants and
static metadata. Environments close over it, so inside `jit` every parameter
is a compile-time constant — no tracing overhead, maximal XLA folding.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

SLIDE = 0
HINGE = 1


@dataclasses.dataclass(frozen=True)
class PlanarModel:
    # --- bodies (nb entries; world excluded; parents precede children) ---
    parent: tuple[int, ...]  # parent body index, -1 = world
    body_pos: np.ndarray  # (nb, 2) frame offset in parent frame (x, z)
    mass: np.ndarray  # (nb,)
    com: np.ndarray  # (nb, 2) COM in body frame (x, z)
    inertia: np.ndarray  # (nb,) Iyy about COM

    # --- degrees of freedom (nv entries, MuJoCo dof order) ---
    dof_body: tuple[int, ...]  # owning body index per dof
    dof_type: tuple[int, ...]  # SLIDE or HINGE
    dof_axis: np.ndarray  # (nv, 2) slide: unit planar axis; hinge: (sign, 0)
    dof_anchor: np.ndarray  # (nv, 2) hinge anchor in body frame
    damping: np.ndarray  # (nv,)
    armature: np.ndarray  # (nv,)
    stiffness: np.ndarray  # (nv,)
    springref: np.ndarray  # (nv,)
    limited: np.ndarray  # (nv,) bool
    joint_range: np.ndarray  # (nv, 2)

    # --- actuators (nu entries) ---
    act_dof: tuple[int, ...]
    gear: np.ndarray  # (nu,)

    # --- contact candidate points (ncon entries) ---
    con_body: tuple[int, ...]  # owning body index
    con_pos: np.ndarray  # (ncon, 2) sphere center in body frame
    con_radius: np.ndarray  # (ncon,)
    con_friction: np.ndarray  # (ncon,) tangential (sliding) friction coeff

    # --- options ---
    dt: float  # physics timestep
    gravity: float = 9.81
    integrator: str = "euler"  # "euler" (semi-implicit, implicit damping) | "rk4"
    plane: str = "xz"  # "xz": hinges about ±y, gravity in-plane (locomotion)
    #                    "xy": hinges about ±z, gravity ⊥ plane (manipulation)

    # --- constraint-solver parameters (PGS impulse solver; Baumgarte
    # push-out resolves position error over these time constants, cf.
    # MuJoCo's solref timeconst) ---
    contact_timeconst: float = 0.02  # MuJoCo default solref timeconst
    limit_timeconst: float = 0.02

    @property
    def nb(self) -> int:
        return len(self.parent)

    @property
    def nv(self) -> int:
        return len(self.dof_body)

    @property
    def nu(self) -> int:
        return len(self.act_dof)

    @property
    def ncon(self) -> int:
        return len(self.con_body)

    @property
    def total_mass(self) -> float:
        return float(np.sum(self.mass))

    @property
    def body_dofs(self) -> tuple[tuple[int, ...], ...]:
        """Static per-body dof index lists, in dof order (FK applies them
        sequentially within a body, matching mj_kinematics)."""
        out: list[list[int]] = [[] for _ in range(self.nb)]
        for j, b in enumerate(self.dof_body):
            out[b].append(j)
        return tuple(tuple(x) for x in out)

    def replace(self, **kw) -> "PlanarModel":
        return dataclasses.replace(self, **kw)


def _quat_to_yangle(quat: Sequence[float]) -> float:
    """Angle about +y for a quaternion of the form (w, 0, qy, 0)."""
    w, qx, qy, qz = quat
    assert abs(qx) < 1e-8 and abs(qz) < 1e-8, f"non-planar quat {quat}"
    return 2.0 * float(np.arctan2(qy, w))


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def from_mujoco(m, contact_bodies: str = "all") -> PlanarModel:
    """Extract a PlanarModel from a compiled `mujoco.MjModel`.

    Only used offline (tools/bake_assets.py) and in parity tests — the
    training path loads baked .npz assets and never imports mujoco.

    Asserts the model really is planar (slide axes in the x-z plane, hinge
    axes ±y, no out-of-plane body offsets that matter, single-dof joints).
    """
    import mujoco  # local import: optional dependency

    nb = m.nbody - 1  # drop world

    # Plane detection: hinge axes ±y → "xz" plane (locomotion; gravity
    # in-plane), hinge axes ±z → "xy" plane (manipulation; gravity ⊥ plane,
    # so in-plane gravity is zero). The engine's R(θ) convention matches a
    # +y rotation in (x, z); a +z rotation in (x, y) is its mirror, so xy
    # hinges carry a NEGATED sign.
    hinge_axes = [m.jnt_axis[j] for j in range(m.njnt)
                  if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_HINGE]
    if hinge_axes and all(abs(a[0]) < 1e-8 and abs(a[1]) < 1e-8 for a in hinge_axes):
        plane = "xy"
        cols = [0, 1]
        normal = 2
        hinge_sign = lambda ax: -np.sign(ax[normal])
        gravity = 0.0
        assert abs(m.opt.gravity[0]) < 1e-8 and abs(m.opt.gravity[1]) < 1e-8
        contact_bodies = "none"  # the world ground plane is ⊥ to this plane
    else:
        plane = "xz"
        cols = [0, 2]
        normal = 1
        hinge_sign = lambda ax: np.sign(ax[normal])
        gravity = float(-m.opt.gravity[2])

    def bid(mj_body):  # mujoco body id -> planar body index
        return mj_body - 1

    parent = []
    body_pos = np.zeros((nb, 2))
    mass = np.zeros(nb)
    com = np.zeros((nb, 2))
    inertia = np.zeros(nb)
    for b in range(1, m.nbody):
        i = bid(b)
        parent.append(bid(m.body_parentid[b]) if m.body_parentid[b] > 0 else -1)
        q = m.body_quat[b]
        assert np.allclose(q, [1, 0, 0, 0]), "rotated body frames unsupported"
        body_pos[i] = m.body_pos[b][cols]
        mass[i] = m.body_mass[b]
        com[i] = m.body_ipos[b][cols]
        # Inertia about the plane normal, in the body frame.
        R = _quat_to_mat(m.body_iquat[b])
        I_body = R @ np.diag(m.body_inertia[b]) @ R.T
        inertia[i] = I_body[normal, normal]

    dof_body, dof_type = [], []
    nv = m.nv
    assert m.njnt == nv, "multi-dof joints unsupported (planar models are 1-dof)"
    dof_axis = np.zeros((nv, 2))
    dof_anchor = np.zeros((nv, 2))
    for j in range(m.njnt):
        dof_body.append(bid(m.jnt_bodyid[j]))
        ax = m.jnt_axis[j]
        if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_SLIDE:
            dof_type.append(SLIDE)
            assert abs(ax[normal]) < 1e-8, f"slide axis out of plane: {ax}"
            dof_axis[j] = ax[cols]
        elif m.jnt_type[j] == mujoco.mjtJoint.mjJNT_HINGE:
            dof_type.append(HINGE)
            in_plane = [ax[c] for c in cols]
            assert all(abs(a) < 1e-8 for a in in_plane), f"hinge axis in plane: {ax}"
            dof_axis[j] = np.array([hinge_sign(ax), 0.0])
            dof_anchor[j] = m.jnt_pos[j][cols]
        else:
            raise AssertionError(f"unsupported joint type {m.jnt_type[j]}")

    con_body, con_pos, con_radius, con_friction = [], [], [], []
    floor_contype = 0
    floor_conaff = 0
    for g in range(m.ngeom):
        if m.geom_bodyid[g] == 0 and m.geom_type[g] == mujoco.mjtGeom.mjGEOM_PLANE:
            floor_contype |= int(m.geom_contype[g])
            floor_conaff |= int(m.geom_conaffinity[g])
    contact_disabled = bool(m.opt.disableflags & mujoco.mjtDisableBit.mjDSBL_CONTACT)
    for g in range(m.ngeom):
        b = m.geom_bodyid[g]
        if b == 0 or contact_disabled or contact_bodies == "none":
            continue
        ct, ca = int(m.geom_contype[g]), int(m.geom_conaffinity[g])
        if not ((ct & floor_conaff) or (floor_contype & ca)):
            continue
        gpos = m.geom_pos[g][cols]
        if m.geom_type[g] == mujoco.mjtGeom.mjGEOM_CAPSULE:
            r, half = float(m.geom_size[g][0]), float(m.geom_size[g][1])
            # Capsule axis = geom-frame local z in the body frame; must lie
            # in the plane (an out-of-plane component would be 3-D).
            axis3 = _quat_to_mat(m.geom_quat[g]) @ np.array([0.0, 0.0, 1.0])
            assert abs(axis3[normal]) < 1e-8, f"capsule axis out of plane: {axis3}"
            d = axis3[cols] * half
            pts = [gpos + d, gpos - d]
        elif m.geom_type[g] == mujoco.mjtGeom.mjGEOM_SPHERE:
            r = float(m.geom_size[g][0])
            pts = [gpos]
        else:
            # Boxes etc. only appear with contacts disabled in our domains.
            continue
        for p in pts:
            con_body.append(bid(b))
            con_pos.append(p)
            con_radius.append(r)
            con_friction.append(float(m.geom_friction[g][0]))

    act_dof, gear = [], []
    for a in range(m.nu):
        act_dof.append(int(m.actuator_trnid[a, 0]))
        gear.append(float(m.actuator_gear[a, 0]))

    integrator = (
        "rk4" if m.opt.integrator == mujoco.mjtIntegrator.mjINT_RK4 else "euler"
    )

    return PlanarModel(
        parent=tuple(parent),
        body_pos=body_pos,
        mass=mass,
        com=com,
        inertia=inertia,
        dof_body=tuple(dof_body),
        dof_type=tuple(dof_type),
        dof_axis=dof_axis,
        dof_anchor=dof_anchor,
        damping=m.dof_damping.copy(),
        armature=m.dof_armature.copy(),
        stiffness=m.jnt_stiffness.copy(),
        springref=m.qpos_spring.copy().reshape(-1),
        limited=m.jnt_limited.astype(bool).copy(),
        joint_range=m.jnt_range.copy(),
        act_dof=tuple(act_dof),
        gear=np.asarray(gear),
        con_body=tuple(con_body),
        con_pos=np.asarray(con_pos).reshape(-1, 2) if con_pos else np.zeros((0, 2)),
        con_radius=np.asarray(con_radius),
        con_friction=np.asarray(con_friction),
        dt=float(m.opt.timestep),
        gravity=gravity,
        integrator=integrator,
        plane=plane,
    )


# ---------------------------------------------------------------------------
# Baked-asset (de)serialization: training never needs mujoco installed.
# ---------------------------------------------------------------------------

_ARRAY_FIELDS = [
    "body_pos", "mass", "com", "inertia", "dof_axis", "dof_anchor",
    "damping", "armature", "stiffness", "springref", "limited", "joint_range",
    "gear", "con_pos", "con_radius", "con_friction",
]
_TUPLE_FIELDS = ["parent", "dof_body", "dof_type", "act_dof", "con_body"]
_SCALAR_FIELDS = [
    "dt", "gravity", "integrator", "plane", "contact_timeconst", "limit_timeconst",
]


def save(model: PlanarModel, path: str) -> None:
    data = {f: getattr(model, f) for f in _ARRAY_FIELDS}
    for f in _TUPLE_FIELDS:
        data[f] = np.asarray(getattr(model, f), dtype=np.int64)
    for f in _SCALAR_FIELDS:
        data[f] = np.asarray(getattr(model, f))
    np.savez(path, **data)


def load(path: str) -> PlanarModel:
    z = np.load(path, allow_pickle=False)
    kw = {f: z[f] for f in _ARRAY_FIELDS}
    kw.update({f: tuple(int(x) for x in z[f]) for f in _TUPLE_FIELDS})
    for f in _SCALAR_FIELDS:
        if f not in z:  # fields added after older assets were baked
            continue
        v = z[f][()]
        kw[f] = str(v) if f in ("integrator", "plane") else float(v)
    return PlanarModel(**kw)
