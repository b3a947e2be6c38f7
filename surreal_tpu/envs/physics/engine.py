"""Planar rigid-body dynamics in JAX.

TPU-native replacement for the MuJoCo C engine in the reference's env layer
(SURVEY.md §2C): the whole simulator is a pure jittable function of
`(q, qd, ctrl)`, so thousands of env instances `vmap` in lockstep on-device.

Design: Lagrangian dynamics by construction via autodiff instead of
hand-written Featherstone recursions —

- `fk` implements the kinematic tree exactly as mj_kinematics does for
  planar slide/hinge chains (joint transforms applied sequentially within a
  body, about their anchors).
- The mass matrix is the exact Hessian of kinetic energy wrt velocity
  (kinetic energy is quadratic in `qd`, so `jax.jacfwd ∘ jax.grad` is exact).
- Coriolis/centrifugal + gravity bias comes from the Euler-Lagrange
  identity  bias = d/dt(∂T/∂q̇) − ∂T/∂q + ∂V/∂q  evaluated with jvp/grad.
- Contact and joint-limit forces are soft (penalty) constraints; contact
  Jacobian-transpose application is a single `vjp` through forward
  kinematics of the contact material points.

Correctness of the smooth terms is verified against MuJoCo's `mj_fullM` and
`qfrc_bias` in tests/test_physics_parity.py. Contacts intentionally use a
spring-damper model (Brax-style) rather than MuJoCo's solref/solimp
constraint solver; behavioral parity (task reward scale, gait feasibility)
is the target there, not state-trajectory parity.

The per-env state is (q, qd) ∈ R^nv × R^nv; nv ≤ 9 for the target domains,
so all matrices are tiny and the vmapped batch runs on the VPU while the
policy/value matmuls occupy the MXU.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs.physics.linalg import inv_spd, solve_spd
from surreal_tpu.envs.physics.model import HINGE, SLIDE, PlanarModel


def _highest_precision(fn):
    """Force full-f32 dot/einsum precision inside physics assembly.

    On TPU the DEFAULT matmul precision truncates dot operands to bf16 —
    measured round 4: the bf16 mass matrix of a healthy swimmer state
    (cond 1.4e4) had relative error 1e-3 and min eigenvalue -2.4e-6, i.e.
    it was INDEFINITE, which detonates the SPD Cholesky solves (L ~ 1e18,
    inf inverse) and, through the divergence guard, silently halved
    swimmer returns. Every physics entry point therefore assembles at
    'highest' precision; the tiny physics dots are VPU-bound, so the cost
    is nil (bench re-measured, see BASELINE.md)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def _rot(theta, v):
    """Rotate planar (x, z) vector(s) by angle about +y (matches MuJoCo's
    xmat convention: x' = c·x + s·z, z' = −s·x + c·z)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([c * v[..., 0] + s * v[..., 1], -s * v[..., 0] + c * v[..., 1]], -1)


def fk_dofs(m: PlanarModel, q: jax.Array):
    """Forward kinematics with per-dof world-frame joint data.

    Returns (body origins (nb,2), body angles (nb,), dof world anchors
    (nv,2) [hinges; zeros for slides], dof world axes (nv,2) [slides;
    zeros for hinges]). Bodies are topologically ordered (MuJoCo
    guarantee); the loop unrolls at trace time (nb ≤ 8 here).
    """
    dtype = q.dtype
    pos: list = [None] * m.nb
    ang: list = [None] * m.nb
    danchor: list = [None] * m.nv
    daxis: list = [None] * m.nv
    zero2 = jnp.zeros((2,), dtype)
    body_dofs = m.body_dofs
    # static offsets as Python floats (weak-typed: no f32->f64 promotion)
    frame = [float(x) for x in m.body_angles]
    ref = [float(x) for x in m.dof_refs]
    for b in range(m.nb):
        par = m.parent[b]
        if par < 0:
            p = jnp.asarray(m.body_pos[b], dtype)
            a = jnp.asarray(frame[b], dtype)
        else:
            p = pos[par] + _rot(ang[par], jnp.asarray(m.body_pos[b], dtype))
            a = ang[par] + frame[b] if frame[b] else ang[par]
        for j in body_dofs[b]:
            qj = q[j] - ref[j] if ref[j] else q[j]
            if m.dof_type[j] == SLIDE:
                ax_w = _rot(a, jnp.asarray(m.dof_axis[j], dtype))
                p = p + ax_w * qj
                danchor[j] = zero2
                daxis[j] = ax_w
            else:  # HINGE about anchor
                anchor = jnp.asarray(m.dof_anchor[j], dtype)
                w = p + _rot(a, anchor)
                a = a + jnp.asarray(m.dof_axis[j][0], dtype) * qj
                p = w - _rot(a, anchor)
                danchor[j] = w
                daxis[j] = zero2
        pos[b] = p
        ang[b] = a
    return jnp.stack(pos), jnp.stack(ang), jnp.stack(danchor), jnp.stack(daxis)


def fk(m: PlanarModel, q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics: q -> (body frame origins (nb,2), angles (nb,))."""
    pos, ang, _, _ = fk_dofs(m, q)
    return pos, ang


def _ancestor_dof_mask(m: PlanarModel) -> np.ndarray:
    """(nb, nv) bool: dof j moves body b (j belongs to b or an ancestor)."""
    mask = np.zeros((m.nb, m.nv), bool)
    for b in range(m.nb):
        cur = b
        while cur >= 0:
            for j in range(m.nv):
                if m.dof_body[j] == cur:
                    mask[b, j] = True
            cur = m.parent[cur]
    return mask


def _perp(v):
    """s·Ω·v with Ω = [[0,1],[-1,0]] (velocity direction of a point under
    positive hinge rate, in this file's R(θ) convention)."""
    return jnp.stack([v[..., 1], -v[..., 0]], -1)


@_highest_precision
def point_jacobians(m: PlanarModel, q, points_body: np.ndarray | jax.Array,
                    point_bodies: np.ndarray, fkd=None):
    """Analytic world-position Jacobians for material points.

    points_body: (P, 2) body-local coordinates; point_bodies: (P,) owning
    body indices. Returns (points_world (P,2), J (P,2,nv), pos, ang).
    J[p,:,j] = hinge: sign_j · Ω(x_p − anchor_j);  slide: world axis_j.
    """
    dtype = q.dtype
    pos, ang, danchor, daxis = fkd if fkd is not None else fk_dofs(m, q)
    pb = np.asarray(point_bodies)
    pts_w = pos[pb] + _rot(ang[pb], jnp.asarray(points_body, dtype))
    sign = jnp.asarray([m.dof_axis[j][0] if m.dof_type[j] == HINGE else 0.0
                        for j in range(m.nv)], dtype)
    is_hinge = np.asarray([t == HINGE for t in m.dof_type])
    mask = jnp.asarray(_ancestor_dof_mask(m)[pb], dtype)  # (P, nv)
    diff = pts_w[:, None, :] - danchor[None, :, :]  # (P, nv, 2)
    J_hinge = sign[None, :, None] * _perp(diff)  # (P, nv, 2)
    J_slide = jnp.broadcast_to(daxis[None], J_hinge.shape)
    J = jnp.where(jnp.asarray(is_hinge)[None, :, None], J_hinge, J_slide)
    J = J * mask[:, :, None]
    return pts_w, jnp.swapaxes(J, 1, 2), pos, ang  # J -> (P, 2, nv)


def com_positions(m: PlanarModel, q: jax.Array) -> jax.Array:
    pos, ang = fk(m, q)
    return pos + _rot(ang, jnp.asarray(m.com, q.dtype))


def _coms_and_angles(m, q):
    pos, ang = fk(m, q)
    return pos + _rot(ang, jnp.asarray(m.com, q.dtype)), ang


@_highest_precision
def body_velocities(m: PlanarModel, q, qd):
    """(v_com (nb,2), omega (nb,)) via one jvp through FK."""
    _, tangents = jax.jvp(lambda qq: _coms_and_angles(m, qq), (q,), (qd,))
    return tangents


@_highest_precision
def kinetic_energy(m: PlanarModel, q, qd):
    v, w = body_velocities(m, q, qd)
    mass = jnp.asarray(m.mass, q.dtype)
    inertia = jnp.asarray(m.inertia, q.dtype)
    arm = jnp.asarray(m.armature, q.dtype)
    return (
        0.5 * jnp.sum(mass * jnp.sum(v * v, -1))
        + 0.5 * jnp.sum(inertia * w * w)
        + 0.5 * jnp.sum(arm * qd * qd)
    )


def potential_energy(m: PlanarModel, q):
    coms = com_positions(m, q)
    return m.gravity * jnp.sum(jnp.asarray(m.mass, q.dtype) * coms[:, 1])


@_highest_precision
def mass_matrix_autodiff(m: PlanarModel, q) -> jax.Array:
    """Joint-space inertia via the Hessian of kinetic energy (reference
    implementation; kept as a cross-check for the analytic assembly)."""
    zero = jnp.zeros_like(q)
    return jax.jacfwd(jax.grad(lambda qdd: kinetic_energy(m, q, qdd)))(zero)


@_highest_precision
def mass_matrix(m: PlanarModel, q, fkd=None) -> jax.Array:
    """Exact joint-space inertia M(q) = Σ_b m_b J_vᵀJ_v + I_b J_ωᵀJ_ω
    (+ armature), assembled from analytic point Jacobians of the body COMs
    — ~10× cheaper to trace/compile than the autodiff Hessian and verified
    equal against both it and MuJoCo's mj_fullM."""
    dtype = q.dtype
    coms_w, Jv, pos, ang = point_jacobians(
        m, q, m.com, np.arange(m.nb), fkd=fkd
    )  # Jv: (nb, 2, nv)
    mass = jnp.asarray(m.mass, dtype)
    inertia = jnp.asarray(m.inertia, dtype)
    sign = jnp.asarray([m.dof_axis[j][0] if m.dof_type[j] == HINGE else 0.0
                        for j in range(m.nv)], dtype)
    mask = jnp.asarray(_ancestor_dof_mask(m), dtype)  # (nb, nv)
    Jw = mask * sign[None, :]  # (nb, nv)
    M = jnp.einsum("b,bcj,bck->jk", mass, Jv, Jv)
    M = M + jnp.einsum("b,bj,bk->jk", inertia, Jw, Jw)
    return M + jnp.diag(jnp.asarray(m.armature, dtype))


@_highest_precision
def bias_forces_autodiff(m: PlanarModel, q, qd) -> jax.Array:
    """Euler-Lagrange bias via autodiff (reference implementation; kept as
    the cross-check oracle for the analytic Newton-Euler assembly below —
    tests/test_physics_parity.py verifies both against MuJoCo)."""
    g1 = lambda qq: jax.grad(lambda qdd: kinetic_energy(m, qq, qdd))(qd)
    _, dg1_dt = jax.jvp(g1, (q,), (qd,))
    dT_dq = jax.grad(lambda qq: kinetic_energy(m, qq, qd))(q)
    dV_dq = jax.grad(lambda qq: potential_energy(m, qq))(q)
    return dg1_dt - dT_dq + dV_dq


def fk_dofs_dot(m: PlanarModel, q, qd):
    """(fkd, fkd_dot): forward kinematics AND its time derivative along qd
    in one jvp — the single FK evaluation every consumer in a physics step
    shares (mass matrix, bias, fluid drag, constraint rows)."""
    return jax.jvp(lambda qq: fk_dofs(m, qq), (q,), (qd,))


@_highest_precision
def bias_forces(m: PlanarModel, q, qd, fkd=None, fkd_dot=None) -> jax.Array:
    """Coriolis + centrifugal + gravity `c(q, qd)` such that
    M qacc + c = τ. Matches MuJoCo's qfrc_bias (sign: bias opposes motion).

    Analytic Newton-Euler assembly (planar): with q̈ = 0 each body's COM
    acceleration is γ_b = (dJ_b/dt) q̇ and its angular acceleration is 0
    (planar hinge rates superpose with constant coefficients), so
        bias_j = Σ_b m_b J_bᵀ (γ_b + g ẑ).
    dJ/dt columns come for free from ONE jvp of fk_dofs: hinge j's column
    is sign_j·Ω(x_b − a_j) so its derivative is sign_j·Ω(ẋ_b − ȧ_j); a
    slide column is the world axis, derivative = axis rate. Replaces the
    ~8 FK-equivalent autodiff chain (profiled round 4) while staying exact;
    verified equal to `bias_forces_autodiff` and MuJoCo's qfrc_bias."""
    dtype = q.dtype
    if fkd is None or fkd_dot is None:
        fkd, fkd_dot = fk_dofs_dot(m, q, qd)
    _, Jv, _, _ = point_jacobians(m, q, m.com, np.arange(m.nb), fkd=fkd)
    _, _, danchor_dot, daxis_dot = fkd_dot
    xdot = jnp.einsum("bcv,v->bc", Jv, qd)  # COM velocities (nb, 2)
    sign = jnp.asarray([m.dof_axis[j][0] if m.dof_type[j] == HINGE else 0.0
                        for j in range(m.nv)], dtype)
    is_hinge = np.asarray([t == HINGE for t in m.dof_type])
    mask = jnp.asarray(_ancestor_dof_mask(m), dtype)  # (nb, nv)
    diff_dot = xdot[:, None, :] - danchor_dot[None, :, :]  # (nb, nv, 2)
    G_hinge = sign[None, :, None] * _perp(diff_dot)
    G_slide = jnp.broadcast_to(daxis_dot[None], G_hinge.shape)
    G = jnp.where(jnp.asarray(is_hinge)[None, :, None], G_hinge, G_slide)
    G = G * mask[:, :, None]  # (nb, nv, 2) = dJ/dt columns
    gamma = jnp.einsum("bvc,v->bc", G, qd)  # (nb, 2)
    g_vec = jnp.stack([jnp.zeros((m.nb,), dtype),
                       jnp.full((m.nb,), m.gravity, dtype)], -1)
    f = jnp.asarray(m.mass, dtype)[:, None] * (gamma + g_vec)
    return jnp.einsum("bcv,bc->v", Jv, f)


# ---------------------------------------------------------------------------
# Unilateral constraints: ground contacts + joint limits.
#
# Solved at the VELOCITY level with projected Gauss-Seidel (PGS) impulses —
# the same family of solver MuJoCo uses — rather than penalty springs.
# Inelastic contacts (restitution 0, MuJoCo default) with Coulomb friction
# boxed at μ·λ_n, plus Baumgarte push-out velocities for position drift.
# Unconditionally stable: impulses are exchanged through M⁻¹, so coupled
# constraint stacks (a crumpling walker hitting limits and ground at once)
# cannot inject energy the way explicit penalties do.
# ---------------------------------------------------------------------------


def _contact_points_world(m: PlanarModel, q, u_local):
    """World positions of contact material points given their body-local
    coordinates `u_local` (ncon, 2)."""
    pos, ang = fk(m, q)
    cb = np.asarray(m.con_body)
    return pos[cb] + _rot(ang[cb], u_local)


@_highest_precision
def _contact_kinematics(m: PlanarModel, q, fkd=None):
    """(J (ncon,2,nv), depth (ncon,)) at configuration q. J maps qd to the
    world (x, z) velocity of each contact material point (the lowest point
    of each candidate sphere). Analytic Jacobians (see point_jacobians);
    the material-point offset (0, −r) is world-fixed, so its Jacobian is
    the sphere-center Jacobian plus the hinge Ω·(0,−r) rotational term —
    obtained by evaluating the point at center + Rᵀ(0,−r) body coords."""
    dtype = q.dtype
    cb = np.asarray(m.con_body)
    radius = jnp.asarray(m.con_radius, dtype)
    pos, ang, danchor, daxis = fkd if fkd is not None else fk_dofs(m, q)
    down = jnp.stack([jnp.zeros_like(radius), -radius], -1)
    u_pt = jnp.asarray(m.con_pos, dtype) + _rot(-ang[cb], down)
    pts_w, J, _, _ = point_jacobians(m, q, u_pt, cb, fkd=(pos, ang, danchor, daxis))
    depth = -pts_w[:, 1]  # pt is the sphere's lowest point; ground at z=0
    return J, depth


def _seg_seg_closest(p1, q1, p2, q2, eps=1e-12):
    """Closest points between planar segments [p1,q1] and [p2,q2], batched
    over the leading axis (Ericson, Real-Time Collision Detection §5.1.9,
    branchless). Degenerate segments (points/spheres) handled."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0)
    t_raw = (b * s + f) / jnp.maximum(e, eps)
    t = jnp.clip(t_raw, 0.0, 1.0)
    s_fix = jnp.clip((b * t - c) / jnp.maximum(a, eps), 0.0, 1.0)
    s = jnp.where((t_raw < 0.0) | (t_raw > 1.0), s_fix, s)
    # degenerate cases: one or both segments are points
    s = jnp.where(a <= eps, 0.0, s)
    t = jnp.where(a <= eps, jnp.clip(f / jnp.maximum(e, eps), 0.0, 1.0), t)
    s = jnp.where(e <= eps, jnp.clip(-c / jnp.maximum(a, eps), 0.0, 1.0), s)
    t = jnp.where(e <= eps, 0.0, t)
    return p1 + s[..., None] * d1, p2 + t[..., None] * d2


@_highest_precision
def _pair_kinematics(m: PlanarModel, q, fkd=None):
    """Body-body capsule/sphere contact rows.

    Returns (Jn (npair, nv), Jt (npair, nv), depth (npair,), mu (npair,)).
    Jn is the SEPARATION rate (positive impulse pushes the geoms apart);
    Jt the tangential relative velocity; depth > 0 means penetrating.
    """
    dtype = q.dtype
    fkd = fk_dofs(m, q) if fkd is None else fkd
    pos, ang, _, _ = fkd
    gb = np.asarray(m.geom_body)
    p0_w = pos[gb] + _rot(ang[gb], jnp.asarray(m.geom_p0, dtype))
    p1_w = pos[gb] + _rot(ang[gb], jnp.asarray(m.geom_p1, dtype))
    ia = np.asarray(m.pair_geoms[:, 0])
    ib = np.asarray(m.pair_geoms[:, 1])
    c_a, c_b = _seg_seg_closest(p0_w[ia], p1_w[ia], p0_w[ib], p1_w[ib])
    delta = c_b - c_a
    dist = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(dist, 1e-9)[:, None]  # a -> b
    ra = jnp.asarray(m.geom_radius[ia], dtype)
    rb = jnp.asarray(m.geom_radius[ib], dtype)
    depth = (ra + rb) - dist
    # contact material points on each surface
    x_a = c_a + n * ra[:, None]
    x_b = c_b - n * rb[:, None]
    ba, bb = gb[ia], gb[ib]
    u_a = _rot(-ang[ba], x_a - pos[ba])
    u_b = _rot(-ang[bb], x_b - pos[bb])
    _, Ja, _, _ = point_jacobians(m, q, u_a, ba, fkd=fkd)  # (P, 2, nv)
    _, Jb, _, _ = point_jacobians(m, q, u_b, bb, fkd=fkd)
    J_rel = Jb - Ja
    Jn = jnp.einsum("pc,pcv->pv", n, J_rel)
    Jt = jnp.einsum("pc,pcv->pv", _perp(n), J_rel)
    mu = jnp.maximum(
        jnp.asarray(m.geom_friction[ia], dtype), jnp.asarray(m.geom_friction[ib], dtype)
    )  # MuJoCo combines pair friction with the elementwise max
    return Jn, Jt, depth, mu


@_highest_precision
def _wall_kinematics(m: PlanarModel, q, fkd=None):
    """Sphere-candidate contacts against extra static planes (arena walls;
    inside half-space n·x − d ≥ 0). Candidates are the same spheres as the
    ground contacts. Returns (Jn (ncon·nwall, nv), Jt, depth, mu): depth > 0
    means the sphere crosses the plane; a positive normal impulse pushes it
    back along +n."""
    dtype = q.dtype
    fkd = fk_dofs(m, q) if fkd is None else fkd
    pos, ang, _, _ = fkd
    cb = np.asarray(m.con_body)
    radius = jnp.asarray(m.con_radius, dtype)
    Jns, Jts, depths = [], [], []
    for w in range(m.nwall):
        n = jnp.asarray(m.wall_normal[w], dtype)
        d = float(m.wall_offset[w])
        # deepest material point toward the wall: center − r·n (world-fixed
        # direction, expressed in body coordinates for the Jacobian)
        u_pt = jnp.asarray(m.con_pos, dtype) + _rot(-ang[cb], -radius[:, None] * n)
        pts_w, J, _, _ = point_jacobians(m, q, u_pt, cb, fkd=fkd)
        depths.append(d - pts_w @ n)
        Jns.append(jnp.einsum("c,pcv->pv", n, J))
        Jts.append(jnp.einsum("c,pcv->pv", _perp(n), J))
    mu = jnp.tile(jnp.asarray(m.con_friction, dtype), m.nwall)
    return jnp.concatenate(Jns), jnp.concatenate(Jts), jnp.concatenate(depths), mu


@_highest_precision
def penetration(m: PlanarModel, q) -> jax.Array:
    """Max penetration depth over all contact candidates (ground, walls,
    body-body pairs) — the JAX analog of the oracle's `ncon > 0` check in
    rejection-sampled episode inits."""
    fkd = fk_dofs(m, q)
    depths = [jnp.asarray(-jnp.inf, q.dtype)]
    if m.ncon:
        _, d = _contact_kinematics(m, q, fkd=fkd)
        depths.append(jnp.max(d))
        if m.nwall:
            _, _, dw, _ = _wall_kinematics(m, q, fkd=fkd)
            depths.append(jnp.max(dw))
    if m.npair:
        _, _, dp, _ = _pair_kinematics(m, q, fkd=fkd)
        depths.append(jnp.max(dp))
    return jnp.stack(depths).max()


@_highest_precision
def _rope_kinematics(m: PlanarModel, q, fkd=None):
    """Tendon-limit (max-length rope) rows.

    Returns (J (nrope, nv), stretch (nrope,)). J is MINUS the extension
    rate, so a positive impulse shortens the rope; stretch > 0 means the
    limit is violated.
    """
    dtype = q.dtype
    fkd = fk_dofs(m, q) if fkd is None else fkd
    pos, ang, _, _ = fkd
    xs, Js = [], []
    for side in (0, 1):
        b = np.asarray(m.rope_body[:, side])
        local = jnp.asarray(m.rope_pos[:, side], dtype)
        world_mask = b < 0
        b_safe = np.maximum(b, 0)
        x_body = pos[b_safe] + _rot(ang[b_safe], local)
        x = jnp.where(jnp.asarray(world_mask)[:, None], local, x_body)
        _, J, _, _ = point_jacobians(m, q, local, b_safe, fkd=fkd)
        J = J * (1.0 - jnp.asarray(world_mask, dtype))[:, None, None]
        xs.append(x)
        Js.append(J)
    d = xs[1] - xs[0]
    length = jnp.linalg.norm(d, axis=-1)
    direction = d / jnp.maximum(length, 1e-9)[:, None]
    J_rel = Js[1] - Js[0]
    J = -jnp.einsum("rc,rcv->rv", direction, J_rel)
    stretch = length - jnp.asarray(m.rope_max, dtype)
    return J, stretch


@_highest_precision
def constraint_project(m: PlanarModel, q, v, M_inv, h: float, n_iter: int = 10,
                       solver: str = "jacobi", fkd=None):
    """Project candidate velocity `v` onto the feasible set of contact and
    joint-limit constraints via impulses. Returns the corrected velocity.

    solver='jacobi': build the Delassus operator W = J M⁻¹ Jᵀ over ALL
    constraint rows and run diag-scaled under-relaxed projected Jacobi —
    every sweep is one small batched matvec, which is what a vector unit
    wants (the sequential Gauss-Seidel chain was ~6× of the whole step
    cost). solver='gs': the original sequential PGS (reference/cross-check;
    ground contacts + limits only).
    """
    if (
        solver == "jacobi"
        or m.npair or m.nrope or m.has_dof_friction or m.neq or m.nwall
    ):
        return _project_jacobi(m, q, v, M_inv, h, n_iter=max(n_iter, 20), fkd=fkd)
    return _project_gs(m, q, v, M_inv, h, n_iter=n_iter)


@_highest_precision
def constraint_project_impulses(m: PlanarModel, q, v, M_inv, h: float,
                                n_iter: int = 20, fkd=None):
    """Like `constraint_project` (jacobi path) but also returns the normal
    contact impulses: dict(ground (ncon,), pair (npair,)) — the data behind
    MuJoCo-style touch sensors."""
    return _project_jacobi(m, q, v, M_inv, h, n_iter=n_iter,
                           return_impulses=True, fkd=fkd)


def has_constraints(m: PlanarModel) -> bool:
    return bool(
        m.ncon or m.npair or m.nrope or m.has_dof_friction or np.any(m.limited)
        or m.neq
    )


# Baumgarte push-out velocity cap (m/s resp. rad/s). Healthy resting
# violations are ~1e-3 units → push targets ~0.05, far below the cap; but a
# DEEP violation (a crumpled hopper driven ~2 rad past a joint limit) would
# otherwise command viol/timeconst ≈ 100 rad/s and inject unbounded energy
# every substep — the runaway that NaN'd hopper-stand/walker-run training.
# MuJoCo's solref dynamics are impedance-weighted damped springs and
# therefore bounded; this cap is the velocity-level equivalent.
_PUSH_CAP = 2.0


@_highest_precision
def _project_jacobi(m: PlanarModel, q, v, M_inv, h: float, n_iter: int = 20,
                    relax: float = 0.7, return_impulses: bool = False,
                    fkd=None):
    """Row layout: [normals (ground+pair+wall) | tangents (same, boxed by
    μ·λn) | dof-friction (boxed by frictionloss·h) | nonneg (ropes, limits)
    | free (equality couplings)].
    """
    dtype = q.dtype
    has_limits = bool(np.any(m.limited))
    nc, npair, nrope, ne = m.ncon, m.npair, m.nrope, m.neq
    nwall = nc * m.nwall
    has_fric = m.has_dof_friction
    if not (nc or npair or nrope or has_fric or has_limits or ne):
        if return_impulses:
            return v, {"ground": jnp.zeros(0, dtype), "pair": jnp.zeros(0, dtype),
                       "wall": jnp.zeros(0, dtype)}
        return v

    if fkd is None and (nc or npair or nrope):
        fkd = fk_dofs(m, q)
    n_rows, n_targets, mus = [], [], []
    t_rows = []
    if nc:
        J, depth = _contact_kinematics(m, q, fkd=fkd)
        active = (depth > 0).astype(dtype)
        n_rows.append(J[:, 1, :] * active[:, None])
        t_rows.append(J[:, 0, :] * active[:, None])
        n_targets.append(jnp.minimum(jnp.maximum(depth, 0.0) / m.contact_timeconst, _PUSH_CAP))
        mus.append(jnp.asarray(m.con_friction, dtype))
    if npair:
        Jn, Jt, depth, mu = _pair_kinematics(m, q, fkd=fkd)
        active = (depth > 0).astype(dtype)
        n_rows.append(Jn * active[:, None])
        t_rows.append(Jt * active[:, None])
        # Pair push-out target (see PlanarModel.pair_push):
        # - 'soft' (default): depth/timeconst, MuJoCo solref-like. Lets a
        #   fingertip PRESS into the paddle and sweep — the strategy that
        #   actually spins finger-spin (the stiff variant ejected the
        #   finger on contact and PPO flatlined at 0.0 reward over 25M
        #   steps; measured r3).
        # - 'stiff_dynamic': velocity-gated depth/(β·dt) matching MuJoCo's
        #   impact impulse scale; kept for impact-dominated scenes.
        if m.pair_push == "stiff_dynamic":
            speed = jnp.abs(Jn @ v) + jnp.abs(Jt @ v)
            dyn = jnp.clip((speed - 0.1) / 0.4, 0.0, 1.0)
            beta = 1.0 + dyn * (m.pair_beta - 1.0)
            tgt = jnp.maximum(depth, 0.0) / (beta * h)
        else:
            tgt = jnp.maximum(depth, 0.0) / m.contact_timeconst
        n_targets.append(jnp.minimum(tgt, _PUSH_CAP))
        mus.append(mu)
    if nwall:
        Jn, Jt, depth, mu = _wall_kinematics(m, q, fkd=fkd)
        active = (depth > 0).astype(dtype)
        n_rows.append(Jn * active[:, None])
        t_rows.append(Jt * active[:, None])
        n_targets.append(jnp.minimum(jnp.maximum(depth, 0.0) / m.contact_timeconst, _PUSH_CAP))
        mus.append(mu)

    rows, targets = [], []
    if n_rows:
        rows += n_rows + t_rows
        targets += n_targets + [jnp.zeros_like(t) for t in n_targets]
        mu_all = jnp.concatenate(mus)
    N = nc + npair + nwall

    if has_fric:
        fric_dofs = np.flatnonzero(np.asarray(m.frictionloss) > 0)
        Jf = jnp.zeros((len(fric_dofs), m.nv), dtype).at[
            np.arange(len(fric_dofs)), fric_dofs
        ].set(1.0)
        fric_bound = jnp.asarray(m.frictionloss[fric_dofs] * h, dtype)
        rows.append(Jf)
        targets.append(jnp.zeros(len(fric_dofs), dtype))
        F = len(fric_dofs)
    else:
        F = 0

    if nrope:
        Jr, stretch = _rope_kinematics(m, q, fkd=fkd)
        active = (stretch > 0).astype(dtype)
        rows.append(Jr * active[:, None])
        targets.append(jnp.minimum(jnp.maximum(stretch, 0.0) / m.contact_timeconst, _PUSH_CAP))
    if has_limits:
        lo = jnp.asarray(m.joint_range[:, 0], dtype)
        hi = jnp.asarray(m.joint_range[:, 1], dtype)
        viol_lo = jnp.maximum(lo - q, 0.0)
        viol_hi = jnp.maximum(q - hi, 0.0)
        lim_sign = jnp.sign(viol_lo - viol_hi) * jnp.asarray(m.limited, dtype)
        rows.append(jnp.diag(lim_sign))  # row j = s_j e_j (zero when inactive)
        targets.append(jnp.minimum((viol_lo + viol_hi) / m.limit_timeconst, _PUSH_CAP))
    if ne:
        # bilateral coupling rows: drive E q back to eq_ref (λ unbounded)
        E = jnp.asarray(m.eq_moment, dtype)
        rows.append(E)
        targets.append(jnp.clip(
            -(E @ q - jnp.asarray(m.eq_ref, dtype)) / m.eq_timeconst,
            -_PUSH_CAP, _PUSH_CAP,
        ))

    J_all = jnp.concatenate(rows, 0)  # (C, nv)
    target = jnp.concatenate(targets, 0)  # (C,)
    nn_end = J_all.shape[0] - ne  # rows in [2N+F, nn_end) are λ ≥ 0

    MJ = J_all @ M_inv  # (C, nv)
    W = MJ @ J_all.T  # (C, C) Delassus
    # Row-sum (mass-splitting) scaling, NOT plain diagonal scaling: for
    # PSD W, diag(Σ_j |W_ij|) ⪰ W (symmetric diagonal dominance), so the
    # projected-Jacobi sweep below is a non-expansive projected gradient
    # step and provably converges. Diagonal scaling diverged on redundant
    # row stacks (12 ground contacts + limits on 7 dofs for a crumpled
    # hopper: |v| grew ~2× per 20 sweeps — the hopper/walker blowup).
    diagW = jnp.maximum(jnp.sum(jnp.abs(W), axis=1), 1e-9)
    if N:
        # Each contact's (normal, tangent) rows share one scale so the
        # per-pair metric is isotropic and the friction-CONE projection
        # below is the exact Euclidean projection in the scaled norm
        # (larger shared scale only slows convergence, never diverges).
        shared = jnp.maximum(diagW[:N], diagW[N : 2 * N])
        diagW = jnp.concatenate([shared, shared, diagW[2 * N :]])
    b = J_all @ v - target
    # Elliptic-cone treatment for body-body pair rows (manipulation
    # domains): MuJoCo's convex solver projects (λn, λt) JOINTLY onto the
    # friction cone, so strong tangential slip raises the normal force —
    # the mechanism that lets a fingertip stroke fling the finger-spin
    # paddle (diagnosed in tools/diag_finger_rows.py: boxed friction gave
    # 0.38 impulse where MuJoCo produced 0.98). Ground/wall rows keep the
    # boxed clamp that the validated locomotion curves were trained with;
    # revisit promoting them after re-benchmarking hopper/walker.
    cone = (jnp.zeros((N,), bool).at[nc : nc + npair].set(m.pair_cone)
            if N else None)

    def project(lam):
        parts = []
        if N:
            ln, lt = lam[:N], lam[N : 2 * N]
            at = jnp.abs(lt)
            # joint projection onto {(n, t): n >= 0, |t| <= mu n}
            inside = at <= mu_all * ln
            polar = mu_all * at <= -ln  # polar cone -> zero impulse
            s = (ln + mu_all * at) / (1.0 + mu_all * mu_all)
            ln_cone = jnp.where(inside, jnp.maximum(ln, 0.0),
                                jnp.where(polar, 0.0, s))
            lt_cone = jnp.where(inside, lt,
                                jnp.where(polar, 0.0, jnp.sign(lt) * mu_all * s))
            # boxed fallback (ground/wall rows)
            ln_box = jnp.maximum(ln, 0.0)
            lt_box = jnp.clip(lt, -mu_all * ln_box, mu_all * ln_box)
            parts += [jnp.where(cone, ln_cone, ln_box),
                      jnp.where(cone, lt_cone, lt_box)]
        if F:
            parts.append(jnp.clip(lam[2 * N : 2 * N + F], -fric_bound, fric_bound))
        if nn_end > 2 * N + F:
            parts.append(jnp.maximum(lam[2 * N + F : nn_end], 0.0))
        if ne:
            parts.append(lam[nn_end:])  # equality impulses are free
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def sweep(_, lam):
        resid = W @ lam + b
        return project(lam - relax * resid / diagW)

    lam = jax.lax.fori_loop(0, n_iter, sweep, jnp.zeros(J_all.shape[0], dtype))
    v_new = v + MJ.T @ lam
    if return_impulses:
        return v_new, {
            "ground": lam[:nc],
            "pair": lam[nc : nc + npair],
            "wall": lam[nc + npair : N],
        }
    return v_new


@_highest_precision
def _project_gs(m: PlanarModel, q, v, M_inv, h: float, n_iter: int = 10):
    dtype = q.dtype
    has_limits = bool(np.any(m.limited))
    if m.ncon == 0 and not has_limits:
        return v

    # --- precompute constraint rows, effective masses, targets ---
    if m.ncon:
        J, depth = _contact_kinematics(m, q)
        active = depth > 0
        mu = jnp.asarray(m.con_friction, dtype)
        Jn, Jt = J[:, 1, :], J[:, 0, :]
        MJn = Jn @ M_inv  # (ncon, nv)
        MJt = Jt @ M_inv
        wn = jnp.maximum(jnp.einsum("cv,cv->c", Jn, MJn), 1e-9)
        wt = jnp.maximum(jnp.einsum("cv,cv->c", Jt, MJt), 1e-9)
        # Baumgarte push-out: resolve penetration over contact_timeconst.
        v_push = jnp.minimum(jnp.where(active, depth, 0.0) / m.contact_timeconst, _PUSH_CAP)
    if has_limits:
        lo = jnp.asarray(m.joint_range[:, 0], dtype)
        hi = jnp.asarray(m.joint_range[:, 1], dtype)
        viol_lo = jnp.maximum(lo - q, 0.0)
        viol_hi = jnp.maximum(q - hi, 0.0)
        lim_sign = jnp.sign(viol_lo - viol_hi) * jnp.asarray(m.limited, dtype)
        lim_push = jnp.minimum((viol_lo + viol_hi) / m.limit_timeconst, _PUSH_CAP)
        w_dof = jnp.maximum(jnp.diagonal(M_inv), 1e-9)
        lim_dofs = [j for j in range(m.nv) if m.limited[j]]

    def iteration(_, carry):
        v, lam_n, lam_t, lam_l = carry
        if m.ncon:
            for c in range(m.ncon):
                # normal: v_n >= v_push, lam_n >= 0
                vn = Jn[c] @ v
                new = jnp.maximum(lam_n[c] + (v_push[c] - vn) / wn[c], 0.0)
                new = jnp.where(active[c], new, 0.0)
                v = v + MJn[c] * (new - lam_n[c])
                lam_n = lam_n.at[c].set(new)
                # friction: drive v_t -> 0, |lam_t| <= mu * lam_n
                vt = Jt[c] @ v
                bound = mu[c] * lam_n[c]
                new_t = jnp.clip(lam_t[c] - vt / wt[c], -bound, bound)
                v = v + MJt[c] * (new_t - lam_t[c])
                lam_t = lam_t.at[c].set(new_t)
        if has_limits:
            for j in lim_dofs:
                s = lim_sign[j]
                vj = s * v[j]
                new = jnp.maximum(lam_l[j] + (lim_push[j] - vj) / w_dof[j], 0.0)
                new = jnp.where(s != 0, new, 0.0)
                v = v + M_inv[:, j] * (s * (new - lam_l[j]))
                lam_l = lam_l.at[j].set(new)
        return v, lam_n, lam_t, lam_l

    lam_n0 = jnp.zeros(m.ncon, dtype)
    lam_t0 = jnp.zeros(m.ncon, dtype)
    lam_l0 = jnp.zeros(m.nv, dtype)
    v, *_ = jax.lax.fori_loop(0, n_iter, iteration, (v, lam_n0, lam_t0, lam_l0))
    return v


def passive_spring_forces(m: PlanarModel, q) -> jax.Array:
    return -jnp.asarray(m.stiffness, q.dtype) * (q - jnp.asarray(m.springref, q.dtype))


@_highest_precision
def fluid_forces(m: PlanarModel, q, qd, fkd=None) -> jax.Array:
    """Generalized quadratic fluid drag — the MuJoCo inertia-box fluid
    model's density term (mj_passive; the swimmer domain's swimming
    forces). Coefficients are baked per body (model.py `fluid_lin/ang`);
    verified exact against `qfrc_passive` in tests/test_swimmer.py.

    Per body: drag force −c_i·|v_i|·v_i in body-frame in-plane axes applied
    at the COM, plus torque −c_ω·|ω|·ω about the plane normal, mapped to
    generalized coordinates through the COM point Jacobians (linear) and
    the hinge ancestor mask (angular). All conventions are the engine's
    own (self-consistent with fk/_rot), so the formula holds for both
    planes."""
    dtype = q.dtype
    fkd = fk_dofs(m, q) if fkd is None else fkd
    _, Jv, _, ang = point_jacobians(m, q, m.com, np.arange(m.nb), fkd=fkd)
    sign = jnp.asarray([m.dof_axis[j][0] if m.dof_type[j] == HINGE else 0.0
                        for j in range(m.nv)], dtype)
    Jw = jnp.asarray(_ancestor_dof_mask(m), dtype) * sign[None, :]  # (nb, nv)
    v_com = jnp.einsum("bcv,v->bc", Jv, qd)
    w = Jw @ qd
    v_body = _rot(-ang, v_com)
    f_body = -jnp.asarray(m.fluid_lin, dtype) * jnp.abs(v_body) * v_body
    torque = -jnp.asarray(m.fluid_ang, dtype) * jnp.abs(w) * w  # (nb,)
    if m.fluid_visc_lin is not None:  # linear (Stokes) viscosity terms
        f_body = f_body - jnp.asarray(m.fluid_visc_lin, dtype)[:, None] * v_body
        torque = torque - jnp.asarray(m.fluid_visc_ang, dtype) * w
    f_world = _rot(ang, f_body)  # (nb, 2)
    return jnp.einsum("bcv,bc->v", Jv, f_world) + Jw.T @ torque


@_highest_precision
def actuation(m: PlanarModel, ctrl) -> jax.Array:
    """Generalized forces from motor actuators (ctrl clipped to [-1, 1]).
    Fixed-tendon transmissions use the general moment matrix."""
    ctrl = jnp.clip(ctrl, -1.0, 1.0)
    if m.act_moment is not None:
        return jnp.asarray(m.act_moment, ctrl.dtype).T @ ctrl
    tau = jnp.zeros(m.nv, ctrl.dtype)
    return tau.at[np.asarray(m.act_dof)].add(jnp.asarray(m.gear, ctrl.dtype) * ctrl)


# ---------------------------------------------------------------------------
# Forward dynamics + integrators
# ---------------------------------------------------------------------------


@_highest_precision
def smooth_forces(m: PlanarModel, q, qd, ctrl, fkd=None, fkd_dot=None):
    """Actuation + joint springs + fluid drag − bias. Joint damping and
    unilateral constraints are handled by the integrators. Fluid drag is
    explicit-in-velocity, matching MuJoCo (only joint damping is implicit
    in its Euler integrator). Pass (fkd, fkd_dot) from `fk_dofs_dot` to
    share one FK evaluation across bias/fluid (the integrators do)."""
    if fkd is None or fkd_dot is None:
        fkd, fkd_dot = fk_dofs_dot(m, q, qd)
    f = (actuation(m, ctrl) + passive_spring_forces(m, q)
         - bias_forces(m, q, qd, fkd=fkd, fkd_dot=fkd_dot))
    if m.has_fluid:
        f = f + fluid_forces(m, q, qd, fkd=fkd)
    return f


@_highest_precision
def forward_explicit(m: PlanarModel, q, qd, ctrl) -> jax.Array:
    """qacc from smooth dynamics with explicit joint damping (RK4 stages,
    matching MuJoCo RK4 which evaluates smooth forces per stage)."""
    fkd, fkd_dot = fk_dofs_dot(m, q, qd)
    M = mass_matrix(m, q, fkd=fkd)
    f = (smooth_forces(m, q, qd, ctrl, fkd=fkd, fkd_dot=fkd_dot)
         - jnp.asarray(m.damping, q.dtype) * qd)
    return solve_spd(M, f)


@_highest_precision
def step_euler(m: PlanarModel, q, qd, ctrl, h: float | None = None,
               return_impulses: bool = False):
    """Semi-implicit Euler with implicitly-integrated joint damping —
    (M + hD) v̇ = f − D v — then PGS constraint projection of the candidate
    velocity, then q += h v (MuJoCo 'Euler' + constraint-solver semantics)."""
    h = m.dt if h is None else h
    dtype = q.dtype
    ctrl = jnp.asarray(ctrl, dtype)
    D = jnp.asarray(m.damping, dtype)
    # ONE forward-kinematics evaluation (+ its time derivative) shared by
    # the mass matrix, bias, fluid drag and all constraint rows — the
    # round-4 profiling fix for the redundant per-substep FK recomputation.
    fkd, fkd_dot = fk_dofs_dot(m, q, qd)
    M = mass_matrix(m, q, fkd=fkd)
    # SPD small-matrix paths (linalg.py): jnp.linalg.inv/solve lower to
    # LU custom calls that dominated the whole train step (85% of device
    # time, results/profile_cheetah_256_r4.txt); the unrolled Cholesky
    # fuses into the substep.
    f = smooth_forces(m, q, qd, ctrl, fkd=fkd, fkd_dot=fkd_dot) - D * qd
    if m.implicit_impulse:
        # MuJoCo Euler semantics: (M + hD) v⁺ = M v + h f + h Jᵀλ — the
        # impulse metric is the implicitly-damped effective mass (one
        # inverse serves both the smooth solve and the Delassus operator).
        M_inv = inv_spd(M + h * jnp.diag(D))
        qacc = M_inv @ f
    else:
        M_inv = inv_spd(M)
        qacc = solve_spd(M + h * jnp.diag(D), f)
    v_star = qd + h * qacc
    if return_impulses:
        qd_new, imp = constraint_project_impulses(m, q, v_star, M_inv, h, fkd=fkd)
        return q + h * qd_new, qd_new, imp
    qd_new = constraint_project(m, q, v_star, M_inv, h, fkd=fkd)
    q_new = q + h * qd_new
    return q_new, qd_new


@_highest_precision
def step_rk4(m: PlanarModel, q, qd, ctrl, h: float | None = None):
    """Classic RK4 on the smooth dynamics (MuJoCo's RK4 integrator —
    cartpole domain), followed by constraint projection (no-op while joint
    limits are inactive, which is the oracle-parity regime)."""
    h = m.dt if h is None else h
    ctrl = jnp.asarray(ctrl, q.dtype)

    def deriv(state):
        qq, vv = state
        return vv, forward_explicit(m, qq, vv, ctrl)

    k1 = deriv((q, qd))
    k2 = deriv((q + 0.5 * h * k1[0], qd + 0.5 * h * k1[1]))
    k3 = deriv((q + 0.5 * h * k2[0], qd + 0.5 * h * k2[1]))
    k4 = deriv((q + h * k3[0], qd + h * k3[1]))
    q_new = q + (h / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
    qd_new = qd + (h / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
    if has_constraints(m):
        fkd = fk_dofs(m, q_new)
        M_inv = inv_spd(mass_matrix(m, q_new, fkd=fkd))
        qd_new = constraint_project(m, q_new, qd_new, M_inv, h, fkd=fkd)
    return q_new, qd_new


def make_stepper(m: PlanarModel, n_substeps: int = 1,
                 return_impulses: bool = False) -> Callable:
    """Returns `step(q, qd, ctrl) -> (q, qd)` advancing n_substeps physics
    steps of size m.dt (ctrl held constant — MuJoCo control-timestep
    semantics). With `return_impulses`, returns `(q, qd, imp)` where `imp`
    holds the normal contact impulses SUMMED over the substeps (divide by
    the control dt for mean contact force — touch-sensor semantics);
    Euler integrator only."""
    one = step_rk4 if m.integrator == "rk4" else step_euler

    if return_impulses:
        assert m.integrator != "rk4", "impulse outputs require the Euler path"

        def step_imp(q, qd, ctrl):
            def body(carry, _):
                qq, vv, acc = carry
                qq, vv, imp = step_euler(m, qq, vv, ctrl, return_impulses=True)
                acc = jax.tree.map(jnp.add, acc, imp)
                return (qq, vv, acc), None

            dtype = q.dtype
            acc0 = {
                "ground": jnp.zeros(m.ncon, dtype),
                "pair": jnp.zeros(m.npair, dtype),
                "wall": jnp.zeros(m.ncon * m.nwall, dtype),
            }
            (q, qd, acc), _ = jax.lax.scan(
                body, (q, qd, acc0), None, length=n_substeps
            )
            return q, qd, acc

        return step_imp

    def step(q, qd, ctrl):
        if n_substeps == 1:
            return one(m, q, qd, ctrl)

        def body(carry, _):
            qq, vv = carry
            qq, vv = one(m, qq, vv, ctrl)
            return (qq, vv), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=n_substeps)
        return q, qd

    return step


@_highest_precision
def subtree_com_velocity(m: PlanarModel, q, qd) -> jax.Array:
    """Whole-body COM velocity (vx, vz) — the `torso_subtreelinvel` sensor
    used by cheetah-run / walker reward (torso subtree = entire robot)."""
    v, _ = body_velocities(m, q, qd)
    mass = jnp.asarray(m.mass, q.dtype)
    return jnp.sum(mass[:, None] * v, 0) / m.total_mass
