"""On-device rasterizer for planar scenes (pixel observations).

Role of the reference's pixel-observation path (dm_control
`physics.render(84, 84, camera_id=0)` through MuJoCo's OpenGL renderer,
SURVEY.md §2 env rows + §7 step 4): a TPU-native 2-D signed-distance
rasterizer over the planar model's capsule geoms. It is NOT pixel-identical
to MuJoCo's 3-D render (no GL on device); it is the behavioral equivalent:
an 84×84 egocentric view with body/ground/background contrast that a conv
policy can learn locomotion from. True-GL frames remain available host-side
via the oracle bridge for eval videos.

Per pixel, per geom: distance from the pixel center to the capsule's core
segment; coverage = smooth Heaviside of (radius − distance). All geoms
composite with max(); the ground plane fills z < 0. vmap over envs."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics.model import SLIDE, PlanarModel


def _geom_segments(m: PlanarModel):
    """Static per-geom data from the contact candidates: we re-derive
    segments from con_pos pairs when available; for contact-disabled models
    (cartpole/pendulum/acrobot) fall back to a link skeleton synthesized
    from the body tree. Returns (body_idx (G,), p0 (G,2), p1 (G,2),
    radius (G,))."""
    if m.ncon == 0:
        return _skeleton_segments(m)
    # con_pos holds capsule endpoints (two consecutive entries per capsule
    # geom, same body, same radius) — see model.from_mujoco.
    pts = m.con_pos
    bodies = np.asarray(m.con_body)
    radii = m.con_radius
    segs = []
    i = 0
    while i < len(bodies):
        if (
            i + 1 < len(bodies)
            and bodies[i + 1] == bodies[i]
            and radii[i + 1] == radii[i]
        ):
            segs.append((bodies[i], pts[i], pts[i + 1], radii[i]))
            i += 2
        else:
            segs.append((bodies[i], pts[i], pts[i], radii[i]))
            i += 1
    b = np.array([s[0] for s in segs])
    p0 = np.array([s[1] for s in segs])
    p1 = np.array([s[2] for s in segs])
    r = np.array([s[3] for s in segs])
    return b, p0, p1, r


def _skeleton_segments(m: PlanarModel):
    """Stick-figure render geoms for models with contacts disabled: each
    body draws origin → 2·COM (a uniform link's far end) plus a connector
    to every child's frame origin — behaviorally equivalent pixels (the
    conv policy needs pose contrast, not MuJoCo's exact materials)."""
    segs = []
    for b in range(m.nb):
        com = np.asarray(m.com[b], float)
        end = 2.0 * com
        if np.linalg.norm(end) < 1e-6:  # point body (e.g. the cart)
            end = np.array([0.0, 0.0])
            segs.append((b, np.array([-0.1, 0.0]), np.array([0.1, 0.0]), 0.05))
        else:
            segs.append((b, np.zeros(2), end, 0.045))
        for c in range(m.nb):
            if m.parent[c] == b and np.linalg.norm(m.body_pos[c]) > 1e-6:
                segs.append((b, np.zeros(2), np.asarray(m.body_pos[c], float), 0.04))
    b = np.array([s[0] for s in segs])
    return (b, np.array([s[1] for s in segs]), np.array([s[2] for s in segs]),
            np.array([s[3] for s in segs]))


def make_renderer(m: PlanarModel, height: int = 84, width: int = 84, half_extent: float = 1.2):
    """Returns `render(q) -> (H, W, 3) uint8` for one env state (vmap over
    a batch). The model is closed over (compile-time constant). Contact
    models render their capsule geoms; contact-disabled models (cartpole,
    pendulum, acrobot) render a body-tree stick figure."""
    gb, gp0, gp1, gr = _geom_segments(m)

    def render(q):
        return _render(m, q, gb, gp0, gp1, gr, height, width, half_extent)

    return render


def _render(m, q, gb, gp0, gp1, gr, height, width, half_extent):
    dtype = jnp.float32
    pos, ang = engine.fk(m, q)

    # world-space segment endpoints
    P0 = pos[gb] + engine._rot(ang[gb], jnp.asarray(gp0, dtype))  # (G, 2)
    P1 = pos[gb] + engine._rot(ang[gb], jnp.asarray(gp1, dtype))
    R = jnp.asarray(gr, dtype)

    cx = pos[0, 0]  # camera follows root body x
    # Free-floating locomotion roots (a z-slide dof on body 0: cheetah,
    # walker, hopper) get a fixed ground-relative camera height; fixed-base
    # models (cartpole, pendulum, acrobot, manipulation) are framed on the
    # root/pivot, which is static for them.
    root_floats = any(
        m.dof_body[j] == 0 and m.dof_type[j] == SLIDE and abs(m.dof_axis[j][1]) > 1e-8
        for j in range(m.nv)
    )
    if root_floats:
        cz = jnp.asarray(np.float32(0.6 * half_extent))
    else:
        cz = pos[0, 1]
    xs = cx + jnp.linspace(-half_extent, half_extent, width, dtype=dtype)
    zs = cz + jnp.linspace(half_extent, -half_extent, height, dtype=dtype)
    px = jnp.broadcast_to(xs[None, :], (height, width))
    pz = jnp.broadcast_to(zs[:, None], (height, width))
    pix = jnp.stack([px, pz], -1)  # (H, W, 2)

    # point-to-segment distance for every geom
    d = P1 - P0  # (G, 2)
    len2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)  # (G,)
    rel = pix[:, :, None, :] - P0[None, None, :, :]  # (H, W, G, 2)
    t = jnp.clip(jnp.einsum("hwgc,gc->hwg", rel, d) / len2, 0.0, 1.0)
    closest = P0[None, None] + t[..., None] * d[None, None]
    dist = jnp.sqrt(jnp.sum((pix[:, :, None] - closest) ** 2, -1) + 1e-12)  # (H,W,G)

    # anti-aliased coverage; pixel pitch sets the smoothing width
    pitch = 2 * half_extent / width
    cover = jax.nn.sigmoid((R[None, None] - dist) / (0.7 * pitch))  # (H, W, G)
    body_mask = jnp.max(cover, -1)
    # per-geom shade varies along the chain for contrast (like dm_control's
    # per-body materials)
    shades = jnp.asarray(np.linspace(0.55, 1.0, len(gb)), dtype)
    body_shade = jnp.max(cover * shades[None, None], -1)

    ground = jax.nn.sigmoid((0.0 - pz) / (0.7 * pitch))
    # World-fixed stripe texture on the ground (the role of dm_control's
    # checkered grid): without it an egocentric camera has no optical-flow
    # cue for horizontal velocity — the run-speed reward would be invisible
    # from pixels.
    stripes = 0.5 + 0.5 * jnp.sin(px * (2 * jnp.pi / 0.5))
    ground_shade = 0.38 + 0.14 * stripes
    # composite: background 0.2, textured ground, body shades on top
    img = 0.2 + (ground_shade - 0.2) * ground
    img = img * (1 - body_mask) + body_shade * body_mask
    rgb = jnp.stack(
        [img, img * (1 - 0.3 * body_mask), img * (1 - 0.6 * body_mask)], -1
    )  # bodies tinted; background/ground grayscale
    return (jnp.clip(rgb, 0, 1) * 255).astype(jnp.uint8)
