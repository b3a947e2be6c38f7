"""Ball-in-cup domain (JAX-native, dm_control-parity semantics).

Oracle source (dm_control 1.0.43 `suite/ball_in_cup.py`, `ball_in_cup.xml`):
an actuated planar cup (2 stiff slide joints) swings a free ball attached
by a 0.3 m string (limited spatial tendon) and must catch it. First
manipulation-family domain exercising the engine's body-body contacts
(ball sphere vs 5 cup-wall capsules) and rope constraint.

- physics dt 0.002, control dt 0.02 (10 substeps); episode 20 s = 1000 steps.
- init: cup at rest; ball x ~ U(-.2,.2), z ~ U(.2,.5) (body-relative),
  rejection-sampled to be collision-free (oracle loops until ncon == 0; we
  draw a fixed candidate batch and take the first non-penetrating one).
- obs: position = qpos (4,), velocity = qvel (4,).
- reward: sparse — 1 when the ball center is inside the in-cup target box
  (site (0,-.05) in cup frame, half-size .05) by more than the ball radius.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "ball_in_cup.npz")

_CUP_BODY_POS = jnp.array([0.0, 0.6])  # worldbody: cup at (0, .6)
_BALL_BODY_POS = jnp.array([0.0, 0.2])  # worldbody: ball at (0, .2)
_TARGET_IN_CUP = jnp.array([0.0, -0.05])  # target site, cup frame
_TARGET_HALF = 0.05  # site half-size in x and z
_BALL_RADIUS = 0.025
_INIT_CANDIDATES = 8


class BallInCup(base.Environment):
    episode_steps = 1000  # 20 s / 0.02 s

    def __init__(self, dtype=jnp.float32):
        self.model = pmodel.load(_ASSET)
        assert self.model.npair == 5 and self.model.nrope == 1
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=10)

    def obs_spec(self):
        return {
            "position": base.ArraySpec((4,), self.dtype),
            "velocity": base.ArraySpec((4,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((2,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        kx, kz = jax.random.split(key)
        bx = jax.random.uniform(kx, (_INIT_CANDIDATES,), self.dtype, -0.2, 0.2)
        bz = jax.random.uniform(kz, (_INIT_CANDIDATES,), self.dtype, 0.2, 0.5)
        qs = jnp.stack(
            [jnp.zeros_like(bx), jnp.zeros_like(bx), bx, bz], axis=-1
        )  # (K, 4)

        def max_depth(q):
            _, _, depth, _ = engine._pair_kinematics(self.model, q)
            return jnp.max(depth)

        depths = jax.vmap(max_depth)(qs)
        # first collision-free candidate (oracle rejection-samples; at least
        # one of K=8 is virtually always free — fall back to the deepest-free)
        free = depths <= 0.0
        idx = jnp.argmax(free)
        q = jnp.where(jnp.any(free), qs[idx], qs[jnp.argmin(depths)])
        return q, jnp.zeros((4,), self.dtype)

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _obs(self, q, qd):
        return {"position": q, "velocity": qd}

    def _reward(self, q, qd, action):
        cup = _CUP_BODY_POS.astype(q.dtype) + q[:2]
        ball = _BALL_BODY_POS.astype(q.dtype) + q[2:]
        target = cup + _TARGET_IN_CUP.astype(q.dtype)
        gap = jnp.abs(target - ball)
        inside = jnp.all(gap < (_TARGET_HALF - _BALL_RADIUS))
        return inside.astype(q.dtype)
