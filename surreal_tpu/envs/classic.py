"""Pendulum and Acrobot domains (JAX-native, dm_control-parity semantics).

Oracle sources (dm_control 1.0.43): `suite/pendulum.py` (swingup: init
hinge ~U(-π,π); obs orientation=(cos θ, sin θ) + qvel; reward
tolerance(cos θ, (cos 8°, 1))) and `suite/acrobot.py` (swingup[_sparse]:
init both joints ~U(-π,π); obs per-arm (sin, cos) orientations + qvel;
reward tolerance(‖tip − target‖, (0, r_target=0.2), margin 1 or 0)).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")

_COSINE_BOUND = math.cos(math.radians(8.0))


class PendulumSwingup(base.Environment):
    episode_steps = 1000  # 20 s / 0.02 s

    def __init__(self, dtype=jnp.float32):
        self.model = pmodel.load(os.path.join(_ASSETS, "pendulum.npz"))
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=1)

    def obs_spec(self):
        return {
            "orientation": base.ArraySpec((2,), self.dtype),
            "velocity": base.ArraySpec((1,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((1,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        theta = jax.random.uniform(key, (1,), self.dtype, -jnp.pi, jnp.pi)
        return theta, jnp.zeros((1,), self.dtype)

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _obs(self, q, qd):
        return {
            "orientation": jnp.stack([jnp.cos(q[0]), jnp.sin(q[0])]),
            "velocity": qd,
        }

    def _reward(self, q, qd, action):
        return rewards.tolerance(jnp.cos(q[0]), (_COSINE_BOUND, 1.0))


class AcrobotSwingup(base.Environment):
    episode_steps = 1000  # 10 s / 0.01 s
    _TARGET = (0.0, 4.0)  # world (x, z) of the target site
    _TARGET_RADIUS = 0.2
    _TIP_LOCAL = (0.0, 1.0)  # tip site pos (0,0,1) in lower_arm frame

    def __init__(self, sparse: bool = False, dtype=jnp.float32):
        self.model = pmodel.load(os.path.join(_ASSETS, "acrobot.npz"))
        self.sparse = sparse
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=1)

    def obs_spec(self):
        return {
            "orientations": base.ArraySpec((4,), self.dtype),
            "velocity": base.ArraySpec((2,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((1,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        q = jax.random.uniform(key, (2,), self.dtype, -jnp.pi, jnp.pi)
        return q, jnp.zeros((2,), self.dtype)

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _tip(self, q):
        pos, ang = engine.fk(self.model, q)
        return pos[1] + engine._rot(ang[1], jnp.asarray(self._TIP_LOCAL, q.dtype))

    def _obs(self, q, qd):
        _, ang = engine.fk(self.model, q)
        # oracle: horizontal = xmat xz (= sin θ), vertical = xmat zz (= cos θ)
        return {
            "orientations": jnp.concatenate([jnp.sin(ang), jnp.cos(ang)]),
            "velocity": qd,
        }

    def _reward(self, q, qd, action):
        tip = self._tip(q)
        dist = jnp.linalg.norm(jnp.asarray(self._TARGET, q.dtype) - tip)
        return rewards.tolerance(
            dist, (0.0, self._TARGET_RADIUS), margin=0.0 if self.sparse else 1.0
        )
