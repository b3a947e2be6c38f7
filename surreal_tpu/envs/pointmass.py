"""Point-mass domain (JAX-native, dm_control-parity semantics).

Oracle source (dm_control 1.0.43 `suite/point_mass.py`, `point_mass.xml`):
a 2-dof planar point mass in the HORIZONTAL (x-y) plane, driven through
fixed tendons (identity mixing for the `easy` task), must reach a target
at the origin.

- init: both (limited) slide joints ~ U(-.29, .29); zero velocity.
- obs: position = qpos (2,), velocity = qvel (2,).
- reward: tolerance(‖mass − target‖, (0, .015), margin=.015)
          × (tolerance(ctrl, margin=1, value_at_margin=0,
             sigmoid='quadratic').mean() + 4) / 5.

The `hard` task randomizes the tendon gain mixing per episode; dm_control's
benchmarking set only includes `easy`, which is what we implement.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base, rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "point_mass.npz")

_TARGET_SIZE = 0.015


class PointMass(base.Environment):
    episode_steps = 1000  # 20 s / 0.02 s

    def __init__(self, dtype=jnp.float32):
        self.model = pmodel.load(_ASSET)
        assert self.model.plane == "xy"
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=1)

    def obs_spec(self):
        return {
            "position": base.ArraySpec((2,), self.dtype),
            "velocity": base.ArraySpec((2,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((2,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        lo = jnp.asarray(self.model.joint_range[:, 0], self.dtype)
        hi = jnp.asarray(self.model.joint_range[:, 1], self.dtype)
        q = jax.random.uniform(key, (2,), self.dtype, lo, hi)
        return q, jnp.zeros((2,), self.dtype)

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _obs(self, q, qd):
        return {"position": q, "velocity": qd}

    def _reward(self, q, qd, action):
        dist = jnp.linalg.norm(q)  # mass at q; target at the origin
        near = rewards.tolerance(dist, (0.0, _TARGET_SIZE), margin=_TARGET_SIZE)
        ctrl = rewards.tolerance(
            jnp.clip(action, -1.0, 1.0),
            margin=1.0,
            value_at_margin=0.0,
            sigmoid="quadratic",
        ).mean()
        return near * (ctrl + 4.0) / 5.0
