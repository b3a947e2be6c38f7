"""Cheetah domain (JAX-native, dm_control-parity semantics).

Oracle semantics (dm_control 1.0.43 `suite/cheetah.py`):
- init: limited joints ~ U(jnt_range), then 200 physics steps of settling
  with zero control, time reset to 0 (lines 63-76 of the oracle source).
- obs: qpos[1:] (translation-invariant) + qvel (lines 78-84).
- reward: tolerance(speed, bounds=(10, inf), margin=10, value_at_margin=0,
  sigmoid='linear'), speed = torso-subtree COM x-velocity (lines 86-92).

TPU-first deviations (documented):
- The 200-step settle would be prohibitive to recompute inside the jitted
  auto-reset path, so episode start states come from a POOL of pre-settled
  states baked offline with THIS engine (tools/bake_assets.py); reset
  samples a pool row. The pool is drawn from exactly the oracle's init
  distribution, settled to rest contact.
- Contacts/limits use the engine's PGS impulse solver (see
  physics/engine.py); physics timestep matches MuJoCo's 0.01 s.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs import base
from surreal_tpu.envs import rewards
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "cheetah.npz")
_POOL = os.path.join(os.path.dirname(__file__), "assets", "cheetah_pool.npz")

_RUN_SPEED = 10.0


class CheetahRun(base.Environment):
    episode_steps = 1000  # 10 s / 0.01 s control timestep

    def __init__(self, dtype=jnp.float32, n_substeps: int = 1):
        m = pmodel.load(_ASSET)
        self.model = m.replace(dt=m.dt / n_substeps)
        self.dtype = dtype
        self._step_fn = engine.make_stepper(self.model, n_substeps=n_substeps)
        pool = np.load(_POOL)
        self._pool_q = pool["q"].astype(np.float32)
        self._pool_qd = pool["qd"].astype(np.float32)

    def obs_spec(self):
        return {
            "position": base.ArraySpec((8,), self.dtype),
            "velocity": base.ArraySpec((9,), self.dtype),
        }

    def action_spec(self):
        return base.ArraySpec((6,), self.dtype, -1.0, 1.0)

    def _init(self, key):
        idx = jax.random.randint(key, (), 0, self._pool_q.shape[0])
        q = jnp.asarray(self._pool_q, self.dtype)[idx]
        qd = jnp.asarray(self._pool_qd, self.dtype)[idx]
        return q, qd

    def _physics_step(self, q, qd, action):
        return self._step_fn(q, qd, action)

    def _obs(self, q, qd):
        return {"position": q[1:], "velocity": qd}

    def _reward(self, q, qd, action):
        speed = engine.subtree_com_velocity(self.model, q, qd)[0]
        return rewards.tolerance(
            speed,
            bounds=(_RUN_SPEED, float("inf")),
            margin=_RUN_SPEED,
            value_at_margin=0,
            sigmoid="linear",
        )

    # ---- offline pool generation (used by tools/bake_assets.py) ----
    @staticmethod
    def generate_pool(model: pmodel.PlanarModel, key, size: int = 4096):
        """Sample oracle-style random joint configs and settle them with zero
        control for 2 simulated seconds (the oracle's 200 × 0.01 s)."""
        h = 0.01
        n_settle = int(round(2.0 / h))
        step = engine.make_stepper(model.replace(dt=h), n_substeps=1)
        lo = jnp.asarray(model.joint_range[:, 0])
        hi = jnp.asarray(model.joint_range[:, 1])
        limited = jnp.asarray(model.limited)

        def settle_one(k):
            u = jax.random.uniform(k, (model.nv,), minval=lo, maxval=hi)
            q = jnp.where(limited, u, 0.0)
            qd = jnp.zeros(model.nv)
            ctrl = jnp.zeros(model.nu)

            def body(carry, _):
                qq, vv = carry
                qq, vv = step(qq, vv, ctrl)
                return (qq, vv), None

            (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=n_settle)
            return q, qd

        keys = jax.random.split(key, size)
        return jax.jit(jax.vmap(settle_one))(keys)
