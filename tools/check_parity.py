"""Quick smooth-dynamics parity check vs MuJoCo (dev tool; formal version in tests/)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import mujoco
import numpy as np
from dm_control import suite

from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

rng = np.random.RandomState(0)
for dom, task in [("cartpole", "balance"), ("cheetah", "run"), ("walker", "walk")]:
    env = suite.load(dom, task)
    mj = env.physics.model._model
    d = env.physics.data._data
    pm = pmodel.load(f"surreal_tpu/envs/assets/{dom}.npz")
    errs = {"fk": 0.0, "M": 0.0, "bias": 0.0, "passive": 0.0}
    for trial in range(5):
        q = rng.uniform(-1, 1, mj.nq)
        qd = rng.uniform(-1, 1, mj.nv)
        d.qpos[:] = q
        d.qvel[:] = qd
        mujoco.mj_forward(mj, d)
        pos, ang = engine.fk(pm, jnp.array(q))
        pos, ang = np.asarray(pos), np.asarray(ang)
        mj_pos = d.xpos[1:][:, [0, 2]]
        xm = d.xmat[1:].reshape(-1, 3, 3)
        mj_ang = np.arctan2(xm[:, 0, 2], xm[:, 0, 0])
        errs["fk"] = max(
            errs["fk"],
            np.abs(pos - mj_pos).max(),
            np.abs(np.sin(ang) - np.sin(mj_ang)).max(),
            np.abs(np.cos(ang) - np.cos(mj_ang)).max(),
        )
        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        M = np.asarray(engine.mass_matrix(pm, jnp.array(q)))
        errs["M"] = max(errs["M"], np.abs(M - M_mj).max())
        bias = np.asarray(engine.bias_forces(pm, jnp.array(q), jnp.array(qd)))
        errs["bias"] = max(errs["bias"], np.abs(bias - d.qfrc_bias).max())
        passive = np.asarray(engine.passive_spring_forces(pm, jnp.array(q))) - pm.damping * qd
        errs["passive"] = max(errs["passive"], np.abs(passive - d.qfrc_passive).max())
    print(dom, {k: f"{v:.2e}" for k, v in errs.items()}, flush=True)
