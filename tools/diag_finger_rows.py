"""Dump constraint rows + impulses for the finger impact state, both sims.

Companion to diag_finger_impact.py: same pre-impact state, one step, with
full solver internals printed (our Jn/Jt/depth/W/lambda vs MuJoCo's contact
list, frame and efc_force).
"""

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

from surreal_tpu.envs import make_env
from surreal_tpu.envs.physics import engine

q0 = np.array([0.54, -0.55, 0.0])
qd0 = np.array([0.0, -6.0, 0.0])

# ---- MuJoCo side ----
env_o = suite.load("finger", "spin", task_kwargs={"random": 0})
env_o.reset()  # applies Spin init (hinge damping .03)
phys = env_o.physics
mj, d = phys.model._model, phys.data._data
with phys.reset_context():
    phys.data.qpos[:] = q0
    phys.data.qvel[:] = qd0
# step the PHYSICS once (10 ms) and inspect the contact state mid-step
mujoco.mj_step(mj, d)
print("MuJoCo after 1 physics step: qvel", d.qvel)
print("  ncon", d.ncon)
for i in range(d.ncon):
    c = d.contact[i]
    g1 = mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_GEOM, c.geom1)
    g2 = mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_GEOM, c.geom2)
    print(f"  con{i}: {g1}-{g2} dist {c.dist:.5f} pos {c.pos[[0, 2]]} "
          f"normal {c.frame[[0, 2]]}")
print("  efc_force", np.array(d.efc_force[: d.nefc]))
print("  qfrc_constraint", np.array(d.qfrc_constraint))

# ---- JAX side ----
env_j = make_env("finger-spin", dtype=jnp.float64)
m = env_j.model
q = jnp.asarray(q0)
qd = jnp.asarray(qd0)

fkd = engine.fk_dofs(m, q)
Jn, Jt, depth, mu = engine._pair_kinematics(m, q, fkd=fkd)
print("\nJAX pair rows (pre-step):")
gb = np.asarray(m.geom_body)
for p in range(m.npair):
    ia, ib = m.pair_geoms[p]
    print(f"  pair{p}: bodies {gb[ia]}-{gb[ib]} depth {float(depth[p]):.5f} "
          f"mu {float(mu[p]):.2f}")
    print(f"    Jn {np.asarray(Jn[p])}")
    print(f"    Jt {np.asarray(Jt[p])}")

M = engine.mass_matrix(m, q)
print("  M diag", np.diag(np.asarray(M)))
print("  M\n", np.asarray(M))
M_mj = np.zeros((mj.nv, mj.nv))
with phys.reset_context():
    phys.data.qpos[:] = q0
    phys.data.qvel[:] = qd0
mujoco.mj_forward(mj, d)
mujoco.mj_fullM(mj, d, M_mj)
print("  M_mj\n", M_mj)

# one Euler step with impulses
qn, qdn, imp = engine.step_euler(m, q, qd, jnp.zeros(2), return_impulses=True)
print("\nJAX after 1 physics step: qvel", np.asarray(qdn))
print("  impulses ground", np.asarray(imp["ground"]), "pair", np.asarray(imp["pair"]))

# effective inertia sanity: W for the pair rows
M_inv = jnp.linalg.inv(M)
W = Jn @ M_inv @ Jn.T
print("  W_nn (pair normals)\n", np.asarray(W))
print("  contact_timeconst", m.contact_timeconst, "dt", m.dt)
