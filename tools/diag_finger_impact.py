"""Single-impact finger->spinner momentum-transfer parity probe.

Finds a pre-impact configuration (fingertip ~2 mm from the paddle near its
top end, paddle vertical), gives the distal joint an approach velocity, and
steps both simulators with zero action, printing hinge velocity and contact
state step by step. Isolates one contact event with bit-matched initial
conditions so the impulse magnitudes are directly comparable.

Usage: python tools/diag_finger_impact.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from dm_control import suite

from surreal_tpu.envs import make_env

env_o = suite.load("finger", "spin", task_kwargs={"random": 0})
env_j = make_env("finger-spin", dtype=jnp.float64)

# ---- find a near-touch configuration with the oracle ----
phys = env_o.physics
env_o.reset()


def tip_and_dist(q):
    with phys.reset_context():
        phys.data.qpos[:] = q
        phys.data.qvel[:] = 0
    tip = phys.named.data.site_xpos["touchtop"][[0, 2]]
    # distance from fingertip center-line to cap1 axis region (crude): use
    # mujoco's contact distances after mj_forward via ncon/dist
    d = 1e9
    for i in range(phys.data.ncon):
        d = min(d, phys.data.contact.dist[i])
    return tip, d


best = None
for p in np.linspace(-1.2, 0.6, 61):
    for dq in np.linspace(-1.5, 1.5, 61):
        q = np.array([p, dq, 0.0])
        tip, _ = tip_and_dist(q)
        # target: fingertip near (0.2 - 0.06, 0.4 + 0.10): left face of the
        # paddle, near the top -> max torque arm
        err = np.linalg.norm(tip - np.array([0.2 - 0.075, 0.50]))
        if best is None or err < best[0]:
            best = (err, q.copy())
err, q0 = best
print(f"pre-impact qpos {q0} (tip placement err {err:.4f})")

qd0 = np.array([0.0, -6.0, 0.0])  # distal swings toward the paddle
T = 25

# ---- oracle rollout ----
env_o.reset()
with phys.reset_context():
    phys.data.qpos[:] = q0
    phys.data.qvel[:] = qd0
o_qd, o_touch = [], []
for t in range(T):
    ts = env_o.step(np.zeros(2))
    o_qd.append(phys.data.qvel.copy())
    o_touch.append(float(np.sum(ts.observation["touch"])))
o_qd = np.array(o_qd)

# ---- jax rollout ----
q = jnp.concatenate([jnp.asarray(q0), jnp.zeros(2)])
qd = jnp.concatenate([jnp.asarray(qd0), jnp.zeros(2)])
step = jax.jit(env_j._physics_step)
j_qd, j_touch = [], []
for t in range(T):
    q, qd = step(q, qd, jnp.zeros(2))
    j_qd.append(np.asarray(qd[:3]))
    j_touch.append(float(np.sum(np.asarray(env_j._obs(q, qd)["touch"]))))
j_qd = np.array(j_qd)

print(f"{'t':>3} {'o_hinge':>9} {'j_hinge':>9} {'o_distal':>9} {'j_distal':>9} "
      f"{'o_touch':>8} {'j_touch':>8}")
for t in range(T):
    print(f"{t:3d} {o_qd[t, 2]:9.3f} {j_qd[t, 2]:9.3f} "
          f"{o_qd[t, 1]:9.3f} {j_qd[t, 1]:9.3f} "
          f"{o_touch[t]:8.2f} {j_touch[t]:8.2f}")
print(f"peak |hinge|: oracle {np.abs(o_qd[:, 2]).max():.2f} "
      f"jax {np.abs(j_qd[:, 2]).max():.2f}")
