"""Finger-spin dynamic-parity diagnosis vs the dm_control oracle.

Round-2 verdict: PPO plateaus at ~190 and DDPG at ~0.5 on finger-spin while
DDPG solves ball_in_cup — suspicion is an env/physics defect, not hyper-
parameters. This tool drives BOTH simulators with the same scripted action
sequences from matched states and compares, step by step:

  A. free-spin decay: hinge spun to -20 rad/s, finger curled away, zero
     action -> tests hinge damping (.03 after Spin init) + frictionloss (.1)
     and the reward event (qvel <= -15).
  B. scripted batting: fingertip placed near the spinner, periodic flick
     actions -> tests contact force transfer (can the finger spin it up?).
  C. reward statistics over random-action rollouts from matched inits.

Usage: python tools/diag_finger.py
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


def oracle_env():
    env = suite.load("finger", "spin", task_kwargs={"random": 0})
    return env


def oracle_rollout(env, q0, qd0, actions):
    """Reset (to apply Spin init: damping .03), overwrite state, roll."""
    env.reset()
    phys = env.physics
    with phys.reset_context():
        phys.data.qpos[:] = q0
        phys.data.qvel[:] = qd0
    qs, qds, rews, touches = [], [], [], []
    for a in actions:
        ts = env.step(a)
        qs.append(phys.data.qpos.copy())
        qds.append(phys.data.qvel.copy())
        rews.append(float(ts.reward))
        touches.append(np.array(ts.observation["touch"]))
    return np.array(qs), np.array(qds), np.array(rews), np.array(touches)


def jax_rollout(env, q0, qd0, actions):
    q = jnp.concatenate([jnp.asarray(q0, jnp.float64), jnp.zeros(2, jnp.float64)])
    qd = jnp.concatenate([jnp.asarray(qd0, jnp.float64), jnp.zeros(2, jnp.float64)])
    step = jax.jit(env._physics_step)
    qs, qds, rews, touches = [], [], [], []
    for a in actions:
        q, qd = step(q, qd, jnp.asarray(a, jnp.float64))
        obs = env._obs(q, qd)
        rews.append(float(env._reward(q, qd, jnp.asarray(a))))
        qs.append(np.asarray(q[:3]))
        qds.append(np.asarray(qd[:3]))
        touches.append(np.asarray(obs["touch"]))
    return np.array(qs), np.array(qds), np.array(rews), np.array(touches)


def main():
    o_env = oracle_env()
    j_env = make_env("finger-spin", dtype=jnp.float64)

    # ---- A. free-spin decay ----------------------------------------
    q0 = np.array([1.5, 1.5, 0.0])   # finger curled up away from spinner
    qd0 = np.array([0.0, 0.0, -20.0])
    T = 200
    actions = np.zeros((T, 2))
    oq, oqd, orew, _ = oracle_rollout(o_env, q0, qd0, actions)
    jq, jqd, jrew, _ = jax_rollout(j_env, q0, qd0, actions)
    print("== A. free-spin decay (hinge qvel; reward steps) ==")
    for t in (0, 10, 25, 50, 100, 199):
        print(f"  t={t:4d} oracle {oqd[t, 2]:8.3f}  jax {jqd[t, 2]:8.3f}  "
              f"d_hinge_q {abs(oq[t, 2] - jq[t, 2]):.4f}")
    print(f"  reward steps: oracle {orew.sum():.0f}  jax {jrew.sum():.0f} / {T}")

    # ---- B. scripted batting ---------------------------------------
    # proximal=0 (pointing down from (-.2,.4) after ref=-90 -> horizontal
    # toward the spinner); flick the distal joint periodically.
    q0 = np.array([-0.4, 0.3, 0.5])
    qd0 = np.zeros(3)
    T = 400
    t = np.arange(T)
    actions = np.stack([
        0.4 * np.sin(2 * np.pi * t / 50.0),
        np.where((t // 25) % 2 == 0, 1.0, -1.0),
    ], axis=1)
    oq, oqd, orew, otc = oracle_rollout(o_env, q0, qd0, actions)
    jq, jqd, jrew, jtc = jax_rollout(j_env, q0, qd0, actions)
    print("== B. scripted batting (hinge qvel trace) ==")
    for s in range(0, T, 50):
        print(f"  t={s:4d} oracle {oqd[s, 2]:8.3f}  jax {jqd[s, 2]:8.3f}  "
              f"touch o={otc[s].sum():.2f} j={jtc[s].sum():.2f}")
    print(f"  min hinge qvel: oracle {oqd[:, 2].min():.2f}  jax {jqd[:, 2].min():.2f}")
    print(f"  max |hinge qvel|: oracle {np.abs(oqd[:, 2]).max():.2f}  "
          f"jax {np.abs(jqd[:, 2]).max():.2f}")
    print(f"  reward steps: oracle {orew.sum():.0f}  jax {jrew.sum():.0f} / {T}")
    print(f"  touch>0 frac: oracle {(otc.sum(1) > 0).mean():.2f}  "
          f"jax {(jtc.sum(1) > 0).mean():.2f}")

    # ---- C. random-action reward statistics ------------------------
    rng = np.random.RandomState(1)
    tot_o, tot_j = 0.0, 0.0
    for ep in range(5):
        q0 = np.array([rng.uniform(-1.9, 1.9), rng.uniform(-1.9, 1.9),
                       rng.uniform(-np.pi, np.pi)])
        qd0 = np.zeros(3)
        actions = rng.uniform(-1, 1, (500, 2))
        *_, orew, _ = oracle_rollout(o_env, q0, qd0, actions)
        *_, jrew, _ = jax_rollout(j_env, q0, qd0, actions)
        tot_o += orew.sum()
        tot_j += jrew.sum()
        print(f"  ep{ep}: oracle {orew.sum():5.0f}  jax {jrew.sum():5.0f} / 500")
    print(f"== C. random-action totals: oracle {tot_o:.0f}  jax {tot_j:.0f} ==")


if __name__ == "__main__":
    main()
