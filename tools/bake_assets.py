"""Bake PlanarModel assets from the installed dm_control suite XMLs.

Run offline (requires mujoco + dm_control):
    python tools/bake_assets.py

Writes surreal_tpu/envs/assets/<domain>.npz. The training path loads these
and never imports mujoco.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dm_control import suite  # noqa: E402

from surreal_tpu.envs.physics import model as pmodel  # noqa: E402

ASSETS = os.path.join(os.path.dirname(__file__), "..", "surreal_tpu", "envs", "assets")


DOMAINS = [
    # (domain, task, pair_collisions) — pairs opt-in: locomotion domains
    # never hit their nominal self-collision pairs (verified in MuJoCo),
    # manipulation domains need body-body contact.
    ("cartpole", "balance", False), ("cheetah", "run", False),
    ("walker", "walk", False), ("pendulum", "swingup", False),
    ("acrobot", "swingup", False), ("hopper", "stand", False),
    ("reacher", "easy", False), ("point_mass", "easy", False),
    ("ball_in_cup", "catch", True), ("finger", "spin", True),
]


def main():
    for domain, task, pairs in DOMAINS:
        env = suite.load(domain, task)
        m = pmodel.from_mujoco(env.physics.model._model, pair_collisions=pairs)
        path = os.path.join(ASSETS, f"{domain}.npz")
        pmodel.save(m, path)
        print(
            f"{domain}: nb={m.nb} nv={m.nv} nu={m.nu} ncon={m.ncon} "
            f"npair={m.npair} nrope={m.nrope} "
            f"dt={m.dt} integrator={m.integrator} -> {os.path.relpath(path)}"
        )
    bake_manipulator()
    bake_swimmer()
    bake_multipole()
    bake_cheetah_pool()


def bake_multipole():
    """Cartpole two_poles / three_poles (procedurally generated chains)."""
    for task, n in (("two_poles", 2), ("three_poles", 3)):
        env = suite.load("cartpole", task)
        m = pmodel.from_mujoco(env.physics.model._model)
        path = os.path.join(ASSETS, f"cartpole_{n}.npz")
        pmodel.save(m, path)
        print(
            f"cartpole_{n}: nb={m.nb} nv={m.nv} integrator={m.integrator} "
            f"-> {os.path.relpath(path)}"
        )


def bake_swimmer():
    """Swimmer domain (procedurally generated n-link models): bake the two
    benchmark sizes under task-specific asset names. Fluid-drag
    coefficients (option density=3000) are extracted by from_mujoco."""
    for task in ("swimmer6", "swimmer15"):
        env = suite.load("swimmer", task)
        m = pmodel.from_mujoco(env.physics.model._model)
        path = os.path.join(ASSETS, f"{task}.npz")
        pmodel.save(m, path)
        print(
            f"{task}: nb={m.nb} nv={m.nv} nu={m.nu} fluid={m.has_fluid} "
            f"limit_tc={m.limit_timeconst} dt={m.dt} -> {os.path.relpath(path)}"
        )


def bake_manipulator():
    """Manipulator domain (bring_ball / bring_peg): bake per-prop models
    plus name metadata extras (body/site/joint lookup happens by name in
    surreal_tpu/envs/manipulator.py, not by brittle hardcoded indices)."""
    import mujoco
    import numpy as np

    for prop in ("ball", "peg"):
        env = suite.load("manipulator", f"bring_{prop}")
        mj = env.physics.model._model
        m = pmodel.from_mujoco(mj, pair_collisions=True)
        # name metadata (planar body index = mujoco body id − 1)
        body_names = [
            mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_BODY, b) or ""
            for b in range(1, mj.nbody)
        ]
        flips = pmodel.mj_flip_flags(mj, normal=1)  # xz-plane domain
        S = np.diag([1.0, -1.0, -1.0])
        site_names, site_body, site_pos = [], [], []
        for s in range(mj.nsite):
            site_names.append(
                mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_SITE, s) or ""
            )
            sb = int(mj.site_bodyid[s])
            site_body.append(sb - 1)
            p = S @ mj.site_pos[s] if flips[sb] else mj.site_pos[s]
            site_pos.append(p[[0, 2]])
        joint_names = [
            mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_JOINT, j) or ""
            for j in range(mj.njnt)
        ]
        extras = {
            "body_names": np.asarray(body_names),
            "site_names": np.asarray(site_names),
            "site_body": np.asarray(site_body, np.int64),
            "site_pos": np.asarray(site_pos),
            "joint_names": np.asarray(joint_names),
        }
        path = os.path.join(ASSETS, f"manipulator_{prop}.npz")
        pmodel.save(m, path, extras=extras)
        print(
            f"manipulator_{prop}: nb={m.nb} nv={m.nv} nu={m.nu} ncon={m.ncon} "
            f"npair={m.npair} nwall={m.nwall} neq={m.neq} dt={m.dt} "
            f"-> {os.path.relpath(path)}"
        )


def bake_cheetah_pool(size: int = 4096):
    """Settle a pool of cheetah episode-start states with OUR engine."""
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from surreal_tpu.envs.cheetah import CheetahRun

    m = pmodel.load(os.path.join(ASSETS, "cheetah.npz"))
    q, qd = CheetahRun.generate_pool(m, jax.random.PRNGKey(0), size=size)
    path = os.path.join(ASSETS, "cheetah_pool.npz")
    np.savez(path, q=np.asarray(q), qd=np.asarray(qd))
    print(f"cheetah pool: {size} settled states -> {os.path.relpath(path)}")
    print("  height range:", float(np.min(np.asarray(q)[:, 1])), float(np.max(np.asarray(q)[:, 1])))


if __name__ == "__main__":
    main()
