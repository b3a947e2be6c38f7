"""Engine smooth-dynamics parity vs the MuJoCo oracle, and stability.

The parity targets follow SURVEY.md §4: mass matrix / bias / FK must match
mj_fullM / qfrc_bias / xpos to float64 precision; cartpole (contact-free,
RK4) must match full trajectories; contact domains are validated
behaviorally (stability + resting contact), not state-for-state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

mujoco = pytest.importorskip("mujoco")
suite = pytest.importorskip("dm_control.suite")

DOMAINS = [
    ("cartpole", "balance"), ("cheetah", "run"), ("walker", "walk"),
    ("pendulum", "swingup"), ("acrobot", "swingup"), ("hopper", "stand"),
    ("point_mass", "easy"), ("ball_in_cup", "catch"), ("finger", "spin"),
]
# domains that passively come to rest on the ground under zero control
REST_DOMAINS = {"cheetah", "walker", "hopper"}


@pytest.fixture(scope="module", autouse=True)
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module", params=DOMAINS, ids=lambda d: d[0])
def oracle(request):
    dom, task = request.param
    env = suite.load(dom, task)
    pm = pmodel.load(f"surreal_tpu/envs/assets/{dom}.npz")
    return dom, env, pm


def test_smooth_dynamics_parity(oracle, rng):
    _, env, pm = oracle
    mj = env.physics.model._model
    d = env.physics.data._data
    for _ in range(5):
        q = rng.uniform(-1, 1, mj.nq)
        qd = rng.uniform(-1, 1, mj.nv)
        d.qpos[:] = q
        d.qvel[:] = qd
        mujoco.mj_forward(mj, d)

        cols = [0, 1] if pm.plane == "xy" else [0, 2]
        pos, ang = engine.fk(pm, jnp.array(q))
        np.testing.assert_allclose(np.asarray(pos), d.xpos[1:][:, cols], atol=1e-12)
        if pm.plane == "xz":
            xm = d.xmat[1:].reshape(-1, 3, 3)
            np.testing.assert_allclose(np.sin(np.asarray(ang)), xm[:, 0, 2], atol=1e-12)

        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        M = np.asarray(engine.mass_matrix(pm, jnp.array(q)))
        np.testing.assert_allclose(M, M_mj, atol=1e-10)

        bias = np.asarray(engine.bias_forces(pm, jnp.array(q), jnp.array(qd)))
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-10)

        passive = np.asarray(engine.passive_spring_forces(pm, jnp.array(q))) - pm.damping * qd
        np.testing.assert_allclose(passive, d.qfrc_passive, atol=1e-10)

        ctrl = rng.uniform(-1, 1, mj.nu)
        d.ctrl[:] = ctrl
        mujoco.mj_forward(mj, d)
        act = np.asarray(engine.actuation(pm, jnp.array(ctrl)))
        np.testing.assert_allclose(act, d.qfrc_actuator, atol=1e-12)


def test_cartpole_trajectory_parity(rng):
    env = suite.load("cartpole", "balance", task_kwargs={"random": 0})
    env.reset()
    pm = pmodel.load("surreal_tpu/envs/assets/cartpole.npz")
    q = jnp.array(env.physics.data.qpos.copy())
    qd = jnp.array(env.physics.data.qvel.copy())
    step = jax.jit(lambda q, qd, a: engine.step_rk4(pm, q, qd, a))
    actions = rng.uniform(-1, 1, (100, 1))
    for t in range(100):
        env.step(actions[t])
        q, qd = step(q, qd, jnp.array(actions[t]))
    np.testing.assert_allclose(np.asarray(q), env.physics.data.qpos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qd), env.physics.data.qvel, atol=1e-10)


def test_contact_domains_stable_and_resting(oracle):
    """Drop from the default pose with zero control: must come to rest
    (bounded velocity, small penetration) and stay finite."""
    dom, env, pm = oracle
    if pm.ncon == 0 or dom not in REST_DOMAINS:
        pytest.skip("not a passively-resting contact domain")
    step = engine.make_stepper(pm, n_substeps=1)
    step = jax.jit(step)
    q = jnp.zeros(pm.nv, jnp.float64)
    qd = jnp.zeros(pm.nv, jnp.float64)
    ctrl = jnp.zeros(pm.nu, jnp.float64)
    n = int(5.0 / pm.dt)
    for _ in range(n):
        q, qd = step(q, qd, ctrl)
    assert np.isfinite(np.asarray(q)).all()
    # settled: residual speed small (a fallen hopper may still rock gently
    # on its rounded torso — bounded, not divergent, is the requirement)
    assert float(jnp.abs(qd).max()) < 1.0
    # feet not sunk through the floor: deepest contact point above -1cm
    J, depth = engine._contact_kinematics(pm, q)
    assert float(jnp.max(depth)) < 0.02


def test_bias_analytic_equals_autodiff(oracle, rng):
    """The analytic Newton-Euler bias assembly (shared-FK fast path used by
    the integrators) is exactly the Euler-Lagrange autodiff bias."""
    _, env, pm = oracle
    nv = pm.nv
    for _ in range(5):
        q = jnp.array(rng.uniform(-2, 2, nv))
        qd = jnp.array(rng.uniform(-3, 3, nv))
        a = engine.bias_forces(pm, q, qd)
        b = engine.bias_forces_autodiff(pm, q, qd)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
