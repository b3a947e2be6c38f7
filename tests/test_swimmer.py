"""Swimmer (xy-plane, fluid drag) oracle parity + behavior.

The swimmer moves ONLY through fluid forces (option density=3000), so
these tests pin the engine's inertia-box fluid model against MuJoCo's
qfrc_passive as well as the usual M/bias/trajectory/obs/reward parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.envs import make_env
from surreal_tpu.envs.base import vectorize
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

mujoco = pytest.importorskip("mujoco")
suite = pytest.importorskip("dm_control.suite")


@pytest.fixture(scope="module", autouse=True)
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _oracle(task="swimmer6"):
    return suite.load("swimmer", task)


def test_smooth_and_fluid_parity(rng):
    env = _oracle()
    mj, d = env.physics.model._model, env.physics.data._data
    pm = pmodel.load("surreal_tpu/envs/assets/swimmer6.npz")
    assert pm.plane == "xy" and pm.has_fluid
    for _ in range(5):
        q = rng.uniform(-0.8, 0.8, mj.nq)
        qd = rng.uniform(-3, 3, mj.nv)
        d.qpos[:] = q
        d.qvel[:] = qd
        mujoco.mj_forward(mj, d)
        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        np.testing.assert_allclose(
            np.asarray(engine.mass_matrix(pm, jnp.array(q))), M_mj, atol=1e-12
        )
        bias = np.asarray(engine.bias_forces(pm, jnp.array(q), jnp.array(qd)))
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-10)
        # qfrc_passive is pure fluid here (no damping/stiffness)
        fluid = np.asarray(engine.fluid_forces(pm, jnp.array(q), jnp.array(qd)))
        np.testing.assert_allclose(fluid, d.qfrc_passive, atol=1e-10)


def test_fluid_viscosity_parity(rng):
    """The linear (Stokes) viscosity terms of the inertia-box fluid model,
    pinned against MuJoCo with the swimmer model's viscosity turned on
    (no suite task ships nonzero viscosity, so modify the option here)."""
    from surreal_tpu.envs.physics import model as pm_mod

    for dens, visc in ((3000.0, 2.0), (0.0, 1.5)):
        env = _oracle()
        mj, d = env.physics.model._model, env.physics.data._data
        mj.opt.density = dens
        mj.opt.viscosity = visc
        pm = pm_mod.from_mujoco(mj)
        for _ in range(3):
            d.qpos[:] = rng.uniform(-0.6, 0.6, mj.nq)
            d.qvel[:] = rng.uniform(-3, 3, mj.nv)
            mujoco.mj_forward(mj, d)
            fluid = np.asarray(
                engine.fluid_forces(pm, jnp.array(d.qpos.copy()), jnp.array(d.qvel.copy()))
            )
            np.testing.assert_allclose(fluid, d.qfrc_passive, atol=1e-10)


def test_trajectory_parity_smooth_regime(rng):
    """Step-for-step qpos agreement with mj_step while joint limits stay
    inactive (the soft-limit solver is intentionally approximate)."""
    env = _oracle()
    mj, d = env.physics.model._model, env.physics.data._data
    pm = pmodel.load("surreal_tpu/envs/assets/swimmer6.npz")
    d.qpos[:] = 0.0
    d.qvel[:] = 0.0
    d.qpos[3:] = rng.uniform(-0.3, 0.3, mj.nq - 3)
    q = jnp.array(d.qpos.copy())
    qd = jnp.array(d.qvel.copy())
    step = jax.jit(engine.make_stepper(pm, n_substeps=1))
    limit = np.deg2rad(60.0) - 1e-6
    max_err = 0.0
    for t in range(400):
        ctrl = 0.8 * np.sin(0.05 * t + np.arange(mj.nu))
        d.ctrl[:] = ctrl
        mujoco.mj_step(mj, d)
        q, qd = step(q, qd, jnp.array(ctrl))
        assert np.all(np.abs(d.qpos[3:]) < limit), "test drove into limits"
        max_err = max(max_err, float(np.abs(np.asarray(q) - d.qpos).max()))
    assert max_err < 1e-6, max_err


def test_obs_and_reward_parity(rng):
    env = _oracle()
    mj, d = env.physics.model._model, env.physics.data._data
    ours = make_env("swimmer-swimmer6", dtype=jnp.float64)
    nv = mj.nv
    for _ in range(5):
        qpos = rng.uniform(-0.8, 0.8, mj.nq)
        qvel = rng.uniform(-2, 2, nv)
        target = rng.uniform(-1.5, 1.5, 2)
        env.physics.named.model.geom_pos["target", "x"] = target[0]
        env.physics.named.model.geom_pos["target", "y"] = target[1]
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        want = env.task.get_observation(env.physics)
        want_r = env.task.get_reward(env.physics)
        q = jnp.concatenate([jnp.array(qpos), jnp.array(target)])
        qd = jnp.concatenate([jnp.array(qvel), jnp.zeros(2)])
        obs = ours._obs(q, qd)
        np.testing.assert_allclose(np.asarray(obs["joints"]), want["joints"], atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(obs["to_target"]), want["to_target"], atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(obs["body_velocities"]), want["body_velocities"], atol=1e-10
        )
        r = ours._reward(q, qd, jnp.zeros(mj.nu))
        np.testing.assert_allclose(float(r), float(want_r), atol=1e-10)


def test_env_runs_and_init_distribution():
    env = make_env("swimmer-swimmer6")
    reset_fn, step_fn = vectorize(env)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    state, ts = jax.jit(reset_fn)(keys)
    # joints inside their ±60° ranges; root slides at 0
    qs = np.asarray(state.q)
    assert np.all(np.abs(qs[:, 3:8]) <= np.deg2rad(60) + 1e-6)
    assert np.all(qs[:, :2] == 0)
    # some targets close (box .3), some far — both modes present over 64 envs
    t_inf = np.abs(qs[:, 8:]).max(-1)
    assert (t_inf < 0.3).any() and (t_inf > 0.3).any()
    act = jnp.zeros((64, env.action_dim))
    jstep = jax.jit(step_fn)
    for _ in range(3):
        state, ts = jstep(state, act)
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert np.isfinite(np.asarray(state.q)).all()


def test_swimmer15_loads_and_steps():
    env = make_env("swimmer-swimmer15")
    state, _ = env.reset(jax.random.PRNGKey(1))
    state, ts = jax.jit(env.step)(state, jnp.zeros(env.action_dim))
    assert np.isfinite(float(ts.reward))
    assert state.q.shape == (17 + 2,)
