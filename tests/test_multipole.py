"""Cartpole two_poles / three_poles oracle parity + behavior."""

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


@pytest.mark.parametrize("task,n", [("two_poles", 2), ("three_poles", 3)])
def test_obs_reward_trajectory_parity(task, n, rng):
    env = suite.load("cartpole", task)
    mj, d = env.physics.model._model, env.physics.data._data
    ours = make_env(f"cartpole-{task}", dtype=jnp.float64)
    pm = pmodel.load(f"surreal_tpu/envs/assets/cartpole_{n}.npz")

    # obs + reward at random states
    for _ in range(5):
        qpos = rng.uniform(-1.5, 1.5, mj.nq)
        qvel = rng.uniform(-3, 3, mj.nv)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl = rng.uniform(-1, 1, 1)
        mujoco.mj_forward(mj, d)
        want = env.task.get_observation(env.physics)
        q, qd = jnp.array(qpos), jnp.array(qvel)
        obs = ours._obs(q, qd)
        np.testing.assert_allclose(
            np.asarray(obs["position"]), want["position"], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(obs["velocity"]), want["velocity"], atol=1e-12
        )
        np.testing.assert_allclose(
            float(ours._reward(q, qd, jnp.array(ctrl))),
            float(env.task.get_reward(env.physics)),
            atol=1e-12,
        )

    # instantaneous forward-dynamics parity (chained poles are chaotic, so
    # long trajectories amplify rounding exponentially; qacc is the honest
    # exactness check) ...
    for _ in range(5):
        d.qpos[:] = rng.uniform(-1.5, 1.5, mj.nq)
        d.qvel[:] = rng.uniform(-3, 3, mj.nv)
        d.ctrl[:] = ctrl = rng.uniform(-1, 1, 1)
        mujoco.mj_forward(mj, d)
        qacc = engine.forward_explicit(
            pm, jnp.array(d.qpos.copy()), jnp.array(d.qvel.copy()), jnp.array(ctrl)
        )
        np.testing.assert_allclose(np.asarray(qacc), d.qacc, atol=1e-9)

    # ... plus a short trajectory within the Lyapunov horizon
    d.qpos[:] = 0.0
    d.qpos[1] = np.pi
    d.qvel[:] = 0.0
    mujoco.mj_forward(mj, d)
    q = jnp.array(d.qpos.copy())
    qd = jnp.array(d.qvel.copy())
    step = jax.jit(engine.make_stepper(pm, n_substeps=1))
    for t in range(50):
        ctrl = np.array([0.6 * np.sin(0.03 * t)])
        d.ctrl[:] = ctrl
        mujoco.mj_step(mj, d)
        q, qd = step(q, qd, jnp.array(ctrl))
    np.testing.assert_allclose(np.asarray(q), d.qpos, atol=1e-9)


def test_env_runs():
    env = make_env("cartpole-three_poles")
    reset_fn, step_fn = vectorize(env)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    state, _ = jax.jit(reset_fn)(keys)
    jstep = jax.jit(step_fn)
    for _ in range(3):
        state, ts = jstep(state, jnp.zeros((16, 1)))
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert ts.reward.shape == (16,)
