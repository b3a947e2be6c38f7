"""Reacher (xy-plane) parity + behavior."""

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


def test_xy_plane_smooth_parity(rng):
    env = suite.load("reacher", "easy")
    mj, d = env.physics.model._model, env.physics.data._data
    pm = pmodel.load("surreal_tpu/envs/assets/reacher.npz")
    assert pm.plane == "xy"
    for _ in range(5):
        q = rng.uniform(-2, 2, 2)
        qd = rng.uniform(-2, 2, 2)
        d.qpos[:] = q
        d.qvel[:] = qd
        mujoco.mj_forward(mj, d)
        pos, ang = engine.fk(pm, jnp.array(q))
        np.testing.assert_allclose(np.asarray(pos), d.xpos[1:][:, [0, 1]], atol=1e-12)
        xm = d.xmat[1:].reshape(-1, 3, 3)
        mj_ang = np.arctan2(xm[:, 1, 0], xm[:, 0, 0])  # +z rotation
        np.testing.assert_allclose(np.sin(-np.asarray(ang)), np.sin(mj_ang), atol=1e-12)
        M_mj = np.zeros((2, 2))
        mujoco.mj_fullM(mj, d, M_mj)
        np.testing.assert_allclose(
            np.asarray(engine.mass_matrix(pm, jnp.array(q))), M_mj, atol=1e-10
        )
        bias = np.asarray(engine.bias_forces(pm, jnp.array(q), jnp.array(qd)))
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-10)


def test_reward_matches_oracle(rng):
    env = suite.load("reacher", "easy")
    mj, d = env.physics.model._model, env.physics.data._data
    renv = make_env("reacher-easy")
    for _ in range(5):
        q = rng.uniform(-2, 2, 2)
        tx, ty = rng.uniform(-0.2, 0.2, 2)
        env.physics.named.model.geom_pos["target", "x"] = tx
        env.physics.named.model.geom_pos["target", "y"] = ty
        d.qpos[:] = q
        mujoco.mj_forward(mj, d)
        want = env.task.get_reward(env.physics)
        got = float(
            renv._reward(jnp.array(list(q) + [tx, ty]), jnp.zeros(4), jnp.zeros(2))
        )
        assert abs(got - want) < 1e-6


def test_target_persists_within_episode_and_resamples():
    env = make_env("reacher-easy")
    reset_fn, step_fn = vectorize(env)
    step_fn = jax.jit(step_fn)
    state, ts = reset_fn(jax.random.split(jax.random.PRNGKey(0), 3))
    target0 = np.asarray(state.q[:, 2:])
    for _ in range(3):
        state, ts = step_fn(state, jnp.zeros((3, 2)))
    np.testing.assert_array_equal(np.asarray(state.q[:, 2:]), target0)
    # distinct envs get distinct targets
    assert not np.allclose(target0[0], target0[1])
