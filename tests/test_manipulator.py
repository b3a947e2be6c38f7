"""Manipulator (bring_ball) parity: canonicalized mirrored frames, smooth
dynamics vs MuJoCo to machine precision, behavioral contact/equality
checks, reward parity at matched states, oracle-style episode init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.envs import base as env_base
from surreal_tpu.envs import make_env
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel

_ASSET = "surreal_tpu/envs/assets/manipulator_ball.npz"


@pytest.fixture(scope="module", autouse=True)
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def model():
    return pmodel.load(_ASSET)


@pytest.fixture(scope="module")
def oracle():
    from dm_control import suite

    return suite.load("manipulator", "bring_ball")


def test_smooth_dynamics_machine_parity(model, oracle):
    """FK positions, mass matrix and bias forces match MuJoCo to float64
    precision at random states — including the MIRRORED finger subtree
    (frame canonicalization in from_mujoco)."""
    import mujoco

    mj = oracle.physics
    rng = np.random.RandomState(0)
    for _ in range(5):
        q = rng.uniform(-1.5, 1.5, 11)
        qd = rng.uniform(-2.0, 2.0, 11)
        with mj.reset_context():
            mj.data.qpos[:] = q
            mj.data.qvel[:] = qd
        pos, _ = engine.fk(model, jnp.asarray(q))
        np.testing.assert_allclose(
            np.asarray(pos), mj.data.xpos[1:][:, [0, 2]], atol=1e-12
        )
        M_mj = np.zeros((11, 11))
        mujoco.mj_fullM(mj.model._model, mj.data._data, M_mj)
        np.testing.assert_allclose(
            np.asarray(engine.mass_matrix(model, jnp.asarray(q))), M_mj, atol=1e-12
        )
        bias = engine.bias_forces(model, jnp.asarray(q), jnp.asarray(qd))
        np.testing.assert_allclose(np.asarray(bias), mj.data.qfrc_bias, atol=1e-10)


def test_ball_falls_and_rests_on_floor(model):
    """Free ball away from the arm falls under gravity and rests on the
    ground plane at its radius (0.022 m)."""
    step = jax.jit(engine.make_stepper(model, n_substeps=10))
    q = jnp.zeros(11, jnp.float64).at[8].set(0.45).at[9].set(0.3)
    qd = jnp.zeros(11, jnp.float64)
    ctrl = jnp.zeros(5, jnp.float64)
    for _ in range(150):
        q, qd = step(q, qd, ctrl)
    assert abs(float(qd[9])) < 1e-2
    np.testing.assert_allclose(float(q[9]), 0.022, atol=2e-3)


def test_grasp_tendon_and_coupling(model):
    """The grasp actuator closes BOTH fingers (tendon moment arm) and the
    soft equality keeps finger/thumb coupled: L = .5·finger − .5·thumb
    stays near its reference while both angles move."""
    step = jax.jit(engine.make_stepper(model, n_substeps=10))
    q = jnp.zeros(11, jnp.float64).at[8].set(0.45).at[9].set(0.022)
    qd = jnp.zeros(11, jnp.float64)
    ctrl = jnp.zeros(5, jnp.float64).at[4].set(1.0)  # close the hand
    for _ in range(50):
        q, qd = step(q, qd, ctrl)
    thumb, finger = float(q[4]), float(q[6])
    assert abs(thumb) > 0.05 and abs(finger) > 0.05, (thumb, finger)
    E = np.asarray(model.eq_moment)[0]
    L = float(E @ np.asarray(q))
    assert abs(L - float(model.eq_ref[0])) < 0.05


def test_reward_parity_matched_states(model, oracle):
    """tolerance(‖ball−target‖) matches dm_control's Bring._ball_reward at
    identical (qpos, target) states."""
    env = make_env("manipulator-bring_ball", dtype=jnp.float64)
    mj = oracle.physics
    task = oracle.task
    rng = np.random.RandomState(1)
    for _ in range(10):
        qpos = rng.uniform(-1.0, 1.0, 11)
        target = np.array([rng.uniform(-0.4, 0.4), rng.uniform(0.1, 0.4),
                           rng.uniform(-np.pi, np.pi)])
        mj.named.model.body_pos["target_ball", ["x", "z"]] = target[:2]
        mj.named.model.body_quat["target_ball", ["qw", "qy"]] = [
            np.cos(target[2] / 2), np.sin(target[2] / 2)]
        with mj.reset_context():
            mj.data.qpos[:] = qpos
        want = task.get_reward(mj)
        q = jnp.concatenate([jnp.asarray(qpos), jnp.asarray(target),
                             jnp.zeros(5, jnp.float64)])
        got = float(env._reward(q, jnp.zeros(19, jnp.float64), None))
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_episode_init_matches_oracle_distribution(model):
    """Batch resets: collision-free, finger symmetrized to thumb, targets
    in the oracle's sampling box, ball occasionally in-hand/in-target."""
    env = make_env("manipulator-bring_ball", dtype=jnp.float64)
    reset, _ = env_base.vectorize(env)
    st, ts = jax.jit(reset)(jax.random.split(jax.random.PRNGKey(3), 64))
    qs = np.asarray(st.q)
    # collision-free (allow the engine's Baumgarte slop)
    depths = jax.vmap(lambda q: engine.penetration(model, q[:11]))(st.q)
    assert float(jnp.max(depths)) <= 1e-6
    # targets inside the sampling box
    assert np.all(qs[:, 11] >= -0.4) and np.all(qs[:, 11] <= 0.4)
    assert np.all(qs[:, 12] >= 0.1) and np.all(qs[:, 12] <= 0.4)
    # obs spec totals 44 features like dm_control's flattened observation
    assert env_base.obs_flat_dim(env) == 44
    flat = env_base.flatten_obs(ts.obs)
    assert flat.shape == (64, 44) and bool(jnp.all(jnp.isfinite(flat)))


def test_touch_fires_on_hand_ball_contact(model):
    """Ball placed at the grasp point + closing hand produces positive
    touch readings; ball far away reads zero."""
    env = make_env("manipulator-bring_ball", dtype=jnp.float64)
    # arm upright (zeros): grasp site sits above the hand
    q_arm = jnp.zeros(11, jnp.float64)
    pos, ang = engine.fk(model, q_arm)
    grasp = np.asarray(pos[env._hand_b] + engine._rot(
        ang[env._hand_b], jnp.asarray(env._grasp_local, jnp.float64)))
    q_phys = q_arm.at[8].set(grasp[0]).at[9].set(grasp[1])
    q = jnp.concatenate([q_phys, jnp.zeros(3, jnp.float64),
                         jnp.zeros(5, jnp.float64)])
    qd = jnp.zeros(19, jnp.float64)
    ctrl = jnp.zeros(5, jnp.float64).at[4].set(1.0)
    for _ in range(20):
        q, qd = env._physics_step(q, qd, ctrl)
    touch_near = np.asarray(q[14:])
    assert touch_near.max() > 0.0, touch_near
    # far ball: zero touch
    q2 = jnp.concatenate([q_arm.at[8].set(0.45).at[9].set(0.5),
                          jnp.zeros(8, jnp.float64)])
    qd2 = jnp.zeros(19, jnp.float64)
    q2, qd2 = env._physics_step(q2, qd2, jnp.zeros(5, jnp.float64))
    assert float(jnp.max(q2[14:])) == 0.0


def test_bring_peg_reward_parity_and_smoke(model):
    """bring_peg: the grasping/bringing site-distance reward matches
    dm_control's Bring._peg_reward at matched states; env steps finitely."""
    from dm_control import suite

    oracle = suite.load("manipulator", "bring_peg")
    mj = oracle.physics
    env = make_env("manipulator-bring_peg", dtype=jnp.float64)
    rng = np.random.RandomState(2)
    for _ in range(10):
        qpos = rng.uniform(-1.0, 1.0, 11)
        target = np.array([rng.uniform(-0.4, 0.4), rng.uniform(0.1, 0.4),
                           rng.uniform(-np.pi, np.pi)])
        mj.named.model.body_pos["target_peg", ["x", "z"]] = target[:2]
        mj.named.model.body_quat["target_peg", ["qw", "qy"]] = [
            np.cos(target[2] / 2), np.sin(target[2] / 2)]
        with mj.reset_context():
            mj.data.qpos[:] = qpos
        want = oracle.task.get_reward(mj)
        q = jnp.concatenate([jnp.asarray(qpos), jnp.asarray(target),
                             jnp.zeros(5, jnp.float64)])
        got = float(env._reward(q, jnp.zeros(19, jnp.float64), None))
        np.testing.assert_allclose(got, want, atol=1e-9)
    # smoke: batch reset + steps stay finite
    reset, step = env_base.vectorize(env)
    st, ts = jax.jit(reset)(jax.random.split(jax.random.PRNGKey(0), 4))
    st, ts = jax.jit(step)(st, jnp.zeros((4, 5), jnp.float64))
    assert bool(jnp.all(jnp.isfinite(env_base.flatten_obs(ts.obs))))
