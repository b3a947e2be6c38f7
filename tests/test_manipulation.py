"""Manipulation-family envs: body-body contact, rope, touch, reward parity.

Validation strategy per SURVEY.md §4: smooth terms are covered to machine
precision in test_physics_parity; the unilateral-constraint behaviors here
are validated BEHAVIORALLY against the MuJoCo oracle (resting states and
constraint satisfaction within millimetres) plus reward-function parity at
matched states.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.envs import base as env_base
from surreal_tpu.envs import make_env
from surreal_tpu.envs.physics import engine
from surreal_tpu.envs.physics import model as pmodel


@pytest.fixture(scope="module", autouse=True)
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def cup_model():
    return pmodel.load("surreal_tpu/envs/assets/ball_in_cup.npz")


def _roll(m, q0, steps, substeps=1):
    step = jax.jit(engine.make_stepper(m, n_substeps=substeps))
    q = jnp.asarray(q0, jnp.float64)
    qd = jnp.zeros_like(q)
    ctrl = jnp.zeros(m.nu, jnp.float64)
    for _ in range(steps):
        q, qd = step(q, qd, ctrl)
    return np.asarray(q), np.asarray(qd)


def test_rope_hangs_ball_at_max_length(cup_model):
    """Ball dropped off-string settles hanging exactly rope_max below the
    cup attachment (MuJoCo: 0.3006 for the same initial state)."""
    q, qd = _roll(cup_model, [0, 0, 0, -0.1], steps=250, substeps=10)
    assert np.abs(qd).max() < 1e-3
    cup_site = np.array([q[0], 0.6 + q[1] - 0.108])
    ball = np.array([q[2], 0.2 + q[3]])
    dist = np.linalg.norm(ball - cup_site)
    np.testing.assert_allclose(dist, 0.3, atol=2e-3)


def test_ball_rests_inside_cup_on_wall_capsule(cup_model):
    """Ball dropped into the cup is caught by body-body contact and rests
    on the bottom wall at ball_r + wall_r above it (MuJoCo: 0.0325)."""
    q, qd = _roll(cup_model, [0, 0, 0, 0.45], steps=250, substeps=10)
    assert np.abs(qd).max() < 1e-3
    height_above_cup_bottom = (0.2 + q[3]) - (0.6 + q[1] - 0.1)
    np.testing.assert_allclose(height_above_cup_bottom, 0.033, atol=2e-3)
    # no tunneling: ball still horizontally inside the cup
    assert abs((0.0 + q[2]) - q[0]) < 0.05


def test_pair_depth_sign_and_symmetry(cup_model):
    """Penetration depth is positive iff spheres overlap; separation keeps
    it negative."""
    q_far = jnp.array([0.0, 0.0, 0.0, -0.2], jnp.float64)
    _, _, depth, _ = engine._pair_kinematics(cup_model, q_far)
    assert float(jnp.max(depth)) < 0.0
    # ball centered on the cup bottom wall: definitely penetrating
    q_pen = jnp.array([0.0, 0.0, 0.0, 0.3], jnp.float64)
    _, _, depth, _ = engine._pair_kinematics(cup_model, q_pen)
    assert float(jnp.max(depth)) > 0.0


def test_finger_touch_fires_on_contact():
    """Driving the finger into the spinner produces positive touch obs;
    free space produces zeros."""
    env = make_env("finger-spin", dtype=jnp.float64)
    state, ts = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    touched = False
    for t in range(400):
        # push both joints toward the spinner
        state, ts = step(state, jnp.array([-1.0, 1.0], jnp.float64))
        if float(ts.obs["touch"].max()) > 0:
            touched = True
            break
    assert touched, "finger never touched the spinner"
    assert np.isfinite(np.asarray(ts.obs["touch"])).all()


def test_finger_spinner_no_tunneling():
    """Random aggressive control must never push the fingertip THROUGH the
    spinner capsules (bounded penetration)."""
    env = make_env("finger-spin", dtype=jnp.float64)
    m = env.model
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    max_pen = 0.0
    for t in range(300):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (2,), jnp.float64, -1, 1)
        state, ts = step(state, a)
        _, _, depth, _ = engine._pair_kinematics(m, state.q[:3])
        max_pen = max(max_pen, float(jnp.max(depth)))
    assert max_pen < 0.015  # < half the fingertip radius


def test_point_mass_reward_parity_vs_oracle():
    suite = pytest.importorskip("dm_control.suite")
    env_mj = suite.load("point_mass", "easy", task_kwargs={"random": 0})
    env = make_env("point_mass-easy", dtype=jnp.float64)
    rng = np.random.RandomState(0)
    for _ in range(10):
        q = rng.uniform(-0.25, 0.25, 2)
        qd = rng.uniform(-1, 1, 2)
        a = rng.uniform(-1, 1, 2)
        with env_mj.physics.reset_context():
            env_mj.physics.data.qpos[:] = q
            env_mj.physics.data.qvel[:] = qd
        env_mj.physics.data.ctrl[:] = a
        r_mj = env_mj.task.get_reward(env_mj.physics)
        r = float(env._reward(jnp.array(q), jnp.array(qd), jnp.array(a)))
        np.testing.assert_allclose(r, r_mj, atol=1e-9)


def test_ball_in_cup_reward_parity_vs_oracle():
    suite = pytest.importorskip("dm_control.suite")
    env_mj = suite.load("ball_in_cup", "catch", task_kwargs={"random": 0})
    env = make_env("ball_in_cup-catch", dtype=jnp.float64)
    rng = np.random.RandomState(1)
    agree = 0
    for _ in range(40):
        q = np.concatenate([rng.uniform(-0.1, 0.1, 2), rng.uniform(-0.3, 0.4, 2)])
        with env_mj.physics.reset_context():
            env_mj.physics.data.qpos[:] = q
        r_mj = env_mj.task.get_reward(env_mj.physics)
        r = float(env._reward(jnp.array(q), jnp.zeros(4), jnp.zeros(2)))
        agree += int(r == r_mj)
    assert agree >= 39  # sparse indicator; allow one boundary disagreement


def test_finger_obs_parity_vs_oracle():
    """position/velocity obs match the oracle sensors at matched states."""
    suite = pytest.importorskip("dm_control.suite")
    env_mj = suite.load("finger", "spin", task_kwargs={"random": 0})
    env = make_env("finger-spin", dtype=jnp.float64)
    rng = np.random.RandomState(2)
    for _ in range(5):
        q = np.array([rng.uniform(-1.9, 1.9), rng.uniform(-1.9, 1.9),
                      rng.uniform(-np.pi, np.pi)])
        qd = rng.uniform(-1, 1, 3)
        with env_mj.physics.reset_context():
            env_mj.physics.data.qpos[:] = q
            env_mj.physics.data.qvel[:] = qd
        obs_mj = env_mj.task.get_observation(env_mj.physics)
        qfull = jnp.concatenate([jnp.array(q), jnp.zeros(2)])
        obs = env._obs(qfull, jnp.concatenate([jnp.array(qd), jnp.zeros(2)]))
        np.testing.assert_allclose(
            np.asarray(obs["position"]), obs_mj["position"], atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(obs["velocity"]), obs_mj["velocity"], atol=1e-9
        )


def test_env_api_shapes_and_reset():
    for name in ("point_mass-easy", "ball_in_cup-catch", "finger-spin",
                 "finger-turn_easy", "finger-turn_hard"):
        env = make_env(name)
        reset_fn, step_fn = env_base.vectorize(env)
        st, ts0 = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(0), 4))
        st, ts = jax.jit(step_fn)(
            st, jnp.zeros((4, env.action_dim), jnp.float32)
        )
        for k, spec in env.obs_spec().items():
            assert ts.obs[k].shape == (4,) + spec.shape, (name, k)
        assert ts.reward.shape == (4,)
        flat = env_base.flatten_obs(ts.obs)
        assert flat.shape == (4, env_base.obs_flat_dim(env))


def test_finger_contact_model_configuration():
    """Pins the TRAINED-AND-MEASURED finger contact model (r3 probe sweep,
    tools/probe_finger.py on chip, 8M-step PPO each):
      soft push + cone   -> eval 344.9 ± 7.8   (winner, low variance)
      soft push + boxed  -> eval 309.4 ± 80.8  (round-2 physics)
      stiff push + cone  -> eval 0.0           (fingertip ejected on contact)
    The soft (timeconst) push keeps sustained press-and-sweep possible;
    the elliptic-cone friction projection adds MuJoCo's slip->normal-force
    coupling. Changing these defaults requires re-running the probe."""
    env = make_env("finger-spin", dtype=jnp.float64)
    assert env.model.pair_push == "soft"
    assert env.model.pair_cone is True
    # soft-push impact floor (matched-state probe: 1.70 rad/s hinge peak)
    from surreal_tpu.envs.physics import engine

    q = jnp.array([0.54, -0.55, 0.0], jnp.float64)
    qd = jnp.array([0.0, -6.0, 0.0], jnp.float64)
    step = jax.jit(lambda q, qd: engine.step_euler(env.model, q, qd, jnp.zeros(2)))
    peak = 0.0
    for _ in range(5):
        q, qd = step(q, qd)
        peak = max(peak, abs(float(qd[2])))
    assert peak >= 1.5, f"hinge peak {peak} — pair contacts softened?"
