"""Environment API behavior: registry, shapes, auto-reset, reward ranges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.envs import base as env_base
from surreal_tpu.envs import make_env, available_envs
from surreal_tpu.envs.base import EnvState, vectorize

ENVS = ["cartpole-balance", "cheetah-run", "walker-walk"]


def test_registry():
    assert "cheetah-run" in available_envs()
    assert make_env("dm_control:cartpole-balance").action_dim == 1
    with pytest.raises(KeyError):
        make_env("nope")


@pytest.mark.parametrize("name", ENVS)
def test_reset_step_shapes(name):
    env = make_env(name)
    reset_fn, step_fn = vectorize(env)
    B = 4
    state, ts = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(0), B))
    flat = env_base.flatten_obs(ts.obs)
    assert flat.shape == (B, env_base.obs_flat_dim(env))
    a = jnp.zeros((B, env.action_dim))
    state, ts = jax.jit(step_fn)(state, a)
    assert ts.reward.shape == (B,)
    assert bool(jnp.all((ts.reward >= 0) & (ts.reward <= 1)))  # dm_control rewards in [0,1]
    assert not bool(ts.done.any())


def test_autoreset_and_determinism():
    env = make_env("cartpole-balance")
    reset_fn, step_fn = vectorize(env)
    step_fn = jax.jit(step_fn)
    B = 3
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    state, _ = reset_fn(keys)
    near_end = EnvState(q=state.q, qd=state.qd, t=jnp.full((B,), env.episode_steps - 1, jnp.int32), key=state.key)
    s2, ts2 = step_fn(near_end, jnp.zeros((B, 1)))
    assert bool(ts2.done.all())
    assert bool((s2.t == 0).all())
    assert float(ts2.discount[0]) == 1.0  # truncation bootstraps
    # same key -> same reset state
    sA, _ = reset_fn(keys)
    sB, _ = reset_fn(keys)
    np.testing.assert_array_equal(np.asarray(sA.q), np.asarray(sB.q))


def test_cartpole_reward_matches_oracle_formula(rng):
    """Reward for a GIVEN (q, qd, a) matches the dm_control task formula
    evaluated through the oracle physics."""
    suite = pytest.importorskip("dm_control.suite")
    denv = suite.load("cartpole", "balance")
    env = make_env("cartpole-balance")
    for _ in range(5):
        q = rng.uniform(-0.5, 0.5, 2)
        qd = rng.uniform(-1, 1, 2)
        a = rng.uniform(-1, 1, 1)
        denv.reset()
        denv.physics.data.qpos[:] = q
        denv.physics.data.qvel[:] = qd
        denv.physics.data.ctrl[:] = a
        import mujoco
        mujoco.mj_forward(denv.physics.model._model, denv.physics.data._data)
        want = denv.task.get_reward(denv.physics)
        got = float(env._reward(jnp.array(q), jnp.array(qd), jnp.array(a)))
        assert abs(got - want) < 1e-5


@pytest.mark.parametrize(
    "name",
    ["cheetah-run", "walker-walk", "pendulum-swingup", "acrobot-swingup",
     "hopper-stand", "hopper-hop"],
)
def test_env_reward_formula_matches_oracle(name, rng):
    """Set identical physics state in the oracle and compare reward values
    (reward is a function of state; contact dynamics may diverge but the
    reward map itself must be dm_control-exact). Zero actions are used so
    control-cost terms are exactly 1 on both sides."""
    suite = pytest.importorskip("dm_control.suite")
    import mujoco

    dom, task = name.split("-")
    denv = suite.load(dom, task)
    env = make_env(name)
    nv = denv.physics.model.nv
    nu = env.action_dim
    for _ in range(5):
        q = rng.uniform(-0.3, 0.3, nv)
        qd = rng.uniform(-2, 2, nv)
        denv.reset()
        denv.physics.data.qpos[:] = q
        denv.physics.data.qvel[:] = qd
        mujoco.mj_forward(denv.physics.model._model, denv.physics.data._data)
        want = denv.task.get_reward(denv.physics)
        got = float(env._reward(jnp.array(q), jnp.array(qd), jnp.zeros(nu)))
        assert abs(got - want) < 1e-4, f"{name}: {got} vs {want}"


def test_divergence_auto_reset():
    """A non-finite / exploded physics state ends the episode for that env
    only (dm_control PhysicsError semantics) with reward 0 and fully
    finite outputs — one diverged env must not NaN the batch."""
    import dataclasses

    env = make_env("swimmer-swimmer15")
    reset_fn, step_fn = vectorize(env)
    state, _ = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(0), 4))
    q = np.array(state.q)
    qd = np.array(state.qd)
    qd[1, 3] = np.nan          # env 1: NaN velocity
    q[2, 0] = 3e9              # env 2: exploded position
    state = dataclasses.replace(state, q=jnp.asarray(q), qd=jnp.asarray(qd))
    new_state, ts = jax.jit(step_fn)(state, jnp.zeros((4, env.action_dim)))
    done = np.asarray(ts.done)
    assert done[1] and done[2] and not done[0] and not done[3]
    assert np.asarray(ts.reward)[1] == 0.0 and np.asarray(ts.reward)[2] == 0.0
    for leaf in jax.tree.leaves((new_state.q, new_state.qd, ts.obs,
                                 ts.carry_obs, ts.reward)):
        assert np.isfinite(np.asarray(leaf)).all()
    # diverged envs were reset: fresh episode state within init bounds
    assert np.abs(np.asarray(new_state.q)[1]).max() < 100
    assert int(np.asarray(new_state.t)[1]) == 0
