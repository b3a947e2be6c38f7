"""Gym (host-loop) adapter behind the functional env surface."""

import jax
import numpy as np
import pytest

from surreal_tpu.envs import make_env
from surreal_tpu.envs.base import vectorize

gym = pytest.importorskip("gymnasium")


def test_gym_reset_step_shapes():
    env = make_env("gym:Pendulum-v1", num_envs=4, seed=0)
    reset_fn, step_fn = vectorize(env)
    state, ts = reset_fn(jax.random.split(jax.random.PRNGKey(0), 4))
    assert ts.obs["observations"].shape == (4, 3)
    state, ts = step_fn(state, jax.numpy.zeros((4, 1)))
    assert ts.reward.shape == (4,)
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_gym_ppo_trains():
    from surreal_tpu.algos.ppo import PPOConfig
    from surreal_tpu.train import PPOTrainer

    cfg = PPOConfig(horizon=8, epochs=1, num_minibatches=1)
    tr = PPOTrainer("gym:Pendulum-v1", cfg, num_envs=4, seed=0, hidden=(16, 16))
    logs = tr.run(2, log_every=1)
    assert all(np.isfinite(v) for m in logs for v in m.values())
