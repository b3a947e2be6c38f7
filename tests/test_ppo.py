"""PPO train-step mechanics + a fast end-to-end learning check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.algos import ppo
from surreal_tpu.train import PPOTrainer


def test_train_step_runs_and_metrics_finite():
    cfg = ppo.PPOConfig(horizon=8, epochs=2, num_minibatches=2)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=8, seed=0)
    logs = tr.run(2, log_every=1)
    for m in logs:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} is {v}"


def test_objective_variants():
    for objective in ("clip", "adaptive_kl"):
        cfg = ppo.PPOConfig(horizon=8, epochs=1, num_minibatches=1, objective=objective)
        tr = PPOTrainer("cartpole-balance", cfg, num_envs=4, seed=0)
        logs = tr.run(2, log_every=1)
        assert np.isfinite(logs[-1]["policy_loss"])


def test_lr_adapts_down_on_kl_overshoot():
    cfg = ppo.PPOConfig(horizon=8, epochs=8, num_minibatches=1, lr=1.0, kl_target=1e-4)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=4, seed=0)
    tr.run(2, log_every=1)
    assert float(tr.state.lr_scale) < 1.0


@pytest.mark.slow
def test_cartpole_learns():
    """End-to-end slice (BASELINE config 1 analog): episode return must
    clearly exceed the random-policy level (~350-440/1000) within a small
    budget (the same config reaches ~999 eval return by ~100 iterations)."""
    cfg = ppo.PPOConfig(horizon=64, epochs=4, num_minibatches=4, lr=3e-4)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=64, seed=0)
    logs = tr.run(120, log_every=30)
    best = max(m.get("episode_return", 0.0) for m in logs)
    assert best > 600, f"best episode return {best}"
