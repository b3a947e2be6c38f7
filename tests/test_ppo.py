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


def test_lstm_ppo_runs_and_evaluates():
    """Recurrent-policy path: rollout carries LSTM state, update recomputes
    through time from the stored chunk-initial carry."""
    cfg = ppo.PPOConfig(horizon=16, epochs=2, num_minibatches=2)
    tr = PPOTrainer(
        "cartpole-balance", cfg, num_envs=8, seed=0, hidden=(32, 32),
        use_lstm=True, lstm_size=32,
    )
    logs = tr.run(2, log_every=1)
    assert all(np.isfinite(v) for m in logs for v in m.items() if isinstance(v, float))
    ev = tr.evaluate(episodes=4)
    assert np.isfinite(ev["return_mean"])
    # carry actually evolves during rollouts
    assert float(jnp.abs(tr.carry[0]).max()) > 0


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
