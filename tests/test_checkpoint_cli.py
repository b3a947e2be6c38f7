"""Checkpoint retention/restore + CLI config generation + end-to-end CLI."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.cli.configs import generate_configs, to_algo_config
from surreal_tpu.config import ConfigError
from surreal_tpu.train.checkpoint import Checkpointer


def test_checkpoint_latest_and_best(tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"), keep_latest=2)
    state = {"w": jnp.arange(4.0), "step": jnp.asarray(0)}
    ck.save(1, state, score=10.0)
    ck.save(2, jax.tree.map(lambda x: x + 1, state), score=5.0)  # worse: not best
    ck.save(3, jax.tree.map(lambda x: x + 2, state), score=20.0)  # new best
    ck.wait()
    assert ck.latest_step() == 3
    restored = ck.restore(state)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0) + 2)
    best = ck.restore(state, best=True)
    np.testing.assert_allclose(np.asarray(best["w"]), np.arange(4.0) + 2)
    assert ck.best_info["best_score"] == 20.0
    # retention: only 2 latest kept
    steps = sorted(os.listdir(tmp_path / "ck" / "latest"))
    assert len([s for s in steps if s.isdigit()]) <= 2
    ck.close()


def test_checkpoint_restore_missing(tmp_path):
    ck = Checkpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ck.restore({"w": jnp.zeros(2)})


def test_generate_configs_validation():
    with pytest.raises(ConfigError):
        generate_configs("ppo", {})  # env_name REQUIRED
    learner, env, session = generate_configs(
        "ppo", {"env": {"env_name": "cheetah-run"}, "learner": {"lr": 1e-4}}
    )
    assert learner.lr == 1e-4
    cfg = to_algo_config(learner)
    assert cfg.lr == 1e-4
    with pytest.raises(ConfigError):
        generate_configs("ddpg", {"env": {"env_name": "x"}, "learner": {"nope": 1}})


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """Full subprocess drive: train tiny PPO, then eval from checkpoint."""
    env = dict(os.environ, SURREAL_TPU_PLATFORM="cpu")
    out = subprocess.run(
        [
            sys.executable, "-m", "surreal_tpu.cli.main", "train", "ppo",
            "--env.env_name", "cartpole-balance", "--env.num_envs", "8",
            "--learner.horizon", "8", "--learner.hidden", "[16,16]",
            "--learner.num_minibatches", "1",
            "--session.total_env_steps", "256",
            "--session.eval_every_steps", "256",
            "--session.checkpoint_every_steps", "256",
            "--session.eval_episodes", "2",
            "--session.results_dir", str(tmp_path),
            "--session.experiment_name", "t",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "t" / "config.json").exists()
    out2 = subprocess.run(
        [
            sys.executable, "-m", "surreal_tpu.cli.main", "eval",
            "--experiment", str(tmp_path / "t"), "--episodes", "2",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    result = json.loads(out2.stdout.strip().splitlines()[-1])
    assert np.isfinite(result["return_mean"])
