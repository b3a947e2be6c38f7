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
            "--session.video", "true", "--session.video_steps", "40",
            "--session.results_dir", str(tmp_path),
            "--session.experiment_name", "t",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "t" / "config.json").exists()
    videos = list((tmp_path / "t" / "videos").glob("*.gif"))
    assert videos, "eval video GIF not recorded"
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


def _train_cmd(tmp_path, name, total_steps, extra=()):
    return [
        sys.executable, "-m", "surreal_tpu.cli.main", "train", "ppo",
        "--env.env_name", "cartpole-balance", "--env.num_envs", "8",
        "--learner.horizon", "8", "--learner.hidden", "[16,16]",
        "--learner.num_minibatches", "1",
        "--session.total_env_steps", str(total_steps),
        "--session.eval_every_steps", str(total_steps),
        "--session.checkpoint_every_steps", "128",
        "--session.eval_episodes", "2",
        "--session.results_dir", str(tmp_path),
        "--session.experiment_name", name,
        *extra,
    ]


@pytest.mark.slow
def test_cli_kill_and_resume(tmp_path):
    """A killed run resumes from the latest FULL-state checkpoint: the step
    counter continues (no restart from 0) and training reaches the target
    (SURVEY.md §5 checkpoint/resume; reference --restore semantics)."""
    env = dict(os.environ, SURREAL_TPU_PLATFORM="cpu")
    # phase 1: run to 256 env-steps (4 iters of 64), checkpoints at 128/256
    out = subprocess.run(_train_cmd(tmp_path, "r", 256), env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    # phase 2: same experiment, target extended to 512 -> must RESUME, not
    # restart (restore='auto' picks up the latest checkpoint)
    out2 = subprocess.run(_train_cmd(tmp_path, "r", 512), env=env,
                          capture_output=True, text=True, timeout=600)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "resumed from checkpoint @ 256" in out2.stderr
    steps = [int(s) for s in os.listdir(tmp_path / "r" / "checkpoints" / "latest")
             if s.isdigit()]
    assert max(steps) == 512, steps
    # and the resumed run continued counting iterations (iter 4 -> 8),
    # i.e. replayed nothing and restarted nothing
    assert "(iter 4)" in out2.stderr
    # restore=false starts fresh (no resume line)
    out3 = subprocess.run(
        _train_cmd(tmp_path, "r", 256, extra=("--session.restore", "false")),
        env=env, capture_output=True, text=True, timeout=600)
    assert out3.returncode == 0, out3.stderr[-2000:]
    assert "resumed from checkpoint" not in out3.stderr


@pytest.mark.slow
def test_cli_sharded_mesh_train(tmp_path):
    """--session.mesh.data 8 trains data-parallel on the 8-device virtual
    CPU mesh end-to-end through the CLI (SURVEY.md §1 L6, §2D wiring)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    env = dict(os.environ, SURREAL_TPU_PLATFORM="cpu")
    out = subprocess.run(
        _train_cmd(tmp_path, "m", 256, extra=("--session.mesh.data", "8")),
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    out2 = subprocess.run(
        [sys.executable, "-m", "surreal_tpu.cli.main", "eval",
         "--experiment", str(tmp_path / "m"), "--episodes", "2"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out2.returncode == 0, out2.stderr[-2000:]
    result = json.loads(out2.stdout.strip().splitlines()[-1])
    assert np.isfinite(result["return_mean"])


def test_ddpg_full_state_roundtrip(tmp_path):
    """DDPG full_state (incl. replay buffer contents + cursor + OU noise)
    survives an Orbax save/restore into a FRESH trainer (SURVEY.md §5)."""
    from surreal_tpu.algos.ddpg import DDPGConfig
    from surreal_tpu.train import DDPGTrainer

    cfg = DDPGConfig(rollout_steps=4, updates_per_iteration=2, batch_size=16,
                     min_replay=32, replay_capacity=512)
    tr = DDPGTrainer("cartpole-balance", cfg, num_envs=8, seed=0,
                     actor_hidden=(16, 16), critic_hidden=(16, 16))
    tr.run(6, log_every=6)
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(6, tr.full_state)
    ck.wait()

    tr2 = DDPGTrainer("cartpole-balance", cfg, num_envs=8, seed=123,
                      actor_hidden=(16, 16), critic_hidden=(16, 16))
    tr2.load_full_state(ck.restore(tr2.full_state))
    assert tr2.global_iter == 6
    np.testing.assert_array_equal(np.asarray(tr2.replay.total),
                                  np.asarray(tr.replay.total))
    for a, b in zip(jax.tree.leaves(tr2.full_state),
                    jax.tree.leaves(tr.full_state), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed trainer continues stepping
    logs = tr2.run(2, log_every=2)
    assert np.isfinite(logs[-1]["q_mean"])
    ck.close()
