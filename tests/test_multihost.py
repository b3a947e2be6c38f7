"""REAL multi-process training test: two jax.distributed processes (4
virtual CPU devices each -> 8 global), the full CLI path with
--session.multihost.* + --session.mesh.data 8 (SURVEY.md §2E: DCN-style
cross-process collectives via gloo on the CPU backend; on TPU the same
program rides ICI). This upgrades multihost from 'compiles on a virtual
mesh' to 'actually executes across process boundaries'."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_cli_train(tmp_path):
    port = _free_port()

    def cmd(rank):
        return [
            sys.executable, "-m", "surreal_tpu.cli.main", "train", "ppo",
            "--env.env_name", "cartpole-balance", "--env.num_envs", "16",
            "--learner.horizon", "8", "--learner.hidden", "[16,16]",
            "--learner.num_minibatches", "1",
            "--session.total_env_steps", "256",
            "--session.eval_every_steps", "256",
            "--session.checkpoint_every_steps", "256",
            "--session.eval_episodes", "2",
            "--session.results_dir", str(tmp_path),
            "--session.experiment_name", "mh",
            "--session.mesh.data", "8",
            "--session.multihost.coordinator", f"127.0.0.1:{port}",
            "--session.multihost.num_processes", "2",
            "--session.multihost.process_id", str(rank),
        ]

    env = dict(
        os.environ,
        SURREAL_TPU_PLATFORM="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(cmd(r), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for r in (0, 1)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-3000:]
    # primary wrote the experiment artifacts exactly once
    assert (tmp_path / "mh" / "config.json").exists()
    steps = [s for s in os.listdir(tmp_path / "mh" / "checkpoints" / "latest")
             if s.isdigit()]
    assert steps, "no checkpoint written"
    # both processes ran the SAME sharded program: their logged eval lines agree
    evals = []
    for _, se in outs:
        lines = [ln for ln in se.splitlines() if "eval @" in ln]
        assert lines, se[-2000:]
        evals.append(lines[-1].split("steps:")[-1])
    assert evals[0] == evals[1], evals
