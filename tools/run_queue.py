"""Serialized TPU training-queue runner with device-health gating.

The axon tunnel wedges occasionally (hung compiles survive client kills);
this runner (a) waits until a trivial jitted program completes before each
job, (b) runs each tools/run_training.py job under its own timeout in a
fresh process (one TPU client at a time), and (c) logs outcomes to
results/queue_r2.log. Jobs that fail or time out don't block the rest.

Usage: python tools/run_queue.py  (expects the TPU; jobs listed below)
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")
LOG = os.path.join(ROOT, "results", "queue_r2.log")

HEALTH_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)));"
    "jax.block_until_ready(x); print('HEALTH_OK')"
)

JOBS = [
    # (tag, timeout_s, args...)
    ("finger_spin_ppo_r2", 2400,
     "--env", "finger-spin", "--algo", "ppo", "--steps", "20_000_000",
     "--num-envs", "128", "--entropy", "0.005", "--set", "lr_max_scale=2",
     "--tag", "finger_spin_ppo_r2"),
    ("hopper_stand_ppo_r2", 1800,
     "--env", "hopper-stand", "--algo", "ppo", "--steps", "10_000_000",
     "--num-envs", "256", "--tag", "hopper_stand_ppo_r2"),
    ("cartpole_lstm_ppo_r2", 1800,
     "--env", "cartpole-balance", "--algo", "ppo", "--steps", "2_000_000",
     "--num-envs", "128", "--lstm", "--lstm-size", "64", "--minibatches", "4",
     "--tag", "cartpole_lstm_ppo_r2"),
    ("cheetah_pixel_ppo_r2", 3600,
     "--env", "cheetah-run", "--algo", "ppo", "--pixel", "--steps", "30_000_000",
     "--num-envs", "256", "--lr", "1e-4", "--entropy", "0.003",
     "--set", "lr_max_scale=2", "--tag", "cheetah_pixel_ppo_r2"),
    ("manipulator_ddpg_r2", 2400,
     "--env", "manipulator-bring_ball", "--algo", "ddpg", "--steps", "4_000_000",
     "--num-envs", "128", "--tag", "manipulator_ddpg_r2"),
    ("pendulum_ppo_r2", 1200,
     "--env", "pendulum-swingup", "--algo", "ppo", "--steps", "4_000_000",
     "--num-envs", "256", "--tag", "pendulum_ppo_r2"),
    ("reacher_easy_ppo_r2", 1200,
     "--env", "reacher-easy", "--algo", "ppo", "--steps", "4_000_000",
     "--num-envs", "256", "--tag", "reacher_easy_ppo_r2"),
]


def log(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def wait_healthy(max_wait_s=7200, probe_timeout=300, retry_sleep=240) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            out = subprocess.run(
                [sys.executable, "-c", HEALTH_SRC], timeout=probe_timeout,
                capture_output=True, text=True,
            )
            if "HEALTH_OK" in out.stdout:
                return True
            log(f"health probe rc={out.returncode}: {out.stderr[-200:]}")
        except subprocess.TimeoutExpired:
            log("health probe timed out (device wedged); retrying")
        time.sleep(retry_sleep)
    return False


def main():
    for tag, tmo, *args in JOBS:
        path = os.path.join(ROOT, "results", f"{tag}.txt")
        if os.path.exists(path) and "EVAL" in open(path).read():
            log(f"{tag}: already complete, skipping")
            continue
        if not wait_healthy():
            log("device never became healthy; aborting queue")
            return 1
        log(f"{tag}: starting (timeout {tmo}s)")
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "run_training.py"), *args],
                timeout=tmo, capture_output=True, text=True,
            )
            tail = (out.stdout + out.stderr)[-400:].replace("\n", " | ")
            log(f"{tag}: rc={out.returncode} {tail}")
        except subprocess.TimeoutExpired:
            log(f"{tag}: TIMED OUT after {tmo}s")
    log("queue done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
