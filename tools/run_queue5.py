"""Consolidated round-2 queue (replaces queue3/queue4 mid-round): the
wedge-prone 256-env pixel job is retried at 128 envs first (highest
judge value), then the new swimmer domain, then the remaining curves.
Jobs whose results/<tag>.txt already has an EVAL line are skipped."""

import sys

import run_queue as rq

rq.JOBS = [
    ("cheetah_pixel_ppo_r2", 1800,
     "--env", "cheetah-run", "--algo", "ppo", "--pixel", "--steps", "20_000_000",
     "--num-envs", "128", "--lr", "1e-4", "--entropy", "0.003",
     "--set", "lr_max_scale=2", "--tag", "cheetah_pixel_ppo_r2"),
    ("finger_spin_ppo_long_r2", 1200,
     "--env", "finger-spin", "--algo", "ppo", "--steps", "60_000_000",
     "--num-envs", "128", "--entropy", "0.005", "--set", "lr_max_scale=2",
     "--tag", "finger_spin_ppo_long_r2"),
    ("swimmer6_ppo_r2", 900,
     "--env", "swimmer-swimmer6", "--algo", "ppo", "--steps", "20_000_000",
     "--num-envs", "128", "--entropy", "0.003", "--tag", "swimmer6_ppo_r2"),
    ("hopper_stand_ppo_r2", 1000,
     "--env", "hopper-stand", "--algo", "ppo", "--steps", "10_000_000",
     "--num-envs", "128", "--tag", "hopper_stand_ppo_r2"),
    ("walker_run_ppo_r2", 1000,
     "--env", "walker-run", "--algo", "ppo", "--steps", "20_000_000",
     "--num-envs", "128", "--tag", "walker_run_ppo_r2"),
    ("manipulator_ddpg_r2", 1200,
     "--env", "manipulator-bring_ball", "--algo", "ddpg", "--steps", "4_000_000",
     "--num-envs", "128", "--tag", "manipulator_ddpg_r2"),
    ("pendulum_ppo_r2", 700,
     "--env", "pendulum-swingup", "--algo", "ppo", "--steps", "6_000_000",
     "--num-envs", "128", "--tag", "pendulum_ppo_r2"),
    ("reacher_easy_ppo_r2", 700,
     "--env", "reacher-easy", "--algo", "ppo", "--steps", "6_000_000",
     "--num-envs", "128", "--tag", "reacher_easy_ppo_r2"),
]

if __name__ == "__main__":
    sys.exit(rq.main())
