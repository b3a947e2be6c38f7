"""Second-pass training queue: 128-env retries for jobs that wedged at 256
envs, plus a longer finger-spin PPO. Same health-gated runner."""

import sys

import run_queue as rq

rq.JOBS = [
    ("hopper_stand_ppo_r2", 1800,
     "--env", "hopper-stand", "--algo", "ppo", "--steps", "10_000_000",
     "--num-envs", "128", "--tag", "hopper_stand_ppo_r2"),
    ("finger_spin_ppo_long_r2", 2400,
     "--env", "finger-spin", "--algo", "ppo", "--steps", "60_000_000",
     "--num-envs", "128", "--entropy", "0.005", "--set", "lr_max_scale=2",
     "--tag", "finger_spin_ppo_long_r2"),
    ("pendulum_ppo_r2", 1500,
     "--env", "pendulum-swingup", "--algo", "ppo", "--steps", "6_000_000",
     "--num-envs", "128", "--tag", "pendulum_ppo_r2"),
    ("reacher_easy_ppo_r2", 1500,
     "--env", "reacher-easy", "--algo", "ppo", "--steps", "6_000_000",
     "--num-envs", "128", "--tag", "reacher_easy_ppo_r2"),
    ("walker_run_ppo_r2", 2400,
     "--env", "walker-run", "--algo", "ppo", "--steps", "20_000_000",
     "--num-envs", "128", "--tag", "walker_run_ppo_r2"),
    ("manipulator_ddpg_r2", 2400,
     "--env", "manipulator-bring_ball", "--algo", "ddpg", "--steps", "4_000_000",
     "--num-envs", "128", "--tag", "manipulator_ddpg_r2"),
]

if __name__ == "__main__":
    sys.exit(rq.main())
