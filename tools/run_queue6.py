"""Post-solver-fix reruns: the three jobs that hit the non-finite
fail-fast before the projected-Jacobi row-sum-scaling fix (dd31a9e)."""

import sys

import run_queue as rq

rq.JOBS = [
    ("hopper_stand_ppo_r2", 400,
     "--env", "hopper-stand", "--algo", "ppo", "--steps", "10_000_000",
     "--num-envs", "128", "--tag", "hopper_stand_ppo_r2"),
    ("walker_run_ppo_r2", 500,
     "--env", "walker-run", "--algo", "ppo", "--steps", "20_000_000",
     "--num-envs", "128", "--tag", "walker_run_ppo_r2"),
    ("manipulator_ddpg_r2", 500,
     "--env", "manipulator-bring_ball", "--algo", "ddpg", "--steps", "4_000_000",
     "--num-envs", "128", "--tag", "manipulator_ddpg_r2"),
]

if __name__ == "__main__":
    sys.exit(rq.main())
