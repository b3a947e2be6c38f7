"""Fourth-pass queue: pixel cheetah retry at 128 envs (256-env jobs wedge
the axon tunnel intermittently — same workaround as hopper), plus a
swimmer6 PPO curve for the new fluid-drag domain."""

import sys

import run_queue as rq

rq.JOBS = [
    ("cheetah_pixel_ppo_r2", 1800,
     "--env", "cheetah-run", "--algo", "ppo", "--pixel", "--steps", "20_000_000",
     "--num-envs", "128", "--lr", "1e-4", "--entropy", "0.003",
     "--set", "lr_max_scale=2", "--tag", "cheetah_pixel_ppo_r2"),
    ("swimmer6_ppo_r2", 900,
     "--env", "swimmer-swimmer6", "--algo", "ppo", "--steps", "20_000_000",
     "--num-envs", "128", "--entropy", "0.003", "--tag", "swimmer6_ppo_r2"),
]

if __name__ == "__main__":
    sys.exit(rq.main())
