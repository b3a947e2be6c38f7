"""Measure the CPU reference denominator (BASELINE.md).

Reproduces the Surreal-style actor hot loop (SURVEY.md §3.2): ONE dm_control
env stepped by a torch CPU policy (MLP 300x200, the reference's DDPG actor
size), single thread, no experience-send overhead — i.e. the per-actor
throughput the reference scales out by adding processes.

    python tools/measure_cpu_reference.py [domain] [task] [seconds]
"""

import sys
import time

import numpy as np
import torch


def main(domain="cheetah", task="run", seconds=10.0):
    from dm_control import suite

    torch.set_num_threads(1)
    env = suite.load(domain, task)
    spec = env.action_spec()
    obs_dim = sum(int(np.prod(v.shape)) if v.shape else 1
                  for v in env.observation_spec().values())
    act_dim = spec.shape[0]
    policy = torch.nn.Sequential(
        torch.nn.Linear(obs_dim, 300), torch.nn.ReLU(),
        torch.nn.Linear(300, 200), torch.nn.ReLU(),
        torch.nn.Linear(200, act_dim), torch.nn.Tanh(),
    )
    ts = env.reset()

    def flat_obs(ts):
        return np.concatenate([np.atleast_1d(v).ravel() for v in ts.observation.values()])

    steps = 0
    t0 = time.perf_counter()
    with torch.no_grad():
        while time.perf_counter() - t0 < seconds:
            obs = torch.as_tensor(flat_obs(ts), dtype=torch.float32)
            action = policy(obs).numpy()
            ts = env.step(action)
            if ts.last():
                ts = env.reset()
            steps += 1
    dt = time.perf_counter() - t0
    print(f"{domain}-{task}: {steps / dt:,.0f} env-steps/s "
          f"(1 actor, torch MLP 300x200 CPU policy, 1 thread)")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(args[:2] + [float(a) for a in args[2:3]]))
