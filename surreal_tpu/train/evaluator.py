"""Deterministic / stochastic policy evaluation.

Role of the reference's eval agent processes (SURVEY.md §3.5): run the
policy in deterministic (or fixed-noise) mode over full episodes on a
reserved env batch, report episode returns. One jitted scan. Supports
stateful (LSTM) policies via the policy-state carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs import base as env_base
from surreal_tpu.models.z_filter import zfilter_normalize


def evaluate_policy(env, policy_fn, params, zfilter=None, episodes: int = 16, seed: int = 0,
                    flatten=None, init_policy_state=None):
    """policy_fn(params, obs, key[, pstate]) -> action | (action, pstate).
    Runs `episodes` parallel envs for one full episode each; returns dict
    with mean/std/min/max return."""
    flatten = flatten or env_base.flatten_obs
    stateful = init_policy_state is not None
    key = jax.random.PRNGKey(seed)
    k_reset, k_run = jax.random.split(key)
    reset_fn, step_fn = env_base.vectorize(env)

    def run():
        env_state, ts = reset_fn(jax.random.split(k_reset, episodes))
        obs = flatten(ts.obs)

        def step(carry, key_t):
            env_state, obs, pstate, ep_ret = carry
            o = zfilter_normalize(zfilter, obs) if zfilter is not None else obs
            if stateful:
                action, pstate = policy_fn(params, o, key_t, pstate)
            else:
                action = policy_fn(params, o, key_t)
            env_state, ts = step_fn(env_state, action)
            ep_ret = ep_ret + ts.reward
            return (env_state, flatten(ts.carry_obs), pstate, ep_ret), None

        keys = jax.random.split(k_run, env.episode_steps)
        (_, _, _, ep_ret), _ = jax.lax.scan(
            step, (env_state, obs, init_policy_state, jnp.zeros(episodes)), keys
        )
        return ep_ret

    returns = np.asarray(jax.jit(run)())
    return {
        "return_mean": float(returns.mean()),
        "return_std": float(returns.std()),
        "return_min": float(returns.min()),
        "return_max": float(returns.max()),
        "episodes": episodes,
    }
