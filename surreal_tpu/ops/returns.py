"""Return / advantage computations as time-axis scans.

Role of the reference's GAE and n-step-return code in
`surreal/learner/ppo.py` / `surreal/replay/aggregator.py` [SURVEY.md §2]
— redesigned as `associative_scan` linear recurrences so the time axis
parallelizes on-device (log-depth instead of sequential), and can later be
sharded over a `time` mesh axis (SURVEY.md §2D TimeShardedScan).

All arrays are time-major: (T, ...) with optional trailing batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discounted_reverse_scan(x: jax.Array, coef: jax.Array, associative: bool = True):
    """Solves y_t = x_t + coef_t * y_{t+1}, y_T = x_T (reverse-time linear
    recurrence) along axis 0.

    With `associative=True` uses `jax.lax.associative_scan` (log-depth,
    TPU-friendly); otherwise a sequential `lax.scan` (reference
    implementation for tests).
    """
    if associative:
        def combine(a, b):
            # Composition of maps y -> x + c*y applied in sequence.
            c_a, x_a = a
            c_b, x_b = b
            return c_a * c_b, x_b + c_b * x_a

        _, y = jax.lax.associative_scan(combine, (coef, x), reverse=True, axis=0)
        return y

    def step(carry, inp):
        x_t, c_t = inp
        y = x_t + c_t * carry
        return y, y

    _, ys = jax.lax.scan(step, jnp.zeros_like(x[-1]), (x, coef), reverse=True)
    return ys


def gae(
    rewards: jax.Array,  # (T, ...)
    values: jax.Array,  # (T, ...)  V(obs_t)
    next_values: jax.Array,  # (T, ...) V(obs_{t+1}); at `done` this is the TERMINAL obs value
    discounts: jax.Array,  # (T, ...) 0.0 on true termination, 1.0 otherwise (truncation bootstraps)
    dones: jax.Array,  # (T, ...) episode boundary of either kind
    gamma: float,
    lam: float,
    associative: bool = True,
    backend: str = "xla",  # 'xla' | 'pallas' (fused kernel, (T, B) f32, B % 128 == 0)
):
    """Generalized Advantage Estimation with correct truncation bootstrap.

    delta_t = r_t + γ·disc_t·V(next_t) − V(t)
    A_t     = delta_t + γλ·disc_t·(1 − done_t)·A_{t+1}

    Returns (advantages, value_targets) with value_targets = A + V.
    """
    from surreal_tpu.utils import guards

    if backend == "pallas":
        from surreal_tpu.ops.pallas_gae import gae_pallas

        adv, vtg = gae_pallas(rewards, values, next_values, discounts, dones, gamma, lam)
        guards.assert_finite(adv, "ops.gae[pallas].advantages")
        return adv, vtg
    dones_f = dones.astype(values.dtype)
    delta = rewards + gamma * discounts * next_values - values
    coef = gamma * lam * discounts * (1.0 - dones_f)
    adv = discounted_reverse_scan(delta, coef, associative=associative)
    guards.assert_finite(adv, "ops.gae.advantages")
    return adv, adv + values


def nstep_returns(
    rewards: jax.Array,  # (n, ...) reward window r_t .. r_{t+n-1}
    dones: jax.Array,  # (n, ...) done flags for those steps
    gamma: float,
):
    """Accumulated n-step reward over a window, truncated at episode
    boundaries (role of the reference's n-step aggregator,
    `surreal/replay/aggregator.py` [SURVEY.md §2]).

    Returns (G, cont) where
      G    = Σ_{k<n} γ^k r_{t+k} · Π_{j<k} (1 − done_{t+j})
      cont = γ^n · Π_{k<n} (1 − done_{t+k})   — bootstrap coefficient for
             Q'(s_{t+n}); zero if the episode ended inside the window.
    """
    n = rewards.shape[0]
    alive = jnp.ones_like(rewards[0])
    G = jnp.zeros_like(rewards[0])
    scale = 1.0
    for k in range(n):
        G = G + scale * alive * rewards[k]
        alive = alive * (1.0 - dones[k].astype(rewards.dtype))
        scale = scale * gamma
    return G, scale * alive
