"""Policy distributions.

Role of the reference's `DiagGauss` in `surreal/model/ppo_net.py`
[SURVEY.md §2]: diagonal Gaussian with state-independent log-std used by the
PPO policy head — logp, entropy, KL, sampling. Pure functions over arrays
(no modules) so they inline into the fused train step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


class DiagGauss:
    """Stateless namespace for diagonal-Gaussian ops. All functions take
    `mean` (..., A) and `log_std` (..., A) or (A,) broadcastable."""

    @staticmethod
    def sample(key, mean, log_std):
        return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)

    @staticmethod
    def log_prob(mean, log_std, x):
        z = (x - mean) * jnp.exp(-log_std)
        return -0.5 * jnp.sum(z * z + _LOG_2PI, axis=-1) - jnp.sum(
            jnp.broadcast_to(log_std, mean.shape), axis=-1
        )

    @staticmethod
    def entropy(mean, log_std):
        log_std = jnp.broadcast_to(log_std, mean.shape)
        return jnp.sum(log_std + 0.5 * (_LOG_2PI + 1.0), axis=-1)

    @staticmethod
    def kl(mean_a, log_std_a, mean_b, log_std_b):
        """KL(a || b), per-example scalar."""
        log_std_a = jnp.broadcast_to(log_std_a, mean_a.shape)
        log_std_b = jnp.broadcast_to(log_std_b, mean_b.shape)
        var_a = jnp.exp(2 * log_std_a)
        var_b = jnp.exp(2 * log_std_b)
        return jnp.sum(
            log_std_b - log_std_a + (var_a + (mean_a - mean_b) ** 2) / (2 * var_b) - 0.5,
            axis=-1,
        )
