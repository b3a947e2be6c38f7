"""DiagGauss vs closed-form / scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from surreal_tpu.models.distributions import DiagGauss


def test_log_prob_matches_scipy(rng):
    mean = rng.randn(16, 4).astype(np.float32)
    log_std = rng.uniform(-1, 0.5, (4,)).astype(np.float32)
    x = rng.randn(16, 4).astype(np.float32)
    got = np.asarray(DiagGauss.log_prob(jnp.array(mean), jnp.array(log_std), jnp.array(x)))
    want = stats.norm.logpdf(x, mean, np.exp(log_std)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_entropy_matches_scipy(rng):
    mean = rng.randn(8, 3).astype(np.float32)
    log_std = rng.uniform(-1, 0.5, (3,)).astype(np.float32)
    got = np.asarray(DiagGauss.entropy(jnp.array(mean), jnp.array(log_std)))
    want = stats.norm.entropy(loc=mean, scale=np.exp(log_std)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kl_zero_for_same_dist(rng):
    mean = rng.randn(8, 3).astype(np.float32)
    ls = rng.uniform(-1, 0.5, (3,)).astype(np.float32)
    kl = DiagGauss.kl(jnp.array(mean), jnp.array(ls), jnp.array(mean), jnp.array(ls))
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_kl_monte_carlo(rng):
    mean_a, ls_a = np.array([0.3, -0.2]), np.array([0.1, -0.3])
    mean_b, ls_b = np.array([-0.1, 0.4]), np.array([-0.2, 0.2])
    kl = float(
        DiagGauss.kl(jnp.array(mean_a), jnp.array(ls_a), jnp.array(mean_b), jnp.array(ls_b))
    )
    x = rng.randn(200000, 2) * np.exp(ls_a) + mean_a
    lp_a = stats.norm.logpdf(x, mean_a, np.exp(ls_a)).sum(-1)
    lp_b = stats.norm.logpdf(x, mean_b, np.exp(ls_b)).sum(-1)
    mc = (lp_a - lp_b).mean()
    assert abs(kl - mc) < 0.02


def test_sample_statistics():
    key = jax.random.PRNGKey(0)
    mean = jnp.array([1.0, -2.0])
    log_std = jnp.array([0.0, -1.0])
    x = DiagGauss.sample(key, jnp.broadcast_to(mean, (50000, 2)), log_std)
    np.testing.assert_allclose(np.asarray(x.mean(0)), [1.0, -2.0], atol=0.02)
    np.testing.assert_allclose(np.asarray(x.std(0)), [1.0, np.exp(-1.0)], atol=0.02)
