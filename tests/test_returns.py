"""GAE / n-step return scans vs NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from surreal_tpu.ops.returns import discounted_reverse_scan, gae, nstep_returns


def _gae_numpy(r, v, nv, disc, done, gamma, lam):
    T = r.shape[0]
    adv = np.zeros_like(r)
    acc = np.zeros(r.shape[1:])
    for t in reversed(range(T)):
        delta = r[t] + gamma * disc[t] * nv[t] - v[t]
        acc = delta + gamma * lam * disc[t] * (1.0 - done[t]) * acc
        adv[t] = acc
    return adv


def test_discounted_scan_matches_sequential(rng):
    x = rng.randn(100, 8).astype(np.float32)
    c = rng.uniform(0, 1, (100, 8)).astype(np.float32)
    a = np.asarray(discounted_reverse_scan(jnp.array(x), jnp.array(c), associative=True))
    b = np.asarray(discounted_reverse_scan(jnp.array(x), jnp.array(c), associative=False))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_gae_matches_numpy(rng):
    T, B = 64, 16
    r = rng.randn(T, B).astype(np.float32)
    v = rng.randn(T, B).astype(np.float32)
    nv = rng.randn(T, B).astype(np.float32)
    done = (rng.uniform(size=(T, B)) < 0.02).astype(np.float32)
    disc = np.ones((T, B), np.float32)
    adv, vtarg = gae(
        jnp.array(r), jnp.array(v), jnp.array(nv), jnp.array(disc), jnp.array(done),
        gamma=0.99, lam=0.95,
    )
    want = _gae_numpy(r, v, nv, disc, done, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vtarg), want + v, rtol=2e-4, atol=2e-4)


def test_gae_truncation_bootstraps_terminal_value():
    """At a truncation (done=1, discount=1) the delta must use the terminal
    obs value, and the advantage chain must cut."""
    T = 3
    r = jnp.array([[1.0], [1.0], [1.0]])
    v = jnp.array([[0.0], [0.0], [0.0]])
    nv = jnp.array([[5.0], [7.0], [9.0]])
    disc = jnp.ones((T, 1))
    done = jnp.array([[0.0], [1.0], [0.0]])  # boundary after step 1
    adv, _ = gae(r, v, nv, disc, done, gamma=0.5, lam=1.0)
    # t=2: delta = 1 + .5*9 = 5.5
    assert np.isclose(float(adv[2, 0]), 5.5)
    # t=1 (done): delta = 1 + .5*7 = 4.5 ; chain cut -> adv = 4.5
    assert np.isclose(float(adv[1, 0]), 4.5)
    # t=0: delta = 1 + .5*5 = 3.5 ; + .5*1*adv1 = 3.5 + 2.25
    assert np.isclose(float(adv[0, 0]), 3.5 + 0.5 * 4.5)


def test_nstep_returns(rng):
    n, B = 3, 32
    r = rng.randn(n, B).astype(np.float32)
    done = np.zeros((n, B), np.float32)
    done[1, :4] = 1.0  # some episodes end after the 2nd reward
    G, cont = nstep_returns(jnp.array(r), jnp.array(done), gamma=0.9)
    # manual
    want_G = r[0] + 0.9 * r[1] + 0.81 * r[2] * (1 - done[1])
    want_cont = 0.9**3 * (1 - done[1])
    np.testing.assert_allclose(np.asarray(G), want_G, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cont), want_cont, rtol=1e-5)
