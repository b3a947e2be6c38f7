"""Unrolled small-SPD Cholesky paths vs numpy.linalg (the custom-call-free
replacement for jnp.linalg.inv/solve in the physics substep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.envs.physics import linalg


def _spd(rng, b, n, dtype):
    A = rng.standard_normal((b, n, n)).astype(dtype)
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [1, 2, 5, 9, 14])
def test_solve_and_inv_match_numpy(n):
    rng = np.random.default_rng(0)
    M = _spd(rng, 8, n, np.float32)
    b = rng.standard_normal((8, n)).astype(np.float32)
    x = jax.jit(linalg.solve_spd)(jnp.asarray(M), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(M, b[..., None])[..., 0],
                               rtol=2e-4, atol=2e-4)
    Minv = jax.jit(linalg.inv_spd)(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(Minv), np.linalg.inv(M), rtol=2e-3, atol=2e-4)
    L = jax.jit(linalg.chol_small)(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(M), rtol=2e-4, atol=2e-4)


def test_float64_precision():
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(1)
        M = _spd(rng, 4, 9, np.float64)
        Minv = linalg.inv_spd(jnp.asarray(M))
        np.testing.assert_allclose(np.asarray(Minv), np.linalg.inv(M), atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_unbatched_vmap_consistency():
    rng = np.random.default_rng(2)
    M = _spd(rng, 16, 9, np.float32)
    single = linalg.inv_spd(jnp.asarray(M[0]))
    batched = jax.vmap(linalg.inv_spd)(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(single), np.asarray(batched[0]), rtol=1e-6)
