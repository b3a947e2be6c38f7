"""Small-matrix SPD linear algebra, unrolled for XLA fusion.

Why this exists (round-4 profile, results/profile_cheetah_256_r4.txt): the
physics substep's `jnp.linalg.inv` / `jnp.linalg.solve` on batched tiny
(nv≤14) mass matrices lower to LU-factorization CUSTOM CALLS on TPU at
~570 us per call — 85% of the whole train step's device time. The joint-
space inertia M (and M + h·diag(damping)) is symmetric positive definite
(armature-regularized), so an UNROLLED Cholesky in plain jnp ops — nv is
static and small, every element op is batched over envs — fuses into the
surrounding substep computation on the VPU and removes the custom calls
entirely.

All functions take (..., n, n) / (..., n) batched arrays; the unrolled
loops are over the STATIC dimension n (trace-time Python loops), never
over the batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_small(M):
    """Batched Cholesky L (lower) of SPD M, shape (..., n, n), n static.
    Cholesky-Crout, fully unrolled: O(n^3/6) scalar-per-batch ops.

    Robustness at NUMERICALLY SINGULAR M (measured r4): a swimmer whose
    links align makes the f32 Schur complement collapse to <= 0 — the raw
    factorization NaN'd ~0.05% of swimmer steps per training iteration
    (enough, via divergence-resets, to halve episode returns), and a
    pivot floor relative to M[j,j] still exploded (M's smallest diagonal
    is the 1e-6 armature, so the floored pivot divides by ~1e-6 and L
    reached 5e18 -> inf inverse). The fix is trace-scaled, dtype-aware
    Tikhonov regularization — factor M + eps*max_diag*I — which bounds
    the solve exactly like MuJoCo's own diagonal regularization, changes
    healthy solves by O(eps*cond) << 1, and is invisible (1e-14) in the
    f64 parity tests. A relative pivot clamp stays as the last backstop."""
    n = M.shape[-1]
    eps = 1e-6 if M.dtype == jnp.float32 else 1e-14
    reg = eps * jnp.max(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)),
                        axis=-1)[..., None]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[..., j, j] + reg[..., 0]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps * (M[..., j, j] + reg[..., 0])))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    zero = jnp.zeros_like(M[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)], -1)
            for i in range(n)]
    return jnp.stack(rows, -2)


def solve_tri_lower(L, b):
    """x with L x = b (L lower-triangular (..., n, n), b (..., n))."""
    n = L.shape[-1]
    x = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, -1)


def solve_tri_upper_t(L, b):
    """x with L^T x = b (same lower L; back substitution)."""
    n = L.shape[-1]
    x = [None] * n
    for i in reversed(range(n)):
        s = b[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, -1)


def solve_spd(M, b):
    """Solve M x = b for SPD M via unrolled Cholesky."""
    L = chol_small(M)
    return solve_tri_upper_t(L, solve_tri_lower(L, b))


def inv_spd(M):
    """Inverse of SPD M: M^{-1} = L^{-T} L^{-1} with L^{-1} by unrolled
    forward substitution (exploits the triangular zero pattern)."""
    n = M.shape[-1]
    L = chol_small(M)
    # Linv[i][j] for i >= j; column j of L^{-1} solves L y = e_j
    Linv = [[None] * n for _ in range(n)]
    for j in range(n):
        Linv[j][j] = 1.0 / L[..., j, j]
        for i in range(j + 1, n):
            s = None
            for k in range(j, i):
                t = L[..., i, k] * Linv[k][j]
                s = t if s is None else s + t
            Linv[i][j] = -s / L[..., i, i]
    # M^{-1}[i,j] = sum_k Linv[k,i] * Linv[k,j]  (k >= max(i,j))
    zero = jnp.zeros_like(M[..., 0, 0])
    out = [[zero] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = None
            for k in range(i, n):  # k >= i >= j
                t = Linv[k][i] * Linv[k][j]
                s = t if s is None else s + t
            out[i][j] = s
            out[j][i] = s
    rows = [jnp.stack(out[i], -1) for i in range(n)]
    return jnp.stack(rows, -2)
