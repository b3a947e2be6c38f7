"""Fused GAE Pallas kernel.

Native-kernel checklist item (SURVEY.md §2C "fused GAE scan"): computes
delta, the reverse λ-scan, and value targets in ONE pass over VMEM-resident
tiles — one HBM read per input, one write per output, no intermediate
delta/coef arrays in HBM.

Layout: time-major (T, B). Grid tiles the env-batch axis into 128-lane
blocks (the TPU lane width); the whole T axis sits in the sublane dimension
of one VMEM block (T ≤ ~2k fits comfortably: 2k×128×4B = 1 MB/input).
The scan runs as a T-step fori_loop of (1, 128) vector ops.

Gradients are not required (advantages/targets are stop-gradient inputs to
the PPO loss), so no custom VJP is needed. `gae(..., backend=...)` in
surreal_tpu.ops.returns dispatches between this kernel and the
associative-scan XLA path; tests compare both (interpret mode on CPU).

MEASURED VERDICT (round 2, real TPU v5 lite, results/kernels_r2.txt): at
the production shape (T=128, B=256) XLA's associative scan wins — 30.2 us
vs 40.9 us for this kernel (the array is 128 KB; both are latency-bound
and the sequential T-step loop can't beat XLA's log-depth scan). The
kernel lowers and matches numerically (6.7e-6); `backend='xla'` stays the
default. Revisit at T >= 1k horizons where the scan's extra passes over
HBM would start to matter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _gae_kernel(gamma, lam, r_ref, v_ref, nv_ref, disc_ref, done_ref, adv_ref, vtg_ref):
    T = r_ref.shape[0]
    # Fused elementwise prologue (VPU): delta and the chain coefficient.
    # Staged through the OUTPUT refs (adv <- delta, vtg <- coef) because
    # Mosaic only supports dynamic (loop-index) slicing on refs, not on
    # materialized vector values.
    disc = disc_ref[:]
    adv_ref[:] = r_ref[:] + gamma * disc * nv_ref[:] - v_ref[:]
    vtg_ref[:] = (gamma * lam) * disc * (1.0 - done_ref[:])

    # Reverse scan over time in VMEM: adv[t] = delta[t] + coef[t]*adv[t+1].
    def body(i, carry):
        t = T - 1 - i
        a = adv_ref[t, :] + vtg_ref[t, :] * carry
        adv_ref[t, :] = a
        return a

    carry = jax.lax.fori_loop(0, T, body, jnp.zeros_like(adv_ref[0, :]))
    del carry
    vtg_ref[:] = adv_ref[:] + v_ref[:]


@functools.partial(jax.jit, static_argnames=("gamma", "lam", "interpret"))
def gae_pallas(rewards, values, next_values, discounts, dones, gamma: float, lam: float,
               interpret: bool = False):
    """(T, B) f32 inputs -> (advantages, value_targets). B must be a
    multiple of 128 (callers pad or pick env counts accordingly)."""
    T, B = rewards.shape
    assert B % LANES == 0, f"env batch {B} not a multiple of {LANES}"
    dones = dones.astype(rewards.dtype)
    grid = (B // LANES,)
    spec = pl.BlockSpec((T, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(_gae_kernel, rewards.dtype.type(gamma), rewards.dtype.type(lam))
    adv, vtg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((T, B), rewards.dtype),
            jax.ShapeDtypeStruct((T, B), rewards.dtype),
        ),
        interpret=interpret,
    )(rewards, values, next_values, discounts, dones)
    return adv, vtg
