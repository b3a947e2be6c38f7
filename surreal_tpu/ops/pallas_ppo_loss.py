"""Fused clipped-surrogate PPO loss Pallas kernel (forward + custom VJP).

Native-kernel checklist item (SURVEY.md §2C "fused clipped-surrogate +
entropy + value loss"): one VMEM pass over the minibatch computes Gaussian
log-probs, importance ratios, the clipped surrogate, the clipped value
loss, entropy, KL and clip-fraction — emitting only per-tile partial sums
(no per-sample intermediates in HBM). The backward kernel recomputes the
tile in VMEM and emits d(mean), d(log_std), d(value) directly.

The jnp reference implementation lives in `surreal_tpu.algos.ppo._loss_fn`;
`fused_clip_loss` is numerically equivalent (tested vs autodiff in
interpret mode) for the 'clip' objective. The adaptive-KL objective keeps
the jnp path.

MEASURED VERDICT (round 2, real TPU v5 lite, results/kernels_r2.txt): at
the production minibatch (N=4096, A=6, 256x256 MLP) the full
value_and_grad step is 425 us with the jnp loss vs 494 us fused — XLA
already fuses the elementwise loss into the network fwd/bwd epilogues,
while pallas_call forces mean/log_std/value through an HBM materialization
boundary. Gradients match autodiff EXACTLY (max|diff| 0.0 on chip).
`fused_loss=False` stays the default; the kernel remains available and
CI-tested for larger models where the loss tail stops fitting the epilogue.

All (N,)-shaped per-sample arrays ride in the sublane dimension as
(TILE, 1) blocks; the small action axis sits in the lanes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # minibatch rows per grid step

_LOG_2PI = math.log(2.0 * math.pi)
# partial-sum channels: [surr, vloss, entropy, kl, clip_frac]
_NSUMS = 5


def _logp_terms(mean, log_std, action):
    inv_std = jnp.exp(-log_std)
    z = (action - mean) * inv_std
    logp = -0.5 * jnp.sum(z * z + 2.0 * log_std + _LOG_2PI, -1, keepdims=True)
    return z, inv_std, logp


def _fwd_kernel(clip_eps, mean_ref, ls_ref, v_ref, a_ref, lp_old_ref,
                mo_ref, lso_ref, adv_ref, vt_ref, vold_ref, sums_ref):
    mean, log_std = mean_ref[:], ls_ref[:]
    _, _, logp = _logp_terms(mean, log_std, a_ref[:])
    # log-ratio clamp matches ppo._loss_fn (prevents exp overflow NaN)
    ratio = jnp.exp(jnp.clip(logp - lp_old_ref[:], -20.0, 20.0))
    adv = adv_ref[:]
    r_clip = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    surr = jnp.minimum(ratio * adv, r_clip * adv)

    v, v_old, vt = v_ref[:], vold_ref[:], vt_ref[:]
    v_cl = v_old + jnp.clip(v - v_old, -clip_eps, clip_eps)
    vloss = 0.5 * jnp.maximum((v - vt) ** 2, (v_cl - vt) ** 2)

    ent = jnp.sum(log_std + 0.5 * (_LOG_2PI + 1.0), -1, keepdims=True)
    # KL(old || new) for diagonal Gaussians
    mo, lso = mo_ref[:], lso_ref[:]
    var_ratio = jnp.exp(2.0 * (lso - log_std))
    dmu = (mo - mean) * jnp.exp(-log_std)
    kl = jnp.sum(log_std - lso + 0.5 * (var_ratio + dmu * dmu - 1.0), -1,
                 keepdims=True)
    clip_frac = (jnp.abs(ratio - 1.0) > clip_eps).astype(surr.dtype)

    # Scalar accumulator in SMEM, revisited by every grid step (constant
    # index_map keeps the block resident); zero on the first step, then
    # accumulate per-tile sums. VMEM cannot take scalar stores on Mosaic.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for k in range(_NSUMS):
            sums_ref[k] = jnp.zeros((), surr.dtype)

    for k, val in enumerate((surr, vloss, ent, kl, clip_frac)):
        sums_ref[k] += jnp.sum(val)


def _bwd_kernel(clip_eps, value_coef, entropy_coef, inv_n,
                mean_ref, ls_ref, v_ref, a_ref, lp_old_ref,
                mo_ref, lso_ref, adv_ref, vt_ref, vold_ref,
                dmean_ref, dls_ref, dv_ref):
    """d loss / d (mean, log_std, value) with
    loss = -mean(surr) + value_coef*mean(vloss) - entropy_coef*mean(ent)."""
    mean, log_std = mean_ref[:], ls_ref[:]
    z, inv_std, logp = _logp_terms(mean, log_std, a_ref[:])
    x = logp - lp_old_ref[:]
    ratio = jnp.exp(jnp.clip(x, -20.0, 20.0))
    in_band_lr = (jnp.abs(x) < 20.0).astype(mean.dtype)  # clip passthrough
    adv = adv_ref[:]
    r_clip = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    # gradient flows through the unclipped branch iff it attains the min
    # (jnp.minimum takes the FIRST arg at ties — match autodiff exactly by
    # treating ties as the unclipped branch)
    use_unclipped = (ratio * adv <= r_clip * adv).astype(mean.dtype)
    dsurr_dlogp = use_unclipped * ratio * adv * in_band_lr  # (TILE, 1)
    g_logp = -inv_n * dsurr_dlogp
    # d logp/d mean = z/std ; d logp/d log_std = z^2 - 1
    dmean_ref[:] = g_logp * z * inv_std
    dls_ref[:] = g_logp * (z * z - 1.0) - (entropy_coef * inv_n)

    v, v_old, vt = v_ref[:], vold_ref[:], vt_ref[:]
    dv = v - v_old
    v_cl = v_old + jnp.clip(dv, -clip_eps, clip_eps)
    e1 = (v - vt) ** 2
    e2 = (v_cl - vt) ** 2
    # max picks e1 at ties (jnp.maximum first-arg tie rule)
    use_raw = (e1 >= e2).astype(v.dtype)
    in_band = (jnp.abs(dv) < clip_eps).astype(v.dtype)
    dvloss = use_raw * (v - vt) + (1.0 - use_raw) * (v_cl - vt) * in_band
    dv_ref[:] = (value_coef * inv_n) * dvloss


def _call_specs(N, A, dtype):
    grid = (N // TILE,)
    col = pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((TILE, A), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [mat, mat, col, mat, col, mat, mat, col, col, col]
    return grid, col, mat, in_specs


def _fwd_call(clip_eps, interpret, args):
    (mean, log_std, value, *_rest) = args
    N, A = mean.shape
    grid, col, mat, in_specs = _call_specs(N, A, mean.dtype)
    sums = pl.pallas_call(
        functools.partial(_fwd_kernel, mean.dtype.type(clip_eps)),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_NSUMS,), lambda i: (0,),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((_NSUMS,), mean.dtype),
        interpret=interpret,
    )(*args)
    return sums / N  # [surr, vloss, ent, kl, clip_frac] means


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3)
)
def _fused(clip_eps, value_coef, entropy_coef, interpret,
           mean, log_std, value, action, logp_old, mean_old, log_std_old,
           adv, vtarg, v_old):
    means = _fwd_call(
        clip_eps, interpret,
        (mean, log_std, value, action, logp_old, mean_old, log_std_old,
         adv, vtarg, v_old),
    )
    surr, vloss, ent, kl, clip_frac = means
    loss = -surr + value_coef * vloss - entropy_coef * ent
    return loss, {
        "policy_loss": -surr,
        "value_loss": vloss,
        "entropy": ent,
        "kl": kl,
        "clip_frac": clip_frac,
    }


def _fused_fwd(clip_eps, value_coef, entropy_coef, interpret, *args):
    out = _fused(clip_eps, value_coef, entropy_coef, interpret, *args)
    return out, args


def _fused_bwd(clip_eps, value_coef, entropy_coef, interpret, args, cts):
    g_loss, _ = cts  # metric cotangents are zero in training use
    (mean, log_std, value, *_rest) = args
    N, A = mean.shape
    grid, col, mat, in_specs = _call_specs(N, A, mean.dtype)
    dmean, dls, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, mean.dtype.type(clip_eps), mean.dtype.type(value_coef),
            mean.dtype.type(entropy_coef), mean.dtype.type(1.0 / N),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(mat, mat, col),
        out_shape=(
            jax.ShapeDtypeStruct((N, A), mean.dtype),
            jax.ShapeDtypeStruct((N, A), mean.dtype),
            jax.ShapeDtypeStruct((N, 1), mean.dtype),
        ),
        interpret=interpret,
    )(*args)
    zeros = lambda x: jnp.zeros_like(x)
    (_, _, _, action, logp_old, mean_old, log_std_old, adv, vtarg, v_old) = args
    return (
        g_loss * dmean, g_loss * dls, g_loss * dv,
        zeros(action), zeros(logp_old), zeros(mean_old), zeros(log_std_old),
        zeros(adv), zeros(vtarg), zeros(v_old),
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_clip_loss(mean, log_std, value, action, logp_old, mean_old,
                    log_std_old, adv, vtarg, v_old, *, clip_eps: float,
                    value_coef: float, entropy_coef: float,
                    interpret: bool = False):
    """Fused PPO 'clip' loss. Shapes: mean/log_std/action/mean_old/
    log_std_old (N, A); value/logp_old/adv/vtarg/v_old (N,). N must be a
    multiple of TILE (=256). Returns (loss, metrics) like ppo._loss_fn's
    per-batch terms (metrics carry no gradient)."""
    N = mean.shape[0]
    assert N % TILE == 0, f"minibatch {N} not a multiple of {TILE}"
    to2d = lambda x: x.reshape(N, 1)
    log_std = jnp.broadcast_to(log_std, mean.shape)
    log_std_old = jnp.broadcast_to(log_std_old, mean.shape)
    return _fused(
        float(clip_eps), float(value_coef), float(entropy_coef), bool(interpret),
        mean, log_std, value.reshape(N, 1), action, to2d(logp_old),
        mean_old, log_std_old, to2d(adv), to2d(vtarg), to2d(v_old),
    )
