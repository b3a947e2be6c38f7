"""Fused PPO loss kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.algos import ppo
from surreal_tpu.models.distributions import DiagGauss
from surreal_tpu.ops import pallas_ppo_loss


@pytest.fixture()
def batch(rng):
    N, A = 512, 6
    f = lambda *s: jnp.array(rng.randn(*s), jnp.float32)
    mean, value, action = f(N, A), f(N), f(N, A)
    log_std = f(A) * 0.3
    mean_old = mean + 0.1 * f(N, A)
    log_std_old = log_std + 0.05
    logp_old = DiagGauss.log_prob(mean_old, log_std_old, action)
    return dict(
        mean=mean, log_std=log_std, value=value, action=action,
        logp_old=logp_old, mean_old=mean_old, log_std_old=log_std_old,
        adv=f(N), vtarg=f(N), v_old=value + 0.1 * f(N),
    )


def _paths(cfg, b, interpret=True):
    loss_batch = (
        None, b["action"], b["logp_old"], b["mean_old"],
        jnp.broadcast_to(b["log_std_old"], b["mean"].shape),
        b["adv"], b["vtarg"], b["v_old"],
    )

    def ref(m, ls, v):
        return ppo._loss_fn(
            cfg, lambda p, o: (m, ls, v), None, loss_batch, jnp.float32(1.0),
            jnp.float32(cfg.entropy_coef),
        )

    def fused(m, ls, v):
        return pallas_ppo_loss.fused_clip_loss(
            m, ls, v, b["action"], b["logp_old"], b["mean_old"],
            b["log_std_old"], b["adv"], b["vtarg"], b["v_old"],
            clip_eps=cfg.clip_eps, value_coef=cfg.value_coef,
            entropy_coef=cfg.entropy_coef, interpret=interpret,
        )

    return ref, fused


@pytest.mark.parametrize("entropy_coef", [0.0, 0.01])
def test_fused_loss_matches_reference(batch, entropy_coef):
    cfg = ppo.PPOConfig(entropy_coef=entropy_coef)
    ref, fused = _paths(cfg, batch)
    args = (batch["mean"], batch["log_std"], batch["value"])
    loss_r, met_r = ref(*args)
    loss_f, met_f = fused(*args)
    np.testing.assert_allclose(float(loss_r), float(loss_f), rtol=1e-6)
    for k in met_r:
        np.testing.assert_allclose(
            float(met_r[k]), float(met_f[k]), rtol=1e-5, err_msg=k
        )


def test_fused_loss_gradients_match_autodiff(batch):
    cfg = ppo.PPOConfig(entropy_coef=0.01)
    ref, fused = _paths(cfg, batch)
    args = (batch["mean"], batch["log_std"], batch["value"])
    g_r = jax.grad(lambda *a: ref(*a)[0], argnums=(0, 1, 2))(*args)
    g_f = jax.grad(lambda *a: fused(*a)[0], argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("dmean", "dlog_std", "dvalue"), g_r, g_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=name
        )


def test_config_flag_dispatches_fused(batch, monkeypatch):
    """cfg.fused_loss routes _loss_fn through the kernel (interpret forced
    via monkeypatched default)."""
    called = {}
    orig = pallas_ppo_loss.fused_clip_loss

    def spy(*a, **kw):
        called["yes"] = True
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pallas_ppo_loss, "fused_clip_loss", spy)
    cfg = ppo.PPOConfig(fused_loss=True)
    b = batch
    loss_batch = (
        b["mean"], b["action"], b["logp_old"], b["mean_old"],
        jnp.broadcast_to(b["log_std_old"], b["mean"].shape),
        b["adv"], b["vtarg"], b["v_old"],
    )
    apply_fn = lambda p, o: (o, b["log_std"], b["value"])
    loss, metrics = ppo._loss_fn(cfg, apply_fn, None, loss_batch, 1.0,
                                 cfg.entropy_coef)
    assert called.get("yes"), "fused kernel was not dispatched"
    assert np.isfinite(float(loss))
