"""PPO with a recurrent (LSTM) policy — sub-trajectory chunk training.

Role of the reference's PPO-LSTM path (`surreal/agent/ppo_agent.py` keeps
hidden state across steps + `surreal/learner/ppo.py` trains on horizon
chunks shipped WITH their initial LSTM state, SURVEY.md §2/§3.2): the
rollout carries the LSTM state across env steps (reset at episode
boundaries), each update chunk stores only its INITIAL carry, and the
learner recomputes the forward pass through time (truncated BPTT over the
chunk). Minibatches are taken over the ENV axis so sequences stay intact.

Shares PPOConfig / PPOTrainState / the surrogate-loss math with
surreal_tpu.algos.ppo.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from surreal_tpu.algos.ppo import (
    PPOConfig,
    PPOTrainState,
    acting_params,
    entropy_coef_at,
    make_optimizer,
)
from surreal_tpu.models.distributions import DiagGauss
from surreal_tpu.models.z_filter import zfilter_normalize, zfilter_update
from surreal_tpu.ops.returns import gae


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LSTMTrajectory:
    obs: jax.Array  # (T, B, D) raw
    action: jax.Array
    log_prob: jax.Array
    mean: jax.Array
    log_std: jax.Array
    value: jax.Array
    next_value: jax.Array
    reward: jax.Array
    discount: jax.Array
    done: jax.Array
    init_carry: Any  # LSTM carry at chunk start, leaves (B, H)


def _reset_carry(carry, done):
    """Zero the carry rows where `done` (episode boundary)."""
    keep = (1.0 - done.astype(jnp.float32))[:, None]
    return jax.tree.map(lambda c: c * keep.astype(c.dtype), carry)


def rollout(cfg, apply_fn, env_step, flatten_obs, state, env_state, obs, carry, ep_ret, key):
    """apply_fn(params, obs, carry) -> (mean, log_std, value, new_carry)."""

    def norm(o):
        return zfilter_normalize(state.zfilter, o) if cfg.use_zfilter else o

    init_carry = carry
    pi = acting_params(cfg, state)

    def probe_value(flat_obs, carry):
        return apply_fn(pi, norm(flat_obs), carry)[2]

    def step(scan_carry, key_t):
        env_state, obs, carry, ep_ret, done_sum, done_ret = scan_carry
        mean, log_std, value, new_carry = apply_fn(pi, norm(obs), carry)
        action = DiagGauss.sample(key_t, mean, log_std)
        log_prob = DiagGauss.log_prob(mean, log_std, action)
        env_state, ts = env_step(env_state, action)
        # Terminal-obs bootstrap value: one LSTM probe ahead on the pre-reset
        # obs with the PRE-reset carry (the probe carry is discarded). Where
        # no env finished this step, the probe equals value(t+1) computed in
        # the next scan iteration (carry_obs == obs, reset_carry == carry),
        # so pay it only when some env finished (lax.cond; dones are rare
        # and lockstep) — bit-identical to a per-step double forward.
        term_value = jax.lax.cond(
            jnp.any(ts.done),
            probe_value,
            lambda o, c: jnp.zeros_like(value),
            flatten_obs(ts.obs),
            new_carry,
        )
        next_obs = flatten_obs(ts.carry_obs)
        new_carry = _reset_carry(new_carry, ts.done)
        tr_step = dict(
            obs=obs, action=action, log_prob=log_prob, mean=mean,
            log_std=jnp.broadcast_to(log_std, mean.shape), value=value,
            term_value=term_value, reward=ts.reward, discount=ts.discount,
            done=ts.done,
        )
        ep_ret = ep_ret + ts.reward
        done_f = ts.done.astype(ep_ret.dtype)
        done_sum = done_sum + done_f
        done_ret = done_ret + done_f * ep_ret
        ep_ret = ep_ret * (1.0 - done_f)
        return (env_state, next_obs, new_carry, ep_ret, done_sum, done_ret), tr_step

    B = obs.shape[0]
    zeros = jnp.zeros((B,), jnp.float32)
    keys = jax.random.split(key, cfg.horizon)
    (env_state, obs, carry, ep_ret, done_sum, done_ret), tr = jax.lax.scan(
        step, (env_state, obs, carry, ep_ret, zeros, zeros), keys
    )
    v_last = probe_value(obs, carry)
    value_next = jnp.concatenate([tr["value"][1:], v_last[None]], axis=0)
    term_value = tr.pop("term_value")
    next_value = jnp.where(tr["done"], term_value, value_next)
    traj = LSTMTrajectory(init_carry=init_carry, next_value=next_value, **tr)
    stats = {"episodes_done": jnp.sum(done_sum), "episode_return_sum": jnp.sum(done_ret)}
    return traj, env_state, obs, carry, ep_ret, stats


def _sequence_outputs(cfg, apply_fn, params, obs_seq, done_seq, init_carry):
    """Recompute (mean, log_std, value) through time from the stored initial
    carry — truncated BPTT over the chunk, carry zeroed at episode bounds."""

    def step(carry, inp):
        o, d = inp
        mean, log_std, value, carry = apply_fn(params, o, carry)
        carry = _reset_carry(carry, d)
        return carry, (mean, jnp.broadcast_to(log_std, mean.shape), value)

    _, (mean, log_std, value) = jax.lax.scan(step, init_carry, (obs_seq, done_seq))
    return mean, log_std, value


def update(cfg, apply_fn, state, traj: LSTMTrajectory, key, axis_name=None):
    T, B = traj.reward.shape
    opt = make_optimizer(cfg, axis_name)

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    def norm(o):
        return zfilter_normalize(state.zfilter, o) if cfg.use_zfilter else o

    obs = norm(traj.obs)
    adv, vtarg = gae(
        traj.reward, traj.value, traj.next_value, traj.discount, traj.done,
        cfg.gamma, cfg.lam,
    )
    if cfg.normalize_adv:
        a_mean = pmean(jnp.mean(adv))
        a_var = pmean(jnp.mean((adv - a_mean) ** 2))
        adv = (adv - a_mean) * jax.lax.rsqrt(a_var + 1e-8)

    mb_envs = B // cfg.num_minibatches
    ent_coef = entropy_coef_at(cfg, state.update_step)

    def loss_fn(params, idx):
        o = obs[:, idx]
        d = traj.done[:, idx]
        carry0 = jax.tree.map(lambda c: c[idx], traj.init_carry)
        mean, log_std, value = _sequence_outputs(cfg, apply_fn, params, o, d, carry0)
        action = traj.action[:, idx]
        logp_old = traj.log_prob[:, idx]
        logp = DiagGauss.log_prob(mean, log_std, action)
        # log-ratio clamp — see ppo._loss_fn (prevents exp overflow NaN)
        ratio = jnp.exp(jnp.clip(logp - logp_old, -20.0, 20.0))
        a = adv[:, idx]
        kl = jnp.mean(DiagGauss.kl(traj.mean[:, idx], traj.log_std[:, idx], mean, log_std))
        if cfg.objective == "clip":
            surr = jnp.minimum(
                ratio * a, jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * a
            )
            policy_loss = -jnp.mean(surr)
        else:
            policy_loss = -jnp.mean(ratio * a) + state.kl_beta * kl
        v_old = traj.value[:, idx]
        vt = vtarg[:, idx]
        v_clipped = v_old + jnp.clip(value - v_old, -cfg.clip_eps, cfg.clip_eps)
        value_loss = 0.5 * jnp.mean(jnp.maximum((value - vt) ** 2, (v_clipped - vt) ** 2))
        entropy = jnp.mean(DiagGauss.entropy(mean, log_std))
        loss = policy_loss + cfg.value_coef * value_loss - ent_coef * entropy
        clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_eps).astype(jnp.float32))
        return loss, {
            "policy_loss": policy_loss, "value_loss": value_loss,
            "entropy": entropy, "kl": kl, "clip_frac": clip_frac,
        }

    def minibatch_step(carry, idx):
        params, opt_state = carry
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, idx)
        grads = pmean(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        lr = cfg.lr * state.lr_scale
        updates = jax.tree.map(lambda u: lr * u, updates)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (params, opt_state), metrics

    def epoch_step(carry, key_e):
        perm = jax.random.permutation(key_e, B)
        idxs = perm[: mb_envs * cfg.num_minibatches].reshape(cfg.num_minibatches, mb_envs)
        return jax.lax.scan(minibatch_step, carry, idxs)

    (params, opt_state), metrics = jax.lax.scan(
        epoch_step, (state.params, state.opt_state), jax.random.split(key, cfg.epochs)
    )
    metrics = jax.tree.map(lambda x: x[-1, -1], metrics)

    kl = pmean(metrics["kl"])
    kl_beta = state.kl_beta
    if cfg.objective == "adaptive_kl":
        kl_beta = jnp.where(
            kl > 2.0 * cfg.kl_target, kl_beta * cfg.lr_adapt_factor,
            jnp.where(kl < cfg.kl_target / 2.0, kl_beta / cfg.lr_adapt_factor, kl_beta),
        )
    lr_scale = state.lr_scale
    if cfg.adapt_lr:
        lr_scale = jnp.where(
            kl > 2.0 * cfg.kl_target, lr_scale / cfg.lr_adapt_factor,
            jnp.where(kl < cfg.kl_target / 2.0, lr_scale * cfg.lr_adapt_factor, lr_scale),
        )
        lr_scale = jnp.clip(lr_scale, cfg.lr_min_scale, cfg.lr_max_scale)

    zf = state.zfilter
    if cfg.use_zfilter:
        zf = zfilter_update(zf, traj.obs, axis_name=axis_name)

    psync = state.psync
    if cfg.publish_every > 1:  # publish-to-actors cadence (ref pub-sub lag)
        from surreal_tpu.parallel.param_sync import param_sync_refresh

        psync = param_sync_refresh(
            psync, params, state.update_step + 1, cfg.publish_every
        )

    new_state = PPOTrainState(
        params=params, opt_state=opt_state, zfilter=zf, kl_beta=kl_beta,
        lr_scale=lr_scale, update_step=state.update_step + 1, psync=psync,
    )
    metrics["lr_scale"] = lr_scale
    metrics["kl_beta"] = kl_beta
    return new_state, metrics


def train_step(cfg, apply_fn, env_step, flatten_obs, state, env_state, obs, carry,
               ep_ret, key, axis_name=None):
    k_roll, k_up = jax.random.split(key)
    traj, env_state, obs, carry, ep_ret, ep_stats = rollout(
        cfg, apply_fn, env_step, flatten_obs, state, env_state, obs, carry, ep_ret, k_roll
    )
    state, metrics = update(cfg, apply_fn, state, traj, k_up, axis_name=axis_name)
    metrics.update(ep_stats)
    metrics["reward_per_step"] = jnp.mean(traj.reward)
    return state, env_state, obs, carry, ep_ret, metrics
