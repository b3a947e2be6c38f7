"""PPO: rollout + GAE + clipped-surrogate / adaptive-KL update, fused.

Role of the reference's `surreal/learner/ppo.py` + `surreal/agent/ppo_agent.py`
[SURVEY.md §2, §3.2, §3.4]: GAE(λ) advantages, clipped-surrogate AND
adaptive-KL-penalty objectives, value loss, entropy bonus, KL-triggered
learning-rate adaptation, Z-filter running-stats updates shipped to actors.

TPU-first redesign: actor and learner are the same program. The rollout is
a `lax.scan` over T lockstep env steps (policy forward fused with physics),
the update is K epochs of minibatched SGD over the fresh on-policy batch —
all inside ONE jitted function, gradient-`pmean`ed over the `data` mesh axis
when sharded (replacing the ZMQ parameter-server round trip).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from surreal_tpu.models.distributions import DiagGauss
from surreal_tpu.models.z_filter import (
    ZFilterState,
    zfilter_init,
    zfilter_normalize,
    zfilter_update,
)
from surreal_tpu.ops.returns import gae
from surreal_tpu.utils import guards


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    horizon: int = 128  # rollout chunk length T (sub-trajectory, ref's horizon-chunks)
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    epochs: int = 4
    num_minibatches: int = 4
    lr: float = 3e-4
    entropy_coef: float = 0.0
    # Linear entropy-coefficient anneal: coef moves entropy_coef →
    # entropy_final over the first entropy_anneal_iters UPDATE iterations
    # (None / 0 = constant coef). Basin-breaker knob: a high early coef
    # prevents premature collapse into a low-reward attractor (hopper-stand
    # seed lottery, finger-spin slow-spin basin), while the late anneal
    # recovers the exploitation ceiling that a constant-high coef costs.
    entropy_final: float | None = None
    entropy_anneal_iters: int = 0
    value_coef: float = 0.5
    max_grad_norm: float = 0.5
    normalize_adv: bool = True
    use_zfilter: bool = True
    # objective variant: 'clip' (clipped surrogate) or 'adaptive_kl'
    # (KL-penalty with adapted beta) — both exist in the reference learner.
    objective: str = "clip"
    kl_target: float = 0.01
    kl_beta_init: float = 1.0
    # KL-triggered LR adaptation (Surreal-PPO behavior): lr scaled down when
    # the realized KL overshoots kl_target, scaled up when it undershoots.
    adapt_lr: bool = True
    lr_adapt_factor: float = 1.5
    lr_min_scale: float = 0.01
    lr_max_scale: float = 10.0
    # Pallas fused loss kernel (ops/pallas_ppo_loss.py); 'clip' objective
    # with minibatch size % 256 == 0 only — falls back to the jnp path
    # otherwise. Numerically equivalent (tested).
    fused_loss: bool = False
    # Actor-side parameter staleness (the reference's ZMQ pub-sub lag,
    # surreal/distributed/ps: learner publishes every K updates; actors act
    # on the last published snapshot). 1 = fully fused zero-staleness.
    publish_every: int = 1
    # ZeRO-style sharded optimizer state (SURVEY.md §2D learner-DP):
    # Adam moments 1/K-sharded over the data mesh axis. Set zero_shards to
    # the data-axis size (PPOTrainer(mesh=...) does this automatically when
    # zero_optimizer=True); the unsharded trainer ignores it.
    zero_optimizer: bool = False
    zero_shards: int = 1
    # Time-axis sharding of the GAE scan (SURVEY.md §2D TimeShardedScan):
    # when > 1, `update` computes advantages with each `time` mesh shard
    # scanning horizon/K steps and exchanging block-summary carries
    # (parallel/tshard.py). PPOTrainer(mesh=...) sets this from the mesh's
    # time axis; requires running inside a shard_map over that mesh.
    time_shards: int = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PPOTrainState:
    params: Any
    opt_state: Any
    zfilter: ZFilterState
    kl_beta: jax.Array  # adaptive-KL penalty coefficient
    lr_scale: jax.Array  # KL-adaptive LR multiplier
    update_step: jax.Array
    # ParamSyncState actor-param snapshot when cfg.publish_every > 1, else
    # None (actors ARE the learner's params — zero staleness).
    psync: Any = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Trajectory:
    """One rollout chunk, time-major (T, B, ...). Obs stored RAW; they are
    re-normalized with the SAME Z-filter snapshot used at rollout time so
    importance ratios are exact."""

    obs: jax.Array
    action: jax.Array
    log_prob: jax.Array
    mean: jax.Array
    log_std: jax.Array
    value: jax.Array
    next_value: jax.Array
    reward: jax.Array
    discount: jax.Array
    done: jax.Array


def make_optimizer(
    cfg: PPOConfig, axis_name: str | None = None
) -> optax.GradientTransformation:
    if cfg.zero_optimizer and cfg.zero_shards > 1:
        # lazy import: surreal_tpu.parallel.__init__ imports this module
        from surreal_tpu.parallel.zero import scale_by_zero_adam

        adam = scale_by_zero_adam(
            cfg.zero_shards, axis_name or "data", eps=1e-5
        )  # init() never touches the axis; update() runs inside shard_map
    else:
        adam = optax.scale_by_adam(eps=1e-5)
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        adam,
        optax.scale(-1.0),  # lr applied manually (lr_scale is dynamic state)
    )


def init_state(cfg: PPOConfig, params, obs_dim: int) -> PPOTrainState:
    if cfg.publish_every > 1:
        from surreal_tpu.parallel.param_sync import param_sync_init

        psync = param_sync_init(params)
    else:
        psync = None
    return PPOTrainState(
        params=params,
        opt_state=make_optimizer(cfg).init(params),
        zfilter=zfilter_init(obs_dim),
        kl_beta=jnp.asarray(cfg.kl_beta_init, jnp.float32),
        lr_scale=jnp.asarray(1.0, jnp.float32),
        update_step=jnp.asarray(0, jnp.int32),
        psync=psync,
    )


def acting_params(cfg: PPOConfig, state: PPOTrainState):
    """Params the ACTOR side uses: the published snapshot under staleness
    (cfg.publish_every > 1), the live learner params otherwise."""
    return state.psync.actor_params if cfg.publish_every > 1 else state.params


# ---------------------------------------------------------------------------
# Rollout
# ---------------------------------------------------------------------------


def rollout(
    cfg: PPOConfig,
    apply_fn: Callable,  # (params, obs) -> (mean, log_std, value)
    env_step: Callable,  # vmapped env step: (state, action) -> (state, ts)
    flatten_obs: Callable,  # obs dict -> (B, D)
    state: PPOTrainState,
    env_state,
    obs,  # (B, D) raw flat obs at rollout start
    ep_ret,  # (B,) running per-env episode-return accumulator
    key,
):
    """Collect T steps from B lockstep envs. Returns (traj, env_state, obs,
    ep_ret, episode-stats). This is the fused replacement for the reference's
    actor processes + experience senders + FIFO replay ingest (§3.2/3.3)."""

    def norm(o):
        return zfilter_normalize(state.zfilter, o) if cfg.use_zfilter else o

    pi = acting_params(cfg, state)

    def values_of(flat_obs):
        return apply_fn(pi, norm(flat_obs))[2]

    def step(carry, key_t):
        env_state, obs, ep_ret, done_sum, done_ret = carry
        mean, log_std, value = apply_fn(pi, norm(obs))
        action = DiagGauss.sample(key_t, mean, log_std)
        log_prob = DiagGauss.log_prob(mean, log_std, action)
        env_state, ts = env_step(env_state, action)
        # Bootstrap target at `done` is V(terminal obs), which differs from
        # the post-reset carry_obs the policy sees next. Time-limit dones are
        # rare (1/episode_steps) and lockstep-synchronized, so pay the extra
        # terminal-value forward ONLY on steps where some env finished
        # (lax.cond executes one branch); everywhere else next_value(t) is
        # recovered as value(t+1) after the scan — bit-identical to a
        # per-step double forward (tests/test_ppo.py golden test).
        term_value = jax.lax.cond(
            jnp.any(ts.done),
            values_of,
            lambda o: jnp.zeros_like(value),
            flatten_obs(ts.obs),
        )
        next_obs = flatten_obs(ts.carry_obs)
        tr = dict(
            obs=obs,
            action=action,
            log_prob=log_prob,
            mean=mean,
            log_std=jnp.broadcast_to(log_std, mean.shape),
            value=value,
            term_value=term_value,
            reward=ts.reward,
            discount=ts.discount,
            done=ts.done,
        )
        # episode-return bookkeeping (reference: tensorplex per-agent returns)
        ep_ret = ep_ret + ts.reward
        done_f = ts.done.astype(ep_ret.dtype)
        done_sum = done_sum + done_f
        done_ret = done_ret + done_f * ep_ret
        ep_ret = ep_ret * (1.0 - done_f)
        return (env_state, next_obs, ep_ret, done_sum, done_ret), tr

    B = obs.shape[0]
    zeros = jnp.zeros((B,), jnp.float32)
    keys = jax.random.split(key, cfg.horizon)
    (env_state, obs, ep_ret, done_sum, done_ret), tr = jax.lax.scan(
        step, (env_state, obs, ep_ret, zeros, zeros), keys
    )
    # next_value(t) = V(obs_{t+1}) except at done, where it is the terminal
    # value probed inside the scan. One chunk-end bootstrap forward on the
    # final carry obs closes the sequence.
    v_last = values_of(obs)
    value_next = jnp.concatenate([tr["value"][1:], v_last[None]], axis=0)
    term_value = tr.pop("term_value")
    next_value = jnp.where(tr["done"], term_value, value_next)
    traj = Trajectory(next_value=next_value, **tr)
    stats = {
        "episodes_done": jnp.sum(done_sum),
        "episode_return_sum": jnp.sum(done_ret),
    }
    return traj, env_state, obs, ep_ret, stats


# ---------------------------------------------------------------------------
# Update
# ---------------------------------------------------------------------------


def entropy_coef_at(cfg: PPOConfig, update_step) -> jax.Array:
    """Traced entropy coefficient at `update_step` (linear anneal, or the
    constant cfg.entropy_coef when annealing is off)."""
    base = jnp.asarray(cfg.entropy_coef, jnp.float32)
    if cfg.entropy_final is None or cfg.entropy_anneal_iters <= 0:
        return base
    frac = jnp.clip(
        update_step.astype(jnp.float32) / cfg.entropy_anneal_iters, 0.0, 1.0
    )
    return base + (jnp.float32(cfg.entropy_final) - base) * frac


def _loss_fn(cfg: PPOConfig, apply_fn, params, batch, kl_beta, ent_coef):
    obs, action, logp_old, mean_old, log_std_old, adv, vtarg, v_old = batch
    mean, log_std, value = apply_fn(params, obs)
    if (
        cfg.fused_loss
        and cfg.objective == "clip"
        and cfg.entropy_final is None  # fused kernel takes a static coef
        and mean.shape[0] % 256 == 0
    ):
        from surreal_tpu.ops.pallas_ppo_loss import fused_clip_loss

        return fused_clip_loss(
            mean, log_std, value, action, logp_old, mean_old, log_std_old,
            adv, vtarg, v_old, clip_eps=cfg.clip_eps,
            value_coef=cfg.value_coef, entropy_coef=cfg.entropy_coef,
        )
    logp = DiagGauss.log_prob(mean, log_std, action)
    # log-ratio clamp: a diverging policy can push |logp − logp_old| past
    # exp's float32 range (inf·0 → NaN in the surrogate); ±20 ≈ ratio 5e8,
    # far outside the clip band, so the clamp never binds in healthy runs.
    ratio = jnp.exp(jnp.clip(logp - logp_old, -20.0, 20.0))
    kl = jnp.mean(DiagGauss.kl(mean_old, log_std_old, mean, log_std))
    if cfg.objective == "clip":
        surr = jnp.minimum(
            ratio * adv, jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        )
        policy_loss = -jnp.mean(surr)
    elif cfg.objective == "adaptive_kl":
        policy_loss = -jnp.mean(ratio * adv) + kl_beta * kl
    else:
        raise ValueError(f"unknown objective {cfg.objective!r}")
    # clipped value loss (PPO2-style, the stabilized variant)
    v_clipped = v_old + jnp.clip(value - v_old, -cfg.clip_eps, cfg.clip_eps)
    value_loss = 0.5 * jnp.mean(
        jnp.maximum((value - vtarg) ** 2, (v_clipped - vtarg) ** 2)
    )
    entropy = jnp.mean(DiagGauss.entropy(mean, log_std))
    loss = policy_loss + cfg.value_coef * value_loss - ent_coef * entropy
    clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_eps).astype(jnp.float32))
    return loss, {
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "kl": kl,
        "clip_frac": clip_frac,
    }


def update(
    cfg: PPOConfig,
    apply_fn: Callable,
    state: PPOTrainState,
    traj: Trajectory,
    key,
    axis_name: str | None = None,
):
    """K epochs of minibatched SGD on the rollout chunk. When `axis_name`
    is set (data-parallel `shard_map`), gradients and batch statistics are
    `pmean`ed across shards — the ICI replacement for the reference's
    parameter-server broadcast."""
    T, B = traj.reward.shape
    opt = make_optimizer(cfg, axis_name)

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    def norm(o):
        return zfilter_normalize(state.zfilter, o) if cfg.use_zfilter else o

    obs = norm(traj.obs)
    if cfg.time_shards > 1:
        # GAE delta/coef (same recurrence as ops.returns.gae) with the
        # reverse scan split over the `time` mesh axis.
        from surreal_tpu.parallel.mesh import TIME_AXIS
        from surreal_tpu.parallel.tshard import replicated_reverse_scan

        dones_f = traj.done.astype(traj.value.dtype)
        delta = traj.reward + cfg.gamma * traj.discount * traj.next_value - traj.value
        coef = cfg.gamma * cfg.lam * traj.discount * (1.0 - dones_f)
        adv = replicated_reverse_scan(delta, coef, TIME_AXIS)
        vtarg = adv + traj.value
    else:
        adv, vtarg = gae(
            traj.reward, traj.value, traj.next_value, traj.discount, traj.done,
            cfg.gamma, cfg.lam,
        )
    if cfg.normalize_adv:
        a_mean = pmean(jnp.mean(adv))
        a_var = pmean(jnp.mean((adv - a_mean) ** 2))
        adv = (adv - a_mean) * jax.lax.rsqrt(a_var + 1e-8)

    N = T * B
    flat = (
        obs.reshape((N,) + obs.shape[2:]),  # works for flat AND pixel obs
        traj.action.reshape(N, -1),
        traj.log_prob.reshape(N),
        traj.mean.reshape(N, -1),
        traj.log_std.reshape(N, -1),
        adv.reshape(N),
        vtarg.reshape(N),
        traj.value.reshape(N),
    )
    mb_size = N // cfg.num_minibatches
    ent_coef = entropy_coef_at(cfg, state.update_step)

    def minibatch_step(carry, idx):
        params, opt_state = carry
        mb = tuple(jnp.take(x, idx, axis=0) for x in flat)
        (_, metrics), grads = jax.value_and_grad(
            lambda p: _loss_fn(cfg, apply_fn, p, mb, state.kl_beta, ent_coef),
            has_aux=True,
        )(params)
        grads = pmean(grads)
        guards.assert_finite(optax.global_norm(grads), "ppo.update.grad_norm")
        updates, opt_state = opt.update(grads, opt_state, params)
        lr = cfg.lr * state.lr_scale
        updates = jax.tree.map(lambda u: lr * u, updates)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (params, opt_state), metrics

    def epoch_step(carry, key_e):
        perm = jax.random.permutation(key_e, N)
        idxs = perm[: mb_size * cfg.num_minibatches].reshape(
            cfg.num_minibatches, mb_size
        )
        return jax.lax.scan(minibatch_step, carry, idxs)

    (params, opt_state), metrics = jax.lax.scan(
        epoch_step, (state.params, state.opt_state), jax.random.split(key, cfg.epochs)
    )
    metrics = jax.tree.map(lambda x: x[-1, -1], metrics)  # last minibatch's stats

    # --- KL-triggered adaptation (Surreal-PPO semantics) ---
    kl = pmean(metrics["kl"])
    kl_beta = state.kl_beta
    if cfg.objective == "adaptive_kl":
        kl_beta = jnp.where(
            kl > 2.0 * cfg.kl_target,
            kl_beta * cfg.lr_adapt_factor,
            jnp.where(kl < cfg.kl_target / 2.0, kl_beta / cfg.lr_adapt_factor, kl_beta),
        )
    lr_scale = state.lr_scale
    if cfg.adapt_lr:
        lr_scale = jnp.where(
            kl > 2.0 * cfg.kl_target,
            lr_scale / cfg.lr_adapt_factor,
            jnp.where(kl < cfg.kl_target / 2.0, lr_scale * cfg.lr_adapt_factor, lr_scale),
        )
        lr_scale = jnp.clip(lr_scale, cfg.lr_min_scale, cfg.lr_max_scale)

    # --- Z-filter update from this rollout's raw observations (the
    # reference broadcasts these stats to actors; here they're just state) ---
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
        params=params,
        opt_state=opt_state,
        zfilter=zf,
        kl_beta=kl_beta,
        lr_scale=lr_scale,
        update_step=state.update_step + 1,
        psync=psync,
    )
    metrics["lr_scale"] = lr_scale
    metrics["kl_beta"] = kl_beta
    return new_state, metrics


def train_step(
    cfg: PPOConfig,
    apply_fn,
    env_step,
    flatten_obs,
    state: PPOTrainState,
    env_state,
    obs,
    ep_ret,
    key,
    axis_name: str | None = None,
):
    """rollout + update: ONE fused jitted iteration (SURVEY.md §3.4 hot
    loop). Returns (state, env_state, obs, ep_ret, metrics)."""
    k_roll, k_up = jax.random.split(key)
    traj, env_state, obs, ep_ret, ep_stats = rollout(
        cfg, apply_fn, env_step, flatten_obs, state, env_state, obs, ep_ret, k_roll
    )
    state, metrics = update(cfg, apply_fn, state, traj, k_up, axis_name=axis_name)
    metrics.update(ep_stats)
    metrics["reward_per_step"] = jnp.mean(traj.reward)
    return state, env_state, obs, ep_ret, metrics


def train_step_overlapped(
    cfg: PPOConfig,
    apply_fn,
    env_step,
    flatten_obs,
    state: PPOTrainState,
    env_state,
    obs,
    ep_ret,
    pending: Trajectory,  # trajectory collected by the PREVIOUS iteration
    key,
    axis_name: str | None = None,
):
    """Double-buffered actor/learner overlap (SURVEY.md §2D async row,
    caraml DataFetcher's role): iteration k trains on trajectory k-1 while
    collecting trajectory k with the PRE-update params. Inside one jit the
    two halves share no data dependencies, so XLA is free to interleave the
    rollout's VPU-bound physics with the update's MXU-bound minibatch SGD.
    Semantically this is exactly publish_every staleness of one update
    (the reference's actors always ran >= 1 publish behind); measured
    verdict vs the fused step in results/overlap_r3.txt."""
    k_roll, k_up = jax.random.split(key)
    traj, env_state, obs, ep_ret, ep_stats = rollout(
        cfg, apply_fn, env_step, flatten_obs, state, env_state, obs, ep_ret, k_roll
    )
    state, metrics = update(cfg, apply_fn, state, pending, k_up, axis_name=axis_name)
    metrics.update(ep_stats)
    metrics["reward_per_step"] = jnp.mean(pending.reward)
    return state, env_state, obs, ep_ret, traj, metrics
