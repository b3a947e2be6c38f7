"""DDPG: off-policy TD learning with uniform HBM replay + target networks.

Role of the reference's `surreal/learner/ddpg.py` + `surreal/agent/ddpg_agent.py`
[SURVEY.md §2]: deterministic tanh actor with exploration noise
(Ornstein-Uhlenbeck or Gaussian, with a PER-ACTOR noise-scale ladder so
different actors explore at different intensities), critic TD loss with
target actor+critic, n-step returns, soft (τ) and/or hard periodic target
sync, uniform ring replay.

TPU-first redesign: the "actor fleet" is the lockstep env batch (the noise
ladder becomes a per-env σ vector), replay is the HBM ring buffer
(surreal_tpu.data.replay), and rollout + U update steps fuse into one
jitted train iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from surreal_tpu.data.replay import (
    ReplayState,
    replay_init,
    replay_insert,
    replay_sample_nstep,
    replay_sampleable,
)
from surreal_tpu.models.z_filter import ZFilterState, zfilter_init, zfilter_normalize, zfilter_update
from surreal_tpu.ops.returns import nstep_returns


@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    rollout_steps: int = 16  # env steps per train iteration
    updates_per_iteration: int = 16
    batch_size: int = 256
    replay_capacity: int = 1_000_000  # total transitions (across envs)
    min_replay: int = 10_000  # warmup transitions before updates
    gamma: float = 0.99
    n_step: int = 3
    actor_lr: float = 1e-4
    critic_lr: float = 1e-3
    tau: float = 5e-3  # soft target update rate
    hard_sync_every: int = 0  # if > 0, hard-copy targets every N updates instead
    max_grad_norm: float = 10.0
    use_zfilter: bool = False
    # exploration: OU noise with per-env scale ladder (reference: per-agent
    # noise scale ladder, SURVEY.md §2 DDPG agent row)
    noise_type: str = "ou"  # 'ou' | 'gaussian'
    ou_theta: float = 0.15
    ou_dt: float = 1.0  # noise step in units of control steps
    sigma_min: float = 0.05
    sigma_max: float = 0.4
    # TD3-style stabilizers (Fujimoto et al. 2018), default OFF so plain
    # DDPG semantics (and all recorded curves) stand. target_noise > 0
    # smooths the bootstrap target action with clipped Gaussian noise;
    # actor_delay > 1 updates the actor (and targets) every N critic steps.
    target_noise: float = 0.0
    target_noise_clip: float = 0.5
    actor_delay: int = 1
    # Pixel-mode shared conv stem (SAC-AE/DrQ recipe; reference DDPG model's
    # shared-stem option, SURVEY.md §2 DDPG-model row): the encoder is
    # trained ONLY by the critic TD loss; the actor holds a stop-gradient
    # copy refreshed after every update (_sync_encoder). Rationale: the
    # r4 pixel gap (PPO 911 vs DDPG 31 on ball_in_cup with the same
    # rasterizer) isolated the failure to critic-driven encoder learning.
    shared_encoder: bool = False
    # DrQ-style random-shift image augmentation (Kostrikov et al. 2020) on
    # the UPDATE path only (rollout/eval see clean frames): each sampled
    # obs/next_obs is padded by `aug_shift` edge-replicated pixels and
    # re-cropped at a per-sample uniform offset. The single known-decisive
    # regularizer for pixel TD learning. 0 = off.
    aug_shift: int = 0
    # Actor-side parameter staleness (the reference's pub-sub lag for DDPG
    # actors — same semantics as PPOConfig.publish_every): rollouts act on a
    # snapshot refreshed every K learner updates. 1 = zero staleness.
    publish_every: int = 1
    # ZeRO-1 sharded Adam moments over the data mesh axis (both optimizers);
    # DDPGTrainer(mesh=...) sets zero_shards automatically.
    zero_optimizer: bool = False
    zero_shards: int = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDPGTrainState:
    actor_params: Any
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    zfilter: ZFilterState
    update_step: jax.Array
    # ParamSyncState actor snapshot when cfg.publish_every > 1, else None.
    psync: Any = None


def make_optimizers(cfg: DDPGConfig, axis_name: str | None = None):
    def make(lr):
        if cfg.zero_optimizer and cfg.zero_shards > 1:
            from surreal_tpu.parallel.zero import scale_by_zero_adam

            adam = scale_by_zero_adam(
                cfg.zero_shards, axis_name or "data", eps=1e-8
            )  # eps matches optax.adam's default (exact-parity tested)
        else:
            adam = optax.scale_by_adam()
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), adam, optax.scale(-lr)
        )

    return make(cfg.actor_lr), make(cfg.critic_lr)


def init_state(cfg: DDPGConfig, actor_params, critic_params, obs_dim: int) -> DDPGTrainState:
    a_opt, c_opt = make_optimizers(cfg)
    if cfg.publish_every > 1:
        from surreal_tpu.parallel.param_sync import param_sync_init

        psync = param_sync_init(actor_params)
    else:
        psync = None
    return DDPGTrainState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_actor_params=jax.tree.map(jnp.copy, actor_params),
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        actor_opt=a_opt.init(actor_params),
        critic_opt=c_opt.init(critic_params),
        zfilter=zfilter_init(obs_dim),
        update_step=jnp.asarray(0, jnp.int32),
        psync=psync,
    )


_ENCODER_KEY = "ConvStem_0"  # flax auto-name of the stem in both modules


def sync_encoder(actor_params, critic_params):
    """Overwrite the actor's conv-stem subtree with the critic's (the single
    source of truth in shared_encoder mode). Pure-dict flax param trees."""
    ap = dict(actor_params)
    inner = dict(ap["params"])
    inner[_ENCODER_KEY] = critic_params["params"][_ENCODER_KEY]
    ap["params"] = inner
    return ap


def random_shift(key, obs, pad: int):
    """DrQ aug: (B, H, W, C) images, edge-pad by `pad`, crop at a random
    per-sample offset in [0, 2*pad]. uint8-safe (pad/gather only).

    Implemented as two single-axis take_along_axis gathers (rows then
    cols) rather than a vmapped dynamic_slice: on TPU the per-sample
    dynamic_slice lowers to a serialized slice per batch element —
    measured 38.8 ms vs 3.0 ms for the gather form at (512, 84, 84, 3),
    bitwise identical output."""
    B, H, W, C = obs.shape
    padded = jnp.pad(obs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    off = jax.random.randint(key, (B, 2), 0, 2 * pad + 1)
    rows = off[:, 0:1] + jnp.arange(H)[None, :]  # (B, H)
    cols = off[:, 1:2] + jnp.arange(W)[None, :]  # (B, W)
    x = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)
    return jnp.take_along_axis(x, cols[:, None, :, None], axis=2)


def acting_params(cfg: DDPGConfig, state: DDPGTrainState):
    """Params the rollout side uses (published snapshot under staleness)."""
    return state.psync.actor_params if cfg.publish_every > 1 else state.actor_params


def noise_ladder(cfg: DDPGConfig, num_envs: int) -> np.ndarray:
    """Per-env exploration scale, geometric ladder from sigma_min..sigma_max."""
    return np.geomspace(cfg.sigma_min, cfg.sigma_max, num_envs).astype(np.float32)


def init_replay(
    cfg: DDPGConfig, num_envs: int, obs_dim: int, action_dim: int,
    obs_shape: tuple | None = None, obs_dtype=jnp.float32,
) -> ReplayState:
    """HBM ring replay. `obs_shape`/`obs_dtype` override the flat (obs_dim,)
    layout for pixel observations — stored RAW uint8 (21 KB/frame at 84×84
    stack-3 grayscale vs 85 KB as f32), normalized only inside the conv stem.
    Pixel runs need cfg.replay_capacity sized to HBM (~100k transitions)."""
    capacity_t = max(cfg.replay_capacity // num_envs, cfg.rollout_steps)
    shape = (num_envs,) + (obs_shape if obs_shape is not None else (obs_dim,))
    example = {
        "obs": jnp.zeros(shape, obs_dtype),
        "action": jnp.zeros((num_envs, action_dim)),
        "reward": jnp.zeros((num_envs,)),
        "done": jnp.zeros((num_envs,), jnp.bool_),
    }
    return replay_init(example, capacity_t)


# ---------------------------------------------------------------------------
# Rollout (exploration actors)
# ---------------------------------------------------------------------------


def rollout(
    cfg: DDPGConfig,
    actor_apply: Callable,
    env_step: Callable,
    flatten_obs: Callable,
    state: DDPGTrainState,
    env_state,
    obs,
    ou_state,  # (B, A) persistent OU noise state
    sigma,  # (B,) per-env noise scale ladder
    ep_ret,  # (B,)
    key,
    replay: ReplayState,
):
    def norm(o):
        return zfilter_normalize(state.zfilter, o) if cfg.use_zfilter else o

    pi = acting_params(cfg, state)

    def step(carry, key_t):
        env_state, obs, ou, ep_ret, done_sum = carry
        a_det = actor_apply(pi, norm(obs))
        eps = jax.random.normal(key_t, a_det.shape, a_det.dtype)
        if cfg.noise_type == "ou":
            ou = ou + cfg.ou_theta * (0.0 - ou) * cfg.ou_dt + sigma[:, None] * np.sqrt(
                cfg.ou_dt
            ) * eps
            noise = ou
        else:
            noise = sigma[:, None] * eps
        action = jnp.clip(a_det + noise, -1.0, 1.0)
        env_state, ts = env_step(env_state, action)
        record = {
            "obs": obs,
            "action": action,
            "reward": ts.reward,
            "done": ts.done,
        }
        done_f = ts.done.astype(ep_ret.dtype)
        # OU state resets at episode boundaries (fresh exploration process)
        ou = ou * (1.0 - done_f)[:, None]
        new_ep = ep_ret + ts.reward
        carry = (
            env_state,
            flatten_obs(ts.carry_obs),
            ou,
            new_ep * (1.0 - done_f),
            done_sum + done_f,
        )
        return carry, (record, done_f * new_ep)

    B = obs.shape[0]
    zeros = jnp.zeros((B,), jnp.float32)
    keys = jax.random.split(key, cfg.rollout_steps)
    (env_state, obs, ou_state, ep_ret, done_sum), (chunk, done_rets) = jax.lax.scan(
        step, (env_state, obs, ou_state, ep_ret, zeros), keys
    )
    replay = replay_insert(replay, chunk)
    stats = {
        "episodes_done": jnp.sum(done_sum),
        "episode_return_sum": jnp.sum(done_rets),
    }
    return replay, env_state, obs, ou_state, ep_ret, chunk, stats


# ---------------------------------------------------------------------------
# Update (learner)
# ---------------------------------------------------------------------------


def update(
    cfg: DDPGConfig,
    actor_apply: Callable,
    critic_apply: Callable,
    state: DDPGTrainState,
    replay: ReplayState,
    key,
    axis_name: str | None = None,
):
    a_opt, c_opt = make_optimizers(cfg, axis_name)

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    def norm(o):
        return zfilter_normalize(state.zfilter, o) if cfg.use_zfilter else o

    def one_update(carry, key_u):
        state = carry
        k_sample, k_tnoise, k_aug, k_aug2 = jax.random.split(key_u, 4)
        w = replay_sample_nstep(replay, k_sample, cfg.batch_size, cfg.n_step)
        obs = norm(w["obs"][0])
        action = w["action"][0]
        next_obs = norm(w["obs"][-1])
        if cfg.aug_shift > 0:  # DrQ random shift (update path only)
            obs = random_shift(k_aug, obs, cfg.aug_shift)
            next_obs = random_shift(k_aug2, next_obs, cfg.aug_shift)
        G, cont = nstep_returns(w["reward"][:-1], w["done"][:-1], cfg.gamma)

        next_a = actor_apply(state.target_actor_params, next_obs)
        if cfg.target_noise > 0:  # TD3 target-policy smoothing
            eps = jnp.clip(
                cfg.target_noise * jax.random.normal(k_tnoise, next_a.shape),
                -cfg.target_noise_clip, cfg.target_noise_clip,
            )
            next_a = jnp.clip(next_a + eps, -1.0, 1.0)
        q_next = critic_apply(state.target_critic_params, next_obs, next_a)
        y = jax.lax.stop_gradient(G + cont * q_next)

        def critic_loss(cp):
            q = critic_apply(cp, obs, action)
            return jnp.mean((q - y) ** 2), q

        (c_loss, q), c_grads = jax.value_and_grad(critic_loss, has_aux=True)(
            state.critic_params
        )
        c_grads = pmean(c_grads)
        c_updates, c_opt_state = c_opt.update(c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        def actor_loss(ap):
            return -jnp.mean(critic_apply(critic_params, obs, actor_apply(ap, obs)))

        a_loss, a_grads = jax.value_and_grad(actor_loss)(state.actor_params)
        a_grads = pmean(a_grads)
        a_updates, a_opt_state = a_opt.update(a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        step_no = state.update_step + 1
        if cfg.actor_delay > 1:  # TD3 delayed actor + target updates
            do_actor = (step_no % cfg.actor_delay) == 0
            gate = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(do_actor, n, o), new, old)
            actor_params = gate(actor_params, state.actor_params)
            a_opt_state = gate(a_opt_state, state.actor_opt)
        else:
            do_actor = jnp.asarray(True)
        if cfg.shared_encoder:
            # actor stem := critic stem — after the actor_delay gate so the
            # encoder copy is fresh even on gated (critic-only) steps; grads
            # to the actor's copy are zero by stop_gradient, so this copy is
            # the only way it moves.
            actor_params = sync_encoder(actor_params, critic_params)
        if cfg.hard_sync_every > 0:
            do_sync = do_actor & ((step_no % cfg.hard_sync_every) == 0)
            sync = lambda t, s: jnp.where(do_sync, s, t)
        else:
            sync = lambda t, s: jnp.where(do_actor, t + cfg.tau * (s - t), t)
        target_actor = jax.tree.map(sync, state.target_actor_params, actor_params)
        target_critic = jax.tree.map(sync, state.target_critic_params, critic_params)

        new_state = DDPGTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=target_actor,
            target_critic_params=target_critic,
            actor_opt=a_opt_state,
            critic_opt=c_opt_state,
            zfilter=state.zfilter,
            update_step=step_no,
            psync=state.psync,
        )
        metrics = {
            "critic_loss": c_loss,
            "actor_loss": a_loss,
            "q_mean": jnp.mean(q),
        }
        return new_state, metrics

    keys = jax.random.split(key, cfg.updates_per_iteration)
    state, metrics = jax.lax.scan(one_update, state, keys)
    return state, jax.tree.map(lambda x: x[-1], metrics)


def train_step(
    cfg: DDPGConfig,
    actor_apply,
    critic_apply,
    env_step,
    flatten_obs,
    state: DDPGTrainState,
    replay: ReplayState,
    env_state,
    obs,
    ou_state,
    sigma,
    ep_ret,
    key,
    axis_name: str | None = None,
):
    """One fused iteration: rollout_steps env steps + updates (gated until
    the replay warmup is reached). Returns all carried state + metrics."""
    k_roll, k_up = jax.random.split(key)
    replay, env_state, obs, ou_state, ep_ret, chunk, ep_stats = rollout(
        cfg, actor_apply, env_step, flatten_obs, state, env_state, obs,
        ou_state, sigma, ep_ret, k_roll, replay,
    )
    if cfg.use_zfilter:
        zf = zfilter_update(state.zfilter, chunk["obs"], axis_name=axis_name)
        state = dataclasses.replace(state, zfilter=zf)

    ready = replay.total * replay.num_envs >= cfg.min_replay

    def do_update(args):
        state, key = args
        return update(cfg, actor_apply, critic_apply, state, replay, key, axis_name)

    def no_update(args):
        state, _ = args
        metrics = {
            "critic_loss": jnp.zeros(()),
            "actor_loss": jnp.zeros(()),
            "q_mean": jnp.zeros(()),
        }
        return state, metrics

    state, metrics = jax.lax.cond(ready, do_update, no_update, (state, k_up))
    if cfg.publish_every > 1:  # publish-to-actors cadence (ref pub-sub lag)
        from surreal_tpu.parallel.param_sync import param_sync_refresh

        psync = param_sync_refresh(
            state.psync, state.actor_params, state.update_step, cfg.publish_every
        )
        state = dataclasses.replace(state, psync=psync)
    metrics.update(ep_stats)
    return state, replay, env_state, obs, ou_state, ep_ret, metrics
