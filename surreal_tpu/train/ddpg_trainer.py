"""Single-program DDPG trainer (BASELINE config 3: walker-walk, 1 host)."""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.algos import ddpg
from surreal_tpu.envs import base as env_base
from surreal_tpu.envs import make_env
from surreal_tpu.models.ddpg_nets import DDPGActor, DDPGCritic
from surreal_tpu.utils import get_logger


class DDPGTrainer:
    def __init__(
        self,
        env_name: str,
        cfg: ddpg.DDPGConfig | None = None,
        num_envs: int = 128,
        seed: int = 0,
        actor_hidden=(300, 200),
        critic_hidden=(400, 300),
        compute_dtype=jnp.float32,
        pixel_obs: bool = False,
        pixel_kwargs: dict | None = None,
        env_kwargs: dict | None = None,
        debug_checks: bool = False,
        mesh=None,  # jax.sharding.Mesh -> data-parallel sharded train step
    ):
        import dataclasses

        cfg = cfg or ddpg.DDPGConfig()
        if mesh is not None and cfg.zero_optimizer:
            from surreal_tpu.parallel.mesh import data_axis_size

            # ZeRO moment chunks must be allocated (K, chunk) up front
            cfg = dataclasses.replace(cfg, zero_shards=data_axis_size(mesh))
        self.env = make_env(env_name, **(env_kwargs or {}))
        self.num_envs = num_envs
        self.log = get_logger("ddpg")

        if pixel_obs:
            # CNN-stem DDPG (reference DDPG model's shared conv-stem option,
            # SURVEY.md §2 DDPG-model row): PixelWrapper frames stored RAW
            # uint8 in replay, scaled inside ConvStem; Z-filter is a low-dim
            # concept and stays off.
            from surreal_tpu.envs.wrappers import PixelWrapper, pixel_flatten_obs

            self.env = PixelWrapper(self.env, **(pixel_kwargs or {}))
            self._flatten = pixel_flatten_obs
            cfg = dataclasses.replace(cfg, use_zfilter=False)
            pix_spec = self.env.obs_spec()["pixel"]
            obs_zeros = jnp.zeros((1,) + tuple(pix_spec.shape), pix_spec.dtype)
            obs_dim = 1  # zfilter placeholder; unused for pixels
        else:
            self._flatten = env_base.flatten_obs
            obs_dim = env_base.obs_flat_dim(self.env)
            obs_zeros = jnp.zeros((1, obs_dim))
        if cfg.shared_encoder and not pixel_obs:
            raise ValueError("shared_encoder is a pixel-mode knob (conv stem)")
        if cfg.aug_shift > 0 and not pixel_obs:
            raise ValueError("aug_shift is a pixel-mode knob (image shift)")
        self.cfg = cfg
        act_dim = self.env.action_dim
        self.actor = DDPGActor(act_dim, tuple(actor_hidden),
                               pixel_obs=pixel_obs,
                               detach_stem=cfg.shared_encoder,
                               compute_dtype=compute_dtype)
        self.critic = DDPGCritic(tuple(critic_hidden),
                                 pixel_obs=pixel_obs, compute_dtype=compute_dtype)

        key = jax.random.PRNGKey(seed)
        self.key, k_a, k_c, k_reset = jax.random.split(key, 4)
        actor_params = self.actor.init(k_a, obs_zeros)
        critic_params = self.critic.init(k_c, obs_zeros, jnp.zeros((1, act_dim)))
        if cfg.shared_encoder:  # one stem from step 0 (targets match too)
            actor_params = ddpg.sync_encoder(actor_params, critic_params)
        self.state = ddpg.init_state(self.cfg, actor_params, critic_params, obs_dim)
        self.replay = ddpg.init_replay(
            self.cfg, num_envs, obs_dim, act_dim,
            obs_shape=obs_zeros.shape[1:] if pixel_obs else None,
            obs_dtype=obs_zeros.dtype if pixel_obs else jnp.float32,
        )
        self.sigma = jnp.asarray(ddpg.noise_ladder(self.cfg, num_envs))

        reset_fn, step_fn = env_base.vectorize(self.env)
        env_state, ts0 = jax.jit(reset_fn)(jax.random.split(k_reset, num_envs))
        self.env_state = env_state
        self.obs = self._flatten(ts0.obs)
        self.ou_state = jnp.zeros((num_envs, act_dim))
        self.ep_ret = jnp.zeros((num_envs,), jnp.float32)
        self.global_iter = 0  # lifetime iteration count (survives checkpoint)

        self.mesh = mesh
        if mesh is not None:
            # Data-parallel path: device-LOCAL replay shards + env batch on
            # the `data` axis, pmean'd gradients (SURVEY.md §2D replay
            # sharding — the reference's hash-routed replay servers).
            if debug_checks:
                raise ValueError("debug_checks is single-device only")
            from surreal_tpu.parallel.mesh import MODEL_AXIS, TIME_AXIS

            for ax in (MODEL_AXIS, TIME_AXIS):
                if mesh.shape.get(ax, 1) > 1:  # no silent no-op (r2 weak #5)
                    raise ValueError(
                        f"mesh.{ax} > 1 is a PPO-only feature; the DDPG "
                        "trainer supports the data axis only"
                    )
            from jax.sharding import NamedSharding, PartitionSpec as P

            from surreal_tpu.parallel.dp import (
                make_sharded_ddpg_step, place_by_spec, shard_env_batch,
                train_state_spec,
            )
            from surreal_tpu.parallel.mesh import DATA_AXIS, data_axis_size

            shards = data_axis_size(mesh)
            if num_envs % shards != 0:
                raise ValueError(f"num_envs={num_envs} not divisible by data axis {shards}")
            sspec = train_state_spec(self.state)  # P() everywhere unless ZeRO
            build = make_sharded_ddpg_step(
                self.cfg, self.actor.apply, self.critic.apply, step_fn,
                self._flatten, mesh, state_spec=sspec,
            )
            self._train_step = build(self.replay)
            # replay arrays are (T_cap, B, ...): shard on the env axis.
            rsharding = NamedSharding(mesh, P(None, DATA_AXIS))
            self.replay = type(self.replay)(
                data=jax.tree.map(lambda x: jax.device_put(x, rsharding), self.replay.data),
                total=jax.device_put(self.replay.total, NamedSharding(mesh, P())),
            )
            self.state = place_by_spec(mesh, self.state, sspec)
            self.sigma = shard_env_batch(mesh, self.sigma)
            self.env_state = shard_env_batch(mesh, self.env_state)
            self.obs = shard_env_batch(mesh, self.obs)
            self.ou_state = shard_env_batch(mesh, self.ou_state)
            self.ep_ret = shard_env_batch(mesh, self.ep_ret)
            return

        if debug_checks:  # sanitizer mode: checkify NaN/Inf + kernel hooks
            from surreal_tpu.utils import guards

            wrap = guards.jit_checked
        else:
            wrap = jax.jit
        self._train_step = wrap(
            partial(
                ddpg.train_step,
                self.cfg,
                self.actor.apply,
                self.critic.apply,
                step_fn,
                self._flatten,
            )
        )

    @property
    def steps_per_iteration(self) -> int:
        return self.cfg.rollout_steps * self.num_envs

    # ---- full-state checkpointing (SURVEY.md §5): replay buffer contents
    # and cursor, exploration state, env batch, RNG, counters ----
    @property
    def full_state(self) -> dict:
        fs = dict(
            state=self.state, replay=self.replay, env_state=self.env_state,
            obs=self.obs, ou_state=self.ou_state, ep_ret=self.ep_ret,
            key=self.key, global_iter=jnp.asarray(self.global_iter, jnp.int32),
        )
        if self.mesh is not None:  # see PPOTrainer.full_state
            from surreal_tpu.parallel.dp import replicate

            fs["key"] = replicate(self.mesh, fs["key"])
            fs["global_iter"] = replicate(self.mesh, fs["global_iter"])
        return fs

    def load_full_state(self, fs: dict) -> None:
        self.state = fs["state"]
        self.replay = fs["replay"]
        self.env_state = fs["env_state"]
        self.obs = fs["obs"]
        self.ou_state = fs["ou_state"]
        self.ep_ret = fs["ep_ret"]
        self.key = fs["key"]
        self.global_iter = int(fs["global_iter"])

    def run(self, iterations: int, log_every: int = 50, metric_sink: Callable | None = None):
        logs = []
        ep_ret_acc = jnp.zeros(())
        ep_cnt_acc = jnp.zeros(())
        t0 = time.perf_counter()
        for it in range(1, iterations + 1):
            self.key, sub = jax.random.split(self.key)
            (
                self.state, self.replay, self.env_state, self.obs,
                self.ou_state, self.ep_ret, metrics,
            ) = self._train_step(
                self.state, self.replay, self.env_state, self.obs,
                self.ou_state, self.sigma, self.ep_ret, sub,
            )
            ep_ret_acc = ep_ret_acc + metrics["episode_return_sum"]
            ep_cnt_acc = ep_cnt_acc + metrics["episodes_done"]
            self.global_iter += 1
            if it % log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                bad = [k for k, v in m.items() if not np.isfinite(v)]
                if bad:
                    raise FloatingPointError(
                        f"non-finite training metrics at iteration {it}: {bad} ({m})"
                    )
                m.pop("episode_return_sum")
                m.pop("episodes_done")
                cnt = float(ep_cnt_acc)
                dt = time.perf_counter() - t0
                m["iteration"] = self.global_iter
                m["env_steps"] = self.global_iter * self.steps_per_iteration
                m["updates"] = int(self.state.update_step)
                m["env_steps_per_s"] = log_every * self.steps_per_iteration / dt
                if cnt > 0:
                    m["episode_return"] = float(ep_ret_acc) / cnt
                    ep_ret_acc = jnp.zeros(())
                    ep_cnt_acc = jnp.zeros(())
                logs.append(m)
                if metric_sink:
                    metric_sink(m)
                self.log.info(
                    "it %d steps %.2e upd %d sps %.0f ret %s q %.2f",
                    it, m["env_steps"], m["updates"], m["env_steps_per_s"],
                    f"{m.get('episode_return', float('nan')):.1f}", m["q_mean"],
                )
                t0 = time.perf_counter()
        return logs

    def deterministic_policy(self):
        """(policy_fn, params, zfilter) for video recording."""
        zf = self.state.zfilter if self.cfg.use_zfilter else None
        return (lambda p, o: self.actor.apply(p, o)), self.state.actor_params, zf

    def evaluate(self, episodes: int = 16, seed: int = 0):
        from surreal_tpu.train.evaluator import evaluate_policy

        def policy(params, obs, key):
            return self.actor.apply(params, obs)

        zf = self.state.zfilter if self.cfg.use_zfilter else None
        return evaluate_policy(
            self.env, policy, self.state.actor_params, zf, episodes=episodes,
            seed=seed, flatten=self._flatten,
        )
