"""Single-program PPO trainer: lockstep envs + fused train step.

Role of the reference's learner main loop + launcher-wired actor fleet
(`surreal/learner/base.py`, `surreal/launch/`, SURVEY.md §3.1-3.4) in one
object: build env batch + network, then iterate jitted train steps. The
multi-host / sharded variant lives in surreal_tpu/parallel.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.algos import ppo
from surreal_tpu.envs import base as env_base
from surreal_tpu.envs import make_env
from surreal_tpu.models.actor_critic import PPOActorCritic
from surreal_tpu.utils import get_logger


class PPOTrainer:
    def __init__(
        self,
        env_name: str,
        cfg: ppo.PPOConfig | None = None,
        num_envs: int = 256,
        seed: int = 0,
        hidden=(64, 64),
        compute_dtype=jnp.float32,
        pixel_obs: bool = False,
        pixel_kwargs: dict | None = None,
        use_lstm: bool = False,
        lstm_size: int = 128,
        env_kwargs: dict | None = None,
        debug_checks: bool = False,
        mesh=None,  # jax.sharding.Mesh -> data-parallel sharded train step
        overlap: bool = False,  # double-buffered rollout(k)/train(k-1) step
    ):
        cfg = cfg or ppo.PPOConfig()
        if overlap and use_lstm:
            raise ValueError("overlap does not compose with use_lstm")
        self.overlap = overlap
        self._pending = None  # overlap: trajectory awaiting its update
        if mesh is not None and cfg.zero_optimizer:
            from surreal_tpu.parallel.mesh import data_axis_size

            # ZeRO moment chunks must be allocated (K, chunk) up front
            cfg = dataclasses.replace(cfg, zero_shards=data_axis_size(mesh))
        if isinstance(env_name, str):
            env_kwargs = dict(env_kwargs or {})
            if env_name.startswith("gym:"):
                env_kwargs.setdefault("num_envs", num_envs)
            self.env = make_env(env_name, **env_kwargs)
        else:  # pre-built Environment instance (physics-variant probes)
            self.env = env_name
        if pixel_obs:
            from surreal_tpu.envs.wrappers import PixelWrapper, pixel_flatten_obs

            self.env = PixelWrapper(self.env, **(pixel_kwargs or {}))
            self._flatten = pixel_flatten_obs
            cfg = dataclasses.replace(cfg, use_zfilter=False)  # net scales uint8
        else:
            self._flatten = env_base.flatten_obs
        self.cfg = cfg
        self.num_envs = num_envs
        self.log = get_logger("ppo")

        self.use_lstm = use_lstm
        self.net = PPOActorCritic(
            action_dim=self.env.action_dim, hidden=tuple(hidden),
            pixel_obs=pixel_obs, use_lstm=use_lstm, lstm_size=lstm_size,
            compute_dtype=compute_dtype,
        )
        key = jax.random.PRNGKey(seed)
        self.key, k_init, k_reset = jax.random.split(key, 3)

        reset_fn, step_fn = env_base.vectorize(self.env)
        env_state, ts0 = jax.jit(reset_fn)(jax.random.split(k_reset, num_envs))
        self.env_state = env_state
        self.obs = self._flatten(ts0.obs)

        obs_dim = 0 if pixel_obs else env_base.obs_flat_dim(self.env)
        if use_lstm:
            self.carry = self.net.initial_carry((num_envs,))
            params = self.net.init(
                k_init, self.obs[:1], jax.tree.map(lambda c: c[:1], self.carry)
            )
        else:
            params = self.net.init(k_init, self.obs[:1])
        self.state = ppo.init_state(self.cfg, params, max(obs_dim, 1))
        self.ep_ret = jnp.zeros((num_envs,), jnp.float32)
        self.global_iter = 0  # lifetime iteration count (survives checkpoint)

        self.mesh = mesh
        if mesh is not None:
            # Data-parallel path (reference's actor fleet + param broadcast,
            # SURVEY.md §2D): env batch sharded over the `data` axis, params
            # replicated via pmean'd gradients. Optional extra axes:
            # `time` splits the GAE scan across time shards (tshard.py);
            # `model` switches to the GSPMD tensor-parallel path below.
            if debug_checks:
                raise ValueError("debug_checks is single-device only")
            from surreal_tpu.parallel.dp import (
                make_sharded_ppo_lstm_step,
                make_sharded_ppo_step,
                place_by_spec,
                shard_env_batch,
                train_state_spec,
            )
            from surreal_tpu.parallel.mesh import (
                MODEL_AXIS,
                TIME_AXIS,
                data_axis_size,
            )

            model_shards = mesh.shape.get(MODEL_AXIS, 1)
            time_shards = mesh.shape.get(TIME_AXIS, 1)
            if model_shards > 1 and time_shards > 1:
                raise ValueError("mesh.model and mesh.time cannot both be > 1")
            if model_shards > 1:
                # Tensor parallelism (SURVEY.md §2D TP row) the XLA way:
                # jit the WHOLE fused train step with NamedShardings — env
                # batch over `data`, Dense kernels (and their Adam moments)
                # alternately column-/row-parallel over `model` — and let
                # GSPMD insert the collectives. No shard_map: inside manual
                # shards flax matmuls on partial kernels would be wrong.
                if use_lstm or cfg.zero_optimizer or cfg.publish_every > 1 or overlap:
                    raise ValueError(
                        "mesh.model > 1 (GSPMD TP path) does not compose with "
                        "use_lstm / zero_optimizer / publish_every / overlap yet"
                    )
                self._init_gspmd_tp(cfg, step_fn, mesh, model_shards)
                return
            if time_shards > 1:
                if cfg.horizon % time_shards != 0:
                    raise ValueError(
                        f"horizon {cfg.horizon} not divisible by time axis "
                        f"{time_shards}"
                    )
                cfg = dataclasses.replace(cfg, time_shards=time_shards)
                self.cfg = cfg

            shards = data_axis_size(mesh)
            if num_envs % shards != 0:
                raise ValueError(f"num_envs={num_envs} not divisible by data axis {shards}")
            sspec = train_state_spec(self.state)  # P() everywhere unless ZeRO
            if overlap:
                from surreal_tpu.parallel.dp import make_sharded_ppo_overlap_step

                self._train_step, self._prime = make_sharded_ppo_overlap_step(
                    self.cfg, self.net.apply, step_fn, self._flatten, mesh,
                    state_spec=sspec,
                )
            else:
                maker = make_sharded_ppo_lstm_step if use_lstm else make_sharded_ppo_step
                self._train_step = maker(
                    self.cfg, self.net.apply, step_fn, self._flatten, mesh,
                    state_spec=sspec,
                )
            self.state = place_by_spec(mesh, self.state, sspec)
            self.env_state = shard_env_batch(mesh, self.env_state)
            self.obs = shard_env_batch(mesh, self.obs)
            self.ep_ret = shard_env_batch(mesh, self.ep_ret)
            if use_lstm:
                self.carry = shard_env_batch(mesh, self.carry)
            return

        if debug_checks:  # sanitizer mode: checkify NaN/Inf + kernel hooks
            from surreal_tpu.utils import guards

            wrap = guards.jit_checked
        else:
            wrap = jax.jit
        if use_lstm:
            from surreal_tpu.algos import ppo_lstm

            self._train_step = wrap(
                partial(
                    ppo_lstm.train_step, self.cfg, self.net.apply, step_fn, self._flatten
                )
            )
        elif overlap:
            self._train_step = wrap(
                partial(
                    ppo.train_step_overlapped, self.cfg, self.net.apply, step_fn,
                    self._flatten,
                )
            )
            self._prime = jax.jit(
                partial(ppo.rollout, self.cfg, self.net.apply, step_fn, self._flatten)
            )
        else:
            self._train_step = wrap(
                partial(
                    ppo.train_step, self.cfg, self.net.apply, step_fn, self._flatten
                )
            )

    def _init_gspmd_tp(self, cfg, step_fn, mesh, model_shards: int):
        """GSPMD tensor-parallel train step: global-array jit with sharded
        inputs (no shard_map, no axis_name — jnp reductions are global and
        XLA all-reduces partial matmul products where the TP shardings
        require it). Golden-tested against the unsharded step
        (tests/test_tp.py)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from surreal_tpu.parallel.mesh import DATA_AXIS
        from surreal_tpu.parallel.tp import tp_kernel_specs, tp_tree_sharding

        kspecs = tp_kernel_specs(self.state.params, model_shards)
        state_sh = tp_tree_sharding(mesh, self.state, kspecs)
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        rep = NamedSharding(mesh, P())

        def shard_data(tree):
            return jax.tree.map(lambda x: jax.device_put(x, data_sh), tree)

        self.state = jax.tree.map(jax.device_put, self.state, state_sh)
        self.env_state = shard_data(self.env_state)
        self.obs = shard_data(self.obs)
        self.ep_ret = shard_data(self.ep_ret)
        env_sh = jax.tree.map(lambda _: data_sh, self.env_state)
        self._train_step = jax.jit(
            partial(ppo.train_step, self.cfg, self.net.apply, step_fn, self._flatten),
            in_shardings=(state_sh, env_sh, data_sh, data_sh, rep),
            out_shardings=(state_sh, env_sh, data_sh, data_sh, rep),
            donate_argnums=(1, 2, 3),
        )

    @property
    def steps_per_iteration(self) -> int:
        return self.cfg.horizon * self.num_envs

    # ---- full-state checkpointing (SURVEY.md §5: params, opt_state,
    # Z-filter, env-batch RNG + env state + step counters all survive) ----
    @property
    def full_state(self) -> dict:
        fs = dict(
            state=self.state, env_state=self.env_state, obs=self.obs,
            ep_ret=self.ep_ret, key=self.key,
            global_iter=jnp.asarray(self.global_iter, jnp.int32),
        )
        if self.use_lstm:
            fs["carry"] = self.carry
        if self.mesh is not None:
            # host-locally created leaves must be GLOBAL (replicated) arrays
            # for multi-process Orbax serialization; harmless single-host.
            from surreal_tpu.parallel.dp import replicate

            fs["key"] = replicate(self.mesh, fs["key"])
            fs["global_iter"] = replicate(self.mesh, fs["global_iter"])
        return fs

    def load_full_state(self, fs: dict) -> None:
        self.state = fs["state"]
        self.env_state = fs["env_state"]
        self.obs = fs["obs"]
        self.ep_ret = fs["ep_ret"]
        self.key = fs["key"]
        self.global_iter = int(fs["global_iter"])
        if self.use_lstm:
            self.carry = fs["carry"]
        self._pending = None  # overlap: re-primed on the next run() call

    def run(self, iterations: int, log_every: int = 10, metric_sink: Callable | None = None):
        """Returns list of host-side metric dicts (one per log interval)."""
        logs = []
        # Device-side accumulators (no host sync between log intervals).
        ep_ret_acc = jnp.zeros(())
        ep_cnt_acc = jnp.zeros(())
        t0 = time.perf_counter()
        if self.overlap and self._pending is None:
            # Prime the double buffer: one rollout with the initial params
            # (its update happens in the first train iteration below).
            self.key, sub = jax.random.split(self.key)
            out = self._prime(self.state, self.env_state, self.obs, self.ep_ret, sub)
            self._pending, self.env_state, self.obs, self.ep_ret = out[:4]
        for it in range(1, iterations + 1):
            self.key, sub = jax.random.split(self.key)
            if self.use_lstm:
                (
                    self.state, self.env_state, self.obs, self.carry,
                    self.ep_ret, metrics,
                ) = self._train_step(
                    self.state, self.env_state, self.obs, self.carry, self.ep_ret, sub
                )
            elif self.overlap:
                (
                    self.state, self.env_state, self.obs, self.ep_ret,
                    self._pending, metrics,
                ) = self._train_step(
                    self.state, self.env_state, self.obs, self.ep_ret,
                    self._pending, sub,
                )
            else:
                self.state, self.env_state, self.obs, self.ep_ret, metrics = self._train_step(
                    self.state, self.env_state, self.obs, self.ep_ret, sub
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
                m["env_steps_per_s"] = log_every * self.steps_per_iteration / dt
                if cnt > 0:
                    m["episode_return"] = float(ep_ret_acc) / cnt
                    ep_ret_acc = jnp.zeros(())
                    ep_cnt_acc = jnp.zeros(())
                logs.append(m)
                if metric_sink:
                    metric_sink(m)
                self.log.info(
                    "it %d steps %.2e sps %.0f ret %s kl %.4f",
                    it,
                    m["env_steps"],
                    m["env_steps_per_s"],
                    f"{m.get('episode_return', float('nan')):.1f}",
                    m["kl"],
                )
                t0 = time.perf_counter()
        return logs

    def deterministic_policy(self):
        """(policy_fn, params, zfilter) for video recording; None for LSTM
        policies (stateless policy_fn contract)."""
        if self.use_lstm:
            return None

        def policy(params, obs):
            mean, _, _ = self.net.apply(params, obs)
            return mean

        zf = self.state.zfilter if self.cfg.use_zfilter else None
        return policy, self.state.params, zf

    # ---- evaluation (reference's eval workers, SURVEY.md §3.5) ----
    def evaluate(self, episodes: int = 16, stochastic: bool = False, seed: int = 0):
        from surreal_tpu.models.distributions import DiagGauss
        from surreal_tpu.train.evaluator import evaluate_policy

        zf = self.state.zfilter if self.cfg.use_zfilter else None
        if self.use_lstm:
            def policy(params, obs, key, carry):
                mean, log_std, _, carry = self.net.apply(params, obs, carry)
                a = DiagGauss.sample(key, mean, log_std) if stochastic else mean
                return a, carry

            return evaluate_policy(
                self.env, policy, self.state.params, zf, episodes=episodes,
                seed=seed, flatten=self._flatten,
                init_policy_state=self.net.initial_carry((episodes,)),
            )

        def policy(params, obs, key):
            mean, log_std, _ = self.net.apply(params, obs)
            return DiagGauss.sample(key, mean, log_std) if stochastic else mean

        return evaluate_policy(
            self.env, policy, self.state.params, zf, episodes=episodes, seed=seed,
            flatten=self._flatten,
        )
