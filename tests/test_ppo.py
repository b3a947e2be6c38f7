"""PPO train-step mechanics + a fast end-to-end learning check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.algos import ppo
from surreal_tpu.train import PPOTrainer


def test_train_step_runs_and_metrics_finite():
    cfg = ppo.PPOConfig(horizon=8, epochs=2, num_minibatches=2)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=8, seed=0)
    logs = tr.run(2, log_every=1)
    for m in logs:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} is {v}"


def test_objective_variants():
    for objective in ("clip", "adaptive_kl"):
        cfg = ppo.PPOConfig(horizon=8, epochs=1, num_minibatches=1, objective=objective)
        tr = PPOTrainer("cartpole-balance", cfg, num_envs=4, seed=0)
        logs = tr.run(2, log_every=1)
        assert np.isfinite(logs[-1]["policy_loss"])


def test_entropy_anneal_schedule():
    # Constant when off; linear interp then clamp when on.
    cfg = ppo.PPOConfig(entropy_coef=0.01)
    assert float(ppo.entropy_coef_at(cfg, jnp.asarray(7))) == pytest.approx(0.01)
    cfg = ppo.PPOConfig(
        entropy_coef=0.01, entropy_final=0.002, entropy_anneal_iters=100
    )
    assert float(ppo.entropy_coef_at(cfg, jnp.asarray(0))) == pytest.approx(0.01)
    assert float(ppo.entropy_coef_at(cfg, jnp.asarray(50))) == pytest.approx(0.006)
    assert float(ppo.entropy_coef_at(cfg, jnp.asarray(400))) == pytest.approx(0.002)


def test_entropy_anneal_train_step_runs():
    cfg = ppo.PPOConfig(
        horizon=8, epochs=1, num_minibatches=1,
        entropy_coef=0.01, entropy_final=0.0, entropy_anneal_iters=2,
    )
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=4, seed=0)
    logs = tr.run(3, log_every=1)
    assert all(np.isfinite(m["policy_loss"]) for m in logs)


def test_lr_adapts_down_on_kl_overshoot():
    cfg = ppo.PPOConfig(horizon=8, epochs=8, num_minibatches=1, lr=1.0, kl_target=1e-4)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=4, seed=0)
    tr.run(2, log_every=1)
    assert float(tr.state.lr_scale) < 1.0


def test_lstm_ppo_runs_and_evaluates():
    """Recurrent-policy path: rollout carries LSTM state, update recomputes
    through time from the stored chunk-initial carry."""
    cfg = ppo.PPOConfig(horizon=16, epochs=2, num_minibatches=2)
    tr = PPOTrainer(
        "cartpole-balance", cfg, num_envs=8, seed=0, hidden=(32, 32),
        use_lstm=True, lstm_size=32,
    )
    logs = tr.run(2, log_every=1)
    assert all(np.isfinite(v) for m in logs for v in m.values() if isinstance(v, float))
    ev = tr.evaluate(episodes=4)
    assert np.isfinite(ev["return_mean"])
    # carry actually evolves during rollouts
    assert float(jnp.abs(tr.carry[0]).max()) > 0


def _reference_rollout(cfg, apply_fn, env_step, flatten_obs, state, env_state, obs, ep_ret, key):
    """Literal per-step double-forward rollout (the pre-optimization
    semantics): next_value(t) = V(terminal obs) recomputed EVERY step."""
    from surreal_tpu.models.distributions import DiagGauss
    from surreal_tpu.models.z_filter import zfilter_normalize

    def norm(o):
        return zfilter_normalize(state.zfilter, o) if cfg.use_zfilter else o

    def step(carry, key_t):
        env_state, obs, ep_ret = carry
        mean, log_std, value = apply_fn(state.params, norm(obs))
        action = DiagGauss.sample(key_t, mean, log_std)
        log_prob = DiagGauss.log_prob(mean, log_std, action)
        env_state, ts = env_step(env_state, action)
        _, _, next_value = apply_fn(state.params, norm(flatten_obs(ts.obs)))
        tr = ppo.Trajectory(
            obs=obs, action=action, log_prob=log_prob, mean=mean,
            log_std=jnp.broadcast_to(log_std, mean.shape), value=value,
            next_value=next_value, reward=ts.reward, discount=ts.discount,
            done=ts.done,
        )
        return (env_state, flatten_obs(ts.carry_obs), ep_ret + ts.reward), tr

    keys = jax.random.split(key, cfg.horizon)
    _, traj = jax.lax.scan(step, (env_state, obs, ep_ret), keys)
    return traj


def test_rollout_matches_double_forward_golden():
    """The lazy terminal-value rollout (one forward/step + cond at dones)
    must produce BIT-IDENTICAL GAE inputs to the naive double-forward
    rollout, including across episode boundaries."""
    from surreal_tpu.envs import base as env_base
    from surreal_tpu.envs import make_env
    from surreal_tpu.models.actor_critic import PPOActorCritic

    env = make_env("cartpole-balance")
    env.episode_steps = 5  # force done steps inside the chunk
    cfg = ppo.PPOConfig(horizon=12)
    net = PPOActorCritic(action_dim=env.action_dim, hidden=(16, 16))
    reset_fn, step_fn = env_base.vectorize(env)
    env_state, ts0 = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(1), 6))
    obs = env_base.flatten_obs(ts0.obs)
    params = net.init(jax.random.PRNGKey(0), obs[:1])
    state = ppo.init_state(cfg, params, obs.shape[-1])
    ep_ret = jnp.zeros((6,), jnp.float32)
    key = jax.random.PRNGKey(7)

    traj, _, _, _, _ = jax.jit(
        lambda s, es, o, r, k: ppo.rollout(
            cfg, net.apply, step_fn, env_base.flatten_obs, s, es, o, r, k
        )
    )(state, env_state, obs, ep_ret, key)
    ref = jax.jit(
        lambda s, es, o, r, k: _reference_rollout(
            cfg, net.apply, step_fn, env_base.flatten_obs, s, es, o, r, k
        )
    )(state, env_state, obs, ep_ret, key)

    assert bool(jnp.any(traj.done)), "test must cross an episode boundary"
    for name in ("obs", "action", "log_prob", "value", "reward", "done"):
        a, b = getattr(traj, name), getattr(ref, name)
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{name} differs"
    # next_value is the same math but XLA fuses the forward differently at
    # its three program positions (in-scan cond / post-scan bootstrap), so
    # agreement is float32-ULP, not bit-for-bit.
    np.testing.assert_allclose(
        np.asarray(traj.next_value), np.asarray(ref.next_value), rtol=2e-6, atol=1e-6
    )


@pytest.mark.slow
def test_cartpole_learns():
    """End-to-end slice (BASELINE config 1 analog): episode return must
    clearly exceed the random-policy level (~350-440/1000).

    Budget note: PPO training is chaotic at the float level — a 1-ulp
    reassociation difference (e.g. the single-forward rollout refactor)
    shifts WHICH iteration the seed-0 run breaks out at (measured: breakout
    between it 120 and 160 across code versions, all reaching ~900 by
    it 240 and ~999 eventually). 120 iterations was inside that variance
    band and flaked; 240 is comfortably past it for every version tested."""
    cfg = ppo.PPOConfig(horizon=64, epochs=4, num_minibatches=4, lr=3e-4)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=64, seed=0)
    logs = tr.run(240, log_every=30)
    best = max(m.get("episode_return", 0.0) for m in logs)
    assert best > 600, f"best episode return {best}"


def test_publish_every_param_staleness():
    """cfg.publish_every>1 reproduces the reference's pub-sub lag: actors
    act on a snapshot refreshed every K learner updates (SURVEY.md §2D,
    surreal/distributed/ps)."""
    from surreal_tpu.envs import base as env_base
    from surreal_tpu.envs import make_env
    from surreal_tpu.models.actor_critic import PPOActorCritic

    env = make_env("cartpole-balance")
    net = PPOActorCritic(action_dim=env.action_dim, hidden=(16, 16))
    obs_dim = env_base.obs_flat_dim(env)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    reset_fn, step_fn = env_base.vectorize(env)
    env_state, ts0 = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(1), 4))
    obs = env_base.flatten_obs(ts0.obs)
    ep_ret = jnp.zeros((4,), jnp.float32)

    cfg = ppo.PPOConfig(horizon=6, epochs=1, num_minibatches=1, publish_every=3)
    state = ppo.init_state(cfg, params, obs_dim)
    step = jax.jit(
        lambda s, es, o, r, k: ppo.train_step(
            cfg, net.apply, step_fn, env_base.flatten_obs, s, es, o, r, k
        )
    )
    p0 = jax.tree.leaves(params)[0].copy()
    s, es, o, r = state, env_state, obs, ep_ret
    for i in range(2):
        s, es, o, r, metrics = step(s, es, o, r, jax.random.PRNGKey(i))
        # learner moved, actor snapshot still at version 0 == init params
        assert int(s.psync.version) == 0
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(s.psync.actor_params)[0]), np.asarray(p0)
        )
        assert not np.allclose(
            np.asarray(jax.tree.leaves(s.params)[0]), np.asarray(p0)
        )
    s, es, o, r, metrics = step(s, es, o, r, jax.random.PRNGKey(2))
    # 3rd update: published — snapshot adopts live params
    assert int(s.psync.version) == 3
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(s.psync.actor_params)[0]),
        np.asarray(jax.tree.leaves(s.params)[0]),
    )

    # publish_every=1 keeps today's zero-staleness semantics (psync is None)
    cfg1 = ppo.PPOConfig(horizon=6, epochs=1, num_minibatches=1, publish_every=1)
    s1 = ppo.init_state(cfg1, params, obs_dim)
    assert s1.psync is None


def test_overlapped_step_runs_and_learns():
    """Double-buffered rollout(k)/train(k-1) overlap (SURVEY.md §2D async
    row): one-update staleness semantics, still learns cartpole."""
    cfg = ppo.PPOConfig(horizon=64, epochs=4, num_minibatches=4, lr=3e-4)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=64, seed=0, overlap=True)
    logs = tr.run(240, log_every=30)
    best = max(m.get("episode_return", 0.0) for m in logs)
    assert best > 600, f"best episode return {best}"


def test_overlapped_sharded_step_runs():
    import pytest as _pytest

    if jax.device_count() < 8:
        _pytest.skip("needs 8 devices")
    from surreal_tpu.parallel import make_mesh

    cfg = ppo.PPOConfig(horizon=16, epochs=2, num_minibatches=2)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=16, seed=0,
                    mesh=make_mesh(data=8), overlap=True)
    logs = tr.run(3, log_every=3)
    m = logs[-1]
    assert np.isfinite(m["kl"]) and np.isfinite(m["grad_norm"])
