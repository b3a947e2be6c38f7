"""Batched policy inference service (direct + TCP wire protocol)."""

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.models.actor_critic import PPOActorCritic
from surreal_tpu.train.serving import PolicyService, request_actions


def _make_service(stochastic=False):
    net = PPOActorCritic(action_dim=3, hidden=(16, 16))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    return PolicyService(net.apply, params, stochastic=stochastic), net, params


def test_act_shapes_and_determinism():
    svc, _, _ = _make_service()
    obs = np.random.RandomState(0).randn(7, 5).astype(np.float32)
    a1 = svc.act(obs)
    a2 = svc.act(obs)
    assert a1.shape == (7, 3)
    np.testing.assert_array_equal(a1, a2)  # deterministic mode


def test_stochastic_mode_varies():
    svc, _, _ = _make_service(stochastic=True)
    obs = np.zeros((4, 5), np.float32)
    assert not np.allclose(svc.act(obs), svc.act(obs))


def test_param_hot_swap():
    svc, net, params = _make_service()
    obs = np.ones((2, 5), np.float32)
    a1 = svc.act(obs)
    bumped = jax.tree.map(lambda x: x + 0.1, params)
    svc.update_params(bumped)
    a2 = svc.act(obs)
    assert not np.allclose(a1, a2)


def test_tcp_round_trip():
    svc, _, _ = _make_service()
    server, addr = svc.serve()
    try:
        obs = np.random.RandomState(1).randn(4, 5).astype(np.float32)
        actions = request_actions(addr, obs)
        np.testing.assert_allclose(actions, svc.act(obs), atol=1e-6)
    finally:
        server.shutdown()
