"""Tensor-parallel parameter sharding over the `model` axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.models.actor_critic import PPOActorCritic
from surreal_tpu.parallel import make_mesh
from surreal_tpu.parallel.tp import shard_params_tp

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def test_tp_forward_matches_replicated():
    mesh = make_mesh(data=2, model=4)
    net = PPOActorCritic(action_dim=4, hidden=(64, 64))
    obs = jnp.ones((16, 12))
    params = net.init(jax.random.PRNGKey(0), obs)
    want = jax.jit(net.apply)(params, obs)

    tp_params = shard_params_tp(mesh, params)
    # kernels actually got sharded over the model axis
    k0 = tp_params["params"]["actor_torso"]["dense_0"]["kernel"]
    assert not k0.sharding.is_fully_replicated
    got = jax.jit(net.apply)(tp_params, obs)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)


def test_tp_gradients_match():
    mesh = make_mesh(data=2, model=4)
    net = PPOActorCritic(action_dim=2, hidden=(32, 32))
    obs = jnp.ones((8, 6))
    params = net.init(jax.random.PRNGKey(1), obs)

    def loss(p):
        mean, log_std, value = net.apply(p, obs)
        return jnp.sum(mean**2) + jnp.sum(value**2)

    g_ref = jax.jit(jax.grad(loss))(params)
    g_tp = jax.jit(jax.grad(loss))(shard_params_tp(mesh, params))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)
