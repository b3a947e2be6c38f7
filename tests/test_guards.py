"""NaN-guard / checkify sanitizer hooks (SURVEY.md §5 sanitizers row)."""

import jax
import jax.numpy as jnp
import pytest

from surreal_tpu.utils import guards


def test_jit_checked_catches_nan():
    def step(x):
        return jnp.log(x)  # NaN for negative input

    f = guards.jit_checked(step)
    assert jnp.allclose(f(jnp.ones(4)), 0.0)
    with pytest.raises(Exception, match="nan"):
        f(-jnp.ones(4))


def test_assert_finite_hook_fires_inside_checked():
    def kernel(x):
        y = x / x  # NaN at x == 0
        guards.assert_finite(y, "kernel.y")
        return y

    f = guards.checked(kernel)
    f(jnp.ones(3))
    with pytest.raises(Exception, match="kernel.y"):
        f(jnp.zeros(3))


def test_assert_finite_noop_outside_checked():
    # Hooks must cost nothing (and not break tracing) under plain jit.
    assert not guards.checks_enabled()

    @jax.jit
    def f(x):
        guards.assert_finite(x, "unused")
        return x * 2

    assert jnp.allclose(f(jnp.full(3, jnp.nan)), jnp.nan, equal_nan=True)


def test_gae_hook_named_in_error():
    from surreal_tpu.ops import returns

    T, B = 8, 4
    r = jnp.full((T, B), jnp.nan)
    v = jnp.zeros((T, B))
    f = guards.checked(
        lambda r: returns.gae(r, v, v, jnp.ones((T, B)), jnp.zeros((T, B), bool),
                              0.99, 0.95)
    )
    with pytest.raises(Exception, match="ops.gae"):
        f(r)


def test_trainer_debug_checks_smoke():
    from surreal_tpu.algos.ppo import PPOConfig
    from surreal_tpu.train import PPOTrainer

    cfg = PPOConfig(horizon=4, epochs=1, num_minibatches=1)
    tr = PPOTrainer("cartpole-balance", cfg, num_envs=4, seed=0, hidden=(16, 16),
                    debug_checks=True)
    tr.run(2, log_every=2)
    assert not guards.checks_enabled()  # flag restored after tracing
