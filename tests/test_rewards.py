"""JAX tolerance() vs the dm_control oracle implementation."""

import numpy as np
import pytest

from surreal_tpu.envs import rewards as jrewards

dm_rewards = pytest.importorskip("dm_control.utils.rewards")

SIGMOIDS = [
    "gaussian", "hyperbolic", "long_tail", "reciprocal",
    "cosine", "linear", "quadratic", "tanh_squared",
]


@pytest.mark.parametrize("sigmoid", SIGMOIDS)
def test_tolerance_matches_oracle(sigmoid, rng):
    x = rng.uniform(-20, 20, 256)
    for bounds, margin, vam in [
        ((0.0, 0.0), 1.0, 0.1),
        ((-1.0, 2.0), 5.0, 0.1),
        ((10.0, float("inf")), 10.0, 0.5),
    ]:
        if sigmoid in ("cosine", "linear", "quadratic"):
            vam_use = 0.0 if margin == 1.0 else vam
        else:
            vam_use = vam
        want = dm_rewards.tolerance(x, bounds, margin, sigmoid, vam_use)
        got = np.asarray(
            jrewards.tolerance(x, bounds, margin, sigmoid, vam_use), dtype=np.float64
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tolerance_margin_zero(rng):
    x = rng.uniform(-2, 2, 100)
    want = dm_rewards.tolerance(x, (-0.25, 0.25))
    got = np.asarray(jrewards.tolerance(x, (-0.25, 0.25)))
    np.testing.assert_allclose(got, want)


def test_tolerance_validation():
    with pytest.raises(ValueError):
        jrewards.tolerance(0.0, (1.0, 0.0))
    with pytest.raises(ValueError):
        jrewards.tolerance(0.0, margin=-1.0)
    with pytest.raises(ValueError):
        jrewards._sigmoids(0.0, 0.5, "nope")
