"""Native batched-MuJoCo oracle bridge (C++ thread pool via ctypes)."""

import os

import numpy as np
import pytest

from surreal_tpu.envs.oracle import _LIB_PATH, BatchedOracle

pytestmark = pytest.mark.skipif(
    not os.path.exists(_LIB_PATH), reason="native lib not built (tools/build_native.py)"
)


def test_create_step_state_roundtrip(rng):
    o = BatchedOracle.for_domain("cheetah", 8, n_threads=4)
    assert (o.nq, o.nv, o.nu) == (9, 9, 6)
    q = rng.uniform(-0.1, 0.1, (8, 9))
    v = rng.uniform(-0.1, 0.1, (8, 9))
    o.set_state(q, v)
    qo, vo = o.get_state()
    np.testing.assert_allclose(qo, q)
    np.testing.assert_allclose(vo, v)
    o.step(rng.uniform(-1, 1, (8, 6)), nsteps=5)
    q1, v1 = o.get_state()
    assert not np.allclose(q1, q)  # advanced
    assert np.isfinite(q1).all()
    # envs with identical state+ctrl stay identical (determinism across pool threads)
    o.set_state(np.tile(q[:1], (8, 1)), np.tile(v[:1], (8, 1)))
    o.step(np.tile(rng.uniform(-1, 1, (1, 6)), (8, 1)), nsteps=10)
    q2, _ = o.get_state()
    np.testing.assert_allclose(q2, np.tile(q2[:1], (8, 1)))
    o.close()


def test_matches_dm_control_env(rng):
    """Oracle stepping == dm_control's own physics for identical states."""
    suite = pytest.importorskip("dm_control.suite")
    import mujoco

    denv = suite.load("walker", "walk")
    o = BatchedOracle.for_domain("walker", 2)
    q = rng.uniform(-0.2, 0.2, 9)
    v = rng.uniform(-0.2, 0.2, 9)
    denv.reset()
    denv.physics.data.qpos[:] = q
    denv.physics.data.qvel[:] = v
    mujoco.mj_forward(denv.physics.model._model, denv.physics.data._data)
    o.set_state(np.tile(q, (2, 1)), np.tile(v, (2, 1)))
    ctrl = rng.uniform(-1, 1, 6)
    for _ in range(20):
        denv.physics.data.ctrl[:] = ctrl
        mujoco.mj_step(denv.physics.model._model, denv.physics.data._data)
    o.step(np.tile(ctrl, (2, 1)), nsteps=20)
    qo, vo = o.get_state()
    np.testing.assert_allclose(qo[0], denv.physics.data.qpos, atol=1e-10)
    np.testing.assert_allclose(vo[0], denv.physics.data.qvel, atol=1e-10)
    o.close()
