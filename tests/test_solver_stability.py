"""Constraint-solver stability regressions.

Before the row-sum (mass-splitting) scaling fix, the projected-Jacobi
sweep DIVERGED on redundant constraint stacks (many ground contacts +
joint limits over few dofs), growing |v| without bound and exploding
hopper-stand / walker-run / manipulator training to NaN within ~50
iterations. These tests pin (a) a real captured pre-blowup hopper state,
(b) long random-action rollouts on every contact domain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surreal_tpu.envs import make_env
from surreal_tpu.envs.base import vectorize
from surreal_tpu.envs.physics import engine

# Captured from a 256-env random-action hopper rollout: one control step
# after this state, the diagonal-scaled solver returned |v| = 302 (and
# 6930 at 160 sweeps — divergent); Gauss-Seidel returns ~10.
_HOPPER_Q = [-0.6392956376075745, -3.0029702186584473, 0.16238850355148315,
             2.5279903411865234, 1.8644756078720093, 0.8422057628631592,
             0.40002918243408203]
_HOPPER_QD = [4.273245334625244, -4.386835098266602, -37.2769775390625,
              -17.206695556640625, 54.81291580200195, 13.733526229858398,
              8.064435005187988]
_ACT = [0.3511475920677185, -0.4088495075702667, -0.14627687633037567,
        -0.6145318746566772]


def test_projected_jacobi_converges_on_crumpled_hopper():
    m = make_env("hopper-stand").model
    q = jnp.asarray(_HOPPER_Q)
    qd = jnp.asarray(_HOPPER_QD)
    act = jnp.asarray(_ACT)
    # one substep in: the configuration whose Delassus stack diverged
    q, qd = engine.step_euler(m, q, qd, act)
    h = m.dt
    M = engine.mass_matrix(m, q)
    M_inv = jnp.linalg.inv(M)
    f = engine.smooth_forces(m, q, qd, act) - jnp.asarray(m.damping) * qd
    v_star = qd + h * jnp.linalg.solve(M + h * jnp.diag(jnp.asarray(m.damping)), f)
    mags = []
    for n_iter in (10, 20, 80, 160):
        v = engine._project_jacobi(m, q, v_star, M_inv, h, n_iter=n_iter)
        mags.append(float(jnp.abs(v).max()))
    # convergent: magnitude stable in iteration count, comparable to the
    # sequential Gauss-Seidel reference (NOT growing toward thousands)
    assert max(mags) < 3.0 * float(jnp.abs(v_star).max()) + 10.0, mags
    assert max(mags) < 1.5 * min(mags) + 1.0, mags


def test_crumpled_hopper_rollout_stays_bounded():
    m = make_env("hopper-stand").model
    q = jnp.asarray(_HOPPER_Q)
    qd = jnp.asarray(_HOPPER_QD)
    act = jnp.asarray(_ACT)
    step = jax.jit(engine.make_stepper(m, n_substeps=4))
    for _ in range(100):
        q, qd = step(q, qd, act)
    assert bool(np.isfinite(np.asarray(q)).all())
    assert bool(np.isfinite(np.asarray(qd)).all())
    assert float(jnp.abs(qd).max()) < 100.0


@pytest.mark.parametrize("name", ["hopper-stand", "walker-run", "finger-spin",
                                  "manipulator-bring_ball"])
def test_random_action_rollout_finite(name):
    """300 control steps of N(0,1) actions on 32 envs: the pre-fix solver
    NaN'd hopper within ~40 steps of this exact protocol."""
    env = make_env(name)
    reset_fn, step_fn = vectorize(env)
    state, _ = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(0), 32))
    jstep = jax.jit(step_fn)
    key = jax.random.PRNGKey(1)
    for _ in range(300):
        key, k = jax.random.split(key)
        state, ts = jstep(state, jax.random.normal(k, (32, env.action_dim)))
    assert bool(np.isfinite(np.asarray(state.q)).all())
    assert bool(np.isfinite(np.asarray(state.qd)).all())
    assert bool(np.isfinite(np.asarray(ts.reward)).all())


@pytest.mark.parametrize("name", ["hopper-stand", "finger-spin"])
def test_implicit_impulse_rollout_finite(name):
    """The implicit-impulse metric ((M + h·diag(D))⁻¹, MuJoCo Euler
    semantics) with the stiff dynamic pair push stays bounded under the
    same random-action protocol — the r4 contact-model candidate."""
    n_substeps, ret_imp = {"hopper-stand": (4, False),
                           "finger-spin": (2, True)}[name]
    env = make_env(name)
    env.model = env.model.replace(implicit_impulse=True,
                                  pair_push="stiff_dynamic")
    env._step_fn = engine.make_stepper(env.model, n_substeps=n_substeps,
                                       return_impulses=ret_imp)
    reset_fn, step_fn = vectorize(env)
    state, _ = jax.jit(reset_fn)(jax.random.split(jax.random.PRNGKey(0), 16))
    jstep = jax.jit(step_fn)
    key = jax.random.PRNGKey(1)
    for _ in range(200):
        key, k = jax.random.split(key)
        state, ts = jstep(state, jax.random.normal(k, (16, env.action_dim)))
    assert bool(np.isfinite(np.asarray(state.q)).all())
    assert bool(np.isfinite(np.asarray(state.qd)).all())
    assert float(jnp.abs(np.asarray(state.qd)).max()) < 200.0
