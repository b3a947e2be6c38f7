"""NaN / assertion guards for jitted train steps and kernels.

Role of the reference's sanitizer story (SURVEY.md §5 "race detection /
sanitizers": it has none — threaded code relies on queues/GIL). On-device
SPMD has no data races by construction; the equivalent hazard is numeric —
a NaN/Inf escaping a kernel and silently corrupting training. These hooks
make that loud, via `jax.experimental.checkify`:

- ``enable_checks()`` / ``checks_enabled()``: process-wide debug switch
  (also settable with the ``SURREAL_TPU_CHECKS=1`` environment variable).
- ``assert_finite(x, name)`` / ``assert_finite_tree(tree, name)``: the
  per-kernel hook. Hot kernels call it unconditionally — it is a no-op
  (zero trace cost) unless checks are enabled AND the enclosing function
  was functionalized with ``checked``/``jit_checked``.
- ``checked(fn)`` / ``jit_checked(fn)``: functionalize the user checks plus
  automatic float checks (NaN/Inf/div-by-zero) and throw host-side with the
  first failing check's message.

Trainers expose this as ``debug_checks=True``; production steps pay nothing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import checkify

_ENABLED = os.environ.get("SURREAL_TPU_CHECKS", "0") not in ("", "0", "false")


def enable_checks(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def checks_enabled() -> bool:
    return _ENABLED


def assert_finite(x: jax.Array, name: str) -> None:
    """Per-kernel checkify hook: assert every element of `x` is finite.

    No-op when checks are disabled. When enabled, the enclosing train step
    must be functionalized with `checked`/`jit_checked` (checkify.check
    requires it); trainers do this automatically under debug_checks.
    """
    if not _ENABLED:
        return
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return
    checkify.check(jnp.all(jnp.isfinite(x)), f"non-finite values in {name}")


def assert_finite_tree(tree, name: str) -> None:
    """assert_finite over every array leaf of a pytree (params, grads)."""
    if not _ENABLED:
        return
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        assert_finite(leaf, f"{name}{jax.tree_util.keystr(path)}")


def _wrap_throwing(fn, cfn):
    """Call the checkified fn with hooks enabled during tracing, then throw
    host-side. assert_finite hooks therefore activate exactly inside
    checked/jit_checked functions (a plain jax.jit elsewhere traces with the
    hooks off, which would otherwise fail: checkify.check has no lowering
    without functionalization)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        global _ENABLED
        prev, _ENABLED = _ENABLED, True
        try:
            err, out = cfn(*args, **kwargs)
        finally:
            _ENABLED = prev
        checkify.check_error(err)
        return out

    return wrapper


def _default_errors(errors):
    return errors if errors is not None else (
        checkify.float_checks | checkify.user_checks
    )


def checked(fn, errors=None):
    """Functionalize fn's checkify checks (+ float checks) and raise
    host-side on the first failure. For a jitted step use `jit_checked`
    (the throw must stay host-side)."""
    return _wrap_throwing(fn, checkify.checkify(fn, errors=_default_errors(errors)))


def jit_checked(fn, errors=None, **jit_kwargs):
    """jit(checkify(fn)) with the error thrown on the host after each call —
    the debug-mode replacement for a plain jax.jit(fn) train step."""
    cfn = jax.jit(checkify.checkify(fn, errors=_default_errors(errors)), **jit_kwargs)
    return _wrap_throwing(fn, cfn)
