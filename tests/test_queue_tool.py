"""Queue-runner outcome classification (tools/run_queue.py)."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "run_queue", os.path.join(os.path.dirname(__file__), "..", "tools", "run_queue.py")
)
rq = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rq)


def test_classify_outcomes():
    assert rq.classify(0, "anything") == "ok"
    # TPU tunnel flake -> retryable
    assert rq.classify(1, "jax.errors.JaxRuntimeError: FAILED_PRECONDITION: "
                          "TPU backend error") == "infra"
    assert rq.classify(1, "DEADLINE_EXCEEDED while awaiting compile") == "infra"
    # algorithmic failure -> not retried
    assert rq.classify(1, "FloatingPointError: non-finite training metrics "
                          "at iteration 24") == "failed"
