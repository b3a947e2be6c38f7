"""Lightweight structured logger (the role of SurrealAI's `nanolog` +
`loggerplex`: printf-style levelled logging; per-host log files replace the
central log-aggregation server since all components live in one program).
"""

from __future__ import annotations

import logging
import os
import sys
import time

_FMT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"
_DATEFMT = "%H:%M:%S"

_configured = False


def _configure_root(level: int = logging.INFO, logdir: str | None = None) -> None:
    global _configured
    if _configured:
        return
    handlers: list[logging.Handler] = []
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(logging.Formatter(_FMT, _DATEFMT))
    handlers.append(sh)
    if logdir:
        os.makedirs(logdir, exist_ok=True)
        # One file per host process (multi-host SPMD: each host writes its own).
        host = os.environ.get("JAX_PROCESS_INDEX", "0")
        fh = logging.FileHandler(os.path.join(logdir, f"host-{host}.log"))
        fh.setFormatter(logging.Formatter(_FMT, _DATEFMT))
        handlers.append(fh)
    root = logging.getLogger("surreal_tpu")
    root.setLevel(level)
    for h in handlers:
        root.addHandler(h)
    root.propagate = False
    _configured = True


def get_logger(name: str = "surreal_tpu", logdir: str | None = None) -> logging.Logger:
    _configure_root(logdir=logdir)
    if not name.startswith("surreal_tpu"):
        name = "surreal_tpu." + name
    return logging.getLogger(name)


class Timer:
    """Context-manager wall-clock timer."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False
