"""Metrics sink: multiplexed TensorBoard scalars + structured stdout.

Role of the reference's tensorplex/loggerplex stack [SURVEY.md §2B, §5]:
the reference multiplexes many processes' scalar streams into one
TensorBoard logdir with per-component sections (learner, agent-0..N merged
views, replay, eval). In the fused program there is one writer per host;
section grouping survives as tag prefixes ("learner/...", "actors/...",
"eval/...") so dashboards look the same.
"""

from __future__ import annotations

import os
import time
from typing import Mapping

from surreal_tpu.utils import get_logger


class MetricsWriter:
    """TensorBoard writer (flax.metrics.tensorboard backend) + stdout."""

    def __init__(self, logdir: str | None, section: str = "learner", flush_every_s: float = 10.0):
        self.section = section
        self._writer = None
        if logdir:
            from flax.metrics import tensorboard

            os.makedirs(logdir, exist_ok=True)
            self._writer = tensorboard.SummaryWriter(logdir)
        self._log = get_logger("metrics")
        self._last_flush = time.monotonic()
        self._flush_every = flush_every_s

    def write(self, step: int, scalars: Mapping[str, float], section: str | None = None) -> None:
        sec = section or self.section
        if self._writer is not None:
            for k, v in scalars.items():
                self._writer.scalar(f"{sec}/{k}", v, step)
            if time.monotonic() - self._last_flush > self._flush_every:
                self._writer.flush()
                self._last_flush = time.monotonic()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
