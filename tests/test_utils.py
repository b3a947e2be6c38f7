"""Trackers, logger, metrics writer, profiling utils."""

import os
import time

import numpy as np

from surreal_tpu.train.metrics import MetricsWriter
from surreal_tpu.utils import PeriodicTracker, ThroughputTracker, get_logger
from surreal_tpu.utils.trackers import TimedTracker


def test_periodic_tracker():
    t = PeriodicTracker(10)
    fires = [c for c in range(1, 35) if t.track(c)]
    assert fires == [10, 20, 30]


def test_periodic_tracker_catches_jumps():
    t = PeriodicTracker(10)
    assert t.track(25)  # jumped past two periods: fires once
    assert not t.track(29)
    assert t.track(30)


def test_timed_tracker():
    t = TimedTracker(0.05)
    assert not t.track()
    time.sleep(0.06)
    assert t.track()
    assert not t.track()


def test_throughput_tracker():
    t = ThroughputTracker(smoothing=0.0)
    t.update(0)
    time.sleep(0.05)
    rate = t.update(100)
    assert 500 < rate < 10000  # ~2000/s


def test_logger_writes_file(tmp_path):
    log = get_logger("testmod", logdir=str(tmp_path))
    log.info("hello %d", 42)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".log")]
    # logdir only attaches on first configure; tolerate either outcome for
    # repeat configuration, but the logger must not crash.
    assert log.name == "surreal_tpu.testmod"


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path), section="learner")
    w.write(10, {"loss": 1.0, "kl": 0.1})
    w.write(20, {"return_mean": 5.0}, section="eval")
    w.close()
    files = os.listdir(tmp_path)
    assert any("events" in f for f in files)


def test_metrics_writer_disabled():
    w = MetricsWriter(None)
    w.write(1, {"x": 1.0})
    w.close()
