"""Device mesh + distributed initialization.

Role of the reference's network topology (caraml ZMQ sockets + symphony
address wiring + Kubernetes DNS discovery, SURVEY.md §2E): on TPU the
entire constellation collapses to a `jax.sharding.Mesh` over
[data, model(, time)] axes. Collectives ride ICI within a slice and DCN
across hosts; `jax.distributed.initialize` is the only "discovery" step.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
TIME_AXIS = "time"


def distributed_init(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (replaces surreal-kube pod orchestration). On
    single-host this is a no-op; on multi-host pass coordinator address or
    rely on the TPU environment's auto-detection."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    elif coordinator is not None:
        jax.distributed.initialize(coordinator)
    # else: single-process — nothing to do.


def make_mesh(data: int | None = None, model: int = 1, time: int = 1) -> Mesh:
    """Mesh over all addressable devices: data × model × time. `data=None`
    uses every remaining device for the data axis."""
    n = jax.device_count()
    if data is None:
        assert n % (model * time) == 0, (n, model, time)
        data = n // (model * time)
    assert data * model * time == n, f"{data}x{model}x{time} != {n} devices"
    devices = np.asarray(jax.devices()).reshape(data, model, time)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS, TIME_AXIS))


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]
