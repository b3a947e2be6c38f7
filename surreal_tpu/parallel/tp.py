"""Tensor parallelism over the `model` mesh axis.

The reference has NO tensor parallelism (its nets are 2-4 layer MLPs on one
GPU); SURVEY.md §2D asks for the axis anyway for API completeness. Design:
GSPMD-style — Dense kernels get NamedShardings alternating column-/row-
parallel over MODEL_AXIS, and XLA inserts the reduction collectives when
the jitted forward/backward consumes them. For reference-scale nets this is
a correctness feature, not a speedup (documented); it composes with the
data axis because parameter shardings and shard_map data axes are
orthogonal mesh dimensions.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surreal_tpu.parallel.mesh import MODEL_AXIS


def _path_keys(path) -> tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def tp_kernel_specs(params, axis_size: int) -> dict:
    """{dict-key path -> PartitionSpec} for every 2-D Dense kernel in a
    flax param tree, alternating column-/row-parallel over MODEL_AXIS.
    Keyed by path so Adam moments (which mirror the params tree deeper
    inside the optimizer state) pick up the SAME spec by suffix match."""
    specs = {}
    col = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = _path_keys(path)
        if keys and keys[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2:
            spec = None
            if axis_size > 1:
                if col and leaf.shape[1] % axis_size == 0:
                    spec, col = P(None, MODEL_AXIS), False
                elif not col and leaf.shape[0] % axis_size == 0:
                    spec, col = P(MODEL_AXIS, None), True
            if spec is not None:
                specs[keys] = spec
    return specs


def tp_tree_sharding(mesh: Mesh, tree, kernel_specs: dict):
    """NamedSharding pytree for ANY tree containing params-shaped subtrees
    (params themselves, Adam mu/nu): leaves whose dict-key path ends with a
    known kernel path get that kernel's TP spec; everything else replicates."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        keys = _path_keys(path)
        spec = P()
        if getattr(leaf, "ndim", 0) == 2:
            for kpath, s in kernel_specs.items():
                if len(keys) >= len(kpath) and keys[-len(kpath):] == kpath:
                    spec = s
                    break
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params_tp(mesh: Mesh, params):
    """Apply alternating column/row-parallel shardings to Dense kernels
    (flax param tree). Biases and non-matrix params stay replicated.
    Layers whose dims don't divide the axis size stay replicated too."""
    axis_size = mesh.shape[MODEL_AXIS]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    col = True  # alternate column-parallel (shard outputs) / row-parallel
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_kernel = names and names[-1] == "kernel" and leaf.ndim == 2
        spec = P()
        if is_kernel and axis_size > 1:
            if col and leaf.shape[1] % axis_size == 0:
                spec = P(None, MODEL_AXIS)
                col = False
            elif not col and leaf.shape[0] % axis_size == 0:
                spec = P(MODEL_AXIS, None)
                col = True
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
