"""Device mesh and sharding rules.

The reference is strictly single-device (SURVEY.md §2.3 — no DP/TP/PP/SP/EP
anywhere); multi-chip capability here is new TPU-native surface area:

- ``data`` axis: batch (data parallelism) for front-end training and for
  batched multi-sequence evaluation (BASELINE.json config 5);
- ``model`` axis: tensor parallelism over the feature dimension of the
  SuperPoint/SuperGlue Dense/Conv kernels — XLA GSPMD inserts the
  all-reduces over ICI from the param shardings alone.

Shardings are expressed as ``NamedSharding``/``PartitionSpec`` so the same
jitted train step runs on 1 chip, an 8-device virtual CPU mesh (tests), or
a real pod slice unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """2D ('data', 'model') mesh over the first ``n_devices`` devices.

    The model axis gets the largest factor <= 4 that divides the device
    count (heads=4 in SuperGlue bound the useful TP width); the rest is
    data. 1 device -> (1, 1) mesh, which jit treats as unsharded.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    model = 1
    for cand in (4, 2):
        if n % cand == 0 and n >= cand:
            model = cand
            break
    data = n // model
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_tp_shardable(path_str: str, x: Any, model_size: int) -> bool:
    if not hasattr(x, "shape") or x.ndim < 2:
        return False
    if "kernel" not in path_str:
        return False
    return x.shape[-1] % model_size == 0 and x.shape[-1] >= 2 * model_size


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel shardings: Dense/Conv kernels are sharded over their
    output-feature dimension on the 'model' axis; everything else (biases,
    scalars, norms) is replicated. GSPMD propagates the matching activation
    shardings and inserts collectives."""
    model_size = mesh.shape["model"]

    def rule(path, x):
        path_str = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if model_size > 1 and _is_tp_shardable(path_str, x, model_size):
            spec = [None] * (x.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_shardings(batch, mesh: Mesh):
    """Shard the leading (batch) axis of every array over 'data'."""

    def rule(x):
        return NamedSharding(mesh, P("data"))

    return jax.tree.map(rule, batch)
