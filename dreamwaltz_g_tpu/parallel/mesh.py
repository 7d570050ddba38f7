"""Device mesh and sharding helpers.

The reference is single-GPU (configs/__init__.py:520); the TPU build adds
data-parallelism over camera views/prompts as a first-class axis
(SURVEY.md §5, §7.10): SDS batches shard cleanly over views, model state is
replicated, gradients are psum-reduced over ICI by XLA.

Use ``make_mesh(dp=-1)`` for all devices, then ``shard_batch`` / ``replicate``
to place pytrees before a pjit-ed step.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int = -1, axis_name: str = DATA_AXIS, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp == -1:
        dp = len(devices)
    return Mesh(np.asarray(devices[:dp]).reshape(dp), (axis_name,))


def make_mesh_2d(dp: int = -1, tp: int = 1, devices=None,
                 data_axis: str = DATA_AXIS,
                 model_axis: str = MODEL_AXIS) -> Mesh:
    """(data, model) mesh: views shard over ``data``, the guidance
    transformer shards over ``model`` (parallel/tp.py). The model axis is
    minor (contiguous device ids) so its all-reduces ride nearest-neighbor
    ICI links."""
    devices = devices if devices is not None else jax.devices()
    if dp == -1:
        dp = len(devices) // tp
    return Mesh(np.asarray(devices[:dp * tp]).reshape(dp, tp),
                (data_axis, model_axis))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every leaf with its leading dim split over the data axis."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(global_batch: int, mesh: Mesh, axis_name: str = DATA_AXIS) -> int:
    n = mesh.shape[axis_name]
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by mesh axis {axis_name}={n}"
    )
    return global_batch // n
