"""Mesh construction and sharding helpers.

One logical axis ('data') suffices for this workload: the verifier is a
ResNet-152 (~60M params, ~240 MB f32) that fits comfortably replicated in
each chip's HBM, so data parallelism over ICI is the whole story — the
reference itself never exceeds DataParallel (SURVEY.md section 2.8).
Batches are sharded on 'data'; XLA inserts the psum for gradient
all-reduce when the loss is averaged over the global batch.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a device mesh. Default: every visible device on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place a host batch onto the mesh, sharded along the leading dim."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (e.g. params) across every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
