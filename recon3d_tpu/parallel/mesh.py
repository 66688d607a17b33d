"""Device mesh construction and sharding helpers.

The reference has no multi-device anything (SURVEY.md section 2.5); its
parallelism is host threads. Here scaling is native: frames / fragments /
registration pairs shard over a `jax.sharding.Mesh` axis ("frame" — data
parallel) via the shard_map programs in parallel.batch; make_mesh also
builds 2-D layouts for callers that want an additional axis.

Collectives ride ICI via XLA (psum/all_gather inserted by pjit/shard_map);
nothing here talks NCCL/MPI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("frame",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n devices. 1-D ("frame") by default;
    pass shape+axis_names for 2-D ("frame", "row") layouts."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def frame_sharding(mesh: Mesh, ndim: int, axis: str = "frame") -> NamedSharding:
    """Shard the leading (frame/batch) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_frames(mesh: Mesh, tree, axis: str = "frame"):
    """Device-put every array in the pytree with its leading axis sharded."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, frame_sharding(mesh, a.ndim, axis)), tree
    )
