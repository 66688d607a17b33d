"""Voxel-grid downsampling with static shapes.

Replaces o3d.t.geometry.PointCloud.voxel_down_sample — the op the reference
offloads to CUDA (pointcloud_capture.py:50, pointcloud_processing.py:27,
test/gpu-performance.py:26-33). Open3D semantics: all points falling in a
voxel are averaged (positions, colors, normals alike).

XLA can't produce data-dependent sizes, so the implementation is
sort + segment-reduce into a fixed-capacity output:
  1. integer voxel coords per point,
  2. lexicographic sort (invalid points sort last),
  3. heads of runs mark unique voxels; prefix-sum gives segment ids,
  4. segment_sum into a capacity-sized buffer; mean = sum / count.
Exact (collision-free, unlike hashing) and one XLA sort + few scatters.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from recon3d_tpu.utils.types import PointCloud


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(
    pc: PointCloud,
    voxel_size: float,
    capacity: Optional[int] = None,
    origin: float = 0.0,
) -> PointCloud:
    """Average points per voxel. capacity defaults to the input capacity
    (output can never have more voxels than points)."""
    N = pc.capacity
    cap = capacity or N
    inv = 1.0 / jnp.float32(voxel_size)
    v = jnp.floor((pc.points - origin) * inv).astype(jnp.int32)
    # push invalid points to the lexicographic end
    SENT = jnp.int32(2 ** 30)
    v = jnp.where(pc.valid[:, None], v, SENT)

    order = jnp.lexsort((v[:, 2], v[:, 1], v[:, 0]))
    vs = v[order]
    valid_s = pc.valid[order]
    prev = jnp.concatenate([jnp.full((1, 3), -SENT, jnp.int32), vs[:-1]], axis=0)
    head = jnp.any(vs != prev, axis=1) & valid_s
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # 0-based voxel id (sorted order)
    # invalid points and voxels beyond capacity go to the overflow bucket
    seg = jnp.where(valid_s & (seg < cap), seg, cap)

    w = valid_s.astype(jnp.float32)[:, None]
    counts = jax.ops.segment_sum(w[:, 0], seg, num_segments=cap + 1)[:cap]
    denom = jnp.maximum(counts, 1.0)[:, None]

    pts = jax.ops.segment_sum(pc.points[order] * w, seg, num_segments=cap + 1)[:cap] / denom
    cols = None
    if pc.colors is not None:
        cols = jax.ops.segment_sum(pc.colors[order] * w, seg, num_segments=cap + 1)[:cap] / denom
    nrm = None
    if pc.normals is not None:
        nrm = jax.ops.segment_sum(pc.normals[order] * w, seg, num_segments=cap + 1)[:cap]
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    return PointCloud(points=pts, valid=counts > 0, colors=cols, normals=nrm)


@partial(jax.jit, static_argnames=())
def voxel_ids(points: jax.Array, valid: jax.Array, voxel_size: float,
              origin: float = 0.0) -> jax.Array:
    """Integer voxel coordinates (N, 3); invalid rows get a sentinel."""
    v = jnp.floor((points - origin) / jnp.float32(voxel_size)).astype(jnp.int32)
    return jnp.where(valid[:, None], v, jnp.int32(2 ** 30))
