"""Nearest-neighbor search over masked point sets.

Replaces Open3D's KD-trees (KDTreeSearchParamHybrid at
pointcloud_alignment.py:27, normal_estimation.py:20). KD-trees are
pointer-chasing structures hostile to TPUs; instead:

- `knn`: exact k-NN by blocked brute force — pairwise distances computed as
  a matmul (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b, MXU-shaped), queries processed
  in tiles with lax.map so memory stays O(tile x N), top-k per tile.
- `radius_count` / `radius_neighbors`: same blocking for range queries.

The large-N path (voxel-binned `grid_knn` / `grid_nearest_neighbor`,
O(N * 27 * bucket) instead of O(N^2)) lives in ops.grid_knn; normals and
ICP correspondences switch to it automatically above a size threshold.

All functions take (N, 3) points + validity mask; invalid points neither
match nor query (their results are masked).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e30)  # numpy: no device op at import time


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=fill)


@partial(jax.jit, static_argnames=("k", "tile"))
def knn(
    points: jax.Array,
    valid: jax.Array,
    k: int = 30,
    tile: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN (excluding self): returns (indices (N, k), sq_dists (N, k)).

    Invalid neighbors are excluded; invalid queries get index 0 / dist BIG.
    """
    p = jnp.asarray(points, jnp.float32)
    N = p.shape[0]
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    pq = _pad_to(p, Np, 0.0)
    vq = _pad_to(valid, Np, False)
    sq_norms = jnp.sum(p * p, axis=1)  # (N,)
    inval_col = jnp.where(valid, 0.0, BIG)  # mask invalid DB points

    def one_tile(i):
        q = jax.lax.dynamic_slice_in_dim(pq, i * tile, tile)  # (T, 3)
        qn = jnp.sum(q * q, axis=1, keepdims=True)  # (T, 1)
        d2 = qn + sq_norms[None, :] - 2.0 * (q @ p.T)  # (T, N)
        d2 = d2 + inval_col[None, :]
        # exclude self-match by index
        rows = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, N), 1)
        d2 = jnp.where(rows == cols, BIG, d2)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx, -neg

    idxs, d2s = jax.lax.map(one_tile, jnp.arange(n_tiles))
    idxs = idxs.reshape(Np, k)[:N]
    d2s = d2s.reshape(Np, k)[:N]
    d2s = jnp.maximum(d2s, 0.0)
    return idxs, jnp.where(valid[:, None], d2s, BIG)


@partial(jax.jit, static_argnames=("tile",))
def radius_count(
    points: jax.Array,
    valid: jax.Array,
    radius: float,
    tile: int = 1024,
) -> jax.Array:
    """Number of (valid) neighbors within `radius` of each point, excl. self."""
    p = jnp.asarray(points, jnp.float32)
    N = p.shape[0]
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    pq = _pad_to(p, Np, 0.0)
    sq_norms = jnp.sum(p * p, axis=1)
    inval_col = jnp.where(valid, 0.0, BIG)
    r2 = jnp.float32(radius * radius)

    def one_tile(i):
        q = jax.lax.dynamic_slice_in_dim(pq, i * tile, tile)
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        d2 = qn + sq_norms[None, :] - 2.0 * (q @ p.T) + inval_col[None, :]
        rows = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, N), 1)
        d2 = jnp.where(rows == cols, BIG, d2)
        return jnp.sum((d2 <= r2).astype(jnp.int32), axis=1)

    counts = jax.lax.map(one_tile, jnp.arange(n_tiles)).reshape(Np)[:N]
    return jnp.where(valid, counts, 0)


@partial(jax.jit, static_argnames=("tile",))
def nearest_neighbor(
    query: jax.Array,
    query_valid: jax.Array,
    db: jax.Array,
    db_valid: jax.Array,
    tile: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-set 1-NN: for each query point, its nearest valid db point.

    Returns (indices (Nq,), sq_dists (Nq,)). The correspondence kernel for
    ICP (pointcloud_alignment.py:35-40's inner loop, done as blocked matmuls).
    """
    q = jnp.asarray(query, jnp.float32)
    p = jnp.asarray(db, jnp.float32)
    Nq = q.shape[0]
    n_tiles = -(-Nq // tile)
    Np = n_tiles * tile
    qp = _pad_to(q, Np, 0.0)
    sq_norms = jnp.sum(p * p, axis=1)
    inval_col = jnp.where(db_valid, 0.0, BIG)

    def one_tile(i):
        qt = jax.lax.dynamic_slice_in_dim(qp, i * tile, tile)
        qn = jnp.sum(qt * qt, axis=1, keepdims=True)
        d2 = qn + sq_norms[None, :] - 2.0 * (qt @ p.T) + inval_col[None, :]
        return jnp.argmin(d2, axis=1).astype(jnp.int32), jnp.min(d2, axis=1)

    idxs, d2s = jax.lax.map(one_tile, jnp.arange(n_tiles))
    idxs = idxs.reshape(Np)[:Nq]
    d2s = jnp.maximum(d2s.reshape(Np)[:Nq], 0.0)
    return idxs, jnp.where(query_valid, d2s, BIG)


@partial(jax.jit, static_argnames=("k", "max_nn", "tile"))
def hybrid_knn(
    points: jax.Array,
    valid: jax.Array,
    radius: float,
    max_nn: int = 30,
    k: int = None,
    tile: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Open3D KDTreeSearchParamHybrid: up to max_nn nearest neighbors within
    `radius`. Returns (indices (N, max_nn), sq_dists, neighbor_valid mask)."""
    idx, d2 = knn(points, valid, k=max_nn, tile=tile)
    ok = d2 <= jnp.float32(radius * radius)
    return idx, d2, ok
