"""FPFH features and feature-space matching.

Replaces o3d.pipelines.registration.compute_fpfh_feature (test/mini1.py:244-251)
and the feature-matching front end of RANSAC/FGR registration. The classic
33-bin FPFH: per-point SPFH from Darboux-frame angles (alpha, phi, theta)
binned 11 ways each, then neighbor-distance-weighted aggregation.

Histogramming is one-hot masked sums over the neighbor axis (no scatters),
and feature matching is a blocked matmul argmin in 33-D — both MXU/VPU
shaped. Needs normals (estimate first).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from recon3d_tpu.ops import knn as _knn
from recon3d_tpu.utils.types import PointCloud

N_BINS = 11


def _spfh(points, normals, idx, ok):
    """Per-point SPFH histograms (N, 33) from neighbor lists (N, K)."""
    p = points[:, None, :]  # (N, 1, 3)
    q = points[idx]  # (N, K, 3)
    nq = normals[idx]
    npt = normals[:, None, :]
    d = q - p
    dist = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(dist[..., None], 1e-12)

    u = jnp.broadcast_to(npt, d.shape)
    v = jnp.cross(dn, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * nq, -1)  # [-1, 1]
    phi = jnp.sum(u * dn, -1)  # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * nq, -1), jnp.sum(u * nq, -1))  # [-pi, pi]

    def hist(vals, lo, hi):
        bins = jnp.clip(((vals - lo) / (hi - lo) * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
        onehot = bins[..., None] == jnp.arange(N_BINS)  # (N, K, 11)
        return jnp.sum(onehot * ok[..., None], axis=1).astype(jnp.float32)

    h = jnp.concatenate([
        hist(alpha, -1.0, 1.0),
        hist(phi, -1.0, 1.0),
        hist(theta, -jnp.pi, jnp.pi),
    ], axis=-1)  # (N, 33)
    cnt = jnp.maximum(jnp.sum(ok, axis=1, keepdims=True).astype(jnp.float32), 1.0)
    return h * (100.0 / cnt), dist


@partial(jax.jit, static_argnames=("max_nn",))
def compute_fpfh(
    pc: PointCloud,
    radius: float = 0.05,
    max_nn: int = 100,
) -> jax.Array:
    """FPFH (N, 33). Mirrors o3d compute_fpfh_feature(radius, max_nn)
    (mini1.py:244-251 uses radius=5*voxel, max_nn=100)."""
    idx, d2, ok = _knn.hybrid_knn(pc.points, pc.valid, radius, max_nn=max_nn)
    okf = ok & pc.valid[:, None] & pc.valid[idx]
    spfh, dist = _spfh(pc.points, pc.normals, idx, okf)
    # FPFH(p) = SPFH(p) + 1/k sum_q SPFH(q) / ||p - q||
    wgt = jnp.where(okf, 1.0 / jnp.maximum(dist, 1e-6), 0.0)  # (N, K)
    k = jnp.maximum(jnp.sum(okf, axis=1, keepdims=True).astype(jnp.float32), 1.0)
    nbr_sum = jnp.einsum("nk,nkf->nf", wgt, spfh[idx])
    fpfh = spfh + nbr_sum / k
    return jnp.where(pc.valid[:, None], fpfh, 0.0)


@partial(jax.jit, static_argnames=("tile", "mutual"))
def match_features(
    feat_src: jax.Array,
    src_valid: jax.Array,
    feat_tgt: jax.Array,
    tgt_valid: jax.Array,
    mutual: bool = True,
    tile: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Nearest-neighbor matches in feature space.

    Returns (tgt_index_per_src (N,), match_ok (N,) mask). mutual=True keeps
    only cross-checked pairs (the FGR front end; also Open3D's
    mutual_filter for RANSAC).
    """
    s2t, _ = _knn.nearest_neighbor(feat_src, src_valid, feat_tgt, tgt_valid, tile=tile)
    ok = src_valid
    if mutual:
        t2s, _ = _knn.nearest_neighbor(feat_tgt, tgt_valid, feat_src, src_valid, tile=tile)
        back = t2s[s2t]
        ok = ok & (back == jnp.arange(feat_src.shape[0]))
    return s2t, ok
