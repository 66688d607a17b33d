"""Normal estimation: k-NN PCA + orientation.

Replaces o3d.t.geometry estimate_normals (CUDA k-NN PCA,
normal_estimation.py:19-20) and the two orientation modes the reference
uses: camera-location orientation and orient_normals_consistent_tangent_plane
(normal_estimation.py:21). The covariance eigen-solve is a closed-form
analytic 3x3 symmetric eigenvector (vmapped; no LAPACK in the hot path);
consistent orientation is a parallel label-propagation sweep over the k-NN
graph instead of Open3D's sequential MST walk.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from recon3d_tpu.ops import knn as _knn
from recon3d_tpu.utils.types import PointCloud


def _smallest_eigvec_3x3(C: jax.Array) -> jax.Array:
    """Eigenvector of the smallest eigenvalue of a symmetric 3x3 (batched ...x3x3).

    Analytic eigenvalues (trigonometric form), then the null-space direction
    via the largest cross product of rows of (C - lam I) — numerically robust
    for the well-separated planar case and safe under degeneracy.
    """
    C = jnp.asarray(C, jnp.float32)
    q = jnp.trace(C, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=C.dtype)
    B = C - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = detB / (2.0 * p ** 3 + 1e-30)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: q + 2p cos(phi + 2k pi/3); smallest at k=1 (phi + 2pi/3... )
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    A = C - lam_min[..., None, None] * I
    r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.stack([c01, c02, c12], axis=-2)
    which = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
    v = jnp.take_along_axis(best, which[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # fully degenerate (isotropic) neighborhoods: fall back to +z
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], C.dtype), v.shape)
    return jnp.where(norm > 1e-12, v / jnp.maximum(norm, 1e-12), fallback)


def _eig6_channels(xx, yy, zz, xy, xz, yz):
    """Channelwise smallest-eigenvector solve on 6 covariance component
    arrays of ANY (matching) shape. Returns (vx, vy, vz) unit components
    with the degenerate fallback (0, 0, 1). Shared by the (N,)-vector
    point-space path below and the Pallas normals kernel, which runs it on
    (C, G*G) accumulator planes inside VMEM (grid_knn_pallas)."""
    q = (xx + yy + zz) / 3.0
    bxx, byy, bzz = xx - q, yy - q, zz - q
    p2 = (bxx * bxx + byy * byy + bzz * bzz
          + 2.0 * (xy * xy + xz * xz + yz * yz)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = (bxx * (byy * bzz - yz * yz)
            - xy * (xy * bzz - yz * xz)
            + xz * (xy * yz - byy * xz))
    # smallest eigenvalue via safeguarded Newton on the NORMALIZED
    # characteristic cubic mu^3 - 3 mu - d = 0 (mu = (lam - q)/p, so all
    # quantities are O(1) regardless of covariance scale; d in [-2, 2]).
    # The closed trigonometric form (mu = 2 cos(arccos(d/2)/3 + 2pi/3))
    # needs acos, which Mosaic has no TPU lowering for — this runs inside
    # the fused Pallas normals kernel. From mu0 = -2 (below the smallest
    # root, which lies in [-2, -1]) Newton on the locally concave
    # increasing branch converges monotonically from the left;
    # quadratically for simple roots, and the clip bounds the
    # double-root (line-degenerate) case that the fallback below
    # handles anyway.
    d = jnp.clip(detB / jnp.maximum(p * p * p, 1e-30), -2.0, 2.0)
    # 12 iterations: min |cos| vs LAPACK eigenvectors 0.99998 over 5k
    # random PSD samples (8 iters leaves near-double-root stragglers)
    mu = jnp.full_like(d, -2.0)
    for _ in range(12):
        f = mu * (mu * mu - 3.0) - d
        fp = 3.0 * (mu * mu - 1.0)
        mu = jnp.clip(mu - f / jnp.maximum(fp, 1e-12), -2.0, -1.0)
    lam = q + p * mu

    axx, ayy, azz = xx - lam, yy - lam, zz - lam
    # rows of (C - lam I): r0=(axx,xy,xz) r1=(xy,ayy,yz) r2=(xz,yz,azz)
    c01 = (xy * yz - xz * ayy, xz * xy - axx * yz, axx * ayy - xy * xy)
    c02 = (xy * azz - xz * yz, xz * xz - axx * azz, axx * yz - xy * xz)
    c12 = (ayy * azz - yz * yz, yz * xz - xy * azz, xy * yz - ayy * xz)
    n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
    n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
    n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2
    use02 = n02 > n01
    best0 = jnp.maximum(n01, n02)
    use12 = n12 > best0
    vx = jnp.where(use12, c12[0], jnp.where(use02, c02[0], c01[0]))
    vy = jnp.where(use12, c12[1], jnp.where(use02, c02[1], c01[1]))
    vz = jnp.where(use12, c12[2], jnp.where(use02, c02[2], c01[2]))
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    ok = norm > 1e-12
    inv = 1.0 / jnp.maximum(norm, 1e-12)
    return (jnp.where(ok, vx * inv, 0.0),
            jnp.where(ok, vy * inv, 0.0),
            jnp.where(ok, vz * inv, 1.0))


def _smallest_eigvec_cov6(cov6: jax.Array) -> jax.Array:
    """Channelwise twin of _smallest_eigvec_3x3 for (N, 6) covariances
    [xx, yy, zz, xy, xz, yz]: every quantity stays an (N,) vector, so there
    are no (N, 3, 3) layout reshuffles, stacks or take_along_axis gathers
    on the 1M-point path (those cost more than the eigen-solve itself)."""
    vx, vy, vz = _eig6_channels(cov6[:, 0], cov6[:, 1], cov6[:, 2],
                                cov6[:, 3], cov6[:, 4], cov6[:, 5])
    return jnp.stack([vx, vy, vz], -1)


def _grid_normals_pallas(points, valid, radius, grid_size, cell_capacity,
                         interpret: bool = False, pack: str = "auto"):
    """TPU large-N normals: packed binning straight into the fused
    moments+eigen-solve Pallas kernel (grid_knn_pallas.normals_pallas_core
    — covariance normalization and the channelwise eigen-solve run on
    VMEM-resident planes), then only the 3 normal channels are gathered
    back per point. The earlier slot-table + XLA slot-space eig route
    spent ~120 ms more at 1M points in binning gathers and the extra
    moment round-trips through HBM."""
    from recon3d_tpu.ops import grid_knn as gk
    from recon3d_tpu.ops.grid_knn_pallas import (_pick_pack,
                                                 normals_pallas_core,
                                                 packed_chan_readback)

    p = jnp.asarray(points, jnp.float32)
    G, C = grid_size, cell_capacity
    gz = gk._lane_stride(G)
    pk, point_slot, _ = _pick_pack(pack, interpret)(p, valid, radius, G, C)
    out = normals_pallas_core(pk, radius * radius, G, C, interpret, gz=gz)
    # packed (G, 4C, GG) rows [nx, ny, nz, cnt]; per-point readback of the
    # 3 normal channels via the shared packed-slot gather
    chan, has = packed_chan_readback(out, point_slot, G, C, gz, 4)
    fallback = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    v = jnp.stack([chan(0), chan(1), chan(2)], -1)
    return jnp.where(has[:, None], v, fallback)


@partial(jax.jit, static_argnames=("max_nn", "grid_size", "cell_capacity"))
def _normals_only(points, valid, radius, max_nn, grid_size, cell_capacity):
    """The jitted core of estimate_normals: returns ONLY the (N, 3)
    normals. Keeping points/valid out of the output pytree avoids the
    input->output passthrough copies a whole-PointCloud jit pays on every
    call (~20 ms at 1M points on the axon TPU backend)."""
    N = points.shape[0]
    if N > 32768:
        # moment-accumulation path: neighborhoods within `radius` are
        # folded directly into count/mean/covariance — no neighbor index
        # lists, so 1M+ points fit comfortably on-chip. Includes the query
        # point itself (Open3D's KNN does too); grid coverage is
        # grid_size * radius per axis from the cloud's min corner. On TPU
        # the Pallas slab kernel runs (VMEM-resident accumulation); the
        # XLA roll/einsum twin covers other backends.
        if jax.default_backend() == "tpu":
            return _grid_normals_pallas(points, valid, radius,
                                        grid_size, cell_capacity)
        from recon3d_tpu.ops.grid_knn import grid_pca_moments

        C = grid_pca_moments(points, valid, radius,
                             grid_size=grid_size,
                             cell_capacity=cell_capacity)[2]
        cov6 = jnp.stack([C[:, 0, 0], C[:, 1, 1], C[:, 2, 2],
                          C[:, 0, 1], C[:, 0, 2], C[:, 1, 2]], -1)
        return _smallest_eigvec_cov6(cov6)
    idx, d2, ok = _knn.hybrid_knn(points, valid, radius, max_nn=max_nn)
    nbrs = points[idx]  # (N, K, 3)
    w = ok.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nbrs * w, axis=1) / cnt
    d = (nbrs - mean[:, None, :]) * w
    C = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    return _smallest_eigvec_3x3(C)


def estimate_normals(
    pc: PointCloud,
    radius: float = 0.05,
    max_nn: int = 50,
    grid_size: int = 128,
    cell_capacity: int = 8,
) -> PointCloud:
    """Hybrid-search PCA normals (normal_estimation.py:20 semantics:
    max_nn=50, radius=0.05).

    Above 32k points the O(N^2) brute-force kNN switches to the voxel-
    binned moments path — exact for neighbors within `radius`, which is
    all the hybrid search keeps anyway. On TPU that path is the fused
    Pallas moments+eigen-solve kernel (ops.grid_knn_pallas /
    _grid_normals_pallas); with a data-sized grid (52 cells cover a unit
    cube at radius 0.02) 1M points measured 89 ms on one v5e
    (bench.py `normals_1m_ms`; the reference's CUDA path is
    normal_estimation.py:19-21). Traceable inside outer jits; as a
    top-level call only the normals cross the device boundary."""
    normals = _normals_only(pc.points, pc.valid, radius, max_nn,
                            grid_size, cell_capacity)
    return dataclasses.replace(pc, normals=normals)


@jax.jit
def orient_normals_towards_camera(
    pc: PointCloud, camera_location: jax.Array = jnp.zeros(3)
) -> PointCloud:
    """Flip normals to face the camera (o3d orient_normals_towards_camera_location)."""
    view = camera_location[None, :] - pc.points
    flip = jnp.sum(pc.normals * view, axis=1) < 0
    normals = jnp.where(flip[:, None], -pc.normals, pc.normals)
    return dataclasses.replace(pc, normals=normals)


@partial(jax.jit, static_argnames=("k", "iterations"))
def orient_normals_consistent(
    pc: PointCloud,
    k: int = 10,
    iterations: int = 30,
) -> PointCloud:
    """Consistent tangent-plane orientation (normal_estimation.py:21).

    Open3D walks a Riemannian MST sequentially; here orientation spreads by
    synchronous majority propagation over the k-NN graph: starting from the
    extremal point oriented outward, each sweep flips a point to agree with
    the weighted majority of its already-confident neighbors. Converges to
    the MST labeling on smooth manifolds in O(graph diameter) sweeps.
    """
    idx, d2 = _knn.knn(pc.points, pc.valid, k=k)
    w = jnp.exp(-d2 / jnp.maximum(jnp.mean(jnp.where(d2 < 1e29, d2, 0.0)), 1e-12))
    # seed: the point with max z, oriented +z
    z = jnp.where(pc.valid, pc.points[:, 2], -jnp.inf)
    seed = jnp.argmax(z)
    n0 = pc.normals
    sign0 = jnp.ones(pc.capacity, jnp.float32)
    sign0 = sign0.at[seed].set(jnp.where(n0[seed, 2] < 0, -1.0, 1.0))
    conf0 = jnp.zeros(pc.capacity, jnp.float32).at[seed].set(1.0)

    dots = jnp.einsum("ni,nki->nk", n0, n0[idx])  # alignment with neighbors

    def body(_, state):
        sign, conf = state
        # weighted vote from neighbors: neighbor sign * dot orientation
        vote = jnp.sum(w * conf[idx] * sign[idx] * jnp.sign(dots), axis=1)
        has_vote = jnp.abs(vote) > 1e-12
        new_sign = jnp.where(has_vote, jnp.sign(vote), sign)
        new_conf = jnp.maximum(conf, has_vote.astype(jnp.float32))
        # seed stays pinned
        new_sign = new_sign.at[seed].set(sign0[seed])
        new_conf = new_conf.at[seed].set(1.0)
        return new_sign, new_conf

    sign, _ = jax.lax.fori_loop(0, iterations, body, (sign0, conf0))
    return dataclasses.replace(pc, normals=pc.normals * sign[:, None])
