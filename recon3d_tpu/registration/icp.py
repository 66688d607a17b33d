"""ICP registration: point-to-point, point-to-plane, and Generalized ICP.

Replaces o3d.pipelines.registration.registration_icp
(pointcloud_alignment.py:35-40: threshold 0.02, max 100 iters, relative
fitness/rmse 1e-6) and registration_generalized_icp (test/GICP1.py:99-103).

TPU shape: correspondences are blocked brute-force 1-NN matmuls
(ops.knn.nearest_neighbor), each iteration solves a closed-form alignment
(weighted SVD/Umeyama for p2p; 6x6 Gauss-Newton normal equations for
p2plane/GICP), and the whole optimization runs inside one lax.while_loop
with the reference's convergence criteria — a single XLA program per
registration, vmappable over fragment pairs for the batched pose-graph
pipeline (mini1.py:263-321's python pair loop becomes one program).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from recon3d_tpu.ops import knn as _knn
from recon3d_tpu.registration import se3
from recon3d_tpu.utils.types import PointCloud


class RegistrationResult(NamedTuple):
    transformation: jax.Array  # (4, 4) source -> target
    fitness: jax.Array  # inlier fraction of valid source points
    inlier_rmse: jax.Array
    iterations: jax.Array

    def is_good(self, fitness_min: float = 0.3, rmse_max: float = 0.02):
        """Registration quality gate (test/check6.py:65-76)."""
        return jnp.logical_and(self.fitness >= fitness_min,
                               self.inlier_rmse <= rmse_max)


def _correspondences(src_pts, src_valid, tgt, threshold):
    if src_pts.shape[0] * tgt.points.shape[0] > 1 << 26:
        # large clouds: voxel-binned 1-NN (ops.grid_knn) — exact for
        # matches within `threshold` (cell edge = threshold, so the
        # 27-neighborhood covers the search ball), and matches beyond
        # threshold are rejected below either way
        from recon3d_tpu.ops.grid_knn import grid_nearest_neighbor

        idx, d2 = grid_nearest_neighbor(src_pts, src_valid, tgt.points,
                                        tgt.valid, threshold)
    else:
        idx, d2 = _knn.nearest_neighbor(src_pts, src_valid, tgt.points,
                                        tgt.valid)
    ok = src_valid & (d2 <= threshold * threshold)
    return idx, d2, ok


def _umeyama(src, dst, w):
    """Weighted rigid alignment (Kabsch/Umeyama closed form), w (N,)."""
    ws = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], 0) / ws
    mu_d = jnp.sum(dst * w[:, None], 0) / ws
    S = ((dst - mu_d) * w[:, None]).T @ (src - mu_s) / ws
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * d)
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    T = jnp.eye(4, dtype=src.dtype)
    return T.at[:3, :3].set(R).at[:3, 3].set(t)


def _p2p_step(src_pts, src_valid, tgt, threshold):
    idx, d2, ok = _correspondences(src_pts, src_valid, tgt, threshold)
    w = ok.astype(jnp.float32)
    dT = _umeyama(src_pts, tgt.points[idx], w)
    return dT, w, d2


def _p2plane_step(src_pts, src_valid, tgt, threshold):
    """One Gauss-Newton step on sum w ((R p + t - q) . n)^2, linearized."""
    idx, d2, ok = _correspondences(src_pts, src_valid, tgt, threshold)
    q = tgt.points[idx]
    n = tgt.normals[idx]
    w = ok.astype(jnp.float32)
    r = jnp.sum((src_pts - q) * n, axis=1)  # residuals
    J = jnp.concatenate([n, jnp.cross(src_pts, n)], axis=1)  # (N, 6) [t, omega]
    Jw = J * w[:, None]
    A = Jw.T @ J + 1e-9 * jnp.eye(6, dtype=src_pts.dtype)
    b = Jw.T @ r
    xi = -jnp.linalg.solve(A, b)
    dT = se3.se3_exp(jnp.concatenate([xi[:3], xi[3:]]))
    return dT, w, d2


def _gicp_step(src_pts, src_valid, src_cov, tgt, tgt_cov, threshold,
               R=None):
    """Generalized-ICP step: Mahalanobis plane-to-plane (GICP1.py:99-103).

    R: the CURRENT total rotation estimate (3, 3). The combined covariance
    is C_tgt + R C_src R^T — source covariances were computed in the source
    frame, so they must ride the running rotation (Segal et al. eq. 2;
    skipping this, as round 1 did, biases the Mahalanobis weights whenever
    the total rotation is far from identity even though each STEP is
    small)."""
    idx, d2, ok = _correspondences(src_pts, src_valid, tgt, threshold)
    q = tgt.points[idx]
    Cb = tgt_cov[idx]
    w = ok.astype(jnp.float32)
    if R is not None:
        src_cov = jnp.einsum("ij,njk,lk->nil", R, src_cov, R)
    M = Cb + src_cov
    Minv = jnp.linalg.inv(M + 1e-9 * jnp.eye(3, dtype=src_pts.dtype))
    r = src_pts - q  # (N, 3)
    # J_i = [I | -hat(p)] (3, 6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src_pts.dtype), (src_pts.shape[0], 3, 3))
    Jrot = -se3.hat(src_pts)
    J = jnp.concatenate([eye, Jrot], axis=2)  # (N, 3, 6)
    WJ = Minv @ J  # (N, 3, 6)
    A = jnp.einsum("nij,nik,n->jk", J, WJ, w) + 1e-9 * jnp.eye(6, dtype=src_pts.dtype)
    b = jnp.einsum("nij,ni,n->j", WJ, r, w)
    xi = -jnp.linalg.solve(A, b)
    dT = se3.se3_exp(xi)
    return dT, w, d2


def covariances_for_gicp(pc: PointCloud, k: int = 20, epsilon: float = 1e-3) -> jax.Array:
    """GICP surface covariances: PCA frames with eigenvalues (e, 1, 1)."""
    idx, d2 = _knn.knn(pc.points, pc.valid, k=k)
    nbrs = pc.points[idx]
    ok = (d2 < 1e29).astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(ok, 1), 1.0)
    mean = jnp.sum(nbrs * ok, 1) / cnt
    d = (nbrs - mean[:, None, :]) * ok
    C = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    # replace eigenvalues by (eps, 1, 1) in the PCA frame
    w_eig, V = jnp.linalg.eigh(C)
    lam = jnp.stack([jnp.full_like(w_eig[:, 0], epsilon),
                     jnp.ones_like(w_eig[:, 0]),
                     jnp.ones_like(w_eig[:, 0])], -1)
    return jnp.einsum("nij,nj,nkj->nik", V, lam, V)


@partial(jax.jit, static_argnames=("method", "max_iterations"))
def registration_icp(
    source: PointCloud,
    target: PointCloud,
    threshold: float = 0.02,
    init: Optional[jax.Array] = None,
    method: str = "point_to_point",
    max_iterations: int = 100,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    source_cov: Optional[jax.Array] = None,
    target_cov: Optional[jax.Array] = None,
) -> RegistrationResult:
    """Open3D-compatible ICP. init: (4,4) initial source->target transform.

    method: 'point_to_point' | 'point_to_plane' (target needs normals) |
    'gicp' (pass source_cov/target_cov from covariances_for_gicp).
    """
    T0 = jnp.eye(4, dtype=jnp.float32) if init is None else jnp.asarray(init, jnp.float32)
    n_src = jnp.maximum(jnp.sum(source.valid.astype(jnp.float32)), 1.0)

    def metrics(T):
        pts = se3.apply(T, source.points)
        idx, d2, ok = _correspondences(pts, source.valid, target, threshold)
        w = ok.astype(jnp.float32)
        fitness = jnp.sum(w) / n_src
        rmse = jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0))
        return fitness, rmse

    def step_fn(pts, T):
        if method == "point_to_point":
            return _p2p_step(pts, source.valid, target, threshold)
        if method == "point_to_plane":
            return _p2plane_step(pts, source.valid, target, threshold)
        if method == "gicp":
            return _gicp_step(pts, source.valid, source_cov, target,
                              target_cov, threshold, R=T[:3, :3])
        raise ValueError(f"unknown ICP method {method}")

    def cond(state):
        T, fit, rmse, it, done = state
        return jnp.logical_and(it < max_iterations, ~done)

    def body(state):
        T, fit, rmse, it, _ = state
        pts = se3.apply(T, source.points)
        dT, w, d2 = step_fn(pts, T)
        T_new = dT @ T
        fit_new, rmse_new = metrics(T_new)
        # Open3D convergence: relative change in fitness AND rmse below eps
        rel_fit = jnp.abs(fit_new - fit) / jnp.maximum(fit, 1e-12)
        rel_rmse = jnp.abs(rmse_new - rmse) / jnp.maximum(rmse, 1e-12)
        done = jnp.logical_and(rel_fit < relative_fitness, rel_rmse < relative_rmse)
        return T_new, fit_new, rmse_new, it + 1, done

    fit0, rmse0 = metrics(T0)
    T, fit, rmse, it, _ = jax.lax.while_loop(
        cond, body, (T0, fit0, rmse0, jnp.asarray(0), jnp.asarray(False))
    )
    return RegistrationResult(transformation=T, fitness=fit, inlier_rmse=rmse,
                              iterations=it)


def evaluate_registration(
    source: PointCloud, target: PointCloud, threshold: float,
    transformation: Optional[jax.Array] = None,
) -> RegistrationResult:
    """o3d evaluate_registration: fitness/rmse at a fixed transform."""
    T = jnp.eye(4, dtype=jnp.float32) if transformation is None else jnp.asarray(transformation, jnp.float32)
    pts = se3.apply(T, source.points)
    idx, d2, ok = _correspondences(pts, source.valid, target, threshold)
    w = ok.astype(jnp.float32)
    n_src = jnp.maximum(jnp.sum(source.valid.astype(jnp.float32)), 1.0)
    fitness = jnp.sum(w) / n_src
    rmse = jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0))
    return RegistrationResult(T, fitness, rmse, jnp.asarray(0))


def information_matrix(
    source: PointCloud, target: PointCloud, threshold: float,
    transformation: jax.Array,
) -> jax.Array:
    """o3d get_information_matrix_from_point_clouds (mini1.py:307-313):
    6x6 Gauss-Newton information of the point-to-point objective at T."""
    pts = se3.apply(jnp.asarray(transformation, jnp.float32), source.points)
    idx, d2, ok = _correspondences(pts, source.valid, target, threshold)
    w = ok.astype(jnp.float32)
    q = target.points[idx]
    # J_i (3,6) = [I | -hat(q)] in Open3D's convention (uses target points)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), (pts.shape[0], 3, 3))
    J = jnp.concatenate([eye, -se3.hat(q)], axis=2)
    return jnp.einsum("nij,nik,n->jk", J, J, w)
