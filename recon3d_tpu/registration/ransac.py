"""Global registration: RANSAC over FPFH correspondences, and FGR.

Replaces o3d registration_ransac_based_on_feature_matching
(test/mini1.py:271-291: distance threshold 1.5*voxel, ransac_n=4 ... with
edge-length + distance checkers, 4e6 iterations / 0.999 confidence) and
registration_fgr_based_on_feature_matching (test/check8.py:244-258).

TPU shape: the reference's 4M sequential RANSAC trials become a fully
vmapped batch of trials — every trial samples 3 correspondences with a
counter-based PRNG, solves Kabsch in closed form, applies the edge-length
and distance checkers, and scores inliers against a subsampled
correspondence set; one argmax picks the winner. 100k vectorized trials
give the same confidence as Open3D's millions of early-exit trials in a
few matmul-bound milliseconds.

FGR is graduated-non-convexity IRLS on mutual matches (scaled Geman-
McClure, mu halved every 4 sweeps), each sweep a closed 6x6 solve.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from recon3d_tpu.registration import se3
from recon3d_tpu.registration.icp import RegistrationResult, registration_icp
from recon3d_tpu.utils.types import PointCloud


def _kabsch3(src, dst):
    """Rigid transform from a small correspondence set ((n,3),(n,3))."""
    mu_s = jnp.mean(src, 0)
    mu_d = jnp.mean(dst, 0)
    S = (dst - mu_d).T @ (src - mu_s)
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, d]))
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    T = jnp.eye(4, dtype=src.dtype)
    return T.at[:3, :3].set(R).at[:3, 3].set(t)


@partial(jax.jit, static_argnames=("num_trials", "ransac_n", "score_subset"))
def ransac_from_correspondences(
    src_pts: jax.Array,
    tgt_pts: jax.Array,
    corr_ok: jax.Array,
    distance_threshold: float,
    num_trials: int = 65536,
    ransac_n: int = 3,
    edge_length_similarity: float = 0.9,
    score_subset: int = 2048,
    seed: int = 0,
) -> jax.Array:
    """Vectorized RANSAC. src_pts/tgt_pts: (N, 3) corresponding pairs
    (already matched by features); corr_ok: (N,) usable-pair mask.
    Returns the best (4, 4) transform."""
    N = src_pts.shape[0]
    key = jax.random.PRNGKey(seed)
    # sample with probability mass only on valid correspondences
    logits = jnp.where(corr_ok, 0.0, -1e30)
    k_samp, k_score = jax.random.split(key)
    picks = jax.random.categorical(
        k_samp, logits, shape=(num_trials, ransac_n))  # (T, n)
    # scoring subset (fixed size, valid-biased)
    score_idx = jax.random.categorical(k_score, logits, shape=(score_subset,))
    s_sub = src_pts[score_idx]
    t_sub = tgt_pts[score_idx]

    def one_trial(pick):
        s = src_pts[pick]
        t = tgt_pts[pick]
        # edge-length checker (Open3D CorrespondenceCheckerBasedOnEdgeLength)
        ds = jnp.linalg.norm(s[:, None, :] - s[None, :, :], axis=-1)
        dt = jnp.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
        ratio = jnp.minimum(ds, dt) / jnp.maximum(jnp.maximum(ds, dt), 1e-12)
        iu = jnp.triu_indices(ransac_n, 1)
        edges_ok = jnp.all(ratio[iu] > edge_length_similarity)
        T = _kabsch3(s, t)
        err = jnp.linalg.norm(se3.apply(T, s_sub) - t_sub, axis=-1)
        inliers = jnp.sum((err < distance_threshold).astype(jnp.float32))
        return jnp.where(edges_ok, inliers, -1.0), T

    scores, Ts = jax.lax.map(one_trial, picks, batch_size=4096)
    best = jnp.argmax(scores)
    return Ts[best]


def registration_ransac_fpfh(
    source: PointCloud,
    target: PointCloud,
    feat_src: jax.Array,
    feat_tgt: jax.Array,
    distance_threshold: float,
    num_trials: int = 65536,
    mutual: bool = True,
    refine_icp: bool = True,
    seed: int = 0,
) -> RegistrationResult:
    """Feature matching + RANSAC + (optional) ICP refine: the mini1.py
    RANSAC-FPFH -> point-to-plane ICP chain (mini1.py:271-305)."""
    from recon3d_tpu.registration.features import match_features
    from recon3d_tpu.registration.icp import evaluate_registration

    s2t, ok = match_features(feat_src, source.valid, feat_tgt, target.valid,
                             mutual=mutual)
    T = ransac_from_correspondences(
        source.points, target.points[s2t], ok, distance_threshold,
        num_trials=num_trials, seed=seed)
    if refine_icp:
        method = "point_to_plane" if target.normals is not None else "point_to_point"
        return registration_icp(source, target, distance_threshold, init=T,
                                method=method, max_iterations=30)
    return evaluate_registration(source, target, distance_threshold, T)


@partial(jax.jit, static_argnames=("iterations",))
def fgr_core(
    src_pts: jax.Array,
    tgt_pts: jax.Array,
    corr_ok: jax.Array,
    max_corr_distance: float,
    iterations: int = 64,
) -> jax.Array:
    """Fast Global Registration: GNC/IRLS with scaled Geman-McClure.

    src/tgt (N, 3) matched pairs; returns (4, 4). mu starts at the square of
    the working span and halves every 4 sweeps down to the correspondence
    distance (Zhou, Park, Koltun FGR schedule).
    """
    w_valid = corr_ok.astype(jnp.float32)
    mu0 = jnp.float32((max_corr_distance * 16.0) ** 2)
    mu_min = jnp.float32(max_corr_distance ** 2)

    def body(carry, it):
        T, mu = carry
        p = se3.apply(T, src_pts)
        r = p - tgt_pts  # (N, 3)
        r2 = jnp.sum(r * r, -1)
        w = w_valid * (mu / (mu + r2)) ** 2  # GM weights
        # linearized p2p solve: J_i = [I | -hat(p_i)]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (p.shape[0], 3, 3))
        J = jnp.concatenate([eye, -se3.hat(p)], axis=2)  # (N, 3, 6)
        A = jnp.einsum("nij,nik,n->jk", J, J, w) + 1e-8 * jnp.eye(6)
        b = jnp.einsum("nij,ni,n->j", J, r, w)
        xi = -jnp.linalg.solve(A, b)
        T_new = se3.se3_exp(xi) @ T
        mu_new = jnp.where((it + 1) % 4 == 0, jnp.maximum(mu * 0.5, mu_min), mu)
        return (T_new, mu_new), None

    (T, _), _ = jax.lax.scan(body, (jnp.eye(4, dtype=jnp.float32), mu0),
                             jnp.arange(iterations))
    return T


def registration_fgr_fpfh(
    source: PointCloud,
    target: PointCloud,
    feat_src: jax.Array,
    feat_tgt: jax.Array,
    max_corr_distance: float,
) -> RegistrationResult:
    """o3d registration_fgr_based_on_feature_matching (check8.py:244-258)."""
    from recon3d_tpu.registration.features import match_features
    from recon3d_tpu.registration.icp import evaluate_registration

    s2t, ok = match_features(feat_src, source.valid, feat_tgt, target.valid,
                             mutual=True)
    T = fgr_core(source.points, target.points[s2t], ok, max_corr_distance)
    return evaluate_registration(source, target, max_corr_distance, T)


def multiscale_icp(
    source: PointCloud,
    target: PointCloud,
    voxel_sizes,
    iterations,
    init: Optional[jax.Array] = None,
    method: str = "point_to_plane",
) -> RegistrationResult:
    """Coarse-to-fine ICP (check8.py:255-274: scales 15x/5x/1.5x voxel with
    30/20/10 iterations)."""
    from recon3d_tpu.pointcloud.normals import estimate_normals
    from recon3d_tpu.pointcloud.voxel import voxel_downsample

    T = jnp.eye(4, dtype=jnp.float32) if init is None else jnp.asarray(init, jnp.float32)
    result = None
    for vs, iters in zip(voxel_sizes, iterations):
        src = voxel_downsample(source, vs)
        tgt = voxel_downsample(target, vs)
        if method == "point_to_plane":
            tgt = estimate_normals(tgt, radius=vs * 2.0, max_nn=30)
        result = registration_icp(src, tgt, threshold=vs * 1.5, init=T,
                                  method=method, max_iterations=iters)
        T = result.transformation
    return result
