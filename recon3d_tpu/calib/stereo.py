"""Stereo calibration, rectification, and the disparity-to-depth geometry.

Re-implements the OpenCV trio the reference drives at calib3_2.py:181-196:

  stereo_calibrate   — cv2.stereoCalibrate(CALIB_FIX_INTRINSIC): joint LM
                       over the rig transform + per-view board poses.
  stereo_rectify     — cv2.stereoRectify(CALIB_ZERO_DISPARITY): half-rotation
                       split, baseline-aligned global rotation, shared new
                       focal, corner-averaged principal points, P1/P2/Q.
  rectify_maps       — cv2.initUndistortRectifyMap in float32 (the CV_16SC2
                       fixed-point encoding at depth4.py:125-149 is a storage
                       detail; we keep float maps for TPU remap).

The E/F matrices follow the standard closed forms E = [T]x R, F = K2^-T E K1^-1.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from recon3d_tpu.calib import lm as _lm
from recon3d_tpu.calib import model as _m
from recon3d_tpu.calib import mono as _mono


def _skew(v: jax.Array) -> jax.Array:
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ], v.dtype)


def _compose(rvec_a, tvec_a, rvec_b, tvec_b):
    """Pose composition: (R_a, t_a) applied after (R_b, t_b)."""
    Ra, Rb = _m.rodrigues(rvec_a), _m.rodrigues(rvec_b)
    R = Ra @ Rb
    t = Ra @ tvec_b + tvec_a
    return _m.inv_rodrigues(R), t


class StereoCalibrationResult(NamedTuple):
    rms: jax.Array
    R: jax.Array  # (3,3) right-from-left rotation
    T: jax.Array  # (3,) translation
    E: jax.Array
    F: jax.Array
    per_view_errors: jax.Array  # (V, 2) mean px error (left, right)


def stereo_calibrate(
    obj_points: jax.Array,
    img_points_l: jax.Array,
    img_points_r: jax.Array,
    K1: jax.Array, dist1, K2: jax.Array, dist2,
    max_iterations: int = 60,
) -> StereoCalibrationResult:
    """cv2.stereoCalibrate with CALIB_FIX_INTRINSIC (calib3_2.py:181-188).

    obj_points (V,N,3), img_points_* (V,N,2). Intrinsics are fixed; the LM
    optimizes [rvec_rig, tvec_rig, (rvec_i, tvec_i)_views] against both
    cameras' reprojection residuals.
    """
    obj_points = jnp.asarray(obj_points)
    img_l = jnp.asarray(img_points_l)
    img_r = jnp.asarray(img_points_r)
    V = obj_points.shape[0]
    K1 = jnp.asarray(K1, obj_points.dtype)
    K2 = jnp.asarray(K2, obj_points.dtype)

    # init: per-view PnP in each camera, rig = median relative pose
    rv_l, tv_l = jax.vmap(lambda o, i: _mono.solve_pnp(o, i, K1, dist1))(obj_points, img_l)
    rv_r, tv_r = jax.vmap(lambda o, i: _mono.solve_pnp(o, i, K2, dist2))(obj_points, img_r)

    def rel_pose(rl, tl, rr, tr):
        Rl, Rr = _m.rodrigues(rl), _m.rodrigues(rr)
        R = Rr @ Rl.T
        t = tr - R @ tl
        return _m.inv_rodrigues(R), t

    rv_rel, tv_rel = jax.vmap(rel_pose)(rv_l, tv_l, rv_r, tv_r)
    # average rotations via the chordal mean (SVD of summed matrices)
    Ms = jax.vmap(_m.rodrigues)(rv_rel)
    U, _, Vt = jnp.linalg.svd(jnp.sum(Ms, 0))
    R0 = U @ Vt
    R0 = R0 * jnp.sign(jnp.linalg.det(R0))
    rvec0 = _m.inv_rodrigues(R0)
    tvec0 = jnp.mean(tv_rel, 0)

    x0 = jnp.concatenate([rvec0, tvec0, rv_l.ravel(), tv_l.ravel()])

    def unpack(x):
        rig_r, rig_t = x[:3], x[3:6]
        rv = x[6:6 + 3 * V].reshape(V, 3)
        tv = x[6 + 3 * V:].reshape(V, 3)
        return rig_r, rig_t, rv, tv

    def residual(x):
        rig_r, rig_t, rv, tv = unpack(x)
        proj_l = jax.vmap(lambda o, r, t: _m.project_points(o, r, t, K1, dist1))(obj_points, rv, tv)
        rr, tr = jax.vmap(lambda r, t: _compose(rig_r, rig_t, r, t))(rv, tv)
        proj_r = jax.vmap(lambda o, r, t: _m.project_points(o, r, t, K2, dist2))(obj_points, rr, tr)
        return jnp.concatenate([(proj_l - img_l).ravel(), (proj_r - img_r).ravel()])

    res = _lm.levenberg_marquardt(residual, x0, max_iterations=max_iterations)
    rig_r, rig_t, rv, tv = unpack(res.x)
    R = _m.rodrigues(rig_r)
    T = rig_t

    E = _skew(T) @ R
    F = jnp.linalg.inv(K2).T @ E @ jnp.linalg.inv(K1)
    F = F / jnp.where(jnp.abs(F[2, 2]) > 1e-12, F[2, 2], 1.0)

    proj_l = jax.vmap(lambda o, r, t: _m.project_points(o, r, t, K1, dist1))(obj_points, rv, tv)
    rr, tr = jax.vmap(lambda r, t: _compose(rig_r, rig_t, r, t))(rv, tv)
    proj_r = jax.vmap(lambda o, r, t: _m.project_points(o, r, t, K2, dist2))(obj_points, rr, tr)
    err_l = jnp.mean(jnp.linalg.norm(proj_l - img_l, axis=-1), 1)
    err_r = jnp.mean(jnp.linalg.norm(proj_r - img_r, axis=-1), 1)
    n_res = 2 * V * obj_points.shape[1] * 2
    rms = jnp.sqrt(2.0 * res.cost / (n_res / 2))
    return StereoCalibrationResult(
        rms=rms, R=R, T=T, E=E, F=F,
        per_view_errors=jnp.stack([err_l, err_r], -1),
    )


class RectifyResult(NamedTuple):
    R1: jax.Array
    R2: jax.Array
    P1: jax.Array
    P2: jax.Array
    Q: jax.Array


def stereo_rectify(
    K1, dist1, K2, dist2,
    image_size: Tuple[int, int],
    R, T,
    zero_disparity: bool = True,
    alpha: float = -1.0,
) -> RectifyResult:
    """cv2.stereoRectify (calib3_2.py:191-196). image_size = (width, height).

    Follows OpenCV's construction: split R into half-rotations applied to
    each camera, rotate so the baseline is axis-aligned, share the smaller
    focal, set principal points from undistorted corner means, and build Q.
    alpha >= 0 applies OpenCV's inner/outer-rectangle scaling blend.
    """
    dtype = jnp.asarray(K1).dtype
    K1 = jnp.asarray(K1, dtype)
    K2 = jnp.asarray(K2, dtype)
    R = jnp.asarray(R, dtype)
    T = jnp.ravel(jnp.asarray(T, dtype))
    nx, ny = image_size

    om = _m.inv_rodrigues(R)
    r_r = _m.rodrigues(om * -0.5)  # half-rotation applied to each camera
    t = r_r @ T
    idx = jnp.where(jnp.abs(t[0]) > jnp.abs(t[1]), 0, 1)

    # global rotation aligning the baseline with axis `idx`
    uu = jnp.zeros(3, dtype).at[idx].set(jnp.where(t[idx] > 0, 1.0, -1.0))
    ww = jnp.cross(t, uu)
    nw = jnp.linalg.norm(ww)
    nt = jnp.linalg.norm(t)
    ang = jnp.arccos(jnp.clip(jnp.abs(t[idx]) / jnp.maximum(nt, 1e-18), -1.0, 1.0))
    ww = jnp.where(nw > 0, ww * (ang / jnp.maximum(nw, 1e-18)), ww)
    wR = _m.rodrigues(ww)
    R1 = wR @ r_r.T
    R2 = wR @ r_r
    t_new = R2 @ T

    # shared focal: average over cameras of fy (horizontal) / fx (vertical),
    # each shrunk by negative k1, exactly as modern OpenCV does
    def fc_of(K, dist):
        d = _m.pad_dist(jnp.asarray(dist, dtype))
        fc = jnp.where(idx == 0, K[1, 1], K[0, 0])
        dk1 = d[0]
        fc = jnp.where(dk1 < 0, fc * (1.0 + dk1 * (nx * nx + ny * ny) / (4.0 * fc * fc)), fc)
        return fc

    fc_new = 0.5 * (fc_of(K1, dist1) + fc_of(K2, dist2))

    # principal points from undistorted+rectified image corners
    corners = jnp.array([
        [0.0, 0.0], [nx - 1.0, 0.0], [nx - 1.0, ny - 1.0], [0.0, ny - 1.0]
    ], dtype)

    def cc_of(K, dist, Rrect):
        und = _m.undistort_points(corners, K, dist, R=Rrect)  # normalized, rectified
        proj = und * fc_new  # project with fc_new, cc = 0
        avg = jnp.mean(proj, 0)
        return jnp.array([(nx - 1) / 2.0, (ny - 1) / 2.0], dtype) - avg

    cc1 = cc_of(K1, dist1, R1)
    cc2 = cc_of(K2, dist2, R2)
    if zero_disparity:
        cc = (cc1 + cc2) * 0.5
        cc1 = cc2 = cc
    else:
        # only the coordinate orthogonal to the baseline is averaged
        other = 1 - idx
        mean_other = (cc1[other] + cc2[other]) * 0.5
        cc1 = cc1.at[other].set(mean_other)
        cc2 = cc2.at[other].set(mean_other)

    fc1 = fc_new
    cc1_, cc2_ = cc1, cc2
    if alpha >= 0:
        inner1, outer1 = _get_rectangles(K1, dist1, R1, _P_from(fc1, cc1_, dtype), (nx, ny))
        inner2, outer2 = _get_rectangles(K2, dist2, R2, _P_from(fc1, cc2_, dtype), (nx, ny))
        cx1, cy1 = cc1_[0], cc1_[1]
        cx2, cy2 = cc2_[0], cc2_[1]
        s0 = jnp.max(jnp.stack([
            cx1 / (cx1 - inner1[0]), cy1 / (cy1 - inner1[1]),
            (nx - cx1) / (inner1[2] - cx1), (ny - cy1) / (inner1[3] - cy1),
            cx2 / (cx2 - inner2[0]), cy2 / (cy2 - inner2[1]),
            (nx - cx2) / (inner2[2] - cx2), (ny - cy2) / (inner2[3] - cy2),
        ]))
        s1 = jnp.min(jnp.stack([
            cx1 / (cx1 - outer1[0]), cy1 / (cy1 - outer1[1]),
            (nx - cx1) / (outer1[2] - cx1), (ny - cy1) / (outer1[3] - cy1),
            cx2 / (cx2 - outer2[0]), cy2 / (cy2 - outer2[1]),
            (nx - cx2) / (outer2[2] - cx2), (ny - cy2) / (outer2[3] - cy2),
        ]))
        s = s0 * (1.0 - alpha) + s1 * alpha
        fc1 = fc_new * s

    P1 = _P_from(fc1, cc1_, dtype)
    P2 = _P_from(fc1, cc2_, dtype)
    P2 = P2.at[idx, 3].set(t_new[idx] * fc1)

    cx1, cy1 = cc1_[0], cc1_[1]
    cx2 = cc2_[0]
    Q = jnp.array([
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
    ], dtype)
    Q = Q.at[0, 3].set(-cx1).at[1, 3].set(-cy1).at[2, 3].set(fc1)
    Q = Q.at[3, 2].set(-1.0 / t_new[idx]).at[3, 3].set((cx1 - cx2) / t_new[idx])
    return RectifyResult(R1=R1, R2=R2, P1=P1, P2=P2, Q=Q)


def _P_from(fc, cc, dtype) -> jax.Array:
    P = jnp.zeros((3, 4), dtype)
    P = P.at[0, 0].set(fc).at[1, 1].set(fc).at[2, 2].set(1.0)
    P = P.at[0, 2].set(cc[0]).at[1, 2].set(cc[1])
    return P


def _get_rectangles(K, dist, R, P, image_size, n: int = 9):
    """OpenCV icvGetRectangles: inscribed & bounding rect of the undistorted
    image grid. Returns (x0,y0,x1,y1) for inner and outer."""
    nx, ny = image_size
    dtype = jnp.asarray(K).dtype
    xs = jnp.linspace(0.0, nx - 1.0, n).astype(dtype)  # OpenCV samples x*(W-1)/(N-1)
    ys = jnp.linspace(0.0, ny - 1.0, n).astype(dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.stack([gx, gy], -1).reshape(-1, 2)
    und = _m.undistort_points(pts, K, dist, R=R, P=P).reshape(n, n, 2)
    ox0, oy0 = jnp.min(und[..., 0]), jnp.min(und[..., 1])
    ox1, oy1 = jnp.max(und[..., 0]), jnp.max(und[..., 1])
    ix0 = jnp.max(und[:, 0, 0])
    ix1 = jnp.min(und[:, -1, 0])
    iy0 = jnp.max(und[0, :, 1])
    iy1 = jnp.min(und[-1, :, 1])
    return (ix0, iy0, ix1, iy1), (ox0, oy0, ox1, oy1)


def rectify_maps(
    K, dist, R, P, image_size: Tuple[int, int]
) -> Tuple[jax.Array, jax.Array]:
    """cv2.initUndistortRectifyMap: for every rectified pixel, the source
    pixel in the raw image. Returns (map_x, map_y) float32 (H, W).

    Used by the depth path (depth4.py:125-149), but kept as float maps so a
    single fused TPU remap kernel can consume them directly.
    """
    nx, ny = image_size
    dtype = jnp.asarray(K).dtype
    K = jnp.asarray(K, dtype)
    P = jnp.asarray(P, dtype)
    R = jnp.asarray(R, dtype)
    u = jnp.arange(nx, dtype=dtype)
    v = jnp.arange(ny, dtype=dtype)
    gu, gv = jnp.meshgrid(u, v)
    # rectified pixel -> normalized rectified ray (invert P)
    x = (gu - P[0, 2]) / P[0, 0]
    y = (gv - P[1, 2]) / P[1, 1]
    ones = jnp.ones_like(x)
    rays = jnp.stack([x, y, ones], -1) @ jnp.linalg.inv(R).T
    xy = rays[..., :2] / rays[..., 2:3]
    xyd = _m.distort_normalized(xy, jnp.asarray(dist, dtype))
    map_x = K[0, 0] * xyd[..., 0] + K[0, 1] * xyd[..., 1] + K[0, 2]
    map_y = K[1, 1] * xyd[..., 1] + K[1, 2]
    return map_x.astype(jnp.float32), map_y.astype(jnp.float32)
