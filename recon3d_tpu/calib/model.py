"""Camera projection model: pinhole + full OpenCV distortion, in JAX.

Re-implements the projection math behind cv2.projectPoints /
cv2.undistortPoints that the reference calls through OpenCV
(Calib_depth/calib3_2.py:139-196, calib1.py:186-198). Supports the complete
14-parameter distortion vector the shipped calibration uses
(jetson_stereo_8MP_stereo.npz dist1 is 1x14):

    [k1 k2 p1 p2 k3 k4 k5 k6 s1 s2 s3 s4 tau_x tau_y]

- rational radial model (k1..k6), tangential (p1,p2), thin prism (s1..s4),
  and sensor tilt (tau_x, tau_y) exactly as OpenCV defines them.
- everything is pure jax.numpy, differentiable, vmap/jit friendly — the
  Levenberg-Marquardt bundle adjustment in calib/lm.py differentiates
  straight through this model instead of using OpenCV's hand-coded Jacobians.

All functions are shape-polymorphic over leading point axes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pad_dist(dist) -> jax.Array:
    """Normalize a distortion vector to length 14 (zero-padded)."""
    d = jnp.ravel(jnp.asarray(dist))
    return jnp.zeros((14,), d.dtype).at[: d.shape[0]].set(d[:14])


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Axis-angle (3,) -> rotation matrix (3,3) (cv2.Rodrigues forward)."""
    rvec = jnp.ravel(rvec)
    theta = jnp.linalg.norm(rvec)
    # Guard the theta->0 limit: use the quaternion-free Taylor-safe form.
    safe = jnp.where(theta < 1e-12, 1.0, theta)
    k = rvec / safe
    K = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ], rvec.dtype)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3, dtype=rvec.dtype) + s * K + (1.0 - c) * (K @ K)
    return jnp.where(theta < 1e-12, jnp.eye(3, dtype=rvec.dtype) + K * theta, R)


def inv_rodrigues(R: jax.Array) -> jax.Array:
    """Rotation matrix (3,3) -> axis-angle (3,) (cv2.Rodrigues inverse)."""
    tr = jnp.trace(R)
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], R.dtype)
    sin_t = jnp.linalg.norm(v) / 2.0
    # generic case
    axis_generic = v / jnp.where(sin_t < 1e-12, 1.0, 2.0 * sin_t)
    # theta ~ pi: extract axis from R + I diagonal
    B = (R + jnp.eye(3, dtype=R.dtype)) / 2.0
    diag = jnp.sqrt(jnp.maximum(jnp.diagonal(B), 0.0))
    i = jnp.argmax(diag)
    col = B[:, i] / jnp.where(diag[i] < 1e-12, 1.0, diag[i])
    axis_pi = col / jnp.maximum(jnp.linalg.norm(col), 1e-12)
    # fix sign using v
    axis_pi = axis_pi * jnp.where(jnp.dot(axis_pi, v) < 0, -1.0, 1.0)
    near_pi = jnp.abs(theta - jnp.pi) < 1e-6
    axis = jnp.where(near_pi, axis_pi, axis_generic)
    small = theta < 1e-12
    return jnp.where(small, v / 2.0, axis * theta)


def tilt_matrix(tau_x: jax.Array, tau_y: jax.Array, dtype=jnp.float64) -> jax.Array:
    """OpenCV sensor-tilt projection matrix (computeTiltProjectionMatrix)."""
    cx, sx = jnp.cos(tau_x), jnp.sin(tau_x)
    cy, sy = jnp.cos(tau_y), jnp.sin(tau_y)
    Rx = jnp.array([[1, 0, 0], [0, cx, sx], [0, -sx, cx]], dtype)
    Ry = jnp.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]], dtype)
    R = Ry @ Rx
    P = jnp.array([
        [R[2, 2], 0.0, -R[0, 2]],
        [0.0, R[2, 2], -R[1, 2]],
        [0.0, 0.0, 1.0],
    ], dtype)
    return P @ R


def distort_normalized(xy: jax.Array, dist) -> jax.Array:
    """Apply distortion to normalized image coords xy (..., 2) -> (..., 2)."""
    d = pad_dist(dist).astype(xy.dtype)
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4, tx, ty = [d[i] for i in range(14)]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4, r6 = r2 * r2, r2 * r2 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) + s1 * r2 + s2 * r4
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y + s3 * r2 + s4 * r4
    out = jnp.stack([xd, yd], -1)

    def with_tilt(o):
        T = tilt_matrix(tx, ty, dtype=xy.dtype)
        h = jnp.concatenate([o, jnp.ones_like(o[..., :1])], -1) @ T.T
        return h[..., :2] / h[..., 2:3]

    # tilt is almost always zero; lax.cond skips the matrix math when so
    return jax.lax.cond(jnp.logical_or(tx != 0.0, ty != 0.0), with_tilt, lambda o: o, out)


def undistort_normalized(xy_d: jax.Array, dist, iters: int = 10) -> jax.Array:
    """Invert distort_normalized by fixed-point iteration (cv2.undistortPoints)."""
    d = pad_dist(dist).astype(xy_d.dtype)
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4, tx, ty = [d[i] for i in range(14)]

    def untilt(o):
        T = tilt_matrix(tx, ty, dtype=xy_d.dtype)
        Ti = jnp.linalg.inv(T)
        h = jnp.concatenate([o, jnp.ones_like(o[..., :1])], -1) @ Ti.T
        return h[..., :2] / h[..., 2:3]

    xy_d = jax.lax.cond(jnp.logical_or(tx != 0.0, ty != 0.0), untilt, lambda o: o, xy_d)
    x0, y0 = xy_d[..., 0], xy_d[..., 1]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        r4, r6 = r2 * r2, r2 * r2 * r2
        radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) + s1 * r2 + s2 * r4
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y + s3 * r2 + s4 * r4
        return (x0 - dx) / radial, (y0 - dy) / radial

    x, y = jax.lax.fori_loop(0, iters, body, (x0, y0))
    return jnp.stack([x, y], -1)


def project_points(
    obj_pts: jax.Array,
    rvec: jax.Array,
    tvec: jax.Array,
    K: jax.Array,
    dist=None,
) -> jax.Array:
    """cv2.projectPoints equivalent: world (..., 3) -> pixels (..., 2)."""
    R = rodrigues(jnp.asarray(rvec, obj_pts.dtype))
    t = jnp.ravel(jnp.asarray(tvec, obj_pts.dtype))
    cam = obj_pts @ R.T + t
    xy = cam[..., :2] / cam[..., 2:3]
    if dist is not None:
        xy = distort_normalized(xy, dist)
    K = jnp.asarray(K, obj_pts.dtype)
    u = K[0, 0] * xy[..., 0] + K[0, 1] * xy[..., 1] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], -1)


def undistort_points(
    pts: jax.Array,
    K: jax.Array,
    dist,
    R: Optional[jax.Array] = None,
    P: Optional[jax.Array] = None,
    iters: int = 10,
) -> jax.Array:
    """cv2.undistortPoints: pixels (..., 2) -> normalized (or re-projected by P)."""
    K = jnp.asarray(K, pts.dtype)
    x = (pts[..., 0] - K[0, 2]) / K[0, 0]
    y = (pts[..., 1] - K[1, 2]) / K[1, 1]
    xy = undistort_normalized(jnp.stack([x, y], -1), dist, iters=iters)
    if R is not None:
        h = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1) @ jnp.asarray(R, pts.dtype).T
        xy = h[..., :2] / h[..., 2:3]
    if P is not None:
        P = jnp.asarray(P, pts.dtype)
        u = P[0, 0] * xy[..., 0] + P[0, 1] * xy[..., 1] + P[0, 2]
        v = P[1, 1] * xy[..., 1] + P[1, 2]
        return jnp.stack([u, v], -1)
    return xy


def reprojection_errors(
    obj_pts: jax.Array, img_pts: jax.Array, rvec, tvec, K, dist
) -> Tuple[jax.Array, jax.Array]:
    """Per-view mean L2 reprojection error + RMS, mirroring calib1.py:186-198."""
    proj = project_points(obj_pts, rvec, tvec, K, dist)
    err = jnp.linalg.norm(proj - img_pts, axis=-1)
    return jnp.mean(err), jnp.sqrt(jnp.mean(jnp.sum((proj - img_pts) ** 2, -1)))
