"""Chessboard corner detection and sub-pixel refinement.

The reference's detection path (Calib.py:136-165, calib3_2.py:115-156):
histogram-equalize + Gaussian-blur the grayscale, cv2.findChessboardCorners,
then cv2.cornerSubPix with (30, 0.001) criteria (100, 1e-5 in calib2.py).

Here the preprocessing and the sub-pixel refinement are JAX (the refinement
is a batch of tiny weighted least-squares solves — vmapped over corners),
while initial detection can use OpenCV-on-host when available (a one-time
offline step; `detector='opencv'`) or a built-in saddle-point detector
(`detector='native'`) so the framework stands alone without cv2.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.ops import image as im


def preprocess(gray: jax.Array, blur_ksize: int = 5) -> jax.Array:
    """Equalize + blur (Calib.py:136-141)."""
    return im.gaussian_blur(im.histogram_equalize(gray), ksize=blur_ksize)


@partial(jax.jit, static_argnames=("win", "iterations"))
def corner_subpix(
    gray: jax.Array,
    corners: jax.Array,
    win: int = 11,
    iterations: int = 30,
    eps: float = 1e-3,
) -> jax.Array:
    """cv2.cornerSubPix: iterate corners to the gradient saddle point.

    gray: (H, W) float; corners: (N, 2) pixel coords. win is the half window
    (cv2's winSize=(11,11) means half window 11 -> 23x23 samples).

    For each corner q, solves sum_w [grad grad^T] q' = sum_w [grad grad^T] p
    over the window with the Gaussian weights OpenCV uses, via a 2x2 solve,
    iterating until |dq| < eps. All corners refine in parallel under vmap.
    """
    g = jnp.asarray(gray, jnp.float32)
    n = 2 * win + 1
    # OpenCV mask: exp(-((i - win)/win)^2) separable
    r = (jnp.arange(n, dtype=jnp.float32) - win) / win
    w1 = jnp.exp(-r * r)
    mask = w1[:, None] * w1[None, :]
    dy, dx = jnp.meshgrid(
        jnp.arange(n, dtype=jnp.float32) - win,
        jnp.arange(n, dtype=jnp.float32) - win,
        indexing="ij",
    )

    def refine_one(c):
        def body(_, q):
            # sample (n+2)x(n+2) patch around q for central differences
            ys = q[1] + dy
            xs = q[0] + dx
            ip = lambda ddx, ddy: im.bilinear_sample(g, xs + ddx, ys + ddy)
            gx = (ip(1.0, 0.0) - ip(-1.0, 0.0)) * 0.5
            gy = (ip(0.0, 1.0) - ip(0.0, -1.0)) * 0.5
            a = jnp.sum(mask * gx * gx)
            b = jnp.sum(mask * gx * gy)
            cc = jnp.sum(mask * gy * gy)
            bb1 = jnp.sum(mask * gx * gx * dx + mask * gx * gy * dy)
            bb2 = jnp.sum(mask * gx * gy * dx + mask * gy * gy * dy)
            det = a * cc - b * b
            inv_ok = jnp.abs(det) > 1e-12
            dqx = jnp.where(inv_ok, (cc * bb1 - b * bb2) / jnp.where(inv_ok, det, 1.0), 0.0)
            dqy = jnp.where(inv_ok, (a * bb2 - b * bb1) / jnp.where(inv_ok, det, 1.0), 0.0)
            step = jnp.stack([dqx, dqy]).astype(jnp.float32)
            step = jnp.where(jnp.linalg.norm(step) < eps, jnp.zeros(2, jnp.float32), step)
            return q + step

        return jax.lax.fori_loop(0, iterations, body, jnp.asarray(c, jnp.float32))

    return jax.vmap(refine_one)(jnp.asarray(corners, jnp.float32))


def _native_detect(gray: np.ndarray, pattern_size: Tuple[int, int]) -> Optional[np.ndarray]:
    """Built-in detector: Harris-like saddle response + grid ordering.

    Good enough for clean synthetic/calibration-rig imagery; OpenCV remains
    the robust choice for field images (detector='opencv').
    """
    nx, ny = pattern_size
    g = jnp.asarray(gray, jnp.float32)
    g = im.gaussian_blur(g, 5, 1.5)
    gx, gy = im.sobel(g)
    # structure tensor, saddle measure = -det(second-moment-ish via products)
    sxx = im.gaussian_blur(gx * gx, 7, 2.0)
    syy = im.gaussian_blur(gy * gy, 7, 2.0)
    sxy = im.gaussian_blur(gx * gy, 7, 2.0)
    # chessboard inner corners are saddles: det < 0 strongly
    resp = np.asarray(sxy * sxy - sxx * syy + 0.0)
    H, W = resp.shape
    # non-max suppression on a coarse grid
    k = max(3, min(H, W) // (max(nx, ny) * 4) | 1)
    from scipy.ndimage import maximum_filter

    local_max = (resp == maximum_filter(resp, size=k)) & (resp > 0.2 * resp.max())
    ys, xs = np.nonzero(local_max)
    if len(xs) < nx * ny:
        return None
    order = np.argsort(resp[ys, xs])[::-1][: nx * ny * 2]
    pts = np.stack([xs[order], ys[order]], -1).astype(np.float64)
    # pick the nx*ny strongest, then sort into row-major grid order
    pts = pts[: nx * ny]
    # grid ordering: cluster rows by y, sort each row by x
    idx = np.argsort(pts[:, 1])
    pts = pts[idx].reshape(ny, nx, 2)
    for r in range(ny):
        pts[r] = pts[r][np.argsort(pts[r, :, 0])]
    return pts.reshape(-1, 2)


def find_chessboard_corners(
    gray: np.ndarray,
    pattern_size: Tuple[int, int],
    refine: bool = True,
    detector: str = "opencv",
    subpix_win: int = 11,
    subpix_iterations: int = 30,
    subpix_eps: float = 1e-3,
) -> Tuple[bool, Optional[np.ndarray]]:
    """findChessboardCorners + cornerSubPix (Calib.py:145-165).

    Returns (found, corners (nx*ny, 2) float64) in OpenCV's row-major order.
    """
    gray = np.asarray(gray)
    if gray.ndim == 3:
        gray = np.asarray(im.rgb_to_gray(gray))
    if detector == "opencv":
        try:
            import cv2

            found, corners = cv2.findChessboardCorners(
                gray.astype(np.uint8), pattern_size,
                cv2.CALIB_CB_ADAPTIVE_THRESH + cv2.CALIB_CB_NORMALIZE_IMAGE,
            )
            if not found:
                return False, None
            corners = corners.reshape(-1, 2).astype(np.float64)
        except ImportError:
            corners = _native_detect(gray, pattern_size)
            if corners is None:
                return False, None
    else:
        corners = _native_detect(gray, pattern_size)
        if corners is None:
            return False, None
    if refine:
        corners = np.asarray(
            corner_subpix(jnp.asarray(gray, jnp.float32), jnp.asarray(corners),
                          win=subpix_win, iterations=subpix_iterations, eps=subpix_eps)
        ).astype(np.float64)
    return True, corners


def chessboard_object_points(pattern_size: Tuple[int, int], square_size: float) -> np.ndarray:
    """Planar board coordinates, z=0 (Calib.py object-point construction)."""
    nx, ny = pattern_size
    obj = np.zeros((nx * ny, 3), np.float64)
    obj[:, :2] = np.mgrid[0:nx, 0:ny].T.reshape(-1, 2) * square_size
    return obj
