"""High-level stereo calibration workflow.

Mirrors the reference's end-to-end calibration entry point
`stereo_calibrate_camera` (calib3_2.py:89-246): from image pairs to detected
corners, per-camera calibration, stereo calibration with fixed intrinsics,
rectification, saved NPZ checkpoint, and the text report. Also covers the
batch "load images from a folder" mode (calib3_2.py:355-399).

This is the host-side orchestration shell; all numerics run in JAX under
float64 (jax.enable_x64), since calibration is an offline step.
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from recon3d_tpu.calib import chessboard as cb
from recon3d_tpu.calib import mono as _mono
from recon3d_tpu.calib import report as _report
from recon3d_tpu.calib import stereo as _stereo
from recon3d_tpu.calib.npz import StereoParams


def detect_corner_pairs(
    images_left: Sequence[np.ndarray],
    images_right: Sequence[np.ndarray],
    pattern_size: Tuple[int, int],
    detector: str = "opencv",
) -> Tuple[List[np.ndarray], List[np.ndarray], List[int]]:
    """Find chessboard corners in every pair; keep pairs found in both views."""
    kept_l, kept_r, idx = [], [], []
    for i, (il, ir) in enumerate(zip(images_left, images_right)):
        ok_l, cl = cb.find_chessboard_corners(il, pattern_size, detector=detector)
        ok_r, cr = cb.find_chessboard_corners(ir, pattern_size, detector=detector)
        if ok_l and ok_r:
            kept_l.append(cl)
            kept_r.append(cr)
            idx.append(i)
    return kept_l, kept_r, idx


def stereo_calibrate_camera(
    images_left: Sequence[np.ndarray],
    images_right: Sequence[np.ndarray],
    pattern_size: Tuple[int, int] = (9, 6),
    square_size: float = 1.0,
    image_size: Optional[Tuple[int, int]] = None,
    n_dist: int = 5,
    save_path: Optional[str] = None,
    report_path: Optional[str] = None,
    detector: str = "opencv",
    alpha: float = -1.0,
) -> Tuple[StereoParams, dict]:
    """Full stereo calibration from image pairs (calib3_2.py:89-246).

    Returns (StereoParams incl. rectification, info dict with errors).
    """
    if image_size is None:
        h, w = np.asarray(images_left[0]).shape[:2]
        image_size = (w, h)

    corners_l, corners_r, used = detect_corner_pairs(
        images_left, images_right, pattern_size, detector=detector
    )
    if len(used) < 3:
        raise RuntimeError(
            f"need >=3 good pairs, found {len(used)} (of {len(images_left)})"
        )
    obj = cb.chessboard_object_points(pattern_size, square_size)
    objs = np.stack([obj] * len(used))
    img_l = np.stack(corners_l)
    img_r = np.stack(corners_r)

    with jax.enable_x64():
        import jax.numpy as jnp

        res_l = _mono.calibrate_camera(jnp.asarray(objs), jnp.asarray(img_l), image_size, n_dist=n_dist)
        res_r = _mono.calibrate_camera(jnp.asarray(objs), jnp.asarray(img_r), image_size, n_dist=n_dist)
        sres = _stereo.stereo_calibrate(
            jnp.asarray(objs), jnp.asarray(img_l), jnp.asarray(img_r),
            res_l.K, res_l.dist, res_r.K, res_r.dist,
        )
        rect = _stereo.stereo_rectify(
            res_l.K, res_l.dist, res_r.K, res_r.dist, image_size,
            sres.R, sres.T, zero_disparity=True, alpha=alpha,
        )

        params = StereoParams(
            mtx1=np.asarray(res_l.K), dist1=np.asarray(res_l.dist)[None, :],
            mtx2=np.asarray(res_r.K), dist2=np.asarray(res_r.dist)[None, :],
            R=np.asarray(sres.R), T=np.asarray(sres.T).reshape(3, 1),
            E=np.asarray(sres.E), F=np.asarray(sres.F),
            R1=np.asarray(rect.R1), R2=np.asarray(rect.R2),
            P1=np.asarray(rect.P1), P2=np.asarray(rect.P2), Q=np.asarray(rect.Q),
        )
        info = {
            "rms_left": float(res_l.rms),
            "rms_right": float(res_r.rms),
            "rms_stereo": float(sres.rms),
            "mean_error_left": float(np.mean(np.asarray(sres.per_view_errors)[:, 0])),
            "mean_error_right": float(np.mean(np.asarray(sres.per_view_errors)[:, 1])),
            "per_view_errors": np.asarray(sres.per_view_errors),
            "pairs_used": used,
            "image_size": image_size,
        }

    if save_path:
        params.save(save_path)
    if report_path:
        _report.write_stereo_report(
            report_path, params, image_size, len(used),
            info["mean_error_left"], info["mean_error_right"],
            per_view_errors=info["per_view_errors"],
            square_size=square_size, pattern_size=pattern_size,
        )
    return params, info


def calibrate_from_folder(
    folder: str,
    pattern_left: str = "left_*.png",
    pattern_right: str = "right_*.png",
    **kwargs,
) -> Tuple[StereoParams, dict]:
    """Batch calibration from saved images (calib3_2.py:355-399 folder mode)."""
    from recon3d_tpu.utils import io

    lefts = sorted(glob.glob(os.path.join(folder, pattern_left)))
    rights = sorted(glob.glob(os.path.join(folder, pattern_right)))
    if len(lefts) != len(rights) or not lefts:
        raise FileNotFoundError(
            f"unpaired calibration images in {folder}: {len(lefts)} left, {len(rights)} right"
        )
    imgs_l = [io.read_color(p) for p in lefts]
    imgs_r = [io.read_color(p) for p in rights]
    return stereo_calibrate_camera(imgs_l, imgs_r, **kwargs)
