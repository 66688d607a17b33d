#!/usr/bin/env python
"""Round-3 experiment: decompose and close the ours-vs-truth gap.

Reproduces bench.py's full-pipeline truth comparison (same scene, same
interior mask) and scores matcher variants: sgm3 (current), sgm8, P1/P2
sweeps, and post-WLS outputs. Run on the real chip; the persistent cache
makes repeats cheap.

Usage: python tools/exp_truth.py [variant ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

bench._enable_compile_cache()

import cv2  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from recon3d_tpu.depth import sgm_pallas  # noqa: E402
from recon3d_tpu.ops.warp import remap_two_pass_pallas  # noqa: E402


def main():
    frame, (jl, jr, jc, plan, jQ), scene = bench.build_headline()
    W, H, D = scene["W"], scene["H"], scene["D"]
    disp_true = scene["disp_true"]
    mx, my = scene["mx"], scene["my"]
    raw_l, raw_r = scene["raw_l"], scene["raw_r"]

    to8 = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    m_x = int(np.ceil(np.abs(mx - xx).max())) + 2
    m_y = int(np.ceil(np.abs(my - yy).max())) + 2
    interior = np.zeros((H, W), bool)
    interior[m_y:H - m_y, m_x + D:W - m_x] = True

    wl = to8(np.asarray(remap_two_pass_pallas(jl, plan)))
    wr = to8(np.asarray(remap_two_pass_pallas(jr, plan)))
    cvl8 = to8(cv2.remap(raw_l, mx, my, cv2.INTER_LINEAR))
    cvr8 = to8(cv2.remap(raw_r, mx, my, cv2.INTER_LINEAR))

    def rmse(a, m):
        return round(float(np.sqrt(((a[m] - disp_true[m]) ** 2).mean())), 4)

    # cv2 reference (3WAY, as bench)
    def cv_disp(l8, r8, mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY):
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=D, blockSize=5,
            P1=8 * 25, P2=32 * 25, disp12MaxDiff=1, uniquenessRatio=10,
            speckleWindowSize=50, speckleRange=32, preFilterCap=63,
            mode=mode)
        return sgbm.compute(l8, r8).astype(np.float32) / 16.0

    d_cv = cv_disp(cvl8, cvr8)
    m_cv = (d_cv > 0) & (disp_true > 1.0) & interior
    print(f"cv2_3way_vs_truth: {rmse(d_cv, m_cv)}  (valid {m_cv.mean():.3f})")
    d_cv_hh = cv_disp(cvl8, cvr8, cv2.STEREO_SGBM_MODE_HH)
    m_hh = (d_cv_hh > 0) & (disp_true > 1.0) & interior
    print(f"cv2_hh_vs_truth:   {rmse(d_cv_hh, m_hh)}  (valid {m_hh.mean():.3f})")

    def ours(l8, r8, ndir=3, p1=8 * 25, p2=32 * 25, uniq=10, **kw):
        jl8 = jnp.asarray(l8, jnp.float32)
        jr8 = jnp.asarray(r8, jnp.float32)

        def run():
            return sgm_pallas.sgm_disparity_pallas(
                jl8, jr8, num_disparities=D, block_size=5,
                num_directions=ndir, p1=float(p1), p2=float(p2),
                uniqueness_ratio=uniq, **kw)

        dd, vv = run()
        dd.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            dd, vv = run()
        dd, vv = np.asarray(dd), np.asarray(vv)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        return dd, vv, dt

    variants = [
        ("sgm3", dict(ndir=3)),
        ("sgm4", dict(ndir=4)),
        ("sgm8", dict(ndir=8)),
        ("sgm8_p2x2", dict(ndir=8, p2=64 * 25)),
        ("sgm3_p2x2", dict(ndir=3, p2=64 * 25)),
        ("sgm8_p1x2", dict(ndir=8, p1=16 * 25)),
        ("sgm8_p1x2_p2x2", dict(ndir=8, p1=16 * 25, p2=64 * 25)),
        ("sgm4_p2x2", dict(ndir=4, p2=64 * 25)),
        ("sgm4_p2x3", dict(ndir=4, p2=96 * 25)),
        ("sgm8_p2x3", dict(ndir=8, p2=96 * 25)),
        ("sgm8_p2x4", dict(ndir=8, p2=128 * 25)),
    ]
    sel = sys.argv[1:]
    for name, kw in variants:
        if sel and name not in sel:
            continue
        d, v, dt = ours(wl, wr, **kw)
        m = v & (disp_true > 1.0) & interior
        # also score on cv2's mask for apples-to-apples
        print(f"{name:16s} vs_truth {rmse(d, m)}  (valid {m.mean():.3f}, "
              f"on_cv_mask {rmse(d, m_cv & v)}, steady {dt:.1f}ms)")


if __name__ == "__main__":
    main()
