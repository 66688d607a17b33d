#!/usr/bin/env python
"""Headline benchmark: 1080p stereo pair -> colored point cloud, fps per chip.

BASELINE.json north star: >30 fps at 1920x1080 with 128 disparities on one
TPU v5e chip, disparity RMSE < 0.5 px vs OpenCV SGBM. This script times the
full fused per-frame program (rectify-remap x2 -> grayscale -> SGM-128 ->
WLS refine -> Q backprojection -> colored masked cloud) on whatever chip
JAX_PLATFORMS points at (axon TPU in the driver environment), and prints
ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.camera.fake import FakeStereoCamera
    from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
    from recon3d_tpu.depth.matcher import compute_disparity
    from recon3d_tpu.pointcloud.backproject import backproject_disparity

    W, H, D = 1920, 1080, 128
    focal, baseline = 1050.0, 0.06

    cam = FakeStereoCamera(width=W, height=H, focal=focal, baseline=baseline)
    gl, gr, disp_true, _ = cam.render(0)
    color = np.repeat(gl[..., None], 3, axis=-1)

    Q = np.zeros((4, 4), np.float32)
    Q[0, 3] = -W / 2.0
    Q[1, 3] = -H / 2.0
    Q[2, 3] = focal
    Q[3, 2] = 1.0 / baseline

    mcfg = StereoMatcherConfig(num_disparities=D, block_size=5)
    wcfg = WLSConfig()

    @jax.jit
    def frame(left, right, col, Q):
        disp, valid = compute_disparity(left, right, mcfg, wcfg, True)
        pc = backproject_disparity(disp, Q, color=col)
        return pc.points, pc.colors, pc.valid, disp

    jl = jnp.asarray(gl, jnp.float32)
    jr = jnp.asarray(gr, jnp.float32)
    jc = jnp.asarray(color)
    jQ = jnp.asarray(Q)

    # compile + warmup
    out = frame(jl, jr, jc, jQ)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = frame(jl, jr, jc, jQ)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    # accuracy spot-check vs analytic truth on the same frame
    disp = np.asarray(out[3])
    m = (disp > 0) & (disp_true > 1.0)
    rmse_truth = float(np.sqrt(((disp[m] - disp_true[m]) ** 2).mean()))

    print(json.dumps({
        "metric": "stereo_1080p_pair_to_colored_cloud_fps",
        "value": round(fps, 3),
        "unit": "fps/chip",
        "vs_baseline": round(fps / 30.0, 3),
        "extras": {
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "num_disparities": D,
            "rmse_vs_analytic_truth_px": round(rmse_truth, 4),
            "ms_per_frame": round(1000.0 / fps, 2),
        },
    }))


if __name__ == "__main__":
    main()
