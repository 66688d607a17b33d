"""DepthPipeline — the depth4.py twin (NPZ -> rectify -> SGM+WLS -> vis).

Drives the calibrated end-to-end path on the shipped jetson stereo NPZ
(Calib_depth/jetson_stereo_8MP_stereo.npz: baseline 31.486 mm, rectified
focal 525.607 px) the way depth4.py:89-104, 125-177, 246-262 does.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
from recon3d_tpu.depth.pipeline import DepthPipeline

NPZ = "/root/reference/Calib_depth/jetson_stereo_8MP_stereo.npz"

pytestmark = pytest.mark.skipif(not os.path.exists(NPZ),
                                reason="golden calibration not available")


@pytest.fixture(scope="module")
def pipe():
    return DepthPipeline(
        __import__("recon3d_tpu.calib.npz", fromlist=["StereoParams"])
        .StereoParams.load(NPZ),
        image_size=(320, 180),
        matcher_config=StereoMatcherConfig(num_disparities=32, block_size=5,
                                           speckle_window_size=20),
        wls_config=WLSConfig(iterations=2),
    )


def test_from_npz_builds_maps_and_q(pipe):
    assert all(m.shape == (180, 320) for m in pipe.maps)
    assert np.isfinite(np.asarray(pipe.Q)).all()
    # Q encodes the rig's rectified focal and baseline (calibration report)
    f = float(np.asarray(pipe.params.P1)[0, 0])
    assert abs(f - 525.607) < 0.01
    assert abs(abs(pipe.params.baseline) - 31.486) < 0.01


def test_process_produces_disparity_depth_vis(pipe):
    rng = np.random.RandomState(0)
    base = (rng.rand(180, 320) * 255).astype(np.float32)
    left = base
    right = np.roll(base, -6, axis=1)
    disp, depth, vis = pipe.process(left, right)
    assert disp.shape == (180, 320) and depth.shape == (180, 320)
    assert vis.shape == (180, 320, 3)
    d = np.asarray(disp)
    assert np.isfinite(d).all()
    assert (d > 0).mean() > 0.1  # plausible match density on textured input
    v = np.asarray(vis)
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_adjust_retunes_without_recompile_error(pipe):
    nd0 = pipe.matcher_config.num_disparities
    pipe.adjust("w")
    assert pipe.matcher_config.num_disparities == nd0 + 16
    lam0 = pipe.wls_config.lam
    pipe.adjust("e")
    assert pipe.wls_config.lam == lam0 * 2
    pipe.adjust("s")  # restore disparities so the module fixture stays cheap
    pipe.adjust("d")
