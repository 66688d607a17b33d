"""Depth path tests: SGM parity vs cv2.StereoSGBM (the BASELINE metric),
analytic ground truth, speckle CCL vs scipy, WLS smoother behavior."""
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from recon3d_tpu.camera.fake import FakeStereoCamera
from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
from recon3d_tpu.depth import matcher, sgm, wls
from recon3d_tpu.depth import cost as dcost


@pytest.fixture(scope="module")
def stereo_pair():
    cam = FakeStereoCamera(width=320, height=240, focal=260.0, baseline=0.06)
    return cam.render(0)  # grayL, grayR, disp_true, depth


@pytest.fixture(scope="module")
def golden_pair():
    """Realistic-texture stereo pair synthesized from a golden RGBD frame:
    right view = left warped by disparity from real depth."""
    from recon3d_tpu.utils import io

    color = io.read_color("/root/reference/test/output/color_00008.png")
    depth = io.read_depth("/root/reference/test/output/depth_00008.png")
    gray = color.astype(np.float32).mean(-1)
    f, b = 616.0, 0.05
    disp = np.where(depth > 0.2, f * b / np.maximum(depth, 1e-3), 0.0)
    disp = np.clip(disp, 0, 63.0)
    H, W = gray.shape
    x = np.arange(W)[None, :].repeat(H, 0).astype(np.float32)
    # inverse warp: right(x) = left(x + d_right(x)); approximate d_right by
    # sampling left-view disparity (fine for a parity fixture)
    xs = x + disp
    right = cv2.remap(gray, xs.astype(np.float32),
                      np.arange(H)[:, None].repeat(W, 1).astype(np.float32),
                      cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    return gray, right, disp


def _cv_sgbm(num_disp=64, block=5, mode=None):
    return cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=num_disp, blockSize=block,
        P1=8 * block * block, P2=32 * block * block,
        disp12MaxDiff=1, uniquenessRatio=10,
        speckleWindowSize=50, speckleRange=32, preFilterCap=63,
        mode=mode if mode is not None else cv2.STEREO_SGBM_MODE_HH,
    )


class TestSGM:
    def test_rmse_vs_analytic_truth(self, stereo_pair):
        gl, gr, disp_true, _ = stereo_pair
        disp, valid = sgm.sgm_disparity(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            num_disparities=64, block_size=5)
        disp, valid = np.asarray(disp), np.asarray(valid)
        m = valid & (disp_true > 0)
        assert m.mean() > 0.7, "too few valid disparities"
        rmse = np.sqrt(((disp[m] - disp_true[m]) ** 2).mean())
        assert rmse < 1.0, f"RMSE vs analytic truth {rmse:.3f}"

    def test_baseline_metric_rmse_vs_cv2_sgbm(self, stereo_pair):
        """BASELINE.json: disparity RMSE < 0.5 px vs OpenCV SGBM."""
        gl, gr, _, _ = stereo_pair
        disp, valid = sgm.sgm_disparity(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            num_disparities=64, block_size=5)
        disp, valid = np.asarray(disp), np.asarray(valid)
        d_cv = _cv_sgbm().compute(gl, gr).astype(np.float32) / 16.0
        both = valid & (d_cv > 0)
        assert both.mean() > 0.5
        rmse = np.sqrt(((disp[both] - d_cv[both]) ** 2).mean())
        assert rmse < 0.5, f"RMSE vs cv2 SGBM {rmse:.3f} px"

    def test_direction_count_accuracy_waiver(self, stereo_pair):
        """Measured justification for defaulting to 3 directions (the
        reference's production mode is 3-way, depth4.py:157-170). All of
        3/4/8 now run on the Pallas fast path (test_sgm_pallas pins 8-dir
        kernel parity); this test keeps the *default choice* honest.

        Measured on this fixture (320x240/D=64): truth-RMSE sgm3 0.441,
        sgm4 0.431, sgm8 0.418 px — the 8-direction mode buys < 0.03 px
        over the fast path's direction sets, while cv2 MODE_HH itself
        scores 0.848 px against the same ground truth. The asserted bound
        keeps the waiver honest if the matcher regresses."""
        gl, gr, disp_true, _ = stereo_pair
        rt = {}
        for nd in (3, 4, 8):
            d, v = sgm.sgm_disparity(
                jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
                num_disparities=64, block_size=5, num_directions=nd)
            d, v = np.asarray(d), np.asarray(v)
            m = v & (disp_true > 0)
            rt[nd] = np.sqrt(((d[m] - disp_true[m]) ** 2).mean())
        assert rt[8] <= rt[4] + 1e-3 and rt[8] <= rt[3] + 1e-3, rt
        assert rt[3] - rt[8] < 0.1, f"sgm3 gives up {rt[3]-rt[8]:.3f} px"
        assert rt[4] - rt[8] < 0.05, f"sgm4 gives up {rt[4]-rt[8]:.3f} px"
        # and every mode beats cv2's own 8-path matcher against truth
        d_cv = _cv_sgbm().compute(gl, gr).astype(np.float32) / 16.0
        mt = (d_cv > 0) & (disp_true > 0)
        rmse_cv = np.sqrt(((d_cv[mt] - disp_true[mt]) ** 2).mean())
        assert max(rt.values()) < rmse_cv, (rt, rmse_cv)

    def test_golden_frame_texture_parity(self, golden_pair):
        gray, right, disp_true = golden_pair
        disp, valid = sgm.sgm_disparity(
            jnp.asarray(gray, jnp.float32), jnp.asarray(right, jnp.float32),
            num_disparities=64, block_size=5)
        disp, valid = np.asarray(disp), np.asarray(valid)
        d_cv = _cv_sgbm().compute(gray.astype(np.uint8), right.astype(np.uint8)
                                  ).astype(np.float32) / 16.0
        both = valid & (d_cv > 0)
        diff = np.abs(disp[both] - d_cv[both])
        # RMSE on this fixture is dominated by a <1% outlier tail at depth
        # discontinuities where the warp itself is inconsistent; robust stats
        # carry the parity claim (median 0.04 px, p95 0.22 px measured)
        assert np.median(diff) < 0.1, f"median {np.median(diff):.3f} px"
        assert np.percentile(diff, 95) < 0.5, f"p95 {np.percentile(diff, 95):.3f} px"
        assert (diff > 1.0).mean() < 0.01

    def test_known_shift_recovered(self):
        """A pure horizontal shift must give a constant disparity."""
        rng = np.random.RandomState(0)
        img = rng.rand(96, 160).astype(np.float32) * 255
        img = np.asarray(dcost.xsobel_prefilter(img) * 0 + img)  # keep raw
        shift = 7
        right = np.roll(img, -shift, axis=1)
        disp, valid = sgm.sgm_disparity(
            jnp.asarray(np.roll(right, shift, 1)), jnp.asarray(right),
            num_disparities=32, block_size=3, speckle_window_size=0)
        disp, valid = np.asarray(disp), np.asarray(valid)
        inner = valid.copy()
        inner[:, :shift + 8] = False
        inner[:, -8:] = False
        assert np.abs(disp[inner] - shift).mean() < 0.1

    def test_min_disparity_offset(self, stereo_pair):
        gl, gr, disp_true, _ = stereo_pair
        disp, valid = sgm.sgm_disparity(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            num_disparities=48, min_disparity=8, block_size=5)
        disp, valid = np.asarray(disp), np.asarray(valid)
        m = valid & (disp_true > 10)
        rmse = np.sqrt(((disp[m] - disp_true[m]) ** 2).mean())
        assert rmse < 1.5


class TestSpeckle:
    def test_matches_scipy_components(self):
        from scipy import ndimage

        rng = np.random.RandomState(0)
        d = np.where(rng.rand(100, 140) < 0.5, 0.0, 10.0).astype(np.float32)
        valid = rng.rand(100, 140) > 0.3
        out = np.asarray(sgm.speckle_filter(jnp.asarray(d), jnp.asarray(valid), 0.5, 20))
        removed = np.zeros_like(valid)
        four = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        for val in (0.0, 10.0):
            mask = valid & (d == val)
            lab, n = ndimage.label(mask, structure=four)
            sizes = ndimage.sum(mask, lab, range(1, n + 1))
            for i, s in enumerate(sizes):
                if s <= 20:
                    removed |= lab == i + 1
        np.testing.assert_array_equal(out, valid & ~removed)


class TestWLS:
    def test_fills_holes_and_preserves_edges(self):
        H, W = 64, 96
        guide = np.zeros((H, W), np.float32)
        guide[:, W // 2:] = 255.0
        disp = np.where(guide > 0, 30.0, 10.0).astype(np.float32)
        valid = np.ones((H, W), bool)
        valid[20:40, 30:60] = False  # hole spanning the edge
        out = np.asarray(wls.wls_refine(jnp.asarray(disp), jnp.asarray(valid),
                                        jnp.asarray(guide), lam=8000.0))
        # left side of the hole filled towards 10, right towards 30
        assert abs(out[30, 35] - 10.0) < 1.5
        assert abs(out[30, 55] - 30.0) < 1.5
        # valid regions barely move
        assert np.abs(out[valid] - disp[valid]).mean() < 0.5

    def test_confidence_zero_everywhere_is_safe(self):
        out = np.asarray(wls.fast_global_smoother(
            jnp.zeros((16, 16)), jnp.zeros((16, 16)), jnp.zeros((16, 16))))
        assert np.isfinite(out).all()

    def test_config_iterations_reach_the_filter(self, stereo_pair):
        # regression: compute_disparity must forward WLSConfig.iterations
        # (it used to silently run wls_refine's default regardless)
        gl, gr, _, _ = stereo_pair
        mcfg = StereoMatcherConfig(num_disparities=32, block_size=5,
                                   speckle_window_size=0)
        d1, _ = matcher.compute_disparity(gl, gr, mcfg,
                                          WLSConfig(iterations=1), True)
        d3, _ = matcher.compute_disparity(gl, gr, mcfg,
                                          WLSConfig(iterations=3), True)
        assert float(jnp.abs(d1 - d3).max()) > 1e-3


class TestMatcherAPI:
    def test_bm_mode_and_depth(self, stereo_pair):
        gl, gr, disp_true, depth_true = stereo_pair
        Q = np.zeros((4, 4), np.float32)
        f, b = 260.0, 0.06
        Q[2, 3] = f
        Q[3, 2] = -1.0 / b
        m = matcher.StereoMatcher(
            StereoMatcherConfig(num_disparities=64, mode="bm"), Q=Q, with_wls=False)
        disp, depth = m.compute(gl, gr)
        disp, depth = np.asarray(disp), np.asarray(depth)
        mm = (disp > 0) & (disp_true > 0)
        assert mm.mean() > 0.3
        rmse = np.sqrt(((disp[mm] - disp_true[mm]) ** 2).mean())
        assert rmse < 2.0  # BM is noisier than SGM
        derr = np.abs(depth[mm] - depth_true[mm])
        assert np.median(derr) < 0.05

    def test_reproject_matches_cv2(self, stereo_pair):
        gl, gr, disp_true, _ = stereo_pair
        Q = np.array([[1, 0, 0, -160.0], [0, 1, 0, -120.0],
                      [0, 0, 0, 260.0], [0, 0, 1 / 0.06, 0]], np.float32)
        pts = np.asarray(matcher.reproject_image_to_3d(jnp.asarray(disp_true), Q))
        ref = cv2.reprojectImageTo3D(disp_true, Q.astype(np.float64))
        m = disp_true > 1.0
        np.testing.assert_allclose(pts[m], ref[m], rtol=1e-4, atol=1e-4)

    def test_backproject_standard_q_fast_path(self, stereo_pair):
        # the streaming hot path's sparse-Q shortcut must equal the general
        # homogeneous transform on a stereoRectify-shaped Q
        from recon3d_tpu.pointcloud.backproject import backproject_disparity

        _, _, disp_true, _ = stereo_pair
        Q = np.array([[1, 0, 0, -160.0], [0, 1, 0, -120.0],
                      [0, 0, 0, 260.0], [0, 0, 1 / 0.06, 0.1]], np.float32)
        d = jnp.asarray(disp_true)
        general = backproject_disparity(d, Q)
        fast = backproject_disparity(d, Q, assume_standard_q=True)
        np.testing.assert_array_equal(np.asarray(general.valid),
                                      np.asarray(fast.valid))
        m = np.asarray(general.valid)
        np.testing.assert_allclose(np.asarray(fast.points)[m],
                                   np.asarray(general.points)[m],
                                   rtol=1e-5, atol=1e-5)

    def test_live_adjust_changes_config(self):
        m = matcher.StereoMatcher()
        m.adjust("w")
        assert m.config.num_disparities == 144
