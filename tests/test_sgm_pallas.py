"""Pallas SGM kernels vs the XLA oracle (interpret mode on CPU).

The Pallas path (recon3d_tpu/depth/sgm_pallas.py) is the production TPU hot
path; these tests pin it to the XLA implementation sgm.sgm_disparity, which
itself carries cv2.StereoSGBM parity (test_depth.py). Interpret mode runs
the exact kernel dataflow without Mosaic, so the algorithm (not the
compiler) is what's under test. Sizes are kept tiny — interpret mode always
pads the disparity axis to 128 lanes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.camera.fake import FakeStereoCamera
from recon3d_tpu.depth import sgm, sgm_pallas


def _pair(H, W, seed=1):
    cam = FakeStereoCamera(width=W, height=H, focal=80.0, baseline=0.05)
    gl, gr, dt, _ = cam.render(seed)
    return (jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32), dt)


class TestPallasParity:
    @pytest.mark.parametrize("H,W,D,bs,ur,md", [
        (64, 128, 16, 3, 10, 1),   # exact-divisor shapes
        (40, 192, 32, 5, 5, 2),    # H and W both need padding
    ])
    def test_matches_xla_oracle(self, H, W, D, bs, ur, md):
        gl, gr, _ = _pair(H, W)
        kw = dict(num_disparities=D, block_size=bs, uniqueness_ratio=ur,
                  disp12_max_diff=md, speckle_window_size=0)
        d_x, v_x = sgm.sgm_disparity(gl, gr, **kw)
        d_p, v_p = sgm_pallas.sgm_disparity_pallas(gl, gr, interpret=True, **kw)
        d_x, v_x, d_p, v_p = map(np.asarray, (d_x, v_x, d_p, v_p))
        # full-image valid agreement; the borders differ only through the
        # u16 INVALID_COST sentinel vs the XLA 1e5 sentinel
        assert (v_x == v_p).mean() == 1.0
        both = v_x & v_p
        reg = np.zeros_like(both)
        reg[:, D + 2:] = True  # away from the sentinel-dominated border
        assert np.abs(d_x - d_p)[both & reg].max() < 1e-4
        assert np.abs(d_x - d_p)[both].max() < 0.2

    def test_cost_volume_u16_is_scaled_xla_cost(self):
        gl, gr, _ = _pair(32, 128)
        D, bs = 16, 3
        c16 = np.asarray(sgm_pallas.cost_volume_u16(gl, gr, D, 0, bs))
        from recon3d_tpu.depth import cost as _cost
        lp = _cost.xsobel_prefilter(gl)
        rp = _cost.xsobel_prefilter(gr)
        vol = _cost.bt_cost_volume(lp, rp, D, 0)
        vol = jnp.where(vol > 1e8, 0.0, vol * 2.0)
        box = np.asarray(_cost.box_aggregate(vol, bs))
        x = np.arange(128)[None, :, None]
        d = np.arange(D)[None, None, :]
        interior = np.broadcast_to(x >= d + bs // 2, box.shape)
        np.testing.assert_allclose(c16[interior], np.round(box[interior]),
                                   atol=0.5)
        assert (c16[~interior] == int(sgm_pallas.INVALID_COST)).all()

    def test_3direction_matches_xla_oracle(self):
        # num_directions=3 (cv2 SGBM_3WAY parity: L/R/down, no up pass)
        gl, gr, _ = _pair(64, 128)
        kw = dict(num_disparities=16, block_size=3, uniqueness_ratio=10,
                  disp12_max_diff=1, speckle_window_size=0)
        d_x, v_x = sgm.sgm_disparity(gl, gr, num_directions=3, **kw)
        d_p, v_p = sgm_pallas.sgm_disparity_pallas(
            gl, gr, num_directions=3, interpret=True, **kw)
        d_x, v_x, d_p, v_p = map(np.asarray, (d_x, v_x, d_p, v_p))
        assert (v_x == v_p).mean() == 1.0
        both = v_x & v_p
        reg = np.zeros_like(both)
        reg[:, 18:] = True
        assert np.abs(d_x - d_p)[both & reg].max() < 1e-4

    def test_8direction_matches_xla_oracle(self):
        # num_directions=8 (cv2 MODE_HH direction set): the downward
        # diagonal pair runs as its own band-sweep kernel, the upward pair
        # rides the finalize sweep's extra carries — the aggregate volume
        # still never exists in HBM
        gl, gr, _ = _pair(64, 128)
        kw = dict(num_disparities=16, block_size=3, uniqueness_ratio=10,
                  disp12_max_diff=1, speckle_window_size=0)
        d_x, v_x = sgm.sgm_disparity(gl, gr, num_directions=8, **kw)
        d_p, v_p = sgm_pallas.sgm_disparity_pallas(
            gl, gr, num_directions=8, interpret=True, **kw)
        d_x, v_x, d_p, v_p = map(np.asarray, (d_x, v_x, d_p, v_p))
        assert (v_x == v_p).mean() == 1.0
        both = v_x & v_p
        reg = np.zeros_like(both)
        reg[:, 18:] = True
        assert np.abs(d_x - d_p)[both & reg].max() < 1e-4
        assert np.abs(d_x - d_p)[both].max() < 0.2

    def test_min_disparity(self):
        gl, gr, dt = _pair(48, 128)
        d_p, v_p = sgm_pallas.sgm_disparity_pallas(
            gl, gr, num_disparities=16, min_disparity=2, block_size=3,
            speckle_window_size=0, interpret=True)
        d_p, v_p = np.asarray(d_p), np.asarray(v_p)
        m = v_p & (dt > 3)
        assert m.sum() > 100
        assert np.sqrt(((d_p[m] - dt[m]) ** 2).mean()) < 1.5


class TestFastSpeckle:
    def test_removes_small_blobs_keeps_large_regions(self):
        H, W = 96, 128
        disp = np.full((H, W), 20.0, np.float32)
        valid = np.ones((H, W), bool)
        # a 4x4 speckle at a wildly different disparity
        disp[40:44, 60:64] = 90.0
        out = np.asarray(sgm.speckle_filter_fast(
            jnp.asarray(disp), jnp.asarray(valid), 32.0, 50))
        assert not out[40:44, 60:64].any(), "speckle survived"
        keep = out.copy()
        keep[35:49, 55:69] = True  # ignore the window around the blob
        assert keep.mean() > 0.95, "large region was eaten"

    def test_agrees_with_exact_filter_on_sgm_output(self):
        gl, gr, _ = _pair(96, 192)
        disp, valid = sgm.sgm_disparity(gl, gr, num_disparities=32,
                                        block_size=5, speckle_window_size=0)
        fast = np.asarray(sgm.speckle_filter_fast(disp, valid, 32.0, 50))
        exact = np.asarray(sgm.speckle_filter(disp, valid, 32.0, 50))
        agree = (fast == exact).mean()
        assert agree > 0.97, f"fast vs exact speckle agreement {agree:.4f}"


class TestCompiledStaticChunks:
    """TPU-gated: the compiled static-chunks hot path (rolling-box
    accumulator, right-edge box_out, fused down_sweep) against the XLA
    oracle. Interpret-mode CPU tests take the dynamic col_body path, so
    without this the static-chunk code was only checked by the bench RMSE.
    Run on the real chip: JAX_PLATFORMS=axon pytest tests/test_sgm_pallas.py
    (the suite's conftest pins CPU, where this skips)."""

    @pytest.mark.parametrize("nd", [4, 8])
    def test_compiled_matches_xla_oracle_on_tpu(self, nd):
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            pytest.skip("needs a real TPU (compiled Mosaic path)")
        gl, gr, _ = _pair(128, 256)
        kw = dict(num_disparities=32, block_size=5, uniqueness_ratio=10,
                  disp12_max_diff=1, speckle_window_size=0,
                  num_directions=nd)
        d_x, v_x = sgm.sgm_disparity(gl, gr, **kw)
        d_p, v_p = sgm_pallas.sgm_disparity_pallas(gl, gr, **kw)  # compiled
        d_x, v_x, d_p, v_p = map(np.asarray, (d_x, v_x, d_p, v_p))
        assert (v_x == v_p).mean() == 1.0
        both = (v_x > 0) & (v_p > 0)
        reg = np.zeros_like(both)
        reg[:, 32 + 2:] = True
        assert np.abs(d_x - d_p)[both & reg].max() < 1e-3
        assert np.abs(d_x - d_p)[both].max() < 0.2
