"""Native frame-IO library (native/frameio.cc) vs PIL and golden artifacts.

Skipped wholesale when the toolchain can't build libframeio.so — every
consumer in utils.io falls back to PIL, which the rest of the suite covers.
"""
import glob

import numpy as np
import pytest

from recon3d_tpu.utils import io, native

pytestmark = pytest.mark.skipif(native.load_library() is None,
                                reason="native toolchain unavailable")

GOLDEN = "/root/reference/test/output"


class TestPngCodec:
    def test_rgb8_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        img = (rng.rand(67, 123, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "c.png")
        assert native.png_write(p, img)
        np.testing.assert_array_equal(native.png_read(p), img)
        # and PIL agrees our file is a legal PNG
        from PIL import Image

        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)

    def test_gray16_roundtrip(self, tmp_path):
        rng = np.random.RandomState(1)
        dep = (rng.rand(45, 77) * 65535).astype(np.uint16)
        p = str(tmp_path / "d.png")
        assert native.png_write(p, dep)
        np.testing.assert_array_equal(native.png_read(p), dep)
        from PIL import Image

        np.testing.assert_array_equal(np.asarray(Image.open(p)), dep)

    def test_decodes_golden_frames_like_pil(self):
        from PIL import Image

        for p in (sorted(glob.glob(f"{GOLDEN}/color_*.png"))[:2]
                  + sorted(glob.glob(f"{GOLDEN}/depth_*.png"))[:2]):
            ours = native.png_read(p)
            assert ours is not None, p
            ref = np.asarray(Image.open(p))
            np.testing.assert_array_equal(ours, ref)

    def test_garbage_file_rejected(self, tmp_path):
        p = str(tmp_path / "bad.png")
        with open(p, "wb") as f:
            f.write(b"not a png at all")
        assert native.png_read(p) is None


class TestBatchLoader:
    def test_batch_matches_per_file(self):
        cp = sorted(glob.glob(f"{GOLDEN}/color_*.png"))[:6]
        dp = sorted(glob.glob(f"{GOLDEN}/depth_*.png"))[:6]
        h, w = io.read_color(cp[0]).shape[:2]
        res = native.load_rgbd_batch(cp, dp, w, h, threads=4)
        assert res is not None
        colors, depths = res
        for i in range(len(cp)):
            np.testing.assert_array_equal(colors[i], io.read_color(cp[i]))
            np.testing.assert_array_equal(
                depths[i].astype(np.float32) / 1000.0, io.read_depth(dp[i]))

    def test_io_batch_wrapper(self):
        frames = io.load_rgbd_frames_batch(GOLDEN, max_frames=3)
        assert len(frames) == 3
        c, d = frames[0]
        assert c.dtype == np.uint8 and c.ndim == 3
        assert d.dtype == np.float32 and d.ndim == 2
        np.testing.assert_array_equal(
            c, io.read_color(sorted(glob.glob(f"{GOLDEN}/color_*.png"))[0]))
