import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.ops import image as im

cv2 = pytest.importorskip("cv2")


def _rand_img(h=64, w=96, c=None, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c is None else (h, w, c)
    return (rng.rand(*shape) * 255).astype(np.uint8)


def test_rgb_to_gray_parity():
    img = _rand_img(c=3)
    ours = np.asarray(im.rgb_to_gray(img, "rgb"))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 0.51  # cv2 rounds to uint8


def test_histogram_equalize_parity():
    img = _rand_img()
    ours = np.asarray(im.histogram_equalize(img))
    ref = cv2.equalizeHist(img).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_gaussian_blur_parity():
    img = _rand_img().astype(np.float32)
    ours = np.asarray(im.gaussian_blur(img, ksize=5, sigma=1.2))
    ref = cv2.GaussianBlur(img, (5, 5), 1.2, borderType=cv2.BORDER_REFLECT_101)
    assert np.abs(ours - ref).max() < 1e-2


def test_remap_parity():
    img = _rand_img().astype(np.float32)
    h, w = img.shape
    rng = np.random.RandomState(1)
    mx = (rng.rand(h, w) * (w - 1)).astype(np.float32)
    my = (rng.rand(h, w) * (h - 1)).astype(np.float32)
    ours = np.asarray(im.remap(img, jnp.asarray(mx), jnp.asarray(my)))
    ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
    # cv2 remap uses 5-bit fixed-point interpolation weights
    assert np.abs(ours - ref).max() < 0.5


def test_remap_out_of_bounds_is_border():
    img = np.ones((8, 8), np.float32) * 7.0
    mx = jnp.full((2, 2), -5.0)
    my = jnp.full((2, 2), 3.0)
    out = np.asarray(im.remap(img, mx, my, border_value=0.0))
    assert (out == 0).all()


def test_sobel_parity():
    img = _rand_img().astype(np.float32)
    gx, gy = im.sobel(img)
    rx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REFLECT_101)
    ry = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REFLECT_101)
    assert np.abs(np.asarray(gx) - rx).max() < 1e-3
    assert np.abs(np.asarray(gy) - ry).max() < 1e-3


def test_normalize_and_colormap():
    d = np.linspace(0, 10, 100).reshape(10, 10).astype(np.float32)
    n = np.asarray(im.normalize_minmax(d))
    assert n.min() == pytest.approx(0.0) and n.max() == pytest.approx(255.0)
    rgb = np.asarray(im.colormap_jet(jnp.asarray(n / 255.0)))
    assert rgb.shape == (10, 10, 3)
    # JET: low values blue, high values red
    assert rgb[0, 0, 2] >= 0.5 and rgb[0, 0, 0] < 0.1
    assert rgb[-1, -1, 0] >= 0.5 and rgb[-1, -1, 2] < 0.1


def test_resize_bilinear_parity():
    img = _rand_img().astype(np.float32)
    ours = np.asarray(im.resize_bilinear(img, (32, 48)))
    ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 0.5


def test_pyramid_shapes():
    img = _rand_img(64, 64).astype(np.float32)
    pyr = im.pyramid(img, 3)
    assert [p.shape for p in pyr] == [(64, 64), (32, 32), (16, 16)]


class TestSweepBilinear:
    """sweep_bilinear_stack: the gather-free bounded warp that replaces
    bilinear_sample in the TPU odometry hot path (24 gather taps/sweep)."""

    def _grid(self, h, w):
        import jax

        u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        return u, v

    def test_identity_is_exact(self):
        img = np.random.RandomState(1).rand(3, 32, 48).astype(np.float32)
        u, v = self._grid(32, 48)
        out = im.sweep_bilinear_stack(img, u, v, 4, 4)
        np.testing.assert_array_equal(np.asarray(out), img)

    def test_separable_maps_match_gather_bitwise_region(self):
        # vertical map constant along rows + arbitrary horizontal map:
        # the two-pass composition is exact, so sweep == bilinear_sample
        # everywhere both sample in-image
        img = np.random.RandomState(2).rand(2, 40, 64).astype(np.float32)
        u, v = self._grid(40, 64)
        x = u + 3.0 * jnp.sin((u + 2 * v) / 9.0)
        y = v + 2.0 * jnp.cos(v / 7.0)
        out = im.sweep_bilinear_stack(img, x, y, 6, 6)
        ref = jnp.stack([im.bilinear_sample(img[c], x, y) for c in range(2)])
        valid = np.asarray((x >= 0) & (x <= 63) & (y >= 0) & (y <= 39))
        d = np.abs(np.asarray(out - ref))[:, valid]
        assert d.max() < 1e-5, d.max()

    def test_smooth_warp_close_to_gather(self):
        # general smooth warp on a smooth image: the first-order
        # composition error stays within |dx|*|dy/dx|*|grad| (~0.07
        # here, a few percent of the value range). NaN border sentinel
        # separates genuine samples from the (conservative) composed
        # validity mask, which rejects a few extra pixels at image edges
        # where the vertical coordinate leaves the image at the target
        # column.
        yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
        img = np.stack([np.sin(xx / 5.0) + np.cos(yy / 7.0)])
        u, v = self._grid(48, 64)
        x = u + 2.5 * jnp.sin(v / 8.0)
        y = v + 2.0 * jnp.cos(u / 10.0)
        out = np.asarray(im.sweep_bilinear_stack(img, x, y, 5, 5,
                                                 border_value=np.nan))
        ref = np.asarray(im.bilinear_sample(img[0], x, y)[None])
        valid = np.asarray((x >= 0) & (x <= 63) & (y >= 0) & (y <= 47))
        valid = valid[None] & np.isfinite(out)
        assert valid.mean() > 0.9  # the mask stays near-complete
        d = np.abs(out - ref)[valid]
        assert d.max() < 0.1, d.max()

    def test_bound_overflow_and_outside_are_border(self):
        img = np.ones((1, 16, 32), np.float32)
        u, v = self._grid(16, 32)
        out = im.sweep_bilinear_stack(img, u + 9.0, v, 4, 4,
                                      border_value=-5.0)
        # displacement 9 > bound 4 -> border everywhere
        np.testing.assert_array_equal(np.asarray(out), -5.0)
        out2 = im.sweep_bilinear_stack(img, u, v - 100.0, 4, 4)
        np.testing.assert_array_equal(np.asarray(out2), 0.0)
