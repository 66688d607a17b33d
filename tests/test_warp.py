"""Gather-free two-pass rectification warp (ops/warp.py) vs cv2.remap.

This is the production remap on the depth hot path (reference per-frame
cv2.remap x2, depth4.py:246-248); the Pallas twin must match the XLA
version, and both must track cv2.remap(INTER_LINEAR) closely on smooth
rectification-like maps.
"""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.ops.warp import (RemapPlan, build_remap_plan,
                                  remap_two_pass, remap_two_pass_batch,
                                  remap_two_pass_pallas)


def _maps(H, W, k=0.05, dx=2.0, dy=-1.5):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cx, cy, f = W / 2.0, H / 2.0, 1.2 * W
    xn, yn = (xx - cx) / f, (yy - cy) / f
    scale = 1.0 - k * (xn ** 2 + yn ** 2)
    mx = (cx + f * scale * xn + dx).astype(np.float32)
    my = (cy + f * scale * yn + dy).astype(np.float32)
    return mx, my


def _smooth_image(H, W, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(H // 8, W // 8).astype(np.float32) * 255
    return cv2.resize(img, (W, H), interpolation=cv2.INTER_CUBIC)


class TestTwoPassRemap:
    def test_matches_cv2_on_rectification_map(self):
        H, W = 120, 160
        mx, my = _maps(H, W)
        img = _smooth_image(H, W)
        plan = build_remap_plan(mx, my)
        ours = np.asarray(remap_two_pass(jnp.asarray(img), plan))
        ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_CONSTANT)
        valid = np.asarray(plan.valid)
        # two chained linear interps vs one bilinear: sub-level on smooth
        # images (the PARITY.md claim: < 0.25 gray levels)
        diff = np.abs(ours - ref)[valid]
        assert np.median(diff) < 0.1
        assert np.quantile(diff, 0.99) < 0.25

    def test_out_of_source_samples_masked_to_zero(self):
        H, W = 64, 128
        mx, my = _maps(H, W, dx=20.0)  # pushes right edge out of source
        img = _smooth_image(H, W)
        plan = build_remap_plan(mx, my)
        out = np.asarray(remap_two_pass(jnp.asarray(img), plan))
        invalid = ~np.asarray(plan.valid)
        assert invalid.any()
        assert np.abs(out[invalid]).max() == 0.0

    def test_non_monotonic_map_rejected(self):
        H, W = 32, 64
        mx, my = _maps(H, W)
        mx[:, 10] = mx[:, 30]  # break strict monotonicity
        with pytest.raises(ValueError, match="strictly increasing"):
            build_remap_plan(mx, my)

    def test_batch_helper_matches_per_image(self):
        H, W = 64, 128
        mx, my = _maps(H, W)
        plan = build_remap_plan(mx, my)
        a = jnp.asarray(_smooth_image(H, W, 1))
        b = jnp.asarray(_smooth_image(H, W, 2))
        batched = np.asarray(remap_two_pass_batch(jnp.stack([a, b]), plan))
        np.testing.assert_allclose(batched[0],
                                   np.asarray(remap_two_pass(a, plan)),
                                   atol=1e-5)
        np.testing.assert_allclose(batched[1],
                                   np.asarray(remap_two_pass(b, plan)),
                                   atol=1e-5)


class TestPallasRemap:
    def test_matches_xla_twin(self):
        H, W = 64, 256  # H % 8 == 0, W % 128 == 0 (the Pallas layout gate)
        mx, my = _maps(H, W)
        img = jnp.asarray(_smooth_image(H, W))
        plan = build_remap_plan(mx, my)
        ref = np.asarray(remap_two_pass(img, plan))
        out = np.asarray(remap_two_pass_pallas(img, plan, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)

    def test_unaligned_shapes_fall_back(self):
        H, W = 60, 130  # not tile-aligned -> XLA fallback path
        mx, my = _maps(H, W)
        img = jnp.asarray(_smooth_image(H, W))
        plan = build_remap_plan(mx, my)
        ref = np.asarray(remap_two_pass(img, plan))
        out = np.asarray(remap_two_pass_pallas(img, plan, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)
