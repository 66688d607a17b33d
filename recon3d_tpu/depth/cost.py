"""Stereo matching costs: Birchfield-Tomasi on x-Sobel prefilter, and census.

Re-implements the cost half of cv2.StereoSGBM (depth4.py:151-170): OpenCV's
SGBM prefilter is an x-Sobel clipped to [0, 2*preFilterCap] about
preFilterCap, the per-pixel cost is the sampling-insensitive Birchfield-
Tomasi absolute difference on that prefiltered image, and blockSize
aggregation is a box sum over the window. A census-Hamming cost is provided
as the robust alternative (better behaved under radiometric differences).

Layout: cost volumes are (H, W, D) float32 with D (num_disparities) on the
last axis — 128 lanes wide, exactly the TPU vector register shape, so every
per-disparity op is a full-width VPU op and the SGM recurrences in sgm.py
carry (rows, D) blocks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def xsobel_prefilter(gray: jax.Array, prefilter_cap: int = 63) -> jax.Array:
    """OpenCV SGBM prefilter: horizontal Sobel clipped about prefilter_cap.

    out = clip(sobel_x(g)/? + cap, 0, 2*cap); OpenCV uses the raw 3x3 x-Sobel
    response (scale 1) with replicate borders.
    """
    g = jnp.asarray(gray, jnp.float32)
    gp = jnp.pad(g, 1, mode="edge")
    # 3x3 Sobel x: [[-1,0,1],[-2,0,2],[-1,0,1]]
    dx = (
        (gp[:-2, 2:] - gp[:-2, :-2])
        + 2.0 * (gp[1:-1, 2:] - gp[1:-1, :-2])
        + (gp[2:, 2:] - gp[2:, :-2])
    )
    cap = jnp.float32(prefilter_cap)
    return jnp.clip(dx + cap, 0.0, 2.0 * cap)


def _bt_bounds(img: jax.Array):
    """Per-pixel min/max of the linearly interpolated half-sample neighborhood
    (Birchfield-Tomasi). Returns (lo, hi) arrays shaped like img.

    Half-samples use floor((a+b)/2), matching OpenCV's integer division in
    calcPixelCostBT — on integer prefiltered images this keeps our costs
    bit-identical to cv2's instead of off by half a level (which flips WTA
    near-ties and inflates parity RMSE)."""
    left = jnp.floor(0.5 * (img + jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)))
    right = jnp.floor(0.5 * (img + jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)))
    lo = jnp.minimum(jnp.minimum(left, right), img)
    hi = jnp.maximum(jnp.maximum(left, right), img)
    return lo, hi


@partial(jax.jit, static_argnames=("num_disparities", "min_disparity"))
def bt_cost_volume(
    left: jax.Array,
    right: jax.Array,
    num_disparities: int = 128,
    min_disparity: int = 0,
) -> jax.Array:
    """Birchfield-Tomasi cost volume (H, W, D), float32.

    cost(y, x, d) = BT(left(y, x), right(y, x - (min_disparity + d))).
    Out-of-range samples get the maximum cost so they never win WTA.
    """
    L = jnp.asarray(left, jnp.float32)
    R = jnp.asarray(right, jnp.float32)
    H, W = L.shape
    lo_l, hi_l = _bt_bounds(L)
    lo_r, hi_r = _bt_bounds(R)
    max_cost = jnp.float32(1e9)

    def cost_at(d):
        shift = min_disparity + d
        # right image sampled at x - shift: left-pad by shift
        def shifted(a):
            return jnp.roll(a, shift, axis=1)

        Rv, Rlo, Rhi = shifted(R), shifted(lo_r), shifted(hi_r)
        c_ltr = jnp.maximum(0.0, jnp.maximum(L - Rhi, Rlo - L))
        c_rtl = jnp.maximum(0.0, jnp.maximum(Rv - hi_l, lo_l - Rv))
        c = jnp.minimum(c_ltr, c_rtl)
        x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        return jnp.where(x - shift >= 0, c, max_cost)

    vol = jax.vmap(cost_at, out_axes=2)(jnp.arange(num_disparities))
    return vol


@partial(jax.jit, static_argnames=("block_size",))
def box_aggregate(cost: jax.Array, block_size: int = 5) -> jax.Array:
    """Sum costs over a block_size x block_size window (replicate borders).

    Mirrors OpenCV SGBM's SAD-window aggregation; implemented with two
    cumulative-sum passes so the cost is O(HWD) independent of block size.
    """
    if block_size <= 1:
        return cost
    r = block_size // 2

    def box1d(a, axis):
        # direct taps, not cumsums: for the small SGBM windows (<= 11) this
        # is exact f32 addition (no prefix-sum cancellation noise), fuses
        # into one XLA pass, and avoids the log-depth cumsum lowering that
        # dominated the cost-volume time on TPU
        pad = [(0, 0)] * a.ndim
        pad[axis] = (r, r)
        ap = jnp.pad(a, pad, mode="edge")
        n = a.shape[axis]
        out = jax.lax.slice_in_dim(ap, 0, n, axis=axis)
        for k in range(1, block_size):
            out = out + jax.lax.slice_in_dim(ap, k, k + n, axis=axis)
        return out

    return box1d(box1d(cost, 0), 1)


@partial(jax.jit, static_argnames=("num_disparities", "min_disparity", "window"))
def census_cost_volume(
    left: jax.Array,
    right: jax.Array,
    num_disparities: int = 128,
    min_disparity: int = 0,
    window: int = 5,
) -> jax.Array:
    """Census-transform Hamming cost volume (H, W, D), float32.

    A window x window census signature per pixel (bit = neighbor > center),
    cost = Hamming distance. Radiometrically robust; the default cost for
    the production TPU path (BT kept for OpenCV parity testing).
    """
    def census(g):
        g = jnp.asarray(g, jnp.float32)
        r = window // 2
        gp = jnp.pad(g, r, mode="edge")
        bits = []
        for dy in range(window):
            for dx in range(window):
                if dy == r and dx == r:
                    continue
                bits.append(gp[dy:dy + g.shape[0], dx:dx + g.shape[1]] > g)
        # pack into two uint32 words (window=5 -> 24 bits)
        word = jnp.zeros(g.shape, jnp.uint32)
        for i, b in enumerate(bits[:32]):
            word = word | (b.astype(jnp.uint32) << jnp.uint32(i))
        return word

    cl = census(left)
    cr = census(right)
    H, W = cl.shape
    max_cost = jnp.float32(1e9)

    def popcount(v):
        v = v - ((v >> 1) & jnp.uint32(0x55555555))
        v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
        v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
        return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.float32)

    def cost_at(d):
        shift = min_disparity + d
        crs = jnp.roll(cr, shift, axis=1)
        h = popcount(cl ^ crs)
        x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        return jnp.where(x - shift >= 0, h, max_cost)

    return jax.vmap(cost_at, out_axes=2)(jnp.arange(num_disparities))
