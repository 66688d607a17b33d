"""Semi-global matching: path aggregation, WTA, subpixel, validity filtering.

The TPU answer to cv2.StereoSGBM.compute (depth4.py:254-255). SGM's per-
scanline recurrence is inherently sequential, so each direction becomes a
lax.scan along that axis with the whole orthogonal axis x disparity plane
(rows, 128) carried — a full VPU register tile per step, which is exactly
the "blockwise scan with carried state" structure the survey calls out
(SURVEY.md section 5, long-context analog).

Directions: 4 (left/right/up/down — 'sgm4', the SGBM_3WAY-class fast mode)
or 8 (adds diagonals via column-shifted carries — 'sgm8', MODE_HH-class).

Post-processing mirrors OpenCV's: uniqueness-ratio rejection, parabolic
subpixel interpolation, left-right consistency from the shared aggregated
volume (replacing the second full SGBM.compute the reference runs at
depth4.py:255), and speckle removal by bounded label propagation.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.utils.vma import vary_like

BIG = np.float32(1e9)  # numpy: no device op at import time


def _sgm_step(carry, c, P1, P2):
    """One scanline step: carry (M, D) -> aggregated (M, D)."""
    m = jnp.min(carry, axis=-1, keepdims=True)
    dm = jnp.concatenate([jnp.full_like(carry[:, :1], BIG), carry[:, :-1]], axis=1)
    dp = jnp.concatenate([carry[:, 1:], jnp.full_like(carry[:, :1], BIG)], axis=1)
    cand = jnp.minimum(jnp.minimum(carry, m + P2), jnp.minimum(dm, dp) + P1)
    return c + cand - m


def _scan_dir(cost: jax.Array, axis: int, reverse: bool, P1, P2, col_shift: int = 0):
    """Aggregate along `axis` (0=rows top/bottom, 1=cols left/right).

    col_shift (+1/-1) turns a vertical scan into a diagonal one by shifting
    the carry along the orthogonal axis each step (zero-filled edge, which
    re-initializes border paths to pure matching cost).
    """
    vol = jnp.swapaxes(cost, 0, axis) if axis != 0 else cost  # (T, M, D)

    def step(carry, c):
        if col_shift:
            carry = jnp.roll(carry, col_shift, axis=0)
            if col_shift > 0:
                carry = carry.at[:col_shift].set(0.0)
            else:
                carry = carry.at[col_shift:].set(0.0)
        out = _sgm_step(carry, c, P1, P2)
        return out, out

    init = vary_like(jnp.zeros_like(vol[0]), vol)
    # modest unroll: amortizes per-step loop overhead (the scans are
    # latency-bound, not FLOP-bound) without the minutes-long compiles
    # unroll=16 caused at 1080p; the production TPU path is sgm_pallas
    _, out = jax.lax.scan(step, init, vol, reverse=reverse, unroll=4)
    return jnp.swapaxes(out, 0, axis) if axis != 0 else out


@partial(jax.jit, static_argnames=("num_directions",))
def aggregate(cost: jax.Array, p1: float, p2: float, num_directions: int = 4) -> jax.Array:
    """Sum of SGM path costs over 3, 4 or 8 directions. cost: (H, W, D).

    3 = {L->R, R->L, top->bottom}, the direction set of cv2's
    STEREO_SGBM_MODE_SGBM_3WAY (the reference's production mode,
    depth4.py:157-170); 4 adds bottom->top (MODE_HH4); 8 adds diagonals.
    """
    P1 = jnp.float32(p1)
    P2 = jnp.float32(p2)
    # clip the sentinel so border-invalid costs don't poison sums
    c = jnp.minimum(cost, BIG)
    s = _scan_dir(c, 1, False, P1, P2)          # left -> right
    s = s + _scan_dir(c, 1, True, P1, P2)       # right -> left
    s = s + _scan_dir(c, 0, False, P1, P2)      # top -> bottom
    if num_directions == 3:
        return s
    s = s + _scan_dir(c, 0, True, P1, P2)       # bottom -> top
    if num_directions == 8:
        s = s + _scan_dir(c, 0, False, P1, P2, col_shift=1)   # down-right
        s = s + _scan_dir(c, 0, False, P1, P2, col_shift=-1)  # down-left
        s = s + _scan_dir(c, 0, True, P1, P2, col_shift=1)    # up-right
        s = s + _scan_dir(c, 0, True, P1, P2, col_shift=-1)   # up-left
    return s


def _subpixel(S: jax.Array, d0: jax.Array) -> jax.Array:
    """Parabolic refinement around the WTA disparity.

    Gather-free: TPU gathers over (H, W, D) are slow, so the three parabola
    samples come from a one-hot masked reduction over the (fast) lane axis.
    """
    D = S.shape[-1]
    d0c = jnp.clip(d0, 1, D - 2)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, S.shape, S.ndim - 1)
    onehot = d_idx == d0c[..., None]
    Sm = jnp.concatenate([S[..., :1], S[..., :-1]], axis=-1)   # S at d-1
    Sp = jnp.concatenate([S[..., 1:], S[..., -1:]], axis=-1)   # S at d+1
    pick = lambda V: jnp.sum(jnp.where(onehot, V, 0.0), axis=-1)
    c0, cm, cp = pick(S), pick(Sm), pick(Sp)
    denom = jnp.maximum(cm + cp - 2.0 * c0, 1e-6)
    delta = jnp.clip((cm - cp) / (2.0 * denom), -0.5, 0.5)
    refined = d0c.astype(jnp.float32) + delta
    # only refine interior optima
    return jnp.where((d0 >= 1) & (d0 <= D - 2), refined, d0.astype(jnp.float32))


def _uniqueness_mask(S: jax.Array, d0: jax.Array, uniqueness_ratio: int) -> jax.Array:
    """OpenCV uniqueness test: reject if any non-adjacent disparity comes
    within (1 + ratio/100) of the best cost."""
    if uniqueness_ratio <= 0:
        return jnp.ones(d0.shape, bool)
    best = jnp.min(S, axis=-1)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, S.shape, 2)
    adjacent = jnp.abs(d_idx - d0[..., None]) <= 1
    masked = jnp.where(adjacent, BIG, S)
    second = jnp.min(masked, axis=-1)
    return second * 100.0 > best * (100.0 + uniqueness_ratio)


def right_disparity_from_volume(S: jax.Array) -> jax.Array:
    """Right-view WTA from the left aggregated volume:
    S_R(y, x, d) = S_L(y, x + d, d). Replaces the reference's second
    (right-matcher) SGBM.compute (depth4.py:255).

    Implemented as D static column shifts (lane moves) instead of a
    (H, W, D) gather — gathers at this size cost hundreds of ms on TPU,
    shifts are nearly free and fuse with the argmin.
    """
    H, W, D = S.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    best = jnp.full((H, W), BIG)
    arg = jnp.zeros((H, W), jnp.int32)
    for d in range(D):
        # S(:, x + d, d), out-of-range -> BIG
        col = jnp.concatenate([S[:, d:, d], jnp.full((H, d), BIG)], axis=1) if d else S[:, :, 0]
        take = col < best
        best = jnp.where(take, col, best)
        arg = jnp.where(take, d, arg)
    return arg


def lr_consistency_mask(d_left: jax.Array, d_right: jax.Array,
                        max_diff: int = 1, num_disparities: int = None) -> jax.Array:
    """Validity via left-right check: |dL(x) - dR(x - dL(x))| <= max_diff.

    Gather-free: for each candidate disparity d (static loop), shift d_right
    right by d and compare where dL == d.
    """
    H, W = d_left.shape
    dl = jnp.round(d_left).astype(jnp.int32)
    if num_disparities is None:
        num_disparities = 256  # conservative cap; callers pass the real D
    ok = jnp.zeros((H, W), bool)
    for d in range(num_disparities):
        # d_right evaluated at x - d (shift right by d; left edge invalid)
        dr = d_right if d == 0 else jnp.concatenate(
            [jnp.full((H, d), -10_000, d_right.dtype), d_right[:, :-d]], axis=1)
        ok = ok | ((dl == d) & (jnp.abs(d - dr) <= max_diff))
    return ok


@partial(jax.jit, static_argnames=("window_size", "iterations"))
def speckle_filter(disp: jax.Array, valid: jax.Array, max_range: float = 32.0,
                   window_size: int = 50, iterations: int = 0) -> jax.Array:
    """cv2.filterSpeckles-style small-region removal (depth2.py speckle 50/32).

    Connected components (4-neighborhood, with an edge where
    |d_p - d_q| <= max_range) smaller than window_size are invalidated.
    Exact labeling via the classic parallel hook + pointer-jumping scheme:
    each round takes the min label over connected neighbors, then compresses
    twice (label <- label-of-label), converging in O(log(H*W)) rounds — the
    GPU/TPU-friendly replacement for OpenCV's sequential flood fill.
    Returns the updated validity mask.
    """
    import math

    H, W = disp.shape
    if iterations <= 0:
        iterations = int(math.ceil(math.log2(H * W))) + 4
    SENT = jnp.int32(H * W)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    label0 = jnp.where(valid, idx, SENT)

    def neighbor_min(l):
        lmin = l
        for axis in (0, 1):
            for shift in (1, -1):
                dn = jnp.roll(disp, shift, axis=axis)
                ln = jnp.roll(l, shift, axis=axis)
                edge_ok = jnp.abs(disp - dn) <= max_range
                coord = jax.lax.broadcasted_iota(jnp.int32, (H, W), axis)
                n = disp.shape[axis]
                inb = (coord - shift >= 0) & (coord - shift < n)
                cand = jnp.where(edge_ok & inb, ln, SENT)
                lmin = jnp.minimum(lmin, cand)
        return jnp.where(valid, lmin, SENT)

    def compress(l):
        flat = jnp.concatenate([l.reshape(-1), jnp.array([SENT], jnp.int32)])
        return flat[l]

    def body(_, l):
        l = neighbor_min(l)
        l = compress(compress(l))
        return l

    labels = jax.lax.fori_loop(0, iterations, body, label0)
    counts = jnp.zeros((H * W + 1,), jnp.int32).at[labels.reshape(-1)].add(1)
    region_size = counts[labels]
    return valid & (region_size > window_size)


@partial(jax.jit, static_argnames=("max_range", "window_size", "side",
                                   "max_disparity"))
def speckle_filter_fast(disp: jax.Array, valid: jax.Array,
                        max_range: float = 32.0, window_size: int = 50,
                        side: int | None = None,
                        max_disparity: int = 256) -> jax.Array:
    """Gather-free approximate speckle removal for the TPU hot path.

    cv2.filterSpeckles (depth2.py speckle 50/32) removes connected
    components (neighbor step <= max_range) smaller than window_size pixels
    by sequential flood fill. Exact labeling needs gathers (TPU has no
    vector gather; the round-1 pointer-jumping port cost ~770 ms/frame at
    1080p). This approximation scores each pixel by the number of valid
    same-disparity-band pixels (band width max_range, two phase-shifted
    binnings, max of the two scores) inside a side x side window, and
    invalidates scores <= window_size. Pure box filters: ~1 ms at 1080p.

    Approximation vs cv2: (a) thin connected structures longer than `side`
    can be under-counted and lost; (b) disconnected same-band mass inside
    the window can rescue a true speckle. Both are rare on SGM outputs;
    agreement with the exact filter is asserted in tests. Use
    speckle_filter() when exact cv2 semantics matter more than speed.
    """
    if side is None:
        # window big enough that a compact component of window_size pixels
        # (diameter ~2.5*sqrt(size) even for ragged blobs) fits entirely
        side = 2 * int(2.5 * float(window_size) ** 0.5 / 2.0 + 1.0) + 1

    H, W = disp.shape
    r = side // 2
    occ_weight = valid.astype(jnp.float32)

    # box sums as banded matmuls: Bh @ a @ Bw with 0/1 bands of half-width
    # r — the MXU does this in ~0.1 ms where chained cumsums cost ms on the
    # VPU; borders truncate like a zero-padded box. HIGHEST precision keeps
    # the integer counts exact (bf16 passes would wobble the threshold).
    ii = jnp.arange(H)
    Bh = (jnp.abs(ii[:, None] - ii[None, :]) <= r).astype(jnp.float32)
    jj = jnp.arange(W)
    Bw = (jnp.abs(jj[:, None] - jj[None, :]) <= r).astype(jnp.float32)

    nbins = int(max_disparity / max_range) + 2
    phases = (0.0, 0.5 * max_range)
    bins = [jnp.floor((disp + ph) / max_range).astype(jnp.int32)
            for ph in phases]
    # one batched einsum for every (phase, bin) occupancy plane: the MXU
    # does all 2*nbins box filters at once where per-bin calls pay ~1.7 ms
    # of dispatch each
    occ = jnp.stack([occ_weight * (bid == b)
                     for bid in bins for b in range(nbins)])
    if side <= 256:
        # exact in ONE bf16 MXU pass (vs ~6 passes for f32 HIGHEST): the
        # 0/1 inputs are bf16-exact, the W-box intermediate is an integer
        # <= side <= 256 (bf16-exact), and the MXU accumulates in f32 so
        # the final counts <= side^2 are exact too
        t = jnp.einsum("bjk,kl->bjl", occ.astype(jnp.bfloat16),
                       Bw.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        boxed = jnp.einsum("ij,bjl->bil", Bh.astype(jnp.bfloat16),
                           t.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        boxed = jnp.einsum("ij,bjk,kl->bil", Bh, occ, Bw,
                           precision=jax.lax.Precision.HIGHEST)
    score = jnp.zeros((H, W), jnp.float32)
    i = 0
    for bid in bins:
        cnt = jnp.zeros((H, W), jnp.float32)
        for b in range(nbins):
            cnt = cnt + jnp.where(bid == b, boxed[i], 0.0)
            i += 1
        score = jnp.maximum(score, cnt)
    return valid & (score > window_size)


@partial(jax.jit, static_argnames=(
    "num_disparities", "min_disparity", "block_size", "num_directions",
    "uniqueness_ratio", "disp12_max_diff", "speckle_window_size", "do_subpixel",
    "cost_kind", "pre_filter_cap",
))
def sgm_disparity(
    left_gray: jax.Array,
    right_gray: jax.Array,
    num_disparities: int = 128,
    min_disparity: int = 0,
    block_size: int = 5,
    p1: float | None = None,
    p2: float | None = None,
    num_directions: int = 4,
    uniqueness_ratio: int = 10,
    disp12_max_diff: int = 1,
    speckle_window_size: int = 50,
    speckle_range: float = 32.0,
    pre_filter_cap: int = 63,
    do_subpixel: bool = True,
    cost_kind: str = "bt",
) -> Tuple[jax.Array, jax.Array]:
    """Full SGM pipeline: gray pair -> (disparity float32, valid bool).

    Disparity includes min_disparity; invalid pixels hold -1. Parameters
    default to the reference's final configuration (depth4.py:151-170).
    """
    from recon3d_tpu.depth import cost as _cost

    if p1 is None:
        p1 = 8.0 * block_size * block_size
    if p2 is None:
        p2 = 32.0 * block_size * block_size

    if cost_kind == "bt":
        lpre = _cost.xsobel_prefilter(left_gray, pre_filter_cap)
        rpre = _cost.xsobel_prefilter(right_gray, pre_filter_cap)
        vol = _cost.bt_cost_volume(lpre, rpre, num_disparities, min_disparity)
    elif cost_kind == "census":
        vol = _cost.census_cost_volume(left_gray, right_gray, num_disparities,
                                       min_disparity)
        # census costs are small (<=24); scale penalties accordingly
        p1 = p1 / (8.0 * block_size * block_size) * 6.0
        p2 = p2 / (32.0 * block_size * block_size) * 64.0
    else:
        raise ValueError(f"unknown cost kind {cost_kind}")
    # Zero (not sentinel) out-of-range cells before the box: 1e5-scale
    # sentinels inside the f32 cumsums push prefixes past 2^24 and cost the
    # low bits of every downstream window. The touched-window mask is exact:
    # [x-r, x+r] crosses x - (min_disparity+d) < 0 iff x < min_disparity+d+r.
    vol = _cost.box_aggregate(jnp.where(vol > 1e8, 0.0, vol), block_size)
    xi = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 1)
    di = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 2)
    vol = jnp.where(xi < min_disparity + di + block_size // 2, 1e5, vol)

    S = aggregate(vol, p1, p2, num_directions)

    d0 = jnp.argmin(S, axis=-1).astype(jnp.int32)
    disp = _subpixel(S, d0) if do_subpixel else d0.astype(jnp.float32)

    valid = _uniqueness_mask(S, d0, uniqueness_ratio)
    if disp12_max_diff >= 0:
        d_right = right_disparity_from_volume(S)
        valid = valid & lr_consistency_mask(d0.astype(jnp.float32), d_right,
                                            disp12_max_diff, num_disparities)
    # borders where no disparity could match
    x = jax.lax.broadcasted_iota(jnp.int32, disp.shape, 1)
    valid = valid & (x - (min_disparity + d0) >= 0)
    if speckle_window_size > 0:
        valid = speckle_filter(disp, valid, speckle_range, speckle_window_size)

    disp_out = jnp.where(valid, disp + jnp.float32(min_disparity), -1.0)
    return disp_out, valid
