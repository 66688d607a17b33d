"""Pallas TPU semi-global matching: the production depth hot path.

Re-implements cv2.StereoSGBM.compute (reference depth4.py:254-255) as five
fused Pallas kernels over a uint16 cost volume, replacing the lax.scan
implementation in sgm.py (which is kept as the portable/oracle fallback).

Why this shape:
- The (H, W, D) volume at 1080p/D=128 is ~0.5 GB in uint16; HBM traffic, not
  FLOPs, bounds SGM on TPU. Costs are stored once and each directional pass
  streams it once (read) and writes one partial-sum volume, giving ~7 GB of
  traffic total (~9 ms at v5e bandwidth) instead of the many full-volume f32
  materializations XLA produces for the scan version.
- All arithmetic is integer-valued: Birchfield-Tomasi costs on the x-Sobel
  prefilter step in halves, so everything is scaled x2 into exact uint16
  integers (max path sum 4*(12800+P2) < 65536). f32 holds these exactly in
  the kernels; stores round-trip losslessly through uint16.
- Per-scanline recurrences run as fori_loops inside the kernels with the
  carry in VMEM scratch that persists across sequential grid steps — the
  1920-step unrolled lax.scan HLO (209 s compiles) disappears.
- The finalize kernel computes WTA, parabolic subpixel, uniqueness, the
  right-view disparity S_R(x, d) = S(x + d, d) and the left-right check
  WITHOUT gathers: per-pixel shifts are composed from log2(D) masked rolls
  (TPU has no vector gather; rolls are sublane moves).

Directions: 4 (left/right/up/down), the SGBM_3WAY-class fast mode the
reference runs (depth4.py:157-170). 8-direction mode stays on the XLA path.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recon3d_tpu.depth import cost as _cost

# Invalid-disparity sentinel in x2-scaled box-cost units. Any box window
# touching an out-of-range (x - d < 0) sample gets exactly this cost: larger
# than any real cost (<= 2 * 126 * 25 = 6300) so WTA never picks it unless
# every candidate is out of range, small enough that 4-direction path sums
# stay below 65536.
INVALID_COST = 12800.0
_BIG = 65535.0


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_xtile(w: int) -> Tuple[int, int]:
    """(padded_W, xtile): smallest padding first, then the widest tile.

    Tiles are capped at 256 columns so each kernel's working set (uint16
    in/out blocks double-buffered + two f32 staging scratches) stays inside
    ~8 MB of VMEM.
    """
    best = None
    for xt in (256, 192, 128):
        wp = _ceil_to(w, xt)
        if best is None or wp < best[0] or (wp == best[0] and xt > best[1]):
            best = (wp, xt)
    return best


def _u16f(x: jax.Array) -> jax.Array:
    """uint16 -> f32 via int32 (Mosaic has no direct uint16->f32 cast)."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _fu16(x: jax.Array) -> jax.Array:
    """f32 (exact integer-valued) -> uint16 via int32."""
    return x.astype(jnp.int32).astype(jnp.uint16)


def _path_step(carry: jax.Array, c: jax.Array, p1: float, p2: float) -> jax.Array:
    """One SGM recurrence step. carry, c: (M, D) f32 -> (M, D) f32.

    Lane shifts use native rotates + iota masks (concatenate of offset
    register layouts is not lowerable in Mosaic).
    """
    D = carry.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, carry.shape, carry.ndim - 1)
    m = jnp.min(carry, axis=-1, keepdims=True)
    dm = jnp.where(lane == 0, _BIG, pltpu.roll(carry, 1, axis=carry.ndim - 1))
    dp = jnp.where(lane == D - 1, _BIG,
                   pltpu.roll(carry, D - 1, axis=carry.ndim - 1))
    cand = jnp.minimum(jnp.minimum(carry, m + p2), jnp.minimum(dm, dp) + p1)
    return c + cand - m


def _mk_hscan_kernel(xt: int, p1: float, p2: float, reverse: bool, accumulate: bool):
    """Horizontal scan kernel: grid (bands, xtiles); carry (BH, D) scratch.

    The scan processes 16-column chunks: one aligned (BH, 16, D) uint16 tile
    load per chunk (Mosaic has no strided sublane access for packed 16-bit
    vectors — a (BH, 1, D) i16 load is rejected, but a full 16-sublane tile
    is fine), 16 recurrence steps on register values, one aligned store.
    """
    n_chunks = xt // 16
    assert n_chunks * 16 == xt

    def kernel(*refs):
        if accumulate:
            cost_ref, acc_ref, out_ref, carry_ref = refs
        else:
            cost_ref, out_ref, carry_ref = refs
            acc_ref = None

        @pl.when(pl.program_id(1) == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        def chunk_body(ci, carry):
            c0 = ((n_chunks - 1 - ci) if reverse else ci) * 16
            c0 = pl.multiple_of(c0, 16)
            chunk = _u16f(cost_ref[:, pl.ds(c0, 16), :])  # (BH, 16, D) f32
            acc = None if acc_ref is None else _u16f(acc_ref[:, pl.ds(c0, 16), :])
            outs = []
            order = range(15, -1, -1) if reverse else range(16)
            for x in order:
                carry = _path_step(carry, chunk[:, x, :], p1, p2)
                outs.append(carry if acc is None else carry + acc[:, x, :])
            if reverse:
                outs = outs[::-1]
            out_ref[:, pl.ds(c0, 16), :] = _fu16(jnp.stack(outs, axis=1))
            return carry

        carry_ref[:] = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                         carry_ref[:])

    return kernel


def _mk_vscan_kernel(bh: int, p1: float, p2: float, reverse: bool):
    """Vertical scan kernel: grid (xtiles, bands); carry (XT, D) scratch."""

    def kernel(cost_ref, acc_ref, out_ref, carry_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        def body(i, carry):
            y = (bh - 1 - i) if reverse else i
            c = _u16f(cost_ref[y])
            out = _path_step(carry, c, p1, p2)
            out_ref[y] = _fu16(out + _u16f(acc_ref[y]))
            return out

        carry_ref[:] = jax.lax.fori_loop(0, bh, body, carry_ref[:])

    return kernel


def _mk_finalize_kernel(fh: int, d_real: int, d_pad: int, w_pad: int,
                        w_real: int, uniqueness_ratio: int,
                        disp12_max_diff: int, do_subpixel: bool):
    """Per-row WTA + subpixel + uniqueness + right-WTA shear + LR check.

    Gather-free: the volume shear S_R(x, d) = S(x + d, d) and the per-pixel
    lookup d_R(x - d_L(x)) are composed from log2(D) masked rolls along the
    sublane (x) axis.
    """
    shift_bits = []
    b = 1
    while b < d_pad:
        shift_bits.append(b)
        b *= 2

    def kernel(s_ref, disp_ref, valid_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (w_pad, d_pad), 1)
        xcol = jax.lax.broadcasted_iota(jnp.int32, (w_pad, 1), 0)

        def row(y, _):
            S = _u16f(s_ref[y])  # (W, D)
            best = jnp.min(S, axis=-1, keepdims=True)
            is_min = S == best
            d0 = jnp.min(jnp.where(is_min, lane, d_pad), axis=-1,
                         keepdims=True)  # (W, 1) first (smallest-d) argmin

            if do_subpixel:
                d0c = jnp.clip(d0, 1, d_real - 2)
                onehot = lane == d0c
                Sm = jnp.concatenate([S[:, :1], S[:, :-1]], axis=-1)
                Sp = jnp.concatenate([S[:, 1:], S[:, -1:]], axis=-1)
                c0 = jnp.sum(jnp.where(onehot, S, 0.0), axis=-1, keepdims=True)
                cm = jnp.sum(jnp.where(onehot, Sm, 0.0), axis=-1, keepdims=True)
                cp = jnp.sum(jnp.where(onehot, Sp, 0.0), axis=-1, keepdims=True)
                denom = jnp.maximum(cm + cp - 2.0 * c0, 1e-6)
                delta = jnp.clip((cm - cp) / (2.0 * denom), -0.5, 0.5)
                refined = d0c.astype(jnp.float32) + delta
                interior = (d0 >= 1) & (d0 <= d_real - 2)
                disp = jnp.where(interior, refined, d0.astype(jnp.float32))
            else:
                disp = d0.astype(jnp.float32)

            if uniqueness_ratio > 0:
                adjacent = jnp.abs(lane - d0) <= 1
                second = jnp.min(jnp.where(adjacent, _BIG, S), axis=-1,
                                 keepdims=True)
                uniq = second * 100.0 > best * (100.0 + uniqueness_ratio)
            else:
                uniq = jnp.ones((w_pad, 1), bool)

            valid = uniq & (xcol >= d0)

            if disp12_max_diff >= 0:
                # right-view WTA from the shared volume: T(x, d) = S(x+d, d)
                T = S
                for bshift in shift_bits:
                    # np.roll(T, -b) with the non-negative shift pltpu needs
                    T = jnp.where((lane & bshift) > 0,
                                  pltpu.roll(T, w_pad - bshift, axis=0), T)
                T = jnp.where(xcol + lane >= w_real, _BIG, T)
                bestR = jnp.min(T, axis=-1, keepdims=True)
                dR = jnp.min(jnp.where(T == bestR, lane, d_pad), axis=-1,
                             keepdims=True)
                # G(x) = dR(x - d0(x)), gather-free: build the lane-indexed
                # plane DR2(x, d) = dR(x - d) with per-lane uniform rolls
                # (shift amount = lane index, so masked-roll composition is
                # exact), then one-hot-pick lane d0(x). A direct composition
                # masked on d0's bits would be wrong: intermediate values at
                # other columns get routed by their own d0, not ours.
                DR2 = jnp.broadcast_to(dR, (w_pad, d_pad))
                for bshift in shift_bits:
                    DR2 = jnp.where((lane & bshift) > 0,
                                    pltpu.roll(DR2, bshift, axis=0), DR2)
                G = jnp.sum(jnp.where(lane == d0, DR2, 0), axis=-1,
                            keepdims=True)
                valid = valid & (jnp.abs(d0 - G) <= disp12_max_diff)

            disp_ref[y] = disp[:, 0]
            valid_ref[y] = valid[:, 0].astype(jnp.int32)
            return 0

        # fori_loop (not a static python loop) so the per-row temporaries
        # (~6 (W, D) f32 planes) are reused across rows instead of fh copies
        # being live at once — the static loop blew the scoped VMEM limit.
        jax.lax.fori_loop(0, fh, row, 0)

    return kernel


def cost_volume_u16(
    left_gray: jax.Array,
    right_gray: jax.Array,
    num_disparities: int,
    min_disparity: int = 0,
    block_size: int = 5,
    pre_filter_cap: int = 63,
) -> jax.Array:
    """x2-scaled, box-aggregated BT cost volume as (H, W, D) uint16.

    Matches sgm.py's XLA cost (x-Sobel prefilter -> BT -> blockSize box sum,
    cv2 SGBM semantics) exactly in x2 integer units; any window touching an
    out-of-range sample becomes INVALID_COST.
    """
    lpre = _cost.xsobel_prefilter(left_gray, pre_filter_cap)
    rpre = _cost.xsobel_prefilter(right_gray, pre_filter_cap)
    vol = _cost.bt_cost_volume(lpre, rpre, num_disparities, min_disparity)
    # Zero (not sentinel) the out-of-range cells before the box: the box runs
    # on f32 cumsums, and 1e5-scale sentinels push prefixes past 2^24 where
    # f32 stops being integer-exact. The invalid mask is re-derived exactly
    # below: a window [x-r, x+r] touches an out-of-range sample iff
    # x < (min_disparity + d) + r.
    vol = jnp.where(vol > 1e8, 0.0, vol * 2.0)
    box = _cost.box_aggregate(vol, block_size)
    H, W, D = box.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W, D), 1)
    d = jax.lax.broadcasted_iota(jnp.int32, (H, W, D), 2)
    invalid = x < (min_disparity + d) + block_size // 2
    box = jnp.where(invalid, INVALID_COST, box)
    return jnp.round(box).astype(jnp.uint16)


@partial(jax.jit, static_argnames=(
    "p1", "p2", "uniqueness_ratio", "disp12_max_diff", "do_subpixel",
    "num_disparities", "w_real", "interpret",
))
def aggregate_and_finalize(
    cost_u16: jax.Array,
    p1: float,
    p2: float,
    num_disparities: int,
    uniqueness_ratio: int = 10,
    disp12_max_diff: int = 1,
    do_subpixel: bool = True,
    w_real: int | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """4-direction aggregation + WTA/subpixel/uniqueness/LR on a padded
    uint16 cost volume. Returns (disp_raw f32 in d-index units, valid bool),
    both (H, W). Shapes must be pre-padded: H % 32 == 0, W and D % 128 == 0.
    """
    HP, WP, DP = cost_u16.shape
    assert HP % 32 == 0 and WP % 8 == 0 and DP % 128 == 0, cost_u16.shape
    _, XT = _pick_xtile(WP)
    assert WP % XT == 0, (WP, XT)
    BH, BH3, FH = 32, 16, 8
    nb, nx = HP // BH, WP // XT
    nb3 = HP // BH3
    p1f, p2f = float(p1) * 2.0, float(p2) * 2.0  # x2 cost scaling

    vol_shape = jax.ShapeDtypeStruct((HP, WP, DP), jnp.uint16)
    hblock = pl.BlockSpec((BH, XT, DP), lambda b, x: (b, x, 0),
                          memory_space=pltpu.VMEM)
    hblock_r = pl.BlockSpec((BH, XT, DP), lambda b, x: (b, nx - 1 - x, 0),
                            memory_space=pltpu.VMEM)
    vblock = pl.BlockSpec((BH3, XT, DP), lambda x, b: (b, x, 0),
                          memory_space=pltpu.VMEM)
    vblock_r = pl.BlockSpec((BH3, XT, DP), lambda x, b: (nb3 - 1 - b, x, 0),
                            memory_space=pltpu.VMEM)

    v1 = pl.pallas_call(
        _mk_hscan_kernel(XT, p1f, p2f, reverse=False, accumulate=False),
        grid=(nb, nx),
        in_specs=[hblock], out_specs=hblock, out_shape=vol_shape,
        scratch_shapes=[pltpu.VMEM((BH, DP), jnp.float32)],
        interpret=interpret,
    )(cost_u16)

    v2 = pl.pallas_call(
        _mk_hscan_kernel(XT, p1f, p2f, reverse=True, accumulate=True),
        grid=(nb, nx),
        in_specs=[hblock_r, hblock_r], out_specs=hblock_r, out_shape=vol_shape,
        scratch_shapes=[pltpu.VMEM((BH, DP), jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost_u16, v1)

    v3 = pl.pallas_call(
        _mk_vscan_kernel(BH3, p1f, p2f, reverse=False),
        grid=(nx, nb3),
        in_specs=[vblock, vblock], out_specs=vblock, out_shape=vol_shape,
        scratch_shapes=[pltpu.VMEM((XT, DP), jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost_u16, v2)

    s = pl.pallas_call(
        _mk_vscan_kernel(BH3, p1f, p2f, reverse=True),
        grid=(nx, nb3),
        in_specs=[vblock_r, vblock_r], out_specs=vblock_r, out_shape=vol_shape,
        scratch_shapes=[pltpu.VMEM((XT, DP), jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost_u16, v3)

    fband = pl.BlockSpec((FH, WP, DP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    frow = pl.BlockSpec((FH, WP), lambda b: (b, 0), memory_space=pltpu.VMEM)
    disp_raw, valid_i32 = pl.pallas_call(
        _mk_finalize_kernel(FH, num_disparities, DP, WP,
                            WP if w_real is None else w_real,
                            uniqueness_ratio, disp12_max_diff, do_subpixel),
        grid=(HP // FH,),
        in_specs=[fband],
        out_specs=(frow, frow),
        out_shape=(jax.ShapeDtypeStruct((HP, WP), jnp.float32),
                   jax.ShapeDtypeStruct((HP, WP), jnp.int32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s)

    return disp_raw, valid_i32 > 0


@partial(jax.jit, static_argnames=(
    "num_disparities", "min_disparity", "block_size", "p1", "p2",
    "uniqueness_ratio", "disp12_max_diff", "speckle_window_size",
    "pre_filter_cap", "do_subpixel", "speckle_method", "interpret",
))
def sgm_disparity_pallas(
    left_gray: jax.Array,
    right_gray: jax.Array,
    num_disparities: int = 128,
    min_disparity: int = 0,
    block_size: int = 5,
    p1: float | None = None,
    p2: float | None = None,
    uniqueness_ratio: int = 10,
    disp12_max_diff: int = 1,
    speckle_window_size: int = 50,
    speckle_range: float = 32.0,
    pre_filter_cap: int = 63,
    do_subpixel: bool = True,
    speckle_method: str = "fast",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in Pallas twin of sgm.sgm_disparity (4-direction mode).

    Gray pair -> (disparity float32 incl. min_disparity, -1 invalid; valid
    bool). Pads H to a multiple of 32 and W/D to multiples of 128 internally
    (edge-replicated image columns/rows; INVALID_COST disparity lanes).
    """
    from recon3d_tpu.depth import sgm as _sgm

    if p1 is None:
        p1 = 8.0 * block_size * block_size
    if p2 is None:
        p2 = 32.0 * block_size * block_size

    H, W = left_gray.shape
    HP = _ceil_to(H, 32)
    WP, _ = _pick_xtile(W)
    DP = _ceil_to(num_disparities, 128)

    # Cost on the REAL image (box_aggregate's own edge handling, byte-exact
    # with the XLA path), then pad the volume: INVALID_COST on extra
    # disparity lanes so they never win WTA, zeros on extra rows/columns so
    # a zero carry propagates unchanged and the reverse scans (bottom-up,
    # right-to-left) enter the real image with the zero-init carry an
    # unpadded scan would start with.
    cost = cost_volume_u16(jnp.asarray(left_gray, jnp.float32),
                           jnp.asarray(right_gray, jnp.float32),
                           num_disparities, min_disparity, block_size,
                           pre_filter_cap)
    if DP > num_disparities:
        cost = jnp.pad(cost, ((0, 0), (0, 0), (0, DP - num_disparities)),
                       constant_values=jnp.uint16(int(INVALID_COST)))
    if HP > H or WP > W:
        cost = jnp.pad(cost, ((0, HP - H), (0, WP - W), (0, 0)))

    disp_raw, valid = aggregate_and_finalize(
        cost, p1, p2, num_disparities, uniqueness_ratio, disp12_max_diff,
        do_subpixel, W, interpret)
    disp_raw = disp_raw[:H, :W]
    valid = valid[:H, :W]

    # borders where x - (min_disparity + d) < 0 are already LR/border-masked
    # against the d-index; re-check against min_disparity for parity with
    # sgm.sgm_disparity
    if min_disparity:
        x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        valid = valid & (x - (min_disparity + jnp.round(disp_raw).astype(jnp.int32)) >= 0)

    if speckle_window_size > 0:
        if speckle_method == "fast":
            valid = _sgm.speckle_filter_fast(
                disp_raw, valid, speckle_range, speckle_window_size,
                max_disparity=_ceil_to(num_disparities, 128))
        else:
            valid = _sgm.speckle_filter(disp_raw, valid, speckle_range,
                                        speckle_window_size)

    disp_out = jnp.where(valid, disp_raw + jnp.float32(min_disparity), -1.0)
    return disp_out, valid
