"""Pallas TPU semi-global matching: the production depth hot path.

Re-implements cv2.StereoSGBM.compute (reference depth4.py:254-255) as THREE
fused Pallas kernels over a uint16 cost volume, replacing the lax.scan
implementation in sgm.py (which is kept as the portable/oracle fallback):

  1. cost+fwd(+down) — Birchfield-Tomasi cost + box window computed from
     halo-DMA'd image slabs, fused with the forward-horizontal path scan
     and (in 4-direction mode) the downward-vertical path (both sweep
     top->bottom; the vertical carry lives in a per-column-tile scratch
     that persists across bands);
  2. bwd             — backward-horizontal path, accumulating onto v2;
  3. vert+finalize   — the remaining vertical path on full-width 8-row
     bands (up for 4-direction/HH4 mode, down for 3-direction/SGBM_3WAY
     mode — the reference's production mode, one path-scan cheaper), with
     WTA/subpixel/uniqueness/right-view/LR fused in, so the final
     aggregate volume S never touches HBM.

Why this shape:
- The (H, W, D) volume at 1080p/D=128 is ~0.5 GB in uint16 / ~1 GB in f32.
  The cost is stored once and each pass streams it once (~8 GB of HBM
  traffic total, ~10 ms at v5e bandwidth, overlapped under the VPU work)
  instead of the many full-volume f32 materializations XLA produces for
  the scan version. Measured end-to-end (full SGM incl. speckle at
  1080p/D=128): 963 ms (round-1 XLA scans) -> ~30 ms. The remaining time
  is VPU ALU at ~1 effective vector-op/cycle — the recurrences and
  masked-roll ladders are elementwise min/add chains the MXU can't host,
  and Mosaic exposes no 16-bit packed VPU arithmetic that would double
  lane throughput.
- All arithmetic is integer-valued: Birchfield-Tomasi costs on the x-Sobel
  prefilter step in halves, so everything is scaled x2 into exact integers
  (max path sum 4*(12800+P2) < 65536 < 2^24). The cost volume is stored
  uint16 (halving its streaming bytes); the inter-kernel path volumes
  (v1/v3) stay f32 — Mosaic casts u16<->f32 via i32, and a u16 round-trip
  measured slower (casts cost more VPU time than the HBM bytes saved).
  Either way every value is exact.
- Per-scanline recurrences run as fori_loops inside the kernels with the
  carry in VMEM scratch that persists across sequential grid steps — the
  1920-step unrolled lax.scan HLO (209 s compiles) disappears.
- The finalize kernel computes WTA, parabolic subpixel, uniqueness, the
  right-view disparity S_R(x, d) = S(x + d, d) and the left-right check
  WITHOUT gathers: per-pixel shifts are composed from log2(D) masked rolls
  (TPU has no vector gather; rolls are sublane moves).

Directions: 3 (left/right/down — exactly cv2 MODE_SGBM_3WAY, the mode the
reference runs, depth4.py:157-170), 4 (adds up, ~MODE_HH4), or 8
(~MODE_HH: adds the four diagonals — the two downward diagonals run as a
fourth kernel sweeping full-width bands top->bottom with column-shifted
carries, and the two upward diagonals fuse into the finalize kernel's
bottom->top sweep, so even in 8-direction mode the aggregate volume never
exists in HBM).
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
    """(padded_W, xtile): W padded to a lane multiple (the cost kernel's
    DMA windows must be 128-aligned), widest dividing tile <= 256 so each
    scan kernel's working set stays inside ~8 MB of VMEM."""
    wp = _ceil_to(w, 128)
    xt = 256 if wp % 256 == 0 else 128
    return wp, xt


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


def _shift_cols(carry: jax.Array, direction: int) -> jax.Array:
    """Shift a (W, D) carry one column along the sublane (x) axis:
    new[x] = old[x - direction], the entering column zeroed (a zero carry
    re-initializes the path: _path_step(0, c) == c). This is what turns a
    vertical sweep into a diagonal one (sgm.py _scan_dir's col_shift)."""
    W = carry.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, carry.shape, 0)
    if direction > 0:
        return jnp.where(col == 0, 0.0, pltpu.roll(carry, 1, axis=0))
    return jnp.where(col == W - 1, 0.0, pltpu.roll(carry, W - 1, axis=0))


def _mk_diag_down_kernel(fh: int, p1: float, p2: float):
    """Both downward-diagonal SGM paths (down-right and down-left, the
    col_shift=+1/-1 top->bottom scans of sgm.py aggregate) fused into one
    full-width band sweep, accumulated onto the path volume in place.

    Grid (bands,) top->bottom; the two (W, D) carries persist across bands
    in a (2, W, D) scratch. Padded columns stay exactly zero (their cost is
    zero and their entering carries are zero), so the carry entering the
    real image's right edge from the padding is the same zero the XLA
    twin's edge re-initialization produces.
    """

    def kernel(cost_ref, acc_ref, out_ref, carry_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        ca = carry_ref[0]  # down-right: receives from (y-1, x-1)
        cb = carry_ref[1]  # down-left:  receives from (y-1, x+1)
        for y in range(fh):
            c = _u16f(cost_ref[y])
            ca = _path_step(_shift_cols(ca, +1), c, p1, p2)
            cb = _path_step(_shift_cols(cb, -1), c, p1, p2)
            out_ref[y] = acc_ref[y] + ca + cb
        carry_ref[0] = ca
        carry_ref[1] = cb

    return kernel


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
            # acc/out volumes are f32 (exact integers < 2^24): skipping the
            # u16 round-trips saves ~4 vector ops/element/kernel-crossing
            acc = None if acc_ref is None else acc_ref[:, pl.ds(c0, 16), :]
            outs = []
            order = range(15, -1, -1) if reverse else range(16)
            for x in order:
                carry = _path_step(carry, chunk[:, x, :], p1, p2)
                outs.append(carry if acc is None else carry + acc[:, x, :])
            if reverse:
                outs = outs[::-1]
            out_ref[:, pl.ds(c0, 16), :] = jnp.stack(outs, axis=1)
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
            out_ref[y] = out + acc_ref[y]
            return out

        carry_ref[:] = jax.lax.fori_loop(0, bh, body, carry_ref[:])

    return kernel


def _mk_vscan_io_kernel(bh: int, p1: float, p2: float, reverse: bool,
                        nb: int, h_last: int):
    """Vertical scan with an explicit carry plane in/out — the row-sharded
    relay's building block (SURVEY.md section 2.5's ring-style carry
    exchange: each shard's final carry plane feeds the next shard).

    Grid (xtiles, bands). Down (reverse=False): the carry scratch starts
    from carry_in at band 0, and carry_out snapshots the carry AFTER the
    last REAL row h_last (rows below are this shard's zero padding, which
    must not contaminate the plane handed to the next shard). Up
    (reverse=True): padded rows below h_last are swept first with a zero
    carry (zero cost keeps it exactly zero); the carry is REPLACED by
    carry_in when the sweep enters row h_last, and carry_out is the final
    carry after row 0. Rows are unrolled (static python loop), so the
    h_last row test folds away everywhere except its own band.
    """
    band_of = h_last // bh
    row_in_band = h_last % bh

    def kernel(cin_ref, cost_ref, acc_ref, out_ref, cout_ref,
               carry_ref, snap_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            carry_ref[:] = cin_ref[:] if not reverse \
                else jnp.zeros_like(carry_ref)
            snap_ref[:] = jnp.zeros_like(snap_ref)

        carry = carry_ref[:]
        # the reverse sweep's BlockSpec maps grid step b to band nb-1-b;
        # h_last's band test must use the logical band index
        at_band = ((nb - 1 - b) if reverse else b) == band_of
        order = range(bh - 1, -1, -1) if reverse else range(bh)
        for y in order:
            if reverse and y == row_in_band:
                # entering the top shard-boundary row from the padding:
                # adopt the next shard's relayed carry
                carry = jnp.where(at_band, cin_ref[:], carry)
            c = _u16f(cost_ref[y])
            carry = _path_step(carry, c, p1, p2)
            out_ref[y] = carry + acc_ref[y]
            if not reverse and y == row_in_band:
                @pl.when(at_band)
                def _():
                    snap_ref[:] = carry  # noqa: B023 — bound per iteration

        carry_ref[:] = carry
        # every band (re)writes the carry-out block; the final visit wins
        cout_ref[:] = carry if reverse else snap_ref[:]

    return kernel


def _mk_diag_io_kernel(fh: int, p1: float, p2: float, reverse: bool,
                       nb: int, h_last: int):
    """Both diagonal SGM paths of one vertical direction with explicit
    carry-plane io — the row-sharded relay's diagonal building block
    (8-direction mode). Carry semantics mirror _mk_vscan_io_kernel
    (adopt carry_in at the shard-boundary real row, snapshot the carry
    after the last real row for the relay), with the (2, W, D) carry
    column-shifted before every row step exactly like
    _mk_diag_down_kernel / the finalize sweep's upward pair: plane 0
    receives from x-1 (down-right / up-right), plane 1 from x+1."""
    band_of = h_last // fh
    row_in_band = h_last % fh

    def kernel(cin_ref, cost_ref, acc_ref, out_ref, cout_ref,
               carry_ref, snap_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[:] = cin_ref[:] if not reverse \
                else jnp.zeros_like(carry_ref)
            snap_ref[:] = jnp.zeros_like(snap_ref)

        ca = carry_ref[0]
        cb = carry_ref[1]
        at_band = ((nb - 1 - b) if reverse else b) == band_of
        order = range(fh - 1, -1, -1) if reverse else range(fh)
        for y in order:
            if reverse and y == row_in_band:
                # entering the bottom shard-boundary real row from the
                # padding: adopt the next shard's relayed carry planes
                ca = jnp.where(at_band, cin_ref[0], ca)
                cb = jnp.where(at_band, cin_ref[1], cb)
            c = _u16f(cost_ref[y])
            ca = _path_step(_shift_cols(ca, +1), c, p1, p2)
            cb = _path_step(_shift_cols(cb, -1), c, p1, p2)
            out_ref[y] = acc_ref[y] + ca + cb
            if not reverse and y == row_in_band:
                @pl.when(at_band)
                def _():
                    snap_ref[0] = ca  # noqa: B023 — bound per iteration
                    snap_ref[1] = cb  # noqa: B023

        carry_ref[0] = ca
        carry_ref[1] = cb
        cout_ref[:] = jnp.stack([ca, cb], axis=0) if reverse \
            else snap_ref[:]

    return kernel


@partial(jax.jit, static_argnames=("p1", "p2", "reverse", "h_real",
                                   "interpret"))
def diag_carry(cost_u16: jax.Array, acc: jax.Array, carry_in: jax.Array,
               p1: float, p2: float, reverse: bool, h_real: int,
               interpret: bool = False):
    """One shard's diagonal path pair (down-right+down-left when
    reverse=False, up-right+up-left when reverse=True) with relayed
    (2, W, D) carry planes — vscan_carry's twin for the four diagonal
    paths of 8-direction mode. Sweeps full-width FH-row bands (the same
    layout as _mk_diag_down_kernel); p1/p2 are UNSCALED (cv2 units)."""
    HP, WP, DP = cost_u16.shape
    FH = 8
    nb = HP // FH
    bmap = (lambda b: (nb - 1 - b, 0, 0)) if reverse \
        else (lambda b: (b, 0, 0))
    dband = pl.BlockSpec((FH, WP, DP), bmap, memory_space=pltpu.VMEM)
    cblock = pl.BlockSpec((2, WP, DP), lambda b: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    out, carry_out = pl.pallas_call(
        _mk_diag_io_kernel(FH, float(p1) * 2.0, float(p2) * 2.0,
                           reverse, nb, h_real - 1),
        grid=(nb,),
        in_specs=[cblock, dband, dband],
        out_specs=(dband, cblock),
        out_shape=(jax.ShapeDtypeStruct((HP, WP, DP), jnp.float32),
                   jax.ShapeDtypeStruct((2, WP, DP), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, WP, DP), jnp.float32),
                        pltpu.VMEM((2, WP, DP), jnp.float32)],
        input_output_aliases={2: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(carry_in, cost_u16, acc)
    return out, carry_out


@partial(jax.jit, static_argnames=("p1", "p2", "reverse", "h_real",
                                   "interpret"))
def vscan_carry(cost_u16: jax.Array, acc: jax.Array, carry_in: jax.Array,
                p1: float, p2: float, reverse: bool, h_real: int,
                interpret: bool = False):
    """One shard's vertical path scan with relayed carry planes.

    cost_u16/acc: (HP, WP, DP) padded shard-local volumes (zero rows below
    h_real). carry_in: (WP, DP) f32 plane from the neighboring shard.
    Returns (acc + L_vert, carry_out). p1/p2 are UNSCALED (cv2 units);
    the x2 cost scaling is applied here like aggregate_and_finalize does.
    """
    HP, WP, DP = cost_u16.shape
    _, XT = _pick_xtile(WP)
    BH3 = 16
    nb = HP // BH3
    nx = WP // XT
    vblock = pl.BlockSpec((BH3, XT, DP), lambda x, b: (b, x, 0),
                          memory_space=pltpu.VMEM)
    cblock = pl.BlockSpec((XT, DP), lambda x, b: (x, 0),
                          memory_space=pltpu.VMEM)
    if reverse:
        vblock = pl.BlockSpec((BH3, XT, DP), lambda x, b: (nb - 1 - b, x, 0),
                              memory_space=pltpu.VMEM)
    out, carry_out = pl.pallas_call(
        _mk_vscan_io_kernel(BH3, float(p1) * 2.0, float(p2) * 2.0,
                            reverse, nb, h_real - 1),
        grid=(nx, nb),
        in_specs=[cblock, vblock, vblock],
        out_specs=(vblock, cblock),
        out_shape=(jax.ShapeDtypeStruct((HP, WP, DP), jnp.float32),
                   jax.ShapeDtypeStruct((WP, DP), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((XT, DP), jnp.float32),
                        pltpu.VMEM((XT, DP), jnp.float32)],
        input_output_aliases={2: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(carry_in, cost_u16, acc)
    return out, carry_out


def _finalize_body(S, fh: int, d_real: int, d_pad: int, w_pad: int,
                   w_real: int, uniqueness_ratio: int,
                   disp12_max_diff: int, do_subpixel: bool):
    """WTA + subpixel + uniqueness + right-WTA shear + LR check on one
    (fh, w_pad, d_pad) aggregate band S. Returns (disp f32, valid i32),
    both (fh, w_pad).

    Gather-free: the volume shear S_R(x, d) = S(x + d, d) is composed from
    log2(D) masked rolls along the sublane (x) axis; the per-pixel lookup
    d_R(x - d_L(x)) is the same log2(D) masked-roll ladder applied to the
    broadcast (fh, W, D) plane DR2(x, d) = dR(x - d), one-hot-picked at
    lane d0(x) (see the inline comment at the DR2 ladder for why the
    cheaper-looking alternatives are wrong or slower).
    """
    shift_bits = []
    b = 1
    while b < d_pad:
        shift_bits.append(b)
        b *= 2
    # pack cost*2^k + lane in f32 so ONE min-reduce yields both the minimum
    # and its smallest-lane argmin (cv2's tie rule). Values stay exact
    # integers: max 57.6k * 128 + 127 < 2^24.
    PK = float(1 << max(d_pad - 1, 1).bit_length())
    BIGP = 2.0 ** 24

    lane = jax.lax.broadcasted_iota(jnp.int32, (fh, w_pad, d_pad), 2)
    lanef = lane.astype(jnp.float32)
    xcol = jax.lax.broadcasted_iota(jnp.int32, (fh, w_pad, 1), 1)

    # keep the pack exact: S*PK + lane must stay below 2^24. 3/4-direction
    # sums never get close (max 4*(INVALID_COST + 2*P2) even at block 11);
    # 8-direction sums with block >= 9 can exceed it on all-invalid border
    # columns, where clamping at most re-ties garbage lanes (and ties break
    # to the smallest lane either way, cv2's rule).
    S = jnp.minimum(S, BIGP / PK - 1.0)
    P = S * PK + lanef
    mp = jnp.min(P, axis=-1, keepdims=True)
    d0f = mp - jnp.floor(mp / PK) * PK
    best = (mp - d0f) * (1.0 / PK)
    d0 = d0f.astype(jnp.int32)  # (FH, W, 1)

    if do_subpixel:
        d0c = jnp.clip(d0, 1, d_real - 2)
        onehot = lane == d0c
        Sm = jnp.concatenate([S[..., :1], S[..., :-1]], axis=-1)
        Sp = jnp.concatenate([S[..., 1:], S[..., -1:]], axis=-1)
        # c0 equals `best` except at clipped borders, where the parabola
        # is discarded anyway (interior mask below)
        c0 = best
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
        ms = jnp.min(jnp.where(adjacent, BIGP, P), axis=-1, keepdims=True)
        second = jnp.floor(ms * (1.0 / PK))
        uniq = second * 100.0 > best * (100.0 + uniqueness_ratio)
    else:
        uniq = jnp.ones((fh, w_pad, 1), bool)

    valid = uniq[..., 0] & (xcol[..., 0] >= d0[..., 0])

    if disp12_max_diff >= 0:
        # right-view WTA from the shared volume: T(x, d) = S(x+d, d);
        # the shift amount is the lane index (constant along x), so the
        # masked-roll ladder composes exactly
        T = P
        for bshift in shift_bits:
            # np.roll(T, -b) with the non-negative shift pltpu needs
            T = jnp.where((lane & bshift) > 0,
                          pltpu.roll(T, w_pad - bshift, axis=1), T)
        T = jnp.where(xcol + lane >= w_real, BIGP, T)
        mr = jnp.min(T, axis=-1, keepdims=True)
        dR = mr - jnp.floor(mr / PK) * PK  # (FH, W, 1) f32 lane index
        # G(x) = dR(x - d0(x)), gather-free: build the lane-indexed volume
        # DR2(x, d) = dR(x - d) with the log2(D) masked-roll ladder on the
        # broadcast (fh, W, D) plane, then one-hot-pick lane d0(x). A
        # direct ladder masked on d0's bits would be wrong (intermediate
        # values at other columns get routed by their own d0); a fori_loop
        # plane sweep with dynamic-shift rotates is exact but measured 25x
        # slower (dynamic lane rotates serialize), so the volume ladder
        # stays. d0 < d_real always: in-range lanes beat INVALID_COST
        # lanes, and all-invalid columns tie-break to lane 0.
        DR2 = jnp.broadcast_to(dR, (fh, w_pad, d_pad))
        for bshift in shift_bits:
            DR2 = jnp.where((lane & bshift) > 0,
                            pltpu.roll(DR2, bshift, axis=1), DR2)
        G = jnp.sum(jnp.where(lane == d0, DR2, 0.0), axis=-1)
        valid = valid & (jnp.abs(d0f[..., 0] - G) <= disp12_max_diff)

    return disp[..., 0], valid.astype(jnp.int32)


def _mk_wta_kernel(fh: int, d_real: int, d_pad: int, w_pad: int,
                   w_real: int, uniqueness_ratio: int,
                   disp12_max_diff: int, do_subpixel: bool):
    """WTA/subpixel/uniqueness/LR finalize on a PRE-AGGREGATED S band —
    the row-sharded path aggregates all vertical paths via relayed
    carry-plane scans first (vscan_carry), then finalizes row-locally."""

    def kernel(S_ref, disp_ref, valid_ref):
        disp, valid = _finalize_body(S_ref[:], fh, d_real, d_pad, w_pad,
                                     w_real, uniqueness_ratio,
                                     disp12_max_diff, do_subpixel)
        disp_ref[:] = disp
        valid_ref[:] = valid

    return kernel


@partial(jax.jit, static_argnames=("num_disparities", "uniqueness_ratio",
                                   "disp12_max_diff", "do_subpixel",
                                   "w_real", "interpret"))
def wta_finalize(S: jax.Array, num_disparities: int,
                 uniqueness_ratio: int = 10, disp12_max_diff: int = 1,
                 do_subpixel: bool = True, w_real: int | None = None,
                 interpret: bool = False):
    """Finalize a fully-aggregated (HP, WP, DP) f32 volume S into
    (disp_raw f32, valid bool). Row-local (the LR check's shear stays
    within a row), so the row-sharded path runs it per shard."""
    HP, WP, DP = S.shape
    FH = 8
    nbf = HP // FH
    fband = pl.BlockSpec((FH, WP, DP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    frow = pl.BlockSpec((FH, WP), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    disp_raw, valid_i32 = pl.pallas_call(
        _mk_wta_kernel(FH, num_disparities, DP, WP,
                       WP if w_real is None else w_real,
                       uniqueness_ratio, disp12_max_diff, do_subpixel),
        grid=(nbf,),
        in_specs=[fband],
        out_specs=(frow, frow),
        out_shape=(jax.ShapeDtypeStruct((HP, WP), jnp.float32),
                   jax.ShapeDtypeStruct((HP, WP), jnp.int32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=117 * 1024 * 1024),
        interpret=interpret,
    )(S)
    return disp_raw, valid_i32 > 0


def _mk_vfinalize_kernel(fh: int, d_real: int, d_pad: int, w_pad: int,
                         w_real: int, uniqueness_ratio: int,
                         disp12_max_diff: int, do_subpixel: bool,
                         p1: float, p2: float, reverse: bool,
                         with_diag: bool = False, with_bwd: bool = False):
    """Fused vertical scan + finalize on full-width FH-row bands.

    Grid (bands,) swept bottom->top (reverse=True: the upward path of
    4-direction mode) or top->bottom (reverse=False: the downward path of
    3-direction SGBM_3WAY-parity mode), with the vertical carry (W, D) in
    scratch (persists across sequential grid steps): each band computes
    its FH rows of S = v3 + L_vert in VMEM and finalizes them immediately,
    so the aggregate volume S never exists in HBM (a separate vertical
    kernel wrote ~1 GB of it at 1080p/D=128 and finalize re-read it).

    with_diag (8-direction mode, requires reverse=True) fuses the two
    UPWARD diagonal paths into the same bottom->top sweep: two extra
    column-shifted carries ride in the (3, W, D) scratch, so MODE_HH's
    eight paths still never materialize an HBM aggregate.
    """
    assert not with_diag or reverse, "diagonal finalize is the upward sweep"
    assert not (with_diag and with_bwd), "8-dir keeps the separate bwd pass"

    def kernel(cost_ref, v3_ref, disp_ref, valid_ref, carry_ref, *extra):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        if with_bwd:
            # band-local backward-horizontal path fused in: v3_ref here is
            # v1 (fwd[+down] only) and the band's L_bwd accumulates onto
            # it in VMEM scratch, so the v3 volume never round-trips HBM
            # (the separate bwd kernel read cost+v1 and wrote v3: ~2.6 GB
            # of traffic per 1080p frame). Same chunked recurrence as
            # _mk_hscan_kernel(reverse=True, accumulate=True) — bitwise
            # identical sums, band height fh instead of 64 (rows are
            # independent under a horizontal scan).
            bwd_s = extra[0]
            n_chunks = w_pad // 16

            def chunk_body(ci, carry_b):
                c0 = (n_chunks - 1 - ci) * 16
                c0 = pl.multiple_of(c0, 16)
                chunk = _u16f(cost_ref[:, pl.ds(c0, 16), :])
                acc = v3_ref[:, pl.ds(c0, 16), :]
                outs = []
                for x in range(15, -1, -1):
                    carry_b = _path_step(carry_b, chunk[:, x, :], p1, p2)
                    outs.append(carry_b + acc[:, x, :])
                bwd_s[:, pl.ds(c0, 16), :] = jnp.stack(outs[::-1], axis=1)
                return carry_b

            jax.lax.fori_loop(0, n_chunks, chunk_body,
                              jnp.zeros((fh, d_pad), jnp.float32))

        def v3_row(i):
            return bwd_s[i] if with_bwd else v3_ref[i]

        carry = carry_ref[0] if with_diag else carry_ref[:]
        if with_diag:
            cur = carry_ref[1]  # up-right: receives from (y+1, x-1)
            cul = carry_ref[2]  # up-left:  receives from (y+1, x+1)
        rows = [None] * fh
        order = range(fh - 1, -1, -1) if reverse else range(fh)
        for i in order:
            c = _u16f(cost_ref[i])
            carry = _path_step(carry, c, p1, p2)
            rows[i] = carry + v3_row(i)
            if with_diag:
                cur = _path_step(_shift_cols(cur, +1), c, p1, p2)
                cul = _path_step(_shift_cols(cul, -1), c, p1, p2)
                rows[i] = rows[i] + (cur + cul)
        if with_diag:
            carry_ref[0] = carry
            carry_ref[1] = cur
            carry_ref[2] = cul
        else:
            carry_ref[:] = carry
        S = jnp.stack(rows, axis=0)  # (FH, W, D) f32 aggregate

        disp, valid = _finalize_body(S, fh, d_real, d_pad, w_pad, w_real,
                                     uniqueness_ratio, disp12_max_diff,
                                     do_subpixel)
        disp_ref[:] = disp
        valid_ref[:] = valid

    return kernel


def _mk_cost_fwd_kernel(bh: int, xt: int, nx: int, d_pad: int, d_real: int,
                        h_real: int, w_real: int, w_pad: int, r: int,
                        block_size: int, min_disparity: int,
                        p1: float, p2: float, with_down: bool = True,
                        static_chunks: bool = True):
    """Fused cost + forward-horizontal + downward-vertical scan kernel.

    Grid (bands, xtiles), xtiles sequential left->right. Per grid step the
    kernel DMAs small halo'd image slabs (prefiltered values + BT bounds for
    both views; the right view pre-reversed along x so each column's D
    samples are one ascending slice), computes the Birchfield-Tomasi cost
    with its blockSize box sum column-by-column (vertical taps from the row
    halo, horizontal taps from a per-chunk column window), applies the
    forward SGM recurrence, and stores 16-column uint16 chunks of BOTH the
    cost volume and v2 = L_fwd (+ L_down, added by a second in-VMEM sweep
    over the freshly written band: the downward pass shares this kernel's
    top->bottom band order, with its per-column-tile carry in a
    (nx, XT, D) scratch that persists across bands).

    Replaces the XLA cost_volume_u16 + the standalone forward scan + a
    standalone down scan: the (H, W, D) f32 intermediates XLA materialized
    (45 ms at 1080p) never exist; HBM sees only the two outputs.
    """
    n_chunks = xt // 16
    assert n_chunks * 16 == xt
    assert xt % 128 == 0, "cost kernel xtiles must be lane-aligned for DMA"
    bhh = bh + 2 * r  # slab rows actually used
    # DMA slices of tiled refs must be tile-aligned: fetch 8-row-aligned,
    # 128-col-aligned slabs and ignore the over-fetch
    bhh_dma = _ceil_to(bhh, 8)
    lw_dma = _ceil_to(xt + 2 * r, 128)
    rw_dma = _ceil_to(xt + 2 * r + d_pad - 1 + min_disparity, 128)

    def kernel(lv_ref, llo_ref, lhi_ref, rv_ref, rlo_ref, rhi_ref,
               cost_ref, out_ref, carry_ref, vcarry_ref,
               lslab, rslab, sems):
        b = pl.program_id(0)
        x = pl.program_id(1)

        @pl.when(x == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        if with_down:
            @pl.when(b == 0)
            def _():
                vcarry_ref[x] = jnp.zeros_like(vcarry_ref[x])

        def down_sweep():
            """Add L_down onto the band's L_fwd (reading back the cost
            just stored). Skipped in 3-direction (SGBM_3WAY-parity) mode,
            where the downward path instead fuses into the finalize
            kernel."""
            if not with_down:
                return
            if static_chunks:
                vc = vcarry_ref[x]
                for y in range(bh):
                    vc = _path_step(vc, _u16f(cost_ref[y]), p1, p2)
                    out_ref[y] = out_ref[y] + vc
                vcarry_ref[x] = vc
            else:
                def row_body(y, vc):
                    vc = _path_step(vc, _u16f(cost_ref[y]), p1, p2)
                    out_ref[y] = out_ref[y] + vc
                    return vc

                vcarry_ref[x] = jax.lax.fori_loop(0, bh, row_body,
                                                  vcarry_ref[x])

        # ---- DMA halo'd slabs: L planes (bhh, xt+2r), R planes from the
        # reversed+padded right view (bhh, xt+2r+d_pad-1). Sources are
        # pre-padded by the caller so every slice is in-bounds. In the
        # reversed view RREV[u] = R(A - u) with A = WP - 1 + r, so for a
        # column gx and lane d the sample R(gx - min_disp - d) sits at
        # ascending in-slab offset (xt + 2r - 1 - cl) + d — no flips needed.
        row0 = pl.multiple_of(b * bh, 8)
        col_l = pl.multiple_of(x * xt, 128)  # xt is a multiple of 128
        # R window start kept 128-aligned by folding min_disparity into the
        # static in-slab offset (rstart) instead
        col_r = pl.multiple_of(w_pad - x * xt - xt, 128)
        copies = []
        for i, (src, dstslot) in enumerate(((lv_ref, 0), (llo_ref, 1),
                                            (lhi_ref, 2))):
            c = pltpu.make_async_copy(
                src.at[pl.ds(row0, bhh_dma), pl.ds(col_l, lw_dma)],
                lslab.at[dstslot], sems.at[i])
            c.start()
            copies.append(c)
        for i, (src, dstslot) in enumerate(((rv_ref, 0), (rlo_ref, 1),
                                            (rhi_ref, 2))):
            c = pltpu.make_async_copy(
                src.at[pl.ds(row0, bhh_dma), pl.ds(col_r, rw_dma)],
                rslab.at[dstslot], sems.at[3 + i])
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (bh, d_pad), 1)

        def raw_colsum(cl):
            """Box-vertical-summed x2-scaled BT cost column (bh, d_pad).

            cl: STATIC column index within the slab, in [0, xt + 2r). Lane d
            holds disparity d directly (ascending in the reversed right
            view). Static offsets only: Mosaic has no dynamic-lane loads.

            Right-edge replication (matching the XLA box_aggregate's edge
            padding of the raw cost column) happens in chunk_body: box
            windows crossing the last real column re-tap the edge column.
            """
            lv = lslab[0, :, pl.ds(cl, 1)]  # (bhh, 1)
            llo = lslab[1, :, pl.ds(cl, 1)]
            lhi = lslab[2, :, pl.ds(cl, 1)]
            rstart = xt + 2 * r - 1 - cl + min_disparity
            rv = rslab[0, :, pl.ds(rstart, d_pad)]  # (bhh, d_pad)
            rlo = rslab[1, :, pl.ds(rstart, d_pad)]
            rhi = rslab[2, :, pl.ds(rstart, d_pad)]
            # planes are pre-scaled x2 by the caller (BT is piecewise
            # linear with +-1 coefficients, so the scale folds through)
            c_ltr = jnp.maximum(0.0, jnp.maximum(lv - rhi, rlo - lv))
            c_rtl = jnp.maximum(0.0, jnp.maximum(rv - lhi, llo - rv))
            raw = jnp.minimum(c_ltr, c_rtl)  # (bhh, d_pad), x2 units
            out = raw[0:bh]
            for k in range(1, block_size):
                out = out + raw[k:k + bh]
            return out  # (bh, d_pad)

        # static positions of the last real column (for right-edge box
        # replication): it lives in grid column x_last at in-tile offset e0
        x_last = (w_real - 1) // xt
        e0 = (w_real - 1) - x_last * xt
        is_last_tile = x == x_last
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (bh, d_pad), 0)

        if not static_chunks:
            # dynamic column loop (interpret/testing mode): tiny trace, the
            # (2r+1) redundant colsum recomputes per column don't matter.
            # Mosaic can't lower the dynamic-lane accesses; the TPU build
            # uses the statically unrolled chunk path below.
            def col_body(c, carry):
                box = None
                for t in range(block_size):
                    idx = c + t
                    idx = jnp.where(is_last_tile,
                                    jnp.minimum(idx, e0 + r), idx)
                    col = raw_colsum(idx)
                    box = col if box is None else box + col
                gx = x * xt + c
                invalid = (gx < min_disparity + lane + r) | (lane >= d_real)
                invalid = invalid | (gx >= w_real)
                dead = ((row0 + row_iota) >= h_real) | (gx >= w_real)
                cost = jnp.where(invalid, INVALID_COST, box)
                cost = jnp.where(dead, 0.0, cost)
                carry = _path_step(carry, cost, p1, p2)
                cost_ref[:, pl.ds(c, 1), :] = _fu16(cost)[:, None, :]
                out_ref[:, pl.ds(c, 1), :] = carry[:, None, :]
                return carry

            carry_ref[:] = jax.lax.fori_loop(0, xt, col_body, carry_ref[:])
            down_sweep()
            return

        # dead rows (below the real image) are band-constant: hoist
        dead_rows = (row0 + row_iota) >= h_real
        carry = carry_ref[:]
        window = []  # raw colsums shared across chunk boundaries
        for ci in range(n_chunks):
            c0 = ci * 16
            cols = []
            # columns c0-r .. c0+15+r within the tile (slab col = tile col
            # + r offset, since the slab starts r columns left of the tile);
            # the 2r-wide overlap with the previous chunk is reused
            window = window[16:] if window else []
            lo = c0 + len(window)
            window = window + [raw_colsum(k) for k in
                               range(lo, c0 + 16 + 2 * r)]
            for k in range(16):
                if ci == 0 and k == 0:
                    box = window[0]
                    for t in range(1, block_size):
                        box = box + window[t]
                    prev = [window[t] for t in range(block_size)]
                else:
                    # rolling box: 2 ops instead of block_size-1 adds
                    # (f32 integer adds/subs, exact)
                    box = box + window[k + 2 * r] - prev.pop(0)
                    prev.append(window[k + 2 * r])
                c = c0 + k
                box_out = box
                if e0 - r < c <= e0:
                    # window crosses the last real column: replicate its
                    # raw-cost column, like the XLA box's edge padding.
                    # box_out (not the rolling accumulator `box`) takes the
                    # replicated value so the running sum stays clean
                    je = e0 + r - c0
                    box_cl = window[min(k, je)]
                    for t in range(1, block_size):
                        box_cl = box_cl + window[min(k + t, je)]
                    box_out = jnp.where(is_last_tile, box_cl, box)
                gx = x * xt + c
                invalid = (gx < min_disparity + lane + r) | (lane >= d_real)
                dead = dead_rows | (gx >= w_real)
                cost = jnp.where(invalid, INVALID_COST, box_out)
                cost = jnp.where(dead, 0.0, cost)
                carry = _path_step(carry, cost, p1, p2)
                cols.append((cost, carry))
            cost_ref[:, c0:c0 + 16, :] = _fu16(
                jnp.stack([c_ for c_, _ in cols], axis=1))
            out_ref[:, c0:c0 + 16, :] = jnp.stack([p for _, p in cols],
                                                  axis=1)
        carry_ref[:] = carry
        down_sweep()

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


def prefilter_planes(left_gray: jax.Array, right_gray: jax.Array,
                     pre_filter_cap: int):
    """The six per-pixel planes the cost kernel consumes: x-Sobel
    prefiltered values + BT lo/hi bounds for both views. Split out so the
    row-sharded path can compute planes shard-locally (the prefilter's
    vertical support is one raw-image halo row) and then halo-exchange
    PLANE rows — exchanging raw rows instead would double-replicate at
    global edges and diverge from the full-image prefilter."""
    lpre = _cost.xsobel_prefilter(jnp.asarray(left_gray, jnp.float32),
                                  pre_filter_cap)
    rpre = _cost.xsobel_prefilter(jnp.asarray(right_gray, jnp.float32),
                                  pre_filter_cap)
    lo_l, hi_l = _cost._bt_bounds(lpre)
    lo_r, hi_r = _cost._bt_bounds(rpre)
    return lpre, lo_l, hi_l, rpre, lo_r, hi_r


@partial(jax.jit, static_argnames=(
    "num_disparities", "min_disparity", "block_size", "pre_filter_cap",
    "p1", "p2", "hp", "wp", "dp", "with_down", "interpret",
))
def cost_fwd_down(
    left_gray: jax.Array,
    right_gray: jax.Array,
    num_disparities: int,
    min_disparity: int,
    block_size: int,
    pre_filter_cap: int,
    p1: float,
    p2: float,
    hp: int, wp: int, dp: int,
    with_down: bool = True,
    interpret: bool = False,
    planes=None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused Pallas cost volume + forward (+ optionally downward) scans.

    Returns (cost u16, v2 = L_fwd [+ L_down] f32), both (hp, wp, dp) with
    the padding conventions aggregate_and_finalize expects (zero rows/cols
    beyond the real image, INVALID_COST on out-of-range disparities).
    with_down=False is the 3-direction (cv2 SGBM_3WAY parity) mode, where
    the downward path fuses into the finalize kernel instead.

    planes (from prefilter_planes, possibly halo-extended by the
    row-sharded path) overrides the internal prefilter; left/right grays
    then only provide the shape.
    """
    H, W = left_gray.shape
    r = block_size // 2
    BH = 64
    XT = 128  # lane-aligned DMA windows require 128-multiple x tiles
    assert wp % XT == 0
    nb, nx = hp // BH, wp // XT
    bhh_dma = _ceil_to(BH + 2 * r, 8)
    lw_dma = _ceil_to(XT + 2 * r, 128)
    rw_dma = _ceil_to(XT + 2 * r + dp - 1 + min_disparity, 128)

    if planes is None:
        planes = prefilter_planes(left_gray, right_gray, pre_filter_cap)
    lpre, lo_l, hi_l, rpre, lo_r, hi_r = planes
    # fold the x2 integer scaling into the planes (BT is piecewise linear
    # with +-1 coefficients) — saves one multiply per colsum element
    lpre, rpre = lpre * 2.0, rpre * 2.0
    lo_l, hi_l, lo_r, hi_r = lo_l * 2.0, hi_l * 2.0, lo_r * 2.0, hi_r * 2.0

    # plane sizes give every (8, 128)-aligned DMA window headroom:
    # rows [b*BH, b*BH + bhh_dma), cols [x*XT, x*XT + lw_dma) for L and
    # [wp - (x+1)*XT, + rw_dma) for the reversed R view
    rows_top, rows_bot = r, (hp + bhh_dma - BH) - H - r
    lcols_r = (wp - XT + lw_dma) - W - r
    rcols_r = (wp - XT + rw_dma) - wp - r

    def pad_l(a):
        return jnp.pad(jnp.pad(a, ((0, 0), (0, wp - W)), mode="edge"),
                       ((rows_top, rows_bot), (r, lcols_r - (wp - W))),
                       mode="edge")

    def pad_r(a):
        a = jnp.pad(a, ((0, 0), (0, wp - W)), mode="edge")
        a = a[:, ::-1]  # reversed view: RREV[u] = R(wp - 1 + r - u)
        return jnp.pad(a, ((rows_top, rows_bot), (r, rcols_r)), mode="edge")

    planes = (pad_l(lpre), pad_l(lo_l), pad_l(hi_l),
              pad_r(rpre), pad_r(lo_r), pad_r(hi_r))

    vol_shape = jax.ShapeDtypeStruct((hp, wp, dp), jnp.uint16)
    # path volumes stay f32 between kernels: values are exact integers
    # < 2^24, and a u16 round-trip was measured slower (the casts cost
    # more VPU time than the halved HBM bytes saved on these
    # compute-bound kernels); only the BT cost itself is u16
    vol_shape_f = jax.ShapeDtypeStruct((hp, wp, dp), jnp.float32)
    hblock = pl.BlockSpec((BH, XT, dp), lambda b, x: (b, x, 0),
                          memory_space=pltpu.VMEM)
    cost, v2 = pl.pallas_call(
        _mk_cost_fwd_kernel(BH, XT, nx, dp, num_disparities, H, W, wp, r,
                            block_size, min_disparity,
                            float(p1) * 2.0, float(p2) * 2.0,
                            with_down=with_down,
                            static_chunks=not interpret),
        grid=(nb, nx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        out_specs=(hblock, hblock),
        out_shape=(vol_shape, vol_shape_f),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((BH, dp), jnp.float32),
            pltpu.VMEM((nx, XT, dp), jnp.float32),
            pltpu.VMEM((3, bhh_dma, lw_dma), jnp.float32),
            pltpu.VMEM((3, bhh_dma, rw_dma), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(*planes)
    return cost, v2


@partial(jax.jit, static_argnames=(
    "p1", "p2", "uniqueness_ratio", "disp12_max_diff", "do_subpixel",
    "num_disparities", "w_real", "interpret", "final_dir", "with_diag",
    "fuse_bwd",
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
    v1: jax.Array | None = None,
    final_dir: str = "up",
    with_diag: bool = False,
    fuse_bwd: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Path aggregation + WTA/subpixel/uniqueness/LR on a padded uint16
    cost volume. Returns (disp_raw f32 in d-index units, valid bool), both
    (H, W). Shapes must be pre-padded: H % 64 == 0, W % 8 == 0,
    D % 128 == 0.

    v1 is the fwd(+down) path volume from cost_fwd_down (computed here
    with standalone scans if None). final_dir picks the vertical path
    fused into the finalize kernel: "up" completes 4-direction mode
    (cv2 HH4 parity; v1 must already contain L_down), "down" completes
    3-direction mode (cv2 SGBM_3WAY parity; v1 is L_fwd alone).
    with_diag (requires final_dir == "up") adds the four diagonal paths
    for 8-direction MODE_HH parity: the downward pair as a band sweep
    accumulated onto v3, the upward pair fused into the finalize kernel.
    """
    assert final_dir in ("up", "down"), final_dir
    assert not with_diag or final_dir == "up", "8-direction mode ends up"
    assert not (fuse_bwd and with_diag), "8-dir keeps the separate bwd pass"
    HP, WP, DP = cost_u16.shape
    assert HP % 64 == 0 and WP % 8 == 0 and DP % 128 == 0, cost_u16.shape
    _, XT = _pick_xtile(WP)
    assert WP % XT == 0, (WP, XT)
    BH, BH3, FH = 64, 16, 8
    nb, nx = HP // BH, WP // XT
    nb3 = HP // BH3
    nbf = HP // FH
    p1f, p2f = float(p1) * 2.0, float(p2) * 2.0  # x2 cost scaling

    # path volumes (v1/v3) are f32 between kernels; only the BT cost is
    # u16 (a u16 round-trip measured slower: casts > HBM saved)
    vol_shape_f = jax.ShapeDtypeStruct((HP, WP, DP), jnp.float32)
    hblock = pl.BlockSpec((BH, XT, DP), lambda b, x: (b, x, 0),
                          memory_space=pltpu.VMEM)
    hblock_r = pl.BlockSpec((BH, XT, DP), lambda b, x: (b, nx - 1 - x, 0),
                            memory_space=pltpu.VMEM)

    if v1 is None:
        # standalone fwd scan (+ down scan in 4-direction mode); callers
        # normally get the fused volume from cost_fwd_down instead
        v1 = pl.pallas_call(
            _mk_hscan_kernel(XT, p1f, p2f, reverse=False, accumulate=False),
            grid=(nb, nx),
            in_specs=[hblock], out_specs=hblock, out_shape=vol_shape_f,
            scratch_shapes=[pltpu.VMEM((BH, DP), jnp.float32)],
            interpret=interpret,
        )(cost_u16)
        if final_dir == "up":
            vblock = pl.BlockSpec((BH3, XT, DP), lambda x, b: (b, x, 0),
                                  memory_space=pltpu.VMEM)
            v1 = pl.pallas_call(
                _mk_vscan_kernel(BH3, p1f, p2f, reverse=False),
                grid=(nx, nb3),
                in_specs=[vblock, vblock], out_specs=vblock,
                out_shape=vol_shape_f,
                scratch_shapes=[pltpu.VMEM((XT, DP), jnp.float32)],
                input_output_aliases={1: 0},
                compiler_params=None if interpret else pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interpret,
            )(cost_u16, v1)

    # backward-horizontal path accumulated onto v1 -> v3 (64-row bands,
    # right-to-left; measured faster than full-height strips, whose live
    # column set spills). With fuse_bwd the pass instead rides the
    # finalize kernel's band sweep (band-local VMEM accumulate), so the
    # v3 volume never exists in HBM (~2.6 GB less traffic per frame).
    v3 = v1 if fuse_bwd else pl.pallas_call(
        _mk_hscan_kernel(XT, p1f, p2f, reverse=True, accumulate=True),
        grid=(nb, nx),
        in_specs=[hblock_r, hblock_r], out_specs=hblock_r,
        out_shape=vol_shape_f,
        scratch_shapes=[pltpu.VMEM((BH, DP), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cost_u16, v1)

    if with_diag:
        # downward diagonal pair (down-right + down-left), top->bottom over
        # full-width FH-row bands, accumulated in place onto v3
        dband = pl.BlockSpec((FH, WP, DP), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        v3 = pl.pallas_call(
            _mk_diag_down_kernel(FH, p1f, p2f),
            grid=(nbf,),
            in_specs=[dband, dband], out_specs=dband,
            out_shape=vol_shape_f,
            scratch_shapes=[pltpu.VMEM((2, WP, DP), jnp.float32)],
            input_output_aliases={1: 0},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(cost_u16, v3)

    # fused vertical path + finalize on full-width bands (bottom->top for
    # "up", top->bottom for "down"); in 8-direction mode the two upward
    # diagonals ride the same sweep
    rev = final_dir == "up"
    bmap = (lambda b: (nbf - 1 - b, 0, 0)) if rev else (lambda b: (b, 0, 0))
    rmap = (lambda b: (nbf - 1 - b, 0)) if rev else (lambda b: (b, 0))
    fband = pl.BlockSpec((FH, WP, DP), bmap, memory_space=pltpu.VMEM)
    frow = pl.BlockSpec((FH, WP), rmap, memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((3, WP, DP), jnp.float32) if with_diag
               else pltpu.VMEM((WP, DP), jnp.float32)]
    if fuse_bwd:
        scratch.append(pltpu.VMEM((FH, WP, DP), jnp.float32))
    disp_raw, valid_i32 = pl.pallas_call(
        _mk_vfinalize_kernel(FH, num_disparities, DP, WP,
                             WP if w_real is None else w_real,
                             uniqueness_ratio, disp12_max_diff,
                             do_subpixel, p1f, p2f, reverse=rev,
                             with_diag=with_diag, with_bwd=fuse_bwd),
        grid=(nbf,),
        in_specs=[fband, fband],
        out_specs=(frow, frow),
        out_shape=(jax.ShapeDtypeStruct((HP, WP), jnp.float32),
                   jax.ShapeDtypeStruct((HP, WP), jnp.int32)),
        scratch_shapes=scratch,
        # 117 MB, not 100: the reverse ("up") sweep's stack liveness peaks
        # ~110 MB at 1080p/D=128 (the forward sweep fits 100), and v5e VMEM
        # is 128 MB — at 100 MB the 4/8-direction modes OOM'd at compile.
        # The fused-bwd variant adds an FH-band scratch (~8 MB at 1080p),
        # so it gets the remaining headroom.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=(126 if fuse_bwd else 117) * 1024 * 1024),
        interpret=interpret,
    )(cost_u16, v3)

    return disp_raw, valid_i32 > 0


@partial(jax.jit, static_argnames=(
    "num_disparities", "min_disparity", "block_size", "p1", "p2",
    "num_directions", "uniqueness_ratio", "disp12_max_diff",
    "speckle_window_size", "speckle_range", "pre_filter_cap",
    "do_subpixel", "speckle_method", "interpret",
))
def sgm_disparity_pallas(
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
    speckle_method: str = "fast",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in Pallas twin of sgm.sgm_disparity.

    num_directions=4 matches cv2 STEREO_SGBM_MODE_HH4 (L/R/up/down);
    num_directions=3 matches MODE_SGBM_3WAY (L/R/down) — the reference's
    production mode (depth4.py:157-170) — and runs one path-scan cheaper;
    num_directions=8 matches MODE_HH's full direction set (adds the four
    diagonals, at roughly 4/3 the aggregation cost of the 4-path mode).

    Gray pair -> (disparity float32 incl. min_disparity, -1 invalid; valid
    bool). Pads H to a multiple of 64 and W/D to multiples of 128 internally
    (edge-replicated image columns/rows; INVALID_COST disparity lanes).
    """
    from recon3d_tpu.depth import sgm as _sgm

    assert num_directions in (3, 4, 8), num_directions
    if p1 is None:
        p1 = 8.0 * block_size * block_size
    if p2 is None:
        p2 = 32.0 * block_size * block_size

    H, W = left_gray.shape
    HP = _ceil_to(H, 64)
    WP, _ = _pick_xtile(W)
    DP = _ceil_to(num_disparities, 128)

    # Fused Pallas cost + forward (+ down in 4-dir mode) scans. Padding
    # conventions: INVALID_COST on extra disparity lanes so they never win
    # WTA, zeros on extra rows/columns so a zero carry propagates unchanged
    # and the reverse scans (bottom-up, right-to-left) enter the real image
    # with the zero-init carry an unpadded scan would start with.
    cost, v1 = cost_fwd_down(
        jnp.asarray(left_gray, jnp.float32),
        jnp.asarray(right_gray, jnp.float32),
        num_disparities, min_disparity, block_size, pre_filter_cap,
        p1, p2, HP, WP, DP, num_directions >= 4, interpret)

    disp_raw, valid = aggregate_and_finalize(
        cost, p1, p2, num_disparities, uniqueness_ratio, disp12_max_diff,
        do_subpixel, W, interpret, v1=v1,
        final_dir="up" if num_directions >= 4 else "down",
        with_diag=num_directions == 8)
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
