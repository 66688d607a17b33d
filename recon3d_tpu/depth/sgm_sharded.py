"""Row-sharded production SGM: tensor parallelism over the image row axis.

Closes SURVEY.md section 2.5's TP row for the PRODUCTION Pallas kernels
(depth/sgm_pallas.py): the (H, W, D) cost volume is sharded over a device
mesh's row axis, the horizontal paths and the WTA/subpixel/LR finalize run
shard-locally (they are row-local by construction), and the vertical paths
— whose carries cross shard boundaries — run as an explicit carry-plane
RELAY: each shard's final (W, D) carry plane moves to its neighbor with
lax.ppermute (the ring-style halo exchange SURVEY names), one hop per
relay step. The box-window/prefilter support at shard seams is satisfied
by exchanging HALO rows of the PREFILTERED planes (exchanging raw image
rows instead would double-replicate at the global edges and diverge from
the full-image prefilter).

Exactness: every kernel computes the same integer-valued f32 arithmetic as
the single-device fused path, vertical carries are relayed (never
approximated with overlap-band recompute), and rows this shard pads below
its real image are excluded from the relayed carry (vscan_carry's h_real
logic). sgm_disparity_pallas_rowsharded == sgm_disparity_pallas BITWISE
(tests/test_parallel.py), at the cost of de-fusing the vertical paths from
the cost/finalize kernels (the fused single-chip path remains the 1-chip
fast path; this entry is for scaling H beyond one chip's HBM/VMEM).

Supports num_directions 3 (cv2 SGBM_3WAY: one downward relay), 4 (HH4:
down + up relays) and 8 (MODE_HH: the four diagonal paths relay their
column-shifted carry PAIRS the same way — sgm_pallas.diag_carry). Heights
that do not split into n shards of 8-row-aligned rows are padded
internally with edge-replicated rows (1080 -> 1088 on a 2/4/8-way mesh)
and stay bitwise-exact on the real rows.

Reference: the per-frame cv2.StereoSGBM.compute this scales
(/root/reference/Calib_depth/depth4.py:255).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from recon3d_tpu.depth import sgm_pallas as sp

_HALO = 8  # exchanged plane rows per side (>= box radius, 8-row aligned)


def _bwd_accumulate(cost_u16, v1, p1f, p2f, interpret):
    """Backward-horizontal path accumulated onto v1 (shard-local; mirrors
    aggregate_and_finalize's bwd stage)."""
    HP, WP, DP = cost_u16.shape
    _, XT = sp._pick_xtile(WP)
    BH = 64
    nb, nx = HP // BH, WP // XT
    hblock_r = pl.BlockSpec((BH, XT, DP), lambda b, x: (b, nx - 1 - x, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        sp._mk_hscan_kernel(XT, p1f, p2f, reverse=True, accumulate=True),
        grid=(nb, nx),
        in_specs=[hblock_r, hblock_r], out_specs=hblock_r,
        out_shape=jax.ShapeDtypeStruct((HP, WP, DP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BH, DP), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cost_u16, v1)


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "num_disparities", "min_disparity", "block_size",
    "p1", "p2", "num_directions", "uniqueness_ratio", "disp12_max_diff",
    "speckle_window_size", "speckle_range", "pre_filter_cap", "do_subpixel",
    "speckle_method", "interpret",
))
def sgm_disparity_pallas_rowsharded(
    left_gray: jax.Array,
    right_gray: jax.Array,
    mesh: Mesh,
    axis_name: str = "row",
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
    """Row-sharded twin of sgm_disparity_pallas (bitwise-equal output).

    Heights that do not split into n shards of 8-row-aligned rows are
    padded internally (edge-replicated rows, the full-image kernel's
    padding convention; e.g. 1080 -> 1088 for a 2/4/8-way mesh): the
    last shard treats its pad rows as dead — its prefiltered planes
    replicate the last real row so real-row box windows match the
    full-image kernel, and the vertical/diagonal relays snapshot/adopt
    carries at the real image bottom, so the output on the real H rows
    stays BITWISE equal to the single-device path. The speckle filter
    runs replicated on the gathered disparity, exactly like the
    single-device tail.
    """
    from recon3d_tpu.depth import sgm as _sgm

    assert num_directions in (3, 4, 8), num_directions
    assert block_size // 2 <= _HALO, (
        f"block_size={block_size} needs {block_size // 2} prefiltered halo "
        f"rows per side but only {_HALO} are exchanged — the bitwise-"
        f"equality contract would silently break")
    if p1 is None:
        p1 = 8.0 * block_size * block_size
    if p2 is None:
        p2 = 32.0 * block_size * block_size
    n = mesh.shape[axis_name]
    H, W = left_gray.shape
    Hpad = -(-H // (n * 8)) * (n * 8)
    pad = Hpad - H
    Hl = Hpad // n
    # the last shard's real rows must cover the halo its neighbor pulls
    assert Hl - pad >= _HALO, (
        f"H={H} leaves the last of {n} shards only {Hl - pad} real rows "
        f"(< {_HALO}-row halo); use fewer shards")
    if pad:
        left_gray = jnp.pad(jnp.asarray(left_gray, jnp.float32),
                            ((0, pad), (0, 0)), mode="edge")
        right_gray = jnp.pad(jnp.asarray(right_gray, jnp.float32),
                             ((0, pad), (0, 0)), mode="edge")
    HLP = sp._ceil_to(Hl, 64)
    WP, XT = sp._pick_xtile(W)
    DP = sp._ceil_to(num_disparities, 128)
    Hext = Hl + 2 * _HALO
    HPE = sp._ceil_to(Hext, 64)
    p1f, p2f = float(p1) * 2.0, float(p2) * 2.0

    fwd_perm = [(i, i + 1) for i in range(n - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, n)]

    def local(left_l, right_l):
        my = jax.lax.axis_index(axis_name)

        def with_halos(x, halo, top_fill, bot_fill):
            """Extend shard-local rows with `halo` rows from each
            neighbor; global boundary shards replicate their edge row
            (matching the full-image kernel's mode='edge' row padding)."""
            if n > 1:
                from_above = jax.lax.ppermute(x[-halo:], axis_name,
                                              fwd_perm)
                from_below = jax.lax.ppermute(x[:halo], axis_name,
                                              bwd_perm)
            else:
                from_above = from_below = jnp.zeros((halo,) + x.shape[1:],
                                                    x.dtype)
            top = jnp.where(my == 0, top_fill, from_above)
            bot = jnp.where(my == n - 1, bot_fill, from_below)
            return jnp.concatenate([top, x, bot], axis=0)

        # 1. prefilter shard-locally: the x-Sobel needs one raw halo row
        def rep(row, k):
            return jnp.repeat(row, k, axis=0)

        ext1_l = with_halos(left_l, 1, rep(left_l[:1], 1),
                            rep(left_l[-1:], 1))
        ext1_r = with_halos(right_l, 1, rep(right_l[:1], 1),
                            rep(right_l[-1:], 1))
        planes = sp.prefilter_planes(ext1_l, ext1_r, pre_filter_cap)
        planes = tuple(p[1:-1] for p in planes)  # exact local plane rows

        if pad:
            # rows this shard holds beyond the real image replicate the
            # last REAL plane row: prefilter(edge-padded raw) at a pad row
            # mixes raw rows (H-1, H-1, H-1) while the full-image kernel's
            # convention replicates the PREFILTERED row H-1 (raw rows
            # H-2, H-1, H) — overwrite so real-row box windows and the
            # bottom halo fill match the single-device path bitwise
            gr = my * Hl + jnp.arange(Hl)
            last = jnp.clip(H - 1 - my * Hl, 0, Hl - 1)
            planes = tuple(
                jnp.where((gr >= H)[:, None], p[last][None, :], p)
                for p in planes)

        # 2. exchange _HALO rows of the PREFILTERED planes
        ext_planes = tuple(
            with_halos(p, _HALO, rep(p[:1], _HALO), rep(p[-1:], _HALO))
            for p in planes)

        # 3. shard-local fused cost + forward-horizontal scan on the
        #    halo-extended rows (all Hext rows are 'real' to the kernel,
        #    uniform across shards — SPMD needs one program)
        dummy = jnp.zeros((Hext, W), jnp.float32)
        cost_e, v1_e = sp.cost_fwd_down(
            dummy, dummy, num_disparities, min_disparity, block_size,
            pre_filter_cap, p1, p2, HPE, WP, DP, with_down=False,
            interpret=interpret, planes=ext_planes)

        # 4. crop the halo back off; re-pad to the 64-row kernel grid
        #    with zero rows (the single-device padding convention)
        def crop_pad(v):
            v = v[_HALO:_HALO + Hl]
            return jnp.pad(v, ((0, HLP - Hl), (0, 0), (0, 0)))

        cost = crop_pad(cost_e)
        v1 = crop_pad(v1_e)

        # 5. backward-horizontal path (row-local)
        v3 = _bwd_accumulate(cost, v1, p1f, p2f, interpret)

        # 6. vertical path RELAY(s): every shard scans each round; shard k
        #    keeps round k's result, and its boundary carry plane hops to
        #    the neighbor. n rounds of H/n rows = one full-height scan of
        #    wall-clock for the vertical path; everything else is 1/n.
        #    With internal padding the last shard's round uses its REAL
        #    row count, so the relayed carry is snapshotted/adopted at
        #    the true image bottom (h_real is static per round — one
        #    program per distinct count, uniform across shards).
        def relay(S_acc, reverse, scan, carry_shape):
            final = S_acc
            carry = jnp.zeros(carry_shape, jnp.float32)
            order = range(n - 1, -1, -1) if reverse else range(n)
            perm = bwd_perm if reverse else fwd_perm
            for k in order:
                h_k = Hl if k < n - 1 else Hl - pad
                Sk, cout = scan(cost, S_acc, carry, p1, p2,
                                reverse, h_k, interpret=interpret)
                final = jnp.where(my == k, Sk, final)
                if n > 1:
                    carry = jax.lax.ppermute(cout, axis_name, perm)
            return final

        S = relay(v3, False, sp.vscan_carry, (WP, DP))   # downward path
        if num_directions >= 4:
            S = relay(S, True, sp.vscan_carry, (WP, DP))  # upward (HH4)
        if num_directions == 8:
            # the four diagonal paths (MODE_HH): column-shifted carry
            # PAIRS relay exactly like the vertical planes
            S = relay(S, False, sp.diag_carry, (2, WP, DP))
            S = relay(S, True, sp.diag_carry, (2, WP, DP))

        # 7. WTA/subpixel/uniqueness/LR finalize (row-local)
        disp_l, valid_l = sp.wta_finalize(
            S, num_disparities, uniqueness_ratio, disp12_max_diff,
            do_subpixel, w_real=W, interpret=interpret)
        return disp_l[:Hl, :W], valid_l[:Hl, :W]

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=(P(axis_name, None), P(axis_name, None)),
        # check_vma off: Pallas interpret-mode calls inside shard_map do
        # not carry varying-manual-axes info; bitwise equality with the
        # single-device path is asserted by tests instead
        check_vma=False,
    )
    disp_raw, valid = sharded(jnp.asarray(left_gray, jnp.float32),
                              jnp.asarray(right_gray, jnp.float32))
    if pad:
        disp_raw, valid = disp_raw[:H], valid[:H]

    # ---- replicated tail: identical to sgm_disparity_pallas
    if min_disparity:
        x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        valid = valid & (
            x - (min_disparity + jnp.round(disp_raw).astype(jnp.int32)) >= 0)
    if speckle_window_size > 0:
        if speckle_method == "fast":
            valid = _sgm.speckle_filter_fast(
                disp_raw, valid, speckle_range, speckle_window_size,
                max_disparity=sp._ceil_to(num_disparities, 128))
        else:
            valid = _sgm.speckle_filter(disp_raw, valid, speckle_range,
                                        speckle_window_size)
    disp_out = jnp.where(valid, disp_raw + jnp.float32(min_disparity), -1.0)
    return disp_out, valid
