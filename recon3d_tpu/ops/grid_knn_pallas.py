"""Pallas grid_pca_moments: the large-N normal-estimation hot kernel.

Per-point radius-ball moments (count / mean / covariance) over the voxel
table from ops.grid_knn._bin_points — exact same semantics as the XLA
grid_pca_moments, restructured for the TPU memory system:

- 1-D grid over x-slabs; each step sees the (clamped) previous/current/
  next slab and accumulates the 10 moment channels entirely in VMEM. The
  XLA version materialized (C, C, G^3)-scale intermediates in HBM per
  offset (and XLA picked lane-padded layouts for them, 8x memory) —
  measured 728 ms at 1M points on a v5e.
- slab planes are FLATTENED to (C, G*G): full 128-lane vregs (a (G, G)=
  (64, 64) plane half-fills them), and the (dy, dz) neighbor alignment
  becomes ONE lane roll of dy*G + dz with iota edge masks.
- CANDIDATES ride the sublane axis, QUERIES iterate in a fori loop: each
  query's 10 moment updates are sublane REDUCTIONS of (C, GG) feature
  planes down to (1, GG) accumulator rows, so accumulator read-modify-
  write traffic drops 16x (C=16) vs the earlier per-candidate broadcast
  form, which accumulated full (C, {1,3,6}, GG) blocks per candidate —
  42.9 ms vs 107.4 ms at 1M points / G=64 / C=16 on a v5e.
- all channels (x, y, z, occupancy in; the 10 moments out) are PACKED on
  the sublane axis as (4C, GG) / (10C, GG) slabs: no sublane padding, and
  the (dy, dz) roll aligns every input channel in one move.
- Mosaic has no dynamic_slice on values, so each offset's rolled
  candidates are staged in VMEM scratch and the per-query fori_loop
  dynamically indexes refs only.

Everything is f32 madds (the XLA einsum path contracted via dot_general
at default TPU precision, i.e. bf16 — see the precision pin in
grid_knn.py).

Reference: normal_estimation.py:19-21 (Open3D CUDA k-NN PCA normals).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recon3d_tpu.ops import grid_knn as gk

BIG = np.float32(1e30)  # numpy: no device op at import time


def _mk_kernel(G: int, C: int, fuse_eig: bool = False, gz: int | None = None):
    if gz is None:
        gz = G
    GG = G * gz

    def kernel(r2_ref, prev_ref, cur_ref, nxt_ref, out_ref, cand_s, acc_s):
        x = pl.program_id(0)
        r2 = r2_ref[0]  # SMEM scalar: radius stays a traced value upstream

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, GG), 1)
        iy = lane // gz
        iz = lane % gz

        acc_s[...] = jnp.zeros((10 * C, GG), jnp.float32)

        planes = ((-1, prev_ref), (0, cur_ref), (1, nxt_ref))
        for dx, sref in planes:
            slab = sref[0]          # (4C, GG) packed [x, y, z, occ] rows
            if dx == -1:
                xok = x > 0
            elif dx == 1:
                xok = x < G - 1
            else:
                xok = True
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    # cand[., g] = slab[., g + dy*G + dz]: one lane roll
                    # aligns all 4 channels at once
                    sh = (-(dy * gz + dz)) % GG
                    cand_s[...] = pltpu.roll(slab, sh, axis=1) if sh else slab
                    edge = jnp.full((1, GG), True)
                    if dy:
                        edge = edge & ((iy + dy >= 0) & (iy + dy < G))
                    if dz:
                        edge = edge & ((iz + dz >= 0) & (iz + dz < G))
                    if dx != 0:
                        edge = edge & xok
                    edgef = edge.astype(jnp.float32)    # (1, GG)

                    cx = cand_s[0:C]                    # (C, GG)
                    cy = cand_s[C:2 * C]
                    cz = cand_s[2 * C:3 * C]
                    cocc = cand_s[3 * C:4 * C]

                    def body(qq, _):
                        qx = cur_ref[0, pl.ds(qq, 1)]            # (1, GG)
                        qy = cur_ref[0, pl.ds(C + qq, 1)]
                        qz = cur_ref[0, pl.ds(2 * C + qq, 1)]
                        qo = cur_ref[0, pl.ds(3 * C + qq, 1)]
                        eq = edgef * qo                          # (1, GG)
                        d0 = qx - cx                             # (C, GG)
                        d1 = qy - cy
                        d2_ = qz - cz
                        dd = d0 * d0 + d1 * d1 + d2_ * d2_
                        w = jnp.where(dd <= r2, cocc * eq, 0.0)  # (C, GG)
                        feats = (w, w * cx, w * cy, w * cz,
                                 w * cx * cx, w * cy * cy, w * cz * cz,
                                 w * cx * cy, w * cx * cz, w * cy * cz)
                        for ch, f in enumerate(feats):
                            acc_s[pl.ds(ch * C + qq, 1)] += jnp.sum(
                                f, axis=0, keepdims=True)
                        return 0

                    jax.lax.fori_loop(0, C, body, 0)
        if not fuse_eig:
            out_ref[0] = acc_s[...]
            return
        # fused finish: normalize moments -> covariance channels -> the
        # channelwise eigen-solve, all on (C, GG) planes still in VMEM.
        # Only 4 channels (nx, ny, nz, count) leave the kernel instead of
        # 10 moments, and the XLA-side slot-space eig pass (11 ms at
        # G=64/C=16 on a v5e) disappears entirely.
        from recon3d_tpu.pointcloud.normals import _eig6_channels

        n = acc_s[0:C]
        nn = jnp.maximum(n, 1.0)
        mx = acc_s[C:2 * C] / nn
        my = acc_s[2 * C:3 * C] / nn
        mz = acc_s[3 * C:4 * C] / nn
        xx = acc_s[4 * C:5 * C] / nn - mx * mx
        yy = acc_s[5 * C:6 * C] / nn - my * my
        zz = acc_s[6 * C:7 * C] / nn - mz * mz
        xy = acc_s[7 * C:8 * C] / nn - mx * my
        xz = acc_s[8 * C:9 * C] / nn - mx * mz
        yz = acc_s[9 * C:10 * C] / nn - my * mz
        vx, vy, vz = _eig6_channels(xx, yy, zz, xy, xz, yz)
        out_ref[0] = jnp.concatenate([vx, vy, vz, n], axis=0)

    return kernel


def _core_call(pk, r2, G, C, interpret, fuse_eig, gz=None):
    if gz is None:
        gz = G
    GG = G * gz
    bs = (1, 4 * C, GG)
    out_ch = (4 if fuse_eig else 10) * C
    r2v = jnp.reshape(jnp.asarray(r2, jnp.float32), (1,))
    return pl.pallas_call(
        _mk_kernel(G, C, fuse_eig, gz),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(bs, lambda x: (jnp.maximum(x - 1, 0), 0, 0)),
            pl.BlockSpec(bs, lambda x: (x, 0, 0)),
            pl.BlockSpec(bs, lambda x: (jnp.minimum(x + 1, G - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, out_ch, GG), lambda x: (x, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, out_ch, GG), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * C, GG), jnp.float32),
                        pltpu.VMEM((10 * C, GG), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(r2v, pk, pk, pk)


@functools.partial(jax.jit, static_argnames=("G", "C", "interpret", "gz"))
def moments_pallas_core(pk, r2, G, C, interpret=False, gz=None):
    """pk: (G, 4C, G*gz) packed [x, y, z, occupancy] channel rows (see
    grid_knn._bin_points_packed; gz = lane stride, default G); r2: traced
    scalar (squared radius). Returns (G, 10C, G*gz) packed [cnt, sx, sy,
    sz, sxx, syy, szz, sxy, sxz, syz] channel rows in the same slot
    layout."""
    return _core_call(pk, r2, G, C, interpret, fuse_eig=False, gz=gz)


@functools.partial(jax.jit, static_argnames=("G", "C", "interpret", "gz"))
def normals_pallas_core(pk, r2, G, C, interpret=False, gz=None):
    """Fused moments + PCA eigen-solve: same input as moments_pallas_core,
    but the covariance normalization and smallest-eigenvector solve run
    inside the kernel on VMEM-resident planes. Returns (G, 4C, G*gz) packed
    [nx, ny, nz, count] channel rows in slot layout."""
    return _core_call(pk, r2, G, C, interpret, fuse_eig=True, gz=gz)


def _mk_pack_kernel(G: int, C: int, LB: int, W: int, gz: int, NB: int):
    """Packed-table build kernel: see _bin_points_packed_pallas."""
    GG = G * gz
    total = G * NB

    def kernel(ws_ref, st_ref, nxt_ref, chan_ref, out_ref, flag_ref,
               win_s, sems):
        x = pl.program_id(0)
        b = pl.program_id(1)
        i = x * NB + b
        cur = jax.lax.rem(i, 2)

        def issue(step, slot):
            """DMA the step's sorted-point window (the block's cells'
            rows, aligned down to a lane tile — the one-hot build keys on
            the DMA'd cell ids, so alignment slack costs nothing)."""
            w0a = pl.multiple_of(ws_ref[step], 128)
            pltpu.make_async_copy(
                chan_ref.at[:, pl.ds(w0a, W)], win_s.at[slot],
                sems.at[slot]).start()

        # double-buffered windows: step 0 issues its own copy, every step
        # prefetches the next block's window while computing on its own
        @pl.when(i == 0)
        def _():
            issue(0, 0)

        @pl.when(i + 1 < total)
        def _():
            issue(i + 1, 1 - cur)

        pltpu.make_async_copy(
            chan_ref.at[:, pl.ds(0, W)], win_s.at[cur], sems.at[cur]).wait()

        st_row = st_ref[0, 0]                   # (1, LB) int32
        nxt_row = nxt_ref[0, 0]                 # (1, LB) int32
        w0a = ws_ref[i]
        cid0 = (x * GG + b * LB).astype(jnp.float32)
        cidw = win_s[cur, 4:5, :]               # (1, W) f32 cell ids
        rankw = win_s[cur, 3:4, :]              # (1, W) f32 in-cell rank
        j_col = jax.lax.broadcasted_iota(
            jnp.int32, (LB, 1), 0).astype(jnp.float32)
        c_col = jax.lax.broadcasted_iota(
            jnp.int32, (C, 1), 0).astype(jnp.float32)
        # one-hot selectors: Ut[j, k] = point k belongs to block cell j,
        # Vt[c, k] = point k has in-cell rank c (rank >= C never matches:
        # the capacity cap). At most one point matches a (c, j) slot, so
        # selection-by-matmul is EXACT given exact products: U is 0.0/1.0
        # (exact in bf16) and T is split into three bf16 chunks covering
        # the full f32 mantissa, so three 1-pass MXU products accumulated
        # in f32 reproduce the coordinates BITWISE (same math as a
        # HIGHEST-precision dot at half the passes).
        Ut = (cidw - cid0 == j_col).astype(jnp.bfloat16)    # (LB, W)
        Vt = (rankw == c_col).astype(jnp.float32)           # (C, W)
        Tt = jnp.concatenate([win_s[cur, 0:1, :] * Vt,
                              win_s[cur, 1:2, :] * Vt,
                              win_s[cur, 2:3, :] * Vt], axis=0)  # (3C, W)
        t0 = Tt.astype(jnp.bfloat16)
        r1 = Tt - t0.astype(jnp.float32)
        t1 = r1.astype(jnp.bfloat16)
        t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))

        def sel(t):
            return jax.lax.dot_general(
                t, Ut, dn, preferred_element_type=jnp.float32)

        pkc = (sel(t0) + sel(t1)) + sel(t2)                 # (3C, LB)
        # occupancy only for slots whose raw sorted row was actually
        # DMA'd: rows beyond w0a + W never reached the one-hot, so their
        # coordinates in pkc are 0.0 — marking them occupied would hand
        # downstream moments a phantom point at the origin. Masked out,
        # window overflow degrades to a cleanly-missing neighbor (and is
        # still counted exactly by flag_ref below).
        raw_row = st_row + c_col.astype(jnp.int32)           # (C, LB)
        occ = ((raw_row < nxt_row)
               & (raw_row < w0a + W)).astype(jnp.float32)    # (C, LB)
        out_ref[0] = jnp.concatenate([pkc, occ], axis=0)
        # exact window-overflow accounting: the last NEEDED raw row of the
        # block is max_j(st[j] + min(pop_j, C)); rows beyond w0a + W were
        # not DMA'd, so their capped points are silently absent from pk
        ne = jnp.max(jnp.minimum(nxt_row, st_row + C))
        flag_ref[0, 0] = jnp.maximum(
            ne - (w0a + W), 0).astype(jnp.float32).reshape(1, 1)

    return kernel


def _bin_points_packed_pallas(p, valid, radius, grid_size, cell_capacity,
                              w_mult: float = 1.0, interpret: bool = False):
    """Pallas twin of gk._bin_points_packed: same (pk, point_slot,
    overflow) contract, built by an MXU one-hot placement instead of an
    XLA per-slot gather.

    The XLA route gathers each of the G*gz*G*C slots separately (~16 ns
    per offset on a v5e: 549 ms of the 1.45 s 10M-point normals path).
    Here cells are processed in LB-lane blocks: each block's points are
    CONTIGUOUS in the cell-sorted order, so ONE sliced DMA pulls the
    block's [x, y, z, rank, cellid] rows into VMEM and two one-hot
    comparisons against the DMA'd rank/cellid channels place every point
    into its (rank, cell) slot via an exact f32 matmul (HIGHEST precision
    one-hot selection is bitwise). Measured 10M/G=128/C=16: 44 ms.

    The window is static (W = w_mult * C * LB + slack), so blocks whose
    RAW sorted span exceeds it (local density >> capacity, e.g. every
    cell heavily over cap) silently lose the capped points beyond it;
    that loss is counted exactly and folded into the returned overflow
    fraction (as a raw-row upper bound). The XLA twin stays the oracle
    for pathological densities."""
    G, C = grid_size, cell_capacity
    gz = gk._lane_stride(G)
    GG = G * gz
    n_cells = G * G * gz
    N = p.shape[0]
    LB = 256 if GG % 256 == 0 else 128
    W = (int(w_mult * C * LB) + 255) // 128 * 128 + 128
    sc, sp, order, start, ok, rank, overflow = gk._sort_cells(
        p, valid, radius, G, C, gz=gz)
    zero = jnp.zeros_like(sp[:, 0])
    # 8 rows: DMA sublane slices must be 8-aligned
    chans = jnp.stack([sp[:, 0], sp[:, 1], sp[:, 2],
                       rank.astype(jnp.float32),
                       sc.astype(jnp.float32),
                       zero, zero, zero], axis=0)            # (8, N)
    pad = jnp.zeros((8, W + 128), jnp.float32).at[4].set(float(n_cells))
    chans = jnp.concatenate([chans, pad], axis=1)
    NB = GG // LB
    # per-block DMA window starts (lane-tile aligned), SMEM-resident so
    # step i can prefetch step i+1's window
    ws = (start[0:n_cells:LB] // 128) * 128
    # trailing singleton dims keep the small blocks legal under Mosaic's
    # last-two-dims rule (block dim == array dim)
    st2 = start[:n_cells].reshape(G, NB, 1, LB)
    nxt2 = start[1:n_cells + 1].reshape(G, NB, 1, LB)
    pk, flags = pl.pallas_call(
        _mk_pack_kernel(G, C, LB, W, gz, NB),
        grid=(G, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, LB), lambda x, b: (x, b, 0, 0)),
            pl.BlockSpec((1, 1, 1, LB), lambda x, b: (x, b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * C, LB), lambda x, b: (x, 0, b)),
            pl.BlockSpec((1, 1, 1, 1), lambda x, b: (x, b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, 4 * C, GG), jnp.float32),
            jax.ShapeDtypeStruct((G, NB, 1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, 8, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ws, st2, nxt2, chans)
    point_slot = gk._point_slot_from_sorted(sc, order, ok, rank, C)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    overflow = overflow + jnp.sum(flags) / n_valid
    return pk, point_slot, overflow


def packed_chan_readback(out, point_slot, G, C, gz, n_chan):
    """Per-point gather from a kernel's packed (G, n_chan*C, G*gz) output:
    returns a function chan(j) -> (N,) values of channel j for each point,
    plus the has-slot mask. Shared by grid_pca_moments_pallas and
    normals._grid_normals_pallas so the packed layout lives in exactly
    one place.

    The channel-major kernel output strides a slot's channels C*GG apart,
    so per-channel flat gathers pay one offset per (point, channel) — at
    10M points that was 377 ms for 3 channels on a v5e. Transposing once
    to slot-major (n_slots, n_chan) makes all channels of a point ONE
    contiguous gather row: 123 ms, offsets independent of n_chan (the
    transpose itself fuses into the gather's operand)."""
    GG = G * gz
    slot = jnp.maximum(point_slot, 0)
    has = point_slot >= 0
    cell = slot // C
    c = slot % C
    x = cell // GG
    g = cell % GG
    om = jnp.transpose(out.reshape(G, n_chan, C, GG),
                       (0, 3, 2, 1)).reshape(G * GG * C, n_chan)
    rows = om[(x * GG + g) * C + c]          # (N, n_chan)

    def chan(j):
        return rows[:, j]

    return chan, has


def _pick_pack(pack: str, interpret: bool):
    """Resolve the packed-table builder: the Pallas one-hot pack on real
    TPUs (12x the XLA slot gather at 10M points), the XLA gather
    elsewhere. pack='pallas'/'xla' forces a side (tests force 'pallas'
    with interpret=True to cover the kernel on CPU)."""
    if pack == "auto":
        use = not interpret and jax.default_backend() == "tpu"
    else:
        use = pack == "pallas"
    if use:
        return lambda p, v, r, G, C: _bin_points_packed_pallas(
            p, v, r, G, C, interpret=interpret)
    return gk._bin_points_packed


def grid_pca_moments_pallas(points, valid, radius, grid_size=64,
                            cell_capacity=8, interpret=False,
                            pack="auto"):
    """Drop-in twin of gk.grid_pca_moments: (count (N,), mean (N, 3),
    cov6 (N, 6) [xx, yy, zz, xy, xz, yz]).

    Returns the covariance in CHANNEL form — normals.py consumes it
    channelwise (building (N, 3, 3) matrices costs more in layout
    reshuffling than the whole eigen-solve). interpret=True runs the same
    kernel dataflow off-TPU (how the CPU parity tests exercise it).
    """
    p = jnp.asarray(points, jnp.float32)
    G, C = grid_size, cell_capacity
    gz = gk._lane_stride(G)
    pk, point_slot, _ = _pick_pack(pack, interpret)(p, valid, radius, G, C)
    out = moments_pallas_core(pk, radius * radius, G, C, interpret, gz=gz)
    # Read results back by gathering DIRECTLY from the kernel's packed
    # (G, 10C, GG) layout — no 100+ MB output transposes
    chan, has = packed_chan_readback(out, point_slot, G, C, gz, 10)
    n = jnp.where(has, chan(0), 0.0)
    nn = jnp.maximum(n, 1.0)
    m1 = [chan(1 + j) / nn for j in range(3)]
    m2 = [chan(4 + j) / nn for j in range(6)]
    mx, my, mz = m1
    mean = jnp.stack(m1, -1)
    cov6 = jnp.stack([m2[0] - mx * mx, m2[1] - my * my,
                      m2[2] - mz * mz, m2[3] - mx * my,
                      m2[4] - mx * mz, m2[5] - my * mz], -1)
    return n, mean, cov6
