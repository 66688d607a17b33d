"""Approximate neighbor search via voxel-grid binning: the large-N path.

The blocked brute-force kernels in ops.knn are exact and MXU-friendly but
O(N^2) — fine at fragment scale (8-64k points), hopeless at the reference's
10M-point benchmark scale (test/gpu-performance.py:23-46). This module bins
points into a fixed-capacity dense voxel table and searches only the 27
neighboring cells, TPU-shaped:

- ONE data-dependent scatter builds the (G^3, C) table (sort by cell id ->
  rank within cell -> scatter); everything after is regular.
- The 27-cell neighborhood never gathers: the whole table is ROLLED along
  each grid axis (jnp.roll = lane/sublane moves), so each offset aligns
  candidate cells with query cells, and distances are batched (C x C)
  blocks over all cells at once.
- Results are exact for any neighbor within `radius` of a query, provided
  neither point overflowed its cell capacity (cell edge = radius, so the
  27-neighborhood covers the radius ball). Beyond-radius neighbors may be
  missed — callers use radius-bounded (hybrid) semantics anyway.

Capacity overflow drops points from the DB side (they still get their own
results if they fit; the returned `overflow_fraction` reports the drop rate
so callers/tests can assert < 1%).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e30)  # numpy: no device op at import time


class GridKNNResult(NamedTuple):
    indices: jax.Array  # (N, k) int32 into the original point order
    sq_dists: jax.Array  # (N, k) f32, BIG where no neighbor
    overflow_fraction: jax.Array  # scalar f32: points dropped from cells


def _lane_stride(G: int) -> int:
    """Smallest z-stride gz >= G making G*gz a multiple of 128: the Pallas
    slab kernels flatten (y, z) planes onto the lane axis, and pltpu.roll
    needs the lane count vreg-aligned (a (52, 2704) roll dies with a TPU
    backend error). Lanes with z >= G are dead: never occupied, masked by
    the kernel's edge iota."""
    gz = G
    while (G * gz) % 128:
        gz += 1
    return gz


def _sort_cells(p, valid, radius, G, C, gz=None):
    """Shared cell-sorting stage of the binning paths: points sorted by
    cell id, plus the per-cell start offsets and per-sorted-point rank.

    TPU cost notes (1M points, G=64, C=16 on a v5e): the multi-operand
    sort carries the coordinates and original indices through as sort
    payloads in one pass (10.7 ms — argsort followed by row gathers costs
    22.8 ms); `start` comes from a 262k-wide scatter-min of
    first-occurrence positions followed by a reverse cummin to fill
    empty cells (14 ms — jnp.searchsorted's binary search costs 42 ms and
    its sort method 19 ms).

    gz: cell-id z stride (>= G); ids of cells with z in [G, gz) are never
    assigned (see _lane_stride). Defaults to G (dense ids)."""
    if gz is None:
        gz = G
    N = p.shape[0]
    n_cells = G * G * gz
    lo = jnp.min(jnp.where(valid[:, None], p, BIG), axis=0) - 0.5 * radius
    cell = jnp.floor((p - lo) / radius).astype(jnp.int32)
    inb = jnp.all((cell >= 0) & (cell < G), axis=1) & valid
    cell = jnp.clip(cell, 0, G - 1)
    cid = (cell[:, 0] * G + cell[:, 1]) * gz + cell[:, 2]
    cid = jnp.where(inb, cid, n_cells)  # out-of-grid/invalid -> trash cell

    iota = jnp.arange(N, dtype=jnp.int32)
    sc, spx, spy, spz, order = jax.lax.sort(
        (cid, p[:, 0], p[:, 1], p[:, 2], iota), num_keys=1)
    sp = jnp.stack([spx, spy, spz], -1)
    # start[c] = first sorted position with cell id >= c (so start[c+1] -
    # start[c] is cell c's population): scatter each segment's first
    # position, then fill empty cells from the right
    isnew = jnp.concatenate([jnp.array([True]), sc[1:] != sc[:-1]])
    st = jnp.full((n_cells + 2,), N, jnp.int32).at[
        jnp.where(isnew, sc, n_cells + 1)].min(iota, mode="drop")
    start = jax.lax.cummin(st[:n_cells + 1][::-1])[::-1]
    rank = iota - start[sc]
    ok = (rank < C) & (sc < n_cells)
    n_valid = jnp.maximum(jnp.sum(inb.astype(jnp.float32)), 1.0)
    overflow = 1.0 - jnp.sum(ok.astype(jnp.float32)) / n_valid
    return sc, sp, order, start, ok, rank, overflow


def _point_slot_from_sorted(sc, order, ok, rank, C):
    """Per-original-point slot id (or -1 if dropped): a key/payload sort on
    `order` applies the inverse permutation — 15 ms at 1M points vs 22 ms
    for gathering through a second argsort."""
    slot_of_sorted = jnp.where(ok, sc * C + rank, -1).astype(jnp.int32)
    _, point_slot = jax.lax.sort((order, slot_of_sorted), num_keys=1)
    return point_slot


def _bin_points(p, valid, radius, grid_size, cell_capacity):
    """Sort points into a (G^3*C, ...) slot table. Returns table of points,
    slot -> original-index map, per-point slot id (or -1), overflow frac.

    Gather-formulated: XLA's TPU scatter lowering cost ~68 of the round-1
    binning's 76 ms at 1M points (the argsort itself is 4 ms). Since the
    points are sorted by cell id, every slot's occupant sits at a
    computable sorted position (cell_start + rank), so the whole table is
    built by GATHERS from the sorted arrays."""
    G, C = grid_size, cell_capacity
    sc, sp, order, start, ok, rank, overflow = _sort_cells(
        p, valid, radius, G, C)
    N = p.shape[0]
    n_cells = G * G * G

    # table[cell*C + r] = sorted point at start[cell] + r, occupied while
    # that position is still inside the cell's sorted run
    slot_cell = jnp.arange(n_cells * C, dtype=jnp.int32) // C
    slot_rank = jnp.arange(n_cells * C, dtype=jnp.int32) % C
    pos = start[slot_cell] + slot_rank
    occupied = pos < start[slot_cell + 1]
    pos = jnp.minimum(pos, N - 1)
    table = jnp.where(occupied[:, None], sp[pos], BIG)
    slot_orig = jnp.where(occupied, order[pos].astype(jnp.int32), -1)
    point_slot = _point_slot_from_sorted(sc, order, ok, rank, C)
    return table, slot_orig, point_slot, overflow


def _bin_points_packed(p, valid, radius, grid_size, cell_capacity):
    """Bin directly into the Pallas moments kernel's packed layout:
    pk (G, 4C, G*G) with channel rows [x*C | y*C | z*C | occupancy*C]
    (slot (x, c, g) at row ch*C + c, lane g of slab x; see
    grid_knn_pallas.moments_pallas_core). Returns (pk, point_slot,
    overflow).

    Skips the slot-major (G^3*C, 3) table entirely: one (G, C, GG)-shaped
    row gather from the sorted points plus a moveaxis lands the packed
    slabs in 25 ms at 1M points/G=64/C=16 on a v5e, where the table
    gather + repack route cost 99 ms (and flat per-channel 1-D gathers at
    G^3*C width cost 155 ms — TPU gathers want the row form).

    Lane layout: cell (x, y, z) -> slab x, lane y*gz + z with
    gz = _lane_stride(G), so lane counts stay vreg-aligned for any G
    (dead z >= G lanes are never occupied)."""
    G, C = grid_size, cell_capacity
    gz = _lane_stride(G)
    sc, sp, order, start, ok, rank, overflow = _sort_cells(
        p, valid, radius, G, C, gz=gz)
    N = p.shape[0]
    n_cells = G * G * gz
    GG = G * gz
    st3 = start[:n_cells].reshape(G, 1, GG)
    pos = st3 + jnp.arange(C, dtype=jnp.int32).reshape(1, C, 1)
    nxt = start[1:n_cells + 1].reshape(G, 1, GG)
    occ = pos < nxt
    pos = jnp.minimum(pos, N - 1)
    rows = jnp.where(occ[..., None], sp[pos], 0.0)      # (G, C, GG, 3)
    coords = jnp.moveaxis(rows, -1, 1).reshape(G, 3 * C, GG)
    pk = jnp.concatenate([coords, occ.astype(jnp.float32)], axis=1)
    point_slot = _point_slot_from_sorted(sc, order, ok, rank, C)
    return pk, point_slot, overflow


def _neighbor_offsets():
    return [(dx, dy, dz)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


@partial(jax.jit, static_argnames=("k", "grid_size", "cell_capacity"))
def grid_knn(
    points: jax.Array,
    valid: jax.Array,
    radius: float,
    k: int = 30,
    grid_size: int = 64,
    cell_capacity: int = 8,
) -> GridKNNResult:
    """Approximate k-NN (excluding self) among neighbors within ~radius.

    Exact for all neighbor pairs closer than `radius` when neither point
    overflows its cell; pairs farther than radius may be found (up to
    2*sqrt(3)*radius) but are not guaranteed. Matches ops.knn's contract
    otherwise: (indices (N, k), sq_dists (N, k)).
    """
    p = jnp.asarray(points, jnp.float32)
    N = p.shape[0]
    G, C = grid_size, cell_capacity
    table, slot_orig, point_slot, overflow = _bin_points(
        p, valid, radius, G, C)

    q = table.reshape(G, G, G, C, 3)
    qi = slot_orig.reshape(G, G, G, C)
    best_d = jnp.full((G, G, G, C, k), BIG, jnp.float32)
    best_i = jnp.zeros((G, G, G, C, k), jnp.int32)

    for off in _neighbor_offsets():
        cand = q
        cidx = qi
        for ax, sh in enumerate(off):
            if sh:
                # new[x] = old[x + sh]: neighbor cell at coordinate +sh
                cand = jnp.roll(cand, -sh, axis=ax)
                cidx = jnp.roll(cidx, -sh, axis=ax)
        # mask cells whose neighbor wrapped around the grid edge
        wrap = jnp.zeros((G, G, G), bool)
        for ax, sh in enumerate(off):
            if sh:
                coord = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), ax)
                wrap = wrap | (coord + sh < 0) | (coord + sh >= G)
        d2 = jnp.sum((q[..., :, None, :] - cand[..., None, :, :]) ** 2,
                     axis=-1)  # (G, G, G, Cq, Cc)
        d2 = jnp.where(wrap[..., None, None], BIG, d2)
        d2 = jnp.where(cidx[..., None, :, ] < 0, BIG, d2)
        if off == (0, 0, 0):
            eye = jnp.eye(C, dtype=bool)
            d2 = jnp.where(eye, BIG, d2)
        merged_d = jnp.concatenate([best_d, d2], axis=-1)
        merged_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(cidx[..., None, :],
                                      d2.shape).astype(jnp.int32)], axis=-1)
        neg, sel = jax.lax.top_k(-merged_d, k)
        best_d = -neg
        best_i = jnp.take_along_axis(merged_i, sel, axis=-1)

    # read results back to original point order
    res_d = best_d.reshape(G * G * G * C, k)
    res_i = best_i.reshape(G * G * G * C, k)
    slot = jnp.maximum(point_slot, 0)
    out_d = jnp.where((point_slot >= 0)[:, None], res_d[slot], BIG)
    out_i = jnp.where((point_slot >= 0)[:, None], res_i[slot], 0)
    out_d = jnp.where(out_d >= BIG, BIG, jnp.maximum(out_d, 0.0))
    return GridKNNResult(out_i.astype(jnp.int32), out_d, overflow)


@partial(jax.jit, static_argnames=("grid_size", "cell_capacity"))
def grid_pca_moments(
    points: jax.Array,
    valid: jax.Array,
    radius: float,
    grid_size: int = 64,
    cell_capacity: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-point neighborhood moments within `radius`: (count (N,),
    mean (N, 3), covariance (N, 3, 3)), self included.

    The TPU-native large-N normal-estimation kernel: instead of gathering
    sorted neighbor lists (whose (cells, C, k) buffers waste 8-16x on lane
    padding and OOM at 1M points), every candidate's weighted contribution
    is accumulated directly into first/second moments laid out as
    (C, stat, G^3) — the huge G^3 axis rides the lanes, so nothing pads.
    PCA normals follow from cov's smallest eigenvector.
    """
    p = jnp.asarray(points, jnp.float32)
    G, C = grid_size, cell_capacity
    table, _, point_slot, _ = _bin_points(p, valid, radius, G, C)
    # (G^3*C, 3) -> (C, 3, G^3): cells on lanes
    tg = table.reshape(G * G * G, C, 3).transpose(1, 2, 0)
    occupied = tg[:, 0, :] < BIG / 2  # (C, G^3) slot has a real point
    tg = jnp.where(occupied[:, None, :], tg, 0.0)
    grid5 = tg.reshape(C, 3, G, G, G)
    occ5 = occupied.reshape(C, G, G, G)

    r2 = jnp.float32(radius * radius)
    cnt = jnp.zeros((C, G * G * G), jnp.float32)
    s1 = jnp.zeros((C, 3, G * G * G), jnp.float32)
    s2 = jnp.zeros((C, 6, G * G * G), jnp.float32)  # xx,yy,zz,xy,xz,yz

    for off in _neighbor_offsets():
        cand = grid5
        cocc = occ5
        wrap = jnp.zeros((G, G, G), bool)
        for ax, sh in enumerate(off):
            if sh:
                cand = jnp.roll(cand, -sh, axis=2 + ax)
                cocc = jnp.roll(cocc, -sh, axis=1 + ax)
                coord = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), ax)
                wrap = wrap | (coord + sh < 0) | (coord + sh >= G)
        candf = cand.reshape(C, 3, G * G * G)
        coccf = (cocc.reshape(C, G * G * G)
                 & ~wrap.reshape(1, G * G * G))
        diff = tg[:, None] - candf[None]  # (Cq, Cc, 3, G^3)
        d2 = jnp.sum(diff * diff, axis=2)  # (Cq, Cc, G^3)
        w = ((d2 <= r2) & coccf[None] & occupied[:, None]).astype(jnp.float32)
        cnt = cnt + jnp.sum(w, axis=1)
        # precision pin: these contractions lower to dot_general, which on
        # TPU defaults to bf16 passes — a ~0.3% relative error comparable
        # to the covariance signal itself at small radii (the Pallas twin
        # in grid_knn_pallas.py is plain f32 madds and needs no pin)
        s1 = s1 + jnp.einsum("cjg,jdg->cdg", w, candf,
                             precision=jax.lax.Precision.HIGHEST)
        px, py, pz = candf[:, 0], candf[:, 1], candf[:, 2]
        sec = jnp.stack([px * px, py * py, pz * pz,
                         px * py, px * pz, py * pz], axis=1)  # (Cc, 6, G^3)
        s2 = s2 + jnp.einsum("cjg,jdg->cdg", w, sec,
                             precision=jax.lax.Precision.HIGHEST)

    # back to slot-major (slot id = cell*C + rank), then to original order
    cnt_s = cnt.T.reshape(-1)  # (G^3, C) -> flat cell*C + rank
    s1_s = jnp.transpose(s1, (2, 0, 1)).reshape(-1, 3)
    s2_s = jnp.transpose(s2, (2, 0, 1)).reshape(-1, 6)

    slot = jnp.maximum(point_slot, 0)
    has = (point_slot >= 0)
    n = jnp.where(has, cnt_s[slot], 0.0)
    nn = jnp.maximum(n, 1.0)[:, None]
    mean = s1_s[slot] / nn
    m2 = s2_s[slot] / nn
    mx, my, mz = mean[:, 0], mean[:, 1], mean[:, 2]
    cov = jnp.stack([
        jnp.stack([m2[:, 0] - mx * mx, m2[:, 3] - mx * my, m2[:, 4] - mx * mz], -1),
        jnp.stack([m2[:, 3] - mx * my, m2[:, 1] - my * my, m2[:, 5] - my * mz], -1),
        jnp.stack([m2[:, 4] - mx * mz, m2[:, 5] - my * mz, m2[:, 2] - mz * mz], -1),
    ], -2)
    return n, mean, cov


@partial(jax.jit, static_argnames=("grid_size", "cell_capacity"))
def grid_nearest_neighbor(
    query: jax.Array,
    query_valid: jax.Array,
    db: jax.Array,
    db_valid: jax.Array,
    radius: float,
    grid_size: int = 64,
    cell_capacity: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-set 1-NN among db points within ~radius: the large-N ICP
    correspondence kernel. Returns (indices (Nq,), sq_dists (Nq,)); queries
    with no in-radius neighbor get sq_dist BIG (ICP's threshold rejects
    them, matching the brute-force path's behavior)."""
    qp = jnp.asarray(query, jnp.float32)
    G, C = grid_size, cell_capacity
    # bin db and queries on a SHARED origin so cells align
    both_valid = jnp.concatenate([query_valid, db_valid])
    both = jnp.concatenate([qp, jnp.asarray(db, jnp.float32)])
    lo = jnp.min(jnp.where(both_valid[:, None], both, BIG), axis=0) - 0.5 * radius

    def bin_with_origin(p, valid):
        N = p.shape[0]
        cell = jnp.floor((p - lo) / radius).astype(jnp.int32)
        inb = jnp.all((cell >= 0) & (cell < G), axis=1) & valid
        cell = jnp.clip(cell, 0, G - 1)
        cid = (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2]
        cid = jnp.where(inb, cid, G * G * G)
        order = jnp.argsort(cid)
        sc = cid[order]
        sp = p[order]
        iota = jnp.arange(N, dtype=jnp.int32)
        isnew = jnp.concatenate([jnp.array([True]), sc[1:] != sc[:-1]])
        rank = iota - jax.lax.cummax(jnp.where(isnew, iota, 0))
        ok = (rank < C) & (sc < G * G * G)
        n_slots = G * G * G * C
        tid = jnp.where(ok, sc * C + rank, n_slots)
        table = jnp.full((n_slots + 1, 3), BIG, jnp.float32).at[tid].set(sp)
        slot_orig = jnp.full((n_slots + 1,), -1, jnp.int32).at[tid].set(
            order.astype(jnp.int32))
        point_slot = jnp.full((N,), -1, jnp.int32).at[order].set(
            jnp.where(ok, tid, -1).astype(jnp.int32))
        return table[:-1], slot_orig[:-1], point_slot

    qt, _, q_slot = bin_with_origin(qp, query_valid)
    dt, d_orig, _ = bin_with_origin(jnp.asarray(db, jnp.float32), db_valid)

    qg = qt.reshape(G, G, G, C, 3)
    dg = dt.reshape(G, G, G, C, 3)
    ig = d_orig.reshape(G, G, G, C)
    best_d = jnp.full((G, G, G, C), BIG, jnp.float32)
    best_i = jnp.zeros((G, G, G, C), jnp.int32)

    for off in _neighbor_offsets():
        cand, cidx = dg, ig
        for ax, sh in enumerate(off):
            if sh:
                cand = jnp.roll(cand, -sh, axis=ax)
                cidx = jnp.roll(cidx, -sh, axis=ax)
        wrap = jnp.zeros((G, G, G), bool)
        for ax, sh in enumerate(off):
            if sh:
                coord = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), ax)
                wrap = wrap | (coord + sh < 0) | (coord + sh >= G)
        d2 = jnp.sum((qg[..., :, None, :] - cand[..., None, :, :]) ** 2,
                     axis=-1)
        d2 = jnp.where(wrap[..., None, None], BIG, d2)
        d2 = jnp.where(cidx[..., None, :] < 0, BIG, d2)
        md = jnp.min(d2, axis=-1)
        mi = jnp.argmin(d2, axis=-1)
        take = md < best_d
        best_d = jnp.where(take, md, best_d)
        best_i = jnp.where(take, jnp.take_along_axis(
            cidx, mi.reshape(G, G, G, C), axis=-1), best_i)

    res_d = best_d.reshape(-1)
    res_i = best_i.reshape(-1)
    slot = jnp.maximum(q_slot, 0)
    out_d = jnp.where(q_slot >= 0, res_d[slot], BIG)
    out_i = jnp.where(q_slot >= 0, res_i[slot], 0)
    return out_i.astype(jnp.int32), jnp.where(query_valid, out_d, BIG)
