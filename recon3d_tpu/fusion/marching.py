"""Isosurface mesh extraction from the TSDF grid (marching tetrahedra).

Replaces ScalableTSDFVolume.extract_triangle_mesh (test/mini1.py:357-360,
check90.py:324-340). Marching cubes' 256-case table is replaced by marching
tetrahedra: each cube splits into 6 tetrahedra, each tet has only 3
topological output cases (0, 1, or 2 triangles) that are *computed* rather
than looked up — no 4KB magic table to mistype, same zero-crossing surface.

Data-dependent output size is handled the XLA way: every (cube, tet) slot
statically owns 2 candidate triangles with a validity flag; triangles are
compacted into a fixed-capacity soup by a valid-first stable sort, and
vertices are welded by quantize + lexsort + unique. The grid is processed
in z-slabs inside a lax.scan so the intermediate candidate buffers stay
O(slab) rather than O(R^3).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as _np

from recon3d_tpu.fusion.tsdf import TSDFVolume
from recon3d_tpu.utils.types import TriangleMesh

# 6-tetrahedra decomposition of the unit cube (corner indices 0..7 with
# corner c = (x + (c&1), y + ((c>>1)&1), z + (c>>2)&1)). All share the main
# diagonal 0-7, guaranteeing face-consistent triangulation between cubes.
_TETS = (
    (0, 5, 1, 7),
    (0, 1, 3, 7),
    (0, 3, 2, 7),
    (0, 2, 6, 7),
    (0, 6, 4, 7),
    (0, 4, 5, 7),
)
_CORNER_OFFSETS = _np.array(  # numpy: no device op at import time
    [[(c & 1), ((c >> 1) & 1), ((c >> 2) & 1)] for c in range(8)], _np.float32
)


def _tet_triangles(p, v, ok):
    """Triangles for one tet across a batch.

    p: (..., 4, 3) corner positions; v: (..., 4) tsdf values; ok: (...,) mask.
    Returns (tri_a, tri_b): each (..., 3, 3) vertex positions, and validity
    flags (..., 2). Cases by inside-count (v < 0):
      1 inside  -> 1 triangle (3 edges from the inside corner)
      2 inside  -> quad -> 2 triangles
      3 inside  -> 1 triangle (3 edges from the outside corner)
    """
    inside = v < 0.0
    n_in = jnp.sum(inside.astype(jnp.int32), axis=-1)

    def interp(a_idx, b_idx):
        va = jnp.take_along_axis(v, a_idx[..., None], -1)[..., 0]
        vb = jnp.take_along_axis(v, b_idx[..., None], -1)[..., 0]
        pa = jnp.take_along_axis(p, a_idx[..., None, None].repeat(3, -1), -2)[..., 0, :]
        pb = jnp.take_along_axis(p, b_idx[..., None, None].repeat(3, -1), -2)[..., 0, :]
        t = va / jnp.where(jnp.abs(va - vb) < 1e-12, 1e-12, va - vb)
        return pa + jnp.clip(t, 0.0, 1.0)[..., None] * (pb - pa)

    # order corners: insides first (stable by index), outsides after
    rank = jnp.argsort(jnp.where(inside, 0, 1), axis=-1, stable=True)  # (...,4)
    i0, i1 = rank[..., 0], rank[..., 1]
    # edges used per case:
    # n_in==1: (i0,o0') for the 3 outside corners: rank[1],rank[2],rank[3]
    e_a0 = interp(i0, rank[..., 1])
    e_a1 = interp(i0, rank[..., 2])
    e_a2 = interp(i0, rank[..., 3])
    tri1 = jnp.stack([e_a0, e_a1, e_a2], -2)  # case 1 or 3 (symmetric)
    # n_in==3: edges from the single outside corner rank[3] to the 3 insides
    e_c0 = interp(rank[..., 0], rank[..., 3])
    e_c1 = interp(rank[..., 1], rank[..., 3])
    e_c2 = interp(rank[..., 2], rank[..., 3])
    tri3 = jnp.stack([e_c0, e_c1, e_c2], -2)
    # n_in==2: quad between insides {i0,i1} and outsides {rank2, rank3}
    q00 = interp(i0, rank[..., 2])
    q01 = interp(i0, rank[..., 3])
    q10 = interp(i1, rank[..., 2])
    q11 = interp(i1, rank[..., 3])
    tri2a = jnp.stack([q00, q01, q10], -2)
    tri2b = jnp.stack([q10, q01, q11], -2)

    tri_a = jnp.where((n_in == 2)[..., None, None], tri2a,
                      jnp.where((n_in == 3)[..., None, None], tri3, tri1))
    tri_b = tri2b
    valid_a = ok & (n_in >= 1) & (n_in <= 3)
    valid_b = ok & (n_in == 2)
    return tri_a, tri_b, valid_a, valid_b


def _tet_validity(vals, ok):
    """Candidate validity bits WITHOUT computing any triangle geometry.

    vals: (..., 8) cube corner TSDF values; ok: (...,) cube mask.
    Returns (..., 12) bools ordered [tet0_a, tet0_b, tet1_a, ...] — the
    exact candidate order extract_triangle_soup's geometry pass uses.
    """
    inside = vals < 0.0
    va = []
    vb = []
    for tet in _TETS:
        n_in = sum(inside[..., c].astype(jnp.int32) for c in tet)
        va.append(ok & (n_in >= 1) & (n_in <= 3))
        vb.append(ok & (n_in == 2))
    return jnp.stack([v for pair in zip(va, vb) for v in pair], -1)


def _tet_validity_z(vals_z, ok):
    """_tet_validity on 8 separate z-leading (Z, X, Y) corner slices,
    returning (Z, 12, X, Y) — identical bits, TPU-friendly layout (see
    _slab_tris). Candidate order is [tet0_a, tet0_b, tet1_a, ...] on
    axis 1, matching _tet_validity's trailing axis."""
    inside = [v < 0.0 for v in vals_z]
    out = []
    for tet in _TETS:
        n_in = sum(inside[c].astype(jnp.int32) for c in tet)
        out.append(ok & (n_in >= 1) & (n_in <= 3))
        out.append(ok & (n_in == 2))
    return jnp.stack(out, 1)


_TETS_ARR = _np.array(_TETS, _np.int32)  # (6, 4) corner ids per tet


def _slab_tris(vol: TSDFVolume, z0, z_lo, slab: int, cap_per_slab: int,
               weight_min: float):
    """Triangles for cubes whose corner z lies in [z0, z0+slab), compacted
    to a (cap_per_slab, 3, 3) buffer + validity + emitted count + the
    TRUE candidate total (total > n means cap_per_slab truncated the
    slab — callers count those drops instead of losing them silently).

    z_lo masks cubes already emitted by the previous slab (the last slab
    is shifted to stay in-bounds and would otherwise overlap). Shared by
    the full-scan extract_triangle_soup and the incremental mesher's
    dirty-slab refresh, so the two paths are bitwise-identical per slab.
    """
    t, w, R = vol.tsdf, vol.weight, vol.resolution
    X, Y, Z = R - 1, R - 1, slab
    K = Z * 12
    # cubes with corner z in [z0, z0+slab): a (slab+1, R, R) z-LEADING
    # window. z-minor layouts here put a dim of `slab`=8 on the 128-lane
    # axis, so every (X, Y, Z[, 8]) intermediate padded 16x — the
    # validity phase was moving ~2 GB per 8-slab batch for 130 MB of
    # payload. z-leading keeps y on the lanes (255 -> 256, ~1x padding).
    # transpose the WHOLE volume once, then slice the leading axis: the
    # transpose has no per-slab operand, so under the incremental
    # mesher's vmap-over-slabs XLA hoists it out of the batch (a per-slab
    # transpose materialized a badly-padded (K, R, R, slab+1) batch)
    tz = jnp.transpose(t, (2, 0, 1))
    wz = jnp.transpose(w, (2, 0, 1))
    twz = jax.lax.dynamic_slice_in_dim(tz, z0, slab + 1, axis=0)
    wwz = jax.lax.dynamic_slice_in_dim(wz, z0, slab + 1, axis=0)
    # corner values for each cube: 8 x (Z, X, Y) slices (never stacked —
    # the old (X, Y, Z, 8) stack was the worst-padded array of all)
    vals_z = [
        twz[((c >> 2) & 1):((c >> 2) & 1) + Z, (c & 1):(c & 1) + X,
            ((c >> 1) & 1):((c >> 1) & 1) + Y] for c in range(8)]
    wok = None
    for c in range(8):
        wc = wwz[((c >> 2) & 1):((c >> 2) & 1) + Z, (c & 1):(c & 1) + X,
                 ((c >> 1) & 1):((c >> 1) & 1) + Y] >= weight_min
        wok = wc if wok is None else (wok & wc)
    zidx = z0 + jnp.arange(Z)
    ok = wok & (zidx >= z_lo)[:, None, None]

    # ---- compaction on validity bits only (no geometry yet)
    # (Z, 12, X, Y) -> (X, Y, Z, 12): candidate ids keep the layout the
    # geometry phase and the soup cursor have always used (k = z*12 + j)
    val = jnp.transpose(_tet_validity_z(vals_z, ok),
                        (2, 3, 0, 1)).reshape(X * Y, K)  # (G, K)
    counts = jnp.sum(val.astype(jnp.int32), axis=1)  # (G,)
    order = jnp.argsort(~val, axis=1, stable=True)   # (G, K) lane sort
    cum = jnp.cumsum(counts)                         # inclusive
    total = cum[-1]
    r = jnp.arange(cap_per_slab, dtype=jnp.int32)
    g = jnp.clip(jnp.searchsorted(cum, r, side="right"), 0, X * Y - 1)
    local = jnp.clip(r - (cum[g] - counts[g]), 0, K - 1)
    k = order[g, local]                              # (cap,) candidate id
    n = jnp.minimum(total, cap_per_slab)
    sel = r < n

    # ---- geometry for survivors only
    x = g // Y
    y = g % Y
    z_rel = k // 12
    tet_i = (k % 12) // 2
    ab = k % 2
    cids = jnp.asarray(_TETS_ARR)[tet_i]             # (cap, 4)
    v8 = jnp.stack([vz[z_rel, x, y] for vz in vals_z], -1)   # (cap, 8)
    vv = jnp.take_along_axis(v8, cids, axis=1)               # (cap, 4)
    base = jnp.stack([x, y, z0 + z_rel], -1).astype(jnp.float32)
    pp = (base[:, None, :] + jnp.asarray(_CORNER_OFFSETS)[cids]) \
        * vol.voxel_size + vol.origin                # (cap, 4, 3)
    ta, tb, _, _ = _tet_triangles(pp, vv, sel)
    tri = jnp.where((ab == 1)[:, None, None], tb, ta)
    return tri, sel, n, total


def default_max_triangles(resolution: int) -> int:
    """Resolution-scaled triangle budget shared by extract_triangle_mesh
    and IncrementalMesher (fusion/incremental.py) — ONE formula so their
    default caps (and therefore truncation behavior) agree. R^3/4 gives
    ~4x headroom over a flat sheet's ~2*R^2 triangles concentrated in a
    couple of z-slabs, and clamps to the production 1<<19 at R=256."""
    return max(1 << 14, min(1 << 19, resolution ** 3 // 4))


def slab_cap(resolution: int, slab: int, max_triangles: int,
             mult: int = 4) -> int:
    """Per-slab triangle cap shared by the full extractor and the
    incremental mesher (fusion/incremental.py) — one formula so the two
    paths truncate identically. `mult`x the uniform quota (a surface
    sheet concentrates the soup in the few slabs it crosses), bounded by
    the global buffer and the geometric cube-count ceiling. The per-slab
    gather/compact work scales with the cap, so extract_triangle_mesh
    first tries mult=1 and only re-runs at mult=4 when triangles were
    actually dropped."""
    R = resolution
    n_slabs = (R - 1) // slab + (1 if (R - 1) % slab else 0)
    quota = max_triangles // n_slabs + 1
    return min(mult * quota, max_triangles, (R - 1) * (R - 1) * slab * 12)


@partial(jax.jit, static_argnames=("max_triangles", "slab", "with_dropped",
                                   "cap_mult"))
def extract_triangle_soup(
    vol: TSDFVolume,
    max_triangles: int = 1 << 19,
    weight_min: float = 1.0,
    slab: int = 8,
    with_dropped: bool = False,
    cap_mult: int = 4,
):
    """TSDF -> triangle soup (T, 3, 3) positions + (T,) validity.

    Slab-scanned over z so peak memory is O(R^2 * slab). Within a slab the
    surface is SPARSE (~0.3% of the 6M candidate (cube, tet, tri) slots at
    256^3), so compaction never materializes per-candidate geometry: a
    cheap elementwise validity pass feeds a (X*Y, slab*12) batched lane
    argsort + group cumsum + searchsorted, and triangle interpolation runs
    only for the <= cap_per_slab survivors. The original formulation built
    224 MB of candidate triangles per slab and globally argsorted 6.2M
    keys per slab — 32 s for a 256^3 volume on a v5e; this one is
    elementwise + O(cap) gathers.
    """
    R = vol.resolution
    n_slabs = (R - 1) // slab + (1 if (R - 1) % slab else 0)
    # per-slab cap: 4x the uniform quota, bounded by the global buffer
    # and the cube-count ceiling. A uniform max_triangles // n_slabs
    # quota silently truncated dense slabs even with global headroom
    # left (a single surface sheet concentrates the whole soup in the
    # few slabs it crosses); borrowing lets those slabs use it, and the
    # cursor still bounds the total. Remaining truncation (slab > 4x
    # quota, or global overflow) is COUNTED and returned when
    # with_dropped is set — no silent caps.
    cap_per_slab = slab_cap(R, slab, max_triangles, mult=cap_mult)

    def slab_tris(z0, z_lo):
        return _slab_tris(vol, z0, z_lo, slab, cap_per_slab, weight_min)

    def body(carry, i):
        out_tri, out_val, cursor, dropped = carry
        z0 = jnp.minimum(i * slab, R - 1 - slab)
        tri_c, val_c, n, tot = slab_tris(z0, i * slab)
        pos = cursor + jnp.arange(cap_per_slab)
        # triangles past the global buffer collapse onto the last row
        # (last write wins); they are counted AFTER the scan from the
        # final cursor — exact even when several slabs spill (per-slab
        # `sum - 1` accounting undercounted the clobbered survivors)
        pos = jnp.where(val_c, jnp.minimum(pos, max_triangles - 1), max_triangles - 1)
        out_tri = out_tri.at[pos].set(jnp.where(val_c[:, None, None], tri_c, out_tri[pos]))
        out_val = out_val.at[pos].max(val_c)
        return (out_tri, out_val, cursor + n, dropped + (tot - n)), None

    out_tri = jnp.zeros((max_triangles, 3, 3), jnp.float32)
    out_val = jnp.zeros((max_triangles,), bool)
    (out_tri, out_val, count, dropped), _ = jax.lax.scan(
        body, (out_tri, out_val, jnp.asarray(0, jnp.int32),
               jnp.asarray(0, jnp.int32)), jnp.arange(n_slabs))
    # slabs write contiguous [cursor, cursor+n) windows clipped to the
    # last row, so exactly max(count - max_triangles, 0) triangles were
    # clobbered; the returned count is clamped to the buffer (valid rows
    # = count; true emitted total recoverable as count + dropped)
    over = jnp.maximum(count - max_triangles, 0)
    count = jnp.minimum(count, max_triangles)
    dropped = dropped + over
    if with_dropped:
        return out_tri, out_val, count, dropped
    return out_tri, out_val, count


@jax.jit
def _weld_device(verts, vvalid, quant, ref=None):
    """Group identical quantized vertices on-device.

    verts: (N, 3) f32, vvalid: (N,) bool, quant: scalar quantization step.
    Returns (vert_sum (N,3), vert_count (N,), inv (N,) group id per input
    vertex, n_unique) — groups are keyed by round((verts - ref)/quant);
    invalid vertices sort to a trailing sentinel group excluded from the
    sums. `ref` (default: the soup's min valid vertex) recenters the
    integer keys so they stay small: without it, a far origin (|key| ~1e6
    at small voxel_size) erodes the f32 rounding margin so coincident-but-
    not-bitwise-equal vertices from adjacent tets can weld inconsistently,
    and extreme origin/quant ratios overflow int32 silently. Pass a FIXED
    ref (e.g. the volume origin) when groupings must agree across welds of
    different soups — the incremental mesher's persistent table does.
    """
    if ref is None:
        ref = jnp.min(jnp.where(vvalid[:, None], verts,
                                jnp.float32(3.4e38)), axis=0)
        ref = jnp.where(jnp.any(vvalid), ref, 0.0)
    q = jnp.round((verts - ref) / quant).astype(jnp.int32)
    big = jnp.iinfo(jnp.int32).max
    q = jnp.where(vvalid[:, None], q, big)
    perm = jnp.lexsort((q[:, 2], q[:, 1], q[:, 0]))
    qs = q[perm]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(qs[1:] != qs[:-1], axis=1)])
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1
    inv = jnp.zeros_like(gid).at[perm].set(gid)
    n = verts.shape[0]
    tgt = jnp.where(vvalid, inv, n)  # out-of-range -> dropped by scatter
    vert_sum = jnp.zeros((n, 3), jnp.float32).at[tgt].add(
        jnp.where(vvalid[:, None], verts, 0.0), mode="drop")
    vert_count = jnp.zeros((n,), jnp.int32).at[tgt].add(1, mode="drop")
    n_unique = jnp.max(jnp.where(vvalid, inv + 1, 0))
    return vert_sum, vert_count, inv, n_unique


@partial(jax.jit, static_argnames=("table_bits", "probes"))
def _weld_device_hash(verts, vvalid, quant, table_bits: int = 22,
                      probes: int = 16, ref=None):
    """Sort-free weld: open-addressing hash table over quantized coords.

    Same contract as _weld_device — (vert_sum (N,3), vert_count (N,),
    inv (N,) group id, n_unique) — except group ids are assigned by
    hash-slot rank instead of lexicographic key order (weld_mesh never
    relies on the order). Replaces the O(N log^2 N) bitonic lexsort with
    O(probes * N) scatter/gather rounds: each round scatter-mins candidate
    indices into empty slots, then every unresolved vertex checks whether
    the slot owner's key matches its own (the owner always matches itself,
    so every claimed slot resolves at least one vertex and the loop
    strictly progresses). Same-key vertices share a probe sequence, so a
    key can never split across two slots.

    At the default table (4M slots) and a 1.57M-vertex soup the load is
    <0.4 and 16 quadratic probes resolve everything in practice; any
    leftover (adversarial hash collisions) degrades gracefully to
    singleton vertices — the mesh stays valid, coincident copies just
    don't merge.
    """
    N = verts.shape[0]
    S = 1 << table_bits
    if ref is None:
        ref = jnp.min(jnp.where(vvalid[:, None], verts,
                                jnp.float32(3.4e38)), axis=0)
        ref = jnp.where(jnp.any(vvalid), ref, 0.0)
    q = jnp.round((verts - ref) / quant).astype(jnp.int32)
    q = jnp.where(vvalid[:, None], q, -1)

    # 3-coordinate mix (classic spatial-hash primes); int32 overflow wraps
    h = ((q[:, 0] * jnp.int32(73856093))
         ^ (q[:, 1] * jnp.int32(19349663))
         ^ (q[:, 2] * jnp.int32(83492791))) & (S - 1)

    idx = jnp.arange(N, dtype=jnp.int32)

    def round_body(state):
        p, owner, slot_of, unresolved, cur = state
        tgt = jnp.where(unresolved, cur, S)       # masked-out -> dropped
        claim = jnp.full((S,), N, jnp.int32).at[tgt].min(idx, mode="drop")
        owner = jnp.where(owner == N, claim, owner)
        own_i = owner[cur]
        own_q = q[jnp.clip(own_i, 0, N - 1)]
        match = unresolved & (own_i < N) & jnp.all(own_q == q, axis=1)
        slot_of = jnp.where(match, cur, slot_of)
        unresolved = unresolved & ~match
        cur = (cur + 2 * p + 1) & (S - 1)         # quadratic probing
        return p + 1, owner, slot_of, unresolved, cur

    def round_cond(state):
        p, _owner, _slot_of, unresolved, _cur = state
        # at load <0.4 nearly everything resolves in 2-3 rounds; a static
        # unroll paid all `probes` full-N scatter rounds regardless
        return (p < probes) & jnp.any(unresolved)

    _, owner, slot_of, unresolved, _ = jax.lax.while_loop(
        round_cond, round_body,
        (jnp.int32(0), jnp.full((S,), N, jnp.int32),
         jnp.zeros((N,), jnp.int32), vvalid, h))

    occupied = owner < N
    rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1   # (S,)
    n_slots = jnp.sum(occupied.astype(jnp.int32))
    resolved = vvalid & ~unresolved
    extra = jnp.cumsum(unresolved.astype(jnp.int32)) - 1
    inv = jnp.where(resolved, rank[slot_of],
                    jnp.where(unresolved, n_slots + extra, 0))
    n_unique = n_slots + jnp.sum(unresolved.astype(jnp.int32))

    tgt = jnp.where(vvalid, inv, N)
    vert_sum = jnp.zeros((N, 3), jnp.float32).at[tgt].add(
        jnp.where(vvalid[:, None], verts, 0.0), mode="drop")
    vert_count = jnp.zeros((N,), jnp.int32).at[tgt].add(1, mode="drop")
    return vert_sum, vert_count, inv, n_unique


def weld_mesh(tri_soup, tri_valid, voxel_size: float,
              color_fn=None, method: str = "hash",
              ref=None) -> TriangleMesh:
    """Triangle soup -> indexed TriangleMesh.

    Quantizes vertices to voxel_size/256 and merges duplicates — the indexed
    topology Open3D's extract_triangle_mesh returns. The weld runs
    on-device over the full fixed-capacity soup; the host only compacts
    the first n_unique rows (the former np.unique(axis=0) formulation
    spent ~1.8 s/extract on host). method="hash" (default) groups by
    open-addressing hash (_weld_device_hash, sort-free); "sort" keeps the
    lexsort formulation as the oracle twin.
    """
    import numpy as np

    soup = jnp.asarray(tri_soup)
    tvalid = jnp.asarray(tri_valid)
    weld = _weld_device_hash if method == "hash" else _weld_device
    vert_sum, vert_count, inv, n_unique = weld(
        soup.reshape(-1, 3), jnp.repeat(tvalid, 3),
        jnp.float32(voxel_size / 256.0), ref=ref)
    n_u = int(n_unique)
    if n_u == 0:
        return TriangleMesh(
            vertices=jnp.zeros((1, 3), jnp.float32),
            triangles=jnp.zeros((1, 3), jnp.int32),
            vertex_valid=jnp.zeros((1,), bool),
            triangle_valid=jnp.zeros((1,), bool),
        )
    out_verts = (np.asarray(vert_sum[:n_u], np.float64)
                 / np.maximum(np.asarray(vert_count[:n_u]), 1)[:, None])
    faces = np.asarray(inv).reshape(-1, 3)[np.asarray(tvalid)].astype(np.int32)
    # drop degenerate faces (repeated welded vertices)
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    faces = faces[good]
    colors = None
    if color_fn is not None:
        colors = jnp.asarray(color_fn(out_verts.astype(np.float32)))
    return TriangleMesh(
        vertices=jnp.asarray(out_verts, jnp.float32),
        triangles=jnp.asarray(faces),
        vertex_valid=jnp.ones((n_u,), bool),
        triangle_valid=jnp.ones((len(faces),), bool),
        vertex_colors=colors,
    )


def sample_volume_colors(vol: TSDFVolume):
    """Returns color_fn(verts)->(N,3) trilinear sampler over the color grid."""
    if vol.color is None:
        return None

    def color_fn(verts):
        g = (jnp.asarray(verts) - vol.origin) / vol.voxel_size
        R = vol.resolution
        g0 = jnp.floor(g).astype(jnp.int32)
        f = g - g0
        acc = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wgt = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                           * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                           * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                    idx = jnp.clip(g0 + jnp.array([dx, dy, dz]), 0, R - 1)
                    acc = acc + wgt[:, None] * vol.color[idx[:, 0], idx[:, 1], idx[:, 2]]
        return jnp.clip(acc, 0.0, 1.0)

    return color_fn


@jax.jit
def _orient_by_gradient(vol: TSDFVolume, soup: jax.Array) -> jax.Array:
    """Flip triangles whose normal opposes the local TSDF gradient so
    winding is globally consistent (outward: inside(-) -> outside(+))."""
    centroid = jnp.mean(soup, axis=1)  # (T, 3)
    g = (centroid - vol.origin) / vol.voxel_size
    gi = jnp.clip(jnp.round(g).astype(jnp.int32), 1, vol.resolution - 2)
    x, y, z = gi[:, 0], gi[:, 1], gi[:, 2]
    t = vol.tsdf
    grad = jnp.stack([
        t[x + 1, y, z] - t[x - 1, y, z],
        t[x, y + 1, z] - t[x, y - 1, z],
        t[x, y, z + 1] - t[x, y, z - 1],
    ], -1)
    n = jnp.cross(soup[:, 1] - soup[:, 0], soup[:, 2] - soup[:, 0])
    flip = jnp.sum(n * grad, -1) < 0
    flipped = soup[:, jnp.array([0, 2, 1])]
    return jnp.where(flip[:, None, None], flipped, soup)


def extract_triangle_mesh(vol: TSDFVolume,
                          max_triangles: Optional[int] = None,
                          weight_min: float = 1.0) -> TriangleMesh:
    """ScalableTSDFVolume.extract_triangle_mesh equivalent (mini1.py:357-360).

    Adaptive per-slab cap: the soup scan's gather/compact work scales
    with the cap, so the common case runs at the 1x uniform quota and
    only scenes that actually DROP triangles (a surface sheet
    concentrated in few z-slabs) re-run at the 4x borrowing cap — one
    scalar device round-trip decides. Results at either cap agree with
    the incremental mesher whenever nothing was dropped (no truncation
    on any path), and at 4x the caps are identical by construction."""
    if max_triangles is None:
        max_triangles = default_max_triangles(vol.resolution)
    soup, valid, _, dropped = extract_triangle_soup(
        vol, max_triangles=max_triangles, weight_min=weight_min,
        with_dropped=True, cap_mult=1)
    if int(dropped) > 0:
        soup, valid, _ = extract_triangle_soup(
            vol, max_triangles=max_triangles, weight_min=weight_min,
            cap_mult=4)
    soup = _orient_by_gradient(vol, soup)
    # origin-anchored quantization so groupings agree with the incremental
    # mesher's persistent weld table over the same volume
    return weld_mesh(soup, valid, float(vol.voxel_size),
                     color_fn=sample_volume_colors(vol), ref=vol.origin)
