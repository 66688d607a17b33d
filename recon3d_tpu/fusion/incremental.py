"""Incremental mesh extraction over a dense TSDF volume.

Live re-meshing (visualizer.live_remesh_loop, check90.py's consumer-side
extract, mini1.py:357-360) re-extracts the WHOLE volume per update even
though one integrated frame only perturbs the visible surface shell. This
module tracks mesh-relevant change per z-slab (the same 8-row slabs the
full extractor scans) and refreshes only dirty slabs:

  - `integrate` wraps tsdf._integrate(with_changed_z=True): a (R,) bool
    z-profile of bitwise tsdf change / weight-threshold crossings, mapped
    to the slab windows it touches (free space re-hit by later frames
    stays bitwise identical, so the profile tracks the surface shell).
  - `update` re-runs the shared `_slab_tris` + orientation for dirty
    slabs only — batches of K dirty slabs march as one vmapped program
    whose corners share ONE flat probe loop — into a persistent per-slab
    triangle cache. Clean slabs cost nothing (they are never dispatched).
  - `mesh_device` welds the cached soup into a device-resident
    fixed-capacity TriangleMesh with the sort-free hash weld — zero host
    syncs, so a live loop can render it without stalling the stream.
  - `mesh` returns the host-compacted mesh (extract_triangle_mesh
    contract); equal to a full re-extract because clean slabs are bitwise
    frozen and dirty slabs run the identical slab kernel.

Per-slab layout: cache slab i owns rows [i*cap, (i+1)*cap) of the soup —
the full extractor packs slabs tightly with a cursor instead, so soup
ORDER differs from extract_triangle_soup, but the welded vertex/face SETS
are identical (tests/test_incremental.py canonicalizes both).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.fusion import marching as _marching
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.fusion.tsdf import TSDFVolume
from recon3d_tpu.utils.types import CameraIntrinsics, TriangleMesh


class MeshCache(NamedTuple):
    """Persistent per-slab triangle cache + slot-keyed weld table (a
    pytree: flows through jit).

    The weld table is the incremental half of the design: an
    open-addressing hash over origin-quantized vertex keys whose slots
    PERSIST across refreshes. A dirty slab subtracts its old corners'
    contributions (tracked by `fslot`) and inserts its new ones, so a
    refresh costs O(churn), not O(soup) — the full-soup weld was the
    ~700 ms floor of every live re-mesh regardless of how few slabs
    changed. Slots whose count returns to zero keep their key
    (tombstones); a returning surface reuses them, so the table does not
    grow under oscillating geometry."""

    tri: jax.Array    # (n_slabs, cap, 3, 3) oriented triangle positions
    val: jax.Array    # (n_slabs, cap) bool
    fslot: jax.Array  # (n_slabs, cap, 3) int32 weld slot per corner
    dirty: jax.Array  # (n_slabs,) bool — slabs needing a refresh
    key: jax.Array    # (S, 3) int32 quantized vertex key per slot
    used: jax.Array   # (S,) bool slot claimed (persists at count 0)
    vsum: jax.Array   # (S, 3) f32 sum of coincident corner copies
    vcnt: jax.Array   # (S,) int32 copy count
    ccol: jax.Array   # (S, 3) f32 last sampled vertex color
    nunres: jax.Array  # () int32 corners left slotless since last reset
    ndrop: jax.Array  # (n_slabs,) int32 triangles truncated per slab by
    #                   the fixed cache quota, as of each slab's last
    #                   refresh (sum = current truncation of the mesh)


class IncrementalMesher:
    """Dirty-slab marching tetrahedra with a persistent triangle cache.

    Usage (a live fuse/remesh loop):
        im = IncrementalMesher(resolution=256)
        vol = im.integrate(vol, depth, intr, extrinsic, color)  # per frame
        mesh = im.mesh_device(vol)   # on demand; refreshes dirty slabs
    """

    def __init__(self, resolution: int, slab: int = 8,
                 max_triangles: Optional[int] = None,
                 weight_min: float = 1.0,
                 table_bits: Optional[int] = None, probes: int = 16,
                 batch_k: int = 8, cap_mult: int = 4):
        R = resolution
        # dirty slabs refresh in batches of batch_k per device dispatch
        # (one vmapped march + one flat probe loop per batch)
        self.batch_k = batch_k
        self.R, self.slab, self.weight_min = R, slab, float(weight_min)
        self.n_slabs = (R - 1) // slab + (1 if (R - 1) % slab else 0)
        if max_triangles is None:
            # the SAME resolution-scaled default as
            # marching.extract_triangle_mesh: equality between the
            # incremental mesh and a default full extract requires the
            # two budgets (hence caps) to agree
            max_triangles = _marching.default_max_triangles(R)
        # per-slab cap via the SAME formula as extract_triangle_soup's
        # (marching.slab_cap). Every per-slab march, probe round, and
        # scatter in _build_update scales with the cap, so cap_mult is
        # the live-latency/completeness knob: 1 runs refreshes ~4x
        # faster but truncates camera-facing surfaces badly (a wall at
        # constant z concentrates the WHOLE mesh in 1-2 z-slabs — the
        # streaming equality test loses 2/3 of its triangles at 1x), so
        # the default stays 4; truncation is counted
        # (dropped_triangles) and warned with the raise-max_triangles
        # escape hatch, and the FINAL mesh
        # (marching.extract_triangle_mesh) escalates adaptively instead.
        self.cap_mult = cap_mult
        self.cap = _marching.slab_cap(R, slab, max_triangles,
                                      mult=cap_mult)
        # z-window per slab: start voxel and first-owned corner row (the
        # last slab is shifted in-bounds; z_lo masks the overlap rows)
        self._z0s = np.minimum(np.arange(self.n_slabs) * slab,
                               R - 1 - slab).astype(np.int32)
        self._z_los = (np.arange(self.n_slabs) * slab).astype(np.int32)
        # weld table ~4x the GLOBAL triangle budget: unique vertices run
        # ~tris/2, so the load stays well under 0.25. Keyed on
        # max_triangles, NOT n_slabs*cap — the 4x per-slab borrow is a
        # distribution allowance, not a 4x total budget, and sizing on it
        # quadrupled the table (982 s suite test at round-5 head); a
        # pathological every-slab-spills scene degrades to higher load
        # and is caught by the probe-failure health counter + rebuild
        if table_bits is None:
            table_bits = max(14, (max_triangles * 4 - 1).bit_length())
        self.table_bits, self.probes = table_bits, probes
        S = 1 << table_bits
        self.cache = MeshCache(
            tri=jnp.zeros((self.n_slabs, self.cap, 3, 3), jnp.float32),
            val=jnp.zeros((self.n_slabs, self.cap), bool),
            fslot=jnp.zeros((self.n_slabs, self.cap, 3), jnp.int32),
            dirty=jnp.ones((self.n_slabs,), bool),  # first update = full
            key=jnp.zeros((S, 3), jnp.int32),
            used=jnp.zeros((S,), bool),
            vsum=jnp.zeros((S, 3), jnp.float32),
            vcnt=jnp.zeros((S,), jnp.int32),
            ccol=jnp.zeros((S, 3), jnp.float32),
            nunres=jnp.zeros((), jnp.int32),
            ndrop=jnp.zeros((self.n_slabs,), jnp.int32),
        )
        self._integrate_fn = None
        self._update_fns = {}  # (K, cap_march) -> jitted refresh program
        self._mesh_fn = None
        # weld-table health: tombstoned slots keep their keys, so a very
        # long session whose TSDF drift keeps minting new quantized keys
        # can exhaust probe chains; nunres counts corners that found no
        # slot (their triangles are dropped). update() syncs the counter
        # every `health_check_every` refreshes and rebuilds the table
        # (mark_all_dirty) the moment it goes nonzero, bounding silent
        # triangle loss to one check window.
        self.health_check_every = 64
        self._updates_since_check = 0
        self._warned_dropped = False

    # ---- integrate with dirty tracking -------------------------------
    def dirty_hits(self, changed_z: jax.Array) -> jax.Array:
        """(R,) changed-z profile -> (n_slabs,) slab hits. Traceable —
        StreamingFusion folds this into its fused step program. Slab i
        reads voxel rows [z0, z0+slab], so it is hit iff any of those
        rows changed."""
        idx = (jnp.asarray(self._z0s)[:, None]
               + jnp.arange(self.slab + 1)[None, :])
        return jnp.any(changed_z[jnp.clip(idx, 0, self.R - 1)], axis=1)

    def _build_integrate(self):
        def run(vol, depth, intr, extrinsic, color, dirty):
            vol, changed_z = _tsdf._integrate(
                vol, depth, intr, extrinsic, color=color,
                with_changed_z=True, changed_weight_min=self.weight_min)
            return vol, dirty | self.dirty_hits(changed_z)

        return jax.jit(run, donate_argnums=(0,))

    def integrate(self, vol: TSDFVolume, depth, intr: CameraIntrinsics,
                  extrinsic, color=None) -> TSDFVolume:
        """tsdf.integrate_donated twin that also accumulates dirty slabs.
        Cites check90.py:188-226 (the consumer's per-frame integrate)."""
        if self._integrate_fn is None:
            self._integrate_fn = self._build_integrate()
        vol, dirty = self._integrate_fn(vol, depth, intr, extrinsic,
                                        color, self.cache.dirty)
        self.cache = self.cache._replace(dirty=dirty)
        # start the tiny dirty-mask D2H now so _run_update's host read
        # overlaps the integrate instead of paying a fresh round-trip
        # (~50 ms on a tunneled chip)
        try:
            dirty.copy_to_host_async()
        except Exception:
            pass
        return vol

    def mark_all_dirty(self) -> None:
        """Invalidate the whole cache (e.g. after loading a checkpoint, or
        to flush accumulated f32 add/subtract drift in the weld sums).
        Resets the persistent weld table too — after a reload the cached
        contributions no longer describe the table's state, so the next
        update() must rebuild from scratch rather than subtract stale
        sums."""
        S = 1 << self.table_bits
        self.cache = self.cache._replace(
            dirty=jnp.ones((self.n_slabs,), bool),
            val=jnp.zeros((self.n_slabs, self.cap), bool),
            key=jnp.zeros((S, 3), jnp.int32),
            used=jnp.zeros((S,), bool),
            vsum=jnp.zeros((S, 3), jnp.float32),
            vcnt=jnp.zeros((S,), jnp.int32),
            ccol=jnp.zeros((S, 3), jnp.float32),
            nunres=jnp.zeros((), jnp.int32),
            ndrop=jnp.zeros((self.n_slabs,), jnp.int32))

    # ---- dirty-slab refresh ------------------------------------------
    def _build_update(self, K: int, cap_march: Optional[int] = None):
        """ONE device program refreshing a batch of K dirty slabs.

        The round-3 shape — a fori_loop over ALL slabs with a lax.cond
        skip per slab — serialized the slab marches AND rebuilt the
        (S,)-sized probe-claim table once per probe round PER SLAB, so a
        'localized' few-slab update still paid ~n_slabs serialized table
        sweeps (measured 1189 ms vs 1355 ms for a plain full extract,
        plus a multi-minute XLA compile). Here the K slabs' marches run
        as one vmapped batch, their corners flatten into ONE probe loop
        (one claim-table sweep per round total), and old-subtract /
        new-insert are single flat scatters. Entries beyond the dirty
        count pad with index n_slabs (masked everywhere, dropped by
        scatter bounds).

        cap_march < self.cap builds the SMALL-CONTENT variant: the march
        compaction, probe lanes, and insert scatters all scale with the
        compaction width, so sparse dirty slabs (a close object in front
        of the scene — the live-remesh case) refresh at a fraction of
        the full-cap cost. Overflowing slabs are detected via the
        recorded per-slab drop count and the caller re-runs them at full
        cap — exact, because old-subtract makes refreshes idempotent.
        Results are padded to self.cap rows for the cache writes."""
        slab, cap, wmin = self.slab, self.cap, self.weight_min
        cap_m = cap if cap_march is None else cap_march
        n_slabs, probes = self.n_slabs, self.probes
        S = 1 << self.table_bits
        N3 = 3 * cap_m * K
        # index n_slabs = the pad slot: z0 0 is computed then masked out
        z0s = jnp.asarray(np.append(self._z0s, 0).astype(np.int32))
        z_los = jnp.asarray(np.append(self._z_los, 0).astype(np.int32))

        def upd(vol, cache, idxs):
            # origin-anchored quantization: keys are STABLE across
            # refreshes (a soup-vmin recentering would shift rounding
            # boundaries whenever the soup changes); marching's full weld
            # uses the same anchor so groupings agree
            quant = vol.voxel_size / 256.0
            origin = vol.origin
            color_fn = _marching.sample_volume_colors(vol)
            live = idxs < n_slabs                        # (K,)
            ci = jnp.clip(idxs, 0, n_slabs - 1)          # safe gather idx

            def one_slab(z0, z_lo):
                tri, sel, n, tot = _marching._slab_tris(
                    vol, z0, z_lo, slab, cap_m, wmin)
                # orientation is slab-local (reads only this slab's tsdf
                # neighborhood) so caching it stays exact
                return _marching._orient_by_gradient(vol, tri), sel, tot - n

            tri, sel, drop = jax.vmap(one_slab)(z0s[idxs], z_los[idxs])
            sel = sel & live[:, None]                    # (K, cap_m)

            # remove the batch's OLD contributions (exactly what previous
            # refreshes added: val/fslot track them)
            old_m = jnp.repeat((cache.val[ci] & live[:, None]).reshape(-1),
                               3)                        # (N3,)
            tgt_old = jnp.where(old_m, cache.fslot[ci].reshape(-1), S)
            old_corners = cache.tri[ci].reshape(-1, 3)
            vsum = cache.vsum.at[tgt_old].add(
                jnp.where(old_m[:, None], -old_corners, 0.0), mode="drop")
            vcnt = cache.vcnt.at[tgt_old].add(
                jnp.where(old_m, -1, 0), mode="drop")

            # insert the NEW corners: probe the persistent table (match an
            # existing key, or claim an empty slot via scatter-min;
            # same-key corners — within AND across slabs — share a probe
            # path, so one round resolves a whole coincident group)
            corners = tri.reshape(-1, 3)                  # (N3, 3)
            v3 = jnp.repeat(sel.reshape(-1), 3)
            q = jnp.round((corners - origin) / quant).astype(jnp.int32)
            q = jnp.where(v3[:, None], q, -(1 << 30))
            h = ((q[:, 0] * jnp.int32(73856093))
                 ^ (q[:, 1] * jnp.int32(19349663))
                 ^ (q[:, 2] * jnp.int32(83492791))) & (S - 1)

            def probe_lanes(qp, hp, unres0, used, key):
                """Probe M lanes against the persistent table. Per-round
                cost scales with M (gathers dominate on TPU), which is
                why callers compact to valid corners first."""
                M = qp.shape[0]
                idxm = jnp.arange(M, dtype=jnp.int32)

                def round_body(st):
                    p, used, key, slot_of, unresolved, cur = st
                    cand = jnp.where(unresolved & ~used[cur], cur, S)
                    claim = jnp.full((S,), M, jnp.int32).at[cand].min(
                        idxm, mode="drop")
                    # table-side win resolution (gather + where). A
                    # corner-side scatter form (used/key .at[won].set)
                    # was tried and measured ~25% SLOWER end to end on
                    # v5e — TPU scatters with dynamic indices cost more
                    # than the (S,)-row gather they replaced.
                    won = claim < M
                    used = used | won
                    key = jnp.where(won[:, None],
                                    qp[jnp.clip(claim, 0, M - 1)], key)
                    match = (unresolved & used[cur]
                             & jnp.all(key[cur] == qp, axis=1))
                    slot_of = jnp.where(match, cur, slot_of)
                    unresolved = unresolved & ~match
                    cur = (cur + 2 * p + 1) & (S - 1)
                    return p + 1, used, key, slot_of, unresolved, cur

                def round_cond(st):
                    return (st[0] < probes) & jnp.any(st[4])

                _, used, key, slot_of, unresolved, _ = jax.lax.while_loop(
                    round_cond, round_body,
                    (jnp.int32(0), used, key,
                     jnp.zeros((M,), jnp.int32), unres0, hp))
                return used, key, slot_of, unresolved

            # corner compaction: cap is sized for worst-case slabs, so
            # typically <25% of the N3 lanes are live — probing only the
            # compacted live lanes cuts the per-round gather traffic 4x.
            # The rare denser batch falls back to the full-lane probe.
            CAPC = max(1024, N3 // 4)

            def compact_probe(used, key):
                cidx = jnp.where(v3, size=CAPC, fill_value=N3)[0]
                cc = jnp.clip(cidx, 0, N3 - 1)
                livec = cidx < N3
                qc = jnp.where(livec[:, None], q[cc], -(1 << 30))
                used, key, slot_c, unres_c = probe_lanes(
                    qc, h[cc], livec, used, key)
                back = jnp.where(livec, cidx, N3)
                slot_of = jnp.zeros((N3,), jnp.int32).at[back].set(
                    slot_c, mode="drop")
                unresolved = jnp.zeros((N3,), bool).at[back].set(
                    unres_c, mode="drop")
                return used, key, slot_of, unresolved

            def full_probe(used, key):
                return probe_lanes(q, h, v3, used, key)

            used, key, slot_of, unresolved = jax.lax.cond(
                jnp.sum(v3, dtype=jnp.int32) <= CAPC,
                compact_probe, full_probe, cache.used, cache.key)

            # triangle-atomic: keep a triangle only if all three corners
            # landed slots, so removal stays symmetric
            tri_ok = sel & jnp.all((~unresolved).reshape(K, cap_m, 3),
                                   axis=2)
            add_m = jnp.repeat(tri_ok.reshape(-1), 3)
            tgt = jnp.where(add_m, slot_of, S)
            vsum = vsum.at[tgt].add(
                jnp.where(add_m[:, None], corners, 0.0), mode="drop")
            vcnt = vcnt.at[tgt].add(jnp.where(add_m, 1, 0), mode="drop")
            ccol = cache.ccol
            if color_fn is not None:
                cols = color_fn(corners)
                ccol = ccol.at[tgt].set(
                    jnp.where(add_m[:, None], cols, 0.0), mode="drop")

            slot3 = slot_of.reshape(K, cap_m, 3)
            if cap_m != cap:
                # pad to the cache's row width (dense writes are cheap;
                # the cap-scaled costs above already ran at cap_m)
                pad = ((0, 0), (0, cap - cap_m))
                tri = jnp.pad(tri, pad + ((0, 0), (0, 0)))
                tri_ok = jnp.pad(tri_ok, pad)
                slot3 = jnp.pad(slot3, pad + ((0, 0),))

            wi = jnp.where(live, idxs, n_slabs)          # write-or-drop
            return cache._replace(
                tri=cache.tri.at[wi].set(tri, mode="drop"),
                val=cache.val.at[wi].set(tri_ok, mode="drop"),
                fslot=cache.fslot.at[wi].set(slot3, mode="drop"),
                dirty=cache.dirty.at[wi].set(False, mode="drop"),
                key=key, used=used, vsum=vsum, vcnt=vcnt, ccol=ccol,
                nunres=cache.nunres + jnp.sum(unresolved,
                                              dtype=jnp.int32),
                # triangles past the fixed per-slab cache quota are LOST
                # for this refresh; record the per-slab count so
                # dropped_triangles can surface dense-slab truncation
                # instead of silently meshing with holes
                ndrop=cache.ndrop.at[wi].set(drop, mode="drop"))

        return jax.jit(upd, donate_argnums=(1,))

    @property
    def unresolved_corners(self) -> int:
        """Corners that found no weld slot since the last table reset
        (their triangles were dropped). Syncs one scalar on access."""
        return int(np.asarray(self.cache.nunres))

    @property
    def dropped_triangles(self) -> int:
        """Triangles the CURRENT cached mesh is missing because dense
        slabs exceeded the fixed per-slab quota (max_triangles /
        n_slabs). Nonzero means the live mesh has holes — construct the
        mesher with a larger max_triangles. Syncs on access."""
        return int(np.asarray(jnp.sum(self.cache.ndrop)))

    def _run_update(self, vol) -> None:
        """Refresh all currently-dirty slabs in greedy power-of-two
        batches (8+4+2+1 covering any count): padded batch entries would
        still pay a full slab march, so exact-size chunks keep the work
        proportional to the DIRTY count, not to ceil(n/K)*K. The dirty
        mask is a (n_slabs,) bool sync — one tiny transfer per remesh
        (prefetched asynchronously by integrate), paid to pick the chunk
        sizes host-side (a fixed-size device-side top-K would silently
        truncate when more than K slabs are dirty).

        Small LOCALIZED updates (dirty count <= batch_k, and never a full
        rebuild) first try the
        cap/8 march variant — every cap-scaled cost (march compaction,
        probe lanes, insert scatters) shrinks 8x, which is what makes a
        close-object re-mesh ~O(content) instead of O(cap). Slabs whose
        true content overflowed the small cap are detected from the
        recorded per-slab drop counts (one scalar-vector sync) and
        re-run at full cap — exact, since old-subtract makes refreshes
        idempotent."""
        dirty = np.where(np.asarray(self.cache.dirty))[0].astype(np.int32)
        if dirty.size == 0:
            return
        cap_small = max(2048, self.cap // 8)
        # LOCALIZED updates only: up to one batch of dirty slabs, and
        # never a full rebuild (mark_all_dirty on a small volume would
        # otherwise take the small pass first, overflow on every dense
        # slab, and re-run everything at full cap — double work)
        use_small = (dirty.size <= self.batch_k
                     and dirty.size < self.n_slabs
                     and cap_small < self.cap)

        def run(idxs, cap_march):
            pos = 0
            while pos < idxs.size:
                rest = idxs.size - pos
                K = next(k for k in (8, 4, 2, 1)
                         if k <= min(rest, self.batch_k))
                fkey = (K, cap_march)
                fn = self._update_fns.get(fkey)
                if fn is None:
                    fn = self._update_fns[fkey] = self._build_update(
                        K, None if cap_march == self.cap else cap_march)
                self.cache = fn(vol, self.cache,
                                jnp.asarray(idxs[pos:pos + K]))
                pos += K

        if use_small:
            run(dirty, cap_small)
            over = dirty[np.asarray(self.cache.ndrop)[dirty] > 0]
            if over.size:
                run(over.astype(np.int32), self.cap)
        else:
            run(dirty, self.cap)

    def update(self, vol: TSDFVolume) -> "IncrementalMesher":
        """Refresh dirty slabs in batched device dispatches; clean slabs
        cost nothing. Every `health_check_every` refreshes the
        unresolved-corner counter is synced; a nonzero count means probe
        chains hit tombstone saturation, so the weld table is rebuilt
        from scratch (one full re-mesh) instead of silently dropping
        triangles."""
        self._run_update(vol)
        self._updates_since_check += 1
        if self._updates_since_check >= self.health_check_every:
            self._updates_since_check = 0
            if self.unresolved_corners > 0:
                import logging

                logging.getLogger(__name__).warning(
                    "incremental mesher: %d corners unresolved (weld table "
                    "saturated by tombstones) — rebuilding the table",
                    self.unresolved_corners)
                self.mark_all_dirty()
                self._run_update(vol)
            ndrop = self.dropped_triangles
            if ndrop > 0 and not self._warned_dropped:
                import logging

                self._warned_dropped = True
                logging.getLogger(__name__).warning(
                    "incremental mesher: %d triangles exceed the per-slab "
                    "cache quota (%d) and are missing from the live mesh "
                    "— raise max_triangles", ndrop, self.cap)
        return self

    # ---- weld ---------------------------------------------------------
    def _build_mesh(self):
        def run(vol, cache):
            # the weld already lives in the persistent table: emitting
            # the mesh is just sums/counts + the cached face slots
            vvalid = cache.vcnt > 0
            verts = cache.vsum / jnp.maximum(cache.vcnt, 1)[:, None].astype(
                jnp.float32)
            faces = cache.fslot.reshape(-1, 3)
            nondeg = ((faces[:, 0] != faces[:, 1])
                      & (faces[:, 1] != faces[:, 2])
                      & (faces[:, 0] != faces[:, 2]))
            colors = None if vol.color is None else jnp.where(
                vvalid[:, None], cache.ccol, 0.0)
            return TriangleMesh(
                vertices=jnp.where(vvalid[:, None], verts, 0.0),
                triangles=faces,
                vertex_valid=vvalid,
                triangle_valid=cache.val.reshape(-1) & nondeg,
                vertex_colors=colors,
            )

        return jax.jit(run)

    def mesh_device(self, vol: TSDFVolume) -> TriangleMesh:
        """Refresh + incremental weld, entirely on device (fixed-capacity
        mesh with validity masks; no host round-trip). Cost scales with
        the dirty slabs' churn — a clean cache re-meshes in ~ms."""
        self.update(vol)
        if self._mesh_fn is None:
            self._mesh_fn = self._build_mesh()
        return self._mesh_fn(vol, self.cache)

    def mesh(self, vol: TSDFVolume) -> TriangleMesh:
        """Refresh + weld + host compaction — extract_triangle_mesh's
        contract (mini1.py:357-360), for save/export paths."""
        md = self.mesh_device(vol)
        v = np.asarray(md.vertices)
        vv = np.asarray(md.vertex_valid)
        f = np.asarray(md.triangles)
        tv = np.asarray(md.triangle_valid)
        remap = np.full(len(v), -1, np.int32)
        remap[vv] = np.arange(int(vv.sum()), dtype=np.int32)
        verts = v[vv]
        faces = remap[f[tv]]
        colors = None if md.vertex_colors is None else jnp.asarray(
            np.asarray(md.vertex_colors)[vv])
        if len(verts) == 0:
            return TriangleMesh(
                vertices=jnp.zeros((1, 3), jnp.float32),
                triangles=jnp.zeros((1, 3), jnp.int32),
                vertex_valid=jnp.zeros((1,), bool),
                triangle_valid=jnp.zeros((1,), bool),
            )
        return TriangleMesh(
            vertices=jnp.asarray(verts),
            triangles=jnp.asarray(faces),
            vertex_valid=jnp.ones((len(verts),), bool),
            triangle_valid=jnp.ones((len(faces),), bool),
            vertex_colors=colors,
        )


def weld_mesh_device(soup, tri_valid, voxel_size, color_fn=None,
                     table_bits: int = 22) -> TriangleMesh:
    """Triangle soup -> DEVICE-RESIDENT fixed-capacity TriangleMesh.

    weld_mesh's twin without the host compaction: vertices stay at soup
    capacity with a validity mask, faces index welded group ids directly.
    Everything is jit-composable (the incremental mesher compiles the
    refresh + weld as one program), so a live remesh loop never syncs.
    """
    verts = soup.reshape(-1, 3)
    vvalid = jnp.repeat(tri_valid, 3)
    vert_sum, vert_count, inv, n_unique = _marching._weld_device_hash(
        verts, vvalid, jnp.float32(voxel_size / 256.0),
        table_bits=table_bits)
    n = verts.shape[0]
    vertices = vert_sum / jnp.maximum(vert_count, 1)[:, None].astype(
        jnp.float32)
    vertex_valid = jnp.arange(n) < n_unique
    faces = inv.reshape(-1, 3)
    nondeg = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
              & (faces[:, 0] != faces[:, 2]))
    colors = None if color_fn is None else jnp.where(
        vertex_valid[:, None], color_fn(vertices), 0.0)
    return TriangleMesh(
        vertices=vertices,
        triangles=faces,
        vertex_valid=vertex_valid,
        triangle_valid=tri_valid & nondeg,
        vertex_colors=colors,
    )
