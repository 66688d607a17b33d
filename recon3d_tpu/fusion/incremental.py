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
    slabs only (lax.cond skips clean ones inside one fori_loop program)
    into a persistent per-slab triangle cache.
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

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.fusion import marching as _marching
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.fusion.tsdf import TSDFVolume
from recon3d_tpu.utils.types import CameraIntrinsics, TriangleMesh


class MeshCache(NamedTuple):
    """Persistent per-slab triangle cache (a pytree: flows through jit)."""

    tri: jax.Array    # (n_slabs, cap, 3, 3) oriented triangle positions
    val: jax.Array    # (n_slabs, cap) bool
    dirty: jax.Array  # (n_slabs,) bool — slabs needing a refresh


class IncrementalMesher:
    """Dirty-slab marching tetrahedra with a persistent triangle cache.

    Usage (a live fuse/remesh loop):
        im = IncrementalMesher(resolution=256)
        vol = im.integrate(vol, depth, intr, extrinsic, color)  # per frame
        mesh = im.mesh_device(vol)   # on demand; refreshes dirty slabs
    """

    def __init__(self, resolution: int, slab: int = 8,
                 max_triangles: int = 1 << 19, weight_min: float = 1.0):
        R = resolution
        self.R, self.slab, self.weight_min = R, slab, float(weight_min)
        self.n_slabs = (R - 1) // slab + (1 if (R - 1) % slab else 0)
        self.cap = min(max_triangles // self.n_slabs + 1,
                       (R - 1) * (R - 1) * slab * 12)
        # z-window per slab: start voxel and first-owned corner row (the
        # last slab is shifted in-bounds; z_lo masks the overlap rows)
        self._z0s = np.minimum(np.arange(self.n_slabs) * slab,
                               R - 1 - slab).astype(np.int32)
        self._z_los = (np.arange(self.n_slabs) * slab).astype(np.int32)
        self.cache = MeshCache(
            tri=jnp.zeros((self.n_slabs, self.cap, 3, 3), jnp.float32),
            val=jnp.zeros((self.n_slabs, self.cap), bool),
            dirty=jnp.ones((self.n_slabs,), bool),  # first update = full
        )
        self._integrate_fn = None
        self._update_fn = None
        self._mesh_fn = None

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
                with_changed_z=True)
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
        return vol

    def mark_all_dirty(self) -> None:
        """Invalidate the whole cache (e.g. after loading a checkpoint)."""
        self.cache = self.cache._replace(
            dirty=jnp.ones((self.n_slabs,), bool))

    # ---- dirty-slab refresh ------------------------------------------
    def _build_update(self):
        slab, cap, wmin = self.slab, self.cap, self.weight_min
        n_slabs = self.n_slabs
        z0s, z_los = jnp.asarray(self._z0s), jnp.asarray(self._z_los)

        def upd(vol, cache):
            def body(i, c):
                def refresh(c):
                    tri, sel, _ = _marching._slab_tris(
                        vol, z0s[i], z_los[i], slab, cap, wmin)
                    # orientation is slab-local (reads only this slab's
                    # tsdf neighborhood) so caching it stays exact
                    tri = _marching._orient_by_gradient(vol, tri)
                    return MeshCache(tri=c.tri.at[i].set(tri),
                                     val=c.val.at[i].set(sel),
                                     dirty=c.dirty)
                return jax.lax.cond(c.dirty[i], refresh, lambda c: c, c)

            cache = jax.lax.fori_loop(0, n_slabs, body, cache)
            return cache._replace(dirty=jnp.zeros((n_slabs,), bool))

        return jax.jit(upd, donate_argnums=(1,))

    def update(self, vol: TSDFVolume) -> "IncrementalMesher":
        """Refresh dirty slabs in ONE device program; clean slabs skip
        their marching work via lax.cond."""
        if self._update_fn is None:
            self._update_fn = self._build_update()
        self.cache = self._update_fn(vol, self.cache)
        return self

    # ---- weld ---------------------------------------------------------
    def _build_mesh(self):
        def run(vol, cache):
            soup = cache.tri.reshape(-1, 3, 3)
            tvalid = cache.val.reshape(-1)
            return weld_mesh_device(
                soup, tvalid, vol.voxel_size,
                color_fn=_marching.sample_volume_colors(vol))

        return jax.jit(run)

    def mesh_device(self, vol: TSDFVolume) -> TriangleMesh:
        """Refresh + weld, entirely on device (fixed-capacity mesh with
        validity masks; no host round-trip)."""
        self.update(vol)
        if self._mesh_fn is None:
            self._mesh_fn = self._build_mesh()
        return self._mesh_fn(vol, self.cache)

    def mesh(self, vol: TSDFVolume) -> TriangleMesh:
        """Refresh + weld + host compaction — extract_triangle_mesh's
        contract (mini1.py:357-360), for save/export paths."""
        self.update(vol)
        soup = self.cache.tri.reshape(-1, 3, 3)
        tvalid = self.cache.val.reshape(-1)
        return _marching.weld_mesh(
            soup, tvalid, float(vol.voxel_size),
            color_fn=_marching.sample_volume_colors(vol))


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
