"""TSDF fusion + marching tetrahedra tests with analytic oracles."""
import dataclasses as dc

import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.fusion import marching as M
from recon3d_tpu.fusion import tsdf as T
from recon3d_tpu.utils.types import CameraIntrinsics


def _sphere_volume(R=32, voxel=0.05, r=0.5):
    idx = np.arange(R, dtype=np.float32)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    origin = np.array([-R * voxel / 2] * 3, np.float32)
    pts = np.stack([gx, gy, gz], -1) * voxel + origin
    sdf = (np.linalg.norm(pts, axis=-1) - r).astype(np.float32)
    vol = T.TSDFVolume(
        tsdf=jnp.asarray(sdf), weight=jnp.ones((R, R, R)),
        origin=jnp.asarray(origin), voxel_size=jnp.float32(voxel),
        sdf_trunc=jnp.float32(1.0), color=None)
    return vol, r


class TestMarching:
    def test_plane_exact(self):
        R = 16
        gx = np.meshgrid(*[np.arange(R, dtype=np.float32)] * 3, indexing="ij")[0]
        vol = T.TSDFVolume(tsdf=jnp.asarray(gx - 5.2), weight=jnp.ones((R, R, R)),
                           origin=jnp.zeros(3), voxel_size=jnp.float32(0.1),
                           sdf_trunc=jnp.float32(1.0), color=None)
        soup, valid, _ = M.extract_triangle_soup(vol, max_triangles=1 << 14, slab=8)
        tv = np.asarray(soup)[np.asarray(valid)]
        assert len(tv) > 0
        np.testing.assert_allclose(tv[..., 0], 0.52, atol=1e-5)

    @pytest.mark.parametrize("slab", [8, 31])
    def test_sphere_surface_error(self, slab):
        vol, r = _sphere_volume()
        soup, valid, _ = M.extract_triangle_soup(vol, max_triangles=1 << 16, slab=slab)
        tv = np.asarray(soup)[np.asarray(valid)]
        sd = np.abs(np.linalg.norm(tv.reshape(-1, 3), axis=1) - r)
        assert np.median(sd) < 0.005
        assert sd.max() < 0.02  # well under a voxel

    def test_no_duplicate_triangles_across_slabs(self):
        vol, _ = _sphere_volume(R=17)  # (R-1)=16 not divisible by 5
        soup, valid, _ = M.extract_triangle_soup(vol, max_triangles=1 << 15, slab=5)
        tv = np.asarray(soup)[np.asarray(valid)]
        canon = {tuple(sorted(map(tuple, np.round(t, 4)))) for t in tv}
        # degenerate point-triangles can repeat legitimately; near-zero-area
        # ones excluded from the uniqueness check
        areas = 0.5 * np.linalg.norm(
            np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1)
        solid = tv[areas > 1e-10]
        canon_solid = {tuple(sorted(map(tuple, np.round(t, 4)))) for t in solid}
        assert len(canon_solid) == len(solid)

    def test_welded_mesh_indexed_and_wound(self):
        vol, r = _sphere_volume()
        mesh = M.extract_triangle_mesh(vol, max_triangles=1 << 16)
        verts, tris, _, _ = mesh.to_numpy()
        assert tris.min() >= 0 and tris.max() < len(verts)
        v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
        n = np.cross(v1 - v0, v2 - v0)
        c = (v0 + v1 + v2) / 3
        a = np.linalg.norm(n, axis=1)
        outward = (n * c).sum(1)[a > 1e-9] > 0
        assert outward.mean() > 0.99  # consistent outward winding


class TestDenseSlabQuota:
    """A single surface sheet concentrates the whole soup in the few
    slabs it crosses; the old uniform max_triangles // n_slabs per-slab
    quota silently truncated those slabs even with global headroom left
    (observed live: every dirty slab of the bench's fused volume
    saturated at exactly cap). The extractor now lets dense slabs borrow
    up to 4x the quota, and counts what it still drops."""

    @staticmethod
    def _flat_plane_volume(R=64, voxel=0.05):
        # plane z = 20.3 voxels: every (R-1)^2 column crosses inside ONE
        # 8-row slab -> ~4 tris/cube land in a single slab
        idx = np.arange(R, dtype=np.float32)
        gz = np.meshgrid(idx, idx, idx, indexing="ij")[2]
        return T.TSDFVolume(
            tsdf=jnp.asarray(np.clip((gz - 20.3) * voxel, -1, 1)),
            weight=jnp.ones((R, R, R)), origin=jnp.zeros(3),
            voxel_size=jnp.float32(voxel), sdf_trunc=jnp.float32(1.0),
            color=None)

    def test_dense_slab_borrows_global_headroom(self):
        vol = self._flat_plane_volume()
        # reference: capacity so large nothing can truncate
        _, _, n_ref = M.extract_triangle_soup(vol, max_triangles=1 << 18)
        # 1<<16 over 8 slabs -> uniform quota 8193 < n_ref in one slab;
        # the 4x borrow covers it
        soup, valid, n, dropped = M.extract_triangle_soup(
            vol, max_triangles=1 << 16, with_dropped=True)
        assert int(n_ref) > (1 << 16) // 8 + 1  # scene defeats the quota
        assert int(n) == int(n_ref)
        assert int(dropped) == 0
        assert int(np.asarray(valid).sum()) == int(n_ref)

    def test_truncation_is_counted_not_silent(self):
        vol = self._flat_plane_volume()
        _, _, n_ref = M.extract_triangle_soup(vol, max_triangles=1 << 18)
        _, valid, n, dropped = M.extract_triangle_soup(
            vol, max_triangles=1 << 12, with_dropped=True)
        # still truncates (4x borrow < the slab's demand) but says so
        assert int(dropped) > 0
        assert int(n) + int(dropped) >= int(n_ref)

    def test_incremental_mesher_reports_dropped(self):
        from recon3d_tpu.fusion.incremental import IncrementalMesher

        vol = self._flat_plane_volume()
        im = IncrementalMesher(resolution=64, max_triangles=1 << 12)
        im.update(vol)
        assert im.dropped_triangles > 0
        im_big = IncrementalMesher(resolution=64, max_triangles=1 << 18)
        im_big.update(vol)
        assert im_big.dropped_triangles == 0


class TestHashWeld:
    def test_hash_weld_matches_sort_weld(self):
        """The sort-free hash weld must produce the same mesh as the
        lexsort oracle: identical vertex SET (averaged positions) and
        identical face set under the vertex correspondence — group ids
        are permuted (slot rank vs lexicographic), never merged or
        split."""
        vol, _ = _sphere_volume()
        soup, valid, _ = M.extract_triangle_soup(vol, max_triangles=1 << 16)
        m_sort = M.weld_mesh(soup, valid, 0.05, method="sort")
        m_hash = M.weld_mesh(soup, valid, 0.05, method="hash")

        vs, ts, _, _ = m_sort.to_numpy()
        vh, th, _, _ = m_hash.to_numpy()
        assert len(vh) == len(vs)
        assert len(th) == len(ts)

        # canonical order: sort both vertex sets lexicographically
        def canon(v, t):
            order = np.lexsort((v[:, 2], v[:, 1], v[:, 0]))
            remap = np.empty(len(v), np.int64)
            remap[order] = np.arange(len(v))
            faces = np.sort(remap[t], axis=1)
            faces = faces[np.lexsort(faces.T[::-1])]
            return v[order], faces

        cvs, cts = canon(vs, ts)
        cvh, cth = canon(vh, th)
        np.testing.assert_allclose(cvh, cvs, atol=1e-6)
        np.testing.assert_array_equal(cth, cts)

    def test_hash_weld_empty_soup(self):
        soup = jnp.zeros((16, 3, 3), jnp.float32)
        valid = jnp.zeros((16,), bool)
        mesh = M.weld_mesh(soup, valid, 0.05, method="hash")
        assert int(np.sum(np.asarray(mesh.triangle_valid))) == 0


class TestTSDFIntegration:
    def test_integrate_synthetic_frames_and_extract(self):
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera

        cam = SyntheticRGBDCamera(width=160, height=120, fx=130.0, fy=130.0, n_frames=3)
        cam.open()
        vol = T.make_volume(resolution=96, voxel_size=0.012, sdf_trunc=0.05,
                            origin=(-0.576, -0.576, 0.4))
        intr = CameraIntrinsics(fx=jnp.float32(130.0), fy=jnp.float32(130.0),
                                cx=jnp.float32(79.5), cy=jnp.float32(59.5))
        for k in range(3):
            c, d = cam.grab()
            ext = jnp.asarray(cam.true_pose(k), jnp.float32)
            vol = T.integrate(vol, jnp.asarray(d), intr, ext, color=jnp.asarray(c))
        assert float(jnp.max(vol.weight)) >= 2.0
        mesh = M.extract_triangle_mesh(vol, max_triangles=1 << 17)
        verts, tris, cols, _ = mesh.to_numpy()
        assert len(verts) > 1000 and len(tris) > 1000
        assert cols is not None and cols.min() >= 0 and cols.max() <= 1
        # sphere region of the scene reconstructs to the right radius
        d_sph = np.abs(np.linalg.norm(verts - np.array([0, 0, 1.2]), axis=1) - 0.3)
        near = d_sph < 0.08
        assert near.sum() > 200
        assert np.median(d_sph[near]) < 0.02

    def test_extract_point_cloud(self):
        vol, r = _sphere_volume()
        pc = T.extract_point_cloud(vol, capacity=1 << 14)
        pts, _, _ = pc.to_numpy()
        assert len(pts) > 500
        sd = np.abs(np.linalg.norm(pts, axis=1) - r)
        assert np.median(sd) < 0.005

    def test_weight_zero_regions_not_meshed(self):
        vol, _ = _sphere_volume(R=24)
        vol = dc.replace(vol, weight=jnp.zeros_like(vol.weight))
        soup, valid, count = M.extract_triangle_soup(vol, max_triangles=1 << 12)
        assert int(np.asarray(valid).sum()) == 0
