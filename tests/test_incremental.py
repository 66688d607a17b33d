"""Incremental mesher: dirty-slab refresh must equal a full re-extract."""
import dataclasses as dc

import jax.numpy as jnp
import numpy as np

from recon3d_tpu.camera.fake import SyntheticRGBDCamera
from recon3d_tpu.fusion import incremental as I
from recon3d_tpu.fusion import marching as M
from recon3d_tpu.fusion import tsdf as T
from recon3d_tpu.utils.types import CameraIntrinsics


def _intr():
    return CameraIntrinsics(fx=jnp.float32(80.0), fy=jnp.float32(80.0),
                            cx=jnp.float32(64.0), cy=jnp.float32(48.0))


def _canon_mesh(mesh):
    """Order-insensitive canonical form: lexsorted vertices + sorted
    face set under the vertex re-labeling."""
    v, t, _, _ = mesh.to_numpy()
    order = np.lexsort((v[:, 2], v[:, 1], v[:, 0]))
    remap = np.empty(len(v), np.int64)
    remap[order] = np.arange(len(v))
    faces = np.sort(remap[t], axis=1)
    faces = faces[np.lexsort(faces.T[::-1])] if len(faces) else faces
    return v[order], faces


class TestIncrementalMesher:
    def test_incremental_equals_full_extract(self):
        """Integrate a moving synthetic scan frame by frame; after each
        frame the incremental mesh must equal extract_triangle_mesh of
        the same volume (same vertex set, same face set)."""
        R = 64
        cam = SyntheticRGBDCamera(width=128, height=96, n_frames=4,
                                  step=0.03)
        cam.open()
        intr = _intr()
        vol = T.make_volume(resolution=R, voxel_size=0.03,
                            sdf_trunc=0.09, origin=(-0.96, -0.96, 0.3),
                            with_color=False)
        vol_full = jnp.asarray(0)  # placeholder; full path copies below
        im = I.IncrementalMesher(resolution=R, max_triangles=1 << 15)
        import jax
        vol_full = jax.tree.map(jnp.copy, vol)
        for k in range(4):
            color, depth = cam.grab()
            pose = jnp.asarray(np.linalg.inv(cam.true_pose(k)),
                               jnp.float32)
            vol = im.integrate(vol, jnp.asarray(depth), intr, pose)
            vol_full = T.integrate_donated(vol_full, jnp.asarray(depth),
                                           intr, pose)
            # volumes must agree bitwise (same integrate math)
            np.testing.assert_array_equal(np.asarray(vol.tsdf),
                                          np.asarray(vol_full.tsdf))

            m_inc = im.mesh(vol)
            m_full = M.extract_triangle_mesh(vol_full,
                                             max_triangles=1 << 15)
            vi, ti = _canon_mesh(m_inc)
            vf, tf = _canon_mesh(m_full)
            assert len(vi) == len(vf) > 0, f"frame {k}"
            np.testing.assert_allclose(vi, vf, atol=1e-6)
            np.testing.assert_array_equal(ti, tf)

    def test_dirty_slabs_shrink_after_refresh(self):
        """After update(), all slabs are clean; integrating a frame marks
        only the slabs its truncation shell touches."""
        R = 64
        cam = SyntheticRGBDCamera(width=128, height=96, n_frames=2,
                                  step=0.01)
        cam.open()
        intr = _intr()
        vol = T.make_volume(resolution=R, voxel_size=0.03,
                            sdf_trunc=0.09, origin=(-0.96, -0.96, 0.3),
                            with_color=False)
        im = I.IncrementalMesher(resolution=R, max_triangles=1 << 15)
        color, depth = cam.grab()
        eye = jnp.eye(4, dtype=jnp.float32)
        vol = im.integrate(vol, jnp.asarray(depth), intr, eye)
        im.update(vol)
        assert not bool(np.asarray(im.cache.dirty).any())
        # re-integrating the SAME frame only perturbs the surface shell:
        # strictly fewer dirty slabs than the volume has
        color, depth = cam.grab()
        vol = im.integrate(vol, jnp.asarray(depth), intr, eye)
        nd = int(np.asarray(im.cache.dirty).sum())
        assert 0 < nd < im.n_slabs

    def test_streaming_live_mesher_equals_full_extract(self, tmp_path):
        """StreamingFusion(live_mesher=True): dirty tracking rides the
        fused odometry+integrate step; extract_mesh_live() must equal a
        full extract_triangle_mesh of the same volume."""
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera
        from recon3d_tpu.config import FusionConfig, ScannerConfig
        from recon3d_tpu.pipeline.streaming import StreamingFusion

        cam = SyntheticRGBDCamera(width=128, height=96, n_frames=5,
                                  step=0.01)
        cam.open()
        cfg = ScannerConfig(
            fusion=FusionConfig(voxel_size=0.015, sdf_trunc=0.06,
                                grid_resolution=96, depth_trunc=2.5),
            output_dir=str(tmp_path))
        sf = StreamingFusion(None, _intr(), cfg, resolution=96,
                             volume_origin=(-0.72, -0.72, 0.3),
                             live_mesher=True)
        fcfg = cfg.fusion
        for _ in range(3):
            c, d = cam.grab()
            sf._fuse_one(jnp.asarray(c), jnp.asarray(d), fcfg)
        m_live = sf.extract_mesh_live()
        m_full = M.extract_triangle_mesh(sf.volume)
        vl, tl = _canon_mesh(m_live)
        vf, tf = _canon_mesh(m_full)
        assert len(vl) == len(vf) > 0
        np.testing.assert_allclose(vl, vf, atol=1e-6)
        np.testing.assert_array_equal(tl, tf)
        # and again after more frames (true incremental refresh)
        for _ in range(2):
            c, d = cam.grab()
            sf._fuse_one(jnp.asarray(c), jnp.asarray(d), fcfg)
        assert int(np.asarray(sf.mesher.cache.dirty).sum()) > 0
        m_live = sf.extract_mesh_live()
        m_full = M.extract_triangle_mesh(sf.volume)
        vl, tl = _canon_mesh(m_live)
        vf, tf = _canon_mesh(m_full)
        np.testing.assert_allclose(vl, vf, atol=1e-6)
        np.testing.assert_array_equal(tl, tf)

    def test_mesh_device_matches_host_mesh(self):
        """The device-resident weld (no host compaction) must carry the
        same geometry as the compacted mesh."""
        R = 48
        cam = SyntheticRGBDCamera(width=128, height=96, n_frames=1)
        cam.open()
        intr = _intr()
        vol = T.make_volume(resolution=R, voxel_size=0.04,
                            sdf_trunc=0.12, origin=(-0.96, -0.96, 0.3),
                            with_color=False)
        im = I.IncrementalMesher(resolution=R, max_triangles=1 << 14)
        _c, depth = cam.grab()
        vol = im.integrate(vol, jnp.asarray(depth), intr,
                           jnp.eye(4, dtype=jnp.float32))
        md = im.mesh_device(vol)
        mh = im.mesh(vol)
        vd, td = _canon_mesh(md)
        vh, th = _canon_mesh(mh)
        np.testing.assert_allclose(vd, vh, atol=1e-6)
        np.testing.assert_array_equal(td, th)
