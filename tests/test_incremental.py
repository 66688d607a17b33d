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


def _canon_mesh(mesh, quant=0.015 / 256.0):
    """Order-insensitive canonical form: vertices sorted by their EXACT
    integer weld key (round(v/quant)) + sorted face set under the vertex
    re-labeling. Sorting by float positions is brittle: welded means
    drift ~1e-7 between builds (f32 accumulation order), which flips the
    sort order of vertices tied in the leading coordinates and misaligns
    whole rows."""
    v, t, _, _ = mesh.to_numpy()
    q = np.round(v / quant).astype(np.int64)
    order = np.lexsort((q[:, 2], q[:, 1], q[:, 0]))
    remap = np.empty(len(v), np.int64)
    remap[order] = np.arange(len(v))
    faces = np.sort(remap[t], axis=1)
    faces = faces[np.lexsort(faces.T[::-1])] if len(faces) else faces
    return v[order], faces


def _assert_meshes_close(ma, mb, voxel_size, miss_frac=0.002):
    """Cross-IMPLEMENTATION mesh comparison: triangle counts equal, and
    all but a ~0.2% tail of vertices agree to the weld's quantization
    step. The tail is real and bounded: _slab_tris' interpolation wobbles
    ~1 ulp between differently-compiled programs (XLA fma/fusion
    freedom), and a wobble that straddles a weld rounding boundary moves
    that vertex by one quant (voxel_size/256). Same-PROGRAM comparisons
    (the incremental-vs-fresh-rebuild oracle below) stay strict."""
    va, ta, _, _ = ma.to_numpy()
    vb, tb, _, _ = mb.to_numpy()
    assert len(ta) == len(tb) > 0
    quant = voxel_size / 256.0
    ka = {tuple(r) for r in np.round(va / quant).astype(np.int64)}
    kb = {tuple(r) for r in np.round(vb / quant).astype(np.int64)}
    miss = len(ka ^ kb)
    assert miss <= max(2, miss_frac * (len(ka) + len(kb))), (
        f"{miss} unmatched of {len(ka)}+{len(kb)} welded vertices")


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
        im = I.IncrementalMesher(resolution=R, max_triangles=1 << 17)
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

            # strict oracle: a FRESH mesher full rebuild (same compiled
            # slab program, so triangles are bitwise identical; only the
            # persistent table's f32 add/subtract drift separates them)
            im_fresh = I.IncrementalMesher(resolution=R,
                                           max_triangles=1 << 17)
            m_inc = im.mesh(vol)
            m_ref = im_fresh.mesh(vol_full)
            vi, ti = _canon_mesh(m_inc, 0.03 / 256.0)
            vr, tr = _canon_mesh(m_ref, 0.03 / 256.0)
            assert len(vi) == len(vr) > 0, f"frame {k}"
            np.testing.assert_allclose(vi, vr, atol=1e-5)
            np.testing.assert_array_equal(ti, tr)
            # cross-implementation: the scan-based full extractor
            m_full = M.extract_triangle_mesh(vol_full,
                                             max_triangles=1 << 17)
            _assert_meshes_close(m_inc, m_full, 0.03)

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
        im = I.IncrementalMesher(resolution=R, max_triangles=1 << 17)
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
        def check(sf):
            m_live = sf.extract_mesh_live()
            # strict: a fresh all-dirty mesher rebuilt from the same
            # volume through the same compiled slab program
            im_fresh = I.IncrementalMesher(resolution=96)
            m_ref = im_fresh.mesh_device(sf.volume)
            vl, tl = _canon_mesh(m_live)
            vr, tr = _canon_mesh(m_ref)
            assert len(vl) == len(vr) > 0
            np.testing.assert_allclose(vl, vr, atol=1e-5)
            np.testing.assert_array_equal(tl, tr)
            # cross-implementation: the scan-based full extractor
            _assert_meshes_close(m_live, M.extract_triangle_mesh(sf.volume),
                                 float(cfg.fusion.voxel_size))

        check(sf)
        # and again after more frames (true incremental refresh)
        for _ in range(2):
            c, d = cam.grab()
            sf._fuse_one(jnp.asarray(c), jnp.asarray(d), fcfg)
        assert int(np.asarray(sf.mesher.cache.dirty).sum()) > 0
        check(sf)

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
        vd, td = _canon_mesh(md, 0.04 / 256.0)
        vh, th = _canon_mesh(mh, 0.04 / 256.0)
        np.testing.assert_allclose(vd, vh, atol=1e-6)
        np.testing.assert_array_equal(td, th)


def test_slab_cap_shared_between_paths():
    """Round-4 regression class: the incremental mesher's per-slab cap
    MUST be computed by the same formula as extract_triangle_soup's
    (marching.slab_cap) — a one-sided cap change silently breaks the
    incremental == full-extract contract on dense slabs."""
    for R, mt in ((96, 1 << 15), (256, 1 << 19), (64, 1 << 14)):
        for mult in (1, 4):
            im = I.IncrementalMesher(resolution=R, max_triangles=mt,
                                     cap_mult=mult)
            assert im.cap == M.slab_cap(R, im.slab, mt, mult=mult), (
                R, mt, mult)


class TestSmallCapRefresh:
    """Localized updates take the cap/8 march variant; overflowing slabs
    retry at full cap. Either way the result must equal a fresh full
    rebuild (old-subtract keeps refreshes idempotent)."""

    def _scene(self):
        R = 64
        cam = SyntheticRGBDCamera(width=128, height=96, n_frames=1)
        cam.open()
        intr = _intr()
        vol = T.make_volume(resolution=R, voxel_size=0.03,
                            sdf_trunc=0.09, origin=(-0.96, -0.96, 0.3),
                            with_color=False)
        im = I.IncrementalMesher(resolution=R, max_triangles=1 << 17)
        _c, depth = cam.grab()
        vol = im.integrate(vol, jnp.asarray(depth), intr,
                           jnp.eye(4, dtype=jnp.float32))
        im.update(vol)  # full build: all slabs dirty -> full-cap path
        return R, intr, vol, im, np.asarray(depth)

    def _check_equal(self, im, vol, R):
        im_fresh = I.IncrementalMesher(resolution=R,
                                       max_triangles=1 << 17)
        vi, ti = _canon_mesh(im.mesh(vol), 0.03 / 256.0)
        vr, tr = _canon_mesh(im_fresh.mesh(vol), 0.03 / 256.0)
        assert len(vi) == len(vr) > 0
        np.testing.assert_allclose(vi, vr, atol=1e-5)
        np.testing.assert_array_equal(ti, tr)

    def test_sparse_localized_update_small_path(self):
        R, intr, vol, im, depth = self._scene()
        # a small close blob IN FRONT of the scene: few dirty slabs,
        # sparse content -> the small-cap program must suffice
        h, w = depth.shape
        yy, xx = np.mgrid[0:h, 0:w]
        disc = ((yy - h // 2) ** 2 + (xx - w // 2) ** 2) < 12 ** 2
        blob = np.where(disc, 0.65, 0.0).astype(np.float32)
        vol = im.integrate(vol, jnp.asarray(blob), intr,
                           jnp.eye(4, dtype=jnp.float32))
        nd = int(np.asarray(im.cache.dirty).sum())
        assert 0 < nd <= max(2, im.batch_k // 2), nd
        im.update(vol)
        # sparse content: the small cap must NOT have overflowed
        assert int(np.asarray(im.cache.ndrop).sum()) == 0
        self._check_equal(im, vol, R)

    def test_dense_localized_update_retries_full(self):
        R, intr, vol, im, depth = self._scene()
        # re-observe the SCENE itself through a narrow depth band: few
        # dirty slabs but wall-dense content -> small cap overflows and
        # the full-cap retry must restore exactness
        zmid = float(np.median(depth[depth > 0]))
        # slightly shifted depth: re-observing identical depth leaves the
        # tsdf bitwise unchanged (nothing would go dirty)
        band = np.where(np.abs(depth - zmid) < 0.03, depth - 0.008,
                        0.0).astype(np.float32)
        vol = im.integrate(vol, jnp.asarray(band), intr,
                           jnp.eye(4, dtype=jnp.float32))
        nd = int(np.asarray(im.cache.dirty).sum())
        assert nd > 0
        im.update(vol)
        self._check_equal(im, vol, R)
