"""Point-cloud op tests against numpy oracles (Open3D is absent in this
image, so oracles re-state the documented Open3D semantics directly)."""
import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.ops import knn as _knn
from recon3d_tpu.pointcloud import backproject, normals, outliers, voxel
from recon3d_tpu.utils.types import CameraIntrinsics, PointCloud


def _cloud(n=500, seed=0, capacity=None):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32) * 0.2
    return PointCloud.from_numpy(pts, capacity=capacity), pts


class TestKNN:
    def test_exact_vs_numpy(self):
        pc, pts = _cloud(300)
        idx, d2 = _knn.knn(pc.points, pc.valid, k=5, tile=128)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        D = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(D, np.inf)
        ref_idx = np.argsort(D, axis=1)[:, :5]
        ref_d = np.sort(D, axis=1)[:, :5]
        np.testing.assert_allclose(np.sort(d2, 1), ref_d, rtol=1e-4, atol=1e-5)
        # indices may tie-swap; check distance sets instead
        got = np.take_along_axis(D, idx, 1)
        np.testing.assert_allclose(np.sort(got, 1), ref_d, rtol=1e-4, atol=1e-5)

    def test_invalid_points_excluded(self):
        pts = np.zeros((10, 3), np.float32)
        pts[:, 0] = np.arange(10)
        valid = np.ones(10, bool)
        valid[1] = False  # nearest of point 0 would be 1
        pc = PointCloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
        idx, d2 = _knn.knn(pc.points, pc.valid, k=1, tile=8)
        assert int(idx[0, 0]) == 2  # skips the invalid index 1

    def test_radius_count(self):
        pts = np.array([[0, 0, 0], [0.05, 0, 0], [0.2, 0, 0]], np.float32)
        pc = PointCloud.from_numpy(pts)
        c = np.asarray(_knn.radius_count(pc.points, pc.valid, 0.1, tile=8))
        np.testing.assert_array_equal(c, [1, 1, 0])


class TestVoxelDownsample:
    def test_matches_numpy_oracle(self):
        pc, pts = _cloud(1000)
        vs = 0.1
        out = voxel.voxel_downsample(pc, vs)
        got, _, _ = out.to_numpy()
        # oracle: mean per voxel
        keys = np.floor(pts / vs).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        ref = np.zeros((len(uniq), 3))
        cnt = np.zeros(len(uniq))
        for i, j in enumerate(inv):
            ref[j] += pts[i]
            cnt[j] += 1
        ref /= cnt[:, None]
        assert len(got) == len(uniq)
        # order-independent comparison
        def sorted_rows(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]
        np.testing.assert_allclose(sorted_rows(got), sorted_rows(ref), atol=1e-5)

    def test_colors_averaged(self):
        pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [0.5, 0, 0]], np.float32)
        cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        pc = PointCloud.from_numpy(pts, colors=cols)
        out = voxel.voxel_downsample(pc, 0.1)
        got, gc, _ = out.to_numpy()
        assert len(got) == 2
        first = np.argmin(got[:, 0])
        np.testing.assert_allclose(gc[first], [0.5, 0.5, 0.0], atol=1e-6)

    def test_respects_validity(self):
        pts = np.zeros((4, 3), np.float32)
        pc = PointCloud(points=jnp.asarray(pts),
                        valid=jnp.asarray([True, True, False, False]))
        out = voxel.voxel_downsample(pc, 0.1)
        assert int(out.count()) == 1

    def test_10M_like_capacity_smaller(self):
        """The gpu-performance.py benchmark shape, scaled down: capacity cap."""
        pc, _ = _cloud(2000, seed=3)
        out = voxel.voxel_downsample(pc, 0.05, capacity=256)
        assert out.capacity == 256


class TestOutliers:
    def test_statistical_removes_far_point(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(200, 3).astype(np.float32) * 0.01
        pts[0] = [5.0, 5.0, 5.0]  # gross outlier
        pc = PointCloud.from_numpy(pts)
        out = outliers.remove_statistical_outliers(pc, nb_neighbors=10, std_ratio=2.0)
        v = np.asarray(out.valid)
        assert not v[0]
        assert v[1:].mean() > 0.9

    def test_radius_removes_isolated(self):
        rng = np.random.RandomState(1)
        pts = rng.rand(300, 3).astype(np.float32) * 0.1  # dense blob
        pts[7] = [3, 3, 3]
        pc = PointCloud.from_numpy(pts)
        out = outliers.remove_radius_outliers(pc, nb_points=5, radius=0.05)
        v = np.asarray(out.valid)
        assert not v[7]
        assert v.mean() > 0.9


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.RandomState(0)
        pts = np.zeros((400, 3), np.float32)
        pts[:, :2] = rng.rand(400, 2)
        pc = PointCloud.from_numpy(pts)
        out = normals.estimate_normals(pc, radius=0.3, max_nn=20)
        n = np.asarray(out.normals)
        align = np.abs(n[:, 2])
        assert align.min() > 0.99  # all normals +-z

    def test_sphere_normals_radial(self):
        rng = np.random.RandomState(1)
        d = rng.randn(800, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pc = PointCloud.from_numpy(d.astype(np.float32))
        out = normals.estimate_normals(pc, radius=0.4, max_nn=20)
        out = normals.orient_normals_towards_camera(out, jnp.zeros(3))
        n = np.asarray(out.normals)
        # oriented toward origin => n ~ -d
        dots = (n * d).sum(1)
        assert (np.abs(dots) > 0.95).mean() > 0.95
        assert (dots < 0).mean() > 0.95

    def test_consistent_orientation_on_plane(self):
        rng = np.random.RandomState(2)
        pts = np.zeros((300, 3), np.float32)
        pts[:, :2] = rng.rand(300, 2)
        pc = PointCloud.from_numpy(pts)
        pc = normals.estimate_normals(pc, radius=0.3, max_nn=15)
        # scramble signs
        signs = np.where(rng.rand(300) < 0.5, -1.0, 1.0).astype(np.float32)
        import dataclasses as dc
        pc = dc.replace(pc, normals=pc.normals * jnp.asarray(signs)[:, None])
        out = normals.orient_normals_consistent(pc, k=8, iterations=40)
        nz = np.asarray(out.normals)[:, 2]
        assert (nz > 0).all() or (nz < 0).all()


class TestBackprojection:
    def test_pinhole_roundtrip(self):
        intr = CameraIntrinsics(fx=jnp.float32(500.0), fy=jnp.float32(510.0),
                                cx=jnp.float32(32.0), cy=jnp.float32(24.0))
        depth = np.full((48, 64), 1.5, np.float32)
        pc = backproject.backproject_depth(jnp.asarray(depth), intr, depth_trunc=3.0)
        pts, _, _ = pc.to_numpy()
        assert len(pts) == 48 * 64
        # center pixel maps to (0, 0, z)
        c = np.asarray(pc.points).reshape(48, 64, 3)[24, 32]
        np.testing.assert_allclose(c, [0, 0, 1.5], atol=1e-5)
        # reproject: u = fx * x/z + cx
        p = np.asarray(pc.points).reshape(48, 64, 3)[10, 20]
        u = 500.0 * p[0] / p[2] + 32.0
        v = 510.0 * p[1] / p[2] + 24.0
        np.testing.assert_allclose([u, v], [20, 10], atol=1e-4)

    def test_depth_trunc_and_zero_masked(self):
        intr = CameraIntrinsics(fx=jnp.float32(100.0), fy=jnp.float32(100.0),
                                cx=jnp.float32(8.0), cy=jnp.float32(8.0))
        depth = np.ones((16, 16), np.float32)
        depth[0, 0] = 0.0
        depth[0, 1] = 9.0
        pc = backproject.backproject_depth(jnp.asarray(depth), intr, depth_trunc=3.0)
        v = np.asarray(pc.valid).reshape(16, 16)
        assert not v[0, 0] and not v[0, 1] and v[1:].all()

    def test_golden_frame_against_reference_ply(self):
        """Backproject a golden depth frame with the shipped intrinsics and
        check it lands in the same volume as the reference's saved cloud."""
        from recon3d_tpu.utils import io
        from recon3d_tpu.utils.types import transform

        color = io.read_color("/root/reference/test/output/color_00008.png")
        depth = io.read_depth("/root/reference/test/output/depth_00008.png")
        intr = CameraIntrinsics.from_json(
            "/root/reference/test/dataset/realsense/camera_intrinsic.json")
        pc = backproject.pointcloud_from_rgbd(
            jnp.asarray(color), jnp.asarray(depth), intr, depth_trunc=3.0)
        ref = io.read_ply("/root/reference/test/output/pcd_00008.ply")
        pts, _, _ = pc.to_numpy()
        lo_ref, hi_ref = ref["points"].min(0), ref["points"].max(0)
        lo, hi = pts.min(0), pts.max(0)
        # reference cloud is downsampled+outlier-cleaned; ours must cover it
        assert (lo <= lo_ref + 0.05).all() and (hi >= hi_ref - 0.05).all()
        # and the bulk of reference points must have a close neighbor in ours
        sub = ref["points"][::50].astype(np.float32)
        d2 = ((sub[:, None, :] - pts[None, ::23, :]) ** 2).sum(-1).min(1)
        assert np.median(d2) < 1e-3
