import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.utils.types import (
    CameraIntrinsics,
    PointCloud,
    compact,
    concatenate,
    transform,
)


def test_from_to_numpy_roundtrip():
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    cols = np.random.RandomState(1).rand(100, 3).astype(np.float32)
    pc = PointCloud.from_numpy(pts, colors=cols, capacity=128)
    assert pc.capacity == 128
    assert int(pc.count()) == 100
    p2, c2, n2 = pc.to_numpy()
    np.testing.assert_array_equal(p2, pts)
    np.testing.assert_array_equal(c2, cols)
    assert n2 is None


def test_compact_packs_valid_first_and_is_stable():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    pc = PointCloud.from_numpy(pts)
    valid = jnp.asarray([True, False, True, False, True, True, False, False, True, False])
    pc = PointCloud(points=pc.points, valid=valid, colors=None, normals=None)
    out = compact(pc, 8)
    assert int(out.count()) == 5
    got, _, _ = out.to_numpy()
    np.testing.assert_array_equal(got, pts[np.asarray(valid)])


def test_compact_truncates():
    pts = np.random.randn(100, 3).astype(np.float32)
    pc = PointCloud.from_numpy(pts)
    out = compact(pc, 10)
    assert out.capacity == 10
    assert int(out.count()) == 10


def test_concatenate_and_transform():
    a = PointCloud.from_numpy(np.zeros((4, 3), np.float32))
    b = PointCloud.from_numpy(np.ones((6, 3), np.float32))
    c = concatenate(a, b)
    assert c.capacity == 10 and int(c.count()) == 10

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, 2.0, 3.0]
    moved = transform(b, jnp.asarray(T))
    got, _, _ = moved.to_numpy()
    np.testing.assert_allclose(got, np.ones((6, 3)) + np.array([1, 2, 3]), rtol=1e-6)


def test_pointcloud_is_pytree():
    pc = PointCloud.from_numpy(np.random.randn(16, 3).astype(np.float32))

    @jax.jit
    def f(p: PointCloud):
        return transform(p, jnp.eye(4))

    out = f(pc)
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(pc.points), rtol=1e-6)


def test_intrinsics_matrix_roundtrip():
    intr = CameraIntrinsics.from_json("/root/reference/test/dataset/realsense/camera_intrinsic.json")
    K = intr.matrix()
    assert float(K[0, 0]) == pytest.approx(616.6348876953125, rel=1e-6)
    back = CameraIntrinsics.from_matrix(K)
    assert float(back.cy) == pytest.approx(242.21949768066406, rel=1e-6)
