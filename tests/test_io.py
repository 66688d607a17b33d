import glob
import os

import numpy as np
import pytest

from recon3d_tpu.utils import io
from recon3d_tpu.utils.types import PointCloud

REF_OUT = "/root/reference/test/output"


def test_read_golden_open3d_ply():
    """The reference's own Open3D binary-double PLYs must load."""
    path = sorted(glob.glob(os.path.join(REF_OUT, "pcd_*.ply")))[0]
    d = io.read_ply(path)
    assert d["points"].shape[1] == 3 and len(d["points"]) > 1000
    assert "normals" in d and "colors" in d
    assert np.isfinite(d["points"]).all()
    assert d["colors"].min() >= 0.0 and d["colors"].max() <= 1.0


@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.parametrize("double", [True, False])
def test_ply_roundtrip(tmp_path, binary, double):
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3).astype(np.float32)
    cols = rng.rand(50, 3).astype(np.float32)
    nrm = rng.randn(50, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    p = str(tmp_path / "x.ply")
    io.write_ply(p, pts, colors=cols, normals=nrm, binary=binary, double=double)
    d = io.read_ply(p)
    np.testing.assert_allclose(d["points"], pts, atol=1e-6)
    np.testing.assert_allclose(d["normals"], nrm, atol=1e-6)
    np.testing.assert_allclose(d["colors"], cols, atol=1 / 255.0)


def test_mesh_ply_roundtrip(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    p = str(tmp_path / "m.ply")
    io.write_ply(p, pts, triangles=tris)
    d = io.read_ply(p)
    np.testing.assert_array_equal(d["triangles"], tris)


def test_pointcloud_ply_roundtrip(tmp_path):
    pts = np.random.randn(40, 3).astype(np.float32)
    pc = PointCloud.from_numpy(pts, capacity=64)
    p = str(tmp_path / "pc.ply")
    n = io.write_point_cloud(p, pc)
    assert n == 40
    pc2 = io.read_point_cloud(p)
    got, _, _ = pc2.to_numpy()
    np.testing.assert_allclose(got, pts, atol=1e-6)


def test_depth_png_roundtrip(tmp_path):
    depth = np.random.rand(32, 48).astype(np.float32) * 3.0
    p = str(tmp_path / "d.png")
    io.write_depth(p, depth)
    back = io.read_depth(p)
    np.testing.assert_allclose(back, depth, atol=1e-3)  # mm quantization


def test_golden_depth_png_loads_metric():
    d = io.read_depth(os.path.join(REF_OUT, "depth_00008.png"))
    assert d.shape == (480, 640)
    assert 0 < d.max() < 25.0  # plausible meters
