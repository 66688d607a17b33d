"""Mesh filter/cleanup/Poisson/saving tests."""
import dataclasses as dc

import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.mesh import ops as mops
from recon3d_tpu.mesh.poisson import create_from_point_cloud_poisson
from recon3d_tpu.mesh.saving import color_by_density, save_mesh
from recon3d_tpu.utils import io
from recon3d_tpu.utils.types import PointCloud, TriangleMesh


def _grid_mesh(n=8):
    """Flat grid mesh in the z=0 plane."""
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n, np.float32)], -1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            tris += [[a, b, c], [b, d, c]]
    return TriangleMesh(
        vertices=jnp.asarray(verts),
        triangles=jnp.asarray(np.asarray(tris, np.int32)),
        vertex_valid=jnp.ones((n * n,), bool),
        triangle_valid=jnp.ones((len(tris),), bool),
    )


class TestFilters:
    def test_laplacian_smooths_noise(self):
        mesh = _grid_mesh()
        rng = np.random.RandomState(0)
        noisy = np.asarray(mesh.vertices).copy()
        noisy[:, 2] += rng.randn(len(noisy)) * 0.3
        mesh_n = dc.replace(mesh, vertices=jnp.asarray(noisy))
        out = mops.filter_smooth_laplacian(mesh_n, iterations=5)
        z = np.asarray(out.vertices)[:, 2]
        # interior flattens toward 0
        interior = np.abs(z.reshape(8, 8)[2:-2, 2:-2])
        assert interior.mean() < np.abs(noisy[:, 2]).mean() * 0.5

    def test_degenerate_removed(self):
        mesh = _grid_mesh()
        tris = np.asarray(mesh.triangles).copy()
        tris[0] = [0, 0, 1]
        mesh = dc.replace(mesh, triangles=jnp.asarray(tris))
        out = mops.remove_degenerate_triangles(mesh)
        assert not bool(out.triangle_valid[0])
        assert bool(out.triangle_valid[1])

    def test_unreferenced_removed(self):
        mesh = _grid_mesh()
        tv = np.asarray(mesh.triangle_valid).copy()
        tv[:] = False
        tv[0] = True  # only triangle (0,1,8) stays
        out = mops.remove_unreferenced_vertices(dc.replace(mesh, triangle_valid=jnp.asarray(tv)))
        vv = np.asarray(out.vertex_valid)
        assert vv[[0, 1, 8]].all()
        assert vv.sum() == 3

    def test_nan_scrub(self):
        mesh = _grid_mesh()
        verts = np.asarray(mesh.vertices).copy()
        verts[5] = np.nan
        out = mops.remove_nan_vertices(dc.replace(mesh, vertices=jnp.asarray(verts)))
        assert not bool(out.vertex_valid[5])
        t = np.asarray(mesh.triangles)
        touching = (t == 5).any(1)
        assert not np.asarray(out.triangle_valid)[touching].any()

    def test_duplicate_vertices_welded(self):
        mesh = _grid_mesh()
        verts = np.asarray(mesh.vertices).copy()
        verts[1] = verts[0]  # duplicate position
        out = mops.remove_duplicated_vertices(dc.replace(mesh, vertices=jnp.asarray(verts)))
        assert int(np.asarray(out.vertex_valid).sum()) == len(verts) - 1
        assert not (np.asarray(out.triangles) == 1).any()

    def test_vertex_normals_flat_grid(self):
        out = mops.compute_vertex_normals(_grid_mesh())
        n = np.asarray(out.vertex_normals)
        assert np.abs(np.abs(n[:, 2]) - 1.0).max() < 1e-5

    def test_density_highlight(self):
        mesh = _grid_mesh()
        dens = np.linspace(0, 1, mesh.vertices.shape[0]).astype(np.float32)
        out = mops.highlight_sparse_regions(mesh, jnp.asarray(dens), quantile=0.1)
        cols = np.asarray(out.vertex_colors)
        lowest = cols[0]
        np.testing.assert_allclose(lowest, [1, 0, 0], atol=1e-6)


class TestPoisson:
    def test_sphere_reconstruction(self):
        rng = np.random.RandomState(0)
        d = rng.randn(3000, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pc = PointCloud.from_numpy((d * 0.5).astype(np.float32),
                                   normals=d.astype(np.float32))
        mesh, dens = create_from_point_cloud_poisson(pc, depth=6)
        verts, tris, _, _ = mesh.to_numpy()
        r = np.linalg.norm(verts, axis=1)
        assert abs(np.median(r) - 0.5) < 0.01
        assert np.percentile(np.abs(r - 0.5), 95) < 0.02
        assert len(np.asarray(dens)) == mesh.vertices.shape[0]

    def test_requires_normals(self):
        pc = PointCloud.from_numpy(np.random.randn(100, 3).astype(np.float32))
        with pytest.raises(ValueError, match="normals"):
            create_from_point_cloud_poisson(pc, depth=5)


class TestSaving:
    def test_save_mesh_with_density_coloring(self, tmp_path):
        mesh = _grid_mesh()
        dens = np.linspace(1, 2, mesh.vertices.shape[0])
        p, pc = save_mesh(mesh, dens, filename=str(tmp_path / "m.ply"))
        d = io.read_ply(p)
        assert "triangles" in d
        dc_ = io.read_ply(pc)
        assert "colors" in dc_
        # plasma: low density -> dark blue/purple, high -> yellow
        order = np.argsort(dens)
        cols = dc_["colors"]
        assert cols[order[-1]][0] > cols[order[0]][0]  # red channel rises
