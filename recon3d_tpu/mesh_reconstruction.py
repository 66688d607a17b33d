"""MeshReconstruction — Poisson + smoothing + cleanup.

Mirrors the reference's mesh_reconstruction.py:5-70: Poisson reconstruction
at depth (default 6), Laplacian smoothing x5, degenerate-triangle and
unreferenced-vertex removal. The reference parallelized cleanup with a host
ThreadPool (:29-37); here every step is an XLA program.
"""
from __future__ import annotations

from typing import Tuple

import jax

from recon3d_tpu.config import MeshConfig
from recon3d_tpu.mesh import ops as mops
from recon3d_tpu.mesh.poisson import create_from_point_cloud_poisson
from recon3d_tpu.utils.types import PointCloud, TriangleMesh


class MeshReconstruction:
    def __init__(self, config: MeshConfig = MeshConfig()):
        self.config = config

    def reconstruct_mesh(
        self, pc: PointCloud, depth: int = None
    ) -> Tuple[TriangleMesh, jax.Array]:
        """(mesh, densities), reference signature mesh_reconstruction.py:13-39."""
        depth = depth or self.config.poisson_depth
        mesh, densities = create_from_point_cloud_poisson(pc, depth=depth)
        mesh = mops.filter_smooth_laplacian(
            mesh, iterations=self.config.smoothing_iterations)
        mesh = mops.cleanup(mesh)
        mesh = mops.compute_vertex_normals(mesh)
        return mesh, densities


def reconstruct_mesh(pc: PointCloud, depth: int = 6):
    return MeshReconstruction().reconstruct_mesh(pc, depth=depth)
