"""PointCloudAlignment — pairwise ICP alignment.

Mirrors the reference's pointcloud_alignment.py:5-46: voxel downsample both
clouds, estimate target normals, ICP (threshold 0.02, max_iter 100, relative
fitness/rmse 1e-6), apply the transform to the source. The CuPy eye(4)
initialization (line 31) becomes jnp.eye.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from recon3d_tpu.config import RegistrationConfig
from recon3d_tpu.pointcloud.normals import estimate_normals
from recon3d_tpu.pointcloud.voxel import voxel_downsample
from recon3d_tpu.registration.icp import RegistrationResult, registration_icp
from recon3d_tpu.utils.types import PointCloud, transform


class PointCloudAlignment:
    """align_point_clouds(source, target) -> (aligned_source, result)."""

    def __init__(self, config: RegistrationConfig = RegistrationConfig()):
        self.config = config

    def align_point_clouds(
        self, source: PointCloud, target: PointCloud
    ) -> Tuple[PointCloud, RegistrationResult]:
        c = self.config
        src = voxel_downsample(source, c.voxel_size)
        tgt = voxel_downsample(target, c.voxel_size)
        method = c.method if c.method in ("point_to_point", "point_to_plane") else "point_to_point"
        if method == "point_to_plane":
            tgt = estimate_normals(tgt, radius=2.0 * c.voxel_size, max_nn=30)
        init = jnp.eye(4, dtype=jnp.float32)  # trans_init (ref line 31)
        result = registration_icp(
            src, tgt,
            threshold=c.icp_threshold,
            init=init,
            method=method,
            max_iterations=c.icp_max_iterations,
            relative_fitness=c.icp_rel_fitness,
            relative_rmse=c.icp_rel_rmse,
        )
        return transform(source, result.transformation), result
