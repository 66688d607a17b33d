"""PointCloudProcessingWithTPU — load, downsample, remove outliers.

Mirrors the reference's pointcloud_processing.py:4-45 (GPU voxel downsample
@0.0025, statistical outlier removal nb=30/std=1.2, radius removal 16/0.01),
with the whole processing chain as jit programs over a masked buffer.
"""
from __future__ import annotations

from typing import Union

from recon3d_tpu.config import ProcessingConfig
from recon3d_tpu.pointcloud.outliers import (
    remove_radius_outliers,
    remove_statistical_outliers,
)
from recon3d_tpu.pointcloud.voxel import voxel_downsample
from recon3d_tpu.utils import io
from recon3d_tpu.utils.types import PointCloud, compact


class PointCloudProcessing:
    """process_point_cloud(filename_or_cloud) -> cleaned PointCloud
    (reference: pointcloud_processing.py:15-45)."""

    def __init__(self, config: ProcessingConfig = ProcessingConfig()):
        self.config = config

    def process_point_cloud(self, source: Union[str, PointCloud]) -> PointCloud:
        c = self.config
        pc = io.read_point_cloud(source) if isinstance(source, str) else source
        pc = voxel_downsample(pc, c.voxel_size)
        pc = compact(pc, min(pc.capacity, c.capacity))
        pc = remove_statistical_outliers(
            pc, nb_neighbors=c.outlier_nb_neighbors, std_ratio=c.outlier_std_ratio)
        pc = remove_radius_outliers(
            pc, nb_points=c.radius_nb_points, radius=c.radius)
        return pc


# reference class name alias (pointcloud_processing.py:4)
PointCloudProcessingWithTPU = PointCloudProcessing
