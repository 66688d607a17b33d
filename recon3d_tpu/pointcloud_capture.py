"""PointCloudCapture — frame grab to downsampled colored cloud.

Mirrors the reference's pointcloud_capture.py:5-56 (rs.pointcloud.calculate
+ map_to + tensor voxel_down_sample on CUDA), TPU-native: one jit program
does backprojection + color attach + voxel downsample on-device; the host
only grabs frames.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from recon3d_tpu.camera.base import Camera, ThreadedCamera
from recon3d_tpu.pointcloud.backproject import pointcloud_from_rgbd
from recon3d_tpu.pointcloud.voxel import voxel_downsample
from recon3d_tpu.utils.types import CameraIntrinsics, PointCloud


class PointCloudCapture:
    """capture_point_cloud(camera) -> masked PointCloud
    (reference: pointcloud_capture.py:17-56, voxel 0.01 at :50)."""

    def __init__(self, intrinsics: CameraIntrinsics, voxel_size: float = 0.01,
                 depth_trunc: float = 3.0, flip: bool = False):
        self.intrinsics = intrinsics
        self.voxel_size = voxel_size
        self.depth_trunc = depth_trunc
        self.flip = flip

    def capture_point_cloud(self, camera) -> Optional[PointCloud]:
        """Accepts a Camera, ThreadedCamera, or an (color, depth) tuple."""
        frame = None
        if isinstance(camera, ThreadedCamera):
            ok, frame = camera.read()
            if not ok:
                return None
        elif isinstance(camera, Camera):
            frame = camera.grab()
        else:
            frame = camera
        if frame is None:
            return None
        color, depth = frame
        pc = pointcloud_from_rgbd(
            jnp.asarray(color), jnp.asarray(depth), self.intrinsics,
            depth_trunc=self.depth_trunc, flip=self.flip,
        )
        return voxel_downsample(pc, self.voxel_size)
