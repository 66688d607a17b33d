"""Depth/disparity -> point cloud backprojection.

Replaces rs.pointcloud.calculate + map_to (pointcloud_capture.py:34-40) and
o3d.geometry.PointCloud.create_from_rgbd_image (test/mini1.py:165-171):
pinhole backprojection of a depth image (with colors) and Q-matrix
backprojection of a disparity image, both as pure jit programs producing a
fixed-capacity masked PointCloud (one point slot per pixel; validity mask
instead of dynamic sizing).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.utils.types import CameraIntrinsics, PointCloud

# Open3D's RGBD pipeline flips to this camera convention before visualizing
# (test/mini1.py:170 flip transform [[1,0,0,0],[0,-1,0,0],[0,0,-1,0],[0,0,0,1]])
FLIP_TRANSFORM = np.array([  # numpy: no device op at import time
    [1.0, 0.0, 0.0, 0.0],
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, -1.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
], np.float32)


def backproject_depth(
    depth: jax.Array,
    intr: CameraIntrinsics,
    color: Optional[jax.Array] = None,
    depth_trunc: float = 3.0,
    depth_min: float = 1e-3,
    stride: int = 1,
) -> PointCloud:
    """Pinhole backprojection: (H, W) metric depth -> PointCloud of H*W points.

    color: optional (H, W, 3) float [0,1] or uint8. stride subsamples pixels
    (the capture-time decimation the reference gets from rs.decimation_filter).
    """
    d = jnp.asarray(depth, jnp.float32)[::stride, ::stride]
    H, W = d.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) * stride
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) * stride
    z = d
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    pts = jnp.stack([x, y, z], -1).reshape(-1, 3)
    valid = ((d > depth_min) & (d < depth_trunc) & jnp.isfinite(d)).reshape(-1)
    cols = None
    if color is not None:
        c = jnp.asarray(color)
        if c.dtype == jnp.uint8:
            c = c.astype(jnp.float32) / 255.0
        cols = c[::stride, ::stride].reshape(-1, 3)
    return PointCloud(points=pts, valid=valid, colors=cols)


def backproject_disparity(
    disparity: jax.Array,
    Q: jax.Array,
    color: Optional[jax.Array] = None,
    z_min: float = 1e-3,
    z_max: float = 20.0,
    assume_standard_q: bool = False,
) -> PointCloud:
    """Q-matrix backprojection (cv2.reprojectImageTo3D) -> masked PointCloud.

    The rectified-stereo path: disparity from the SGM matcher plus the Q from
    stereo rectification gives metric points in the left rectified frame.

    assume_standard_q: when the caller guarantees Q has stereoRectify's
    sparse form (nonzeros only at [0,0]=[1,1]=1, [0,3], [1,3], [2,3],
    [3,2], [3,3]), skip the general 4x4 homogeneous transform — 6
    elementwise ops instead of a per-pixel matmul (the streaming hot path).
    """
    if assume_standard_q:
        Q = jnp.asarray(Q, jnp.float32)
        d = jnp.asarray(disparity, jnp.float32)
        H, W = d.shape
        x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        w = Q[3, 2] * d + Q[3, 3]
        w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        inv = 1.0 / w
        pts = jnp.stack([(x + Q[0, 3]) * inv, (y + Q[1, 3]) * inv,
                         Q[2, 3] * inv], -1).reshape(-1, 3)
    else:
        from recon3d_tpu.depth.matcher import reproject_image_to_3d

        pts = reproject_image_to_3d(disparity, Q).reshape(-1, 3)
    z = pts[:, 2]
    valid = (jnp.asarray(disparity).reshape(-1) > 0) & (z > z_min) & (z < z_max)
    valid = valid & jnp.isfinite(pts).all(axis=1)
    cols = None
    if color is not None:
        c = jnp.asarray(color)
        if c.dtype == jnp.uint8:
            c = c.astype(jnp.float32) / 255.0
        cols = c.reshape(-1, 3)
    return PointCloud(points=pts, valid=valid, colors=cols)


def pointcloud_from_rgbd(
    color: jax.Array,
    depth: jax.Array,
    intr: CameraIntrinsics,
    depth_trunc: float = 3.0,
    flip: bool = True,
) -> PointCloud:
    """RGBD frame -> colored cloud with Open3D's flip convention
    (mini1.py:165-171)."""
    pc = backproject_depth(depth, intr, color=color, depth_trunc=depth_trunc)
    if flip:
        from recon3d_tpu.utils.types import transform

        pc = transform(pc, FLIP_TRANSFORM)
    return pc
