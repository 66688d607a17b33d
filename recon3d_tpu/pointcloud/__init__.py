from recon3d_tpu.pointcloud.backproject import (  # noqa: F401
    backproject_depth,
    backproject_disparity,
    pointcloud_from_rgbd,
)
