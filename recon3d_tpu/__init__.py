"""recon3d_tpu — a TPU-native 3D reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
aagsi/3D_Reconstruction_Project (stereo calibration, real-time disparity/depth,
RGB-D point-cloud capture/processing/registration, TSDF fusion and meshing),
re-designed TPU-first:

- fixed-shape, masked geometry buffers instead of dynamic point vectors
- fused Pallas kernels for the hot paths (rectify -> cost volume -> SGM)
- grid-hash neighbor search instead of KD-trees
- batched/vmapped registration instead of per-pair Python loops
- `jax.sharding.Mesh` + `shard_map` for multi-chip scaling

Public entry-point modules mirror the reference's top-level API
(reference: main.py:14-90):
  pointcloud_capture, pointcloud_processing, pointcloud_alignment,
  normal_estimation, mesh_reconstruction, mesh_saving,
plus calib, depth, camera, pipeline, cli.
"""

__version__ = "0.1.0"

from recon3d_tpu.utils.types import PointCloud, RGBDImage, TriangleMesh  # noqa: F401
