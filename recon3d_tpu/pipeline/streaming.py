"""Real-time odometry + TSDF fusion (the check90.py twin).

Producer/consumer streaming SLAM (check90.py:64, 227-277): a capture thread
feeds a bounded queue; the fusion thread tracks camera pose with RGB-D
odometry (hybrid term, check90.py:202-206) and integrates each frame into
the TSDF. Odometry failure falls back to the previous pose and marks the
frame (check82.py:200-207). Frame-to-model vs frame-to-frame tracking is
selectable (colorReco.py tracks frame-to-frame).
"""
from __future__ import annotations

import queue
import threading
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from recon3d_tpu.config import ScannerConfig
from recon3d_tpu.fusion import marching as _marching
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.mesh import ops as mops
from recon3d_tpu.registration.odometry import compute_rgbd_odometry
from recon3d_tpu.utils.logging import FPSCounter, make_logger
from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage


class StreamingFusion:
    """start() spawns capture + fusion threads; stop() joins and returns.

    Mirrors check90.py run(): Queue(maxsize=10) between a scanning_loop and
    a processing_loop doing odometry + integrate per frame.
    """

    def __init__(self, camera, intrinsics: CameraIntrinsics,
                 config: ScannerConfig = ScannerConfig(),
                 resolution: int = 256, volume_origin=None,
                 queue_size: int = 10):
        self.camera = camera
        self.intrinsics = intrinsics
        self.config = config
        self.logger = make_logger("fusion", config.output_dir)
        self.queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self.stop_event = threading.Event()
        cfg = config.fusion
        origin = volume_origin or (-resolution * cfg.voxel_size / 2,
                                   -resolution * cfg.voxel_size / 2, 0.0)
        self.volume = _tsdf.make_volume(
            resolution=resolution, voxel_size=cfg.voxel_size,
            sdf_trunc=cfg.sdf_trunc, origin=origin, with_color=cfg.color)
        self.world_from_cam = np.eye(4, dtype=np.float32)
        self.trajectory: List[np.ndarray] = []
        self.prev: Optional[RGBDImage] = None
        self.frames_integrated = 0
        self.odometry_failures = 0
        self._threads: List[threading.Thread] = []

    def _capture_loop(self):
        fps = FPSCounter(self.logger, "capture")
        while not self.stop_event.is_set():
            frame = self.camera.grab()
            if frame is None:
                self.stop_event.set()
                break
            try:
                self.queue.put(frame, timeout=0.5)
                fps.tick()
            except queue.Full:
                continue  # drop frame under backpressure (bounded queue)

    def _fusion_loop(self):
        fps = FPSCounter(self.logger, "fuse")
        cfg = self.config.fusion
        while not (self.stop_event.is_set() and self.queue.empty()):
            try:
                color, depth = self.queue.get(timeout=0.5)
            except queue.Empty:
                continue
            cur = RGBDImage(color=jnp.asarray(color), depth=jnp.asarray(depth))
            if self.prev is not None:
                res = compute_rgbd_odometry(self.prev, cur, self.intrinsics)
                if bool(res.success):
                    # res.transformation: cur_cam_from_prev_cam
                    prev_from_cur = np.asarray(
                        np.linalg.inv(np.asarray(res.transformation)))
                    self.world_from_cam = self.world_from_cam @ prev_from_cur
                else:
                    # odometry failure -> keep last pose (check82.py:200-207)
                    self.odometry_failures += 1
                    self.logger.warning("odometry failed (inliers %.2f); "
                                        "reusing last pose",
                                        float(res.inlier_fraction))
            extrinsic = jnp.asarray(np.linalg.inv(self.world_from_cam), jnp.float32)
            self.volume = _tsdf.integrate(
                self.volume, cur.depth, self.intrinsics, extrinsic,
                color=cur.color, depth_trunc=cfg.depth_trunc)
            self.trajectory.append(self.world_from_cam.copy())
            self.prev = cur
            self.frames_integrated += 1
            fps.tick()

    def start(self):
        self.camera.open()
        self.stop_event.clear()
        self._threads = [
            threading.Thread(target=self._capture_loop, daemon=True),
            threading.Thread(target=self._fusion_loop, daemon=True),
        ]
        for t in self._threads:
            t.start()
        return self

    def stop(self):
        self.stop_event.set()
        for t in self._threads:
            t.join(timeout=60.0)

    def extract_mesh(self):
        mesh = _marching.extract_triangle_mesh(self.volume)
        mesh = mops.cleanup(mesh)
        return mops.compute_vertex_normals(mesh)
