"""Real-time odometry + TSDF fusion (the check90.py twin).

Producer/consumer streaming SLAM (check90.py:64, 227-277): a capture thread
feeds a bounded queue; the fusion thread tracks camera pose with RGB-D
odometry (hybrid term, check90.py:202-206) and integrates each frame into
the TSDF. Odometry failure falls back to the previous pose and marks the
frame (check82.py:200-207). Tracking is selectable: "keyframe" (register
against a reference keyframe, promoted when overlap drops — drift-free
while the keyframe holds) or "frame_to_frame" (the reference's
check90.py/colorReco.py behavior).
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
from recon3d_tpu.utils.profiling import StageTimer
from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage


class StreamingFusion:
    """start() spawns capture + fusion threads; stop() joins and returns.

    Mirrors check90.py run(): Queue(maxsize=10) between a scanning_loop and
    a processing_loop doing odometry + integrate per frame.
    """

    def __init__(self, camera, intrinsics: CameraIntrinsics,
                 config: ScannerConfig = ScannerConfig(),
                 resolution: int = 256, volume_origin=None,
                 queue_size: int = 10, tracking: str = "keyframe",
                 keyframe_min_inliers: float = 0.85, profile: bool = False,
                 depth_filters=None):
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
        # Keyframe tracking: register each frame against a reference
        # keyframe instead of the previous frame, so per-step odometry bias
        # stops accumulating while the keyframe stays good; the keyframe is
        # promoted when overlap (inlier fraction) drops. "frame_to_frame"
        # reproduces check90.py/colorReco.py exactly (promote every frame).
        if tracking not in ("keyframe", "frame_to_frame"):
            raise ValueError(f"unknown tracking mode {tracking!r}")
        self._promote_below = (2.0 if tracking == "frame_to_frame"
                               else keyframe_min_inliers)
        self.world_from_key = np.eye(4, dtype=np.float32)
        self._rel_init = jnp.eye(4, dtype=jnp.float32)  # cur_cam_from_key
        self.keyframe: Optional[RGBDImage] = None
        # per-stage odometry/integrate timing; profile=True adds a device
        # sync per stage for exact numbers (costs a round-trip per frame —
        # without it the stages measure dispatch + host work only)
        self.timer = StageTimer()
        self._profile = profile
        # optional depth conditioning chain applied before odometry, the
        # TPU-native stand-in for the SDK filters a live RealSense applies
        # on grab (check90.py:99-103) — e.g. depth.filters.DepthFilterBank
        self.depth_filters = depth_filters

    def _capture_loop(self):
        import jax

        fps = FPSCounter(self.logger, "capture")
        while not self.stop_event.is_set():
            try:
                frame = self.camera.grab()
            except Exception:
                # dying camera ends the stream instead of silently killing
                # this thread (check7.py retry/teardown pattern); frames
                # already queued still get fused
                self.logger.exception("camera grab failed; stopping stream")
                self.stop_event.set()
                break
            if frame is None:
                self.stop_event.set()
                break
            # device-resident double buffering: device_put is asynchronous,
            # so frame k+1's host->HBM transfer overlaps the fusion thread's
            # odometry+integrate on frame k (SURVEY.md section 7 item 8; the
            # reference's queue shipped host arrays and paid the copy on the
            # consumer's critical path)
            color, depth = frame
            dev = (jax.device_put(color), jax.device_put(depth))
            try:
                self.queue.put(dev, timeout=0.5)
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
            try:
                self._fuse_one(color, depth, cfg)
                fps.tick()
            except Exception:  # keep the stream alive (check82-style)
                self.odometry_failures += 1
                self.logger.exception("fusion step failed; frame dropped")

    def _fuse_one(self, color, depth, cfg):
            if self.depth_filters is not None:
                with self.timer.stage("depth_filter"):
                    depth = self.depth_filters(jnp.asarray(depth))
            cur = RGBDImage(color=jnp.asarray(color), depth=jnp.asarray(depth))
            if self.prev is None:
                self.keyframe = cur
            else:
                with self.timer.stage("odometry"):
                    res = compute_rgbd_odometry(self.keyframe, cur,
                                                self.intrinsics,
                                                init=self._rel_init)
                    if self._profile:
                        self.timer.sync(res.transformation)
                if bool(res.success):
                    # res.transformation: cur_cam_from_key_cam
                    cur_from_key = np.asarray(res.transformation)
                    self.world_from_cam = (
                        self.world_from_key @ np.linalg.inv(cur_from_key)
                    ).astype(np.float32)
                    self._rel_init = jnp.asarray(cur_from_key)
                    if float(res.inlier_fraction) < self._promote_below:
                        self.keyframe = cur
                        self.world_from_key = self.world_from_cam.copy()
                        self._rel_init = jnp.eye(4, dtype=jnp.float32)
                else:
                    # odometry failure -> keep last pose (check82.py:200-207)
                    # and re-seat the keyframe so tracking can recover
                    self.odometry_failures += 1
                    self.logger.warning("odometry failed (inliers %.2f); "
                                        "reusing last pose",
                                        float(res.inlier_fraction))
                    self.keyframe = cur
                    self.world_from_key = self.world_from_cam.copy()
                    self._rel_init = jnp.eye(4, dtype=jnp.float32)
            extrinsic = jnp.asarray(np.linalg.inv(self.world_from_cam), jnp.float32)
            # donated integrate: the grid updates in place instead of
            # allocating a fresh ~R^3 volume every frame
            with self.timer.stage("integrate"):
                self.volume = _tsdf.integrate_donated(
                    self.volume, cur.depth, self.intrinsics, extrinsic,
                    color=cur.color, depth_trunc=cfg.depth_trunc)
                if self._profile:
                    self.timer.sync(self.volume.weight)
            self.trajectory.append(self.world_from_cam.copy())
            self.prev = cur
            self.frames_integrated += 1

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


def integrate_saved_frames(directory: str, intrinsics: CameraIntrinsics,
                           config: ScannerConfig = ScannerConfig(),
                           resolution: int = 256, volume_origin=None,
                           max_frames: Optional[int] = None,
                           tracking: str = "keyframe",
                           depth_filters=None) -> StreamingFusion:
    """Offline re-integration of a saved scan (check90.py:408-463
    integrate_saved_frames): load every color/depth pair from `directory`
    (native thread-pool decoder), run the same odometry+TSDF consumer the
    live stream uses — synchronously, no threads — and return the fusion
    object (volume, trajectory, extract_mesh()).
    """
    from recon3d_tpu.utils import io as _io

    frames = _io.load_rgbd_frames_batch(
        directory, depth_scale=config.stream.depth_scale,
        max_frames=max_frames)
    if not frames:
        raise FileNotFoundError(f"no color/depth pairs in {directory}")
    sf = StreamingFusion(None, intrinsics, config, resolution=resolution,
                         volume_origin=volume_origin, tracking=tracking,
                         depth_filters=depth_filters)
    cfg = config.fusion
    for color, depth in frames:
        sf._fuse_one(jnp.asarray(color), jnp.asarray(depth), cfg)
    return sf
