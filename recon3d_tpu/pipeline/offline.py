"""Offline fragment pipeline: capture/save -> register -> TSDF -> mesh.

The test/mini1.py twin (the reference's most complete program,
mini1.py:499-533 run()): scan frames to disk (color/depth PNG + cloud PLY,
per-frame checkpointing, mini1.py:154-183), reload offline
(load_rgbd_frames, :188-212), register fragments pairwise
(FPFH -> RANSAC -> point-to-plane ICP -> information matrix -> pose graph,
:213-321), globally optimize (LM, :323-341), integrate into TSDF
(:332-356), extract + smooth + clean the mesh (:357-390), save (:487-496).

TPU shape: per-frame preprocessing (backproject/downsample/normals/FPFH)
is one jit program vmappable over frames; pairwise registration is batched;
the TSDF integrate loop is a jit per frame over a dense device-resident
volume. Fragment count is capped by a ring buffer (check83.py:318-330).
"""
from __future__ import annotations

import os
import time
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from recon3d_tpu.config import ScannerConfig
from recon3d_tpu.fusion import marching as _marching
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.mesh import ops as mops
from recon3d_tpu.pointcloud.backproject import backproject_depth
from recon3d_tpu.pointcloud.normals import estimate_normals
from recon3d_tpu.pointcloud.outliers import remove_statistical_outliers
from recon3d_tpu.pointcloud.voxel import voxel_downsample
from recon3d_tpu.registration import se3
from recon3d_tpu.registration.features import compute_fpfh
from recon3d_tpu.registration.posegraph import PoseGraph, global_optimization
from recon3d_tpu.utils import io
from recon3d_tpu.utils.logging import FPSCounter, make_logger
from recon3d_tpu.utils.types import CameraIntrinsics, compact


class Scanner3D:
    """RealSense3DScanner equivalent (mini1.py) with any Camera backend."""

    def __init__(self, camera, intrinsics: CameraIntrinsics,
                 config: ScannerConfig = ScannerConfig()):
        self.camera = camera
        self.intrinsics = intrinsics
        self.config = config
        os.makedirs(config.output_dir, exist_ok=True)
        self.logger = make_logger("scanner3d", config.output_dir)
        self.frames: List[Tuple[np.ndarray, np.ndarray]] = []  # (color, depth)

    # ---- capture (mini1.py:104-187) ----
    def capture_frames(self, n_frames: int) -> int:
        fps = FPSCounter(self.logger, "capture")
        self.camera.open()
        count = 0
        while count < n_frames:
            frame = self.camera.grab()
            if frame is None:
                break
            color, depth = frame
            if self.config.save_frames:
                io.write_color(os.path.join(self.config.output_dir, f"color_{count:05d}.png"), color)
                io.write_depth(os.path.join(self.config.output_dir, f"depth_{count:05d}.png"), depth,
                               self.config.stream.depth_scale)
            # cap memory like the fragment ring buffer (check83.py:318-330)
            if len(self.frames) >= self.config.max_fragments:
                self.frames.pop(0)
            self.frames.append((color, depth))
            count += 1
            fps.tick()
        return count

    def load_rgbd_frames(self, directory: Optional[str] = None) -> int:
        """Offline reload (mini1.py:188-212) — the hardware-free path.

        Decodes all frames at once through the native thread-pool loader
        (native/frameio.cc) when built, falling back to per-file decode."""
        self.frames = io.load_rgbd_frames_batch(
            directory or self.config.output_dir,
            depth_scale=self.config.stream.depth_scale,
            max_frames=self.config.max_fragments)
        return len(self.frames)

    # ---- registration (mini1.py:213-341) ----
    def _preprocess(self, color, depth, capacity=8192):
        c = self.config.registration
        pc = backproject_depth(jnp.asarray(depth), self.intrinsics,
                               color=jnp.asarray(color),
                               depth_trunc=self.config.stream.depth_trunc)
        pc = voxel_downsample(pc, c.voxel_size)
        pc = compact(pc, capacity)
        pc = remove_statistical_outliers(pc, nb_neighbors=20, std_ratio=2.0)
        pc = estimate_normals(pc, radius=2.0 * c.voxel_size, max_nn=30)
        feat = compute_fpfh(pc, radius=5.0 * c.voxel_size, max_nn=64)
        return pc, feat

    def register_fragments(self) -> PoseGraph:
        """Pairwise registration into a pose graph (mini1.py:263-341).

        All pairs — the sequential chain AND the loop-closure candidates —
        are registered by ONE batched program (RANSAC-FPFH + ICP refine +
        information matrix, parallel.batch.register_pairs_ransac_batched),
        replacing the reference's per-pair python loop (mini1.py:263-321).
        Node poses are world_from_frame.
        """
        import jax

        from recon3d_tpu.parallel.batch import register_pairs_ransac_batched

        c = self.config.registration
        graph = PoseGraph()
        graph.add_node(np.eye(4))
        clouds = []
        feats = []
        for color, depth in self.frames:
            pc, f = self._preprocess(color, depth)
            clouds.append(pc)
            feats.append(f)
        self.clouds = clouds
        n = len(clouds)

        seq_pairs = [(i, i - 1) for i in range(1, n)]
        stride = max(n // 4, 2)
        loop_pairs = [(i, i - stride) for i in range(stride, n, stride)]
        pairs = seq_pairs + loop_pairs
        if not pairs:
            self.pose_graph = global_optimization(graph)
            return self.pose_graph

        stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
        res, infos = register_pairs_ransac_batched(
            stack([clouds[i] for i, _ in pairs]),
            stack([clouds[j] for _, j in pairs]),
            jnp.stack([feats[i] for i, _ in pairs]),
            jnp.stack([feats[j] for _, j in pairs]),
            distance_threshold=1.5 * c.voxel_size,
            num_trials=min(c.ransac_max_iterations, 65536),
        )
        good = np.asarray(res.is_good(c.fitness_min, c.rmse_max * 5))
        Ts = np.asarray(res.transformation, np.float64)
        infos = np.asarray(infos, np.float64)

        world_from_prev = np.eye(4)
        for k, (i, j) in enumerate(seq_pairs):
            if not good[k]:
                # registration failure -> identity + uncertain edge
                # (check82.py:200-207 pattern)
                self.logger.warning("pair %d->%d weak (fitness %.3f); "
                                    "identity fallback", i, j,
                                    float(res.fitness[k]))
                T, info, uncertain = np.eye(4), np.eye(6) * 1e-3, True
            else:
                T, info, uncertain = Ts[k], infos[k], False
            world_from_i = world_from_prev @ T
            graph.add_node(world_from_i)
            # edge (source=i, target=j=i-1) measures X_{i-1}^-1 X_i = T
            graph.add_edge(i, j, T, info, uncertain=uncertain)
            world_from_prev = world_from_i

        for k, (i, j) in enumerate(loop_pairs, start=len(seq_pairs)):
            if good[k]:
                graph.add_edge(i, j, Ts[k], infos[k], uncertain=True)

        self.pose_graph = global_optimization(graph)  # LM (mini1.py:323-341)
        return self.pose_graph

    # ---- fusion + meshing (mini1.py:332-390) ----
    def integrate_fragments(self, resolution: int = 256) -> _tsdf.TSDFVolume:
        cfg = self.config.fusion
        # volume bounds from the registered clouds
        pts = np.concatenate([np.asarray(pc.masked_points(jnp.nan))
                              for pc in self.clouds], 0)
        pts = pts[np.isfinite(pts).all(1)]
        center = pts.mean(0)
        span = max(resolution * cfg.voxel_size, 1e-3)
        origin = center - span / 2
        vol = _tsdf.make_volume(resolution=resolution, voxel_size=cfg.voxel_size,
                                sdf_trunc=cfg.sdf_trunc, origin=tuple(origin),
                                with_color=cfg.color)
        for k, (color, depth) in enumerate(self.frames):
            pose = self.pose_graph.nodes[k]  # world_from_frame
            if not np.isfinite(pose).all():  # finite-pose gate (mini1.py:345-348)
                self.logger.warning("skipping frame %d: non-finite pose", k)
                continue
            extrinsic = jnp.asarray(np.linalg.inv(pose), jnp.float32)
            vol = _tsdf.integrate(vol, jnp.asarray(depth), self.intrinsics,
                                  extrinsic, color=jnp.asarray(color),
                                  depth_trunc=cfg.depth_trunc)
        self.volume = vol
        return vol

    def extract_mesh(self):
        """Extract + smooth + clean (mini1.py:357-390)."""
        mesh = _marching.extract_triangle_mesh(self.volume)
        mesh = mops.filter_smooth_laplacian(
            mesh, iterations=self.config.mesh.smoothing_iterations)
        mesh = mops.cleanup(mesh)
        mesh = mops.compute_vertex_normals(mesh)
        return mesh

    def save_mesh(self, mesh, name: Optional[str] = None) -> str:
        path = os.path.join(
            self.config.output_dir,
            name or f"output_mesh_{time.strftime('%Y%m%d_%H%M%S')}.ply")
        io.write_triangle_mesh(path, mesh)
        self.logger.info("mesh saved to %s", path)
        return path

    def run(self, n_frames: int = 16) -> str:
        """Full offline pipeline (mini1.py:499-533)."""
        captured = self.capture_frames(n_frames)
        self.logger.info("captured %d frames", captured)
        self.register_fragments()
        self.integrate_fragments(resolution=self.config.fusion.grid_resolution)
        mesh = self.extract_mesh()
        return self.save_mesh(mesh)
