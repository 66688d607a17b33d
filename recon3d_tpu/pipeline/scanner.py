"""Streaming scan -> align -> accumulate -> mesh pipeline (main.py twin).

Mirrors the reference's packaged pipeline (main.py:14-90): a capture thread
accumulates an aligned combined cloud until stopped, then the offline chain
runs: process -> normals -> Poisson -> save. Differences are TPU-idiomatic:
the per-frame align step is one jit program, the combined cloud lives in a
fixed-capacity device buffer (no host round-trips), and stopping is an
explicit Event (the reference blocks on input(), main.py:64-66).
"""
from __future__ import annotations

import threading
import time
from typing import Optional


import jax
import jax.numpy as jnp

from recon3d_tpu.config import ScannerConfig
from recon3d_tpu.mesh_reconstruction import MeshReconstruction
from recon3d_tpu.mesh_saving import MeshSaving
from recon3d_tpu.normal_estimation import NormalEstimation
from recon3d_tpu.pointcloud_alignment import PointCloudAlignment
from recon3d_tpu.pointcloud_capture import PointCloudCapture
from recon3d_tpu.pointcloud_processing import PointCloudProcessing
from recon3d_tpu.utils.logging import FPSCounter, make_logger
from recon3d_tpu.utils.types import CameraIntrinsics, PointCloud, compact, concatenate
from recon3d_tpu.utils import io


class StreamingScanner:
    """The main.py orchestration: wire capture/align/process/mesh/save."""

    def __init__(self, camera, intrinsics: CameraIntrinsics,
                 config: ScannerConfig = ScannerConfig()):
        self.camera = camera
        self.config = config
        self.capture = PointCloudCapture(
            intrinsics, voxel_size=config.processing.capture_voxel_size,
            depth_trunc=config.stream.depth_trunc)
        self.alignment = PointCloudAlignment(config.registration)
        self.processing = PointCloudProcessing(config.processing)
        self.normals = NormalEstimation(config.processing)
        self.reconstruction = MeshReconstruction(config.mesh)
        self.saving = MeshSaving()
        self.logger = make_logger("scanner", config.output_dir)
        self.stop_event = threading.Event()
        self.combined: Optional[PointCloud] = None
        self._thread: Optional[threading.Thread] = None
        self.frames = 0
        # per-frame (good, fitness, rmse) device scalars: the accept/skip
        # decision runs inside the jitted accumulate program, so the hot
        # loop never forces a device round-trip (the round-2 review's
        # weak #6: bool(result.is_good(...)) cost one RTT per frame on a
        # tunneled chip). Synced once at stop()/summary time.
        self._gate_log: list = []
        self._accum = None

    def _build_accum_step(self):
        """One jit program: align the new cloud to the accumulated one,
        evaluate the quality gate ON DEVICE (check6.py:65-76 fitness/rmse
        thresholds), and select grown-vs-unchanged combined with
        jnp.where — no host bool() on the per-frame path (main.py:34-52's
        loop re-done without its per-frame syncs)."""
        cap = self.config.processing.capacity
        fitness_min = self.config.registration.fitness_min
        rmse_max = self.config.registration.rmse_max
        align = self.alignment

        def step(combined, pc):
            aligned, result = align.align_point_clouds(pc, combined)
            good = result.is_good(fitness_min, rmse_max) & (pc.count() > 0)
            grown = compact(concatenate(combined, aligned), cap)
            new_combined = jax.tree.map(
                lambda g, old: jnp.where(good, g, old), grown, combined)
            return new_combined, good, result.fitness, result.inlier_rmse

        return jax.jit(step, donate_argnums=(0,))

    def _scan_loop(self, max_frames: Optional[int]):
        """simple_scanning_loop (main.py:34-52)."""
        fps = FPSCounter(self.logger, "scan")
        cap = self.config.processing.capacity
        # A non-looping replay source (camera.loop is False) returns None
        # forever once exhausted — cut fast on a short streak. A live camera
        # returning None is usually transient warm-up (CSI/GStreamer sources
        # deliver nothing until the first buffer arrives; the reference loop
        # main.py:49-50 skips forever), so live sources get a wall-clock
        # bound with a short sleep per empty read, not an iteration count.
        replay_eof = getattr(self.camera, "loop", None) is False
        empty_streak = 0
        empty_since: Optional[float] = None
        while not self.stop_event.is_set():
            if max_frames is not None and self.frames >= max_frames:
                break
            pc = self.capture.capture_point_cloud(self.camera)
            if pc is None:
                # grab returned nothing (EOF on replay, warm-up on live);
                # a captured-but-empty cloud is handled ON DEVICE by the
                # accumulate gate, so the loop never syncs a count here
                empty_streak += 1
                now = time.monotonic()
                empty_since = empty_since if empty_since is not None else now
                if replay_eof and empty_streak >= 3:
                    self.logger.info("replay exhausted after %d empty reads, "
                                     "stopping scan", empty_streak)
                    break
                if now - empty_since > self.config.empty_timeout_s:
                    self.logger.info("no frames for %.1f s, stopping scan",
                                     now - empty_since)
                    break
                time.sleep(0.005)
                continue
            empty_streak = 0
            empty_since = None
            pc = compact(pc, min(pc.capacity, cap // 4))
            if self.combined is None:
                # first frame seeds the map; an all-invalid first cloud is
                # harmless (alignment vs an empty target fails its gate
                # until a real frame lands) but costs one sync to detect,
                # paid once per scan, not per frame
                if int(pc.count()) == 0:
                    continue
                self.combined = compact(pc, cap)
            else:
                if self._accum is None:
                    self._accum = self._build_accum_step()
                self.combined, good, fit, rmse = self._accum(
                    self.combined, pc)
                # good/fit/rmse stay on device; stop() syncs them once.
                # self.frames is this frame's 0-based number (empty grabs
                # never increment it), recorded so deferred warnings name
                # the right frame even when empty first clouds were skipped
                self._gate_log.append((self.frames, good, fit, rmse))
            # max_frames counts processed attempts (accepted OR gate-
            # rejected): a replay with a bad stretch still terminates, and
            # the gate log reports exactly which attempts were skipped
            self.frames += 1
            fps.tick()

    def start(self, max_frames: Optional[int] = None) -> None:
        self.stop_event.clear()
        self._thread = threading.Thread(target=self._scan_loop,
                                        args=(max_frames,), daemon=True)
        self._thread.start()

    @property
    def frames_rejected(self) -> int:
        """Frames the on-device quality gate skipped (syncs on access)."""
        import numpy as np

        return int(sum(1 for _, g, _, _ in self._gate_log
                       if not bool(np.asarray(g))))

    def stop(self) -> None:
        self.stop_event.set()
        if self._thread is not None:
            self._thread.join(timeout=30.0)
        # deferred gate reporting: ONE sync per run, not one per frame
        if self._gate_log:
            import numpy as np

            bad = [(n, float(np.asarray(f)), float(np.asarray(r)))
                   for n, g, f, r in self._gate_log
                   if not bool(np.asarray(g))]
            for n, f, r in bad:
                self.logger.warning("frame %d failed quality gate "
                                    "(fitness=%.3f rmse=%.4f), skipped",
                                    n, f, r)

    def finalize(self, output_prefix: str = "captured_data_on_the_fly"):
        """The post-scan chain (main.py:64-91): save raw cloud, process,
        normals, Poisson, save mesh. Returns (mesh, densities, paths)."""
        if self.combined is None:
            raise RuntimeError("nothing captured")
        raw_path = f"{output_prefix}.ply"
        io.write_point_cloud(raw_path, self.combined)
        pc = self.processing.process_point_cloud(self.combined)
        pc = self.normals.estimate_normals(pc)
        mesh, densities = self.reconstruction.reconstruct_mesh(pc)
        paths = self.saving.save_mesh(mesh, densities,
                                      filename=f"{output_prefix}_mesh.ply")
        self.logger.info("saved %s", paths)
        return mesh, densities, (raw_path,) + tuple(p for p in paths if p)
