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
from typing import List, NamedTuple, Optional

import jax
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


class _TrackState(NamedTuple):
    """Device-resident tracking state: the odometry accept/promote decision
    runs entirely on-device (lax select, not host bool()), so the fusion
    consumer never forces a device round-trip per frame — the per-frame
    host syncs the round-1 review flagged (streaming.py:143-150 then)
    defeated the async double buffering."""

    world_from_cam: jax.Array   # (4, 4) latest accepted pose
    world_from_key: jax.Array   # (4, 4) pose of the current keyframe
    rel_init: jax.Array         # (4, 4) cur_cam_from_key warm start
    key_color: jax.Array        # keyframe RGBD (same shapes as the stream)
    key_depth: jax.Array
    failures: jax.Array         # i32 scalar: odometry failures so far
    last_inliers: jax.Array     # f32 scalar: last frame's inlier fraction
    last_success: jax.Array     # bool scalar


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
                 depth_filters=None, consume_batch="auto",
                 live_mesher: bool = False):
        self.camera = camera
        self.intrinsics = intrinsics
        self.config = config
        # u16-wire streaming: cameras exposing grab_raw() ship
        # (u8 color, u16 depth) over the host->device link and the fused
        # step DIVIDES by this scale on device (raw units per meter,
        # StreamConfig.depth_scale semantics). The camera's own scale is
        # trusted only when it actually has the raw path — and it must
        # use the same divisor convention (RealSenseCamera.depth_scale
        # is the OPPOSITE, a meters-per-unit multiplier; it has no
        # grab_raw, so it never reaches this divide, and the assert
        # keeps any future raw-path camera honest).
        if hasattr(camera, "grab_raw"):
            self._depth_scale = float(getattr(camera, "depth_scale",
                                              0.0) or 0.0)
            assert self._depth_scale > 1.0, (
                "grab_raw cameras must expose depth_scale as raw units "
                f"per meter (divisor, e.g. 1000); got "
                f"{self._depth_scale!r} which looks like a meters-per-"
                "unit multiplier")
        else:
            self._depth_scale = float(
                getattr(getattr(config, "stream", None), "depth_scale",
                        None) or 1000.0)
        self.logger = make_logger("fusion", config.output_dir)
        self.queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self.stop_event = threading.Event()
        cfg = config.fusion
        # volume_origin=None -> auto-fit: the origin is re-seated on the
        # first frame so the volume is centered on the scene actually in
        # view (a fixed default like "1 m cube at z=0" silently meshes
        # nothing when the camera looks at a scene 2 m away, which is
        # exactly what the reference's golden capture does). The origin is
        # a traced array leaf of TSDFVolume, so the swap costs no
        # recompile.
        self._auto_origin = volume_origin is None
        origin = volume_origin or (-resolution * cfg.voxel_size / 2,
                                   -resolution * cfg.voxel_size / 2, 0.0)
        self.volume = _tsdf.make_volume(
            resolution=resolution, voxel_size=cfg.voxel_size,
            sdf_trunc=cfg.sdf_trunc, origin=origin, with_color=cfg.color)
        self.trajectory: List = []  # (4,4) device arrays, no per-frame sync
        self.frames_integrated = 0
        self.frames_captured = 0  # enqueued by the producer (incl. in-flight)
        self._host_failures = 0  # exceptions in the fusion loop
        self._state: Optional[_TrackState] = None
        self._step = None  # jitted on-device track+integrate, built lazily
        # Backlog batching: a drained queue backlog fuses as ONE lax.scan
        # program over B frames, amortizing per-dispatch latency (an RPC
        # round-trip on tunneled backends) across the batch. The default
        # "auto" adapts B to the backlog: the consumer drains whatever is
        # queued and fuses it with the largest power-of-two batch program
        # that fits, falling back to the per-frame step for remainders —
        # an empty queue costs nothing extra (latency of a per-frame
        # dispatch), a deep backlog fuses at full batch efficiency, and
        # no hand-tuned --consume_batch flag is needed (round-2 review
        # weak #3). An explicit int fixes B (1 disables batching).
        if consume_batch == "auto":
            cap = 1
            while cap * 2 <= max(2, queue_size):
                cap *= 2
            sizes, b = [], cap
            while b >= 2:
                sizes.append(b)
                b //= 2
            self._batch_sizes = sizes        # descending powers of two
            self._consume_batch = cap        # max frames drained per round
        else:
            B = max(1, int(consume_batch))
            self._batch_sizes = [B] if B > 1 else []
            self._consume_batch = B
        self._step_batches: dict = {}        # B -> jitted scanned program
        self._max_frames: Optional[int] = None
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
        # live_mesher: per-frame dirty-z-slab tracking rides the fused
        # step program (one extra reduce over the integrate's update
        # mask) and extract_mesh_live() re-meshes only dirty slabs into a
        # device-resident mesh (fusion/incremental.py) — the live-remesh
        # consumer check90-style viewers want at frame rate
        self.mesher = None
        if live_mesher:
            from recon3d_tpu.fusion.incremental import IncrementalMesher

            self.mesher = IncrementalMesher(resolution=resolution)
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
        queued = 0
        # Producer-side H2D batching: grabs are grouped into the consumer's
        # batch size B and shipped as ONE stacked (B,H,W,...) device_put per
        # stream, so the per-transfer fixed cost (an RPC round-trip on
        # tunneled backends — ~30 ms/frame measured unbatched, which alone
        # caps the stream below 30 fps) is paid once per B frames. The
        # first frame goes alone (the consumer's state-seeding path), and
        # end-of-stream remainders flush unbatched.
        B = max(1, self._consume_batch)
        pend: List = []

        def _enqueue(item, n):
            nonlocal queued
            try:
                self.queue.put(item, timeout=0.5)
                queued += n
                self.frames_captured += n
                for _ in range(n):
                    fps.tick()
            except queue.Full:
                pass  # drop under backpressure (bounded queue)

        # u16 wire format when the camera supports it: 1.5 MB/frame over
        # the link instead of 2.1 — the tunneled host->device path runs
        # ~44 MB/s, so wire bytes ARE the streaming throughput ceiling
        grab = getattr(self.camera, "grab_raw", None) or self.camera.grab
        first = True
        while not self.stop_event.is_set():
            if self._max_frames is not None and queued + len(pend) >= self._max_frames:
                # stop grabbing at the cap; frames already queued still
                # fuse (the consumer drains before honoring stop_event)
                break
            try:
                frame = grab()
            except Exception:
                # dying camera ends the stream instead of silently killing
                # this thread (check7.py retry/teardown pattern); frames
                # already queued still get fused
                self.logger.exception("camera grab failed; stopping stream")
                break
            if frame is None:
                break
            color, depth = frame
            if first or B == 1:
                # device-resident double buffering: device_put is async, so
                # this frame's host->HBM transfer overlaps the fusion
                # thread's compute on earlier frames
                _enqueue((jax.device_put(color), jax.device_put(depth)), 1)
                first = False
                continue
            pend.append((color, depth))
            if len(pend) == B:
                dc = jax.device_put(np.stack([c for c, _ in pend]))
                dd = jax.device_put(np.stack([d for _, d in pend]))
                _enqueue((dc, dd), B)
                pend = []
        for color, depth in pend:  # ragged tail: per-frame items
            _enqueue((jax.device_put(color), jax.device_put(depth)), 1)
        self.stop_event.set()

    def _fusion_loop(self):
        fps = FPSCounter(self.logger, "fuse")
        cfg = self.config.fusion
        while not (self.stop_event.is_set() and self.queue.empty()):
            try:
                items = [self.queue.get(timeout=0.5)]
            except queue.Empty:
                continue
            # drain whatever else is queued (up to the batch cap): a
            # backlog of per-frame items fuses as ONE scanned device
            # program instead of one dispatch per frame (_build_step_batch);
            # pre-stacked producer batches run the batch program directly
            while len(items) < self._consume_batch:
                try:
                    items.append(self.queue.get_nowait())
                except queue.Empty:
                    break
            n = sum(self._item_len(it) for it in items)
            try:
                self._fuse_items(items, cfg)
                for _ in range(n):
                    fps.tick()
            except Exception:  # keep the stream alive (check82-style)
                self._host_failures += 1
                self.logger.exception("fusion step failed; %d frame(s) "
                                      "dropped", n)

    @staticmethod
    def _item_len(item) -> int:
        """A queue item is one frame (color ndim 3) or a stacked batch."""
        return item[0].shape[0] if item[0].ndim == 4 else 1

    def _fuse_items(self, items, cfg):
        """Fuse a drained mix of per-frame items and pre-stacked producer
        batches: batches whose size has a compiled program run it directly
        on the already-device-resident stack; per-frame items group through
        _fuse_frames (which stacks on device) or the per-frame step."""
        singles: List = []
        for item in items:
            if item[0].ndim != 4:
                singles.append(item)
                continue
            # flush accumulated singles first to preserve frame order
            if singles:
                self._fuse_frames(singles, cfg)
                singles = []
            c, d = item
            B = c.shape[0]
            if self._state is None:
                # batch arrived before any state-seeding frame (producer
                # normally sends frame 0 unbatched): seed from slice 0
                self._fuse_one(c[0], d[0], cfg)
                c, d = c[1:], d[1:]
                B -= 1
                if B == 0:
                    continue
            prog = self._step_batches.get(B)
            if prog is None:
                prog = self._step_batches[B] = self._build_step_batch(cfg)
            with self.timer.stage("fuse_step"):
                self.volume, self._state, wfcs, hits = prog(
                    self.volume, self._state, c, d)
                if self._profile:
                    self.timer.sync(wfcs)
            self._mark_dirty(hits)
            self.trajectory.extend(list(wfcs))
            self.frames_integrated += B
        if singles:
            self._fuse_frames(singles, cfg)

    # ---- attribute compatibility: these sync on ACCESS (end-of-run /
    # tests), never on the per-frame consumer path
    @property
    def odometry_failures(self) -> int:
        dev = 0 if self._state is None else int(self._state.failures)
        return dev + self._host_failures

    @property
    def world_from_cam(self) -> np.ndarray:
        if self._state is None:
            return np.eye(4, dtype=np.float32)
        return np.asarray(self._state.world_from_cam)

    def _make_step_fn(self, cfg):
        """The per-frame consumer as a pure function: depth filter ->
        odometry vs the device-resident keyframe -> accept/promote selects
        (lax, no host bool()) -> pose update -> TSDF integrate. Jitted
        per-frame by _build_step and scanned in batches by
        _build_step_batch (check90.py:188-226 consumer semantics, minus
        the reference's per-frame host math)."""
        intr = self.intrinsics
        promote_below = self._promote_below
        depth_filters = self.depth_filters
        with_color = cfg.color
        depth_trunc = cfg.depth_trunc
        mesher = self.mesher
        eye = jnp.eye(4, dtype=jnp.float32)

        depth_scale = self._depth_scale

        def step(volume, state: _TrackState, color, depth):
            if depth.dtype != jnp.float32:
                # u16 wire depth -> f32 meters ON DEVICE: the producer
                # ships sensor dtypes (1.5 MB vs 2.1 MB per VGA frame
                # over the host->device link) and this divide is the
                # same f32 op grab() runs on host — bitwise identical
                depth = depth.astype(jnp.float32) / jnp.float32(depth_scale)
            if depth_filters is not None:
                depth = depth_filters(depth)
            cur = RGBDImage(color=color, depth=depth)
            key = RGBDImage(color=state.key_color, depth=state.key_depth)
            # trimmed GN schedule for the WARM-STARTED streaming tracker:
            # each frame initializes from the previous relative pose, and
            # the chip sweep (tools/exp_odo_iters.py) measured identical
            # pose error at (3,7,10) vs the (10,10,10) default while the
            # odometry cost drops 62 -> 27 ms. Cold-start callers
            # (pairwise registration, offline fragments) keep the
            # default schedule.
            res = compute_rgbd_odometry(key, cur, intr,
                                        init=state.rel_init,
                                        iterations=(3, 7, 10))
            ok = res.success
            # success: cur_cam_from_key advances; failure: keep last pose
            # and re-seat the keyframe so tracking recovers
            # (check82.py:200-207)
            cur_from_key = jnp.where(ok, res.transformation, state.rel_init)
            wfc = jnp.where(
                ok, state.world_from_key @ jnp.linalg.inv(cur_from_key),
                state.world_from_cam)
            promote = (~ok) | (res.inlier_fraction < promote_below)
            new_state = _TrackState(
                world_from_cam=wfc,
                world_from_key=jnp.where(promote, wfc, state.world_from_key),
                rel_init=jnp.where(promote, eye, cur_from_key),
                key_color=jnp.where(promote, color, state.key_color),
                key_depth=jnp.where(promote, depth, state.key_depth),
                failures=state.failures + (~ok).astype(jnp.int32),
                last_inliers=res.inlier_fraction,
                last_success=ok,
            )
            if mesher is None:
                new_volume = _tsdf._integrate(
                    volume, depth, intr, jnp.linalg.inv(wfc),
                    color=color if with_color else None,
                    depth_trunc=depth_trunc)
                hits = jnp.zeros((0,), bool)
            else:
                new_volume, changed_z = _tsdf._integrate(
                    volume, depth, intr, jnp.linalg.inv(wfc),
                    color=color if with_color else None,
                    depth_trunc=depth_trunc, with_changed_z=True,
                    changed_weight_min=mesher.weight_min)
                hits = mesher.dirty_hits(changed_z)
            return new_volume, new_state, wfc, hits

        return step

    def _build_step(self, cfg):
        """Jit of the per-frame step; volume AND tracking state donated,
        so steady-state streaming allocates nothing and never blocks on a
        device round-trip."""
        return jax.jit(self._make_step_fn(cfg), donate_argnums=(0, 1))

    def _build_step_batch(self, cfg):
        """lax.scan of the per-frame step over a stacked (B, ...) frame
        batch: ONE device program tracks+integrates B frames, so per-
        dispatch latency (an RPC round-trip on tunneled backends, queue/
        launch overhead everywhere) is paid once per B frames instead of
        per frame. The scan carry threads exactly the same (volume,
        state) a sequential loop would; results agree with per-frame
        calls to float32 roundoff (XLA fuses the scanned body slightly
        differently)."""
        inner = self._make_step_fn(cfg)

        def scan_step(carry, frame):
            volume, state = carry
            color, depth = frame
            volume, state, wfc, hits = inner(volume, state, color, depth)
            return (volume, state), (wfc, hits)

        def run(volume, state, colors, depths):
            (volume, state), (wfcs, hits) = jax.lax.scan(
                scan_step, (volume, state), (colors, depths))
            return volume, state, wfcs, jnp.any(hits, axis=0)

        return jax.jit(run, donate_argnums=(0, 1))

    def _fuse_frames(self, frames, cfg):
        """Fuse a drained queue backlog: the largest batch program that
        fits the remaining frames fuses them in one dispatch ("auto" mode
        keeps power-of-two programs so any backlog decomposes into a few
        dispatches); the first frame and ragged remainders take the
        per-frame step. Matches sequential _fuse_one calls to float32
        roundoff."""
        i = 0
        while i < len(frames):
            rest = len(frames) - i
            B = next((b for b in self._batch_sizes if b <= rest), None) \
                if self._state is not None else None
            if B is not None:
                batch = self._step_batches.get(B)
                if batch is None:
                    batch = self._step_batches[B] = \
                        self._build_step_batch(cfg)
                colors = jnp.stack([jnp.asarray(c)
                                    for c, _ in frames[i:i + B]])
                depths = jnp.stack([jnp.asarray(d)
                                    for _, d in frames[i:i + B]])
                with self.timer.stage("fuse_step"):
                    self.volume, self._state, wfcs, hits = batch(
                        self.volume, self._state, colors, depths)
                    if self._profile:
                        self.timer.sync(wfcs)
                self._mark_dirty(hits)
                self.trajectory.extend(list(wfcs))
                self.frames_integrated += B
                i += B
            else:
                color, depth = frames[i]
                self._fuse_one(color, depth, cfg)
                i += 1

    def _fit_origin(self, depth, cfg):
        """Center the volume on the first frame's visible surface.

        Robust center = per-axis median of the backprojected valid-depth
        points (clipped at depth_trunc); origin = center - half-extent.
        One host sync at scan start, never on the per-frame path.
        """
        import dataclasses

        d = np.asarray(depth)
        m = (d > 0) & (d <= float(cfg.depth_trunc))
        if not m.any():
            return  # nothing visible: keep the configured default
        H, W = d.shape
        intr = self.intrinsics
        fx, fy = float(intr.fx), float(intr.fy)
        cx, cy = float(intr.cx), float(intr.cy)
        ys, xs = np.nonzero(m)
        z = d[ys, xs]
        pts = np.stack([(xs - cx) / fx * z, (ys - cy) / fy * z, z], -1)
        center = np.median(pts, axis=0)
        half = self.volume.resolution * float(self.volume.voxel_size) / 2.0
        origin = jnp.asarray(center - half, jnp.float32)
        self.volume = dataclasses.replace(self.volume, origin=origin)
        self.logger.info("auto-fit volume origin to %s (scene median %s)",
                         np.round(center - half, 3), np.round(center, 3))

    def _fuse_one(self, color, depth, cfg):
        color = jnp.asarray(color)
        depth = jnp.asarray(depth)
        if depth.dtype != jnp.float32:  # u16 wire format (see __init__)
            depth = depth.astype(jnp.float32) / jnp.float32(self._depth_scale)
        if self._state is None:
            # first frame: integrate at identity, seat the keyframe
            if self.depth_filters is not None:
                depth = self.depth_filters(depth)
            if self._auto_origin:
                self._fit_origin(depth, cfg)
            eye = jnp.eye(4, dtype=jnp.float32)
            self.volume = _tsdf.integrate_donated(
                self.volume, depth, self.intrinsics, eye,
                color=color if cfg.color else None,
                depth_trunc=cfg.depth_trunc)
            # distinct buffers: the jitted step donates the whole state, and
            # XLA rejects donating one buffer through several tree leaves
            self._state = _TrackState(
                world_from_cam=jnp.eye(4, dtype=jnp.float32),
                world_from_key=jnp.eye(4, dtype=jnp.float32),
                rel_init=jnp.eye(4, dtype=jnp.float32),
                key_color=color, key_depth=depth,
                failures=jnp.zeros((), jnp.int32),
                last_inliers=jnp.ones(()), last_success=jnp.asarray(True))
            self.trajectory.append(eye)
        else:
            if self._step is None:
                self._step = self._build_step(cfg)
            with self.timer.stage("fuse_step"):
                self.volume, self._state, wfc, hits = self._step(
                    self.volume, self._state, color, depth)
                self._mark_dirty(hits)
                if self._profile:
                    self.timer.sync(wfc)
                    if not bool(self._state.last_success):
                        self.logger.warning(
                            "odometry failed (inliers %.2f); reusing last "
                            "pose", float(self._state.last_inliers))
            self.trajectory.append(wfc)
        self.frames_integrated += 1

    def warmup(self, color, depth) -> "StreamingFusion":
        """Compile the consumer's device programs before streaming starts.

        Runs the first-frame program (integrate_donated at identity, plus
        the depth-filter chain), the per-frame step, and the batch program
        (when consume_batch > 1) once on a sacrificial copy of the
        still-empty volume, with the sample frame as both keyframe and
        input. XLA compiles of the odometry+integrate programs take tens of
        seconds on a tunneled chip; without this they land inside the live
        measurement window (and cost the first real frames of any scan).
        The real volume and tracking state are untouched.
        """
        cfg = self.config.fusion
        import numpy as _np

        # warm the programs with the WIRE dtype the producer will ship:
        # u16 when the camera exposes grab_raw (values are sacrificial,
        # only the avals matter), f32 otherwise
        depth = _np.asarray(depth)
        if (self.camera is not None
                and hasattr(self.camera, "grab_raw")
                and depth.dtype != _np.uint16):
            depth = _np.clip(depth * self._depth_scale, 0,
                             65535).astype(_np.uint16)
        color = jax.device_put(color)
        depth = jax.device_put(depth)
        depth_f32 = depth if depth.dtype == jnp.float32 else (
            depth.astype(jnp.float32) / jnp.float32(self._depth_scale))
        if self._step is None:
            self._step = self._build_step(cfg)
        for B in self._batch_sizes:
            if B not in self._step_batches:
                self._step_batches[B] = self._build_step_batch(cfg)
        eye = jnp.eye(4, dtype=jnp.float32)
        vol = jax.tree.map(jnp.copy, self.volume)
        # frame 0 of a real scan runs integrate_donated (+ depth filters)
        # rather than _step: compile that path too, on the sacrificial copy
        wdepth = depth_f32 if self.depth_filters is None \
            else self.depth_filters(depth_f32)
        vol = _tsdf.integrate_donated(
            vol, wdepth, self.intrinsics, eye,
            color=color if cfg.color else None,
            depth_trunc=cfg.depth_trunc)
        state = _TrackState(
            world_from_cam=eye, world_from_key=jnp.copy(eye),
            rel_init=jnp.copy(eye), key_color=jnp.copy(color),
            key_depth=jnp.copy(depth_f32), failures=jnp.zeros((), jnp.int32),
            last_inliers=jnp.ones(()), last_success=jnp.asarray(True))
        vol, state, wfc, _h = self._step(vol, state, color, depth)
        for B, batch in self._step_batches.items():
            colors = jnp.stack([color] * B)
            depths = jnp.stack([depth] * B)
            vol, state, wfc, _h = batch(vol, state, colors, depths)
        jax.block_until_ready(wfc)
        del vol, state
        return self

    def start(self, skip_frames: int = 0, max_frames: Optional[int] = None):
        """skip_frames discards that many grabs before queueing — how a
        restore_checkpoint'd REPLAY scan continues from where it left off
        instead of re-integrating frames 0..k against the restored
        keyframe (live cameras don't need it: their stream has moved on).

        max_frames caps how many frames the capture thread enqueues this
        run; everything enqueued still fuses, so the run integrates at
        most max_frames new frames (polling frames_integrated from the
        caller instead overshoots: batched consumers integrate whole
        backlogs between polls).
        """
        self._max_frames = max_frames
        self.camera.open()
        for _ in range(skip_frames):
            if self.camera.grab() is None:
                break
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
        # deferred failure reporting: the consumer path never syncs, so the
        # per-run summary reads the device counter once here
        nf = self.odometry_failures
        if nf:
            self.logger.warning("%d odometry failures over %d frames",
                                nf, self.frames_integrated)

    def _mark_dirty(self, hits):
        """OR per-frame slab hits into the live mesher's dirty set —
        device arrays in, device OR, no sync."""
        if self.mesher is not None and hits.shape[0]:
            dirty = self.mesher.cache.dirty | hits
            self.mesher.cache = self.mesher.cache._replace(dirty=dirty)
            try:  # prefetch: update()'s host read overlaps the stream
                dirty.copy_to_host_async()
            except Exception:
                pass

    def extract_mesh(self):
        mesh = _marching.extract_triangle_mesh(self.volume)
        mesh = mops.cleanup(mesh)
        return mops.compute_vertex_normals(mesh)

    def extract_mesh_live(self):
        """Device-resident incremental re-mesh: refreshes only the z-slabs
        integrates have dirtied since the last call (requires
        live_mesher=True). No host round-trips — a live viewer can call
        this per displayed frame (check90.py's consumer-side extract /
        visualizer live_remesh_loop, at incremental cost)."""
        if self.mesher is None:
            raise RuntimeError("construct StreamingFusion(live_mesher=True) "
                               "for incremental extraction")
        return self.mesher.mesh_device(self.volume)

    # ---- crash-safe checkpoint/resume: one compressed NPZ holds the
    # volume, the device-resident tracking state and the trajectory, so a
    # scan resumes mid-stream without re-integrating saved frames (the
    # reference's only resume path, check84.py/check90.py:408-463, replays
    # every PNG pair from disk)
    def save_checkpoint(self, path: str) -> str:
        """Snapshot volume + tracking state + trajectory. Call between
        frames (stopped, or from the fusion thread's cadence) — not
        concurrently with an in-flight _fuse_one on another thread."""
        d = {
            "tsdf": np.asarray(self.volume.tsdf),
            "weight": np.asarray(self.volume.weight),
            "origin": np.asarray(self.volume.origin),
            "voxel_size": np.asarray(self.volume.voxel_size),
            "sdf_trunc": np.asarray(self.volume.sdf_trunc),
            "frames_integrated": np.int64(self.frames_integrated),
            "trajectory": (np.stack([np.asarray(t) for t in self.trajectory])
                           if self.trajectory
                           else np.zeros((0, 4, 4), np.float32)),
        }
        if self.volume.color is not None:
            d["color"] = np.asarray(self.volume.color)
        if self._state is not None:
            for name, leaf in zip(_TrackState._fields, self._state):
                d[f"state_{name}"] = np.asarray(leaf)
        np.savez_compressed(path, **d)
        return path

    def restore_checkpoint(self, path: str) -> "StreamingFusion":
        """Restore a save_checkpoint snapshot into this (fresh) instance;
        the next frame continues tracking against the restored keyframe."""
        from recon3d_tpu.fusion.tsdf import load_volume

        self.volume = load_volume(path)
        with np.load(path) as d:
            self.frames_integrated = int(d["frames_integrated"])
            self.trajectory = [jnp.asarray(t) for t in d["trajectory"]]
            if "state_world_from_cam" in d:
                self._state = _TrackState(*(
                    jnp.asarray(d[f"state_{name}"])
                    for name in _TrackState._fields))
        return self


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
