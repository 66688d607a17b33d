"""Command-line interface.

Covers the reference's executable surfaces: the streaming scan (main.py),
the offline fragment pipeline with mini1.py:535-556's argparse flags, the
real-time fusion variant (check90.py), the stereo calibration workflow
(calib3_2.py batch mode), the live depth pipeline (depth4.py), and the NPZ
inspection utilities (readPar.py / inspect_calibration_file.py).

    python -m recon3d_tpu.cli scan      --frames 30 --camera synthetic
    python -m recon3d_tpu.cli offline   --frames 16 --camera replay --replay_dir ...
    python -m recon3d_tpu.cli fuse      --frames 30 --camera synthetic
    python -m recon3d_tpu.cli calibrate --folder imgs/ --pattern 9x6 --square 0.025
    python -m recon3d_tpu.cli depth     --npz rig.npz --width 960 --height 540
    python -m recon3d_tpu.cli inspect   --npz rig.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from recon3d_tpu.config import ScannerConfig, add_dataclass_args, dataclass_from_args


def _make_camera(args, for_stereo=False):
    from recon3d_tpu.camera.fake import FakeRGBDCamera, FakeStereoCamera, SyntheticRGBDCamera

    if args.camera == "synthetic":
        return SyntheticRGBDCamera(n_frames=args.frames)
    if args.camera == "replay":
        return FakeRGBDCamera(args.replay_dir, loop=False)
    if args.camera == "realsense":
        from recon3d_tpu.camera.realsense import RealSenseCamera

        return RealSenseCamera()
    raise SystemExit(f"unknown camera backend {args.camera}")


def _intrinsics(args):
    import jax.numpy as jnp

    from recon3d_tpu.utils.types import CameraIntrinsics

    if args.intrinsics:
        return CameraIntrinsics.from_json(args.intrinsics)
    if args.camera == "synthetic":
        return CameraIntrinsics(fx=jnp.float32(525.0), fy=jnp.float32(525.0),
                                cx=jnp.float32(319.5), cy=jnp.float32(239.5))
    # D415 defaults (test/dataset/realsense/camera_intrinsic.json)
    return CameraIntrinsics(fx=jnp.float32(616.6349), fy=jnp.float32(616.309),
                            cx=jnp.float32(312.5787), cy=jnp.float32(242.2195))


def _add_common(p):
    p.add_argument("--camera", default="synthetic",
                   choices=["synthetic", "replay", "realsense"])
    p.add_argument("--replay_dir", default="/root/reference/test/output")
    p.add_argument("--intrinsics", default=None, help="intrinsics JSON path")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--depth_filters", action="store_true",
                   help="apply the decimation-free spatial/temporal/hole-fill "
                        "chain (check90.py:99-103) on-device before fusion")
    add_dataclass_args(p, ScannerConfig)



def _cmd_doctor() -> int:
    """Environment diagnostics: what will and won't work here, in one
    screen. Exit 0 when a usable compute backend exists, 1 otherwise."""
    import glob

    def row(name, ok, detail=""):
        mark = "ok " if ok else ("-- " if ok is None else "FAIL")
        print(f"  [{mark:4}] {name:28} {detail}")
        return bool(ok)

    print("recon3d_tpu doctor")
    usable = False
    try:
        import jax

        devs = jax.devices()
        plat = devs[0].platform
        usable = row("jax backend", True,
                     f"{plat} x{len(devs)} ({devs[0].device_kind})")
    except Exception as e:  # pragma: no cover - backend-dependent
        row("jax backend", False, f"{type(e).__name__}: {e}")
        print("         hint: JAX_PLATFORMS=cpu runs everything off-TPU "
              "(kernels in interpret mode)")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    n_cache = len(glob.glob(os.path.join(cache, "*"))) if os.path.isdir(cache) else 0
    row("compilation cache", n_cache > 0 or None,
        f"{cache} ({n_cache} entries)" if n_cache else
        "absent: first 1080p frame program compiles ~15 min on TPU")
    from recon3d_tpu.utils import native

    lib = native.load_library()
    row("native frameio (C++)", lib is not None or None,
        "libframeio.so loaded" if lib is not None
        else "not built (PIL fallback active; make -C native)")
    try:
        import cv2  # noqa: F401

        row("opencv oracles", True, cv2.__version__)
    except Exception:
        row("opencv oracles", None, "cv2 absent: parity tests skip")
    golden = "/root/reference/test/output"
    n_png = len(glob.glob(os.path.join(golden, "color_*.png")))
    row("golden replay fixtures", n_png > 0 or None,
        f"{golden} ({n_png} frames)" if n_png else "absent: use synthetic")
    return 0 if usable else 1

def main(argv=None):
    # honor JAX_PLATFORMS even when the interpreter's sitecustomize already
    # imported jax and registered the default (TPU) backend: the env var
    # alone is too late at that point, the config must be updated before
    # any backend initializes
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)

    parser = argparse.ArgumentParser(prog="recon3d_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ("scan", "offline", "fuse"):
        sp = sub.add_parser(name)
        _add_common(sp)
        if name == "fuse":
            sp.add_argument("--resume", default=None, metavar="CKPT",
                            help="resume fusion from a save_checkpoint NPZ")
            sp.add_argument("--consume_batch", default="auto",
                            type=lambda v: v if v == "auto" else int(v),
                            help="fuse queue backlogs as one scanned "
                                 "device program over N frames (amortizes "
                                 "dispatch latency; adds up to N-1 frames "
                                 "of pose latency). Default 'auto' adapts "
                                 "N to the backlog; 1 disables batching")
            sp.add_argument("--checkpoint", default=None, metavar="CKPT",
                            help="write a volume+tracking checkpoint here "
                                 "after the run (resumable with --resume)")

    cp = sub.add_parser("calibrate")
    cp.add_argument("--folder", required=True)
    cp.add_argument("--pattern", default="9x6")
    cp.add_argument("--square", type=float, default=1.0)
    cp.add_argument("--out", default="stereo_calibration.npz")
    cp.add_argument("--report", default="calibration_report.txt")

    dp = sub.add_parser("depth")
    dp.add_argument("--npz", required=True)
    dp.add_argument("--width", type=int, default=960)
    dp.add_argument("--height", type=int, default=540)
    dp.add_argument("--frames", type=int, default=10)
    dp.add_argument("--out", default="depth_out")

    ip = sub.add_parser("inspect")
    ip.add_argument("--npz", required=True)

    sub.add_parser("doctor")

    args = parser.parse_args(argv)

    if args.cmd == "doctor":
        return _cmd_doctor()

    if args.cmd == "inspect":
        from recon3d_tpu.calib import npz as _npz

        print(_npz.describe(args.npz))
        return 0

    if args.cmd == "calibrate":
        from recon3d_tpu.calib.api import calibrate_from_folder

        nx, ny = (int(v) for v in args.pattern.split("x"))
        params, info = calibrate_from_folder(
            args.folder, pattern_size=(nx, ny), square_size=args.square,
            save_path=args.out, report_path=args.report)
        print(f"calibrated {len(info['pairs_used'])} pairs; "
              f"rms L/R {info['rms_left']:.4f}/{info['rms_right']:.4f}; "
              f"baseline {params.baseline:.4f}; saved {args.out}")
        return 0

    if args.cmd == "depth":
        import jax.numpy as jnp

        from recon3d_tpu.camera.fake import FakeStereoCamera
        from recon3d_tpu.depth.pipeline import DepthPipeline
        from recon3d_tpu.utils import io as _io

        pipe = DepthPipeline.from_npz(args.npz, (args.width, args.height))
        cam = FakeStereoCamera(width=args.width, height=args.height,
                               focal=float(np.asarray(pipe.params.P1)[0, 0]),
                               baseline=abs(pipe.params.baseline) or 0.06,
                               n_frames=args.frames)
        cam.open()

        os.makedirs(args.out, exist_ok=True)
        n = 0
        while True:
            f = cam.grab()
            if f is None:
                break
            disp, depth, vis = pipe.process(f[0], f[1])
            _io.write_color(os.path.join(args.out, f"disp_{n:04d}.png"),
                            np.asarray(vis * 255, np.uint8))
            n += 1
        print(f"processed {n} frames -> {args.out}")
        return 0

    cfg = dataclass_from_args(ScannerConfig, args)
    cam = _make_camera(args)
    intr = _intrinsics(args)

    if args.cmd == "scan":
        from recon3d_tpu.pipeline.scanner import StreamingScanner

        cam.open()
        sc = StreamingScanner(cam, intr, cfg)
        sc.start(max_frames=args.frames)
        sc._thread.join()
        sc.stop()
        mesh, dens, paths = sc.finalize(
            output_prefix=f"{cfg.output_dir}/captured_data_on_the_fly")
        print(f"scan complete: {sc.frames} frames -> {paths}")
        return 0

    if args.cmd == "offline":
        from recon3d_tpu.pipeline.offline import Scanner3D

        sc = Scanner3D(cam, intr, cfg)
        path = sc.run(n_frames=args.frames)
        print(f"offline pipeline complete -> {path}")
        return 0

    if args.cmd == "fuse":
        from recon3d_tpu.pipeline.streaming import StreamingFusion

        import time

        bank = None
        if args.depth_filters:
            from recon3d_tpu.depth.filters import DepthFilterBank

            bank = DepthFilterBank(decimation=0, hole_fill="left")
        sf = StreamingFusion(cam, intr, cfg,
                             resolution=cfg.fusion.grid_resolution,
                             depth_filters=bank,
                             consume_batch=args.consume_batch)
        skip = 0
        if args.resume:
            sf.restore_checkpoint(args.resume)
            print(f"resumed at frame {sf.frames_integrated} from {args.resume}")
            # replay/synthetic streams restart at frame 0 on open: skip the
            # already-integrated prefix so resumed fusion continues the scan
            # instead of re-registering old frames against the restored
            # keyframe (a live camera's stream has moved on by itself)
            if args.camera in ("replay", "synthetic"):
                skip = sf.frames_integrated
                if args.camera == "synthetic":
                    # the synthetic stream is n_frames long; extend it so
                    # the skipped prefix + the requested new frames fit
                    from recon3d_tpu.camera.fake import SyntheticRGBDCamera

                    sf.camera = cam = SyntheticRGBDCamera(
                        n_frames=skip + args.frames)
        sf.start(skip_frames=skip, max_frames=args.frames)
        # wait for the threads, with two escapes so a wedged fusion thread
        # (e.g. a device hang) can't block the CLI forever: the frame
        # target being reached, and a no-progress stall deadline
        last_n, last_t = -1, time.monotonic()
        while any(t.is_alive() for t in sf._threads):
            n = sf.frames_integrated
            if args.frames is not None and n >= args.frames:
                break
            if n != last_n:
                last_n, last_t = n, time.monotonic()
            elif time.monotonic() - last_t > 600.0:
                print("fusion made no progress for 600 s; stopping",
                      file=sys.stderr)
                break
            time.sleep(0.25)
        sf.stop()
        if args.checkpoint:
            print(f"checkpoint -> {sf.save_checkpoint(args.checkpoint)}")
        mesh = sf.extract_mesh()
        from recon3d_tpu.utils import io as _io


        os.makedirs(cfg.output_dir, exist_ok=True)
        out = os.path.join(cfg.output_dir, "fused_mesh.ply")
        _io.write_triangle_mesh(out, mesh)
        print(f"fused {sf.frames_integrated} frames "
              f"({sf.odometry_failures} odometry failures) -> {out}")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
