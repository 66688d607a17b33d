#!/usr/bin/env python
"""Pre-compile the bench + streaming device programs into .jax_cache.

Run this once on the target backend (the real chip for bench warming, or
CPU for the test-suite programs) after kernel changes; it compiles the
exact programs bench.py executes — build_headline() is imported from
bench.py, so the jit cache keys match by construction — and reports
persistent-cache HIT/MISS/WRITE counts so a broken cache is loud instead
of silently re-compiling every run (rounds 1-2 ran with the cache
disabled: sitecustomize imports jax before bench.py could set
JAX_COMPILATION_CACHE_DIR, see bench._enable_compile_cache).

Usage:
    python tools/warm_cache.py [--streaming] [--verbose]

The second run of this script should report 0 misses for the headline.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _CacheStats(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.miss = 0
        self.hit = 0
        self.wrote = 0
        self.disabled = 0

    def emit(self, record):
        msg = record.getMessage()
        if "CACHE MISS" in msg and "PERSISTENT" in msg:
            self.miss += 1
        elif "Persistent compilation cache hit" in msg:
            self.hit += 1
        elif "Writing " in msg and "cache" in msg:
            self.wrote += 1
        elif "disabled/not initialized" in msg:
            self.disabled += 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streaming", action="store_true",
                    help="also warm the streaming fusion consumer programs")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    stats = _CacheStats()
    for name in ("jax._src.compiler", "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(stats)
    if args.verbose:
        logging.basicConfig(level=logging.DEBUG)

    import bench

    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})",
          flush=True)

    t0 = time.perf_counter()
    frame, fargs, scene = bench.build_headline()
    out = frame(*fargs)
    _ = float(out[-1])
    print(f"headline frame program ready in {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    roof = bench.roofline(scene, 0.0)  # compiles the per-stage programs
    print(f"roofline stage programs ready in {time.perf_counter() - t0:.1f}s "
          f"({roof['stage_sum_ms']} ms summed)", flush=True)

    if args.streaming:
        from recon3d_tpu.camera.fake import FakeRGBDCamera
        from recon3d_tpu.config import ScannerConfig
        from recon3d_tpu.fusion import marching
        from recon3d_tpu.pipeline.streaming import StreamingFusion
        from recon3d_tpu.utils.types import CameraIntrinsics

        t0 = time.perf_counter()
        cam = FakeRGBDCamera("/root/reference/test/output")
        cam.open()
        color, depth = cam.grab()
        cam.close()
        intr = CameraIntrinsics(
            fx=jnp.float32(616.63), fy=jnp.float32(616.31),
            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
        sf = StreamingFusion(None, intr, ScannerConfig(), resolution=256)
        sf.warmup(color, depth)
        # mesh extraction on the (empty) volume: compiles the soup scan +
        # weld programs the bench times
        mesh = marching.extract_triangle_mesh(sf.volume)
        jax.block_until_ready(mesh.vertices)
        # incremental mesher programs (bench's mesh_extract_incremental /
        # full_device extras): integrate-with-dirty, K-batch update, emit
        from recon3d_tpu.fusion.incremental import IncrementalMesher

        im = IncrementalMesher(resolution=256)
        vol = im.integrate(sf.volume, jnp.asarray(depth), intr,
                           jnp.eye(4, dtype=jnp.float32))
        m = im.mesh_device(vol)
        jax.block_until_ready(m.vertices)
        print(f"streaming consumer + mesh extract + incremental mesher "
              f"ready in {time.perf_counter() - t0:.1f}s", flush=True)

    print(f"persistent cache: {stats.miss} misses, {stats.hit} hits, "
          f"{stats.wrote} writes, {stats.disabled} disabled-lookups",
          flush=True)
    if stats.disabled:
        print("ERROR: persistent cache is disabled — compile time is being "
              "thrown away", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
