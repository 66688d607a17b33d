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


def _compile_bench_programs(bench, scene) -> int:
    """Compile-only warm of every standalone program bench.py executes
    besides the fused frame: the roofline stage programs and the two
    accuracy/cross-check SGM configurations. Shapes only — nothing runs."""
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.depth import sgm_pallas

    n = 0
    for name, fn, fargs in bench.roofline_programs(scene):
        t0 = time.perf_counter()
        fn.lower(*fargs).compile()
        print(f"  {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        n += 1
    W, H, D = scene["W"], scene["H"], scene["D"]
    img = jax.ShapeDtypeStruct((H, W), jnp.float32)
    for kw in (
        # accuracy parity + mode-matched cross-check (sgm3 defaults)
        dict(num_disparities=D, block_size=5, num_directions=3),
        # production-config cross-check (ours_match ndir=4, P2x3)
        dict(num_disparities=D, block_size=5, num_directions=4,
             p2=96.0 * 25.0),
    ):
        t0 = time.perf_counter()
        sgm_pallas.sgm_disparity_pallas.lower(img, img, **kw).compile()
        print(f"  sgm_disparity_pallas {kw.get('num_directions')}dir: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        n += 1
    return n


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

    # COMPILE-ONLY warming: the persistent cache is written at compile
    # time, and a later process that HITS the cache pays neither the
    # compile nor the axon platform's first-execution penalty (~2 min per
    # fresh executable, measured in tools/exp_coldcache.py round 5 —
    # first exec 116 s even for the 2-kernel remap program, 145 s for the
    # fused frame; a cache-hit run recorded compile_s=6.6 TOTAL in
    # BENCH_r03). Executing here would cost this process ~2 min per
    # program and buy nothing for the cache.
    t0 = time.perf_counter()
    frame, fargs, scene = bench.build_headline()
    frame.lower(*fargs).compile()
    print(f"headline frame program compiled in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    n = _compile_bench_programs(bench, scene)
    print(f"{n} bench stage/accuracy programs compiled in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

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
        intr = CameraIntrinsics(
            fx=jnp.float32(616.63), fy=jnp.float32(616.31),
            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
        # constructed WITH the camera so warmup compiles the u16-wire
        # step/batch programs the producer actually ships (bench's
        # isolation extras run the same wire format)
        sf = StreamingFusion(cam, intr, ScannerConfig(), resolution=256)
        sf.warmup(color, depth)
        sf.camera = None
        cam.close()
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
        # localized close-object update: compiles the small-cap refresh
        # variants (K=1/2) bench's mesh_extract_incremental extra times
        import numpy as _np
        h, w = _np.asarray(depth).shape
        yy, xx = _np.mgrid[0:h, 0:w]
        disc = ((yy - h // 2) ** 2 + (xx - w // 2) ** 2) < 40 ** 2
        blob = jnp.asarray(_np.where(disc, 1.0, 0.0).astype(_np.float32))
        vol = im.integrate(vol, blob, intr, jnp.eye(4, dtype=jnp.float32))
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
