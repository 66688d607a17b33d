#!/usr/bin/env python
"""Round-5 probe: what does the batched track+integrate program really
cost per call, free of threaded-run contamination?

BENCH r5b: threaded streaming 23.5 fps but the device-resident loop
measured 3.4 s per 8-frame batch (2.4 fps) using the same program. One
of those numbers is an artifact; this times B8 calls directly after a
fresh warmup.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hb(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    bench._enable_compile_cache()

    from recon3d_tpu.camera.fake import FakeRGBDCamera
    from recon3d_tpu.config import ScannerConfig
    from recon3d_tpu.pipeline.streaming import StreamingFusion
    from recon3d_tpu.utils.types import CameraIntrinsics

    intr = CameraIntrinsics(
        fx=jnp.float32(616.63), fy=jnp.float32(616.31),
        cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    cam = FakeRGBDCamera("/root/reference/test/output")
    cam.open()
    w_c, w_d = cam.grab()
    sf = StreamingFusion(cam, intr, ScannerConfig(), resolution=256)
    sf.warmup(w_c, w_d)
    hb("warmup done")

    cam._i = 0
    batches = []
    for _b in range(3):
        fr = [cam.grab_raw() for _k in range(8)]
        batches.append((jax.device_put(np.stack([c for c, _ in fr])),
                        jax.device_put(np.stack([d for _, d in fr]))))
    cam.close()

    B8 = sf._step_batches[8]
    # fresh volume + seeded state exactly like a run's frame 0
    sf._fuse_one(jnp.asarray(w_c),
                 jnp.asarray(w_d), ScannerConfig().fusion)
    vol, st = sf.volume, sf._state
    vol, st, wfcs, _h = B8(vol, st, *batches[0])
    _ = float(jnp.sum(wfcs))
    hb("warmed B8 on live state")

    # per-call sync
    times = []
    for i in range(6):
        bc, bd = batches[i % 3]
        t0 = time.perf_counter()
        vol, st, wfcs, _h = B8(vol, st, bc, bd)
        _ = float(jnp.sum(wfcs))
        times.append((time.perf_counter() - t0) * 1e3)
    hb(f"B8 sync/call ms: {[round(t) for t in times]}")

    # queued
    t0 = time.perf_counter()
    n = 12
    for i in range(n):
        bc, bd = batches[i % 3]
        vol, st, wfcs, _h = B8(vol, st, bc, bd)
    _ = float(jnp.sum(wfcs))
    dt = time.perf_counter() - t0
    hb(f"B8 queued x{n}: {dt / n * 1e3:.0f} ms/call = "
       f"{n * 8 / dt:.1f} fps")


if __name__ == "__main__":
    main()
