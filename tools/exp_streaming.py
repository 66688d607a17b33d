#!/usr/bin/env python
"""Round-5 probe: why did the threaded streaming fps drop to 8?

Decomposes the bench's streaming section: (a) producer-only capture rate
(no fusion), (b) the batched consumer program's device ms/frame, (c) the
full threaded pipeline, printing per-phase heartbeats.
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

    # (a) producer-only: how fast can the replay camera + stacked H2D go?
    cam = FakeRGBDCamera("/root/reference/test/output", loop=True)
    cam.open()
    cam.wait_prefetched()
    hb("replay prefetched")
    t0 = time.time()
    n = 0
    pend = []
    while time.time() - t0 < 5.0:
        c, d = cam.grab()
        pend.append((c, d))
        if len(pend) == 8:
            dc = jax.device_put(np.stack([x for x, _ in pend]))
            dd = jax.device_put(np.stack([x for _, x in pend]))
            pend = []
        n += 1
    _ = float(jnp.sum(dd))
    hb(f"(a) producer-only: {n / (time.time() - t0):.1f} fps")
    cam.close()

    # (b) the batched consumer program in isolation
    cfg = ScannerConfig()
    cam2 = FakeRGBDCamera("/root/reference/test/output")
    cam2.open()
    w_c, w_d = cam2.grab()
    frames = [cam2.grab() for _ in range(8)]
    cam2.close()
    sf = StreamingFusion(None, intr, cfg, resolution=256)
    hb(f"consume_batch resolved to {sf._consume_batch}")
    sf.warmup(w_c, w_d)
    # seed the tracking state (warmup leaves _state None; the batch
    # program dereferences it)
    sf._fuse_one(jnp.asarray(w_c), jnp.asarray(w_d), cfg.fusion)
    hb("warmup done")
    B = 8
    prog = sf._step_batches.get(B) or sf._build_step_batch(cfg.fusion)
    sf._step_batches[B] = prog
    dc = jax.device_put(np.stack([np.asarray(c) for c, _ in frames]))
    dd = jax.device_put(np.stack([np.asarray(d) for _, d in frames]))
    vol, st, wfcs, hits = prog(sf.volume, sf._state, dc, dd)
    _ = float(jnp.sum(wfcs))
    hb("batch program warmed")
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        vol, st, wfcs, hits = prog(vol, st, dc, dd)
    _ = float(jnp.sum(wfcs))
    ms = (time.time() - t0) / (iters * B) * 1e3
    hb(f"(b) batch-8 consumer program: {ms:.1f} ms/frame device")

    # (c) full threaded pipeline, 20 s window
    cam3 = FakeRGBDCamera("/root/reference/test/output", loop=True)
    cam3.open()
    cam3.wait_prefetched()
    sf3 = StreamingFusion(cam3, intr, cfg, resolution=256)
    sf3.warmup(w_c, w_d)
    sf3.start()
    deadline = time.time() + 120.0
    while sf3.frames_integrated < 17 and time.time() < deadline:
        time.sleep(0.1)
    n0, c0, t0 = sf3.frames_integrated, sf3.frames_captured, time.time()
    while time.time() < t0 + 20.0:
        time.sleep(0.1)
    n1, c1, t1 = sf3.frames_integrated, sf3.frames_captured, time.time()
    sf3.stop()
    hb(f"(c) threaded: integrate {(n1 - n0) / (t1 - t0):.1f} fps, "
       f"capture {(c1 - c0) / (t1 - t0):.1f} fps")


if __name__ == "__main__":
    main()
