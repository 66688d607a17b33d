"""Measure streaming capture->fuse fps on the real chip (bench.py's window)."""
import time

import jax
import jax.numpy as jnp

from recon3d_tpu.camera.fake import FakeRGBDCamera
from recon3d_tpu.config import ScannerConfig
from recon3d_tpu.pipeline.streaming import StreamingFusion
from recon3d_tpu.utils.types import CameraIntrinsics


def main():
    print("devices:", jax.devices())
    s_cam = FakeRGBDCamera("/root/reference/test/output", loop=True)
    s_cam.open()
    s_cam.wait_prefetched()
    print("replay prefetched", flush=True)
    s_intr = CameraIntrinsics(
        fx=jnp.float32(616.63), fy=jnp.float32(616.31),
        cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    sf = StreamingFusion(s_cam, s_intr, ScannerConfig(), resolution=256)
    w_cam = FakeRGBDCamera("/root/reference/test/output", prefetch=False)
    w_cam.open()
    w_c, w_d = w_cam.grab()
    w_cam.close()
    sf.warmup(w_c, w_d)
    sf.start()
    deadline = time.perf_counter() + 600.0
    while sf.frames_integrated < 17 and time.perf_counter() < deadline:
        time.sleep(0.1)
    n0, t0 = sf.frames_integrated, time.perf_counter()
    c0 = sf.frames_captured
    while (sf.frames_integrated < n0 + 90
           and time.perf_counter() < t0 + 30.0):
        time.sleep(0.05)
    n1, t1 = sf.frames_integrated, time.perf_counter()
    c1 = sf.frames_captured
    sf.stop()
    print("streaming_fps:", round((n1 - n0) / (t1 - t0), 2))
    print("capture_fps:", round((c1 - c0) / (t1 - t0), 2))


if __name__ == "__main__":
    main()
