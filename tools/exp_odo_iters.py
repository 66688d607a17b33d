#!/usr/bin/env python
"""Round-5 probe: odometry cost/accuracy vs finest-level GN iterations.

The streaming consumer's odometry is 63.5 ms of the 173 ms step. Each
frame warm-starts from the previous relative pose (state.rel_init), so
the finest level may converge in far fewer than 10 iterations. Times
(10,10,10) vs trimmed schedules on the chip and scores pose error vs
ground truth on the synthetic camera with warm starts.
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

    from recon3d_tpu.camera.fake import SyntheticRGBDCamera
    from recon3d_tpu.registration.odometry import compute_rgbd_odometry
    from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage

    W, H = 640, 480
    cam = SyntheticRGBDCamera(width=W, height=H, fx=525.0, fy=525.0,
                              n_frames=8, step=0.012)
    cam.open()
    frames = [cam.grab() for _ in range(8)]
    intr = CameraIntrinsics(fx=jnp.float32(525.0), fy=jnp.float32(525.0),
                            cx=jnp.float32(W / 2 - 0.5),
                            cy=jnp.float32(H / 2 - 0.5))

    for iters in ((10, 10, 10), (4, 10, 10), (3, 7, 10), (2, 5, 8)):
        fn = jax.jit(lambda kc, kd, cc, cd, init, it=iters:
                     compute_rgbd_odometry(
                         RGBDImage(color=kc, depth=kd),
                         RGBDImage(color=cc, depth=cd), intr,
                         init=init, iterations=it).transformation)
        # accuracy: track consecutive frames with warm starts
        errs = []
        init = jnp.eye(4, dtype=jnp.float32)
        for k in range(1, 8):
            kc, kd = frames[k - 1]
            cc, cd = frames[k]
            T = fn(jnp.asarray(kc), jnp.asarray(kd),
                   jnp.asarray(cc), jnp.asarray(cd), init)
            true_rel = np.linalg.inv(cam.true_pose(k)) @ cam.true_pose(k - 1)
            err = np.abs(np.asarray(T) - true_rel.astype(np.float32)).max()
            errs.append(err)
            init = T
        # timing (warm, queued)
        kc, kd = frames[0]
        cc, cd = frames[1]
        a = (jnp.asarray(kc), jnp.asarray(kd), jnp.asarray(cc),
             jnp.asarray(cd), jnp.eye(4, dtype=jnp.float32))
        T = fn(*a)
        _ = float(jnp.sum(T))
        t0 = time.perf_counter()
        for _i in range(20):
            T = fn(*a)
        _ = float(jnp.sum(T))
        ms = (time.perf_counter() - t0) / 20 * 1e3
        hb(f"iters={iters}: {ms:.1f} ms, max pose err {max(errs):.2e}, "
           f"mean {np.mean(errs):.2e}")


if __name__ == "__main__":
    main()
