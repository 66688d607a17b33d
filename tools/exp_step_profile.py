#!/usr/bin/env python
"""Round-5 probe: decompose the 427 ms/frame fused odometry+integrate
step (the REAL streaming consumer cost — the threaded fps was counting
dispatches). Times odometry alone, integrate alone, and the integrate's
suspected pole (the (R^3)-element depth gather in _frame_contrib)."""
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
    from recon3d_tpu.fusion import tsdf as T
    from recon3d_tpu.registration.odometry import compute_rgbd_odometry
    from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage

    intr = CameraIntrinsics(
        fx=jnp.float32(616.63), fy=jnp.float32(616.31),
        cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    cam = FakeRGBDCamera("/root/reference/test/output")
    cam.open()
    c0, d0 = cam.grab()
    c1, d1 = cam.grab()
    cam.close()
    jc0, jd0 = jnp.asarray(c0), jnp.asarray(d0)
    jc1, jd1 = jnp.asarray(c1), jnp.asarray(d1)

    def timeit(label, fn, iters=10):
        out = fn()
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        hb(f"{label}: {(time.perf_counter() - t0) / iters * 1e3:.1f} ms")

    odo = jax.jit(lambda kc, kd, cc, cd: compute_rgbd_odometry(
        RGBDImage(color=kc, depth=kd), RGBDImage(color=cc, depth=cd),
        intr).transformation)
    timeit("odometry (3-level, jit)",
           lambda: odo(jc0, jd0, jc1, jd1))

    vol = T.make_volume(256, origin=(-0.4, -0.5, 1.27))
    eye = jnp.eye(4, dtype=jnp.float32)

    def integ():
        v = T.integrate_donated(jax.tree.map(jnp.copy, vol), jd0, intr,
                                eye, color=jc0)
        return v.weight
    timeit("integrate 256^3 (incl. volume copy)", integ, iters=5)

    # the gather alone: project all voxels, sample depth
    @jax.jit
    def gather_only(depth):
        R = 256
        idx = jnp.arange(R, dtype=jnp.float32)
        gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
        pts = jnp.stack([gx, gy, gz], -1) * vol.voxel_size + vol.origin
        z = pts[..., 2]
        u = intr.fx * pts[..., 0] / jnp.maximum(z, 1e-9) + intr.cx
        v = intr.fy * pts[..., 1] / jnp.maximum(z, 1e-9) + intr.cy
        vc = jnp.clip(jnp.round(v).astype(jnp.int32), 0, 479)
        uc = jnp.clip(jnp.round(u).astype(jnp.int32), 0, 639)
        return jnp.sum(depth[vc, uc])
    timeit("depth[vc,uc] gather over 256^3", lambda: gather_only(jd0),
           iters=5)

    # elementwise-only twin (no gather): bounds the rest of the math
    @jax.jit
    def no_gather(depth):
        R = 256
        idx = jnp.arange(R, dtype=jnp.float32)
        gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
        pts = jnp.stack([gx, gy, gz], -1) * vol.voxel_size + vol.origin
        z = pts[..., 2]
        u = intr.fx * pts[..., 0] / jnp.maximum(z, 1e-9) + intr.cx
        v = intr.fy * pts[..., 1] / jnp.maximum(z, 1e-9) + intr.cy
        return jnp.sum(u) + jnp.sum(v)
    timeit("projection math only (no gather)", lambda: no_gather(jd0),
           iters=5)


if __name__ == "__main__":
    main()
