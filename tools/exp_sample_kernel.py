#!/usr/bin/env python
"""Round-5 probe: the Pallas projective sampler on the real chip.

Validates bitwise equality vs the XLA gather on a production-config
projection at 256^3 and times both, then times the full integrate step
with the kernel wired in (tsdf._frame_contrib's TPU path).
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
    from recon3d_tpu.fusion import tsdf as T
    from recon3d_tpu.ops.project_sample import sample_images_at
    from recon3d_tpu.utils.types import CameraIntrinsics

    intr = CameraIntrinsics(
        fx=jnp.float32(616.63), fy=jnp.float32(616.31),
        cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    cam = FakeRGBDCamera("/root/reference/test/output")
    cam.open()
    c0, d0 = cam.grab()
    cam.close()
    jc, jd = jnp.asarray(c0), jnp.asarray(d0)

    # production-config projection fields
    R = 256
    vol = T.make_volume(R, origin=(-0.4, -0.5, 1.27))
    idx = jnp.arange(R, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1) * vol.voxel_size + vol.origin
    z = pts[..., 2]
    u = intr.fx * pts[..., 0] / jnp.maximum(z, 1e-9) + intr.cx
    v = intr.fy * pts[..., 1] / jnp.maximum(z, 1e-9) + intr.cy
    vc = jnp.clip(jnp.round(v).astype(jnp.int32), 0, 479)
    uc = jnp.clip(jnp.round(u).astype(jnp.int32), 0, 639)
    cf = jc.astype(jnp.float32) / 255.0
    imgs = jnp.concatenate([jd[None], jnp.moveaxis(cf, -1, 0)], axis=0)

    hb("compiling sampler...")
    out = sample_images_at(vc, uc, imgs)
    _ = float(jnp.sum(out))
    hb("sampler warmed; checking equality vs XLA gather...")
    ref_d = np.asarray(jd)[np.asarray(vc), np.asarray(uc)]
    kd = np.asarray(out[0])
    eq = np.array_equal(kd, ref_d)
    frac = float((kd == ref_d).mean())
    hb(f"depth equality: exact={eq} frac={frac:.6f}")
    if not eq:
        miss = kd != ref_d
        hb(f"  mismatches: {int(miss.sum())} (kernel zeros there: "
           f"{bool((kd[miss] == 0).all())})")

    t0 = time.perf_counter()
    for _i in range(10):
        out = sample_images_at(vc, uc, imgs)
    _ = float(jnp.sum(out))
    hb(f"sampler 4ch 256^3: {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms")

    eye = jnp.eye(4, dtype=jnp.float32)

    def integ():
        vv = T.integrate_donated(jax.tree.map(jnp.copy, vol), jd, intr,
                                 eye, color=jc)
        return vv.weight
    o = integ()
    _ = float(jnp.sum(o))
    t0 = time.perf_counter()
    for _i in range(5):
        o = integ()
    _ = float(jnp.sum(o))
    hb(f"integrate 256^3 kernel path (incl. copy): "
       f"{(time.perf_counter() - t0) / 5 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
