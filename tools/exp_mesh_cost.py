#!/usr/bin/env python
"""Round-5 probe: decompose the 256^3 mesh-extraction cost regression.

BENCH r5a measured mesh_extract_256 = 3457 ms (r3: 1354) after the r4
4x slab-cap borrow. Times: soup at cap_mult 1 vs 4, weld alone, the
incremental mesher's clean emit / localized update / full rebuild.
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
    from recon3d_tpu.fusion import marching as M
    from recon3d_tpu.fusion.incremental import IncrementalMesher
    from recon3d_tpu.pipeline.streaming import StreamingFusion
    from recon3d_tpu.utils.types import CameraIntrinsics

    intr = CameraIntrinsics(
        fx=jnp.float32(616.63), fy=jnp.float32(616.31),
        cx=jnp.float32(312.58), cy=jnp.float32(242.22))

    # fuse through the streaming consumer's WARMED programs (a fresh
    # tsdf.integrate executable pays the axon first-exec penalty / wedge)
    cam = FakeRGBDCamera("/root/reference/test/output")
    cam.open()
    frames = [cam.grab() for _ in range(17)]
    cam.close()
    sf = StreamingFusion(cam, intr, ScannerConfig(), resolution=256)
    sf.warmup(*frames[0])
    hb("warmup done")
    fcfg = ScannerConfig().fusion
    for c, d in frames:
        sf._fuse_one(jnp.asarray(c), jnp.asarray(d), fcfg)
    vol = sf.volume
    _ = float(jnp.sum(vol.weight))
    hb("volume fused (17 frames)")

    def timeit(label, fn, iters=3):
        out = fn()
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.time()
        for _i in range(iters):
            out = fn()
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        hb(f"{label}: {(time.time() - t0) / iters * 1e3:.0f} ms")
        return out

    for mult in (1, 4):
        soup, val, n, dr = timeit(
            f"soup cap_mult={mult}",
            lambda m=mult: M.extract_triangle_soup(
                vol, with_dropped=True, cap_mult=m))
        hb(f"  count={int(n)} dropped={int(dr)}")

    timeit("extract_triangle_mesh (adaptive)",
           lambda: M.extract_triangle_mesh(vol).vertices)

    im = IncrementalMesher(resolution=256)
    hb(f"mesher cap={im.cap} table_bits={im.table_bits}")
    m0 = timeit("mesher full build (all dirty)", lambda: (
        im.mark_all_dirty(), im.mesh_device(vol))[1].vertices, iters=1)
    timeit("mesher clean emit", lambda: im.mesh_device(vol).vertices)
    # localized update: narrow depth band -> few dirty slabs
    d0 = jnp.asarray(frames[0][1])
    zmid = float(jnp.median(jnp.where(d0 > 0, d0, 1.5)))
    dd_loc = jnp.where(jnp.abs(d0 - zmid) < 0.05, d0, 0.0)
    vol2 = im.integrate(vol, dd_loc, intr, jnp.eye(4, dtype=jnp.float32))
    _ = im.mesh_device(vol2).vertices  # warm partial program
    vol2 = im.integrate(vol2, dd_loc, intr, jnp.eye(4, dtype=jnp.float32))
    nd = int(np.asarray(im.cache.dirty).sum())
    t0 = time.time()
    mv = im.mesh_device(vol2).vertices
    _ = float(jnp.sum(mv))
    hb(f"mesher localized update ({nd} dirty slabs): "
       f"{(time.time() - t0) * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
