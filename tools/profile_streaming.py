#!/usr/bin/env python
"""Per-stage timing of the streaming consumer (odometry + TSDF integrate)
and mesh extraction on the attached TPU — the bench extras' slow spots.

Each candidate is jitted standalone, warmed, then timed with a scalar
round-trip at the end of the loop.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from recon3d_tpu.camera.fake import FakeRGBDCamera
    from recon3d_tpu.fusion import tsdf as _tsdf
    from recon3d_tpu.fusion import marching as _marching
    from recon3d_tpu.registration.odometry import compute_rgbd_odometry
    from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage

    cam = FakeRGBDCamera("/root/reference/test/output")
    cam.open()
    color, depth = cam.grab()
    color2, depth2 = cam.grab()
    dc, dd = jnp.asarray(color), jnp.asarray(depth)
    dc2, dd2 = jnp.asarray(color2), jnp.asarray(depth2)
    intr = CameraIntrinsics(fx=jnp.float32(616.63), fy=jnp.float32(616.31),
                            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    H, W = np.asarray(depth).shape
    print(f"frame {W}x{H}, platform {jax.devices()[0].platform}", flush=True)

    # --- odometry alone
    odo = jax.jit(lambda c1, d1, c2, d2: compute_rgbd_odometry(
        RGBDImage(color=c1, depth=d1), RGBDImage(color=c2, depth=d2),
        intr).transformation)
    timeit("rgbd_odometry 640x480", odo, dc, dd, dc2, dd2)

    # --- integrate alone (256^3, color)
    vol = _tsdf.make_volume(resolution=256)
    eye = jnp.eye(4, dtype=jnp.float32)
    integ = jax.jit(lambda v, d, c: _tsdf._integrate(v, d, intr, eye, color=c))
    timeit("tsdf integrate 256^3 +color", integ, vol, dd, dc)
    integ_nc = jax.jit(lambda v, d: _tsdf._integrate(v, d, intr, eye))
    timeit("tsdf integrate 256^3 no color", integ_nc, vol, dd)

    # --- raw gather costs at 256^3 scale
    N = 256 ** 3
    rng = np.random.RandomState(0)
    vc = jnp.asarray(rng.randint(0, H, N, np.int32).reshape(256, 256, 256))
    uc = jnp.asarray(rng.randint(0, W, N, np.int32).reshape(256, 256, 256))
    g2d = jax.jit(lambda img, v, u: img[v, u])
    timeit("gather 2d 16.7M from 640x480", g2d, dd, vc, uc)
    gflat = jax.jit(lambda img, v, u: img.ravel()[v * W + u])
    timeit("gather flat 16.7M", gflat, dd, vc, uc)
    gtake = jax.jit(lambda img, v, u: jnp.take(img.ravel(), v * W + u))
    timeit("jnp.take flat 16.7M", gtake, dd, vc, uc)

    # --- mesh extraction pieces
    # build a volume with some surface content first
    vol = integ(vol, dd, dc)
    soup_fn = jax.jit(lambda v: _marching.extract_triangle_soup(v))
    t_soup = timeit("extract_triangle_soup 256^3", soup_fn, vol, iters=2)
    soup, valid, cnt = soup_fn(vol)
    timeit("orient_by_gradient", _marching._orient_by_gradient, vol, soup,
           iters=3)
    t0 = time.perf_counter()
    s_np = np.asarray(soup)
    v_np = np.asarray(valid)
    print(f"{'soup device->host':40s} {(time.perf_counter()-t0)*1e3:9.2f} ms",
          flush=True)
    t0 = time.perf_counter()
    mesh = _marching.weld_mesh(soup, valid, float(vol.voxel_size))
    print(f"{'weld_mesh (device+compact)':40s} {(time.perf_counter()-t0)*1e3:9.2f} ms",
          flush=True)
    print(f"triangles: {int(cnt)}, welded verts: {mesh.vertices.shape[0]}")


if __name__ == "__main__":
    main()
