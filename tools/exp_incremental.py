#!/usr/bin/env python
"""Measure the live-remesh numbers on the chip: full cached extract vs
incremental re-mesh after a localized frame (mirrors bench.py's stanza).

Usage: python tools/exp_incremental.py [--res 256]
"""
import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from recon3d_tpu.camera.fake import SyntheticRGBDCamera  # noqa: E402
from recon3d_tpu.fusion import tsdf as _tsdf  # noqa: E402
from recon3d_tpu.fusion.incremental import IncrementalMesher  # noqa: E402
from recon3d_tpu.utils.types import CameraIntrinsics  # noqa: E402


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    cam = SyntheticRGBDCamera(width=640, height=480, n_frames=4)
    cam.open()
    intr = CameraIntrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    c, d = cam.grab()
    dd = jax.device_put(jnp.asarray(d))
    dc = jax.device_put(jnp.asarray(c))

    vol = _tsdf.make_volume(resolution=args.res, voxel_size=0.008,
                            sdf_trunc=0.04, origin=(-1.0, -1.0, 0.5))
    vol = _tsdf.integrate(vol, dd, intr, jnp.eye(4), color=dc)
    sync(vol.tsdf)

    im = IncrementalMesher(resolution=args.res)
    m0 = im.mesh_device(vol)
    sync(m0.vertices)
    t0 = time.perf_counter()
    im.mark_all_dirty()
    m0 = im.mesh_device(vol)
    sync(m0.vertices)
    print(f"full cached extract (all dirty):  "
          f"{(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)

    zmid = float(jnp.median(jnp.where(dd > 0, dd, 1.5)))
    dd_loc = jnp.where(jnp.abs(dd - zmid) < 0.05, dd, 0.0)
    vol = im.integrate(vol, dd_loc, intr, jnp.eye(4, dtype=jnp.float32))
    print(f"dirty slabs after localized frame: "
          f"{int(jnp.sum(im.cache.dirty))}/{im.n_slabs}", flush=True)
    m1 = im.mesh_device(vol)
    sync(m1.vertices)
    vol = im.integrate(vol, dd_loc, intr, jnp.eye(4, dtype=jnp.float32))
    t0 = time.perf_counter()
    m1 = im.mesh_device(vol)
    sync(m1.vertices)
    print(f"incremental re-mesh (localized):  "
          f"{(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)

    # full-frustum frame for comparison (dirties most z-slabs)
    vol = im.integrate(vol, dd, intr, jnp.eye(4, dtype=jnp.float32))
    m2 = im.mesh_device(vol)
    sync(m2.vertices)
    vol = im.integrate(vol, dd, intr, jnp.eye(4, dtype=jnp.float32))
    t0 = time.perf_counter()
    m2 = im.mesh_device(vol)
    sync(m2.vertices)
    print(f"incremental re-mesh (full view):  "
          f"{(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
