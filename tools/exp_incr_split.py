"""Split the localized re-mesh into integrate / update / emit on the TPU
(the bench's mesh_extract_incremental_ms times ONLY mesh_device)."""
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

from recon3d_tpu.camera.fake import FakeRGBDCamera
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.fusion.incremental import IncrementalMesher
from recon3d_tpu.utils.types import CameraIntrinsics


def main():
    print("devices:", jax.devices(), flush=True)
    intr = CameraIntrinsics(fx=jnp.float32(616.63), fy=jnp.float32(616.31),
                            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    cam = FakeRGBDCamera("/root/reference/test/output", prefetch=False)
    cam.open()
    _, d = cam.grab()
    cam.close()
    d = jnp.asarray(d)

    im = IncrementalMesher(resolution=256)
    vol = _tsdf.make_volume(256, voxel_size=0.004, sdf_trunc=0.02,
                            origin=(-0.5, -0.5, 1.0), with_color=False)
    eye = jnp.eye(4, dtype=jnp.float32)
    for _ in range(3):
        vol = im.integrate(vol, d, intr, eye)
    m = im.mesh_device(vol)
    _ = float(jnp.sum(m.vertices))

    zmid = float(jnp.median(jnp.where(d > 0, d, 1.5)))
    d_loc = jnp.where(jnp.abs(d - zmid) < 0.05, d, 0.0)

    # warm the localized programs
    vol = im.integrate(vol, d_loc, intr, eye)
    m = im.mesh_device(vol)
    _ = float(jnp.sum(m.vertices))

    for trial in range(3):
        t0 = time.perf_counter()
        vol = im.integrate(vol, d_loc, intr, eye)
        _ = float(jnp.sum(vol.tsdf[0, 0]))
        t1 = time.perf_counter()
        k = int(np.asarray(im.cache.dirty).sum())
        im.update(vol)
        _ = float(np.asarray(im.cache.nunres))
        t2 = time.perf_counter()
        m = im._mesh_fn(vol, im.cache)
        _ = float(jnp.sum(m.vertices))
        t3 = time.perf_counter()
        print(f"trial {trial}: integrate {1e3*(t1-t0):7.1f} ms | "
              f"update({k} dirty) {1e3*(t2-t1):7.1f} ms | "
              f"emit {1e3*(t3-t2):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
