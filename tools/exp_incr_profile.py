"""Profile the incremental mesher's batched dirty-slab refresh on the
attached TPU: integrate / update(k dirty slabs) / update(0) / update(all)
/ mesh emit / plain full extract, each timed separately."""
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
from recon3d_tpu.fusion import marching as _marching
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.fusion.incremental import IncrementalMesher
from recon3d_tpu.utils.types import CameraIntrinsics


def t(fn, n=5):
    r = fn()  # warm
    jax.block_until_ready(r)
    _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _ = float(jnp.sum(r))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    intr = CameraIntrinsics(fx=jnp.float32(616.63), fy=jnp.float32(616.31),
                            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    cam = FakeRGBDCamera("/root/reference/test/output", prefetch=False)
    cam.open()
    c, d = cam.grab()
    cam.close()
    d = jnp.asarray(d)

    im = IncrementalMesher(resolution=256)
    print("n_slabs", im.n_slabs, "cap", im.cap, "table_bits", im.table_bits,
          "batch_k", im.batch_k, flush=True)
    vol = _tsdf.make_volume(256, voxel_size=0.004, sdf_trunc=0.02,
                            origin=(-0.5, -0.5, 1.0), with_color=False)
    eye = jnp.eye(4, dtype=jnp.float32)
    t0 = time.perf_counter()
    for _ in range(3):
        vol = im.integrate(vol, d, intr, eye)
    _ = float(jnp.sum(vol.tsdf))
    print(f"3 integrates (incl compile): {time.perf_counter()-t0:6.1f} s",
          flush=True)

    # full build
    t0 = time.perf_counter()
    m = im.mesh_device(vol)
    _ = float(jnp.sum(m.vertices))
    print(f"first full mesh_device (incl compile): "
          f"{time.perf_counter()-t0:6.1f} s", flush=True)

    # clean-cache re-mesh (nothing dirty): the docstring's "~ms" claim
    ms_clean = t(lambda: im.mesh_device(vol).vertices)
    print(f"mesh_device, clean cache  : {ms_clean:8.1f} ms", flush=True)

    # localized band like bench (holder: integrate donates the volume)
    zmid = float(jnp.median(jnp.where(d > 0, d, 1.5)))
    d_loc = jnp.where(jnp.abs(d - zmid) < 0.05, d, 0.0)
    hold = [im.integrate(vol, d_loc, intr, eye)]
    k = int(np.asarray(im.cache.dirty).sum())
    print("localized dirty slabs:", k, "of", im.n_slabs, flush=True)

    def loc_remesh():
        hold[0] = im.integrate(hold[0], d_loc, intr, eye)
        return im.mesh_device(hold[0]).vertices

    ms_loc = t(loc_remesh, n=5)
    print(f"integrate+remesh, localized: {ms_loc:8.1f} ms", flush=True)

    # all-dirty rebuild through the mesher
    def rebuild():
        im.mark_all_dirty()
        return im.mesh_device(hold[0]).vertices

    ms_all = t(rebuild, n=3)
    print(f"full rebuild via mesher   : {ms_all:8.1f} ms", flush=True)

    # plain full extract for reference
    ms_full = t(lambda: _marching.extract_triangle_mesh(hold[0]).vertices,
                n=3)
    print(f"plain full extract        : {ms_full:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
