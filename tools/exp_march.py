"""Micro-profile _slab_tris pieces on the TPU: where does a slab march
spend its time, and is the argsort compaction the bottleneck? Also probes
a cumsum+scatter compaction variant that avoids the lane argsort."""
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
from recon3d_tpu.fusion import marching as M
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.utils.types import CameraIntrinsics


def t(fn, *a, n=10):
    r = fn(*a)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _i in range(n):
        r = fn(*a)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    intr = CameraIntrinsics(fx=jnp.float32(616.63), fy=jnp.float32(616.31),
                            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    cam = FakeRGBDCamera("/root/reference/test/output", prefetch=False)
    cam.open()
    _, d = cam.grab()
    cam.close()
    vol = _tsdf.make_volume(256, voxel_size=0.004, sdf_trunc=0.02,
                            origin=(-0.5, -0.5, 1.0), with_color=False)
    vol = _tsdf.integrate(vol, jnp.asarray(d), intr,
                          jnp.eye(4, dtype=jnp.float32))

    slab, cap, wmin = 8, 16385, 1.0

    one = jax.jit(lambda v, z0: M._slab_tris(v, z0, z0, slab, cap, wmin)[0])
    ms1 = t(one, vol, jnp.int32(96))
    print(f"_slab_tris, 1 slab          : {ms1:8.1f} ms", flush=True)

    k8 = jax.jit(lambda v, z0s: jax.vmap(
        lambda z: M._slab_tris(v, z, z, slab, cap, wmin)[0])(z0s))
    ms8 = t(k8, vol, jnp.arange(88, 152, 8, dtype=jnp.int32))
    print(f"_slab_tris, vmap 8 slabs    : {ms8:8.1f} ms", flush=True)

    # validity+argsort only (no geometry)
    def val_sort(v, z0):
        tw = jax.lax.dynamic_slice_in_dim(v.tsdf, z0, slab + 1, axis=2)
        ww = jax.lax.dynamic_slice_in_dim(v.weight, z0, slab + 1, axis=2)
        R = v.resolution
        X = Y = R - 1
        Z = slab
        vals = jnp.stack([
            tw[(c & 1):(c & 1) + X, ((c >> 1) & 1):((c >> 1) & 1) + Y,
               ((c >> 2) & 1):((c >> 2) & 1) + Z] for c in range(8)], -1)
        wok = None
        for c in range(8):
            wc = ww[(c & 1):(c & 1) + X, ((c >> 1) & 1):((c >> 1) & 1) + Y,
                    ((c >> 2) & 1):((c >> 2) & 1) + Z] >= wmin
            wok = wc if wok is None else (wok & wc)
        val = M._tet_validity(vals, wok).reshape(X * Y, Z * 12)
        order = jnp.argsort(~val, axis=1, stable=True)
        return order

    ms_vs = t(jax.jit(val_sort), vol, jnp.int32(96))
    print(f"validity + lane argsort     : {ms_vs:8.1f} ms", flush=True)

    # validity only
    def val_only(v, z0):
        tw = jax.lax.dynamic_slice_in_dim(v.tsdf, z0, slab + 1, axis=2)
        ww = jax.lax.dynamic_slice_in_dim(v.weight, z0, slab + 1, axis=2)
        R = v.resolution
        X = Y = R - 1
        Z = slab
        vals = jnp.stack([
            tw[(c & 1):(c & 1) + X, ((c >> 1) & 1):((c >> 1) & 1) + Y,
               ((c >> 2) & 1):((c >> 2) & 1) + Z] for c in range(8)], -1)
        wok = None
        for c in range(8):
            wc = ww[(c & 1):(c & 1) + X, ((c >> 1) & 1):((c >> 1) & 1) + Y,
                    ((c >> 2) & 1):((c >> 2) & 1) + Z] >= wmin
            wok = wc if wok is None else (wok & wc)
        return M._tet_validity(vals, wok).reshape(X * Y, Z * 12)

    ms_v = t(jax.jit(val_only), vol, jnp.int32(96))
    print(f"validity only               : {ms_v:8.1f} ms", flush=True)

    # cumsum+scatter compaction instead of argsort: same candidate order
    def val_cumsum(v, z0):
        val = val_only(v, z0)
        G, K = val.shape
        pos = jnp.cumsum(val, axis=1) - 1          # (G, K) slot in row
        tgt = jnp.where(val, pos, K)
        order = jnp.full((G, K), K, jnp.int32).at[
            jnp.arange(G)[:, None], tgt].set(
            jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (G, K)),
            mode="drop")
        return order

    ms_cs = t(jax.jit(val_cumsum), vol, jnp.int32(96))
    print(f"validity + cumsum compaction: {ms_cs:8.1f} ms", flush=True)

    soup = jax.jit(lambda v: M.extract_triangle_soup(v)[0])
    ms_soup = t(soup, vol, n=3)
    print(f"extract_triangle_soup (32)  : {ms_soup:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
