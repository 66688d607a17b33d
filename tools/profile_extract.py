#!/usr/bin/env python
"""Cost split of extract_triangle_mesh at 256^3 on the attached chip:
soup scan vs orient vs device weld (and the weld's lexsort vs scatter
halves) vs host compaction. Drives the incremental-mesher design.
"""
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

from recon3d_tpu.fusion import marching, tsdf as _tsdf  # noqa: E402


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])[:1]
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])[:1]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out


def main():
    R = 256
    vs = 0.008
    # synthetic scene: sphere + plane, surface area comparable to the
    # golden volume's
    idx = (jnp.arange(R, dtype=jnp.float32) - R / 2) * vs
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    d_sphere = jnp.sqrt(gx**2 + gy**2 + gz**2) - 0.55
    d_plane = gz + 0.9
    sdf = jnp.minimum(d_sphere, d_plane)
    trunc = vs * 4
    vol = _tsdf.make_volume(resolution=R, voxel_size=vs, sdf_trunc=trunc,
                            origin=(-R / 2 * vs,) * 3, with_color=False)
    import dataclasses
    vol = dataclasses.replace(
        vol, tsdf=jnp.clip(sdf / trunc, -1, 1),
        weight=jnp.where(jnp.abs(sdf) < 10 * trunc, 2.0, 0.0))

    soup_fn = jax.jit(lambda v: marching.extract_triangle_soup(v))
    soup, valid, count = timeit("extract_triangle_soup 256^3", soup_fn, vol)
    print(f"  triangles: {int(count)} / cap {soup.shape[0]}")

    timeit("orient_by_gradient", marching._orient_by_gradient, vol, soup)

    verts = soup.reshape(-1, 3)
    vvalid = jnp.repeat(valid, 3)
    quant = jnp.float32(vs / 256.0)
    timeit("weld_device (lexsort+scatter)", marching._weld_device,
           verts, vvalid, quant)

    # weld sub-parts
    @jax.jit
    def lexsort_part(verts, vvalid, quant):
        vmin = jnp.min(jnp.where(vvalid[:, None], verts,
                                 jnp.float32(3.4e38)), axis=0)
        q = jnp.round((verts - vmin) / quant).astype(jnp.int32)
        big = jnp.iinfo(jnp.int32).max
        q = jnp.where(vvalid[:, None], q, big)
        perm = jnp.lexsort((q[:, 2], q[:, 1], q[:, 0]))
        return perm

    timeit("  lexsort alone", lexsort_part, verts, vvalid, quant)

    @jax.jit
    def scatter_part(verts, vvalid, inv):
        n = verts.shape[0]
        tgt = jnp.where(vvalid, inv, n)
        vs_ = jnp.zeros((n, 3), jnp.float32).at[tgt].add(
            jnp.where(vvalid[:, None], verts, 0.0), mode="drop")
        vc = jnp.zeros((n,), jnp.int32).at[tgt].add(1, mode="drop")
        return vs_, vc

    inv = jnp.zeros((verts.shape[0],), jnp.int32)
    timeit("  scatter-add alone", scatter_part, verts, vvalid, inv)

    t0 = time.perf_counter()
    mesh = marching.weld_mesh(soup, valid, vs)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{'weld_mesh full (device+host)':44s} {dt:9.2f} ms")
    print(f"  welded vertices: {mesh.vertices.shape[0]}, "
          f"faces {mesh.triangles.shape[0]}")

    t0 = time.perf_counter()
    mesh = marching.extract_triangle_mesh(vol)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{'extract_triangle_mesh total':44s} {dt:9.2f} ms")


if __name__ == "__main__":
    main()
