#!/usr/bin/env python
"""Stage split of the 10M-point normals path on the attached chip:
sort_cells / packed binning / point_slot inverse / Pallas moments+eig
kernel / readback. Drives the normals_10m_ms < 1 s work.

Usage: python tools/profile_normals.py [--n 10000000] [--grid 128]
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

from recon3d_tpu.ops import grid_knn as gk  # noqa: E402
from recon3d_tpu.ops import grid_knn_pallas as gkp  # noqa: E402


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:1]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0][:1]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--cap", type=int, default=16)
    ap.add_argument("--radius", type=float, default=0.008)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.rand(args.n, 3).astype(np.float32))
    valid = jnp.ones((args.n,), bool)
    G, C, r = args.grid, args.cap, args.radius
    gz = gk._lane_stride(G)
    print(f"N={args.n} G={G} C={C} gz={gz}", flush=True)

    sort_fn = jax.jit(lambda p, v: gk._sort_cells(p, v, r, G, C, gz=gz))
    sc, sp, order, start, ok, rank, overflow = timeit(
        "sort_cells (sort + start table)", sort_fn, p, valid)
    print(f"  overflow: {float(overflow):.4f}")

    slot_fn = jax.jit(lambda: gk._point_slot_from_sorted(sc, order, ok,
                                                         rank, C))
    timeit("point_slot inverse sort", slot_fn)

    def pack_only(sc, sp, order, start, ok, rank):
        N = p.shape[0]
        n_cells = G * G * gz
        GG = G * gz
        st3 = start[:n_cells].reshape(G, 1, GG)
        pos = st3 + jnp.arange(C, dtype=jnp.int32).reshape(1, C, 1)
        nxt = start[1:n_cells + 1].reshape(G, 1, GG)
        occ = pos < nxt
        pos = jnp.minimum(pos, N - 1)
        rows = jnp.where(occ[..., None], sp[pos], 0.0)
        coords = jnp.moveaxis(rows, -1, 1).reshape(G, 3 * C, GG)
        return jnp.concatenate([coords, occ.astype(jnp.float32)], axis=1)

    pk = timeit("packed table gather", jax.jit(pack_only),
                sc, sp, order, start, ok, rank)

    kern = jax.jit(lambda pk: gkp.normals_pallas_core(
        pk, r * r, G, C, gz=gz))
    out = timeit("pallas moments+eig kernel", kern, pk)

    full = jax.jit(lambda p, v: gkp.grid_pca_moments_pallas(
        p, v, r, G, C))
    timeit("grid_pca_moments_pallas full", full, p, valid)

    from recon3d_tpu.pointcloud.normals import _normals_only
    nf = jax.jit(lambda p, v: _normals_only(p, v, r, 30, G, C))
    timeit("estimate_normals end-to-end", nf, p, valid)


if __name__ == "__main__":
    main()
