#!/usr/bin/env python
"""Experiment: per-point readback variants from the packed kernel output.

The 10M normals end-to-end carries ~300 ms beyond the named stages; the
suspect is the readback (3 flat channel gathers at 10M offsets each from
the (G, 4C, GG) kernel output). Variants:

  a) current: 3 flat channel gathers (30M offsets)
  b) slot-major transpose + one (1, 4) row gather (10M offsets)
  c) slot-major transpose + one (1, 128-padded?) no — keep (1, 4)

Usage: python tools/exp_readback.py [--n 10000000] [--grid 128]
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


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:1]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0][:1]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
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
    n_cells = G * G * gz
    GG = G * gz
    print(f"N={args.n} G={G} C={C} gz={gz}", flush=True)

    sort_fn = jax.jit(lambda p, v: gk._sort_cells(p, v, r, G, C, gz=gz))
    sc, _sp, order, start, ok, rank, _ovf = sort_fn(p, valid)
    point_slot = jax.jit(
        lambda: gk._point_slot_from_sorted(sc, order, ok, rank, C))()
    _ = float(jnp.sum(point_slot[:1]))
    out = jnp.asarray(rng.rand(G, 4 * C, GG).astype(np.float32))

    def rb_flat(out, point_slot):
        out_f = out.reshape(-1)
        slot = jnp.maximum(point_slot, 0)
        has = point_slot >= 0
        cell = slot // C
        c = slot % C
        x = cell // GG
        g = cell % GG

        def chan(j):
            return out_f[((x * 4 + j) * C + c) * GG + g]

        v = jnp.stack([chan(0), chan(1), chan(2)], -1)
        return jnp.where(has[:, None], v, 0.0)

    def rb_rowmajor(out, point_slot):
        om = jnp.transpose(out.reshape(G, 4, C, GG), (0, 3, 2, 1)
                           ).reshape(n_cells * C, 4)
        slot = jnp.maximum(point_slot, 0)
        has = point_slot >= 0
        cell = slot // C
        c = slot % C
        x = cell // GG
        g = cell % GG
        sm = (x * GG + g) * C + c
        rrow = om[sm]
        return jnp.where(has[:, None], rrow[:, :3], 0.0)

    a = timeit("readback 3 flat channel gathers", jax.jit(rb_flat),
               out, point_slot)
    b = timeit("slot-major transpose + (1,4) row gather",
               jax.jit(rb_rowmajor), out, point_slot)
    print(f"  equal: {bool(jnp.all(a == b))}", flush=True)


if __name__ == "__main__":
    main()
