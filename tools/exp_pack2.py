#!/usr/bin/env python
"""Experiment 2: split the packed-table build cost at 10M points.

exp_pack.py showed per-cell block gathers are catastrophically slow
(vmapped dynamic_slice at 2M cells). This isolates the current path's
passes and tries a custom lax.gather that lands rows directly in the
kernel's channel-major layout (no moveaxis), with/without the occupancy
where-zeroing (the kernel multiplies by occupancy anyway) and without the
final concat (kernel could take coords + occ as two refs).

Usage: python tools/exp_pack2.py [--n 10000000] [--grid 128] [--cap 16]
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
    print(f"{name:48s} {dt:9.2f} ms", flush=True)
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
    N = args.n
    n_cells = G * G * gz
    GG = G * gz
    print(f"N={N} G={G} C={C} gz={gz} slots={n_cells * C}", flush=True)

    sort_fn = jax.jit(lambda p, v: gk._sort_cells(p, v, r, G, C, gz=gz))
    sc, sp, order, start, ok, rank, overflow = sort_fn(p, valid)
    _ = float(jnp.sum(sp[:1]))

    def mkpos(start):
        st3 = start[:n_cells].reshape(G, 1, GG)
        pos = st3 + jnp.arange(C, dtype=jnp.int32).reshape(1, C, 1)
        nxt = start[1:n_cells + 1].reshape(G, 1, GG)
        occ = pos < nxt
        return jnp.minimum(pos, N - 1), occ

    def raw_gather(sp, start):
        pos, occ = mkpos(start)
        return sp[pos]

    def raw_gather_w4(sp, start):
        pos, occ = mkpos(start)
        sp4 = jnp.pad(sp, ((0, 0), (0, 1)))
        return sp4[pos]

    def gather_chanmajor(sp, start):
        # custom lax.gather: slice dim (3) lands at output axis 1 ->
        # (G, 3, C, GG) with no transpose pass
        pos, occ = mkpos(start)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        out = jax.lax.gather(
            sp, pos[..., None].reshape(G, C, GG, 1),
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(3,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 3))
        del dn
        return out  # (G, C, GG, 3) baseline check of explicit form

    def gather_chanmajor2(sp, start):
        # offset dim placed at axis 1 of the batch dims
        pos, occ = mkpos(start)
        idx = pos.reshape(G, C, GG, 1)
        out = jax.lax.gather(
            sp, idx,
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 3))
        return out  # (G, 3, C, GG)

    def full_current(sp, start):
        pos, occ = mkpos(start)
        rows = jnp.where(occ[..., None], sp[pos], 0.0)
        coords = jnp.moveaxis(rows, -1, 1).reshape(G, 3 * C, GG)
        return jnp.concatenate([coords, occ.astype(jnp.float32)], axis=1)

    def full_chanmajor_nowhere(sp, start):
        pos, occ = mkpos(start)
        out = jax.lax.gather(
            sp, pos.reshape(G, C, GG, 1),
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 3))
        coords = out.reshape(G, 3 * C, GG)
        return jnp.concatenate([coords, occ.astype(jnp.float32)], axis=1)

    def twoout_nowhere(sp, start):
        pos, occ = mkpos(start)
        out = jax.lax.gather(
            sp, pos.reshape(G, C, GG, 1),
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 3))
        return out.reshape(G, 3 * C, GG), occ.astype(jnp.float32)

    timeit("raw sp[pos] gather only", jax.jit(raw_gather), sp, start)
    timeit("raw gather width-4 rows", jax.jit(raw_gather_w4), sp, start)
    timeit("custom gather (G,C,GG,3)", jax.jit(gather_chanmajor), sp, start)
    g2 = timeit("custom gather (G,3,C,GG)", jax.jit(gather_chanmajor2),
                sp, start)
    a = timeit("FULL current (where+moveaxis+concat)",
               jax.jit(full_current), sp, start)
    b = timeit("FULL chanmajor, no where, concat",
               jax.jit(full_chanmajor_nowhere), sp, start)
    c = timeit("chanmajor, no where, two outputs",
               jax.jit(twoout_nowhere), sp, start)

    # correctness: b matches a wherever occupied (a zeros empty slots)
    occf = a[:, 3 * C:]
    mask = jnp.concatenate([occf, occf, occf], axis=1)
    same = bool(jnp.all(b[:, :3 * C] * mask == a[:, :3 * C]))
    print(f"  b(masked) == a coords: {same}", flush=True)
    same2 = bool(jnp.all(b[:, 3 * C:] == occf))
    print(f"  b occ == a occ: {same2}", flush=True)
    del g2, c


if __name__ == "__main__":
    main()
