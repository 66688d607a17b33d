#!/usr/bin/env python
"""Experiment 3: gather lowering variants for pack + readback at 10M.

exp_pack2 pinned the pack cost to the gather itself (~16 ns/offset at
33.6M slot offsets; transposes fuse for free). Probe whether XLA's TPU
gather has a faster path: slot-ordered monotone indices with
indices_are_sorted, wider slices (fewer offsets), and the readback side
(3-4 flat channel gathers at 10M offsets vs one slot-major row gather).

Usage: python tools/exp_pack3.py [--n 10000000] [--grid 128] [--cap 16]
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
    N = args.n
    n_cells = G * G * gz
    GG = G * gz
    n_slots = n_cells * C
    print(f"N={N} G={G} C={C} gz={gz} slots={n_slots}", flush=True)

    sort_fn = jax.jit(lambda p, v: gk._sort_cells(p, v, r, G, C, gz=gz))
    sc, sp, order, start, ok, rank, overflow = sort_fn(p, valid)
    point_slot = jax.jit(
        lambda: gk._point_slot_from_sorted(sc, order, ok, rank, C))()
    _ = float(jnp.sum(sp[:1])) + float(jnp.sum(point_slot[:1]))

    def slotpos(start):
        # slot-ordered positions: slot s = cell*C + c -> start[cell] + c,
        # MONOTONE non-decreasing over s
        cell = jnp.arange(n_slots, dtype=jnp.int32) // C
        c = jnp.arange(n_slots, dtype=jnp.int32) % C
        pos = start[cell] + c
        return jnp.minimum(pos, N - 1)

    def g_sorted_hint(sp, start):
        pos = slotpos(start)
        return jax.lax.gather(
            sp, pos[:, None],
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 3), indices_are_sorted=True)

    def g_nohint(sp, start):
        pos = slotpos(start)
        return jax.lax.gather(
            sp, pos[:, None],
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 3))

    def g_slice2(sp, start):
        # one offset per PAIR of slots: slice (2, 3) at start[cell] + 2k
        cell = jnp.arange(n_slots // 2, dtype=jnp.int32) // (C // 2)
        k = jnp.arange(n_slots // 2, dtype=jnp.int32) % (C // 2)
        pos = jnp.minimum(start[cell] + 2 * k, N - 2)
        sp_pad = jnp.concatenate([sp, jnp.zeros((2, 3), sp.dtype)])
        return jax.lax.gather(
            sp_pad, pos[:, None],
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2, 3), indices_are_sorted=True)

    def g_slice4(sp, start):
        cell = jnp.arange(n_slots // 4, dtype=jnp.int32) // (C // 4)
        k = jnp.arange(n_slots // 4, dtype=jnp.int32) % (C // 4)
        pos = jnp.minimum(start[cell] + 4 * k, N - 4)
        sp_pad = jnp.concatenate([sp, jnp.zeros((4, 3), sp.dtype)])
        return jax.lax.gather(
            sp_pad, pos[:, None],
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(4, 3), indices_are_sorted=True)

    timeit("pack gather slot-ordered + sorted hint", jax.jit(g_sorted_hint),
           sp, start)
    timeit("pack gather slot-ordered, no hint", jax.jit(g_nohint), sp, start)
    timeit("pack gather slice (2,3), 16.8M offsets", jax.jit(g_slice2),
           sp, start)
    timeit("pack gather slice (4,3), 8.4M offsets", jax.jit(g_slice4),
           sp, start)

    # ---- readback side: fake kernel output, per-point channel gathers ----
    out = jnp.asarray(rng.rand(G, 4 * C, GG).astype(np.float32))

    def rb_flat(out, point_slot):
        out_f = out.reshape(-1)
        slot = jnp.maximum(point_slot, 0)
        cell = slot // C
        c = slot % C
        x = cell // GG
        g = cell % GG

        def chan(j):
            return out_f[((x * 4 + j) * C + c) * GG + g]

        return chan(0), chan(1), chan(2), chan(3)

    def rb_rowmajor(out, point_slot):
        # one transpose to slot-major (n_slots, 4), then ONE (1, 4) row
        # gather per point
        om = jnp.transpose(out.reshape(G, 4, C, GG), (0, 3, 2, 1)
                           ).reshape(n_cells * C, 4)
        slot = jnp.maximum(point_slot, 0)
        cell = slot // C
        c = slot % C
        x = cell // GG
        g = cell % GG
        sm = (x * GG + g) * C + c  # slot-major index
        r = om[sm]
        return r[:, 0], r[:, 1], r[:, 2], r[:, 3]

    a = timeit("readback 4 flat channel gathers", jax.jit(rb_flat),
               out, point_slot)
    b = timeit("readback slot-major transpose + row gather",
               jax.jit(rb_rowmajor), out, point_slot)
    same = all(bool(jnp.all(x == y)) for x, y in zip(a, b))
    print(f"  readback equal: {same}", flush=True)


if __name__ == "__main__":
    main()
