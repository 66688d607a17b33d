#!/usr/bin/env python
"""Experiment: packed-table build variants for the 10M normals path.

The per-slot row gather (sp[pos] at (G, C, GG) positions) costs 561 ms at
10M points / G=128 / C=16 on the attached v5e — each gather row is a
12-byte point. Candidate replacements exploit cell contiguity in the
sorted order (slots of cell c live at sorted rows start[c]..start[c]+C-1):

  a) current   : sp[pos] per-slot row gather + moveaxis
  b) block     : one (C, 3) dynamic-slice block gather per CELL (vmapped),
                 then a dense transpose to the packed channel layout
  c) blockchan : per-channel (C,) block gathers from the sorted coordinate
                 vectors, then (G, GG, C) -> (G, C, GG) transposes

Usage: python tools/exp_pack.py [--n 10000000] [--grid 128] [--cap 16]
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
    # NB: on the tunneled axon backend block_until_ready returns before
    # the computation lands; a scalar readback is the only real sync.
    out = fn(*args)
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
    N = args.n
    n_cells = G * G * gz
    GG = G * gz
    print(f"N={N} G={G} C={C} gz={gz} slots={n_cells * C}", flush=True)

    sort_fn = jax.jit(lambda p, v: gk._sort_cells(p, v, r, G, C, gz=gz))
    sc, sp, order, start, ok, rank, overflow = timeit(
        "sort_cells", sort_fn, p, valid)

    def pack_current(sp, start):
        st3 = start[:n_cells].reshape(G, 1, GG)
        pos = st3 + jnp.arange(C, dtype=jnp.int32).reshape(1, C, 1)
        nxt = start[1:n_cells + 1].reshape(G, 1, GG)
        occ = pos < nxt
        pos = jnp.minimum(pos, N - 1)
        rows = jnp.where(occ[..., None], sp[pos], 0.0)
        coords = jnp.moveaxis(rows, -1, 1).reshape(G, 3 * C, GG)
        return jnp.concatenate([coords, occ.astype(jnp.float32)], axis=1)

    def pack_block(sp, start):
        st = start[:n_cells]
        nxt = start[1:n_cells + 1]
        sp_pad = jnp.concatenate([sp, jnp.zeros((C, 3), sp.dtype)], axis=0)
        blocks = jax.vmap(
            lambda s: jax.lax.dynamic_slice(sp_pad, (s, 0), (C, 3)))(st)
        occ = (st[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
               < nxt[:, None])
        blocks = jnp.where(occ[..., None], blocks, 0.0)
        coords = jnp.transpose(blocks.reshape(G, GG, C, 3),
                               (0, 3, 2, 1)).reshape(G, 3 * C, GG)
        occp = jnp.transpose(occ.reshape(G, GG, C).astype(jnp.float32),
                             (0, 2, 1))
        return jnp.concatenate([coords, occp], axis=1)

    def pack_blockchan(sp, start):
        st = start[:n_cells]
        nxt = start[1:n_cells + 1]
        occ = (st[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
               < nxt[:, None])
        occ3 = occ.reshape(G, GG, C)
        chans = []
        for j in range(3):
            v = jnp.concatenate([sp[:, j], jnp.zeros((C,), sp.dtype)])
            b = jax.vmap(
                lambda s, vv=v: jax.lax.dynamic_slice(vv, (s,), (C,)))(st)
            b = jnp.where(occ, b, 0.0).reshape(G, GG, C)
            chans.append(jnp.transpose(b, (0, 2, 1)))
        occp = jnp.transpose(occ3.astype(jnp.float32), (0, 2, 1))
        return jnp.concatenate(chans + [occp], axis=1)

    a = timeit("a) current per-slot row gather", jax.jit(pack_current),
               sp, start)
    b = timeit("b) per-cell block gather + transpose", jax.jit(pack_block),
               sp, start)
    c = timeit("c) per-channel block gathers", jax.jit(pack_blockchan),
               sp, start)

    for name, out in (("b", b), ("c", c)):
        same = bool(jnp.all(out == a))
        print(f"  {name} == a: {same}", flush=True)


if __name__ == "__main__":
    main()
