#!/usr/bin/env python
"""Experiment 4: the Pallas one-hot pack kernel vs the XLA slot gather.

Times _bin_points_packed_pallas against gk._bin_points_packed at the 10M
and 1M bench configs and asserts BITWISE pk equality plus matching
overflow accounting.

Usage: python tools/exp_pack4.py [--n 10000000] [--grid 128] [--cap 16]
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
    print(f"N={args.n} G={G} C={C}", flush=True)

    xla = jax.jit(lambda p, v: gk._bin_points_packed(p, v, r, G, C))
    pal = jax.jit(lambda p, v: gkp._bin_points_packed_pallas(p, v, r, G, C))

    pk_x, ps_x, ov_x = timeit("XLA _bin_points_packed", xla, p, valid)
    pk_p, ps_p, ov_p = timeit("Pallas one-hot pack", pal, p, valid)

    print(f"  pk bitwise equal: {bool(jnp.all(pk_x == pk_p))}", flush=True)
    print(f"  point_slot equal: {bool(jnp.all(ps_x == ps_p))}", flush=True)
    print(f"  overflow {float(ov_x):.6f} vs {float(ov_p):.6f}", flush=True)

    gz = gk._lane_stride(G)
    nf = jax.jit(lambda pk: gkp.normals_pallas_core(pk, r * r, G, C, gz=gz))
    timeit("moments+eig kernel (unchanged)", nf, pk_p)

    from recon3d_tpu.pointcloud.normals import _normals_only
    ef = jax.jit(lambda p, v: _normals_only(p, v, r, 30, G, C))
    timeit("estimate_normals end-to-end", ef, p, valid)


if __name__ == "__main__":
    main()
