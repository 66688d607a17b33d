#!/usr/bin/env python
"""Isolated timings of the current 3-direction SGM pipeline pieces + WLS."""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.depth import sgm_pallas as sp
from recon3d_tpu.depth import wls_pallas as wp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:4].astype(jnp.float32)))
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)
    return out


def main():
    HP, WP, DP, D = 1088, 1920, 128, 128
    rng = np.random.RandomState(0)
    gl = jnp.asarray(rng.rand(1080, 1920) * 255, jnp.float32)
    gr = jnp.asarray(np.roll(np.asarray(gl), -8, axis=1))
    print(f"device: {jax.devices()[0]}", flush=True)

    cf3 = jax.jit(lambda l, r: sp.cost_fwd_down(
        l, r, D, 0, 5, 63, 200.0, 800.0, HP, WP, DP, False))
    (cost, v1), = [timeit("cost+fwd (3dir, rolling box)", cf3, gl, gr)]

    af3 = jax.jit(lambda c, v: sp.aggregate_and_finalize(
        c, 200.0, 800.0, D, 10, 1, True, 1920, False, v1=v,
        final_dir="down"))
    timeit("bwd + down_finalize (3dir)", af3, cost, v1)

    full3 = jax.jit(lambda l, r: sp.sgm_disparity_pallas(
        l, r, num_disparities=D, block_size=5, num_directions=3))
    timeit("sgm3 full (incl speckle)", full3, gl, gr)

    disp = jnp.asarray(rng.rand(1080, 1920) * 100, jnp.float32)
    valid = jnp.asarray(rng.rand(1080, 1920) > 0.1)
    wl = jax.jit(lambda d, v, g: wp.wls_refine_pallas(d, v, g, iterations=3))
    timeit("wls_refine_pallas (3 iters)", wl, disp, valid, gl)


if __name__ == "__main__":
    main()
