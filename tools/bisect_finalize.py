#!/usr/bin/env python
"""Time the current SGM kernels in isolation on the TPU (1080p, D=128)."""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recon3d_tpu.depth import sgm_pallas as sp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out


def main():
    HP, WP, DP, D = 1088, 1920, 128, 128
    W = 1920
    rng = np.random.RandomState(0)
    gl = jnp.asarray(rng.rand(1080, 1920) * 255, jnp.float32)
    gr = jnp.asarray(np.roll(np.asarray(gl), -8, axis=1))
    cost = jnp.asarray(rng.randint(0, 6000, (HP, WP, DP)), jnp.uint16)
    v1 = jnp.asarray(rng.randint(0, 20000, (HP, WP, DP)), jnp.uint16)
    p1f, p2f = 400.0, 1600.0
    _, XT = sp._pick_xtile(WP)
    FH = 8
    nbf = HP // FH
    vol_shape_u = jax.ShapeDtypeStruct((HP, WP, DP), jnp.uint16)

    print(f"device: {jax.devices()[0]}", flush=True)

    cf = jax.jit(lambda l, r: sp.cost_fwd_down(l, r, D, 0, 5, 63, 200.0,
                                               800.0, HP, WP, DP))
    timeit("cost_fwd_down (u16 v2)", cf, gl, gr)

    NC = 32
    nstrip = WP // NC
    sblock = pl.BlockSpec((HP, NC, DP), lambda s: (0, nstrip - 1 - s, 0),
                          memory_space=pltpu.VMEM)
    bwd_s = jax.jit(lambda c, v: pl.pallas_call(
        sp._mk_hstrip_kernel(HP, NC, p1f, p2f, reverse=True),
        grid=(nstrip,),
        in_specs=[sblock, sblock], out_specs=sblock,
        out_shape=vol_shape_u,
        scratch_shapes=[pltpu.VMEM((HP, DP), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(c, v))
    timeit("bwd hstrip (full height, u16)", bwd_s, cost, v1)

    fband = pl.BlockSpec((FH, WP, DP), lambda b: (nbf - 1 - b, 0, 0),
                         memory_space=pltpu.VMEM)
    frow = pl.BlockSpec((FH, WP), lambda b: (nbf - 1 - b, 0),
                        memory_space=pltpu.VMEM)

    def upfin(md, ur, subpix):
        return jax.jit(lambda c, v: pl.pallas_call(
            sp._mk_up_finalize_kernel(FH, D, DP, WP, W, ur, md, subpix,
                                      p1f, p2f),
            grid=(nbf,),
            in_specs=[fband, fband],
            out_specs=(frow, frow),
            out_shape=(jax.ShapeDtypeStruct((HP, WP), jnp.float32),
                       jax.ShapeDtypeStruct((HP, WP), jnp.int32)),
            scratch_shapes=[pltpu.VMEM((WP, DP), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(c, v))

    timeit("up_finalize md=-1 ur=10 sub", upfin(-1, 10, True), cost, v1)
    timeit("up_finalize md=1 ur=10 sub (full)", upfin(1, 10, True), cost, v1)

    full = jax.jit(lambda l, r: sp.sgm_disparity_pallas(
        l, r, num_disparities=D, block_size=5))
    timeit("sgm_disparity_pallas (full, incl speckle)", full, gl, gr)


if __name__ == "__main__":
    main()
