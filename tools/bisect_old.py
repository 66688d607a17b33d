#!/usr/bin/env python
"""Time the round-1 (pre-restructure) kernels for comparison."""
import importlib.util
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

spec = importlib.util.spec_from_file_location("old_sgm", "/tmp/oldsgm/old_sgm_pallas.py")
old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:8]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][:8]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return out


def main():
    HP, WP, DP, D = 1088, 1920, 128, 128
    W = 1920
    rng = np.random.RandomState(0)
    gl = jnp.asarray(rng.rand(1080, 1920) * 255, jnp.float32)
    gr = jnp.asarray(np.roll(np.asarray(gl), -8, axis=1))
    cost = jnp.asarray(rng.randint(0, 6000, (HP, WP, DP)), jnp.uint16)
    v1 = jnp.asarray(rng.randint(0, 20000, (HP, WP, DP)), jnp.float32)
    p1f, p2f = 400.0, 1600.0
    _, XT = old._pick_xtile(WP)
    BH, BH3, FH = 64, 16, 8
    nb, nx, nb3 = HP // BH, WP // XT, HP // BH3
    vol_shape_f = jax.ShapeDtypeStruct((HP, WP, DP), jnp.float32)
    hblock_r = pl.BlockSpec((BH, XT, DP), lambda b, x: (b, nx - 1 - x, 0),
                            memory_space=pltpu.VMEM)
    vblock_r = pl.BlockSpec((BH3, XT, DP), lambda x, b: (nb3 - 1 - b, x, 0),
                            memory_space=pltpu.VMEM)

    cf = jax.jit(lambda l, r: old.cost_and_fwd(l, r, D, 0, 5, 63, 200.0, 800.0,
                                               HP, WP, DP))
    timeit("OLD cost_and_fwd", cf, gl, gr)

    bwd_down = jax.jit(lambda c, v: pl.pallas_call(
        old._mk_bwd_down_kernel(BH, XT, nx, p1f, p2f),
        grid=(nb, nx),
        in_specs=[hblock_r, hblock_r], out_specs=hblock_r,
        out_shape=vol_shape_f,
        scratch_shapes=[pltpu.VMEM((BH, DP), jnp.float32),
                        pltpu.VMEM((nx, XT, DP), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(c, v))
    timeit("OLD bwd_down", bwd_down, cost, v1)

    up = jax.jit(lambda c, v: pl.pallas_call(
        old._mk_vscan_kernel(BH3, p1f, p2f, reverse=True),
        grid=(nx, nb3),
        in_specs=[vblock_r, vblock_r], out_specs=vblock_r,
        out_shape=vol_shape_f,
        scratch_shapes=[pltpu.VMEM((XT, DP), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(c, v))
    s = timeit("OLD up vscan", up, cost, v1)

    nbf = HP // FH
    fband = pl.BlockSpec((FH, WP, DP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    frow = pl.BlockSpec((FH, WP), lambda b: (b, 0), memory_space=pltpu.VMEM)
    fin = jax.jit(lambda sv: pl.pallas_call(
        old._mk_finalize_kernel(FH, D, DP, WP, W, 10, 1, True),
        grid=(nbf,),
        in_specs=[fband],
        out_specs=(frow, frow),
        out_shape=(jax.ShapeDtypeStruct((HP, WP), jnp.float32),
                   jax.ShapeDtypeStruct((HP, WP), jnp.int32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(sv))
    timeit("OLD finalize (incl DR2 ladder)", fin, s)


if __name__ == "__main__":
    main()
