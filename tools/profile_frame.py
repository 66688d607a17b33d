#!/usr/bin/env python
"""Per-stage wall timing of the 1080p depth hot path on the attached TPU.

Each stage is jitted standalone and timed over `iters` runs with a scalar
round-trip at the end (block_until_ready is unreliable on axon). Stages sum
to slightly more than the fused bench frame (inter-stage HBM round-trips),
so treat the numbers as upper bounds per stage.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:32s} {dt:8.2f} ms")
    return out, dt


def main():
    from recon3d_tpu.camera.fake import FakeStereoCamera
    from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
    from recon3d_tpu.depth import sgm as _sgm
    from recon3d_tpu.depth import sgm_pallas as sp
    from recon3d_tpu.depth import wls as _wls
    from recon3d_tpu.depth.matcher import compute_disparity
    from recon3d_tpu.ops.warp import build_remap_plan, remap_two_pass
    from recon3d_tpu.pointcloud.backproject import backproject_disparity

    W, H, D = 1920, 1080, 128
    cam = FakeStereoCamera(width=W, height=H, focal=1050.0, baseline=0.06)
    rect_l, rect_r, _, _ = cam.render(0)
    jl = jnp.asarray(rect_l, jnp.float32)
    jr = jnp.asarray(rect_r, jnp.float32)

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cx, cy, f = W / 2.0, H / 2.0, 1.2 * W
    xn, yn = (xx - cx) / f, (yy - cy) / f
    scale = 1.0 - 0.06 * (xn ** 2 + yn ** 2)
    mx = (cx + f * scale * xn + 4.0).astype(np.float32)
    my = (cy + f * scale * yn - 3.0).astype(np.float32)
    plan = build_remap_plan(mx, my)

    HP, WP, DP = 1088, 1920, 128
    mcfg = StereoMatcherConfig(num_disparities=D, block_size=5)
    wcfg = WLSConfig()

    print(f"device: {jax.devices()[0]}")

    _, t_remap = timeit("remap_two_pass", jax.jit(
        lambda a, p: remap_two_pass(a, p)), jl, plan)

    cf = jax.jit(lambda l, r: sp.cost_fwd_down(
        l, r, D, 0, 5, 63, 200.0, 800.0, HP, WP, DP))
    (cost, v1), t_cf = timeit("cost_fwd_down", cf, jl, jr)

    af = jax.jit(lambda c, v: sp.aggregate_and_finalize(
        c, 200.0, 800.0, D, 10, 1, True, W, False, v1=v))
    (disp_raw, valid), t_af = timeit("bwd+up_finalize", af, cost, v1)
    disp_raw, valid = disp_raw[:H, :W], valid[:H, :W]

    spk = jax.jit(lambda d, v: _sgm.speckle_filter_fast(
        d, v, 32.0, 50, max_disparity=128))
    _, t_spk = timeit("speckle_fast", spk, disp_raw, valid)

    wl = jax.jit(lambda d, v, g: _wls.wls_refine(d, v, g, iterations=wcfg.iterations))
    (dense,), t_wls = timeit("wls_refine", lambda d, v, g: (wl(d, v, g),),
                             disp_raw, valid, jl)

    Q = np.zeros((4, 4), np.float32)
    Q[0, 0], Q[1, 1] = 1.0, 1.0
    Q[0, 3], Q[1, 3], Q[2, 3], Q[3, 2] = -W / 2, -H / 2, 1050.0, 1.0 / 0.06
    jQ = jnp.asarray(Q)
    bp = jax.jit(lambda d, q, c: backproject_disparity(d, q, color=c).points)
    col = jnp.repeat(jl[..., None], 3, axis=-1) / 255.0
    _, t_bp = timeit("backproject+color", bp, dense, jQ, col)

    full = jax.jit(lambda l, r: compute_disparity(l, r, mcfg, wcfg, True))
    _, t_full = timeit("compute_disparity(full)", full, jl, jr)

    print(f"{'sum of stages':32s} {2 * t_remap + t_cf + t_af + t_spk + t_wls + t_bp:8.2f} ms")


if __name__ == "__main__":
    main()
