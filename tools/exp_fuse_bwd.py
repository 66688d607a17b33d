"""A/B the fused-bwd finalize kernel at production shapes on the TPU:
bitwise equality vs the separate-bwd path + timing for both."""
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

from recon3d_tpu.camera.fake import FakeStereoCamera
from recon3d_tpu.depth import sgm_pallas as sp


def t(fn, *a, n=30):
    out = fn(*a)
    _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*a)
    _ = float(jnp.sum(out[0]))
    return out, (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    W, H, D = 1920, 1080, 128
    cam = FakeStereoCamera(width=W, height=H, focal=1050.0, baseline=0.06)
    gl, gr, _, _ = cam.render(0)
    jl = jnp.asarray(gl, jnp.float32)
    jr = jnp.asarray(gr, jnp.float32)
    HP = sp._ceil_to(H, 64)
    WP, _ = sp._pick_xtile(W)
    DP = sp._ceil_to(D, 128)
    p1, p2 = 8.0 * 25, 96.0 * 25

    cf = jax.jit(lambda l, r: sp.cost_fwd_down(
        l, r, D, 0, 5, 63, p1, p2, HP, WP, DP, True))
    (cost, v1), ms_cf = t(cf, jl, jr, n=10)
    print(f"cost_fwd_down          : {ms_cf:7.2f} ms", flush=True)

    base = jax.jit(lambda c, v: sp.aggregate_and_finalize(
        c, p1, p2, D, 10, 1, True, W, v1=v, final_dir="up"))
    (d0, v0), ms0 = t(base, cost, v1)
    print(f"agg+finalize (separate): {ms0:7.2f} ms", flush=True)

    fused = jax.jit(lambda c, v: sp.aggregate_and_finalize(
        c, p1, p2, D, 10, 1, True, W, v1=v, final_dir="up",
        fuse_bwd=True))
    (d1, v1_), ms1 = t(fused, cost, v1)
    print(f"agg+finalize (fused)   : {ms1:7.2f} ms", flush=True)

    same_d = bool(jnp.array_equal(d0, d1))
    same_v = bool(jnp.array_equal(v0, v1_))
    print(f"bitwise: disp={same_d} valid={same_v}", flush=True)

    # also the 3-direction (down-finalize) variant
    base3 = jax.jit(lambda c, v: sp.aggregate_and_finalize(
        c, p1, p2, D, 10, 1, True, W, v1=v, final_dir="down"))
    fused3 = jax.jit(lambda c, v: sp.aggregate_and_finalize(
        c, p1, p2, D, 10, 1, True, W, v1=v, final_dir="down",
        fuse_bwd=True))
    (d0b, v0b), ms0b = t(base3, cost, v1)
    (d1b, v1b), ms1b = t(fused3, cost, v1)
    print(f"3dir separate {ms0b:7.2f} ms | fused {ms1b:7.2f} ms | "
          f"bitwise disp={bool(jnp.array_equal(d0b, d1b))} "
          f"valid={bool(jnp.array_equal(v0b, v1b))}", flush=True)


if __name__ == "__main__":
    main()
