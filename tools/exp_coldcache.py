#!/usr/bin/env python
"""Round-5 probe: reproduce the BENCH_r04 cold-cache jit_frame pathology.

VERDICT r4: after 37542bf shifted jit_frame's cache key, the freshly
compiled fused frame program (remap x2 + 4 Pallas SGM kernels + speckle +
Pallas WLS + backproject) compiles in ~40 s but its FIRST execution takes
~131 s or never returns, while each stage standalone is fine. This script
compiles the headline program against an EMPTY cache dir and times
compile + first execution + steady state, printing a heartbeat before
each phase so a hang is attributable.

Usage: timeout 900 python tools/exp_coldcache.py [--mode sgm4] [--stage N]
  --stage bisects: 0=full frame, 1=no backproject, 2=no WLS, 3=no speckle,
  4=cost+aggregate only, 5=remap only.
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hb(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="sgm4")
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--cache", default=None,
                    help="cache dir (default: fresh tempdir = cold)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache = args.cache or tempfile.mkdtemp(prefix="jaxcache_cold_")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    hb(f"cache={cache} devices={jax.devices()}")

    import bench
    frame, (jl, jr, jc, plan, jQ), scene = bench.build_headline(mode=args.mode)

    from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
    from recon3d_tpu.depth.matcher import compute_disparity
    from recon3d_tpu.ops.warp import remap_two_pass_pallas
    from recon3d_tpu.pointcloud.backproject import backproject_disparity
    D = scene["D"]
    mcfg = StereoMatcherConfig(num_disparities=D, block_size=5,
                               mode=args.mode, p2_factor=96)
    wcfg = WLSConfig()

    stage = args.stage
    if stage == 0:
        fn, fa = frame, (jl, jr, jc, plan, jQ)
    elif stage == 1:
        @jax.jit
        def fn(l, r, pln):
            lg = remap_two_pass_pallas(l, pln)
            rg = remap_two_pass_pallas(r, pln)
            disp, valid = compute_disparity(lg, rg, mcfg, wcfg, True)
            return jnp.sum(disp)
        fa = (jl, jr, plan)
    elif stage == 2:
        @jax.jit
        def fn(l, r, pln):
            lg = remap_two_pass_pallas(l, pln)
            rg = remap_two_pass_pallas(r, pln)
            disp, valid = compute_disparity(lg, rg, mcfg, None, True)
            return jnp.sum(disp)
        fa = (jl, jr, plan)
    elif stage == 3:
        from recon3d_tpu.depth import sgm_pallas

        @jax.jit
        def fn(l, r, pln):
            lg = remap_two_pass_pallas(l, pln)
            rg = remap_two_pass_pallas(r, pln)
            d, v = sgm_pallas.sgm_disparity_pallas(
                lg, rg, num_disparities=D, block_size=5,
                num_directions={"sgm3": 3, "sgm4": 4, "sgm8": 8}[args.mode],
                p2=96.0 * 25.0)
            return jnp.sum(d)
        fa = (jl, jr, plan)
    elif stage == 4:
        from recon3d_tpu.depth import sgm_pallas

        @jax.jit
        def fn(l, r):
            d, v = sgm_pallas.sgm_disparity_pallas(
                l, r, num_disparities=D, block_size=5,
                num_directions=4, p2=96.0 * 25.0)
            return jnp.sum(d)
        fa = (jl, jr)
    elif stage == 5:
        @jax.jit
        def fn(l, pln):
            return jnp.sum(remap_two_pass_pallas(l, pln))
        fa = (jl, plan)
    elif stage in (6, 7, 8):
        from recon3d_tpu.depth import sgm_pallas as sp
        H, W = scene["H"], scene["W"]
        HP = sp._ceil_to(H, 64)
        WP, _ = sp._pick_xtile(W)
        DP = sp._ceil_to(D, 128)
        p1, p2 = 8.0 * 25, 96.0 * 25
        wl = remap_two_pass_pallas(jl, plan)
        wr = remap_two_pass_pallas(jr, plan)
        cfd = jax.jit(lambda l, r: sp.cost_fwd_down(
            l, r, D, 0, 5, 63, p1, p2, HP, WP, DP, True))
        agg = jax.jit(lambda c, v: sp.aggregate_and_finalize(
            c, p1, p2, D, 10, 1, True, W, v1=v, final_dir="up"))
        if stage == 6:
            fn = cfd
            fa = (wl, wr)
        elif stage == 7:
            cost, v1 = cfd(wl, wr)
            _ = float(jnp.sum(v1))
            hb("stage7: cost_fwd_down warmed; timing aggregate alone")
            fn = agg
            fa = (cost, v1)
        else:  # 8: the split chain, both programs fresh in one process
            def fn(l, r):
                c, v = cfd(l, r)
                d, vv = agg(c, v)
                return jnp.sum(d)
            fa = (wl, wr)
        # NOTE: no outer jit — nesting would inline the pieces back into
        # one program and defeat the split measurement

    if hasattr(fn, "lower"):
        hb(f"stage={stage} lowering...")
        t0 = time.time()
        lowered = fn.lower(*fa)
        hb(f"lowered in {time.time()-t0:.1f}s; compiling...")
        t0 = time.time()
        compiled = lowered.compile()
        hb(f"compiled in {time.time()-t0:.1f}s; first exec...")
    else:  # plain chain of jitted pieces: first call compiles + runs
        hb(f"stage={stage} chain: first call compiles+executes...")
        compiled = fn
    t0 = time.time()
    out = compiled(*fa)
    s = float(jnp.sum(out[-1] if isinstance(out, tuple) else out))
    t1 = time.time() - t0
    hb(f"first exec {t1:.2f}s (checksum {s:.1f}); steady state...")
    times = []
    for i in range(5):
        t0 = time.time()
        out = compiled(*fa)
        s = float(jnp.sum(out[-1] if isinstance(out, tuple) else out))
        times.append(time.time() - t0)
    hb(f"steady (sync/iter): {[round(t*1000,1) for t in times]} ms")
    # the bench methodology: queue 30 executions, sync once — hides the
    # tunnel RPC latency the per-iter sync pays
    t0 = time.time()
    for i in range(30):
        out = compiled(*fa)
    s = float(jnp.sum(out[-1] if isinstance(out, tuple) else out))
    q_ms = (time.time() - t0) / 30 * 1000
    hb(f"steady (queued x30): {q_ms:.1f} ms/frame")
    print(f"RESULT stage={stage} first={t1:.2f}s "
          f"steady={min(times)*1000:.1f}ms queued={q_ms:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
