#!/usr/bin/env python
"""Headline benchmark: 1080p raw stereo pair -> colored point cloud, fps/chip.

BASELINE.json north star: >30 fps at 1920x1080 with 128 disparities on one
TPU v5e chip, disparity RMSE < 0.5 px vs OpenCV SGBM.

The timed program is the FULL per-frame pipeline (depth4.py:246-262
equivalent): rectify-remap x2 (gather-free two-pass warp) -> SGM-128 (fused
Pallas kernels) -> fast speckle -> WLS refine -> Q backprojection -> colored
masked cloud, as one jit program. Timing forces a device-side scalar each
round-trip boundary because block_until_ready does not reliably block on
the experimental axon platform.

Accuracy (the BASELINE metric): pre-WLS disparity RMSE vs cv2.StereoSGBM on
the SAME rectified images, over the both-valid mask. Extras report the
full-pipeline-vs-full-pipeline RMSE (cv2 runs its own cv2.remap on the same
raw images + maps) and RMSE vs analytic ground truth on the undistorted
pair. Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
# persistent compilation cache (pre-warmed in-repo by tools/warm_cache.py)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)


def hb(section, **kv):
    """Per-section heartbeat. BENCH_r04 timed out after 30 silent minutes
    because nothing printed before the streaming section; every phase now
    announces itself so a driver timeout is attributable to a section."""
    extra = " ".join(f"{k}={v}" for k, v in kv.items())
    print(f"# [{time.strftime('%H:%M:%S')}] {section} {extra}".rstrip(),
          flush=True)


class _SectionTimeout(Exception):
    pass


class section_guard:
    """SIGALRM-bounded section: `with section_guard('name', 300):` raises
    _SectionTimeout (catchable) instead of letting one section silently
    burn the driver's whole budget. Main thread only; no-op if an alarm
    is unavailable on the platform."""

    def __init__(self, name, seconds):
        self.name, self.seconds = name, int(seconds)

    def __enter__(self):
        import signal
        hb(f"{self.name}: start", guard_s=self.seconds)
        try:
            self._old = signal.signal(signal.SIGALRM, self._fire)
            signal.alarm(self.seconds)
            self._armed = True
        except (ValueError, AttributeError):  # non-main thread / platform
            self._armed = False
        self._t0 = time.perf_counter()
        return self

    def _fire(self, signum, frame):
        raise _SectionTimeout(self.name)

    def __exit__(self, et, ev, tb):
        if self._armed:
            import signal
            signal.alarm(0)
            signal.signal(signal.SIGALRM, self._old)
        took = time.perf_counter() - self._t0
        if et is _SectionTimeout:
            hb(f"{self.name}: TIMED OUT", after_s=round(took, 1))
            return False
        hb(f"{self.name}: done", took_s=round(took, 1))
        return False


def _enable_compile_cache():
    """Point jax at the committed .jax_cache via jax.config, not env vars.

    This environment's sitecustomize imports jax at interpreter startup, so
    by the time this module sets JAX_COMPILATION_CACHE_DIR the config has
    already been read with the cache dir unset — rounds 1-2 benched with
    the persistent cache silently disabled (compile_s 90-160 s every run;
    the round-3 probe's cache log shows 'cache is disabled/not initialized'
    on every lookup). jax.config.update works at any time.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _forward_xy(x, y, H, W):
    """The rectification model: rect coords -> raw coords (radial
    distortion + small rotation + offset)."""
    cx, cy, f = W / 2.0, H / 2.0, 1.2 * W
    xn, yn = (x - cx) / f, (y - cy) / f
    scale = 1.0 - 0.06 * (xn ** 2 + yn ** 2)
    ang = 0.006
    mx = cx + f * (scale * xn * np.cos(ang) - yn * np.sin(ang)) + 4.0
    my = cy + f * (scale * yn * np.cos(ang) + xn * np.sin(ang)) - 3.0
    return mx, my


def _synthetic_maps(H, W):
    """Rectification maps m: remap(raw, mx, my)[y, x] = raw[m(x, y)]."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    mx, my = _forward_xy(xx, yy, H, W)
    return mx.astype(np.float32), my.astype(np.float32)


def _inverse_maps(H, W, iters=12):
    """m^-1 by fixed-point iteration (the warp is a mild contraction):
    raw = remap(rect, imx, imy) makes remap(raw, mx, my) ~ rect, so the
    benched pipeline performs a REAL rectification and its output stays
    comparable to the analytic ground-truth disparity."""
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
    x, y = uu.copy(), vv.copy()
    for _ in range(iters):
        fx, fy = _forward_xy(x, y, H, W)
        x += uu - fx
        y += vv - fy
    return x.astype(np.float32), y.astype(np.float32)


def build_headline(mode: str = "sgm4", p2_mult: float | None = 3.0):
    """The exact headline program + inputs, shared with tools/warm_cache.py
    (same construction -> same jit cache key -> the committed .jax_cache
    entry the warmer writes is the one the bench loads).

    mode/p2_mult parameterize the matcher (the accuracy-mode experiments
    drive sgm8 + raised P2 through the same program).

    Returns (frame_fn, (jl, jr, jc, plan, jQ), scene) where scene carries
    everything the accuracy cross-checks need.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.camera.fake import FakeStereoCamera
    from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
    from recon3d_tpu.depth.matcher import compute_disparity
    from recon3d_tpu.ops.warp import build_remap_plan, remap_two_pass_pallas
    from recon3d_tpu.pointcloud.backproject import backproject_disparity

    W, H, D = 1920, 1080, 128
    focal, baseline = 1050.0, 0.06

    cam = FakeStereoCamera(width=W, height=H, focal=focal, baseline=baseline)
    rect_l, rect_r, disp_true, _ = cam.render(0)
    mx, my = _synthetic_maps(H, W)
    # RAW images = rectified scene pushed through the INVERSE warp, so the
    # benched remap performs a real rectification: remap(raw) ~ rect and
    # the full pipeline's output stays comparable to disp_true. (Round 1
    # warped the rectified pair FORWARD and matched in distorted space,
    # which breaks epipolar alignment — both matchers then diverge on an
    # ill-posed problem; that was the bulk of the 2.39 px full-pipeline
    # divergence the round-1 review flagged.)
    imx, imy = _inverse_maps(H, W)
    raw_l = cv2.remap(rect_l.astype(np.float32), imx, imy, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REPLICATE)
    raw_r = cv2.remap(rect_r.astype(np.float32), imx, imy, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REPLICATE)
    plan = build_remap_plan(mx, my)
    # distinct BGR color stream (the aligned color camera's frame,
    # pointcloud_capture.py:40): the benched program converts BGR->RGB and
    # maps it onto the cloud, so the fps includes the real color path
    rng_c = np.random.RandomState(1)
    raw_color = np.stack([
        np.clip(rect_l * s + rng_c.rand(H, W) * 8.0, 0, 255)
        for s in (0.9, 1.0, 0.8)], axis=-1).astype(np.uint8)  # B, G, R

    # the full standard stereoRectify Q form — [0,0]=[1,1]=1 is part of the
    # assume_standard_q contract in backproject_disparity
    Q = np.zeros((4, 4), np.float32)
    Q[0, 0], Q[1, 1] = 1.0, 1.0
    Q[0, 3], Q[1, 3] = -W / 2.0, -H / 2.0
    Q[2, 3], Q[3, 2] = focal, 1.0 / baseline

    # Production default: 4-direction SGM with the large-jump smoothness
    # penalty raised to P2 = 96*w^2. The round-3 sweep on the real chip
    # (tools/exp_truth.py / exp_headline_fps.py) measured, end-to-end at
    # 1080p/D=128 vs the analytic truth:
    #     sgm3 (cv2-3WAY-matched)  1.248 px   33.1 fps
    #     sgm4 + P2x3              0.930 px   31.4 fps   <- this config
    #     sgm8 + P2x4              0.851 px   25.4 fps   (accuracy preset)
    #     cv2 SGBM 3WAY            1.111 px   (the reference's matcher,
    #     cv2 SGBM HH              1.019 px    depth4.py:157-170)
    # i.e. the shipped config beats the reference's production matcher by
    # 16% on ground truth while clearing the >30 fps north star. The
    # mode-matched sgm3 parity numbers are still reported below.
    mcfg = StereoMatcherConfig(
        num_disparities=D, block_size=5, mode=mode,
        p2_factor=32 if p2_mult is None else int(round(32 * p2_mult)))
    wcfg = WLSConfig()

    @jax.jit
    def frame(left_raw, right_raw, color_bgr, pln, Q):
        lg = remap_two_pass_pallas(left_raw, pln)
        rg = remap_two_pass_pallas(right_raw, pln)
        disp, valid = compute_disparity(lg, rg, mcfg, wcfg, True)
        # BGR uint8 color stream -> RGB float cloud colors
        # (pointcloud_capture.py:40 cv2.cvtColor(BGR2RGB) + map_to)
        col = color_bgr[..., ::-1].astype(jnp.float32) / 255.0
        pc = backproject_disparity(disp, Q, color=col, assume_standard_q=True)
        # scalar checksum forces the whole frame on-device
        return pc.points, pc.colors, pc.valid, disp, jnp.sum(disp)

    jl = jnp.asarray(raw_l)
    jr = jnp.asarray(raw_r)
    jc = jnp.asarray(raw_color)
    jQ = jnp.asarray(Q)
    scene = dict(W=W, H=H, D=D, rect_l=rect_l, rect_r=rect_r,
                 disp_true=disp_true, mx=mx, my=my, raw_l=raw_l,
                 raw_r=raw_r, plan=plan)
    return frame, (jl, jr, jc, plan, jQ), scene


def build_headline_split(scene, mode: str = "sgm4", p2_mult: float = 3.0):
    """The SAME headline math as build_headline's fused `frame`, chained
    as three smaller jit programs (front: remap x2 + cost/fwd/down
    kernels; mid: bwd/vert aggregation + WTA finalize; post: speckle +
    WLS + color + backproject). Intermediates stay on device — the cost
    over the fused program is two extra dispatches + the HBM round-trips
    XLA would have elided.

    This is the cold-cache fallback: round 4 found the freshly-compiled
    FUSED program pathological on first execution (145 s measured, or
    wedged) while every stage compiled standalone runs normally; the
    split reproduces the stage programs, so it stays executable even when
    the fused composition is not. Returns frame_split(jl, jr, jc, plan,
    jQ) -> same outputs as the fused frame.
    """
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.depth import sgm as _sgm
    from recon3d_tpu.depth import sgm_pallas as sp
    from recon3d_tpu.depth import wls_pallas as _wlsp
    from recon3d_tpu.ops.warp import remap_two_pass_pallas
    from recon3d_tpu.pointcloud.backproject import backproject_disparity

    W, H, D = scene["W"], scene["H"], scene["D"]
    HP = sp._ceil_to(H, 64)
    WP, _ = sp._pick_xtile(W)
    DP = sp._ceil_to(D, 128)
    p1 = 8.0 * 25
    p2 = (32 if p2_mult is None else int(round(32 * p2_mult))) * 25.0
    ndir = {"sgm3": 3, "sgm4": 4, "sgm8": 8}[mode]

    @jax.jit
    def front(l, r, pln):
        lg = remap_two_pass_pallas(l, pln)
        rg = remap_two_pass_pallas(r, pln)
        cost, v1 = sp.cost_fwd_down(lg, rg, D, 0, 5, 63, p1, p2,
                                    HP, WP, DP, ndir >= 4)
        return cost, v1, lg

    @jax.jit
    def mid(cost, v1):
        return sp.aggregate_and_finalize(
            cost, p1, p2, D, 10, 1, True, W, v1=v1,
            final_dir="up" if ndir >= 4 else "down",
            with_diag=ndir == 8)

    @jax.jit
    def post(disp_raw, valid, lg, color_bgr, Q):
        disp_raw = disp_raw[:H, :W]
        valid = valid[:H, :W]
        valid = _sgm.speckle_filter_fast(disp_raw, valid, 32.0, 50,
                                         max_disparity=DP)
        disp = jnp.where(valid, disp_raw, -1.0)
        dense = _wlsp.wls_refine_pallas(disp, valid, lg[:H, :W])
        dvalid = dense > 0
        col = color_bgr[..., ::-1].astype(jnp.float32) / 255.0
        pc = backproject_disparity(dense, Q, color=col,
                                   assume_standard_q=True)
        return pc.points, pc.colors, pc.valid, dense, jnp.sum(dense)

    def frame_split(jl, jr, jc, pln, jQ):
        cost, v1, lg = front(jl, jr, pln)
        disp_raw, valid = mid(cost, v1)
        return post(disp_raw, valid, lg, jc, jQ)

    return frame_split


# v5e peaks for the roofline extras (public figures; the clock is the
# value implied by 197 bf16 TFLOPs over 4 128x128 MXUs)
V5E_HBM_GBPS = 819.0
V5E_CLOCK_HZ = 1.5e9
V5E_VPU_LANES = 4096  # 8 sublanes x 128 lanes x 4 ALUs, f32 ops/cycle


def roofline_programs(scene):
    """The per-stage jit programs roofline() times, as
    [(name, jitted_fn, args)] — shared with tools/warm_cache.py so the
    committed cache warms the exact keys (compile-only there)."""
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.depth import sgm as _sgm
    from recon3d_tpu.depth import sgm_pallas as sp
    from recon3d_tpu.depth import wls as _wls
    from recon3d_tpu.ops.warp import remap_two_pass_pallas
    from recon3d_tpu.pointcloud.backproject import backproject_disparity

    W, H, D = scene["W"], scene["H"], scene["D"]
    HP = sp._ceil_to(H, 64)
    WP, _ = sp._pick_xtile(W)
    DP = sp._ceil_to(D, 128)
    jl = jnp.asarray(scene["raw_l"])
    jr = jnp.asarray(scene["raw_r"])
    plan = scene["plan"]
    p1, p2 = 8.0 * 25, 96.0 * 25  # production sgm4_p2x96 config

    remap2 = jax.jit(lambda a, b, p: (remap_two_pass_pallas(a, p),
                                      remap_two_pass_pallas(b, p)))
    # shapes only — a compile-only caller (warm_cache) must not execute
    # anything device-side; roofline() below feeds real values
    wl, wr = jax.eval_shape(remap2, jl, jr, plan)
    cf = jax.jit(lambda l, r: sp.cost_fwd_down(
        l, r, D, 0, 5, 63, p1, p2, HP, WP, DP, True))
    cost, v1 = jax.eval_shape(cf, wl, wr)
    af = jax.jit(lambda c, v: sp.aggregate_and_finalize(
        c, p1, p2, D, 10, 1, True, W, v1=v, final_dir="up"))
    spk = jax.jit(lambda d, v: _sgm.speckle_filter_fast(
        d, v, 32.0, 50, max_disparity=DP))
    wls = jax.jit(lambda d, v, g: _wls.wls_refine(d, v, g[:H, :W]))
    Q = np.zeros((4, 4), np.float32)
    Q[0, 0], Q[1, 1] = 1.0, 1.0
    Q[0, 3], Q[1, 3], Q[2, 3], Q[3, 2] = -W / 2, -H / 2, 1050.0, 1 / 0.06
    bp = jax.jit(lambda d, q, c: backproject_disparity(
        d, q, color=c, assume_standard_q=True).points)
    dshape = jax.ShapeDtypeStruct((H, W), jnp.float32)
    vshape = jax.ShapeDtypeStruct((H, W), jnp.bool_)
    cshape = jax.ShapeDtypeStruct((H, W, 3), jnp.float32)
    return [
        ("remap2", remap2, (jl, jr, plan)),
        ("cost_fwd_down", cf, (wl, wr)),
        ("aggregate_finalize", af, (cost, v1)),
        ("speckle", spk, (dshape, vshape)),
        ("wls", wls, (dshape, vshape, wl)),
        ("backproject", bp, (dshape, jnp.asarray(Q), cshape)),
    ]


def roofline(scene, frame_ms):
    """Per-stage device time + achieved-vs-peak utilization for the
    headline frame (VERDICT r3 missing #2: '31.31 fps, 4.4% over target'
    was indistinguishable from 'leaving 2x on the floor').

    Each stage is jitted standalone and timed with a forced device
    round-trip; stages sum to slightly more than the fused frame
    (inter-stage HBM round-trips the fused program elides). The SGM core
    gets two utilization numbers:
      - achieved HBM GB/s over the analytic bytes each kernel must move
        (cost u16 written once + streamed once per pass; v1/v3 f32)
      - effective VPU vector-instructions/cycle from an op-count model of
        the path recurrence (_path_step: 2 rolls + 3 mins + 3 adds +
        ~4 selects + amortized lane reduce ~= 20 vinstr per (8,128) vreg)
    Values near 1 vinstr/cycle mean the scans are issue-bound on the VPU
    (the docstring claim in depth/sgm_pallas.py) — the roofline to beat
    needs packed 16-bit VPU arithmetic Mosaic doesn't expose, not better
    scheduling."""
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.depth import sgm_pallas as sp

    W, H, D = scene["W"], scene["H"], scene["D"]
    HP = sp._ceil_to(H, 64)
    WP, _ = sp._pick_xtile(W)
    DP = sp._ceil_to(D, 128)
    jl = jnp.asarray(scene["raw_l"])
    jr = jnp.asarray(scene["raw_r"])
    plan = scene["plan"]

    # the same jit objects warm_cache compiles (key identity by
    # construction); args in the program list are shapes for the later
    # stages — real intermediates flow below
    progs = {name: fn for name, fn, _ in roofline_programs(scene)}

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        return out, (time.perf_counter() - t0) / iters * 1e3

    (wl, wr), t_remap = timeit(progs["remap2"], jl, jr, plan)
    (cost, v1), t_cf = timeit(progs["cost_fwd_down"], wl, wr)
    (disp_raw, valid), t_af = timeit(progs["aggregate_finalize"], cost, v1)
    disp_raw, valid = disp_raw[:H, :W], valid[:H, :W]
    _, t_spk = timeit(progs["speckle"], disp_raw, valid)
    (dense,), t_wls = timeit(lambda d, v, g: (progs["wls"](d, v, g),),
                             disp_raw, valid, wl)

    Q = np.zeros((4, 4), np.float32)
    Q[0, 0], Q[1, 1] = 1.0, 1.0
    Q[0, 3], Q[1, 3], Q[2, 3], Q[3, 2] = -W / 2, -H / 2, 1050.0, 1 / 0.06
    col = jnp.repeat(wl[:H, :W, None], 3, axis=-1) / 255.0
    _, t_bp = timeit(progs["backproject"], dense, jnp.asarray(Q), col)

    # analytic HBM bytes for the 3 SGM kernels (sgm4): cost u16 written
    # once + read by each of the two downstream kernels; v1/v3 f32
    # written/read once each (v3 aliases v1 in place); planes/disp are
    # noise at this scale
    vol_u16 = HP * WP * DP * 2
    vol_f32 = HP * WP * DP * 4
    sgm_bytes = (vol_u16 + vol_f32            # kernel 1 writes cost + v1
                 + vol_u16 + 2 * vol_f32      # bwd reads cost+v1, writes v3
                 + vol_u16 + vol_f32)         # finalize reads cost + v3
    t_sgm_s = (t_cf + t_af) / 1e3
    hbm_gbps = sgm_bytes / 1e9 / t_sgm_s
    # VPU issue model: pass-equivalents over the volume x ~20 vinstr per
    # (8,128)-element vreg. cost+fwd+down ~= BT/box cost build (~2) + 2
    # path scans; bwd = 1; up+finalize = 1 + finalize ladder (~2).
    vregs = HP * WP * DP / 1024.0
    vinstr = vregs * 20.0 * (2 + 2 + 1 + 1 + 2)
    vpu_ipc = vinstr / (t_sgm_s * V5E_CLOCK_HZ)

    return {
        "stage_remap2_ms": round(t_remap, 2),
        "stage_cost_fwd_down_ms": round(t_cf, 2),
        "stage_bwd_vert_finalize_ms": round(t_af, 2),
        "stage_speckle_ms": round(t_spk, 2),
        "stage_wls_ms": round(t_wls, 2),
        "stage_backproject_ms": round(t_bp, 2),
        "stage_sum_ms": round(t_remap + t_cf + t_af + t_spk + t_wls
                              + t_bp, 2),
        "fused_frame_ms": round(frame_ms, 2),
        "sgm_hbm_gb_analytic": round(sgm_bytes / 1e9, 2),
        "sgm_hbm_gbps_achieved": round(hbm_gbps, 1),
        "sgm_hbm_util_pct": round(100.0 * hbm_gbps / V5E_HBM_GBPS, 1),
        "sgm_vpu_vinstr_per_cycle": round(vpu_ipc, 2),
    }


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from recon3d_tpu.depth import sgm_pallas
    from recon3d_tpu.ops.warp import remap_two_pass_pallas

    # Soft wall-clock budget for the EXTRAS: on a cold cache every
    # section pays its own compile + the axon first-execution penalty
    # (2-5 min per program — and the persistent-cache key rotates with
    # the axon server's state, so a fresh driver session can cold-miss
    # the entire committed cache). Sections past the deadline are
    # skipped so the headline JSON line ALWAYS prints inside the
    # driver's budget; extras go null instead of the whole round.
    budget_s = float(os.environ.get("RECON3D_BENCH_BUDGET_S", "1200"))
    deadline = time.perf_counter() + budget_s
    # sections may START before the soft deadline but must also FINISH
    # before the hard one — their guards shrink to the remaining time
    hard_s = float(os.environ.get("RECON3D_BENCH_HARD_S", "1650"))
    hard_deadline = time.perf_counter() + hard_s

    def over_budget(name: str) -> bool:
        if time.perf_counter() > deadline:
            hb(f"{name}: SKIPPED (soft budget {budget_s:.0f}s exhausted)")
            return True
        return False

    def guard_for(nominal: int) -> int:
        return max(60, min(nominal,
                           int(hard_deadline - time.perf_counter())))

    hb("build_headline: start")
    frame, (jl, jr, jc, plan, jQ), scene = build_headline()
    W, H, D = scene["W"], scene["H"], scene["D"]
    rect_l, rect_r = scene["rect_l"], scene["rect_r"]
    disp_true = scene["disp_true"]
    mx, my = scene["mx"], scene["my"]
    raw_l, raw_r = scene["raw_l"], scene["raw_r"]

    # Compile + first execution, guarded separately: round-4's driver run
    # burned its whole 30-minute budget inside the silent first execution
    # of a freshly-compiled fused frame (cold compile ~40 s, first exec
    # 145 s measured — or wedged). The guard turns a wedge into an
    # attributable heartbeat line + fallback instead of a silent timeout.
    compiled = None
    compile_s = -1.0
    frame_exec_s = None
    try:
        with section_guard("headline compile", 900):
            t0 = time.perf_counter()
            compiled = frame.lower(jl, jr, jc, plan, jQ).compile()
            compile_s = time.perf_counter() - t0
        with section_guard("headline first-exec", 420):
            t0 = time.perf_counter()
            out = compiled(jl, jr, jc, plan, jQ)
            _ = float(out[-1])
            frame_exec_s = time.perf_counter() - t0
    except _SectionTimeout:
        # the fused program wedged compiling or on its first run: fall
        # back to the stage-chained variant (same math, 3 smaller
        # programs) so the round still records a headline number
        hb("headline fused path wedged; falling back to split pipeline")
        compiled = None
    headline_program = "fused"
    if compiled is None:
        try:
            with section_guard("headline split fallback", 900):
                compiled = build_headline_split(scene)
                out = compiled(jl, jr, jc, plan, jQ)
                _ = float(out[-1])
            headline_program = "split"
        except _SectionTimeout:
            compiled = None

    n_iters = 60
    fps = 0.0
    if compiled is not None:
        try:
            with section_guard("headline timing", 600):
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    out = compiled(jl, jr, jc, plan, jQ)
                _ = float(out[-1])  # device round-trip: queue executed
                dt = time.perf_counter() - t0
            fps = n_iters / dt
        except _SectionTimeout:
            pass
    if fps == 0.0:
        # both programs wedged: the JSON line still prints (value 0.0,
        # program 'failed') so the driver records an attributable result
        # instead of a timeout
        headline_program = "failed"
        hb("headline UNMEASURED: fused and split both wedged")
    hb("headline", fps=round(fps, 2), program=headline_program,
       compile_s=round(compile_s, 1),
       first_exec_s=None if frame_exec_s is None else round(frame_exec_s, 1))

    # per-stage device time + roofline utilization (guarded: must never
    # lose the headline line)
    roof = {}
    try:
        if not over_budget("roofline"):
            with section_guard("roofline", guard_for(900)):
                roof = roofline(scene, 1000.0 / fps if fps else 0.0)
    except (Exception, _SectionTimeout) as e:  # pragma: no cover
        print(f"# roofline extras skipped: {type(e).__name__}", flush=True)

    # ---- accuracy (the BASELINE metric): pre-WLS parity vs cv2.StereoSGBM
    # on a rectified pair, both consuming identical uint8 images (cv2 cannot
    # take floats; comparing float-input-ours vs uint8-input-cv2 would
    # measure input quantization, not the matcher)
    to8 = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)
    rect_ours_l, rect_ours_r = to8(rect_l), to8(rect_r)
    disp_p = valid_p = None
    try:
        if over_budget("accuracy sgm3 parity"):
            raise _SectionTimeout("budget")
        with section_guard("accuracy sgm3 parity", guard_for(900)):
            disp_p, valid_p = sgm_pallas.sgm_disparity_pallas(
                jnp.asarray(rect_ours_l, jnp.float32),
                jnp.asarray(rect_ours_r, jnp.float32),
                num_disparities=D, block_size=5, num_directions=3)
            disp_p, valid_p = np.asarray(disp_p), np.asarray(valid_p)
    except _SectionTimeout:
        pass

    def cv_disp(mode):
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=D, blockSize=5,
            P1=8 * 25, P2=32 * 25, disp12MaxDiff=1, uniquenessRatio=10,
            speckleWindowSize=50, speckleRange=32, preFilterCap=63,
            mode=mode)
        return sgbm.compute(rect_ours_l, rect_ours_r).astype(np.float32) / 16.0

    def rmse_vs(d_cv):
        both = valid_p & (d_cv > 0)
        return float(np.sqrt(((disp_p[both] - d_cv[both]) ** 2).mean())), both

    # mode-matched oracle: the reference's matcher is MODE_SGBM_3WAY
    # (depth4.py:157-170), direction set {L,R,down} — exactly sgm3; cv2's
    # default 5-path mode is reported alongside
    mode3 = cv2.STEREO_SGBM_MODE_SGBM_3WAY
    rmse_cv = rmse_cv_default = rmse_cv_hh = both = None
    if disp_p is not None:
        rmse_cv, both = rmse_vs(cv_disp(mode3))
        rmse_cv_default, _ = rmse_vs(cv_disp(cv2.STEREO_SGBM_MODE_SGBM))
        # full 8-path mode: the capability edge the Pallas fast path
        # waives (tests/test_depth.py::test_direction_count_accuracy_waiver)
        rmse_cv_hh, _ = rmse_vs(cv_disp(cv2.STEREO_SGBM_MODE_HH))
    sgbm = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=D, blockSize=5,
        P1=8 * 25, P2=32 * 25, disp12MaxDiff=1, uniquenessRatio=10,
        speckleWindowSize=50, speckleRange=32, preFilterCap=63, mode=mode3)

    # end-to-end pipelines on the same raw pair + maps: ours (two-pass warp
    # + Pallas SGM) vs cv2's (cv2.remap + SGBM), BOTH now performing a true
    # rectification, so both are also scored against the analytic truth and
    # the divergence decomposes by swapping one stage at a time.
    # Guarded: the full-pipeline cross-check must not lose the headline.
    rmse_cv_full = full_ours_truth = full_cv2_truth = None
    decomp_matcher = decomp_warp = full_ours_truth_mm = None
    _sg = section_guard("full-pipeline cross-check", guard_for(1200))
    _sg.__enter__()
    try:
        if over_budget("full-pipeline cross-check"):
            raise _SectionTimeout("budget")

        def rmse(a, b, m):
            return round(float(np.sqrt(((a[m] - b[m]) ** 2).mean())), 4)

        # geometrically valid interior: the radial warp displaces up to
        # ~45 px at the 1080p corners, so a border strip of the
        # doubly-warped images holds replicate-padded junk that matchers
        # may mark valid — real rectified outputs carry the same invalid
        # margins and consumers crop them. All full-pipeline metrics
        # compare inside the margin.
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        m_x = int(np.ceil(np.abs(mx - xx).max())) + 2
        m_y = int(np.ceil(np.abs(my - yy).max())) + 2
        interior = np.zeros((H, W), bool)
        interior[m_y:H - m_y, m_x + D:W - m_x] = True  # +D: SGM left band

        def ours_match(l8, r8, ndir=3, p2=32 * 25):
            dd, vv = sgm_pallas.sgm_disparity_pallas(
                jnp.asarray(l8, jnp.float32), jnp.asarray(r8, jnp.float32),
                num_disparities=D, block_size=5, num_directions=ndir,
                p2=float(p2))
            return np.asarray(dd), np.asarray(vv)

        wl = to8(np.asarray(remap_two_pass_pallas(jl, plan)))
        wr = to8(np.asarray(remap_two_pass_pallas(jr, plan)))
        cvl8 = to8(cv2.remap(raw_l, mx, my, cv2.INTER_LINEAR))
        cvr8 = to8(cv2.remap(raw_r, mx, my, cv2.INTER_LINEAR))

        d_cv_full = sgbm.compute(cvl8, cvr8).astype(np.float32) / 16.0

        # ours-vs-truth runs the PRODUCTION config (sgm4, P2=96*w^2 —
        # exactly what the headline frame times); cv2-vs-truth runs the
        # reference's production matcher (3WAY). This is the
        # matching-or-beating comparison: both pipelines on the same raw
        # pair + maps, scored against the analytic disparity field.
        d_prod, v_prod = ours_match(wl, wr, ndir=4, p2=96 * 25)
        tm = v_prod & (disp_true > 1.0) & interior
        full_ours_truth = rmse(d_prod, disp_true, tm)
        tm = (d_cv_full > 0) & (disp_true > 1.0) & interior
        full_cv2_truth = rmse(d_cv_full, disp_true, tm)

        # mode-matched parity + decomposition (sgm3 == cv2 3WAY's
        # direction set, cv2's P1/P2): how close we can reproduce cv2
        # when configured identically
        d_ours_full, v_ours_full = ours_match(wl, wr)      # our warp+matcher
        both_f = v_ours_full & (d_cv_full > 0) & interior
        rmse_cv_full = rmse(d_ours_full, d_cv_full, both_f)
        full_ours_truth_mm = rmse(
            d_ours_full, disp_true,
            v_ours_full & (disp_true > 1.0) & interior)

        # decomposition: swap one stage at a time against cv2-full
        d_sw, v_sw = ours_match(cvl8, cvr8)  # cv2 warp -> OUR matcher
        m = v_sw & (d_cv_full > 0) & interior
        decomp_matcher = rmse(d_sw, d_cv_full, m)  # matcher-induced
        d_wc = sgbm.compute(wl, wr).astype(np.float32) / 16.0  # our warp -> cv2
        m = (d_wc > 0) & (d_cv_full > 0) & interior
        decomp_warp = rmse(d_wc, d_cv_full, m)     # warp-induced
    except (Exception, _SectionTimeout) as e:  # pragma: no cover
        print(f"# full-pipeline cross-check skipped: {type(e).__name__}",
              flush=True)
    finally:
        _sg.__exit__(None, None, None)

    # analytic ground truth (rendered disparity field) on the same pair;
    # the interior variant crops the left D-band (structurally unmatchable:
    # the right view lacks that content) and image borders
    rmse_truth = rmse_truth_int = None
    if disp_p is not None:
        mt = valid_p & (disp_true > 1.0)
        rmse_truth = float(np.sqrt(
            ((disp_p[mt] - disp_true[mt]) ** 2).mean()))
        core = np.zeros((H, W), bool)
        core[8:H - 8, D + 8:W - 8] = True
        mt_c = mt & core
        rmse_truth_int = float(np.sqrt(
            ((disp_p[mt_c] - disp_true[mt_c]) ** 2).mean()))

    # ---- large-N point ops: the reference's only benchmark was a CUDA
    # voxel downsample of 10M random points (test/gpu-performance.py:23-46);
    # normals at 1M exercise the voxel-binned kNN path
    # guarded: a failure in the side benchmarks must never lose the
    # headline fps/RMSE line. All large-N point ops run one-per-subprocess
    # via tools/bench_pointops.py: the axon backend intermittently rejects
    # (InvalidArgument) loading another executable into a process that has
    # already run the depth pipeline's Pallas programs, while
    # one-program-per-process runs are reliable.
    import subprocess

    def _sub_pointop(*cli):
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools", "bench_pointops.py"),
             *[str(c) for c in cli]],
            capture_output=True, text=True, timeout=900)
        return json.loads(r.stdout.strip().splitlines()[-1])["ms"]

    ms_vd10m = ms_n1m = None
    try:
        # explicit output capacity: the unit cube at voxel 0.05 holds at
        # most 21^3 ~ 9.3k occupied voxels; the old default (capacity=N)
        # made the compact buffers 10M wide, which is what OOM-killed the
        # round-1 remote compile helper
        if over_budget("voxel 10M"):
            raise _SectionTimeout("budget")
        with section_guard("voxel 10M", guard_for(900)):
            ms_vd10m = _sub_pointop("voxel", "--n", 10_000_000,
                                    "--voxel-size", 0.05,
                                    "--capacity", 1 << 14)
    except (Exception, _SectionTimeout) as e:  # pragma: no cover
        print(f"# voxel 10M extra skipped: {type(e).__name__}", flush=True)

    # sustained streaming capture->fuse throughput (check90.py's two-thread
    # SLAM): threaded producer/consumer on the golden 640x480 RealSense
    # replay, odometry+TSDF integrate per frame as ONE donated device
    # program (no per-frame host syncs). Measured after warm-up.
    streaming_fps = streaming_step_ms = streaming_put_ms = None
    capture_fps = odometry_failures = mesh_clean_ms = None
    mesh_extract_ms = mesh_full_cached_ms = mesh_incr_ms = None
    streaming_fps_resident = None
    # guard armed without `with` to keep the long body's indentation
    _sg = section_guard("streaming + mesh extras", guard_for(1800))
    _sg.__enter__()
    try:
        if over_budget("streaming + mesh extras"):
            raise _SectionTimeout("budget")
        from recon3d_tpu.camera.fake import FakeRGBDCamera
        from recon3d_tpu.config import ScannerConfig
        from recon3d_tpu.pipeline.streaming import StreamingFusion
        from recon3d_tpu.utils.types import CameraIntrinsics

        s_cam = FakeRGBDCamera("/root/reference/test/output", loop=True)
        s_cam.open()
        # decode the whole replay before the clock: the stream should
        # measure the pipeline, not this host's PNG decode speed (a live
        # sensor delivers at sensor rate)
        s_cam.wait_prefetched()
        s_intr = CameraIntrinsics(
            fx=jnp.float32(616.63), fy=jnp.float32(616.31),
            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
        # DEFAULT config: consume_batch defaults to "auto" (adaptive
        # backlog batching), so this measures what `recon3d fuse` ships
        sf = StreamingFusion(s_cam, s_intr, ScannerConfig(),
                             resolution=256)
        # compile both consumer programs BEFORE the clock starts: the
        # window below must measure steady-state throughput, not XLA
        # compiles (round-1 recorded 1.16 fps because the batch program
        # compiled inside the window)
        w_cam = FakeRGBDCamera("/root/reference/test/output")
        w_cam.open()
        w_c, w_d = w_cam.grab()
        w_cam.close()
        sf.warmup(w_c, w_d)
        # cap the capture: without it the looping replay keeps
        # dispatching while the window-edge syncs wait, and stop() then
        # drains MINUTES of queued device work (r5c's streaming section
        # took 20 min, mostly that drain)
        sf.start(max_frames=140)
        deadline = time.perf_counter() + 600.0
        while sf.frames_integrated < 17 and time.perf_counter() < deadline:
            time.sleep(0.1)  # settle: first frame + ragged pre-batch drains
        # COMPLETION-counted window: frames_integrated increments at
        # DISPATCH (the consumer never syncs), and on the axon runtime
        # dispatches can run far ahead of execution — rounds 3-4
        # recorded 26-31 "fps" while the device was completing 2.4
        # (tools/exp_resident.py measured the batch program at
        # 3.4 s/call against a 30 s window that counted 88 dispatches).
        # Draining the device INSIDE the window (sync at both edges)
        # counts only completed work.
        # (sync on a trajectory pose: poses are program OUTPUTS — the
        # volume/state buffers are donated and may already be invalid —
        # and the device queue is serial, so pose k complete means every
        # dispatch before it completed too). n0 is read AFTER draining
        # everything dispatched so far: completed == dispatched == n0 at
        # t0, and the window credits no pre-window device work.
        n0 = sf.frames_integrated
        _ = float(jnp.sum(sf.trajectory[n0 - 1]))
        t0 = time.perf_counter()
        c0 = sf.frames_captured
        # the producer dispatches its whole capped stream in seconds;
        # completed-frame throughput = frames n0..140 over the time from
        # the settle sync to the post-drain sync
        while (sf.frames_integrated < 140
               and time.perf_counter() < t0 + 600.0):
            time.sleep(0.05)
        n1 = sf.frames_integrated
        c1 = sf.frames_captured
        _ = float(jnp.sum(sf.trajectory[n1 - 1]))  # counted frames DONE
        t1 = time.perf_counter()
        sf.stop()
        # looped replay wraps (last golden frame -> frame 0) are real
        # camera jumps: expect exactly the wrap count under the bounded
        # sweep warp (tests/test_registration.py::test_replay_wrap_...)
        odometry_failures = sf.odometry_failures
        if n1 > n0:
            streaming_fps = round((n1 - n0) / (t1 - t0), 2)
            if c1 > c0:
                # the producer's dispatch rate over the same window
                # (bounded above by the host->device link)
                capture_fps = round((c1 - c0) / (t1 - t0), 2)

        # attribute the threaded number: time the fused odometry+integrate
        # device program and the per-frame host->HBM transfer in isolation.
        # On the tunneled axon chip the ~44 MB/s link is the throughput
        # ceiling (a 30 fps u16-wire VGA stream needs 45 MB/s; a
        # host-attached TPU's PCIe makes this a non-issue) — these extras
        # separate device capability from link cost.
        if sf._state is not None and sf._step is None:
            # all steady-state frames may have gone through the batched
            # program; the isolation measurement needs the per-frame step
            sf._step = sf._build_step(ScannerConfig().fusion)
        if sf._step is not None and sf._state is not None:
            s_cam2 = FakeRGBDCamera("/root/reference/test/output")
            s_cam2.open()
            f_c, f_d = s_cam2.grab_raw()  # the wire format (u8, u16)
            t0 = time.perf_counter()
            for _i in range(10):
                dc, dd = jax.device_put(f_c), jax.device_put(f_d)
            _ = float(jnp.sum(dd.astype(jnp.float32)))
            streaming_put_ms = round((time.perf_counter() - t0) / 10 * 1e3,
                                     2)
            vol, st = sf.volume, sf._state
            # warm outside the timed window (the per-frame step may never
            # have compiled if every steady-state drain hit the batch path)
            vol, st, wfc, _h = sf._step(vol, st, dc, dd)
            _ = float(jnp.sum(wfc))
            t0 = time.perf_counter()
            for _i in range(10):
                vol, st, wfc, _h = sf._step(vol, st, dc, dd)
            _ = float(jnp.sum(wfc))
            streaming_step_ms = round((time.perf_counter() - t0) / 10 * 1e3,
                                      2)

            # device-resident replay: preload 3 stacked 8-frame batches
            # once, then run the batched track+integrate program over
            # them with NO host->device traffic in the window. This is
            # the PIPELINE's sustained capability; the threaded
            # streaming_fps above additionally rides the dev tunnel
            # (~44 MB/s — less than a 30 fps stream's 45 MB/s wire
            # rate; a host-attached TPU's PCIe link makes the two
            # numbers converge).
            s_cam2._i = 0
            batches = []
            for _b in range(3):
                fr = [s_cam2.grab_raw() for _k in range(8)]
                batches.append((
                    jax.device_put(np.stack([c for c, _ in fr])),
                    jax.device_put(np.stack([d for _, d in fr]))))
            s_cam2.close()
            B8 = sf._step_batches.get(8)
            if B8 is None:
                B8 = sf._step_batches[8] = sf._build_step_batch(
                    ScannerConfig().fusion)
            vol, st, wfcs, _h = B8(vol, st, *batches[0])  # warm
            _ = float(jnp.sum(wfcs))
            t0 = time.perf_counter()
            rounds = 4
            for _r in range(rounds):
                for bc, bd in batches:
                    vol, st, wfcs, _h = B8(vol, st, bc, bd)
            _ = float(jnp.sum(wfcs))
            streaming_fps_resident = round(
                rounds * 3 * 8 / (time.perf_counter() - t0), 2)

            # fused volume -> triangle mesh (marching tetrahedra) on-device:
            # the streaming pipeline's mesh-extraction stage (check90.py's
            # extract_triangle_mesh consumer; BASELINE config #5)
            from recon3d_tpu.fusion import marching as _marching
            mesh = _marching.extract_triangle_mesh(vol)  # compile + warm
            _ = float(jnp.sum(mesh.vertices))
            t0 = time.perf_counter()
            mesh = _marching.extract_triangle_mesh(vol)
            _ = float(jnp.sum(mesh.vertices))
            mesh_extract_ms = round((time.perf_counter() - t0) * 1e3, 1)

            # incremental re-extract (live remesh loop): integrate ONE
            # more frame into the fused volume, then re-mesh via the
            # dirty-slab cache + device-resident hash weld — the number a
            # live viewer pays per re-mesh after the first
            from recon3d_tpu.fusion.incremental import IncrementalMesher
            im = IncrementalMesher(resolution=vol.resolution)
            m0 = im.mesh_device(vol)          # full build (all dirty)
            _ = float(jnp.sum(m0.vertices))
            t0 = time.perf_counter()
            im.mark_all_dirty()
            m0 = im.mesh_device(vol)
            _ = float(jnp.sum(m0.vertices))
            mesh_full_cached_ms = round((time.perf_counter() - t0) * 1e3, 1)
            # clean cache: nothing dirty, the emit-only floor a live
            # viewer pays between integrates
            t0 = time.perf_counter()
            m0 = im.mesh_device(vol)
            _ = float(jnp.sum(m0.vertices))
            mesh_clean_ms = round((time.perf_counter() - t0) * 1e3, 1)
            # a LOCALIZED update: keep only a narrow depth band of the
            # frame (a close object / partial view), so the touched
            # voxels land in a few z-slabs. A full-frustum frame dirties
            # nearly every z-slab of a dense volume (the camera looks
            # down +z), which degenerates incremental == full — the
            # dirty-slab win is for updates that don't re-observe the
            # whole scene, which is what a live remesh loop refreshes on.
            ddf = np.asarray(dd, np.float32) / 1000.0 \
                if np.asarray(dd).dtype == np.uint16 else np.asarray(dd)
            zmid = float(np.median(ddf[ddf > 0])) if (ddf > 0).any() else 1.5
            # a close OBJECT in front of the scene (a 40 px disc ~0.35 m
            # nearer than the median surface): few dirty z-slabs with
            # SPARSE content — the case the small-cap refresh variant
            # serves, and what a live remesh loop actually refreshes on.
            # A full-frame depth band at the surface's own z would
            # concentrate the whole wall in the dirty slabs (z-slab
            # worst case) and measure a half-scene re-mesh instead.
            hh, ww = ddf.shape
            yy, xx = np.mgrid[0:hh, 0:ww]
            disc = ((yy - hh // 2) ** 2 + (xx - ww // 2) ** 2) < 40 ** 2
            dd_loc = jnp.asarray(
                np.where(disc, max(zmid - 0.35, 0.4), 0.0)
                .astype(np.float32))
            vol = im.integrate(vol, dd_loc, s_intr,
                               jnp.eye(4, dtype=jnp.float32))
            m1 = im.mesh_device(vol)          # warm the partial program
            _ = float(jnp.sum(m1.vertices))
            vol = im.integrate(vol, dd_loc, s_intr,
                               jnp.eye(4, dtype=jnp.float32))
            t0 = time.perf_counter()
            m1 = im.mesh_device(vol)
            _ = float(jnp.sum(m1.vertices))
            mesh_incr_ms = round((time.perf_counter() - t0) * 1e3, 1)
    except (Exception, _SectionTimeout) as e:  # pragma: no cover
        print(f"# streaming extra skipped: {type(e).__name__}", flush=True)
    finally:
        _sg.__exit__(None, None, None)

    try:
        # grid sized to the data: 52 cells * 0.02 cover the unit cube
        # (a 64 grid spans 1.28 and wastes 45% of the slab work)
        if over_budget("normals 1M"):
            raise _SectionTimeout("budget")
        with section_guard("normals 1M", guard_for(900)):
            ms_n1m = _sub_pointop("normals", "--n", 1_000_000,
                                  "--radius", 0.02, "--grid", 52,
                                  "--cap", 16)
    except (Exception, _SectionTimeout) as e:  # pragma: no cover
        print(f"# normals 1M extra skipped: {type(e).__name__}", flush=True)

    ms_n10m = None
    try:
        # 10M-point normals at the reference benchmark's cloud scale
        # (test/gpu-performance.py:23-46 uses 10M random unit-cube points):
        # radius shrinks so the 128-cell grid spans the cube (128*0.008 =
        # 1.024) and mean cell occupancy stays ~5 of capacity 16
        if over_budget("normals 10M"):
            raise _SectionTimeout("budget")
        with section_guard("normals 10M", guard_for(900)):
            ms_n10m = _sub_pointop("normals", "--n", 10_000_000,
                                   "--radius", 0.008, "--grid", 128,
                                   "--cap", 16)
    except (Exception, _SectionTimeout) as e:  # pragma: no cover
        print(f"# normals 10M extra skipped: {type(e).__name__}", flush=True)

    print(json.dumps({
        "metric": "stereo_1080p_pair_to_colored_cloud_fps",
        "value": round(fps, 3),
        "unit": "fps/chip",
        "vs_baseline": round(fps / 30.0, 3),
        "extras": {
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "num_disparities": D,
            "includes_remap": True,
            "ms_per_frame": round(1000.0 / fps, 2) if fps else None,
            "compile_s": round(compile_s, 1),
            "first_exec_s": None if frame_exec_s is None
            else round(frame_exec_s, 2),
            "headline_program": headline_program,
            "rmse_vs_cv2_sgbm_px": None if rmse_cv is None
            else round(rmse_cv, 4),
            "rmse_vs_cv2_sgbm_5path_px": None if rmse_cv_default is None
            else round(rmse_cv_default, 4),
            "rmse_vs_cv2_sgbm_hh_px": None if rmse_cv_hh is None
            else round(rmse_cv_hh, 4),
            "headline_matcher": "sgm4_p2x96",
            "rmse_vs_cv2_full_pipeline_px": rmse_cv_full,
            "full_ours_vs_truth_px": full_ours_truth,
            "full_cv2_vs_truth_px": full_cv2_truth,
            "full_ours_vs_truth_modematched_px": full_ours_truth_mm,
            "full_decomp_matcher_px": decomp_matcher,
            "full_decomp_warp_px": decomp_warp,
            "rmse_vs_analytic_truth_px": None if rmse_truth is None
            else round(rmse_truth, 4),
            "rmse_vs_analytic_truth_interior_px": None
            if rmse_truth_int is None else round(rmse_truth_int, 4),
            "both_valid_frac": None if both is None
            else round(float(both.mean()), 3),
            "voxel_downsample_10m_ms": ms_vd10m,
            "normals_1m_ms": ms_n1m,
            "normals_10m_ms": ms_n10m,
            "streaming_fps": streaming_fps,
            "streaming_fps_resident": streaming_fps_resident,
            "capture_fps": capture_fps,
            "odometry_failures": odometry_failures,
            "streaming_step_ms": streaming_step_ms,
            "streaming_put_ms": streaming_put_ms,
            "mesh_remesh_clean_ms": mesh_clean_ms,
            "mesh_extract_256_ms": mesh_extract_ms,
            "mesh_extract_full_device_ms": mesh_full_cached_ms,
            "mesh_extract_incremental_ms": mesh_incr_ms,
            **roof,
        },
    }))


if __name__ == "__main__":
    main()
