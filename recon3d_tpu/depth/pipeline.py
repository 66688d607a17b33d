"""Real-time stereo depth pipeline: the depth4.py equivalent.

Wires the calibrated rig to the matcher: NPZ checkpoint -> rectification
maps -> one fused jit program per frame (remap x2 -> grayscale -> SGM ->
WLS -> depth -> display colormap), mirroring depth4.py's main loop
(depth4.py:238-292) but as a single XLA program with no host round-trips
between stages. Interactive tuning maps to config.adjust (depth4.py:295-365).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.calib import stereo as _stereo
from recon3d_tpu.calib.npz import StereoParams
from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
from recon3d_tpu.depth import matcher as _matcher
from recon3d_tpu.ops import image as im
from recon3d_tpu.ops import warp as _warp


def _to_gray(x):
    x = jnp.asarray(x, jnp.float32)
    return im.rgb_to_gray(x) if x.ndim == 3 else x


@partial(jax.jit, static_argnames=("mcfg", "wcfg", "with_wls"))
def depth_step(
    left_raw: jax.Array,
    right_raw: jax.Array,
    map1x: jax.Array, map1y: jax.Array,
    map2x: jax.Array, map2y: jax.Array,
    Q: jax.Array,
    mcfg: StereoMatcherConfig,
    wcfg: WLSConfig,
    with_wls: bool = True,
):
    """One fused frame step: raw pair -> (disparity, depth, jet visualization).

    Equivalent of depth4.py:246-262 (remap -> cvtColor -> SGBM x2 -> WLS ->
    normalize -> colormap) as a single XLA program. Gather-based remap; the
    production path is depth_step_planned (two-pass gather-free warp).
    """
    lg = im.remap(_to_gray(left_raw), map1x, map1y)
    rg = im.remap(_to_gray(right_raw), map2x, map2y)
    disp, valid = _matcher.compute_disparity(lg, rg, mcfg, wcfg, with_wls)
    depth = _matcher.disparity_to_depth(disp, Q)
    vis = im.colormap_jet(im.normalize_minmax(jnp.where(valid, disp, 0.0), 0.0, 1.0))
    return disp, depth, vis


@partial(jax.jit, static_argnames=("mcfg", "wcfg", "with_wls"))
def depth_step_planned(
    left_raw: jax.Array,
    right_raw: jax.Array,
    plan1: _warp.RemapPlan,
    plan2: _warp.RemapPlan,
    Q: jax.Array,
    mcfg: StereoMatcherConfig,
    wcfg: WLSConfig,
    with_wls: bool = True,
):
    """depth_step with the gather-free two-pass rectification warp
    (ops.warp): the TPU hot-path variant of depth4.py:246-262."""
    import jax

    if jax.default_backend() == "tpu":
        # VMEM-resident Pallas warp (bitwise-equal, ~1.5x faster at 1080p;
        # falls back internally on unaligned shapes)
        lg = _warp.remap_two_pass_pallas(_to_gray(left_raw), plan1)
        rg = _warp.remap_two_pass_pallas(_to_gray(right_raw), plan2)
    else:
        lg = _warp.remap_two_pass(_to_gray(left_raw), plan1)
        rg = _warp.remap_two_pass(_to_gray(right_raw), plan2)
    disp, valid = _matcher.compute_disparity(lg, rg, mcfg, wcfg, with_wls)
    depth = _matcher.disparity_to_depth(disp, Q)
    vis = im.colormap_jet(im.normalize_minmax(jnp.where(valid, disp, 0.0), 0.0, 1.0))
    return disp, depth, vis


class DepthPipeline:
    """Calibrated stereo rig -> streaming depth (depth4.py main()).

    pipe = DepthPipeline.from_npz("rig_stereo.npz", (960, 540))
    disp, depth, vis = pipe.process(left_raw, right_raw)
    pipe.adjust('w')   # live numDisparities bump
    """

    def __init__(
        self,
        params: StereoParams,
        image_size: Tuple[int, int],
        matcher_config: StereoMatcherConfig = StereoMatcherConfig(),
        wls_config: WLSConfig = WLSConfig(),
        with_wls: bool = True,
    ):
        params.validate_for_depth()
        self.params = params
        self.image_size = image_size
        self.matcher_config = matcher_config
        self.wls_config = wls_config
        self.with_wls = with_wls
        # rectification maps (depth4.py:125-149), float32, device-resident
        m1x, m1y = _stereo.rectify_maps(params.mtx1, params.dist1,
                                        params.R1, params.P1, image_size)
        m2x, m2y = _stereo.rectify_maps(params.mtx2, params.dist2,
                                        params.R2, params.P2, image_size)
        self.maps = tuple(jax.device_put(m) for m in (m1x, m1y, m2x, m2y))
        self.Q = jnp.asarray(params.Q, jnp.float32)
        # two-pass gather-free warp plans (ops.warp); falls back to the
        # gather remap when a map isn't row-monotonic
        try:
            import numpy as _np

            self.plans = (_warp.build_remap_plan(_np.asarray(m1x), _np.asarray(m1y)),
                          _warp.build_remap_plan(_np.asarray(m2x), _np.asarray(m2y)))
        except ValueError:
            self.plans = None

    @classmethod
    def from_npz(cls, path: str, image_size: Tuple[int, int], **kw) -> "DepthPipeline":
        params = StereoParams.load(path)
        if params.R1 is None:
            # raw-schema NPZ: compute rectification here (calib1.py:179-183)
            import numpy as _np

            rect = _stereo.stereo_rectify(
                params.mtx1, params.dist1, params.mtx2, params.dist2,
                image_size, params.R, params.T,
            )
            params = dataclasses.replace(
                params,
                R1=_np.asarray(rect.R1), R2=_np.asarray(rect.R2),
                P1=_np.asarray(rect.P1), P2=_np.asarray(rect.P2),
                Q=_np.asarray(rect.Q),
            )
        return cls(params, image_size, **kw)

    def adjust(self, key: str) -> None:
        """Keyboard tuning: q/a block size, w/s disparities, e/d lambda,
        r/f sigma (depth4.py:295-365)."""
        self.matcher_config = self.matcher_config.adjust(key)
        self.wls_config = self.wls_config.adjust(key)

    def process(self, left_raw, right_raw):
        if self.plans is not None:
            return depth_step_planned(
                jnp.asarray(left_raw), jnp.asarray(right_raw),
                self.plans[0], self.plans[1], self.Q,
                self.matcher_config, self.wls_config, self.with_wls,
            )
        m1x, m1y, m2x, m2y = self.maps
        return depth_step(
            jnp.asarray(left_raw), jnp.asarray(right_raw),
            m1x, m1y, m2x, m2y, self.Q,
            self.matcher_config, self.wls_config, self.with_wls,
        )

    def run(self, camera_left, camera_right, max_frames: Optional[int] = None,
            on_frame=None):
        """Host capture loop over two ThreadedCameras (depth4.py:238-292)."""
        from recon3d_tpu.utils.logging import FPSCounter, make_logger

        log = make_logger("depth")
        fps = FPSCounter(log, "depth")
        n = 0
        while max_frames is None or n < max_frames:
            ok_l, fl = camera_left.read()
            ok_r, fr = camera_right.read()
            if not (ok_l and ok_r):
                continue
            out = self.process(fl[0], fr[0])
            n += 1
            fps.tick()
            if on_frame is not None and on_frame(n, out) is False:
                break
        return n
