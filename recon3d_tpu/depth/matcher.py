"""StereoMatcher: the user-facing disparity/depth API.

Mirrors the reference's matcher setup + compute loop
(depth4.py:151-177 initialize_stereo_matcher, 246-262 per-frame loop):
one object holds the matcher + WLS configuration, exposes a single jitted
`compute` that goes raw stereo pair -> refined disparity + metric depth,
and supports live parameter adjustment (config.adjust) without recompiling
for same-shape inputs (a new config means a new jit cache entry; shapes are
the expensive axis and stay fixed).

Also provides BM mode (depth.py:176-179's StereoBM path) as SGM with zero
smoothness penalties on a SAD cost, and reproject_image_to_3d (the Q-matrix
backprojection, cv2.reprojectImageTo3D).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
from recon3d_tpu.depth import sgm as _sgm
from recon3d_tpu.depth import wls as _wls
from recon3d_tpu.ops import image as im


@partial(jax.jit, static_argnames=("matcher", "wls", "with_wls"))
def compute_disparity(
    left_gray: jax.Array,
    right_gray: jax.Array,
    matcher: StereoMatcherConfig = StereoMatcherConfig(),
    wls: WLSConfig = WLSConfig(),
    with_wls: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Gray pair -> (disparity float32 px, valid bool). Dense if with_wls."""
    mode = matcher.mode
    if mode == "bm":
        # StereoBM: pure block SAD, no path smoothness (depth.py:176-179)
        num_directions, p1, p2 = 4, 0.0, 0.0
    else:
        num_directions = {"sgm8": 8, "sgm3": 3}.get(mode, 4)
        p1, p2 = float(matcher.p1()), float(matcher.p2())

    backend = matcher.backend
    on_tpu = jax.default_backend() == "tpu"
    if backend == "auto":
        backend = "pallas" if on_tpu else "xla"
    if backend == "pallas":
        from recon3d_tpu.depth import sgm_pallas as _sgmp

        # an explicit backend="pallas" off-TPU runs the SAME kernels in
        # interpret mode — this is how the multi-device tests and the
        # driver dryrun exercise the production path on the virtual mesh
        interpret = not on_tpu
        speckle_method = matcher.speckle_method
        if speckle_method == "auto":
            speckle_method = "fast"
        disp, valid = _sgmp.sgm_disparity_pallas(
            left_gray, right_gray,
            num_disparities=matcher.num_disparities,
            block_size=matcher.block_size,
            p1=p1, p2=p2,
            num_directions=num_directions,
            uniqueness_ratio=matcher.uniqueness_ratio,
            disp12_max_diff=matcher.disp12_max_diff if matcher.lr_check else -1,
            speckle_window_size=matcher.speckle_window_size,
            speckle_range=float(matcher.speckle_range),
            pre_filter_cap=matcher.pre_filter_cap,
            do_subpixel=matcher.subpixel,
            speckle_method=speckle_method,
            interpret=interpret,
        )
    else:
        disp, valid = _sgm.sgm_disparity(
            left_gray, right_gray,
            num_disparities=matcher.num_disparities,
            block_size=matcher.block_size,
            p1=p1, p2=p2,
            num_directions=num_directions,
            uniqueness_ratio=matcher.uniqueness_ratio,
            disp12_max_diff=matcher.disp12_max_diff if matcher.lr_check else -1,
            speckle_window_size=matcher.speckle_window_size,
            speckle_range=float(matcher.speckle_range),
            pre_filter_cap=matcher.pre_filter_cap,
            do_subpixel=matcher.subpixel,
        )
    if with_wls:
        if backend == "pallas":
            from recon3d_tpu.depth import wls_pallas as _wlsp

            disp = _wlsp.wls_refine_pallas(
                disp, valid, left_gray, lam=wls.lam,
                sigma_color=wls.sigma_color, iterations=wls.iterations,
                interpret=not on_tpu)
        else:
            disp = _wls.wls_refine(disp, valid, left_gray,
                                   lam=wls.lam, sigma_color=wls.sigma_color,
                                   iterations=wls.iterations)
        valid = disp > 0
    return disp, valid


def disparity_to_depth(disparity: jax.Array, Q: jax.Array) -> jax.Array:
    """Metric depth from disparity via the Q matrix: Z = Q23 / (Q32 * d + Q33)
    for the standard rectified form (zeros elsewhere). Invalid (<=0)
    disparities give depth 0."""
    Q = jnp.asarray(Q, jnp.float32)
    denom = Q[3, 2] * disparity + Q[3, 3]
    z = Q[2, 3] / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    z = jnp.abs(z)
    return jnp.where(disparity > 0, z, 0.0)


def reproject_image_to_3d(disparity: jax.Array, Q: jax.Array) -> jax.Array:
    """cv2.reprojectImageTo3D: (H, W) disparity -> (H, W, 3) points.

    Full homogeneous transform [X Y Z W]^T = Q [x y d 1]^T, supporting
    general Q (including nonzero Q[0,1] etc.).
    """
    Q = jnp.asarray(Q, jnp.float32)
    H, W = disparity.shape
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ones = jnp.ones_like(disparity)
    vec = jnp.stack([x, y, jnp.asarray(disparity, jnp.float32), ones], -1)
    out = vec @ Q.T
    w = out[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return out[..., :3] / w


class StereoMatcher:
    """Object API over compute_disparity with live tuning.

    matcher = StereoMatcher(cfg, wls_cfg, Q=params.Q)
    disp, depth = matcher.compute(left_gray, right_gray)
    matcher.adjust('q')   # live block-size bump (depth4.py:295-365)
    """

    def __init__(self, config: StereoMatcherConfig = StereoMatcherConfig(),
                 wls: WLSConfig = WLSConfig(),
                 Q: Optional[np.ndarray] = None,
                 with_wls: bool = True):
        self.config = config
        self.wls = wls
        self.Q = None if Q is None else jnp.asarray(Q, jnp.float32)
        self.with_wls = with_wls

    def adjust(self, key: str) -> None:
        self.config = self.config.adjust(key)
        self.wls = self.wls.adjust(key)

    def compute(self, left, right) -> Tuple[jax.Array, Optional[jax.Array]]:
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        if left.ndim == 3:
            left = im.rgb_to_gray(left)
            right = im.rgb_to_gray(right)
        disp, valid = compute_disparity(left, right, self.config, self.wls,
                                        self.with_wls)
        depth = None if self.Q is None else disparity_to_depth(disp, self.Q)
        return disp, depth
