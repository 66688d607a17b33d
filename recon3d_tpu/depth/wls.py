"""Confidence-weighted fast global smoothing (WLS) disparity refinement.

Replaces cv2.ximgproc.createDisparityWLSFilter + right-matcher consistency
filtering (depth4.py:173-177, 259). The filter is the Fast Global Smoother
(separable spectral WLS): T sweeps alternating horizontal/vertical 1D
weighted-least-squares solves with guide-edge-aware weights
w(p,q) = exp(-|I_p - I_q| / sigma_color) and per-sweep
lambda_t = 1.5 * lam * 4^(T-t) / (4^T - 1).

Each 1D solve is a tridiagonal (Thomas) system:
    (c_p + lam*(w_l + w_r)) u_p - lam*w_l u_{p-1} - lam*w_r u_{p+1} = c_p d_p
with data confidence c_p (0 on invalid pixels, so holes in-fill by
diffusion — subsuming the reference's WLS confidence map from the
left/right matcher pair). The forward/backward sweeps are lax.scans over
the solve axis, vectorized across all rows/columns at once — the same
carried-scan structure as the SGM kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from recon3d_tpu.utils.vma import vary_like


# Minimum interior edge weight. With a full-range (0..255) guide and the
# production sigma=1.5, exp(-|dI|/sigma) underflows to 0 across strong
# edges; a zero-confidence pixel enclosed by such edges would make the
# tridiagonal system exactly singular and its output scheduler-dependent
# garbage. The floor keeps every pixel weakly coupled (lam*1e-6 ~ 8e-3 at
# the production lambda), so holes in-fill deterministically; where weights
# are non-degenerate (>=1e-3) the effect is negligible.
WEIGHT_FLOOR = 1e-6


def _edge_weights(guide: jax.Array, axis: int, sigma_color: float) -> jax.Array:
    """w[i] = weight of the edge between pixel i-1 and i along axis (w[0]=0)."""
    g = jnp.asarray(guide, jnp.float32)
    d = jnp.abs(jnp.diff(g, axis=axis))
    if g.ndim == 3:  # color guide: L1 over channels (ximgproc uses total diff)
        d = jnp.sum(d, axis=-1)
    w = jnp.maximum(jnp.exp(-d / jnp.float32(sigma_color)),
                    jnp.float32(WEIGHT_FLOOR))
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0)
    return jnp.pad(w, pad)


def _tridiag_solve_lastaxis(wl: jax.Array, wr: jax.Array, diag: jax.Array,
                            rhs: jax.Array) -> jax.Array:
    """Thomas algorithm along the last axis, batched over leading axes.

    System per row: -wl[i] u[i-1] + diag[i] u[i] - wr[i] u[i+1] = rhs[i],
    with wl[0] = wr[-1] = 0.
    """
    a = -wl  # sub-diagonal
    c = -wr  # super-diagonal

    def fwd(carry, x):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = x
        denom = bi - ai * cp_prev
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    T = rhs.shape[-1]
    xs = (jnp.moveaxis(a, -1, 0), jnp.moveaxis(diag, -1, 0),
          jnp.moveaxis(c, -1, 0), jnp.moveaxis(rhs, -1, 0))
    zeros = vary_like(jnp.zeros(rhs.shape[:-1], rhs.dtype), rhs)
    _, (cps, dps) = jax.lax.scan(fwd, (zeros, zeros), xs, unroll=16)

    def bwd(u_next, x):
        cp, dp = x
        u = dp - cp * u_next
        return u, u

    _, us = jax.lax.scan(bwd, zeros, (cps, dps), reverse=True, unroll=16)
    return jnp.moveaxis(us, 0, -1)


@partial(jax.jit, static_argnames=("iterations",))
def fast_global_smoother(
    data: jax.Array,
    guide: jax.Array,
    confidence: jax.Array,
    lam: float = 8000.0,
    sigma_color: float = 1.5,
    iterations: int = 3,
) -> jax.Array:
    """Edge-aware WLS smoothing of `data` guided by `guide`.

    data: (H, W) float; guide: (H, W) or (H, W, 3) in 0..255 units;
    confidence: (H, W) in [0, 1]. Defaults mirror depth4.py:175-176
    (lambda 8000, sigma 1.5).
    """
    d = jnp.asarray(data, jnp.float32)
    conf = jnp.asarray(confidence, jnp.float32)
    lam_total = jnp.float32(lam)

    wx = _edge_weights(guide, 1, sigma_color)  # (H, W): left-edge weights
    wy = _edge_weights(guide, 0, sigma_color)  # (H, W): top-edge weights

    u = d
    denom4 = float(4 ** iterations - 1)
    for t in range(iterations):
        lam_t = 1.5 * float(4 ** (iterations - t - 1)) / denom4
        lt = lam_total * lam_t
        # horizontal pass
        wl = wx * lt
        wr = jnp.concatenate([wx[:, 1:], jnp.zeros_like(wx[:, :1])], 1) * lt
        diag = conf + wl + wr
        u = _tridiag_solve_lastaxis(wl, wr, diag, conf * u)
        # vertical pass (transpose, solve, transpose back)
        wlv = (wy * lt).T
        wrv = jnp.concatenate([wy[1:, :], jnp.zeros_like(wy[:1, :])], 0).T * lt
        diagv = conf.T + wlv + wrv
        u = _tridiag_solve_lastaxis(wlv, wrv, diagv, (conf * u).T).T
    return u


def wls_refine(
    disparity: jax.Array,
    valid: jax.Array,
    guide_gray: jax.Array,
    lam: float = 8000.0,
    sigma_color: float = 1.5,
    iterations: int = 3,
    lrc_conf: jax.Array | None = None,
) -> jax.Array:
    """Disparity post-filter: confidence from the validity mask (plus an
    optional LR-consistency soft confidence), smoothed by the FGS.

    Returns a dense (hole-filled) refined disparity.
    """
    conf = jnp.asarray(valid, jnp.float32)
    if lrc_conf is not None:
        conf = conf * jnp.asarray(lrc_conf, jnp.float32)
    d = jnp.where(valid, disparity, 0.0)
    return fast_global_smoother(d, guide_gray, conf, lam, sigma_color, iterations)
