"""Generic Levenberg-Marquardt solver in JAX.

The reference leans on OpenCV's C++ CvLevMarq inside calibrateCamera /
stereoCalibrate / solvePnP refinement (calib3_2.py:171-188). We implement LM
once, generically, over jax-differentiable residual functions — Jacobians
come from jax.jacfwd instead of OpenCV's hand-derived ones, so the same
solver drives mono calibration, stereo calibration, PnP, and ICP's robust
variants.

Solves min_x ||r(x)||^2 with damped normal equations
    (J^T J + lam * diag(J^T J)) dx = -J^T r
accepting steps that reduce the cost (lam /= down) and rejecting otherwise
(lam *= up), inside a lax.while_loop so the whole optimization jits.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: jax.Array
    cost: jax.Array  # final 0.5*||r||^2
    rms: jax.Array  # sqrt(mean residual^2)
    iterations: jax.Array
    lam: jax.Array


def levenberg_marquardt(
    residual_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iterations: int = 50,
    lam0: float = 1e-3,
    lam_up: float = 10.0,
    lam_down: float = 10.0,
    lam_max: float = 1e10,
    rtol: float = 1e-12,
    mask: jax.Array | None = None,
) -> LMResult:
    """Minimize ||residual_fn(x)||^2 from x0.

    mask: optional boolean (len(x),) — False entries are frozen at x0
    (implements OpenCV's CALIB_FIX_* flags generically).
    """
    x0 = jnp.asarray(x0)
    free = jnp.ones_like(x0, dtype=bool) if mask is None else jnp.asarray(mask)

    def cost_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r), r

    def step(state):
        x, lam, cost, it, done = state
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        J = J * free[None, :]
        JtJ = J.T @ J
        g = J.T @ r
        diag = jnp.diag(JtJ)
        # keep the system invertible for frozen params
        diag = jnp.where(diag <= 0, 1.0, diag)

        def try_lam(carry):
            lam_i, _, _, tries = carry
            A = JtJ + lam_i * jnp.diag(diag)
            A = A + (~free).astype(A.dtype)[None, :] * jnp.eye(A.shape[0], dtype=A.dtype)
            dx = -jnp.linalg.solve(A, g) * free
            new_cost, _ = cost_of(x + dx)
            return lam_i, dx, new_cost, tries

        # inner damping search: try up to 8 lambda increases in one sweep
        def inner_cond(c):
            lam_i, _, new_cost, tries = c
            return jnp.logical_and(new_cost >= cost, jnp.logical_and(tries < 8, lam_i < lam_max))

        def inner_body(c):
            lam_i, dx, new_cost, tries = c
            lam_i = lam_i * lam_up
            lam_i, dx, new_cost, _ = try_lam((lam_i, dx, new_cost, tries))
            return lam_i, dx, new_cost, tries + 1

        lam1, dx, new_cost, _ = try_lam((lam, None, None, 0))
        lam1, dx, new_cost, _ = jax.lax.while_loop(inner_cond, inner_body, (lam1, dx, new_cost, 0))

        improved = new_cost < cost
        x_next = jnp.where(improved, x + dx, x)
        cost_next = jnp.where(improved, new_cost, cost)
        lam_next = jnp.where(improved, jnp.maximum(lam1 / lam_down, 1e-12), lam1)
        rel = jnp.abs(cost - cost_next) / jnp.maximum(cost, 1e-30)
        done_next = jnp.logical_or(
            jnp.logical_and(improved, rel < rtol),
            jnp.logical_and(~improved, lam1 >= lam_max),
        )
        return x_next, lam_next, cost_next, it + 1, done_next

    def cond(state):
        _, _, _, it, done = state
        return jnp.logical_and(it < max_iterations, ~done)

    c0, r0 = cost_of(x0)
    x, lam, cost, it, _ = jax.lax.while_loop(
        cond, step, (x0, jnp.asarray(lam0, x0.dtype), c0, jnp.asarray(0), jnp.asarray(False))
    )
    r = residual_fn(x)
    rms = jnp.sqrt(jnp.mean(r * r))
    return LMResult(x=x, cost=cost, rms=rms, iterations=it, lam=lam)


def gauss_newton(
    residual_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    iterations: int = 10,
    damping: float = 1e-9,
) -> jax.Array:
    """Plain Gauss-Newton with fixed iteration count (fully unrollable/scannable).

    Used where the problem is well-conditioned and we want the cheapest
    jittable loop (e.g. pose-only refinement inside odometry/ICP).
    """

    def body(x, _):
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        JtJ = J.T @ J + damping * jnp.eye(x.shape[0], dtype=x.dtype)
        dx = -jnp.linalg.solve(JtJ, J.T @ r)
        return x + dx, None

    x, _ = jax.lax.scan(body, jnp.asarray(x0), None, length=iterations)
    return x
