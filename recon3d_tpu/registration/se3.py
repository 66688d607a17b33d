"""SE(3) Lie group utilities: exp/log maps, composition, twists.

The registration and pose-graph solvers (replacing Open3D's C++ pose math in
registration_icp / global_optimization, pointcloud_alignment.py:35-40,
mini1.py:323-341) optimize over 6-vector twists xi = [rho, phi] with
T = exp(xi^). Everything is differentiable and vmappable.

Numerical note: every sqrt/arccos at the origin is guarded with the
"safe input + where" pattern so jacfwd/jacrev through exp/log at the
identity (exactly where Gauss-Newton linearizes) yields finite Jacobians —
a naive norm() gives 0 * inf = NaN tangents.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS2 = 1e-12


def _safe_sqrt(x2):
    """sqrt with finite tangent at 0: returns (sqrt, is_small)."""
    small = x2 < _EPS2
    return jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, x2))), small


def hat(phi: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3)."""
    zeros = jnp.zeros_like(phi[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -phi[..., 2], phi[..., 1]], -1),
        jnp.stack([phi[..., 2], zeros, -phi[..., 0]], -1),
        jnp.stack([-phi[..., 1], phi[..., 0], zeros], -1),
    ], -2)


def _exp_coeffs(phi):
    """(theta2, A, B, C) for exp: A=sin/t, B=(1-cos)/t^2, C=(t-sin)/t^3."""
    t2 = jnp.sum(phi * phi, axis=-1)
    theta, small = _safe_sqrt(t2)
    ts = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / ts)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0, t2 * ts))
    return t2, A, B, C


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues exp: (..., 3) -> (..., 3, 3), Taylor-safe near zero."""
    _, A, B, _ = _exp_coeffs(phi)
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Log map: (..., 3, 3) -> (..., 3). Differentiable at identity."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    v = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)  # = 2 sin(theta) * axis
    v2 = jnp.sum(v * v, axis=-1)
    sin2t, small = _safe_sqrt(v2)  # 2 sin(theta)
    cos2t = tr - 1.0  # 2 cos(theta)
    theta = jnp.arctan2(sin2t, cos2t)  # [0, pi), finite grads
    # scale = theta / (2 sin theta); Taylor 0.5 + theta^2/12 near 0
    generic = theta / jnp.where(small, 1.0, sin2t)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, generic)
    out = v * scale[..., None]
    # near pi, sin(theta) ~ 0 but v also ~ 0: extract axis from R + I
    near_pi = cos2t < -1.9999
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], -1)
    axis2 = jnp.maximum(diag, 1e-12)
    axis = jnp.sqrt(axis2)
    axis = axis * jnp.where(v >= 0, 1.0, -1.0)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    out_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], out_pi, out)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) [rho, phi] -> homogeneous transform (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    _, A, B, C = _exp_coeffs(phi)
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + A[..., None, None] * K + B[..., None, None] * K2
    V = eye + B[..., None, None] * K + C[..., None, None] * K2
    t = (V @ rho[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), xi.dtype)
    T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jax.Array) -> jax.Array:
    """Transform (..., 4, 4) -> twist (..., 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    t2 = jnp.sum(phi * phi, axis=-1)
    theta, small = _safe_sqrt(t2)
    K = hat(phi)
    K2 = K @ K
    # V^{-1} = I - K/2 + coef K^2, coef = 1/t^2 - (1+cos)/(2 t sin)
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    denom = jnp.where(small, 1.0, 2.0 * theta * sin_t)
    coef = jnp.where(
        small, 1.0 / 12.0 + t2 / 720.0,
        1.0 / jnp.where(small, 1.0, t2) - (1.0 + cos_t) / denom,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef[..., None, None] * K2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def compose(Ta: jax.Array, Tb: jax.Array) -> jax.Array:
    return Ta @ Tb


def inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(-(Rt @ t[..., None])[..., 0])
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def apply(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (4,4) to (..., 3)."""
    return pts @ T[:3, :3].T + T[:3, 3]
