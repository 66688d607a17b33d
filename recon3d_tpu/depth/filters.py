"""TPU-native depth post-processing filters.

The reference leans on librealsense's C++ filter chain —
``rs.decimation_filter / spatial_filter / temporal_filter /
hole_filling_filter`` (check90.py:99-103, colorReco.py:94-102) — which only
exists when the sensor SDK is installed. These are the same four filters as
jit-able JAX programs, so replayed datasets, synthetic cameras, and offline
re-processing get the identical pre-TSDF depth conditioning the live sensor
path had, and the work runs on the accelerator next to odometry/fusion
instead of on the host.

Semantics follow librealsense's documented behavior (invalid depth = 0):

- decimation: block-downsample by ``magnitude``, each output pixel the
  median of the valid pixels in its block (0 if none);
- spatial: iterated 1D edge-preserving exponential smoothing swept in all
  four directions; a step larger than ``delta`` resets the recursion so
  depth discontinuities never bleed;
- temporal: EMA against a persistent history with a ``delta`` gate, plus
  persistence fill of current dropouts from recently-valid history;
- hole filling: ``left`` (propagate last valid value leftward along the
  row, computed in log2(W) associative-scan steps rather than a scalar
  scan) or ``nearest`` (8-neighbor valid fill, iterated).

All filters take/return float32 meters with 0 = invalid, matching
``camera.realsense.RealSenseCamera.grab``.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def _valid(depth: jax.Array) -> jax.Array:
    return depth > 0.0


@functools.partial(jax.jit, static_argnames=("magnitude",))
def decimation_filter(depth: jax.Array, magnitude: int = 2) -> jax.Array:
    """Block median downsample (librealsense decimation, default 2x).

    Median over the valid pixels of each magnitude x magnitude block;
    blocks with no valid pixel stay invalid (0).
    """
    m = int(magnitude)
    if m <= 1:
        return depth
    H, W = depth.shape
    Hc, Wc = (H // m) * m, (W // m) * m
    d = depth[:Hc, :Wc].reshape(Hc // m, m, Wc // m, m)
    d = d.transpose(0, 2, 1, 3).reshape(Hc // m, Wc // m, m * m)
    # median of valid values: sort with invalids pushed to +inf, then index
    # the middle of the *valid* run per block
    n = jnp.sum(d > 0.0, axis=-1)
    s = jnp.sort(jnp.where(d > 0.0, d, jnp.inf), axis=-1)
    mid = jnp.maximum(n - 1, 0) // 2
    med = jnp.take_along_axis(s, mid[..., None], axis=-1)[..., 0]
    return jnp.where(n > 0, med, 0.0)


def _ema_pass(depth: jax.Array, alpha: float, delta: float) -> jax.Array:
    """One left-to-right edge-preserving EMA sweep along the last axis."""

    def step(prev, col):
        # prev: last filtered value per row (0 where the recursion is reset)
        ok = (col > 0.0) & (prev > 0.0) & (jnp.abs(col - prev) <= delta)
        out = jnp.where(ok, alpha * col + (1.0 - alpha) * prev, col)
        return out, out

    _, cols = jax.lax.scan(step, jnp.zeros(depth.shape[0], depth.dtype),
                           depth.T, unroll=8)
    return cols.T


@functools.partial(jax.jit, static_argnames=("iterations",))
def spatial_filter(depth: jax.Array, alpha: float = 0.5,
                   delta: float = 0.02, iterations: int = 2) -> jax.Array:
    """Edge-preserving smoothing (librealsense spatial filter).

    Four directional recursive EMA passes per iteration (l2r, r2l, t2b,
    b2t); ``delta`` is in meters (the SDK's default 20 units at the D415's
    1 mm scale = 0.02 m).
    """
    for _ in range(int(iterations)):
        depth = _ema_pass(depth, alpha, delta)
        depth = _ema_pass(depth[:, ::-1], alpha, delta)[:, ::-1]
        depth = _ema_pass(depth.T, alpha, delta).T
        depth = _ema_pass(depth.T[:, ::-1], alpha, delta)[:, ::-1].T
    return depth


class TemporalState(NamedTuple):
    """Persistent cross-frame state for `temporal_filter`."""

    history: jax.Array  # last filtered depth (H, W) float32
    age: jax.Array      # frames since history pixel was last valid (int32)


def make_temporal_state(shape: Tuple[int, int]) -> TemporalState:
    return TemporalState(history=jnp.zeros(shape, jnp.float32),
                         age=jnp.full(shape, 10_000, jnp.int32))


@functools.partial(jax.jit, static_argnames=("persistence",))
def temporal_filter(depth: jax.Array, state: TemporalState,
                    alpha: float = 0.4, delta: float = 0.02,
                    persistence: int = 3) -> Tuple[jax.Array, TemporalState]:
    """EMA against frame history + dropout persistence (librealsense temporal).

    Valid pixels within ``delta`` of a valid history blend by ``alpha``;
    invalid pixels whose history was valid within the last ``persistence``
    frames are filled from history (0 disables persistence).
    """
    cur_ok = _valid(depth)
    hist_ok = state.age == 0
    close = jnp.abs(depth - state.history) <= delta
    blended = jnp.where(cur_ok & hist_ok & close,
                        alpha * depth + (1.0 - alpha) * state.history, depth)
    recent = state.age <= persistence if persistence > 0 else jnp.zeros_like(hist_ok)
    out = jnp.where(cur_ok, blended,
                    jnp.where(recent, state.history, 0.0))
    new_hist = jnp.where(cur_ok, blended, state.history)
    new_age = jnp.where(cur_ok, 0, jnp.minimum(state.age + 1, 10_000))
    return out, TemporalState(history=new_hist, age=new_age)


def _fill_left(depth: jax.Array) -> jax.Array:
    """Propagate the last valid value rightward along each row.

    'fill from left' is a segmented-copy prefix scan, so it runs in
    log2(W) vector steps via associative_scan instead of a W-step scalar
    recursion.
    """

    def combine(a, b):
        va, oa = a
        vb, ob = b
        return jnp.where(ob, vb, va), oa | ob

    v, ok = jax.lax.associative_scan(combine, (depth, _valid(depth)), axis=1)
    return jnp.where(_valid(depth), depth, jnp.where(ok, v, 0.0))


def _fill_nearest(depth: jax.Array, iterations: int) -> jax.Array:
    """Fill holes from the nearest valid 8-neighbor (iterated dilation)."""
    for _ in range(iterations):
        ok = _valid(depth)
        best = jnp.full_like(depth, jnp.inf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                n = jnp.roll(depth, (dy, dx), axis=(0, 1))
                best = jnp.minimum(best, jnp.where(n > 0.0, n, jnp.inf))
        depth = jnp.where(ok, depth,
                          jnp.where(jnp.isfinite(best), best, 0.0))
    return depth


@functools.partial(jax.jit, static_argnames=("mode", "iterations"))
def hole_filling_filter(depth: jax.Array, mode: str = "left",
                        iterations: int = 2) -> jax.Array:
    """Fill invalid pixels (librealsense hole_filling_filter).

    mode='left' copies the last valid value along the row (SDK mode 0);
    mode='nearest' takes the nearest valid 8-neighbor, iterated (SDK
    mode 2's cheap analog).
    """
    if mode == "left":
        return _fill_left(depth)
    if mode == "nearest":
        return _fill_nearest(depth, int(iterations))
    raise ValueError(f"unknown hole-filling mode {mode!r}")


@dataclasses.dataclass
class DepthFilterBank:
    """The reference's full filter chain, SDK order (check90.py:99-103):
    decimation -> spatial -> temporal -> hole filling. Stateful across
    frames (temporal history); call per frame. Any stage disables with
    its 'enabled' flag. Note decimation shrinks the image by `magnitude`,
    exactly like the SDK (adjust intrinsics accordingly).
    """

    decimation: int = 0          # 0/1 = off; >=2 = block size
    spatial: bool = True
    spatial_alpha: float = 0.5
    spatial_delta: float = 0.02
    spatial_iterations: int = 2
    temporal: bool = True
    temporal_alpha: float = 0.4
    temporal_delta: float = 0.02
    persistence: int = 3
    hole_fill: Optional[str] = "left"   # None | 'left' | 'nearest'
    _state: Optional[TemporalState] = dataclasses.field(default=None, repr=False)

    def reset(self) -> None:
        self._state = None

    def __call__(self, depth: jax.Array) -> jax.Array:
        depth = jnp.asarray(depth, jnp.float32)
        if self.decimation >= 2:
            depth = decimation_filter(depth, magnitude=self.decimation)
        if self.spatial:
            depth = spatial_filter(depth, self.spatial_alpha,
                                   self.spatial_delta,
                                   iterations=self.spatial_iterations)
        if self.temporal:
            if self._state is None or self._state.history.shape != depth.shape:
                self._state = make_temporal_state(depth.shape)
            depth, self._state = temporal_filter(
                depth, self._state, self.temporal_alpha, self.temporal_delta,
                persistence=self.persistence)
        if self.hole_fill is not None:
            depth = hole_filling_filter(depth, mode=self.hole_fill)
        return depth
