"""Multi-device leg for the streaming fusion consumer (the check90 twin).

The reference's real-time SLAM variant runs one host thread doing
odometry + TSDF integrate per frame (/root/reference/test/check90.py:
188-241). Its multi-chip analog here scales the CONSUMER over a device
mesh: a drained backlog of B frames tracks in parallel against the
broadcast keyframe — keyframe-relative poses are independent between
promotions, so there is no serial chain to break — and the B TSDF
integrations fold into the volume with EXACT sequential semantics via an
affine prefix composition (below). Everything is jit + NamedSharding for
the odometry half (compiler-inserted collectives) and one shard_map for
the integrate half (explicit all_gathers over the frame axis).

Exact capped-EMA integration over a sharded batch
-------------------------------------------------
The sequential per-frame update (fusion/tsdf.py _integrate) is, per
voxel, t' = (t*a + n_k) / (a + w_k) with the stored weight following
a' = min(a + w_k, W).  Since w_k >= 0, the capped running weight has the
closed form a_k = min(w0 + S_k, W) with S_k the plain prefix sum — so
each frame's update is an affine map t -> alpha_k t + beta_k whose
coefficients depend only on prefix WEIGHT sums, not on t. Affine maps
compose associatively ((A,B) after (A',B') = (A*A', A*B' + B)), so a
device can fold its local frames with one lax.scan (O(R^3) memory,
contributions recomputed per step) and the n per-device partial maps
compose in device order after an all_gather. This removes round-4's
documented caveat: the fused volume follows the exact sequential
recurrence — including voxels whose weight crosses weight_max mid-batch —
up to f32 rounding of the distributed division ((t*a+n)/d vs
(a/d)*t + n/d), NOT merely "while no voxel crosses the cap"
(tests/test_parallel.py::TestShardedFusionConsumer::test_weight_cap_crossing).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.registration.odometry import compute_rgbd_odometry
from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage


def _integrate_block_affine(vol, depths, exts, colors, intr, depth_trunc,
                            weight_max, w_in):
    """Fold a LOCAL (L, H, W) frame block into affine-map form.

    w_in: (R,R,R) UNCAPPED incoming weight (w0 + weight-count of all
    frames ordered before this block). Returns (A, Bn, Bc, s_local):
    t_out = A * t_in + Bn (and likewise color with Bc), s_local the
    block's weight-count contribution.
    """
    R = vol.resolution
    with_c = vol.color is not None and colors is not None
    zero = jnp.zeros((R, R, R), jnp.float32)

    def body(carry, de):
        A, Bn, Bc, s = carry
        if with_c:
            d, e, c = de
        else:
            (d, e), c = de, None
        n1, w1, cf = _tsdf._frame_contrib(vol, d, intr, e, c, depth_trunc)
        a_prev = jnp.minimum(w_in + s, weight_max)
        denom = jnp.maximum(a_prev + w1, 1.0)
        upd = w1 > 0.0
        alpha = jnp.where(upd, a_prev / denom, 1.0)
        beta = jnp.where(upd, n1 / denom, 0.0)
        A, Bn = alpha * A, alpha * Bn + beta
        if with_c:
            Bc = alpha[..., None] * Bc \
                + jnp.where(upd[..., None], cf / denom[..., None], 0.0)
        return (A, Bn, Bc, s + w1), None

    init = (jnp.ones((R, R, R), jnp.float32), zero,
            jnp.zeros((R, R, R, 3), jnp.float32) if with_c else zero, zero)
    xs = (depths, exts, colors) if with_c else (depths, exts)
    (A, Bn, Bc, s), _ = jax.lax.scan(body, init, xs)
    return A, Bn, Bc, s


def _integrate_frames_exact_sharded(vol, depths, exts, colors, intr,
                                    depth_trunc, weight_max, axis_name):
    """shard_map body: exact sequential-order integrate of a frame-sharded
    batch. Two passes: (1) local weight totals -> exclusive device prefix,
    (2) local affine fold -> ordered cross-device composition."""
    with_c = vol.color is not None and colors is not None
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # pass 1: this block's weight-count volume (contributions recomputed
    # in pass 2; XLA drops the unused tsdf/color terms here)
    def wbody(s, de):
        d, e = de
        _, w1, _ = _tsdf._frame_contrib(vol, d, intr, e, None, depth_trunc)
        return s + w1, None
    s_loc, _ = jax.lax.scan(
        wbody, jnp.zeros(vol.tsdf.shape, jnp.float32), (depths, exts))

    gathered = jax.lax.all_gather(s_loc, axis_name)          # (n, R,R,R)
    before = (jnp.arange(n) < idx).astype(jnp.float32)
    offset = jnp.tensordot(before, gathered, axes=1)         # exclusive
    total = jnp.sum(gathered, axis=0)

    # pass 2: local affine fold with the true incoming weight
    A, Bn, Bc, _ = _integrate_block_affine(
        vol, depths, exts, colors, intr, depth_trunc, weight_max,
        vol.weight + offset)

    # ordered composition over devices: M_total = M_{n-1} o ... o M_0
    Ag = jax.lax.all_gather(A, axis_name)
    Bng = jax.lax.all_gather(Bn, axis_name)
    if with_c:
        Bcg = jax.lax.all_gather(Bc, axis_name)

    def fold(i, carry):
        if with_c:
            At, Bt, Ct = carry
            return (Ag[i] * At, Ag[i] * Bt + Bng[i],
                    Ag[i][..., None] * Ct + Bcg[i])
        At, Bt = carry
        return Ag[i] * At, Ag[i] * Bt + Bng[i]

    init = (jnp.ones_like(A), jnp.zeros_like(Bn)) + (
        (jnp.zeros_like(Bc),) if with_c else ())
    out = jax.lax.fori_loop(0, n, fold, init)

    tsdf = out[0] * vol.tsdf + out[1]
    weight = jnp.minimum(vol.weight + total, weight_max)
    new = dataclasses.replace(vol, tsdf=tsdf, weight=weight)
    if with_c:
        new = dataclasses.replace(
            new, color=out[0][..., None] * vol.color + out[2])
    return new


_EXACT_PROGRAMS: dict = {}  # (mesh, shapes...) -> jitted program


def integrate_frames_exact(
    vol: _tsdf.TSDFVolume,
    depths: jax.Array,
    exts: jax.Array,
    intr: CameraIntrinsics,
    mesh: Mesh,
    colors: Optional[jax.Array] = None,
    axis_name: str = "frame",
    depth_trunc: float = 3.0,
    weight_max: float = 64.0,
) -> _tsdf.TSDFVolume:
    """Exact sequential-semantics TSDF integrate of a (B, H, W) depth
    batch sharded over `axis_name`, with given (B, 4, 4) extrinsics.

    The integration half of fused_frames_sharded, exposed for callers
    that already have poses (offline fragment replays, tests). The
    jitted program is cached on (mesh, shapes, options) — a fresh
    shard_map lambda per call would retrace and recompile every time."""
    B = depths.shape[0]
    n = mesh.shape[axis_name]
    assert B % n == 0, f"batch {B} must divide over {n} devices"
    with_c = vol.color is not None and colors is not None

    from jax.experimental.shard_map import shard_map
    fspec = P(axis_name)
    rep = NamedSharding(mesh, P())
    vol = jax.device_put(vol, rep)
    depths = jax.device_put(jnp.asarray(depths),
                            NamedSharding(mesh, P(axis_name, None, None)))
    exts = jax.device_put(jnp.asarray(exts),
                          NamedSharding(mesh, P(axis_name, None, None)))
    if with_c:
        colors = jax.device_put(
            jnp.asarray(colors),
            NamedSharding(mesh, P(axis_name, *([None] * (colors.ndim - 1)))))

    # intr is CLOSED OVER (baked into the program as constants), so its
    # values must be part of the cache key
    key = (mesh, axis_name, vol.resolution, with_c, depths.shape,
           float(depth_trunc), float(weight_max),
           float(intr.fx), float(intr.fy), float(intr.cx), float(intr.cy))
    run = _EXACT_PROGRAMS.get(key)
    if run is None:
        fn = shard_map(
            lambda v, d, e, c: _integrate_frames_exact_sharded(
                v, d, e, c if with_c else None, intr, depth_trunc,
                weight_max, axis_name),
            mesh=mesh,
            in_specs=(P(), fspec, fspec, fspec if with_c else P()),
            out_specs=P(), check_rep=False)
        run = _EXACT_PROGRAMS[key] = jax.jit(
            fn, out_shardings=rep, donate_argnums=(0,))
    return run(vol, depths, exts, colors if with_c else jnp.zeros((B,)))


def fused_frames_sharded(
    vol: _tsdf.TSDFVolume,
    key_color: jax.Array,
    key_depth: jax.Array,
    colors: jax.Array,
    depths: jax.Array,
    intr: CameraIntrinsics,
    mesh: Mesh,
    axis_name: str = "frame",
    world_from_key: Optional[jax.Array] = None,
    depth_trunc: float = 3.0,
    weight_max: float = 64.0,
    odo_levels: int = 3,
) -> Tuple[_tsdf.TSDFVolume, jax.Array, jax.Array]:
    """Track + integrate a B-frame backlog sharded over `axis_name`.

    colors/depths: (B, H, W[, 3]) with B divisible by the mesh axis size.
    Returns (volume replicated, world_from_cam (B, 4, 4), success (B,)).
    The volume/keyframe replicate; each device runs odometry for its local
    frames; integration uses the exact affine prefix composition (module
    docstring) so the result matches B sequential integrates even across
    weight_max crossings.
    """
    B = depths.shape[0]
    n = mesh.shape[axis_name]
    assert B % n == 0, f"batch {B} must divide over {n} devices"
    wfk = jnp.eye(4, dtype=jnp.float32) if world_from_key is None \
        else jnp.asarray(world_from_key, jnp.float32)

    fshard = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    colors = jax.device_put(jnp.asarray(colors),
                            NamedSharding(mesh, P(axis_name, *([None] * (
                                colors.ndim - 1)))))
    depths = jax.device_put(jnp.asarray(depths),
                            NamedSharding(mesh, P(axis_name, None, None)))
    vol = jax.device_put(vol, rep)
    with_c = vol.color is not None

    def run(vol, kc, kd, colors, depths, wfk):
        key = RGBDImage(color=kc, depth=kd)

        def track(c, d):
            res = compute_rgbd_odometry(key, RGBDImage(color=c, depth=d),
                                        intr, levels=odo_levels)
            # streaming.py's convention: odometry(key, cur) returns
            # cur_from_key; world pose = world_from_key @ inv(cur_from_key)
            cur_from_key = jnp.where(res.success, res.transformation,
                                     jnp.eye(4, dtype=jnp.float32))
            return wfk @ jnp.linalg.inv(cur_from_key), res.success

        wfcs, ok = jax.vmap(track)(colors, depths)
        exts = jax.vmap(jnp.linalg.inv)(wfcs)

        from jax.experimental.shard_map import shard_map
        fspec = P(axis_name)
        in_specs = (P(), fspec, fspec, fspec if with_c else P())
        vol_new = shard_map(
            lambda v, d, e, c: _integrate_frames_exact_sharded(
                v, d, e, c if with_c else None, intr, depth_trunc,
                weight_max, axis_name),
            mesh=mesh, in_specs=in_specs, out_specs=P(),
            check_rep=False,
        )(vol, depths, exts, colors if with_c else jnp.zeros((B,)))
        return vol_new, wfcs, ok

    run_j = jax.jit(run, out_shardings=(rep, fshard, fshard),
                    donate_argnums=(0,))
    return run_j(vol, jnp.asarray(key_color), jnp.asarray(key_depth),
                 colors, depths, wfk)
