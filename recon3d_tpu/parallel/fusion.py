"""Multi-device leg for the streaming fusion consumer (the check90 twin).

The reference's real-time SLAM variant runs one host thread doing
odometry + TSDF integrate per frame (/root/reference/test/check90.py:
188-241). Its multi-chip analog here scales the CONSUMER over a device
mesh: a drained backlog of B frames tracks in parallel against the
broadcast keyframe — keyframe-relative poses are independent between
promotions, so there is no serial chain to break — and the B TSDF
integrations use the weighted-sum form (tsdf.integrate_frames), whose
frame-axis sum XLA lowers to one all-reduce over the mesh when the frames
are sharded. Everything is plain jit + NamedSharding: the collectives are
compiler-inserted (SURVEY.md §2.5's "optional multi-chip sharding over
frames" for the streaming path).

Equality contract: poses match per-frame compute_rgbd_odometry exactly
(vmap does not change the math); the fused volume matches B sequential
integrates up to f32 summation order while no voxel's weight crosses
weight_max mid-batch (tests/test_parallel.py::TestShardedFusionConsumer).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.registration.odometry import compute_rgbd_odometry
from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage


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
    frames and contributes its partial TSDF sums to the all-reduce.
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
        vol = _tsdf._integrate_frames(
            vol, depths, intr, exts,
            colors=colors if vol.color is not None else None,
            depth_trunc=depth_trunc, weight_max=weight_max)
        return vol, wfcs, ok

    run_j = jax.jit(run, out_shardings=(rep, fshard, fshard),
                    donate_argnums=(0,))
    return run_j(vol, jnp.asarray(key_color), jnp.asarray(key_depth),
                 colors, depths, wfk)
