"""Multi-chip batched programs: frame-parallel depth, pair-parallel ICP.

The reference's only parallelism is host threads (check90.py:227-241,
check8.py:218-226). Here the same workloads scale over a TPU mesh with
jax.shard_map: stereo frames shard over the "frame" axis for the depth
pipeline, fragment pairs shard over it for batched registration
(mini1.py:263-321's python pair loop as one SPMD program). Cross-frame
statistics ride an ICI psum; everything else is embarrassingly parallel.

These are the library consumers of parallel.mesh — the entry points the
multi-device tests (tests/test_parallel.py) and __graft_entry__'s
dryrun_multichip exercise.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
from recon3d_tpu.depth import matcher as _matcher
from recon3d_tpu.registration.icp import RegistrationResult, registration_icp
from recon3d_tpu.utils.types import PointCloud


def batched_depth(
    lefts: jax.Array,
    rights: jax.Array,
    mesh: Mesh,
    mcfg: StereoMatcherConfig = StereoMatcherConfig(),
    wcfg: WLSConfig = WLSConfig(),
    with_wls: bool = True,
    axis: str = "frame",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Frame-data-parallel disparity over a device mesh.

    lefts/rights: (B, H, W) gray batches, B divisible by the mesh axis size.
    Returns (disp (B, H, W), valid (B, H, W), global mean valid disparity —
    a cross-chip psum collective, the check81.py:406-418 fps/stat logging
    analog computed on-device).
    """
    def shard_fn(l, r):
        disp, valid = jax.vmap(
            lambda a, b: _matcher.compute_disparity(a, b, mcfg, wcfg, with_wls)
        )(l, r)
        local_sum = jnp.sum(jnp.where(valid, disp, 0.0))
        local_cnt = jnp.sum(valid.astype(jnp.float32))
        total = jax.lax.psum(local_sum, axis)
        count = jax.lax.psum(local_cnt, axis)
        return disp, valid, total / jnp.maximum(count, 1.0)

    # The varying-axes check runs whenever the resolved backend is the XLA
    # twin (scan carries are marked varying via utils.vma.vary_like). It must stay
    # off for the Pallas path: pallas_call's out_shape structs carry no vma
    # and JAX's interpret-mode HLO interpreter mixes unvarying grid
    # constants with varying block data — JAX's own error message for both
    # cases directs passing check_vma=False (tests/test_parallel.py instead
    # asserts sharded-vs-unsharded equality for that path, which is the
    # property the check would protect).
    uses_pallas = mcfg.backend == "pallas" or (
        mcfg.backend == "auto" and jax.default_backend() == "tpu")
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=not uses_pallas,
    )
    sh = NamedSharding(mesh, P(axis))
    lefts = jax.device_put(jnp.asarray(lefts, jnp.float32), sh)
    rights = jax.device_put(jnp.asarray(rights, jnp.float32), sh)
    return jax.jit(fn)(lefts, rights)


@partial(jax.jit, static_argnames=("method", "max_iterations", "threshold"))
def register_pairs_batched(
    sources: PointCloud,
    targets: PointCloud,
    inits: Optional[jax.Array] = None,
    threshold: float = 0.02,
    method: str = "point_to_point",
    max_iterations: int = 30,
) -> RegistrationResult:
    """vmapped ICP over B fragment pairs: one XLA program replaces the
    reference's sequential python pair loop (mini1.py:263-321).

    sources/targets: PointCloud pytrees with a leading (B, ...) batch axis
    (stack fixed-capacity clouds with jax.tree.map(jnp.stack, ...)).
    """
    B = sources.points.shape[0]
    if inits is None:
        inits = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    def one(src, tgt, T0):
        return registration_icp(src, tgt, threshold=threshold, init=T0,
                                method=method, max_iterations=max_iterations)

    return jax.vmap(one)(sources, targets, inits)


@partial(jax.jit, static_argnames=("num_trials", "chunk"))
def register_pairs_ransac_batched(
    sources: PointCloud,
    targets: PointCloud,
    feats_src: jax.Array,
    feats_tgt: jax.Array,
    distance_threshold: float,
    num_trials: int = 65536,
    chunk: int = 4,
):
    """Batched RANSAC-FPFH + ICP-refine + information matrix over B pairs:
    the whole mini1.py:263-321 pair loop as ONE compiled program.

    Runs `chunk` pairs at a time (lax.map batch_size) so the per-pair
    (Ns, Nt) feature-distance matrices don't all materialize at once.
    Returns (RegistrationResult with leading batch axis, info (B, 6, 6)).
    """
    from recon3d_tpu.registration.icp import information_matrix
    from recon3d_tpu.registration.ransac import registration_ransac_fpfh

    def one(args):
        src, tgt, fs, ft = args
        res = registration_ransac_fpfh(src, tgt, fs, ft, distance_threshold,
                                       num_trials=num_trials)
        info = information_matrix(src, tgt, distance_threshold,
                                  res.transformation)
        return res, info

    return jax.lax.map(one, (sources, targets, feats_src, feats_tgt),
                       batch_size=chunk)


def register_pairs_sharded(
    sources: PointCloud,
    targets: PointCloud,
    mesh: Mesh,
    inits: Optional[jax.Array] = None,
    threshold: float = 0.02,
    method: str = "point_to_point",
    max_iterations: int = 30,
    axis: str = "frame",
) -> RegistrationResult:
    """register_pairs_batched with the pair axis sharded over the mesh.

    Each chip registers B/n_devices pairs; results gather back sharded.
    """
    B = sources.points.shape[0]
    if inits is None:
        inits = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    def shard_fn(src, tgt, T0):
        return register_pairs_batched(src, tgt, T0, threshold=threshold,
                                      method=method,
                                      max_iterations=max_iterations)

    # check_vma off for the same reason as batched_depth above: the ICP
    # while_loop carries unvaried init buffers and JAX's manual-axes error
    # directs check_vma=False; tests/test_parallel.py
    # test_sharded_pairs_match_and_stay_sharded asserts the sharded result
    # equals the unsharded batched program (the property the check guards)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    sh = NamedSharding(mesh, P(axis))
    put = lambda t: jax.tree.map(lambda a: jax.device_put(a, sh), t)
    return jax.jit(fn)(put(sources), put(targets), put(inits))
