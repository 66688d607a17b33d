"""Pallas projective image sampling for TSDF integration.

tsdf._frame_contrib samples the depth (and color) image at every voxel's
projected pixel: `depth[vc, uc]` over an (R, R, R) index volume. XLA
lowers that to a general gather — measured 201 ms for the depth channel
alone at 256^3 on a v5e (the whole fused odometry+integrate step was
427 ms, of which ~350 ms was this sampling) — because TPU gathers
serialize; the projection math around it costs 6 ms.

This kernel exploits the projection's SMOOTHNESS instead: 128
consecutive voxels along z at fixed (x, y) project into a small
contiguous pixel window (the perspective map is monotone and Lipschitz
in z), so each 128-voxel lane run
  1. reads its precomputed (vc, uc) int32 rows (computed by the SAME
     XLA ops as the reference path, so the selected pixel is bitwise
     identical — no in-kernel float projection to drift by an fma),
  2. takes its (64, 128)-pixel window origin from a min-reduce,
  3. dynamic-slices the window out of the VMEM-resident image stack, and
  4. selects each voxel's pixel with a one-hot row matmul (MXU, HIGHEST
     precision — exact for one-hot selection) + a one-hot column
     multiply + sublane reduce (VPU).

Data layout: the caller flattens the volume to (R, R*R) so voxel runs
are pure LANE runs — Mosaic supports lane-dim blocks of any multiple of
128, while folding a (sublane, lane) tile into one axis in-kernel is an
unsupported relayout (the first version died on exactly that).

Voxels whose pixel falls outside their run's window (projective spread
beyond 64x128 at extreme grazing configs) read 0 — depth 0 is invalid
by the d > 1e-4 range check, so such voxels just skip this frame's
update; production volume configs stay well inside the window (~2x
margin at the volume corners), and the pure-XLA path remains the
fallback/oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane run of voxels per inner iteration; pixel window per run
RUN = 128
# window starts must be TILE-ALIGNED for Mosaic's dynamic VMEM slicing
# (rows to 8, cols to 128); the column window is 2 lane-tiles wide so an
# aligned-down start still covers a run whose ~40 px spread straddles a
# 128 boundary
WR, WC = 64, 256
BLOCK = 1024  # lanes per grid step (8 runs)


SUB = 8  # sublane rows per block (Mosaic tiling minimum)


def _mk_kernel(C: int, H: int, W: int):
    n_runs = BLOCK // RUN

    def kernel(vc_ref, uc_ref, img_ref, out_ref):
        for s in range(SUB):
            for r in range(n_runs):
                lo = r * RUN
                vc = vc_ref[s:s + 1, lo:lo + RUN]        # (1, RUN) int32
                uc = uc_ref[s:s + 1, lo:lo + RUN]
                r0 = pl.multiple_of(
                    jnp.minimum((jnp.min(vc) // 8) * 8, H - WR), 8)
                c0 = pl.multiple_of(
                    jnp.minimum((jnp.min(uc) // 128) * 128, W - WC), 128)
                rel_r = vc - r0                          # (1, RUN)
                rel_c = uc - c0
                row_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (WR, RUN), 0)
                col_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (WC, RUN), 0)
                # (WR, RUN): voxel l wants window row rel_r[l]
                rsel = (rel_r == row_iota).astype(jnp.bfloat16)
                csel = (rel_c == col_iota).astype(jnp.float32)
                dn = (((0,), (0,)), ((), ()))
                # all C channel windows stacked along lanes: ONE wide
                # matmul per bf16 pass instead of C narrow ones (same
                # MACs, better MXU pipelining)
                win = jnp.concatenate(
                    [img_ref[c, pl.ds(r0, WR), pl.ds(c0, WC)]
                     for c in range(C)], axis=1)          # (WR, C*WC)
                # A[(c,wc), l] = win_c[rel_r[l], wc]. One-hot selection
                # by matmul is exact when the products are: rsel is
                # 0.0/1.0 (exact in bf16) and win splits into three bf16
                # chunks covering the full f32 mantissa, so three 1-pass
                # MXU products accumulated in f32 reproduce the sample
                # BITWISE at half the passes of a HIGHEST-precision dot
                # (same trick as the grid_knn pack kernel).
                t0 = win.astype(jnp.bfloat16)
                r1 = win - t0.astype(jnp.float32)
                t1 = r1.astype(jnp.bfloat16)
                t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)

                def sel(t):
                    return jax.lax.dot_general(
                        t, rsel, dn,
                        preferred_element_type=jnp.float32)

                strips = (sel(t0) + sel(t1)) + sel(t2)    # (C*WC, RUN)
                for c in range(C):
                    out_ref[c, s:s + 1, lo:lo + RUN] = jnp.sum(
                        strips[c * WC:(c + 1) * WC] * csel,
                        axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def sample_images_at(vc: jax.Array, uc: jax.Array, images: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """images (C, H, W) f32 sampled at per-voxel pixel indices.

    vc, uc: (R, R, R) int32 already clipped to the image bounds (the
    caller's inb mask handles out-of-frustum voxels). Returns
    (C, R, R, R) f32 with images[c, vc, uc] per voxel — bitwise equal to
    the XLA gather wherever the voxel's pixel lies inside its lane run's
    window, 0 elsewhere (see module docstring)."""
    C, H, W = images.shape
    R = vc.shape[0]
    assert (R * R) % BLOCK == 0 and R % SUB == 0, R
    assert H >= WR and W >= WC, (H, W)
    vc2 = vc.reshape(R, R * R)
    uc2 = uc.reshape(R, R * R)
    grid = (R // SUB, (R * R) // BLOCK)
    blk = pl.BlockSpec((SUB, BLOCK), lambda x, y: (x, y),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mk_kernel(C, H, W),
        grid=grid,
        in_specs=[blk, blk,
                  pl.BlockSpec((C, H, W), lambda x, y: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, SUB, BLOCK), lambda x, y: (0, x, y),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, R, R * R), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vc2, uc2, images)
    return out.reshape(C, R, R, R)
