"""Pallas grid_pca_moments: the large-N normal-estimation hot kernel.

Per-point radius-ball moments (count / mean / covariance) over the voxel
table from ops.grid_knn._bin_points — exact same semantics as the XLA
grid_pca_moments, restructured for the TPU memory system:

- 1-D grid over x-slabs; each step sees the (clamped) previous/current/
  next slab and accumulates the 10 moment channels entirely in VMEM. The
  XLA version materialized (C, C, G^3)-scale intermediates in HBM per
  offset (and XLA picked lane-padded layouts for them, 8x memory) —
  measured 728 ms at 1M points on a v5e.
- slab planes are FLATTENED to (C, G*G): full 128-lane vregs (a (G, G)=
  (64, 64) plane half-fills them), and the (dy, dz) neighbor alignment
  becomes ONE lane roll of dy*G + dz with iota edge masks.
- Mosaic has no dynamic_slice on values, so each offset's rolled
  candidates are staged in VMEM scratch and the per-candidate fori_loop
  dynamically indexes the ref.

Everything is f32 madds (the XLA einsum path contracted via dot_general
at default TPU precision, i.e. bf16 — see the precision pin in
grid_knn.py).

Reference: normal_estimation.py:19-21 (Open3D CUDA k-NN PCA normals).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recon3d_tpu.ops import grid_knn as gk

BIG = jnp.float32(1e30)


def _mk_kernel(G: int, C: int):
    GG = G * G

    def kernel(r2_ref, prev_ref, cur_ref, nxt_ref, pocc_ref, cocc_ref,
               nocc_ref, cnt_ref, s1_ref, s2_ref,
               cand_s, occ_s, acc_cnt, acc_s1, acc_s2):
        x = pl.program_id(0)
        r2 = r2_ref[0]  # SMEM scalar: radius stays a traced value upstream
        q = cur_ref[0]          # (C, 3, GG)
        qocc = cocc_ref[0]      # (C, GG)

        ig = jax.lax.broadcasted_iota(jnp.int32, (1, GG), 1)
        iy = ig // G
        iz = ig % G

        acc_cnt[...] = jnp.zeros((C, GG), jnp.float32)
        acc_s1[...] = jnp.zeros((C, 3, GG), jnp.float32)
        acc_s2[...] = jnp.zeros((C, 6, GG), jnp.float32)

        planes = ((-1, prev_ref, pocc_ref), (0, cur_ref, cocc_ref),
                  (1, nxt_ref, nocc_ref))
        for dx, sref, soref in planes:
            slab = sref[0]      # (C, 3, GG)
            socc = soref[0]     # (C, GG)
            if dx == -1:
                xok = x > 0
            elif dx == 1:
                xok = x < G - 1
            else:
                xok = True
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    # cand[., g] = slab[., g + dy*G + dz]: one lane roll
                    sh = (-(dy * G + dz)) % GG
                    cand = pltpu.roll(slab, sh, axis=2) if sh else slab
                    co2 = pltpu.roll(socc, sh, axis=1) if sh else socc
                    edge = jnp.full((1, GG), True)
                    if dy:
                        edge = edge & ((iy + dy >= 0) & (iy + dy < G))
                    if dz:
                        edge = edge & ((iz + dz >= 0) & (iz + dz < G))
                    if dx != 0:
                        edge = edge & xok
                    edgef = edge.astype(jnp.float32)  # (1, GG)

                    # Accumulation shape, measured at G=64/C=16/1M on a
                    # v5e: per-candidate fori with in-place scratch += (this
                    # form) runs the kernel in ~108 ms; carrying the
                    # accumulators as fori values spills them every
                    # iteration (~100 ms slower end to end); chunked
                    # value-partials (+= per 4 candidates) spill the
                    # chains (282 ms); fully unrolling all 27x16 chains
                    # blows Mosaic's scoped allocator (1.34 GB live).
                    cand_s[...] = cand
                    occ_s[...] = co2[:, None]

                    def body(cc, _):
                        px = cand_s[cc, 0:1]                    # (1, GG)
                        py = cand_s[cc, 1:2]
                        pz = cand_s[cc, 2:3]
                        co = occ_s[cc, 0:1]                     # (1, GG)
                        d0 = q[:, 0] - px
                        d1 = q[:, 1] - py
                        d2_ = q[:, 2] - pz
                        dd = d0 * d0 + d1 * d1 + d2_ * d2_      # (C, GG)
                        w = jnp.where(dd <= r2, 1.0, 0.0) \
                            * co * edgef * qocc
                        acc_cnt[...] += w
                        cpt = jnp.concatenate([px, py, pz], 0)  # (3, GG)
                        acc_s1[...] += w[:, None] * cpt[None]
                        sec = jnp.concatenate(
                            [px * px, py * py, pz * pz,
                             px * py, px * pz, py * pz], 0)     # (6, GG)
                        acc_s2[...] += w[:, None] * sec[None]
                        return 0

                    jax.lax.fori_loop(0, C, body, 0)
        cnt_ref[0] = acc_cnt[...]
        s1_ref[0] = acc_s1[...]
        s2_ref[0] = acc_s2[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("G", "C", "interpret"))
def moments_pallas_core(tg, occ, r2, G, C, interpret=False):
    """tg: (G, C, 3, G*G) zeroed coords; occ: (G, C, G*G) f32 occupancy;
    r2: traced scalar (squared radius). Returns (cnt (G,C,GG),
    s1 (G,C,3,GG), s2 (G,C,6,GG))."""
    GG = G * G
    prev4 = lambda x: (jnp.maximum(x - 1, 0), 0, 0, 0)
    cur4 = lambda x: (x, 0, 0, 0)
    nxt4 = lambda x: (jnp.minimum(x + 1, G - 1), 0, 0, 0)
    prev3 = lambda x: (jnp.maximum(x - 1, 0), 0, 0)
    cur3 = lambda x: (x, 0, 0)
    nxt3 = lambda x: (jnp.minimum(x + 1, G - 1), 0, 0)
    bs4 = (1, C, 3, GG)
    bs3 = (1, C, GG)
    r2v = jnp.reshape(jnp.asarray(r2, jnp.float32), (1,))
    out = pl.pallas_call(
        _mk_kernel(G, C),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(bs4, prev4),
            pl.BlockSpec(bs4, cur4),
            pl.BlockSpec(bs4, nxt4),
            pl.BlockSpec(bs3, prev3),
            pl.BlockSpec(bs3, cur3),
            pl.BlockSpec(bs3, nxt3),
        ],
        out_specs=[
            pl.BlockSpec(bs3, cur3),
            pl.BlockSpec(bs4, cur4),
            pl.BlockSpec((1, C, 6, GG), cur4),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, GG), jnp.float32),
            jax.ShapeDtypeStruct((G, C, 3, GG), jnp.float32),
            jax.ShapeDtypeStruct((G, C, 6, GG), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((C, 3, GG), jnp.float32),
                        pltpu.VMEM((C, 1, GG), jnp.float32),
                        pltpu.VMEM((C, GG), jnp.float32),
                        pltpu.VMEM((C, 3, GG), jnp.float32),
                        pltpu.VMEM((C, 6, GG), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(r2v, tg, tg, tg, occ, occ, occ)
    return out


def grid_pca_moments_pallas(points, valid, radius, grid_size=64,
                            cell_capacity=8, interpret=False, bin_fn=None):
    """Drop-in twin of gk.grid_pca_moments: (count (N,), mean (N, 3),
    cov6 (N, 6) [xx, yy, zz, xy, xz, yz]).

    Returns the covariance in CHANNEL form — normals.py consumes it
    channelwise (building (N, 3, 3) matrices costs more in layout
    reshuffling than the whole eigen-solve). interpret=True runs the same
    kernel dataflow off-TPU (how the CPU parity tests exercise it).
    """
    p = jnp.asarray(points, jnp.float32)
    G, C = grid_size, cell_capacity
    assert C % 4 == 0, "cell_capacity must be a multiple of 4 (chunked loop)"
    if bin_fn is None:
        bin_fn = gk._bin_points
    table, _, point_slot, _ = bin_fn(p, valid, radius, G, C)
    # (G^3*C, 3) -> (Gx, Gy, Gz, C, 3) -> (Gx, C, 3, Gy*Gz)
    t5 = table.reshape(G, G, G, C, 3)
    occ = (t5[..., 0] < BIG / 2)                       # (G, G, G, C)
    t5 = jnp.where(occ[..., None], t5, 0.0)
    tg = jnp.transpose(t5, (0, 3, 4, 1, 2)).reshape(G, C, 3, G * G)
    occf = jnp.transpose(occ, (0, 3, 1, 2)).reshape(G, C, G * G)

    cnt, s1, s2 = moments_pallas_core(tg, occf.astype(jnp.float32),
                                      radius * radius, G, C, interpret)
    # Read results back by gathering DIRECTLY from the kernel's native
    # (G, C, k, GG) layout — no 100+ MB output transposes. Per-point
    # coordinates into that layout from slot = (x*GG + g)*C + c:
    GG = G * G
    slot = jnp.maximum(point_slot, 0)
    has = point_slot >= 0
    cell = slot // C
    c = slot % C
    x = cell // GG
    g = cell % GG
    base = x * C + c
    cnt_f = cnt.reshape(-1)
    s1_f = s1.reshape(-1)
    s2_f = s2.reshape(-1)
    n = jnp.where(has, cnt_f[base * GG + g], 0.0)
    nn = jnp.maximum(n, 1.0)
    m1 = [s1_f[(base * 3 + j) * GG + g] / nn for j in range(3)]
    m2 = [s2_f[(base * 6 + j) * GG + g] / nn for j in range(6)]
    mx, my, mz = m1
    mean = jnp.stack(m1, -1)
    cov6 = jnp.stack([m2[0] - mx * mx, m2[1] - my * my,
                      m2[2] - mz * mz, m2[3] - mx * my,
                      m2[4] - mx * mz, m2[5] - my * mz], -1)
    return n, mean, cov6


def cov6_to_matrix(cov6: jax.Array) -> jax.Array:
    """(N, 6) [xx, yy, zz, xy, xz, yz] -> (N, 3, 3) symmetric matrices."""
    xx, yy, zz, xy, xz, yz = (cov6[:, k] for k in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], -2)
