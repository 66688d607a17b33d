"""Split one K=8 dirty-batch update into march / orient / probe+scatter
phases on the TPU (each phase jitted standalone, timed over iters)."""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.camera.fake import FakeRGBDCamera
from recon3d_tpu.fusion import marching as M
from recon3d_tpu.fusion import tsdf as _tsdf
from recon3d_tpu.fusion.incremental import IncrementalMesher
from recon3d_tpu.utils.types import CameraIntrinsics


def t(fn, *a, n=10):
    r = fn(*a)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _i in range(n):
        r = fn(*a)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    return r, (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    intr = CameraIntrinsics(fx=jnp.float32(616.63), fy=jnp.float32(616.31),
                            cx=jnp.float32(312.58), cy=jnp.float32(242.22))
    cam = FakeRGBDCamera("/root/reference/test/output", prefetch=False)
    cam.open()
    _, d = cam.grab()
    cam.close()
    vol = _tsdf.make_volume(256, voxel_size=0.004, sdf_trunc=0.02,
                            origin=(-0.5, -0.5, 1.0), with_color=False)
    vol = _tsdf.integrate(vol, jnp.asarray(d), intr,
                          jnp.eye(4, dtype=jnp.float32))

    im = IncrementalMesher(resolution=256)
    slab, cap, wmin = im.slab, im.cap, im.weight_min
    K = im.batch_k
    S = 1 << im.table_bits
    N3 = 3 * cap * K
    idxs = jnp.arange(12, 12 + K, dtype=jnp.int32)
    z0s = jnp.asarray(np.append(im._z0s, 0))
    z_los = jnp.asarray(np.append(im._z_los, 0))

    march = jax.jit(lambda v, ix: jax.vmap(
        lambda z, zl: M._slab_tris(v, z, zl, slab, cap, wmin)[:2])(
        z0s[ix], z_los[ix]))
    (tri, sel), ms_march = t(march, vol, idxs)
    print(f"march (vmap {K}, no orient) : {ms_march:8.1f} ms", flush=True)

    mo = jax.jit(lambda v, ix: jax.vmap(
        lambda z, zl: (lambda ts: (M._orient_by_gradient(v, ts[0]),
                                   ts[1]))(
            M._slab_tris(v, z, zl, slab, cap, wmin)[:2]))(
        z0s[ix], z_los[ix]))
    _, ms_mo = t(mo, vol, idxs)
    print(f"march + orient              : {ms_mo:8.1f} ms", flush=True)

    # probe+scatter phase alone, on the march's output
    def probe(v, tri, sel, used0, key0):
        origin = v.origin
        quant = v.voxel_size / 256.0
        corners = tri.reshape(-1, 3)
        v3 = jnp.repeat(sel.reshape(-1), 3)
        q = jnp.round((corners - origin) / quant).astype(jnp.int32)
        q = jnp.where(v3[:, None], q, -(1 << 30))
        h = ((q[:, 0] * jnp.int32(73856093))
             ^ (q[:, 1] * jnp.int32(19349663))
             ^ (q[:, 2] * jnp.int32(83492791))) & (S - 1)
        idx = jnp.arange(N3, dtype=jnp.int32)

        def round_body(st):
            p, used, key, slot_of, unresolved, cur = st
            cand = jnp.where(unresolved & ~used[cur], cur, S)
            claim = jnp.full((S,), N3, jnp.int32).at[cand].min(
                idx, mode="drop")
            won = claim < N3
            used = used | won
            key = jnp.where(won[:, None], q[jnp.clip(claim, 0, N3 - 1)],
                            key)
            match = (unresolved & used[cur]
                     & jnp.all(key[cur] == q, axis=1))
            slot_of = jnp.where(match, cur, slot_of)
            unresolved = unresolved & ~match
            cur = (cur + 2 * p + 1) & (S - 1)
            return p + 1, used, key, slot_of, unresolved, cur

        st = (jnp.int32(0), used0, key0, jnp.zeros((N3,), jnp.int32),
              v3, h)
        st = jax.lax.while_loop(lambda s: (s[0] < 16) & jnp.any(s[4]),
                                round_body, st)
        return st[3]

    used0 = jnp.zeros((S,), bool)
    key0 = jnp.zeros((S, 3), jnp.int32)
    pj = jax.jit(probe)
    _, ms_probe = t(pj, vol, tri, sel, used0, key0)
    print(f"probe loop (fresh table)    : {ms_probe:8.1f} ms", flush=True)

    # scatter-add phase
    def scat(slot_of, tri, sel):
        corners = tri.reshape(-1, 3)
        add_m = jnp.repeat(sel.reshape(-1), 3)
        tgt = jnp.where(add_m, slot_of, S)
        vsum = jnp.zeros((S, 3), jnp.float32).at[tgt].add(
            jnp.where(add_m[:, None], corners, 0.0), mode="drop")
        vcnt = jnp.zeros((S,), jnp.int32).at[tgt].add(
            jnp.where(add_m, 1, 0), mode="drop")
        return vsum, vcnt

    slot_of = pj(vol, tri, sel, used0, key0)
    _, ms_scat = t(jax.jit(scat), slot_of, tri, sel)
    print(f"scatter-add (vsum+vcnt)     : {ms_scat:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
