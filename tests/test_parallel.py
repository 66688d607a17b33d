"""Multi-device sharding tests on the 8-device virtual CPU mesh (conftest).

These exercise the real library consumers of parallel.mesh — frame-sharded
depth (parallel.batch.batched_depth) and pair-sharded registration — and
assert BOTH numerical equality with the single-device path AND that the
outputs are actually sharded over the mesh axis (the tests fail if the
"frame" axis stops being sharded).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recon3d_tpu.camera.fake import FakeStereoCamera
from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
from recon3d_tpu.depth.matcher import compute_disparity
from recon3d_tpu.parallel import batch as pbatch
from recon3d_tpu.parallel.mesh import frame_sharding, make_mesh, shard_frames
from recon3d_tpu.registration.icp import registration_icp
from recon3d_tpu.registration.se3 import se3_exp
from recon3d_tpu.utils.types import PointCloud

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) != N_DEV:
        pytest.skip("needs the 8-device virtual CPU mesh (default conftest "
                    "run; skipped under RECON3D_TPU_TESTS=1)")
    return make_mesh(N_DEV, ("frame",))


def _n_frame_shards(arr) -> int:
    """Number of distinct device shards along the leading axis."""
    starts = {s.index[0].start or 0 for s in arr.addressable_shards}
    return len(starts)


@pytest.fixture(scope="module")
def stereo_batch():
    H, W = 48, 128
    cam = FakeStereoCamera(width=W, height=H, focal=80.0, baseline=0.05)
    ls, rs = [], []
    for k in range(N_DEV):
        gl, gr, _, _ = cam.render(k)
        ls.append(gl)
        rs.append(gr)
    return np.stack(ls).astype(np.float32), np.stack(rs).astype(np.float32)


@pytest.fixture(scope="module")
def cloud_pairs():
    """8 (source, target) pairs with known rigid transforms."""
    rng = np.random.RandomState(0)
    base = rng.randn(256, 3).astype(np.float32) * 0.2
    srcs, tgts, truths = [], [], []
    for k in range(N_DEV):
        xi = np.concatenate([rng.randn(3) * 0.01, rng.randn(3) * 0.02])
        T = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32)))
        pts = base + rng.randn(256, 3).astype(np.float32) * 0.001
        srcs.append(PointCloud.from_numpy(pts))
        tgts.append(PointCloud.from_numpy(pts @ T[:3, :3].T + T[:3, 3]))
        truths.append(T)
    stack = lambda cs: jax.tree.map(lambda *xs: jnp.stack(xs), *cs)
    return stack(srcs), stack(tgts), np.stack(truths)


class TestShardedDepth:
    def test_matches_single_device_and_stays_sharded(self, mesh, stereo_batch):
        ls, rs = stereo_batch
        mcfg = StereoMatcherConfig(num_disparities=16, block_size=3,
                                   speckle_window_size=0)
        wcfg = WLSConfig(iterations=2)
        disp, valid, stat = pbatch.batched_depth(ls, rs, mesh, mcfg, wcfg)

        # the frame axis must actually be sharded over all 8 devices
        assert _n_frame_shards(disp) == N_DEV
        assert _n_frame_shards(valid) == N_DEV

        # numerical equality with the unsharded per-frame path
        for k in range(N_DEV):
            d1, v1 = compute_disparity(jnp.asarray(ls[k]), jnp.asarray(rs[k]),
                                       mcfg, wcfg, True)
            np.testing.assert_allclose(np.asarray(disp[k]), np.asarray(d1),
                                       atol=1e-4)
            np.testing.assert_array_equal(np.asarray(valid[k]), np.asarray(v1))

    def test_cross_chip_collective_stat(self, mesh, stereo_batch):
        ls, rs = stereo_batch
        mcfg = StereoMatcherConfig(num_disparities=16, block_size=3,
                                   speckle_window_size=0)
        wcfg = WLSConfig(iterations=2)
        disp, valid, stat = pbatch.batched_depth(ls, rs, mesh, mcfg, wcfg)
        d, v = np.asarray(disp), np.asarray(valid)
        expect = d[v].sum() / max(v.sum(), 1)
        np.testing.assert_allclose(float(stat), expect, rtol=1e-5)


class TestShardedPallasDepth:
    """The PRODUCTION Pallas kernels under multi-device sharding.

    backend="pallas" off-TPU runs the same sgm_pallas/wls_pallas kernels in
    interpret mode, composed with a frame-axis shard_map over the 8-device
    virtual mesh — the structure the real multi-chip deployment uses
    (whole kernels per shard; SURVEY.md section 2.5). Asserts shard layout
    AND exact-mask/1e-4-disparity equality with the unsharded Pallas path,
    which is the property check_vma would protect (it must be off for
    pallas_call: JAX's interpret-mode interpreter cannot propagate varying
    manual axes and its error message directs check_vma=False).
    """

    def test_pallas_sharded_matches_unsharded(self, mesh, stereo_batch):
        ls, rs = stereo_batch
        mcfg = StereoMatcherConfig(num_disparities=16, block_size=3,
                                   backend="pallas", speckle_window_size=0)
        wcfg = WLSConfig(iterations=2)
        disp, valid, stat = pbatch.batched_depth(ls, rs, mesh, mcfg, wcfg)

        assert _n_frame_shards(disp) == N_DEV
        assert _n_frame_shards(valid) == N_DEV
        assert np.isfinite(float(stat))

        for k in range(N_DEV):
            d1, v1 = compute_disparity(jnp.asarray(ls[k]), jnp.asarray(rs[k]),
                                       mcfg, wcfg, True)
            np.testing.assert_array_equal(np.asarray(valid[k]),
                                          np.asarray(v1))
            np.testing.assert_allclose(np.asarray(disp[k]), np.asarray(d1),
                                       atol=1e-4)

    def test_pallas_sharded_matches_xla_twin(self, mesh, stereo_batch):
        """Cross-backend: the sharded Pallas output agrees with the sharded
        XLA twin within the suite's established pallas-vs-xla tolerance
        (sentinel-border differences excluded via the valid mask)."""
        ls, rs = stereo_batch
        wcfg = WLSConfig(iterations=2)
        kw = dict(num_disparities=16, block_size=3, speckle_window_size=0)
        dp, vp, _ = pbatch.batched_depth(
            ls, rs, mesh, StereoMatcherConfig(backend="pallas", **kw), wcfg,
            with_wls=False)
        dx, vx, _ = pbatch.batched_depth(
            ls, rs, mesh, StereoMatcherConfig(backend="xla", **kw), wcfg,
            with_wls=False)
        dp, vp = np.asarray(dp), np.asarray(vp)
        dx, vx = np.asarray(dx), np.asarray(vx)
        assert (vp == vx).mean() == 1.0
        both = vp & vx
        reg = np.zeros_like(both)
        reg[:, :, 16 + 2:] = True  # away from the sentinel-dominated border
        assert np.abs(dp - dx)[both & reg].max() < 1e-4


class TestRowShardedSGM:
    """SURVEY section 2.5 TP row: ONE frame's cost volume sharded over the
    row axis, vertical carries relayed between shards with ppermute
    (sgm_sharded.py). Bitwise equality with the single-device fused
    path — no overlap-band approximation."""

    @pytest.mark.parametrize("ndir,scene", [(3, "render"), (4, "render"),
                                            (4, "noise")])
    def test_rowsharded_matches_single_device(self, mesh, ndir, scene):
        from recon3d_tpu.depth.sgm_pallas import sgm_disparity_pallas
        from recon3d_tpu.depth.sgm_sharded import (
            sgm_disparity_pallas_rowsharded)
        from recon3d_tpu.parallel.mesh import make_mesh

        H, W, D = 128, 128, 128  # H % (4 shards * 8) == 0
        if scene == "noise":
            # dense random texture exercises every carry path hard — a
            # smooth rendered scene once masked a relay off-by-one that
            # only noise exposed (reverse-sweep band indexing)
            rng = np.random.RandomState(3)
            gl = (rng.rand(H, W) * 255.0).astype(np.float32)
            gr = np.roll(gl, -5, axis=1)
        else:
            cam = FakeStereoCamera(width=W, height=H, focal=90.0,
                                   baseline=0.06)
            gl, gr, _, _ = cam.render(0)
        row_mesh = make_mesh(4, ("row",))
        kw = dict(num_disparities=D, block_size=5, num_directions=ndir,
                  interpret=True)

        d1, v1 = sgm_disparity_pallas(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            **kw)
        ds, vs = sgm_disparity_pallas_rowsharded(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            row_mesh, **kw)

        # the output really is sharded over the row axis
        starts = {s.index[0].start or 0 for s in ds.addressable_shards}
        assert len(starts) == 4

        np.testing.assert_array_equal(np.asarray(vs), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(ds), np.asarray(d1))

    @pytest.mark.parametrize("ndir,H", [
        (4, 104),    # misaligned height: pads 104 -> 128 (24 pad rows)
        (8, 128),    # full MODE_HH direction set: diagonal carry relays
        (8, 104),    # diagonals + internal padding together
    ])
    def test_rowsharded_pad_and_diag(self, mesh, ndir, H):
        """Auto-padded heights and 8-direction mode stay bitwise-equal to
        the single-device path on the real rows (the round-3 scope cuts:
        H had to pre-divide n*8, sgm8 was single-chip only)."""
        from recon3d_tpu.depth.sgm_pallas import sgm_disparity_pallas
        from recon3d_tpu.depth.sgm_sharded import (
            sgm_disparity_pallas_rowsharded)
        from recon3d_tpu.parallel.mesh import make_mesh

        W, D = 128, 128
        rng = np.random.RandomState(7)
        gl = (rng.rand(H, W) * 255.0).astype(np.float32)
        gr = np.roll(gl, -5, axis=1)
        row_mesh = make_mesh(4, ("row",))
        kw = dict(num_disparities=D, block_size=5, num_directions=ndir,
                  interpret=True)

        d1, v1 = sgm_disparity_pallas(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            **kw)
        ds, vs = sgm_disparity_pallas_rowsharded(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            row_mesh, **kw)

        np.testing.assert_array_equal(np.asarray(vs), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(ds), np.asarray(d1))

    def test_rowsharded_production_height(self, mesh):
        """The shipped 1080p frame height on a power-of-two mesh: 1080
        pads internally to 1088 (the round-3 path asserted instead).
        Narrow width/small D keep the interpret-mode cost bounded; the
        height/pad geometry is exactly production's."""
        from recon3d_tpu.depth.sgm_pallas import sgm_disparity_pallas
        from recon3d_tpu.depth.sgm_sharded import (
            sgm_disparity_pallas_rowsharded)
        from recon3d_tpu.parallel.mesh import make_mesh

        H, W, D = 1080, 128, 128
        cam = FakeStereoCamera(width=W, height=H, focal=90.0, baseline=0.06)
        gl, gr, _, _ = cam.render(0)
        row_mesh = make_mesh(4, ("row",))
        kw = dict(num_disparities=D, block_size=5, num_directions=4,
                  interpret=True)

        d1, v1 = sgm_disparity_pallas(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            **kw)
        ds, vs = sgm_disparity_pallas_rowsharded(
            jnp.asarray(gl, jnp.float32), jnp.asarray(gr, jnp.float32),
            row_mesh, **kw)

        np.testing.assert_array_equal(np.asarray(vs), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(ds), np.asarray(d1))

    def test_rowsharded_rejects_too_few_real_rows(self, mesh):
        from recon3d_tpu.depth.sgm_sharded import (
            sgm_disparity_pallas_rowsharded)
        from recon3d_tpu.parallel.mesh import make_mesh

        row_mesh = make_mesh(4, ("row",))
        # 100 -> Hpad 128, last shard keeps 4 real rows < the 8-row halo
        img = jnp.zeros((100, 128), jnp.float32)
        with pytest.raises(AssertionError, match="real rows"):
            sgm_disparity_pallas_rowsharded(img, img, row_mesh,
                                            interpret=True)


class TestShardedRegistration:
    def test_batched_vmap_matches_sequential(self, cloud_pairs):
        srcs, tgts, truths = cloud_pairs
        res = pbatch.register_pairs_batched(srcs, tgts, threshold=0.1,
                                            max_iterations=30)
        for k in range(N_DEV):
            one = registration_icp(jax.tree.map(lambda a: a[k], srcs),
                                   jax.tree.map(lambda a: a[k], tgts),
                                   threshold=0.1, max_iterations=30)
            np.testing.assert_allclose(np.asarray(res.transformation[k]),
                                       np.asarray(one.transformation),
                                       atol=5e-4)
            # and it actually solved the problem
            np.testing.assert_allclose(np.asarray(res.transformation[k]),
                                       truths[k], atol=5e-3)

    def test_sharded_pairs_match_and_stay_sharded(self, mesh, cloud_pairs):
        srcs, tgts, truths = cloud_pairs
        res = pbatch.register_pairs_sharded(srcs, tgts, mesh, threshold=0.1,
                                            max_iterations=30)
        assert _n_frame_shards(res.transformation) == N_DEV
        ref = pbatch.register_pairs_batched(srcs, tgts, threshold=0.1,
                                            max_iterations=30)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(ref.transformation), atol=5e-4)
        np.testing.assert_allclose(np.asarray(res.transformation), truths,
                                   atol=5e-3)


class TestMeshHelpers:
    def test_shard_frames_places_leading_axis(self, mesh):
        x = np.zeros((16, 6, 4), np.float32)
        (sx,) = shard_frames(mesh, (x,))
        assert _n_frame_shards(sx) == N_DEV
        assert sx.sharding == frame_sharding(mesh, 3)

    def test_graft_entry_dryrun_smoke(self):
        """The driver-contract dryrun must pass in-process on this mesh."""
        import __graft_entry__ as g

        g.dryrun_multichip(N_DEV)


class TestShardedFusionConsumer:
    """SURVEY section 2.5's 'optional multi-chip sharding over frames' for
    the STREAMING consumer (check90.py:188-241): a backlog of B frames
    tracks in parallel against the broadcast keyframe and integrates as
    one all-reduced weighted sum (parallel/fusion.py). Sharded output must
    match the sequential per-frame odometry+integrate path."""

    def test_fused_frames_sharded_matches_sequential(self, mesh):
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera
        from recon3d_tpu.fusion import tsdf as _tsdf
        from recon3d_tpu.parallel.fusion import fused_frames_sharded
        from recon3d_tpu.registration.odometry import compute_rgbd_odometry
        from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage

        cam = SyntheticRGBDCamera(width=96, height=80, fx=80.0, fy=80.0,
                                  n_frames=N_DEV + 1)
        cam.open()
        frames = [cam.grab() for _ in range(N_DEV + 1)]
        cam.close()
        intr = CameraIntrinsics(fx=jnp.float32(80.0), fy=jnp.float32(80.0),
                                cx=jnp.float32(96 / 2 - 0.5),
                                cy=jnp.float32(80 / 2 - 0.5))
        kc, kd = frames[0]
        colors = jnp.stack([jnp.asarray(c) for c, _ in frames[1:]])
        depths = jnp.stack([jnp.asarray(d) for _, d in frames[1:]])

        def mk_vol():
            return _tsdf.make_volume(
                48, voxel_size=0.02, sdf_trunc=0.1,
                origin=(-0.5, -0.5, 0.5), with_color=False)

        vol_sh, wfcs, ok = fused_frames_sharded(
            mk_vol(), kc, kd, colors, depths, intr, mesh,
            odo_levels=2)
        assert _n_frame_shards(wfcs) == N_DEV
        assert bool(np.asarray(ok).all()), "odometry failed on clean frames"

        # sequential oracle: per-frame odometry vs the same keyframe +
        # per-frame integrate
        key = RGBDImage(color=jnp.asarray(kc), depth=jnp.asarray(kd))
        vol_seq = mk_vol()
        wfcs_seq = []
        for b in range(N_DEV):
            res = compute_rgbd_odometry(
                key, RGBDImage(color=colors[b], depth=depths[b]), intr,
                levels=2)
            wfc = jnp.linalg.inv(res.transformation)
            wfcs_seq.append(wfc)
            vol_seq = _tsdf.integrate(vol_seq, depths[b], intr,
                                      jnp.linalg.inv(wfc))

        np.testing.assert_allclose(np.asarray(wfcs),
                                   np.asarray(jnp.stack(wfcs_seq)),
                                   atol=1e-5)
        # exact affine-prefix integrate == sequential integrates up to
        # f32 rounding of the distributed division
        np.testing.assert_allclose(np.asarray(vol_sh.tsdf),
                                   np.asarray(vol_seq.tsdf), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(vol_sh.weight),
                                      np.asarray(vol_seq.weight))

    def test_weight_cap_crossing(self, mesh):
        """Round-4 caveat closed: voxel weights CROSS weight_max mid-batch
        (weight_max=2, B=8 frames re-observing the same voxels) and the
        sharded integrate still matches the sequential capped EMA — the
        regime where the old all-reduced weighted sum silently diverged
        (it applied the cap once, at combine time). Poses are FIXED so the
        comparison isolates the integrate math from odometry/inv rounding
        (batched vs single matrix inverse differ at ulp level, which can
        flip a projected pixel)."""
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera
        from recon3d_tpu.fusion import tsdf as _tsdf
        from recon3d_tpu.parallel.fusion import integrate_frames_exact
        from recon3d_tpu.utils.types import CameraIntrinsics

        W_MAX = 2.0
        cam = SyntheticRGBDCamera(width=96, height=80, fx=80.0, fy=80.0,
                                  n_frames=N_DEV)
        cam.open()
        frames = [cam.grab() for _ in range(N_DEV)]
        cam.close()
        intr = CameraIntrinsics(fx=jnp.float32(80.0), fy=jnp.float32(80.0),
                                cx=jnp.float32(96 / 2 - 0.5),
                                cy=jnp.float32(80 / 2 - 0.5))
        colors = jnp.stack([jnp.asarray(c) for c, _ in frames])
        depths = jnp.stack([jnp.asarray(d) for _, d in frames])
        # small fixed camera jitters: same arithmetic on both paths
        exts = jnp.stack([
            jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.002 * b)
            for b in range(N_DEV)])

        def mk_vol():
            return _tsdf.make_volume(
                48, voxel_size=0.02, sdf_trunc=0.1,
                origin=(-0.5, -0.5, 0.5), with_color=True)

        vol_sh = integrate_frames_exact(
            mk_vol(), depths, exts, intr, mesh, colors=colors,
            weight_max=W_MAX)

        vol_seq = mk_vol()
        for b in range(N_DEV):
            vol_seq = _tsdf.integrate(
                vol_seq, depths[b], intr, exts[b],
                color=colors[b], weight_max=W_MAX)
        # the surface shell is hit every frame: confirm the cap really
        # was crossed mid-batch (else this test wouldn't bite)
        n_capped = int(np.asarray(
            jnp.sum(vol_seq.weight >= W_MAX)))
        assert n_capped > 100, f"cap never crossed ({n_capped} voxels)"
        np.testing.assert_allclose(np.asarray(vol_sh.tsdf),
                                   np.asarray(vol_seq.tsdf), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(vol_sh.weight),
                                      np.asarray(vol_seq.weight))
        np.testing.assert_allclose(np.asarray(vol_sh.color),
                                   np.asarray(vol_seq.color), atol=2e-5)
