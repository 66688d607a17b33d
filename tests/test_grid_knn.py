"""Grid-binned neighbor search vs the exact brute-force kernels.

grid_knn's contract: exact for neighbor pairs within `radius` when no cell
overflows. The reference's scale target is test/gpu-performance.py:23-46
(10M-point ops); these tests pin correctness at test scale, the TPU bench
exercises the large-N path.
"""
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.ops import knn as bknn
from recon3d_tpu.ops.grid_knn import grid_knn, grid_nearest_neighbor


def _cloud(n=4096, seed=0, scale=0.5):
    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3).astype(np.float32) * scale
    valid = np.ones(n, bool)
    valid[::17] = False
    return pts, valid


class TestGridKNN:
    def test_in_radius_recall_is_exact(self):
        pts, valid = _cloud()
        r = 0.04
        res = grid_knn(jnp.asarray(pts), jnp.asarray(valid), r, k=10,
                       grid_size=32, cell_capacity=16)
        assert float(res.overflow_fraction) == 0.0
        bi, bd = map(np.asarray, bknn.knn(jnp.asarray(pts),
                                          jnp.asarray(valid), k=10))
        gi, gd = np.asarray(res.indices), np.asarray(res.sq_dists)
        r2 = r * r
        match = tot = 0
        for i in range(len(pts)):
            if not valid[i]:
                continue
            bset = {int(bi[i, j]) for j in range(10) if bd[i, j] < r2}
            gset = {int(gi[i, j]) for j in range(10) if gd[i, j] < r2}
            tot += len(bset)
            match += len(bset & gset)
        assert tot > 10000
        assert match == tot, f"recall {match}/{tot}"

    def test_overflow_reported(self):
        # everything in one cell of capacity 4 -> heavy overflow
        pts = np.zeros((64, 3), np.float32)
        res = grid_knn(jnp.asarray(pts), jnp.ones(64, bool), 1.0, k=4,
                       grid_size=8, cell_capacity=4)
        assert float(res.overflow_fraction) > 0.9

    def test_invalid_points_excluded(self):
        pts, valid = _cloud(512)
        res = grid_knn(jnp.asarray(pts), jnp.asarray(valid), 0.1, k=5,
                       grid_size=16, cell_capacity=64)
        gi, gd = np.asarray(res.indices), np.asarray(res.sq_dists)
        found = gd < 1e29
        assert valid[gi[found]].all(), "an invalid point appeared as neighbor"
        assert not found[~valid].any(), "invalid queries returned neighbors"


class TestGridNearestNeighbor:
    def test_matches_brute_force_within_radius(self):
        q, qv = _cloud(2048, seed=1)
        db, dbv = _cloud(2048, seed=2)
        r = 0.05
        gi, gd = grid_nearest_neighbor(jnp.asarray(q), jnp.asarray(qv),
                                       jnp.asarray(db), jnp.asarray(dbv), r,
                                       grid_size=32, cell_capacity=16)
        bi, bd = bknn.nearest_neighbor(jnp.asarray(q), jnp.asarray(qv),
                                       jnp.asarray(db), jnp.asarray(dbv))
        gi, gd, bi, bd = map(np.asarray, (gi, gd, bi, bd))
        m = qv & (bd < r * r)
        assert m.sum() > 1000
        # distances must match everywhere; indices may differ only on
        # exact-tie neighbors (two db points equidistant from the query)
        # brute force computes |a|^2+|b|^2-2ab (matmul form), the grid path
        # (a-b)^2 directly — identical up to f32 formula rounding
        np.testing.assert_allclose(gd[m], bd[m], rtol=2e-3, atol=2e-7)
        assert (gi[m] == bi[m]).mean() > 0.999


class TestGridMoments:
    def test_moment_normals_match_analytic_surface(self):
        """PCA normals from grid_pca_moments vs the analytic normal of a
        smooth synthetic surface — the large-N (>32k points) path
        estimate_normals switches to."""
        from recon3d_tpu.pointcloud.normals import estimate_normals
        from recon3d_tpu.utils.types import PointCloud

        rng = np.random.RandomState(0)
        # just above the 32768 grid-path threshold; a 24^3 grid keeps the
        # CPU run tractable (the 64^3 configuration this test originally
        # used burned 16 minutes of suite wall time for the same assertion)
        n = 36000
        xy = rng.rand(n, 2).astype(np.float32)
        z = 0.05 * np.sin(5 * xy[:, 0]) * np.cos(5 * xy[:, 1])
        pts = np.stack([xy[:, 0], xy[:, 1], z.astype(np.float32)], 1)
        pc = PointCloud(points=jnp.asarray(pts), valid=jnp.ones(n, bool))
        out = estimate_normals(pc, radius=0.043, grid_size=24,
                               cell_capacity=24)
        ng = np.asarray(out.normals)
        dzdx = 0.25 * np.cos(5 * xy[:, 0]) * np.cos(5 * xy[:, 1])
        dzdy = -0.25 * np.sin(5 * xy[:, 0]) * np.sin(5 * xy[:, 1])
        na = np.stack([-dzdx, -dzdy, np.ones(n)], 1)
        na /= np.linalg.norm(na, axis=1, keepdims=True)
        # interior points only: the voxel grid covers grid_size*radius from
        # the min corner (~1.03 here), and border neighborhoods are one-sided
        interior = np.all((pts[:, :2] > 0.05) & (pts[:, :2] < 0.95), axis=1)
        cos = np.abs(np.sum(ng * na, 1))[interior]
        assert np.median(cos) > 0.97, f"median |cos| {np.median(cos):.4f}"
        assert (cos > 0.9).mean() > 0.9


class TestGridMomentsPallas:
    """The TPU Pallas slab kernel (ops.grid_knn_pallas) against the XLA
    twin, interpret mode on CPU — the production large-N normals path."""

    def test_matches_xla_twin(self):
        import jax.numpy as jnp

        from recon3d_tpu.ops import grid_knn as gk
        from recon3d_tpu.ops.grid_knn_pallas import grid_pca_moments_pallas

        rng = np.random.RandomState(7)
        pts = jnp.asarray(rng.rand(3000, 3) * 0.7, jnp.float32)
        valid = jnp.asarray(rng.rand(3000) > 0.05)
        kw = dict(grid_size=16, cell_capacity=8)
        n0, m0, c0 = gk.grid_pca_moments(pts, valid, 0.05, **kw)
        n1, m1, c6 = grid_pca_moments_pallas(pts, valid, 0.05,
                                             interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-5)
        c0 = np.asarray(c0)
        want6 = np.stack([c0[:, 0, 0], c0[:, 1, 1], c0[:, 2, 2],
                          c0[:, 0, 1], c0[:, 0, 2], c0[:, 1, 2]], -1)
        np.testing.assert_allclose(np.asarray(c6), want6, atol=1e-5)

    def test_padded_lane_stride_matches_xla_twin(self):
        """Grid sizes whose (y, z) plane is not a 128-lane multiple get a
        padded z stride (grid_knn._lane_stride; G=12 -> gz=32 here): dead
        lanes must never contribute and results must equal the XLA twin."""
        import jax.numpy as jnp

        from recon3d_tpu.ops import grid_knn as gk
        from recon3d_tpu.ops.grid_knn_pallas import grid_pca_moments_pallas

        assert gk._lane_stride(12) == 32
        assert gk._lane_stride(64) == 64
        rng = np.random.RandomState(5)
        pts = jnp.asarray(rng.rand(3000, 3) * 0.55, jnp.float32)
        valid = jnp.asarray(rng.rand(3000) > 0.05)
        kw = dict(grid_size=12, cell_capacity=16)
        n0, m0, c0 = gk.grid_pca_moments(pts, valid, 0.05, **kw)
        n1, m1, c6 = grid_pca_moments_pallas(pts, valid, 0.05,
                                             interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-5)
        c0 = np.asarray(c0)
        want6 = np.stack([c0[:, 0, 0], c0[:, 1, 1], c0[:, 2, 2],
                          c0[:, 0, 1], c0[:, 0, 2], c0[:, 1, 2]], -1)
        np.testing.assert_allclose(np.asarray(c6), want6, atol=1e-5)

    def test_onehot_pack_bitwise_matches_xla_pack(self):
        """The MXU one-hot pack kernel (_bin_points_packed_pallas) must be
        BITWISE equal to the XLA per-slot gather it replaces (pk table,
        point->slot map, overflow fraction), including invalid points and
        padded lane strides. The one-hot selection matmul runs at HIGHEST
        precision, which reproduces f32 coordinates exactly."""
        import jax.numpy as jnp

        from recon3d_tpu.ops import grid_knn as gk
        from recon3d_tpu.ops.grid_knn_pallas import _bin_points_packed_pallas

        rng = np.random.RandomState(13)
        for n, G, C, r in [(5000, 16, 8, 0.05), (20000, 24, 16, 0.04)]:
            pts = jnp.asarray(rng.rand(n, 3) * 0.8, jnp.float32)
            valid = jnp.asarray(rng.rand(n) > 0.05)
            pk0, ps0, ov0 = gk._bin_points_packed(pts, valid, r, G, C)
            pk1, ps1, ov1 = _bin_points_packed_pallas(pts, valid, r, G, C,
                                                      interpret=True)
            assert bool(jnp.all(pk0 == pk1)), f"pk mismatch G={G} C={C}"
            assert bool(jnp.all(ps0 == ps1))
            assert float(ov0) == float(ov1)

    def test_onehot_pack_reports_window_overflow(self):
        """A block whose RAW sorted span exceeds the static DMA window
        (local density far beyond capacity) must surface in the overflow
        fraction instead of silently degrading."""
        import jax.numpy as jnp

        from recon3d_tpu.ops import grid_knn as gk
        from recon3d_tpu.ops.grid_knn_pallas import _bin_points_packed_pallas

        rng = np.random.RandomState(3)
        # 40k points crammed into a couple of cells: raw span per block
        # >> W = C*LB + slack with C=4
        pts = jnp.asarray(rng.rand(40000, 3) * 0.01, jnp.float32)
        valid = jnp.ones(40000, bool)
        _, _, ov0 = gk._bin_points_packed(pts, valid, 0.05, 16, 4)
        _, _, ov1 = _bin_points_packed_pallas(pts, valid, 0.05, 16, 4,
                                              interpret=True)
        assert float(ov1) > float(ov0)

    def test_moments_with_pallas_pack_match_xla_pack(self):
        """grid_pca_moments_pallas(pack='pallas') — the full production
        composition on TPU — equals the XLA-pack route bitwise."""
        import jax.numpy as jnp

        from recon3d_tpu.ops.grid_knn_pallas import grid_pca_moments_pallas

        rng = np.random.RandomState(17)
        pts = jnp.asarray(rng.rand(4000, 3) * 0.6, jnp.float32)
        valid = jnp.asarray(rng.rand(4000) > 0.03)
        a = grid_pca_moments_pallas(pts, valid, 0.05, grid_size=16,
                                    cell_capacity=8, interpret=True,
                                    pack="xla")
        b = grid_pca_moments_pallas(pts, valid, 0.05, grid_size=16,
                                    cell_capacity=8, interpret=True,
                                    pack="pallas")
        for x, y in zip(a, b):
            assert bool(jnp.all(x == y))

    def test_channelwise_eig_matches_matrix_eig(self):
        import jax.numpy as jnp

        from recon3d_tpu.pointcloud.normals import (_smallest_eigvec_3x3,
                                                    _smallest_eigvec_cov6)

        rng = np.random.RandomState(3)
        # random symmetric PSD matrices with planar anisotropy
        A = rng.randn(500, 3, 3).astype(np.float32) * 0.1
        C = A @ A.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
        v_m = np.asarray(_smallest_eigvec_3x3(jnp.asarray(C)))
        cov6 = jnp.asarray(np.stack([C[:, 0, 0], C[:, 1, 1], C[:, 2, 2],
                                     C[:, 0, 1], C[:, 0, 2], C[:, 1, 2]], -1))
        v_c = np.asarray(_smallest_eigvec_cov6(cov6))
        # same direction up to sign
        dots = np.abs(np.sum(v_m * v_c, -1))
        assert np.median(dots) > 0.99999
        assert (dots > 0.999).mean() > 0.99

    def test_slot_space_normals_match_point_space(self):
        """The TPU fast path (eig in slot space, 3-channel readback) must
        agree with the point-space moments+eig route."""
        import jax.numpy as jnp

        from recon3d_tpu.ops import grid_knn as gk
        from recon3d_tpu.pointcloud.normals import (_grid_normals_pallas,
                                                    _smallest_eigvec_cov6)

        rng = np.random.RandomState(11)
        # a surface-like cloud: neighborhoods are planar, so the smallest
        # eigenvector is well-conditioned (isolated random points have
        # degenerate covariances whose eigvec flips on summation-order
        # noise between the two implementations — not a real difference)
        n = 8000
        xy = rng.rand(n, 2).astype(np.float32) * 0.7
        z = 0.03 * np.sin(8 * xy[:, 0]) + 0.01 * rng.randn(n).astype(np.float32)
        pts = jnp.asarray(np.stack([xy[:, 0], xy[:, 1], z], 1))
        valid = jnp.asarray(rng.rand(n) > 0.05)
        n_cnt, _, _ = gk.grid_pca_moments(pts, valid, 0.05, grid_size=16,
                                          cell_capacity=64)
        nrm_fast = np.asarray(_grid_normals_pallas(pts, valid, 0.05, 16, 64,
                                                   interpret=True))
        C = gk.grid_pca_moments(pts, valid, 0.05, grid_size=16,
                                cell_capacity=64)[2]
        cov6 = jnp.stack([C[:, 0, 0], C[:, 1, 1], C[:, 2, 2],
                          C[:, 0, 1], C[:, 0, 2], C[:, 1, 2]], -1)
        nrm_ref = np.asarray(_smallest_eigvec_cov6(cov6))
        well = np.asarray(n_cnt) >= 5
        assert well.mean() > 0.8
        dots = np.abs(np.sum(nrm_fast * nrm_ref, -1))[well]
        assert np.median(dots) > 0.99999
        assert (dots > 0.999).mean() > 0.99
