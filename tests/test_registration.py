"""Registration tests with exact synthetic oracles (ground-truth poses)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recon3d_tpu.registration import se3
from recon3d_tpu.registration.icp import (
    covariances_for_gicp,
    evaluate_registration,
    information_matrix,
    registration_icp,
)
from recon3d_tpu.registration.odometry import compute_rgbd_odometry
from recon3d_tpu.utils.types import CameraIntrinsics, PointCloud, RGBDImage


def _surface_cloud(n=800, seed=0):
    """Noisy curved surface (unambiguous registration target)."""
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * 2 - 1
    z = 0.3 * np.sin(2.0 * xy[:, 0]) + 0.2 * np.cos(3.0 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    return pts


def _pose(rvec, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(jax.device_get(se3.so3_exp(jnp.asarray(rvec, jnp.float32))))
    T[:3, 3] = t
    return T


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.RandomState(0)
        xi = rng.randn(20, 6).astype(np.float32) * 0.5
        T = se3.se3_exp(jnp.asarray(xi))
        back = np.asarray(se3.se3_log(T))
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_inverse(self):
        xi = jnp.asarray([0.1, -0.2, 0.3, 0.2, -0.1, 0.15], jnp.float32)
        T = se3.se3_exp(xi)
        I = np.asarray(se3.inverse(T) @ T)
        np.testing.assert_allclose(I, np.eye(4), atol=1e-6)

    def test_small_angle_stability(self):
        xi = jnp.asarray([1e-9, 0, 0, 1e-9, 0, 0], jnp.float32)
        T = np.asarray(se3.se3_exp(xi))
        assert np.isfinite(T).all()
        np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


class TestICP:
    def test_point_to_point_recovers_pose(self):
        pts = _surface_cloud()
        T_true = _pose([0.03, -0.02, 0.04], [0.02, -0.015, 0.01])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3])
        res = registration_icp(src, tgt, threshold=0.1, method="point_to_point",
                               max_iterations=50)
        err = np.asarray(res.transformation) - T_true
        assert np.abs(err).max() < 1e-3
        assert float(res.fitness) > 0.99
        assert float(res.inlier_rmse) < 1e-3

    def test_point_to_plane_recovers_pose(self):
        from recon3d_tpu.pointcloud.normals import estimate_normals

        pts = _surface_cloud(seed=1)
        T_true = _pose([0.02, 0.03, -0.02], [0.01, 0.02, -0.01])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy((pts @ T_true[:3, :3].T + T_true[:3, 3]))
        tgt = estimate_normals(tgt, radius=0.3, max_nn=20)
        res = registration_icp(src, tgt, threshold=0.1, method="point_to_plane",
                               max_iterations=30)
        err = np.abs(np.asarray(res.transformation) - T_true).max()
        assert err < 2e-3

    def test_gicp_recovers_pose(self):
        pts = _surface_cloud(seed=2)
        T_true = _pose([0.02, -0.03, 0.01], [0.015, 0.01, -0.02])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3])
        cov_s = covariances_for_gicp(src)
        cov_t = covariances_for_gicp(tgt)
        res = registration_icp(src, tgt, threshold=0.1, method="gicp",
                               max_iterations=30, source_cov=cov_s, target_cov=cov_t)
        err = np.abs(np.asarray(res.transformation) - T_true).max()
        assert err < 2e-3

    def test_gicp_large_total_rotation(self):
        """The combined covariance must ride the running rotation
        (C_tgt + R C_src R^T): with a ~30 degree total rotation and a
        close-but-rotated init, the round-1 'R ~ I' shortcut biases the
        Mahalanobis weights; the fixed step still converges tightly."""
        from recon3d_tpu.registration.se3 import se3_exp

        pts = _surface_cloud(seed=4)
        T_true = np.asarray(se3_exp(jnp.asarray(
            [0.01, -0.02, 0.015, 0.05, 0.52, 0.1], jnp.float32)))  # ~30 deg
        T_init = np.asarray(se3_exp(jnp.asarray(
            [0.0, 0.0, 0.0, 0.06, 0.50, 0.12], jnp.float32)))
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3])
        cov_s = covariances_for_gicp(src)
        cov_t = covariances_for_gicp(tgt)
        res = registration_icp(src, tgt, threshold=0.1, method="gicp",
                               init=jnp.asarray(T_init), max_iterations=50,
                               source_cov=cov_s, target_cov=cov_t)
        err = np.abs(np.asarray(res.transformation) - T_true).max()
        assert err < 2e-3, f"large-rotation GICP error {err:.5f}"

    def test_gicp_matches_float64_exact_oracle(self):
        """Bound the jit GICP's numerics against an independent float64
        reference (VERDICT weak #7: no external numerical bound existed).

        The oracle is Segal et al.'s plane-to-plane update written in plain
        numpy: exact scipy cKDTree 1-NN correspondences, float64 per-pair
        Mahalanobis weights M = C_t + R C_s R^T, a dense 6x6 Gauss-Newton
        solve, and scipy.linalg.expm for the se3 exponential (independent
        of registration/se3.py). Both optimizers get identical inputs
        (same noisy clouds, same covariances, same threshold) and must
        land on the same fixed point — this bounds the float32 + blocked
        1-NN + linearization error of the production path end to end."""
        from scipy.linalg import expm
        from scipy.spatial import cKDTree

        rng = np.random.RandomState(7)
        pts = _surface_cloud(n=700, seed=7)
        T_true = _pose([0.05, -0.08, 0.12], [0.03, 0.02, -0.04])
        tgt_np = (pts @ T_true[:3, :3].T + T_true[:3, 3]
                  + rng.randn(*pts.shape).astype(np.float32) * 0.003)
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(tgt_np)
        cov_s = covariances_for_gicp(src)
        cov_t = covariances_for_gicp(tgt)

        res = registration_icp(src, tgt, threshold=0.1, method="gicp",
                               max_iterations=60, source_cov=cov_s,
                               target_cov=cov_t)
        T_ours = np.asarray(res.transformation, np.float64)

        # --- float64 exact-NN reference of the same objective ---
        s64 = pts.astype(np.float64)
        t64 = tgt_np.astype(np.float64)
        Cs = np.asarray(cov_s, np.float64)
        Ct = np.asarray(cov_t, np.float64)
        tree = cKDTree(t64)
        T = np.eye(4)
        for _ in range(200):
            R, t = T[:3, :3], T[:3, 3]
            p = s64 @ R.T + t
            d, idx = tree.query(p)
            ok = d <= 0.1
            pi, qi = p[ok], t64[idx[ok]]
            M = Ct[idx[ok]] + np.einsum("ij,njk,lk->nil", R, Cs[ok], R)
            Minv = np.linalg.inv(M)
            r = pi - qi
            hat = np.zeros((pi.shape[0], 3, 3))
            hat[:, 0, 1], hat[:, 0, 2] = -pi[:, 2], pi[:, 1]
            hat[:, 1, 0], hat[:, 1, 2] = pi[:, 2], -pi[:, 0]
            hat[:, 2, 0], hat[:, 2, 1] = -pi[:, 1], pi[:, 0]
            J = np.concatenate(
                [np.broadcast_to(np.eye(3), hat.shape), -hat], axis=2)
            WJ = Minv @ J
            A = np.einsum("nij,nik->jk", J, WJ)
            b = np.einsum("nij,ni->j", WJ, r)
            xi = -np.linalg.solve(A, b)
            X = np.zeros((4, 4))
            X[:3, :3] = [[0, -xi[5], xi[4]],
                         [xi[5], 0, -xi[3]],
                         [-xi[4], xi[3], 0]]
            X[:3, 3] = xi[:3]
            T = expm(X) @ T
            if np.abs(xi).max() < 1e-12:
                break

        diff = np.abs(T_ours - T).max()
        assert diff < 1e-3, f"jit GICP vs float64 oracle diverge: {diff:.2e}"
        # and both sit on the truth to within the injected noise level
        assert np.abs(T - T_true).max() < 5e-3
        assert np.abs(T_ours - T_true).max() < 5e-3

    def test_quality_gate(self):
        pts = _surface_cloud(seed=3)
        src = PointCloud.from_numpy(pts)
        far = PointCloud.from_numpy(pts + np.array([10, 0, 0], np.float32))
        res = evaluate_registration(src, far, threshold=0.02)
        assert not bool(res.is_good())  # check6.py:65-76 gate rejects

    def test_information_matrix_psd(self):
        pts = _surface_cloud(seed=4)
        src = PointCloud.from_numpy(pts)
        info = np.asarray(information_matrix(src, src, 0.05, jnp.eye(4)))
        assert info.shape == (6, 6)
        w = np.linalg.eigvalsh(info)
        assert w.min() >= -1e-3
        np.testing.assert_allclose(info, info.T, atol=1e-3)


class TestGlobalRegistration:
    @pytest.fixture(scope="class")
    def clouds_and_features(self):
        from recon3d_tpu.pointcloud.normals import estimate_normals
        from recon3d_tpu.registration.features import compute_fpfh

        pts = _surface_cloud(1000, seed=5)
        # large transform: global registration territory
        T_true = _pose([0.3, -0.5, 0.8], [0.4, -0.3, 0.5])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3])
        src = estimate_normals(src, radius=0.25, max_nn=30)
        tgt = estimate_normals(tgt, radius=0.25, max_nn=30)
        fs = compute_fpfh(src, radius=0.4, max_nn=50)
        ft = compute_fpfh(tgt, radius=0.4, max_nn=50)
        return src, tgt, fs, ft, T_true

    def test_fpfh_rotation_invariance(self, clouds_and_features):
        src, tgt, fs, ft, T_true = clouds_and_features
        fs_n, ft_n = np.asarray(fs), np.asarray(ft)
        # same underlying points: feature of point i should match closely
        num = (fs_n * ft_n).sum(1)
        den = np.linalg.norm(fs_n, axis=1) * np.linalg.norm(ft_n, axis=1) + 1e-9
        cos = num / den
        assert np.median(cos) > 0.98

    def test_ransac_recovers_large_pose(self, clouds_and_features):
        from recon3d_tpu.registration.ransac import registration_ransac_fpfh

        src, tgt, fs, ft, T_true = clouds_and_features
        res = registration_ransac_fpfh(src, tgt, fs, ft, distance_threshold=0.05,
                                       num_trials=8192, seed=1)
        err = np.abs(np.asarray(res.transformation) - T_true).max()
        assert err < 5e-3, f"pose error {err}"
        assert float(res.fitness) > 0.95

    def test_fgr_recovers_large_pose(self, clouds_and_features):
        from recon3d_tpu.registration.ransac import registration_fgr_fpfh

        src, tgt, fs, ft, T_true = clouds_and_features
        res = registration_fgr_fpfh(src, tgt, fs, ft, max_corr_distance=0.05)
        err = np.abs(np.asarray(res.transformation) - T_true).max()
        assert err < 1e-2, f"pose error {err}"

    def test_multiscale_icp(self, clouds_and_features):
        from recon3d_tpu.registration.ransac import multiscale_icp

        src, tgt, fs, ft, T_true = clouds_and_features
        # start near the truth (multiscale ICP is a refiner)
        T0 = T_true.copy()
        T0[:3, 3] += 0.02
        res = multiscale_icp(src, tgt, voxel_sizes=(0.15, 0.05),
                             iterations=(20, 15), init=jnp.asarray(T0),
                             method="point_to_point")
        err = np.abs(np.asarray(res.transformation) - T_true).max()
        assert err < 5e-3


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self):
        from recon3d_tpu.registration.posegraph import PoseGraph, global_optimization

        rng = np.random.RandomState(0)
        n = 6
        # ground truth: poses around a circle
        true = []
        for i in range(n):
            a = 2 * np.pi * i / n
            T = _pose([0, 0, a], [np.cos(a), np.sin(a), 0.0])
            true.append(T.astype(np.float64))
        # odometry edges with drift noise
        graph = PoseGraph()
        est = np.eye(4)
        graph.add_node(est.copy())
        info = np.eye(6) * 100.0
        for i in range(1, n):
            # edge (source=i, target=i-1) measures X_target^-1 X_source
            rel = np.linalg.inv(true[i - 1]) @ true[i]
            noise = np.asarray(jax.device_get(
                se3.se3_exp(jnp.asarray(rng.randn(6) * 0.01, jnp.float32))))
            rel_noisy = rel @ noise
            # initial node estimates: truth perturbed by large noise
            est = true[i] @ np.asarray(jax.device_get(
                se3.se3_exp(jnp.asarray(rng.randn(6) * 0.05, jnp.float32))))
            graph.add_node(est)
            graph.add_edge(i, i - 1, rel_noisy, info, uncertain=False)
        # loop closure: exact
        rel_loop = np.linalg.inv(true[0]) @ true[n - 1]
        graph.add_edge(n - 1, 0, rel_loop, info, uncertain=True)

        out = global_optimization(graph, max_iterations=40)
        # after optimization, relative node poses should match truth closely
        errs = []
        for i in range(1, n):
            rel_est = np.linalg.inv(out.nodes[i]) @ out.nodes[i - 1]
            rel_true = np.linalg.inv(true[i]) @ true[i - 1]
            errs.append(np.abs(rel_est - rel_true).max())
        assert max(errs) < 0.05, f"max rel pose err {max(errs)}"

    def test_bad_loop_closure_pruned(self):
        from recon3d_tpu.registration.posegraph import PoseGraph, global_optimization

        graph = PoseGraph()
        for i in range(4):
            T = np.eye(4)
            T[0, 3] = i * 0.1
            graph.add_node(T)
        info = np.eye(6) * 100.0
        rel = np.eye(4)
        rel[0, 3] = 0.1  # X_t^-1 X_s for t=i, s=i-1 => source at +0.1 in target frame
        for i in range(1, 4):
            graph.add_edge(i, i - 1, rel, info, uncertain=False)
        bad = np.eye(4)
        bad[1, 3] = 5.0  # absurd loop closure
        graph.add_edge(3, 0, bad, info, uncertain=True)
        out = global_optimization(graph, max_iterations=30, mu=0.01)
        assert len(out.edges) == 3  # bad edge pruned


class TestOdometry:
    def test_synthetic_rgbd_odometry(self):
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera
        from recon3d_tpu.registration.odometry import compute_rgbd_odometry
        from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage

        cam = SyntheticRGBDCamera(width=320, height=240, fx=260.0, fy=260.0,
                                  n_frames=4, step=0.02)
        cam.open()
        c0, d0 = cam.grab()
        c1, d1 = cam.grab()
        intr = CameraIntrinsics(fx=jnp.float32(260.0), fy=jnp.float32(260.0),
                                cx=jnp.float32(159.5), cy=jnp.float32(119.5))
        src = RGBDImage(color=jnp.asarray(c0), depth=jnp.asarray(d0))
        tgt = RGBDImage(color=jnp.asarray(c1), depth=jnp.asarray(d1))
        res = compute_rgbd_odometry(src, tgt, intr)
        assert bool(res.success)
        # ground truth: target_from_source = pose1 @ inv(pose0)
        T_true = cam.true_pose(1) @ np.linalg.inv(cam.true_pose(0))
        T = np.asarray(res.transformation)
        t_err = np.linalg.norm(T[:3, 3] - T_true[:3, 3])
        r_err = np.abs(T[:3, :3] - T_true[:3, :3]).max()
        assert t_err < 0.005, f"translation error {t_err*1000:.2f} mm"
        assert r_err < 0.01

    def test_sweep_warp_matches_ground_truth(self):
        # the gather-free sweep warp (the TPU hot path,
        # ops.image.sweep_bilinear_stack) recovers the same synthetic
        # motion as the per-pixel gather oracle
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera
        from recon3d_tpu.registration.odometry import compute_rgbd_odometry
        from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage

        cam = SyntheticRGBDCamera(width=320, height=240, fx=260.0, fy=260.0,
                                  n_frames=4, step=0.02)
        cam.open()
        c0, d0 = cam.grab()
        c1, d1 = cam.grab()
        intr = CameraIntrinsics(fx=jnp.float32(260.0), fy=jnp.float32(260.0),
                                cx=jnp.float32(159.5), cy=jnp.float32(119.5))
        src = RGBDImage(color=jnp.asarray(c0), depth=jnp.asarray(d0))
        tgt = RGBDImage(color=jnp.asarray(c1), depth=jnp.asarray(d1))
        res = compute_rgbd_odometry(src, tgt, intr, warp="sweep")
        assert bool(res.success)
        T_true = cam.true_pose(1) @ np.linalg.inv(cam.true_pose(0))
        T = np.asarray(res.transformation)
        t_err = np.linalg.norm(T[:3, 3] - T_true[:3, 3])
        r_err = np.abs(T[:3, :3] - T_true[:3, :3]).max()
        assert t_err < 0.005, f"translation error {t_err*1000:.2f} mm"
        assert r_err < 0.01

    def test_identity_for_same_frame(self):
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera
        from recon3d_tpu.registration.odometry import compute_rgbd_odometry
        from recon3d_tpu.utils.types import CameraIntrinsics, RGBDImage

        cam = SyntheticRGBDCamera(width=160, height=120, fx=130.0, fy=130.0)
        cam.open()
        c0, d0 = cam.grab()
        intr = CameraIntrinsics(fx=jnp.float32(130.0), fy=jnp.float32(130.0),
                                cx=jnp.float32(79.5), cy=jnp.float32(59.5))
        f = RGBDImage(color=jnp.asarray(c0), depth=jnp.asarray(d0))
        res = compute_rgbd_odometry(f, f, intr)
        np.testing.assert_allclose(np.asarray(res.transformation), np.eye(4), atol=1e-4)


class TestReplayWrapOdometry:
    """Pins BENCH_r03's '1 odometry failure over 112 frames': the looped
    golden replay wraps from its last frame back to frame 0 — a genuine
    camera jump, not tracking drift. The production sweep warp bounds
    per-level pixel displacement, so the wrap pair must FAIL (and engage
    the identity+re-key fallback, check82.py:200-207 semantics) while
    consecutive frames track comfortably. One wrap per replay loop ->
    exactly one expected failure per ~87 fused frames; bench.py reports
    the count as the `odometry_failures` extra so growth is visible."""

    @pytest.fixture(scope="class")
    def golden(self):
        import glob as _glob

        from recon3d_tpu.camera.fake import FakeRGBDCamera

        if not _glob.glob("/root/reference/test/output/color_*.png"):
            pytest.skip("golden capture not available")
        cam = FakeRGBDCamera("/root/reference/test/output", prefetch=False)
        cam.open()
        # half-res (stride-2) keeps the sweep-warp compile/runtime inside
        # the suite budget; the wrap jump dwarfs the sweep bound at any
        # scale, so the failure mode is unchanged
        frames = [(c[::2, ::2], d[::2, ::2])
                  for c, d in (cam.grab() for _ in range(len(cam)))]
        cam.close()
        intr = CameraIntrinsics(
            fx=jnp.float32(616.63 / 2), fy=jnp.float32(616.31 / 2),
            cx=jnp.float32(312.58 / 2), cy=jnp.float32(242.22 / 2))
        return frames, intr

    def _rgbd(self, frames, i):
        c, d = frames[i]
        return RGBDImage(color=jnp.asarray(c), depth=jnp.asarray(d))

    def test_wrap_pair_fails_consecutive_succeeds(self, golden):
        frames, intr = golden
        # consecutive golden frames: solid tracking under the sweep warp
        r = compute_rgbd_odometry(self._rgbd(frames, 0),
                                  self._rgbd(frames, 1), intr, warp="sweep")
        assert bool(r.success)
        assert float(r.inlier_fraction) > 0.5
        # the loop wrap (last frame -> frame 0): a scene jump beyond the
        # sweep bound — must fail and hand control to the fallback
        r = compute_rgbd_odometry(self._rgbd(frames, len(frames) - 1),
                                  self._rgbd(frames, 0), intr, warp="sweep")
        assert not bool(r.success)

    def test_wrap_pair_recovers_with_exact_warp(self, golden):
        """The gather (oracle) warp has no displacement bound: the same
        wrap pair converges to SOME pose with a nonzero inlier set —
        evidence the sweep failure is the bound, not degenerate data."""
        frames, intr = golden
        r = compute_rgbd_odometry(self._rgbd(frames, len(frames) - 1),
                                  self._rgbd(frames, 0), intr,
                                  warp="gather")
        assert float(r.inlier_fraction) > 0.1
