"""Calibration parity tests against OpenCV (the oracle the reference used)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from recon3d_tpu.calib import chessboard, model, mono, npz, stereo

STEREO_NPZ = "/root/reference/Calib_depth/jetson_stereo_8MP_stereo.npz"


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64():
        yield


def _chessboard_data(V=8, noise=0.05, seed=0):
    rng = np.random.RandomState(seed)
    nx, ny, sq = 9, 6, 0.025
    obj = np.zeros((nx * ny, 3))
    obj[:, :2] = np.mgrid[0:nx, 0:ny].T.reshape(-1, 2) * sq
    K = np.array([[615.0, 0, 322.0], [0, 612.0, 241.0], [0, 0, 1]])
    d = np.array([0.08, -0.12, 0.0012, -0.0008, 0.05])
    objs, imgs, poses = [], [], []
    for _ in range(V):
        rvec = rng.randn(3) * 0.25
        tvec = np.array([
            rng.uniform(-0.1, 0.1) - obj.mean(0)[0] * 0.5,
            rng.uniform(-0.08, 0.08) - obj.mean(0)[1] * 0.5,
            rng.uniform(0.4, 0.8),
        ])
        pix, _ = cv2.projectPoints(obj.reshape(-1, 1, 3), rvec, tvec, K, d)
        objs.append(obj)
        imgs.append(pix.reshape(-1, 2) + rng.randn(nx * ny, 2) * noise)
        poses.append((rvec, tvec))
    return np.array(objs), np.array(imgs), K, d, poses


class TestProjectionModel:
    def test_project_points_parity_14param(self, x64):
        rng = np.random.RandomState(0)
        rvec, tvec = rng.randn(3) * 0.4, np.array([0.1, -0.2, 2.5])
        K = np.array([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]])
        dist = np.array([0.1, -0.05, 0.001, 0.002, 0.01, 0.02, -0.01, 0.005,
                         1e-4, -2e-4, 1e-4, 2e-4, 0.001, -0.002])
        obj = rng.randn(100, 3) * 0.3
        ours = np.asarray(model.project_points(jnp.asarray(obj), rvec, tvec, K, dist))
        ref, _ = cv2.projectPoints(obj.reshape(-1, 1, 3), rvec, tvec, K, dist)
        np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-10)

    def test_undistort_points_parity(self, x64):
        rng = np.random.RandomState(1)
        K = np.array([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]])
        dist = np.array([0.1, -0.05, 0.001, 0.002, 0.01])
        pix = rng.rand(200, 2) * [640, 480]
        ours = np.asarray(model.undistort_points(jnp.asarray(pix), K, dist, iters=20))
        ref = cv2.undistortPoints(pix.reshape(-1, 1, 2), K, dist).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-7)

    def test_rodrigues_roundtrip(self, x64):
        rng = np.random.RandomState(2)
        for _ in range(20):
            rv = rng.randn(3)
            rv = rv / np.linalg.norm(rv) * rng.uniform(0, np.pi - 1e-6)
            R, _ = cv2.Rodrigues(rv)
            ours_R = np.asarray(model.rodrigues(jnp.asarray(rv)))
            np.testing.assert_allclose(ours_R, R, atol=1e-12)
            back = np.asarray(model.rodrigues(model.inv_rodrigues(jnp.asarray(R))))
            np.testing.assert_allclose(back, R, atol=1e-10)


class TestMonoCalibration:
    def test_calibrate_camera_parity(self, x64):
        objs, imgs, K_true, d_true, _ = _chessboard_data(V=8)
        res = mono.calibrate_camera(jnp.asarray(objs), jnp.asarray(imgs), (640, 480))
        rms_cv, K_cv, d_cv, _, _ = cv2.calibrateCamera(
            objs.astype(np.float32), imgs.astype(np.float32), (640, 480), None, None
        )
        assert float(res.rms) == pytest.approx(rms_cv, abs=1e-3)
        np.testing.assert_allclose(np.asarray(res.K), K_cv, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.dist), d_cv.ravel(), atol=2e-3)

    def test_solve_pnp_parity(self, x64):
        objs, imgs, K, d, _ = _chessboard_data(V=1)
        rv, tv = mono.solve_pnp(jnp.asarray(objs[0]), jnp.asarray(imgs[0]), K, d)
        _, rv_c, tv_c = cv2.solvePnP(objs[0].reshape(-1, 1, 3), imgs[0].reshape(-1, 1, 2), K, d)
        np.testing.assert_allclose(np.asarray(rv), rv_c.ravel(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tv), tv_c.ravel(), atol=1e-5)


class TestStereo:
    def test_stereo_rectify_parity_shipped_calibration(self, x64):
        p = npz.StereoParams.load(STEREO_NPZ)
        size = (960, 540)
        res = stereo.stereo_rectify(p.mtx1, p.dist1, p.mtx2, p.dist2, size, p.R, p.T)
        R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(
            p.mtx1, p.dist1, p.mtx2, p.dist2, size, p.R, p.T,
            flags=cv2.CALIB_ZERO_DISPARITY,
        )
        np.testing.assert_allclose(np.asarray(res.R1), R1, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.R2), R2, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.P1), P1, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.P2), P2, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.Q), Q, atol=1e-4)
        # rectified focal must reproduce the shipped report value 525.607
        assert float(res.Q[2, 3]) == pytest.approx(525.607, abs=1e-3)

    @pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0])
    def test_stereo_rectify_alpha_parity(self, x64, alpha):
        p = npz.StereoParams.load(STEREO_NPZ)
        size = (960, 540)
        res = stereo.stereo_rectify(p.mtx1, p.dist1, p.mtx2, p.dist2, size, p.R, p.T, alpha=alpha)
        _, _, P1, P2, Q, _, _ = cv2.stereoRectify(
            p.mtx1, p.dist1, p.mtx2, p.dist2, size, p.R, p.T,
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=alpha,
        )
        np.testing.assert_allclose(np.asarray(res.P1), P1, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.Q), Q, atol=5e-3)

    def test_rectify_maps_parity(self, x64):
        p = npz.StereoParams.load(STEREO_NPZ)
        size = (960, 540)
        res = stereo.stereo_rectify(p.mtx1, p.dist1, p.mtx2, p.dist2, size, p.R, p.T)
        mx, my = stereo.rectify_maps(p.mtx1, p.dist1, np.asarray(res.R1), np.asarray(res.P1), size)
        R1, _, P1, _, _, _, _ = cv2.stereoRectify(
            p.mtx1, p.dist1, p.mtx2, p.dist2, size, p.R, p.T, flags=cv2.CALIB_ZERO_DISPARITY
        )
        mxc, myc = cv2.initUndistortRectifyMap(p.mtx1, p.dist1, R1, P1, size, cv2.CV_32FC1)
        assert np.abs(np.asarray(mx) - mxc).max() < 1e-3
        assert np.abs(np.asarray(my) - myc).max() < 1e-3

    def test_stereo_calibrate_parity(self, x64):
        rng = np.random.RandomState(1)
        objs, imL, K1, d1, poses = _chessboard_data(V=6, seed=1)
        K2 = np.array([[605.0, 0, 318], [0, 607.0, 244], [0, 0, 1]])
        d2 = np.array([0.07, -0.08, 0.0, 0.001, 0.02])
        R_true, _ = cv2.Rodrigues(np.array([0.01, -0.06, 0.004]))
        T_true = np.array([-0.0315, 0.0004, 0.0012])
        imR = []
        for (rv, tv), o in zip(poses, objs):
            Rv, _ = cv2.Rodrigues(rv)
            rv2, _ = cv2.Rodrigues(R_true @ Rv)
            tv2 = R_true @ tv + T_true
            pr, _ = cv2.projectPoints(o.reshape(-1, 1, 3), rv2, tv2, K2, d2)
            imR.append(pr.reshape(-1, 2) + rng.randn(len(o), 2) * 0.05)
        imR = np.array(imR)
        res = stereo.stereo_calibrate(jnp.asarray(objs), jnp.asarray(imL), jnp.asarray(imR), K1, d1, K2, d2)
        ret, _, _, _, _, Rc, Tc, _, _ = cv2.stereoCalibrate(
            objs.astype(np.float32), imL.astype(np.float32), imR.astype(np.float32),
            K1, d1, K2, d2, (640, 480), flags=cv2.CALIB_FIX_INTRINSIC,
        )
        assert float(res.rms) == pytest.approx(ret, abs=1e-3)
        np.testing.assert_allclose(np.asarray(res.R), Rc, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.T), Tc.ravel(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.T), T_true, atol=1e-3)


class TestChessboard:
    def _render(self):
        nx, ny, sq = 9, 6, 40
        board = np.zeros(((ny + 1) * sq + 200, (nx + 1) * sq + 200), np.uint8) + 200
        for i in range(ny + 1):
            for j in range(nx + 1):
                if (i + j) % 2 == 0:
                    board[100 + i * sq:100 + (i + 1) * sq, 100 + j * sq:100 + (j + 1) * sq] = 30
        M = cv2.getRotationMatrix2D((300, 250), 7.0, 0.95)
        M[:, 2] += [4.3, -2.7]
        img = cv2.warpAffine(board, M, (640, 480), flags=cv2.INTER_LINEAR, borderValue=128)
        return cv2.GaussianBlur(img, (5, 5), 1.0)

    def test_corner_subpix_parity(self):
        img = self._render()
        found, c0 = cv2.findChessboardCorners(img, (9, 6))
        assert found
        ref = cv2.cornerSubPix(
            img, c0.copy(), (11, 11), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3),
        ).reshape(-1, 2)
        ours = np.asarray(chessboard.corner_subpix(
            jnp.asarray(img, jnp.float32), jnp.asarray(c0.reshape(-1, 2)), win=11))
        assert np.abs(ours - ref).max() < 5e-3

    def test_find_chessboard_full(self):
        img = self._render()
        ok, corners = chessboard.find_chessboard_corners(img, (9, 6))
        assert ok and corners.shape == (54, 2)

    def test_object_points(self):
        obj = chessboard.chessboard_object_points((9, 6), 0.025)
        assert obj.shape == (54, 3)
        assert obj[:, 2].max() == 0.0
        assert obj[1, 0] == pytest.approx(0.025)
