"""External-oracle parity for the Fast Global Smoother WLS stage.

The reference's WLS stage is cv2.ximgproc.createDisparityWLSFilter
(lambda=8000, sigma=1.5; depth4.py:173-177), whose core is the Fast Global
Smoother of Min et al., "Fast Global Image Smoothing Based on Weighted
Least Squares" (TIP 2014): T alternating horizontal/vertical 1D
weighted-least-squares solves with edge weights w(p,q)=exp(-|I_p-I_q|/sigma)
and the per-sweep schedule lambda_t = 1.5*lam*4^(T-t-1)/(4^T-1).

cv2 in this image ships WITHOUT the ximgproc contrib module, so the oracle
here is an independent float64 implementation of that published algorithm
whose 1D subsystems are solved by scipy.linalg.solve_banded (LAPACK dgtsv
family) — an external solver sharing no code with the lax.scan Thomas
recurrence under test. This pins down the algorithm spec (weight
construction, lambda schedule, confidence handling), not just
self-consistency between our own twins.
"""
import jax.numpy as jnp
import numpy as np
from scipy.linalg import solve_banded

from recon3d_tpu.depth import wls


# ---------------------------------------------------------------- oracle

def _edge_weights_np(guide: np.ndarray, axis: int, sigma: float) -> np.ndarray:
    """w[i] = weight of the edge between pixel i-1 and i along axis; w[0]=0."""
    g = guide.astype(np.float64)
    d = np.abs(np.diff(g, axis=axis))
    if g.ndim == 3:
        d = d.sum(axis=-1)
    # same interior-edge floor as the implementation under test (see
    # wls.WEIGHT_FLOOR): keeps the system nonsingular on full-contrast
    # imagery with zero-confidence holes
    w = np.maximum(np.exp(-d / sigma), wls.WEIGHT_FLOOR)
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0)
    return np.pad(w, pad)


def _solve_rows_banded(u, conf, w, lam_t):
    """Per-row tridiagonal WLS solve via LAPACK solve_banded.

    System: (conf_i + lam*(w_i + w_{i+1})) u_i - lam*w_i u_{i-1}
            - lam*w_{i+1} u_{i+1} = conf_i * d_i,  w_0 = w_N = 0.
    """
    H, W = u.shape
    out = np.empty_like(u)
    for r in range(H):
        wl = lam_t * w[r]                                   # (W,), wl[0]=0
        wr = np.concatenate([wl[1:], [0.0]])                # right-edge weight
        # solve_banded layout: ab[0,j]=A[j-1,j] (super), ab[1,j]=A[j,j],
        # ab[2,j]=A[j+1,j] (sub). The system matrix is symmetric with
        # A[i,i+1]=A[i+1,i]=-wr[i]=-wl[i+1].
        ab = np.zeros((3, W))
        ab[0, 1:] = -wl[1:]
        ab[2, :-1] = -wr[:-1]
        ab[1] = conf[r] + wl + wr
        out[r] = solve_banded((1, 1), ab, conf[r] * u[r])
    return out


def fgs_oracle(data, guide, conf, lam=8000.0, sigma=1.5, iterations=3):
    """Float64 sequential FGS exactly per the published algorithm."""
    u = data.astype(np.float64)
    conf = conf.astype(np.float64)
    wx = _edge_weights_np(guide, 1, sigma)
    wy = _edge_weights_np(guide, 0, sigma)
    denom = 4.0 ** iterations - 1.0
    for t in range(iterations):
        lam_t = 1.5 * lam * (4.0 ** (iterations - t - 1)) / denom
        u = _solve_rows_banded(u, conf, wx, lam_t)
        u = _solve_rows_banded(u.T, conf.T, wy.T, lam_t).T
    return u


def _fixture(H=48, W=64, seed=0, hole=True):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    guide = 1.8 * xx + 1.1 * yy + rng.rand(H, W).astype(np.float32) * 12
    data = (30.0 + 20.0 * np.sin(xx / 7.0) + rng.rand(H, W) * 8).astype(
        np.float32)
    conf = np.ones((H, W), np.float32)
    if hole:
        conf[(rng.rand(H, W) < 0.25)] = 0.0
        conf[20:30, 25:40] = 0.0
    return data, guide, conf


# ----------------------------------------------------------------- tests

class TestFGSOracleParity:
    def test_smoother_matches_lapack_oracle(self):
        """Our float32 scan solver vs the float64 LAPACK solve of the same
        published system: agreement to ~1e-2 disparity units (float32
        forward/backward recurrence roundoff over W=64 pixels)."""
        data, guide, conf = _fixture()
        ref = fgs_oracle(data, guide, conf, lam=8000.0, sigma=1.5,
                         iterations=3)
        out = np.asarray(wls.fast_global_smoother(
            jnp.asarray(data), jnp.asarray(guide), jnp.asarray(conf),
            lam=8000.0, sigma_color=1.5, iterations=3))
        err = np.abs(out - ref)
        assert err.max() < 2e-2, f"max |ours-oracle| = {err.max():.4g}"
        assert np.sqrt((err ** 2).mean()) < 5e-3

    def test_full_confidence_plain_smoothing(self):
        """conf=1 everywhere is the plain FGS image filter configuration."""
        data, guide, _ = _fixture(seed=2, hole=False)
        conf = np.ones_like(data)
        ref = fgs_oracle(data, guide, conf, lam=500.0, sigma=3.0,
                         iterations=2)
        out = np.asarray(wls.fast_global_smoother(
            jnp.asarray(data), jnp.asarray(guide), jnp.asarray(conf),
            lam=500.0, sigma_color=3.0, iterations=2))
        np.testing.assert_allclose(out, ref, atol=2e-2)

    def test_disparity_wls_configuration_on_stereo_fixture(self):
        """The DisparityWLSFilter-shaped use: refine a real SGM disparity
        with validity-mask confidence (the reference's lambda=8000
        sigma=1.5 production config, depth4.py:175-176) and check the full
        wls_refine path against the oracle given the same confidence."""
        from recon3d_tpu.camera.fake import FakeStereoCamera
        from recon3d_tpu.config import StereoMatcherConfig, WLSConfig
        from recon3d_tpu.depth.matcher import compute_disparity

        H, W = 48, 128
        cam = FakeStereoCamera(width=W, height=H, focal=80.0, baseline=0.05)
        gl, gr, _, _ = cam.render(1)
        mcfg = StereoMatcherConfig(num_disparities=16, block_size=3,
                                   speckle_window_size=0)
        disp, valid = compute_disparity(jnp.asarray(gl, jnp.float32),
                                        jnp.asarray(gr, jnp.float32),
                                        mcfg, WLSConfig(), False)
        disp, valid = np.asarray(disp), np.asarray(valid)

        out = np.asarray(wls.wls_refine(
            jnp.asarray(disp), jnp.asarray(valid), jnp.asarray(gl, jnp.float32),
            lam=8000.0, sigma_color=1.5, iterations=3))
        ref = fgs_oracle(np.where(valid, disp, 0.0).astype(np.float32),
                         gl.astype(np.float32), valid.astype(np.float32),
                         lam=8000.0, sigma=1.5, iterations=3)
        err = np.abs(out - ref)
        # float32 forward/backward recurrence vs float64 LAPACK on a system
        # with 1e-6..1 weight ratios: worst pixels ~0.09 px, RMSE ~1e-3 px —
        # both far under the 0.5 px disparity north star
        assert err.max() < 0.15, f"max |ours-oracle| = {err.max():.4g}"
        assert np.sqrt((err ** 2).mean()) < 1e-2
        # and the refined field is dense where the raw disparity had holes
        assert (out > 0).mean() > 0.98

    def test_pallas_twin_matches_oracle(self):
        """Close the chain: the production Pallas solver against the same
        external oracle (not just against the XLA twin)."""
        from recon3d_tpu.depth import wls_pallas

        data, guide, conf = _fixture(seed=4)
        ref = fgs_oracle(data, guide, conf, lam=8000.0, sigma=1.5,
                         iterations=3)
        out = np.asarray(wls_pallas.fast_global_smoother_pallas(
            jnp.asarray(data), jnp.asarray(guide), jnp.asarray(conf),
            lam=8000.0, sigma_color=1.5, iterations=3, interpret=True))
        err = np.abs(out - ref)
        assert err.max() < 2e-2, f"max |ours-oracle| = {err.max():.4g}"
