"""Pallas FGS-WLS solver vs the XLA lax.scan twin (interpret mode on CPU).

The external-oracle parity for the FGS algorithm itself lives in
test_wls_oracle.py (float64 LAPACK solve_banded implementation of the
published Min et al. 2014 algorithm — cv2 in this image has no ximgproc
module to compare against directly). Here the Pallas kernel must reproduce
the XLA twin to float tolerance since both run the identical Thomas
recurrence, just with different schedulers.
"""
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.depth import wls, wls_pallas


def _fixture(H=40, W=56, seed=0):
    rng = np.random.RandomState(seed)
    # bounded-contrast guide: pixel-noise at full 255 range underflows the
    # exp(-|dI|/sigma) edge weights to ~1e-74, making the tridiagonal
    # system singular on isolated zero-confidence pixels — those garbage
    # outputs are scheduler-dependent in any implementation
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    guide = 2.0 * xx + 1.5 * yy + rng.rand(H, W).astype(np.float32) * 10
    data = (rng.rand(H, W) * 64).astype(np.float32)
    conf = (rng.rand(H, W) > 0.3).astype(np.float32)
    return jnp.asarray(data), jnp.asarray(guide), jnp.asarray(conf)


class TestWLSPallasParity:
    def test_matches_xla_smoother(self):
        data, guide, conf = _fixture()
        ref = np.asarray(wls.fast_global_smoother(data, guide, conf,
                                                  iterations=3))
        out = np.asarray(wls_pallas.fast_global_smoother_pallas(
            data, guide, conf, iterations=3, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)

    def test_wls_refine_twin(self):
        data, guide, conf = _fixture(seed=3)
        valid = np.asarray(conf) > 0.5
        ref = np.asarray(wls.wls_refine(data, jnp.asarray(valid), guide,
                                        iterations=2))
        out = np.asarray(wls_pallas.wls_refine_pallas(
            data, jnp.asarray(valid), guide, iterations=2, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)

    def test_hole_filling_diffuses(self):
        # zero-confidence hole fills in from neighbors, as in the XLA twin
        data, guide, _ = _fixture(seed=5)
        conf = np.ones((40, 56), np.float32)
        conf[15:25, 20:30] = 0.0
        d = np.asarray(data).copy()
        d[15:25, 20:30] = 0.0
        out = np.asarray(wls_pallas.fast_global_smoother_pallas(
            jnp.asarray(d), guide, jnp.asarray(conf), iterations=3,
            interpret=True))
        hole = out[17:23, 22:28]
        assert np.isfinite(hole).all()
        assert (np.abs(hole) > 1e-3).mean() > 0.9, "hole did not in-fill"
