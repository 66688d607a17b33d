"""TPU-native depth post-processing filters (reference: check90.py:99-103,
colorReco.py:94-102 — librealsense decimation/spatial/temporal/hole-filling)."""
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.depth import filters as F


def _plane_with_noise(rng, h=48, w=64, z=1.5, sigma=0.01):
    return (z + sigma * rng.randn(h, w)).astype(np.float32)


class TestDecimation:
    def test_shape_and_median(self):
        rng = np.random.RandomState(0)
        d = _plane_with_noise(rng)
        out = np.asarray(F.decimation_filter(jnp.asarray(d), magnitude=2))
        assert out.shape == (24, 32)
        # each output is the median of a 2x2 block -> inside the block range
        blk = d.reshape(24, 2, 32, 2).transpose(0, 2, 1, 3).reshape(24, 32, 4)
        assert (out >= blk.min(-1) - 1e-6).all()
        assert (out <= blk.max(-1) + 1e-6).all()

    def test_ignores_invalid(self):
        d = np.zeros((4, 4), np.float32)
        d[0, 0] = 2.0  # lone valid pixel in its 2x2 block
        out = np.asarray(F.decimation_filter(jnp.asarray(d), magnitude=2))
        assert out[0, 0] == 2.0 and out[1, 1] == 0.0

    def test_magnitude_one_is_identity(self):
        d = np.arange(16, dtype=np.float32).reshape(4, 4)
        assert (np.asarray(F.decimation_filter(jnp.asarray(d), 1)) == d).all()


class TestSpatial:
    def test_smooths_noise_preserves_edge(self):
        rng = np.random.RandomState(1)
        d = _plane_with_noise(rng, sigma=0.005)
        d[:, 32:] += 1.0  # sharp 1 m depth discontinuity >> delta
        out = np.asarray(F.spatial_filter(jnp.asarray(d), delta=0.02))
        # noise drops on each side
        assert out[:, 4:28].std() < d[:, 4:28].std() * 0.8
        # edge magnitude survives (no bleed across the discontinuity)
        assert abs((out[:, 40:].mean() - out[:, :24].mean()) - 1.0) < 0.01

    def test_keeps_invalid_invalid(self):
        d = np.full((8, 8), 1.0, np.float32)
        d[3, 3] = 0.0
        out = np.asarray(F.spatial_filter(jnp.asarray(d)))
        assert out[3, 3] == 0.0


class TestTemporal:
    def test_ema_converges_and_persistence_fills(self):
        state = F.make_temporal_state((4, 4))
        base = np.full((4, 4), 2.0, np.float32)
        out = None
        for k in range(6):
            frame = base + (0.005 if k % 2 else -0.005)
            out, state = F.temporal_filter(jnp.asarray(frame), state)
        assert abs(float(np.asarray(out).mean()) - 2.0) < 0.004  # averaged
        # dropout frame: persistence fills from history
        hole = base.copy()
        hole[1, 1] = 0.0
        out, state = F.temporal_filter(jnp.asarray(hole), state)
        assert abs(float(np.asarray(out)[1, 1]) - 2.0) < 0.01

    def test_delta_gate_passes_big_changes_through(self):
        state = F.make_temporal_state((2, 2))
        _, state = F.temporal_filter(jnp.full((2, 2), 1.0), state)
        out, _ = F.temporal_filter(jnp.full((2, 2), 1.5), state)  # 0.5 >> delta
        assert np.allclose(np.asarray(out), 1.5)


class TestHoleFilling:
    def test_fill_left(self):
        d = np.zeros((2, 6), np.float32)
        d[0, 1] = 1.0
        d[0, 4] = 2.0
        out = np.asarray(F.hole_filling_filter(jnp.asarray(d), mode="left"))
        assert (out[0] == [0.0, 1.0, 1.0, 1.0, 2.0, 2.0]).all()
        assert (out[1] == 0.0).all()  # nothing valid to propagate

    def test_fill_nearest(self):
        d = np.full((5, 5), 3.0, np.float32)
        d[2, 2] = 0.0
        out = np.asarray(F.hole_filling_filter(jnp.asarray(d), mode="nearest"))
        assert out[2, 2] == 3.0


def test_filter_bank_chain_and_streaming_hook():
    rng = np.random.RandomState(2)
    bank = F.DepthFilterBank(decimation=2, hole_fill="left")
    d = _plane_with_noise(rng, h=32, w=32)
    d[5, 5] = 0.0
    out = np.asarray(bank(jnp.asarray(d)))
    assert out.shape == (16, 16)
    assert (out > 0).all()  # holes filled
    out2 = bank(jnp.asarray(d))  # second frame exercises temporal state
    assert np.asarray(out2).shape == (16, 16)
    bank.reset()
    assert bank._state is None
