"""Pallas projective image sampler vs the XLA gather it replaces."""
import numpy as np
import jax.numpy as jnp

from recon3d_tpu.ops.project_sample import sample_images_at


def _production_style_fields(R, H, W, fx=200.0):
    """vc/uc from a real perspective projection of an R^3 volume (the
    smoothness the kernel's windowing relies on), clipped like
    _frame_contrib does."""
    idx = np.arange(R, dtype=np.float32)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    vs = 1.0 / R
    x = gx * vs - 0.5
    y = gy * vs - 0.5
    z = gz * vs + 1.0
    u = fx * x / z + W / 2
    v = fx * y / z + H / 2
    uc = np.clip(np.round(u).astype(np.int32), 0, W - 1)
    vc = np.clip(np.round(v).astype(np.int32), 0, H - 1)
    return vc, uc


def test_matches_xla_gather_on_projection_fields():
    rng = np.random.RandomState(3)
    H, W, R = 480, 640, 32
    img = rng.rand(4, H, W).astype(np.float32)
    vc, uc = _production_style_fields(R, H, W)
    out = np.asarray(sample_images_at(
        jnp.asarray(vc), jnp.asarray(uc), jnp.asarray(img),
        interpret=True))
    ref = img[:, vc, uc]
    np.testing.assert_array_equal(out, ref)


def test_out_of_window_reads_zero_and_in_window_exact():
    rng = np.random.RandomState(4)
    H, W, R = 480, 640, 32
    img = 0.5 + rng.rand(1, H, W).astype(np.float32)  # strictly nonzero
    # adversarial: indices scattered over the whole image, far beyond
    # any (64, 128) window
    vc = rng.randint(0, H, size=(R, R, R)).astype(np.int32)
    uc = rng.randint(0, W, size=(R, R, R)).astype(np.int32)
    out = np.asarray(sample_images_at(
        jnp.asarray(vc), jnp.asarray(uc), jnp.asarray(img),
        interpret=True))
    ref = img[:, vc, uc]
    hit = out != 0.0
    assert 0.0 < hit.mean() < 1.0  # some in-window, some masked
    np.testing.assert_array_equal(out[hit], ref[hit])
