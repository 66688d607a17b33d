import numpy as np
import pytest

from recon3d_tpu.calib import npz

STEREO = "/root/reference/Calib_depth/jetson_stereo_8MP_stereo.npz"
RAW = "/root/reference/Calib_depth/goodFiles/jetson_stereo_8MP.npz"


def test_load_full_stereo_schema():
    p = npz.StereoParams.load(STEREO)
    p.validate_for_depth()
    assert p.mtx1.shape == (3, 3)
    assert p.Q.shape == (4, 4)
    # shipped report: baseline 31.486mm, rectified focal 525.607
    assert p.baseline == pytest.approx(31.486, abs=0.01)
    assert p.Q[2, 3] == pytest.approx(525.607, abs=0.01)


def test_load_raw_schema():
    p = npz.StereoParams.load(RAW)
    assert p.mtx1.shape == (3, 3)
    assert p.R1 is None
    with pytest.raises(KeyError):
        p.validate_for_depth()


def test_save_load_roundtrip(tmp_path):
    p = npz.StereoParams.load(STEREO)
    out = str(tmp_path / "s.npz")
    p.save(out)
    q = npz.StereoParams.load(out)
    np.testing.assert_array_equal(q.Q, p.Q)
    np.testing.assert_array_equal(q.dist1, p.dist1)


def test_inspect_and_describe():
    keys = npz.inspect(STEREO)
    assert set(npz.STEREO_FULL_KEYS) <= set(keys)
    text = npz.describe(STEREO)
    assert "Baseline" in text and "Q" in text
