"""CalibrationSession (the headless core behind the Tk GUI, calib3_2.py
twin) driven without a display: capture pairs from synthetic cameras,
save/load the folder batch mode, run the full calibration workflow."""
import numpy as np
import pytest

from recon3d_tpu.calib.gui import CalibrationSession


class _StillCamera:
    """Camera stub returning one fixed frame (chessboard render)."""

    def __init__(self, img):
        self.img = img

    def grab(self):
        return self.img


def _chessboard_image(nx=9, ny=6, sq=24, jitter=0):
    H, W = (ny + 1) * sq + 40, (nx + 1) * sq + 40
    img = np.full((H, W), 255, np.uint8)
    for j in range(ny + 1):
        for i in range(nx + 1):
            if (i + j) % 2 == 0:
                y0, x0 = 20 + j * sq + jitter, 20 + i * sq + jitter
                img[y0:y0 + sq, x0:x0 + sq] = 0
    return np.repeat(img[..., None], 3, axis=-1)


class TestCalibrationSession:
    def test_capture_and_save_toggle(self, tmp_path):
        img = _chessboard_image()
        s = CalibrationSession(_StillCamera(img), _StillCamera(img),
                               output_dir=str(tmp_path), save_images=True)
        assert s.capture_pair()
        assert s.capture_pair()
        assert len(s.pairs) == 2
        assert (tmp_path / "left_000.png").exists()
        assert (tmp_path / "right_001.png").exists()
        assert "2 pairs" in s.status

    def test_load_folder_batch_mode(self, tmp_path):
        img = _chessboard_image()
        s = CalibrationSession(_StillCamera(img), _StillCamera(img),
                               output_dir=str(tmp_path), save_images=True)
        s.capture_pair()
        s2 = CalibrationSession(_StillCamera(img), _StillCamera(img))
        n = s2.load_folder(str(tmp_path))
        assert n == 1 and len(s2.pairs) == 1
        np.testing.assert_array_equal(np.asarray(s2.pairs[0][0]),
                                      np.asarray(s.pairs[0][0]))

    def test_too_few_pairs_is_graceful(self):
        img = _chessboard_image()
        s = CalibrationSession(_StillCamera(img), _StillCamera(img))
        s.capture_pair()
        params, info = s.run_calibration()
        assert params is None and "need" in s.status

    def test_none_frame_reported(self):
        class _Dead:
            def grab(self):
                return None

        s = CalibrationSession(_Dead(), _Dead())
        assert not s.capture_pair()
        assert s.status == "no frame"
