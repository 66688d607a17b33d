import time

import numpy as np

from recon3d_tpu.camera import FakeRGBDCamera, FakeStereoCamera, SyntheticRGBDCamera, ThreadedCamera

REF_OUT = "/root/reference/test/output"


def test_fake_rgbd_replays_golden_frames():
    cam = FakeRGBDCamera(REF_OUT)
    cam.open()
    assert len(cam) == 87
    color, depth = cam.grab()
    assert color.shape == (480, 640, 3) and color.dtype == np.uint8
    assert depth.shape == (480, 640) and depth.dtype == np.float32


def test_fake_rgbd_exhausts_then_loops():
    cam = FakeRGBDCamera(REF_OUT, loop=False)
    cam.open()
    for _ in range(len(cam)):
        assert cam.grab() is not None
    assert cam.grab() is None


def test_synthetic_rgbd_consistency():
    cam = SyntheticRGBDCamera(width=160, height=120, fx=130.0, fy=130.0, n_frames=3)
    cam.open()
    color, depth = cam.grab()
    assert color.shape == (120, 160, 3)
    # sphere at z=1.2, plane at z=1.8: all valid depths in (0.8, 2.0)
    v = depth[depth > 0]
    assert v.min() > 0.8 and v.max() < 2.01
    # depth at the image center must hit the sphere front (~0.9 from origin)
    assert abs(depth[60, 80] - 0.9) < 0.02


def test_synthetic_stereo_disparity_geometry():
    cam = FakeStereoCamera(width=160, height=120, focal=130.0, baseline=0.05)
    gl, gr, disp, depth = cam.render(0)
    assert gl.shape == (120, 160) and gr.shape == gl.shape
    m = depth > 0
    np.testing.assert_allclose(disp[m], 130.0 * 0.05 / depth[m], rtol=1e-5)
    # right image of a fronto-parallel scene is a left-shift of the left image
    assert disp[m].max() > 5.0


def test_threaded_camera_latest_frame():
    cam = SyntheticRGBDCamera(width=64, height=48, fx=52.0, fy=52.0, n_frames=1000)
    tc = ThreadedCamera(cam).start()
    deadline = time.time() + 5.0
    ok, frame = False, None
    while time.time() < deadline and not ok:
        ok, frame = tc.read()
        time.sleep(0.01)
    tc.stop()
    assert ok and frame[0].shape == (48, 64, 3)
    assert tc.frames_grabbed > 0
