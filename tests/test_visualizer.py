"""Live 3D visualization: TPU point-splat renderer + interactive window
lifecycle + the per-frame re-mesh scan loop (visualizer.py:14-38, 71-127).

Headless here: offscreen=True renders to the frame buffer; the keyboard
trackball is driven directly through handle_key.
"""
import os

import jax.numpy as jnp
import numpy as np

from recon3d_tpu.pipeline.render import orbit_view, render_points
from recon3d_tpu.pipeline.visualizer import LiveVisualizer3D
from recon3d_tpu.utils.types import PointCloud


def _cloud(n=500, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32) * 0.1 + [0, 0, 1.0]
    cols = rng.rand(n, 3).astype(np.float32)
    return PointCloud.from_numpy(pts, colors=cols)


class TestRenderPoints:
    def test_projects_known_point_to_center(self):
        pts = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        cols = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        valid = jnp.ones((1,), bool)
        view = jnp.eye(4)
        img = np.asarray(render_points(pts, cols, valid, view, 100.0,
                                       height=64, width=64))
        # the splat lands at the image center and is pure red
        patch = img[30:34, 30:34]
        assert patch[..., 0].max() > 0.99
        lit = img[..., 0] > 0.5
        assert 1 <= lit.sum() <= 9
        ys, xs = np.where(lit)
        assert abs(ys.mean() - 31.5) < 2 and abs(xs.mean() - 31.5) < 2

    def test_zbuffer_keeps_nearest(self):
        # two points on the same ray: the near one must win the pixel
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]], jnp.float32)
        cols = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
        valid = jnp.ones((2,), bool)
        img = np.asarray(render_points(pts, cols, valid, jnp.eye(4), 100.0,
                                       height=64, width=64))
        lit = img[..., 0] > 0.5
        assert lit.any()
        assert not (img[..., 1] > 0.5).any(), "far point overwrote near"

    def test_masked_points_do_not_render(self):
        pts = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        cols = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
        img = np.asarray(render_points(pts, cols, jnp.zeros((1,), bool),
                                       jnp.eye(4), 100.0,
                                       height=32, width=32))
        assert (np.abs(img - img[0, 0]) < 1e-6).all(), "masked point rendered"

    def test_orbit_view_looks_at_target(self):
        tgt = np.array([0.2, -0.1, 1.5])
        for az, el in [(0, 0), (45, -30), (180, 20)]:
            T = orbit_view(tgt, 2.0, az, el)
            cam_t = T[:3, :3] @ tgt + T[:3, 3]
            # target projects to the optical axis at the orbit distance
            np.testing.assert_allclose(cam_t[:2], 0.0, atol=1e-6)
            np.testing.assert_allclose(cam_t[2], 2.0, atol=1e-6)


class TestLiveVisualizer:
    def test_lifecycle_and_capture(self, tmp_path):
        vis = LiveVisualizer3D(width=160, height=120, offscreen=True)
        vis.initialize()
        alive = vis.update(_cloud())
        assert alive
        assert vis.frame is not None and vis.frame.shape == (120, 160, 3)
        assert vis.frame.max() > 30, "nothing rendered"
        p = vis.capture(str(tmp_path / "v.png"))
        assert os.path.exists(p)
        vis.destroy()
        assert not vis._open

    def test_keyboard_trackball(self):
        vis = LiveVisualizer3D(width=64, height=64, offscreen=True)
        vis.update(_cloud())
        f0 = vis.frame.copy()
        az0, d0 = vis.azim, vis.distance
        vis.handle_key(ord("d"))
        vis.handle_key(ord("e"))
        assert vis.azim == az0 + 10.0 and vis.distance < d0
        vis.update(_cloud())
        assert (vis.frame != f0).any(), "view change did not re-render"
        vis.handle_key(27)  # ESC closes
        assert not vis._open

    def test_live_remesh_loop(self, tmp_path):
        """The full visualizer.py:71-127 loop: scan -> re-mesh -> update."""
        from recon3d_tpu.camera.fake import SyntheticRGBDCamera
        from recon3d_tpu.config import ScannerConfig
        from recon3d_tpu.pipeline.scanner import StreamingScanner
        from recon3d_tpu.pipeline.visualizer import live_remesh_loop
        from recon3d_tpu.utils.types import CameraIntrinsics

        cam = SyntheticRGBDCamera(width=160, height=120, fx=130.0, fy=130.0,
                                  n_frames=3, step=0.005)
        intr = CameraIntrinsics(fx=jnp.float32(130.0), fy=jnp.float32(130.0),
                                cx=jnp.float32(79.5), cy=jnp.float32(59.5))
        import dataclasses as dc

        cfg = ScannerConfig(output_dir=str(tmp_path), save_frames=False)
        cfg = dc.replace(cfg, processing=dc.replace(cfg.processing,
                                                    capacity=20000))
        sc = StreamingScanner(cam, intr, cfg)
        vis = LiveVisualizer3D(width=160, height=120, offscreen=True)
        meshes = live_remesh_loop(sc, vis, frames=3, remesh_every=1,
                                  poisson_depth=4)
        assert len(meshes) >= 1
        v, t, _, _ = meshes[-1].to_numpy()
        assert len(t) > 50
        assert vis.frame is not None and vis.frame.max() > 0
