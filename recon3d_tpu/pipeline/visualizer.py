"""Geometry visualization (headless-first).

Replaces the reference's Open3D/OpenGL GeometryVisualizer (visualizer.py:5-127):
window management becomes figure management, update_geometry re-renders, and
the sparse-region highlighting (density threshold -> red, visualizer.py:41-57)
is reused from mesh.ops. Renders point clouds and meshes to PNG via
matplotlib (no GPU/GL needed in this environment); an interactive window
appears automatically when a display backend exists.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from recon3d_tpu.mesh.ops import highlight_sparse_regions
from recon3d_tpu.utils.types import PointCloud, TriangleMesh


class GeometryVisualizer:
    """initialize / update / capture / destroy lifecycle (visualizer.py:14-38)."""

    def __init__(self, width: int = 960, height: int = 720,
                 point_size: float = 0.5, elev: float = -70.0, azim: float = -90.0):
        self.width = width
        self.height = height
        self.point_size = point_size
        self.elev = elev
        self.azim = azim
        self._fig = None
        self._ax = None

    def initialize(self) -> None:
        import matplotlib

        if not os.environ.get("DISPLAY"):
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self._fig = plt.figure(figsize=(self.width / 100, self.height / 100), dpi=100)
        self._ax = self._fig.add_subplot(111, projection="3d")

    def _prep(self):
        if self._fig is None:
            self.initialize()
        self._ax.clear()
        self._ax.set_axis_off()
        self._ax.view_init(elev=self.elev, azim=self.azim)

    def update(self, geometry) -> None:
        """Re-render a PointCloud or TriangleMesh (update_geometry path)."""
        self._prep()
        if isinstance(geometry, PointCloud):
            pts, cols, _ = geometry.to_numpy()
            if len(pts) > 200_000:  # decimate for plotting speed
                step = len(pts) // 200_000 + 1
                pts = pts[::step]
                cols = None if cols is None else cols[::step]
            self._ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2],
                             s=self.point_size,
                             c=None if cols is None else np.clip(cols, 0, 1))
        elif isinstance(geometry, TriangleMesh):
            verts, tris, cols, _ = geometry.to_numpy()
            from mpl_toolkits.mplot3d.art3d import Poly3DCollection

            polys = verts[tris]
            face_cols = None
            if cols is not None:
                face_cols = np.clip(cols[tris].mean(axis=1), 0, 1)
            coll = Poly3DCollection(polys, linewidths=0.0)
            if face_cols is not None:
                coll.set_facecolor(face_cols)
            self._ax.add_collection3d(coll)
            lo, hi = verts.min(0), verts.max(0)
            self._ax.set_xlim(lo[0], hi[0])
            self._ax.set_ylim(lo[1], hi[1])
            self._ax.set_zlim(lo[2], hi[2])
        else:
            raise TypeError(f"cannot visualize {type(geometry)}")

    def highlight_sparse(self, mesh: TriangleMesh, densities,
                         quantile: float = 0.01) -> None:
        """Sparse-region highlighting (visualizer.py:41-57): low-density
        vertices painted red, then rendered."""
        self.update(highlight_sparse_regions(mesh, densities, quantile))

    def capture(self, path: str) -> str:
        """Save the current view to PNG (the headless 'window')."""
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fig.savefig(path, bbox_inches="tight")
        return path

    def destroy(self) -> None:
        if self._fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self._fig)
            self._fig = None
            self._ax = None


class LiveVisualizer3D:
    """Interactive live 3D window (visualizer.py:14-38 parity without GL).

    Frames are rendered on-device (pipeline.render point splatting +
    z-buffer) and shown through a cv2 window with trackball-style keyboard
    orbit: a/d azimuth, w/s elevation, q/e zoom, r reset, ESC close. With
    no display (or offscreen=True) the window is skipped and `frame` holds
    the latest rendered image — same initialize/update/capture/destroy
    lifecycle either way.
    """

    WINDOW = "recon3d_tpu 3D"

    def __init__(self, width: int = 960, height: int = 720,
                 focal: Optional[float] = None, offscreen: Optional[bool] = None,
                 azim: float = 0.0, elev: float = -20.0,
                 distance: Optional[float] = None):
        self.width = width
        self.height = height
        self.focal = focal if focal is not None else 0.9 * width
        self.offscreen = (not os.environ.get("DISPLAY")
                          if offscreen is None else offscreen)
        self._azim0, self._elev0, self._dist0 = azim, elev, distance
        self.azim, self.elev, self.distance = azim, elev, distance
        self.target: Optional[np.ndarray] = None
        self.frame: Optional[np.ndarray] = None
        self._open = False

    def initialize(self) -> None:
        if not self.offscreen:  # pragma: no cover - needs a display
            import cv2

            try:
                cv2.namedWindow(self.WINDOW, cv2.WINDOW_AUTOSIZE)
            except Exception:
                self.offscreen = True
        self._open = True

    def _fit(self, pts: np.ndarray) -> None:
        if self.target is None:
            self.target = pts.mean(0)
        if self.distance is None:
            extent = float(np.linalg.norm(pts.max(0) - pts.min(0)) + 1e-6)
            self.distance = 1.6 * extent

    def update(self, geometry) -> bool:
        """Render + present one frame. Returns False once the window was
        closed (ESC), mirroring Visualizer.poll_events()."""
        import jax.numpy as jnp

        from recon3d_tpu.pipeline.render import orbit_view, render_points

        if not self._open:
            self.initialize()
        if isinstance(geometry, PointCloud):
            pts_j, valid = geometry.points, geometry.valid
            cols = geometry.colors
        elif isinstance(geometry, TriangleMesh):
            pts_j, valid = geometry.vertices, geometry.vertex_valid
            cols = geometry.vertex_colors
        else:
            raise TypeError(f"cannot visualize {type(geometry)}")
        # auto-fit materializes the cloud host-side ONLY while the camera
        # is unset (first frame / after 'r' reset): a per-frame D2H copy of
        # a 1M-point cloud costs more than the on-device render it feeds
        if self.target is None or self.distance is None:
            pts = np.asarray(pts_j)[np.asarray(valid)]
            if len(pts) == 0:
                return self._open
            self._fit(pts)
        if cols is None:
            cols = jnp.full((pts_j.shape[0], 3), 0.75, jnp.float32)
        view = jnp.asarray(orbit_view(self.target, self.distance,
                                      self.azim, self.elev))
        img = render_points(pts_j, cols, valid, view, self.focal,
                            height=self.height, width=self.width)
        self.frame = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
        if not self.offscreen:  # pragma: no cover - needs a display
            import cv2

            cv2.imshow(self.WINDOW, self.frame[..., ::-1])  # RGB -> BGR
            self.handle_key(cv2.waitKey(1) & 0xFF)
        return self._open

    def handle_key(self, key: int) -> None:
        """Keyboard trackball (also drivable headless, for tests)."""
        if key in (27,):  # ESC
            self.destroy()
        elif key == ord("a"):
            self.azim -= 10.0
        elif key == ord("d"):
            self.azim += 10.0
        elif key == ord("w"):
            self.elev = max(self.elev - 10.0, -89.0)
        elif key == ord("s"):
            self.elev = min(self.elev + 10.0, 89.0)
        elif key == ord("q") and self.distance:
            self.distance *= 1.2
        elif key == ord("e") and self.distance:
            self.distance /= 1.2
        elif key == ord("r"):
            self.azim, self.elev = self._azim0, self._elev0
            self.distance, self.target = self._dist0, None

    def capture(self, path: str) -> str:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        from PIL import Image

        Image.fromarray(self.frame).save(path)
        return path

    def destroy(self) -> None:
        if self._open and not self.offscreen:  # pragma: no cover
            import cv2

            try:
                cv2.destroyWindow(self.WINDOW)
            except Exception:
                pass
        self._open = False


def live_remesh_loop(scanner, visualizer, frames: int,
                     remesh_every: int = 1, poisson_depth: int = 5):
    """The reference's full live loop (visualizer.py:71-127): scan, and on
    every `remesh_every` new frames re-estimate normals, re-run Poisson on
    the accumulated cloud and push the MESH to the live window. Returns the
    meshes rendered (most-recent last)."""
    import time

    from recon3d_tpu.mesh_reconstruction import MeshReconstruction
    from recon3d_tpu.normal_estimation import NormalEstimation

    normals = NormalEstimation(scanner.config.processing)
    import dataclasses as _dc

    recon = MeshReconstruction(_dc.replace(scanner.config.mesh,
                                           poisson_depth=poisson_depth))
    scanner.start(max_frames=frames)
    meshes = []
    last = 0
    while scanner._thread.is_alive() or scanner.frames > last:
        if scanner.combined is None or scanner.frames < last + remesh_every:
            if not scanner._thread.is_alive():
                break
            time.sleep(0.1)
            continue
        last = scanner.frames
        pc = normals.estimate_normals(scanner.combined)
        mesh, densities = recon.reconstruct_mesh(pc)
        meshes.append(mesh)
        if not visualizer.update(mesh):
            break  # window closed -> stop like the reference loop
    scanner.stop()
    return meshes


def scanning_loop_with_vis(scanner, visualizer: "GeometryVisualizer",
                           frames: int, snapshot_every: int = 10,
                           out_dir: str = "vis"):
    """The reference's live-vis scan loop (visualizer.py:71-127): run the
    scanner, periodically re-render the accumulated cloud to PNG frames."""
    scanner.start(max_frames=frames)
    import time

    shots = []
    last = 0
    while scanner._thread.is_alive():
        time.sleep(0.2)
        if scanner.combined is not None and scanner.frames >= last + snapshot_every:
            last = scanner.frames
            visualizer.update(scanner.combined)
            shots.append(visualizer.capture(
                os.path.join(out_dir, f"scan_{scanner.frames:04d}.png")))
    scanner.stop()
    return shots
