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
