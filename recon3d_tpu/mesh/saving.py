"""Mesh persistence with density-based vertex coloring.

Replaces the reference's MeshSaving class (mesh_saving.py:5-21): writes the
raw mesh PLY, then a second PLY with vertices colored by normalized Poisson
density through the plasma colormap (mesh_saving.py:16-19 uses
matplotlib.cm.plasma; an embedded polynomial approximation is used when
matplotlib is absent).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from recon3d_tpu.utils import io
from recon3d_tpu.utils.types import TriangleMesh


def plasma_colormap(x: np.ndarray) -> np.ndarray:
    """x in [0,1] -> RGB in [0,1] (matplotlib 'plasma', with fallback)."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    try:
        import matplotlib.cm as cm

        return np.asarray(cm.plasma(x))[..., :3]
    except ImportError:  # compact polynomial fit of plasma
        r = 0.05 + 2.2 * x - 1.3 * x ** 2
        g = -0.05 + 0.2 * x + 0.8 * x ** 2
        b = 0.53 + 1.3 * x - 2.0 * x ** 2 + 0.7 * x ** 3
        return np.clip(np.stack([r, g, b], -1), 0, 1)


def color_by_density(mesh: TriangleMesh, densities) -> TriangleMesh:
    """Normalized density -> plasma vertex colors (mesh_saving.py:16-19)."""
    d = np.asarray(densities, np.float64)
    lo, hi = d.min(), d.max()
    norm = (d - lo) / max(hi - lo, 1e-12)
    cols = plasma_colormap(norm).astype(np.float32)
    return dataclasses.replace(mesh, vertex_colors=jnp.asarray(cols))


def save_mesh(
    mesh: TriangleMesh,
    densities=None,
    filename: str = "reconstructed_mesh.ply",
    colored_filename: Optional[str] = None,
) -> Tuple[str, Optional[str]]:
    """Write mesh PLY (+ density-colored variant), mirroring
    MeshSaving.save_mesh (mesh_saving.py:6-21). Returns written paths."""
    io.write_triangle_mesh(filename, mesh)
    colored = None
    if densities is not None:
        colored = colored_filename or filename.replace(".ply", "_colored.ply")
        io.write_triangle_mesh(colored, color_by_density(mesh, densities))
    return filename, colored
