"""Poisson surface reconstruction on a dense grid, solved spectrally.

Replaces o3d create_from_point_cloud_poisson (mesh_reconstruction.py:22,
depth=6; mini1.py uses depth=8). Kazhdan's screened Poisson solves
  min_chi ||grad(chi) - V||^2  =>  lap(chi) = div(V)
over an octree; octrees are pointer machines, so the TPU-native design is
the dense spectral equivalent:

  1. splat oriented normals into a staggered vector field V on a 2^depth
     grid (trilinear weights, scatter-add),
  2. Gaussian-smooth V (the B-spline kernel of the octree formulation),
  3. solve the Poisson equation in Fourier space: chi_hat = div_hat / -|k|^2
     (one 3D FFT each way, exact, MXU/VPU-friendly butterflies),
  4. pick the iso value as the density-weighted mean of chi at the input
     samples (Kazhdan's iso selection),
  5. extract with the marching-tetrahedra machinery; per-vertex densities
     (splat mass) mirror Open3D's density output used for coloring and
     low-density culling (mesh_saving.py:16-19, visualizer.py:41-57).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from recon3d_tpu.fusion.marching import weld_mesh
from recon3d_tpu.fusion.tsdf import TSDFVolume
from recon3d_tpu.utils.types import PointCloud, TriangleMesh


def _splat_trilinear(grid, pts_grid, values, valid):
    """Scatter values (N, C) into grid (R, R, R, C) at fractional coords."""
    R = grid.shape[0]
    g0 = jnp.floor(pts_grid).astype(jnp.int32)
    f = pts_grid - g0
    w_ = valid.astype(jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2])) * w_
                idx = jnp.clip(g0 + jnp.array([dx, dy, dz]), 0, R - 1)
                grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(
                    values * w[:, None] if values.ndim == 2 else values * w)
    return grid


def _gaussian3d(grid, sigma):
    """Separable Gaussian blur of a (R,R,R[,C]) grid via FFT (cheap at R<=256)."""
    R = grid.shape[0]
    k = jnp.fft.fftfreq(R) * R  # integer frequencies
    g1 = jnp.exp(-2.0 * (jnp.pi * sigma * k / R) ** 2)
    G = g1[:, None, None] * g1[None, :, None] * g1[None, None, :]
    def blur(a):
        return jnp.real(jnp.fft.ifftn(jnp.fft.fftn(a) * G))
    if grid.ndim == 4:
        return jnp.stack([blur(grid[..., c]) for c in range(grid.shape[-1])], -1)
    return blur(grid)


@partial(jax.jit, static_argnames=("resolution",))
def _poisson_indicator(points, normals, valid, resolution: int,
                       origin, scale, smooth_sigma: float):
    """Solve lap(chi) = div(V) spectrally; returns (chi, density_grid)."""
    R = resolution
    pts_grid = (points - origin) / scale  # in [0, R)
    inb = valid & jnp.all((pts_grid >= 1.0) & (pts_grid <= R - 2.0), axis=1)

    V = jnp.zeros((R, R, R, 3))
    V = _splat_trilinear(V, pts_grid, normals, inb)
    dens = jnp.zeros((R, R, R))
    dens = _splat_trilinear(dens, pts_grid, jnp.ones((points.shape[0],)), inb)
    V = _gaussian3d(V, smooth_sigma)
    dens_s = _gaussian3d(dens, smooth_sigma)

    # divergence via spectral derivative
    kf = jnp.fft.fftfreq(R)  # cycles per sample
    ikx = 2j * jnp.pi * kf
    KX = ikx[:, None, None]
    KY = ikx[None, :, None]
    KZ = ikx[None, None, :]
    Fx = jnp.fft.fftn(V[..., 0])
    Fy = jnp.fft.fftn(V[..., 1])
    Fz = jnp.fft.fftn(V[..., 2])
    div_hat = KX * Fx + KY * Fy + KZ * Fz
    k2 = KX ** 2 + KY ** 2 + KZ ** 2  # = -(2pi k)^2, real negative
    k2 = jnp.where(jnp.abs(k2) < 1e-12, 1.0, k2)
    chi_hat = div_hat / k2
    chi_hat = chi_hat.at[0, 0, 0].set(0.0)
    chi = jnp.real(jnp.fft.ifftn(chi_hat))

    # iso level: density-weighted mean of chi at sample locations
    g0 = jnp.clip(jnp.round(pts_grid).astype(jnp.int32), 0, R - 1)
    chi_at = chi[g0[:, 0], g0[:, 1], g0[:, 2]]
    w = inb.astype(jnp.float32)
    iso = jnp.sum(chi_at * w) / jnp.maximum(jnp.sum(w), 1.0)
    return chi - iso, dens_s


def create_from_point_cloud_poisson(
    pc: PointCloud,
    depth: int = 6,
    smooth_sigma: float = 1.5,
    max_triangles: int = 1 << 19,
    margin: float = 0.1,
) -> Tuple[TriangleMesh, jax.Array]:
    """Poisson reconstruction (mesh_reconstruction.py:22 signature:
    (pcd, depth) -> (mesh, densities)). Needs normals.

    Returns (mesh, per-vertex densities) like Open3D — densities feed the
    plasma colormap in mesh saving and low-density culling.
    """
    if pc.normals is None:
        raise ValueError("Poisson reconstruction requires normals "
                         "(run normal estimation first)")
    import numpy as np

    R = 1 << depth
    pts, _, _ = pc.to_numpy()
    if len(pts) == 0:
        # an all-culled cloud (e.g. outlier removal on a tiny scan) must
        # fail with a diagnosis, not a numpy zero-size reduction error
        raise ValueError(
            "Poisson reconstruction got an empty point cloud — every "
            "point was invalid or culled upstream (check outlier/"
            "downsample settings vs the scan size)")
    lo = pts.min(0)
    hi = pts.max(0)
    span = float((hi - lo).max()) * (1.0 + 2.0 * margin)
    origin = jnp.asarray(lo - margin * span, jnp.float32)
    scale = jnp.float32(span / R)

    chi, dens = _poisson_indicator(pc.points, pc.normals, pc.valid, R,
                                   origin, scale, smooth_sigma)
    # mesh the indicator zero crossing; restrict to sampled regions
    weight = (dens > 1e-4).astype(jnp.float32)
    vol = TSDFVolume(tsdf=chi.astype(jnp.float32), weight=weight,
                     origin=origin, voxel_size=scale,
                     sdf_trunc=jnp.float32(1.0), color=None)
    from recon3d_tpu.fusion.marching import _orient_by_gradient, extract_triangle_soup

    soup, valid, _ = extract_triangle_soup(vol, max_triangles=max_triangles)
    soup = _orient_by_gradient(vol, soup)

    def density_fn(verts):
        g = jnp.clip(((jnp.asarray(verts) - origin) / scale), 0, R - 1)
        gi = jnp.round(g).astype(jnp.int32)
        return dens[gi[:, 0], gi[:, 1], gi[:, 2]]

    mesh = weld_mesh(soup, valid, float(scale))
    densities = density_fn(mesh.vertices)
    return mesh, densities
