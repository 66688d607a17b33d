"""Mesh filters and cleanup.

Replaces the Open3D mesh post-processing chain the reference runs after
reconstruction: filter_smooth_laplacian x5 (mesh_reconstruction.py:26,41-50),
remove_degenerate_triangles / remove_duplicated_vertices /
remove_unreferenced_vertices (mesh_reconstruction.py:29-37, mini1.py:361-367),
the NaN-vertex scrub (mini1.py:370-378), and the low-density vertex cull /
highlight (visualizer.py:41-57).

Smoothing runs as edge-wise segment sums under jit (the reference used a
host ThreadPool for this; here it is one XLA program); cleanup ops flip
validity masks — capacities never change.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.utils.types import TriangleMesh


@partial(jax.jit, static_argnames=("iterations",))
def filter_smooth_laplacian(
    mesh: TriangleMesh, iterations: int = 5, lam: float = 0.5
) -> TriangleMesh:
    """o3d filter_smooth_laplacian: v <- v + lam * (nbr_mean - v)."""
    V = mesh.vertices.shape[0]
    tris = mesh.triangles
    tv = mesh.triangle_valid
    # undirected edge list from triangles (each edge twice, both directions)
    e_src = jnp.concatenate([tris[:, 0], tris[:, 1], tris[:, 2],
                             tris[:, 1], tris[:, 2], tris[:, 0]])
    e_dst = jnp.concatenate([tris[:, 1], tris[:, 2], tris[:, 0],
                             tris[:, 0], tris[:, 1], tris[:, 2]])
    e_ok = jnp.tile(tv, 6)
    w = e_ok.astype(jnp.float32)

    deg = jax.ops.segment_sum(w, e_src, num_segments=V)

    def body(verts, _):
        nbr = jax.ops.segment_sum(verts[e_dst] * w[:, None], e_src, num_segments=V)
        mean = nbr / jnp.maximum(deg, 1.0)[:, None]
        out = jnp.where((deg > 0)[:, None], verts + lam * (mean - verts), verts)
        return out, None

    verts, _ = jax.lax.scan(body, mesh.vertices, None, length=iterations)
    return dataclasses.replace(mesh, vertices=verts)


@jax.jit
def remove_degenerate_triangles(mesh: TriangleMesh, area_eps: float = 0.0) -> TriangleMesh:
    """Drop triangles with repeated vertices or (optionally) ~zero area
    (mesh_reconstruction.py:33, mini1.py:363)."""
    t = mesh.triangles
    distinct = (t[:, 0] != t[:, 1]) & (t[:, 1] != t[:, 2]) & (t[:, 0] != t[:, 2])
    keep = mesh.triangle_valid & distinct
    if area_eps > 0:
        v = mesh.vertices
        n = jnp.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        keep = keep & (0.5 * jnp.linalg.norm(n, axis=1) > area_eps)
    return dataclasses.replace(mesh, triangle_valid=keep)


@jax.jit
def remove_unreferenced_vertices(mesh: TriangleMesh) -> TriangleMesh:
    """Invalidate vertices not used by any valid triangle
    (mesh_reconstruction.py:36, mini1.py:366)."""
    V = mesh.vertices.shape[0]
    used = jnp.zeros((V,), bool)
    w = mesh.triangle_valid
    for k in range(3):
        used = used.at[mesh.triangles[:, k]].max(w)
    return dataclasses.replace(mesh, vertex_valid=mesh.vertex_valid & used)


@jax.jit
def remove_nan_vertices(mesh: TriangleMesh) -> TriangleMesh:
    """NaN/Inf vertex scrub + triangles touching them (mini1.py:370-378)."""
    finite = jnp.isfinite(mesh.vertices).all(axis=1)
    vv = mesh.vertex_valid & finite
    tv = mesh.triangle_valid
    for k in range(3):
        tv = tv & vv[mesh.triangles[:, k]]
    return dataclasses.replace(mesh, vertex_valid=vv, triangle_valid=tv)


def remove_duplicated_vertices(mesh: TriangleMesh, tol: float = 1e-6) -> TriangleMesh:
    """Weld coincident vertices (host-side; quantize + unique) and remap
    triangles (mini1.py:364)."""
    verts = np.asarray(mesh.vertices)
    vv = np.asarray(mesh.vertex_valid)
    q = np.round(verts / tol).astype(np.int64)
    q[~vv] = np.iinfo(np.int64).min  # invalid vertices never merge
    uniq, first_idx, inv = np.unique(q, axis=0, return_index=True, return_inverse=True)
    remap = first_idx[inv]  # every vertex -> canonical first occurrence
    tris = remap[np.asarray(mesh.triangles)].astype(np.int32)
    return dataclasses.replace(
        mesh,
        triangles=jnp.asarray(tris),
        vertex_valid=jnp.asarray(vv & (remap == np.arange(len(verts)))),
    )


def remove_duplicated_triangles(mesh: TriangleMesh) -> TriangleMesh:
    """Drop repeated faces regardless of winding (mini1.py:365)."""
    tris = np.sort(np.asarray(mesh.triangles), axis=1)
    tv = np.asarray(mesh.triangle_valid)
    _, first_idx = np.unique(tris, axis=0, return_index=True)
    keep = np.zeros(len(tris), bool)
    keep[first_idx] = True
    return dataclasses.replace(mesh, triangle_valid=jnp.asarray(tv & keep))


def cleanup(mesh: TriangleMesh) -> TriangleMesh:
    """The reference's full post-Poisson cleanup chain (mini1.py:361-378)."""
    mesh = remove_nan_vertices(mesh)
    mesh = remove_duplicated_vertices(mesh)
    mesh = remove_duplicated_triangles(mesh)
    mesh = remove_degenerate_triangles(mesh)
    mesh = remove_unreferenced_vertices(mesh)
    return mesh


@jax.jit
def compute_vertex_normals(mesh: TriangleMesh) -> TriangleMesh:
    """Area-weighted vertex normals (o3d compute_vertex_normals)."""
    v = mesh.vertices
    t = mesh.triangles
    fn = jnp.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    fn = fn * mesh.triangle_valid[:, None]
    V = v.shape[0]
    acc = jnp.zeros((V, 3))
    for k in range(3):
        acc = acc.at[t[:, k]].add(fn)
    n = acc / jnp.maximum(jnp.linalg.norm(acc, axis=1, keepdims=True), 1e-12)
    return dataclasses.replace(mesh, vertex_normals=n)


def density_mask(densities: jax.Array, quantile: float = 0.01) -> jax.Array:
    """Low-density vertex selection (visualizer.py:41-57 threshold; also the
    density-based cull pattern around Poisson outputs). Returns bool mask of
    vertices BELOW the quantile."""
    thresh = jnp.quantile(jnp.asarray(densities, jnp.float32), quantile)
    return jnp.asarray(densities) < thresh


def highlight_sparse_regions(mesh: TriangleMesh, densities, quantile: float = 0.01,
                             color=(1.0, 0.0, 0.0)) -> TriangleMesh:
    """Paint low-density vertices red (visualizer.py:41-57)."""
    mask = density_mask(densities, quantile)
    base = mesh.vertex_colors
    if base is None:
        base = jnp.full_like(mesh.vertices, 0.7)
    cols = jnp.where(mask[:, None], jnp.asarray(color, jnp.float32), base)
    return dataclasses.replace(mesh, vertex_colors=cols)
