"""Core geometry containers, designed for XLA's static-shape world.

The reference keeps geometry in Open3D's dynamically-sized C++ vectors
(e.g. o3d.geometry.PointCloud in pointcloud_processing.py:24-40). XLA traces
programs once with static shapes, so every container here is a fixed-capacity
buffer plus a validity mask. Ops that shrink data (downsample, outlier
removal) keep capacity and clear mask bits; `compact()` re-packs valid
entries to the front when a smaller capacity is wanted between jit programs.

All containers are registered pytrees, so they flow through jit/vmap/scan
and across `jax.sharding` boundaries.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class PointCloud:
    """Fixed-capacity point cloud with a validity mask.

    points:  (N, 3) float32 positions. Invalid rows hold arbitrary data.
    colors:  (N, 3) float32 in [0, 1], or None.
    normals: (N, 3) float32 unit vectors, or None.
    valid:   (N,)  bool mask.

    Replaces o3d.geometry.PointCloud (reference: pointcloud_capture.py:42-53).
    """

    points: jax.Array
    valid: jax.Array
    colors: Optional[jax.Array] = None
    normals: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def from_numpy(
        points: np.ndarray,
        colors: Optional[np.ndarray] = None,
        normals: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
    ) -> "PointCloud":
        """Build from host arrays, padding up to `capacity`."""
        n = points.shape[0]
        cap = capacity or n
        if cap < n:
            raise ValueError(f"capacity {cap} < number of points {n}")

        def pad(a):
            if a is None:
                return None
            out = np.zeros((cap, 3), np.float32)
            out[:n] = a
            return jnp.asarray(out)

        valid = np.zeros((cap,), bool)
        valid[:n] = True
        return PointCloud(
            points=pad(points),
            colors=pad(colors),
            normals=pad(normals),
            valid=jnp.asarray(valid),
        )

    def to_numpy(self):
        """Return (points, colors, normals) host arrays for valid entries only."""
        valid = np.asarray(self.valid)
        pts = np.asarray(self.points)[valid]
        cols = None if self.colors is None else np.asarray(self.colors)[valid]
        nrm = None if self.normals is None else np.asarray(self.normals)[valid]
        return pts, cols, nrm

    def masked_points(self, fill: float = jnp.inf) -> jax.Array:
        """Points with invalid rows replaced by `fill` (useful for min-reductions)."""
        return jnp.where(self.valid[:, None], self.points, fill)


@partial(jax.jit, static_argnames=("capacity",))
def compact(pc: PointCloud, capacity: int) -> PointCloud:
    """Pack valid points to the front and truncate/pad to `capacity`.

    Stable: preserves relative order of valid points. Uses an argsort over
    the inverted mask (valid-first) which XLA lowers to a single sort.
    """
    order = jnp.argsort(~pc.valid, stable=True)  # valid rows first
    idx = order[:capacity] if capacity <= pc.capacity else jnp.pad(
        order, (0, capacity - pc.capacity), constant_values=0
    )
    n_valid = jnp.sum(pc.valid.astype(jnp.int32))
    new_valid = (
        jnp.arange(capacity) < jnp.minimum(n_valid, capacity)
    )

    def take(a):
        return None if a is None else a[idx]

    return PointCloud(
        points=take(pc.points),
        colors=take(pc.colors),
        normals=take(pc.normals),
        valid=new_valid,
    )


def concatenate(a: PointCloud, b: PointCloud) -> PointCloud:
    """Concatenate two clouds (capacity = sum of capacities).

    Replaces `combined_pcd += pcd` accumulation (reference: main.py:46).
    """

    def cat(x, y, name):
        if (x is None) != (y is None):
            raise ValueError(f"one cloud has {name}, the other does not")
        return None if x is None else jnp.concatenate([x, y], axis=0)

    return PointCloud(
        points=jnp.concatenate([a.points, b.points], axis=0),
        colors=cat(a.colors, b.colors, "colors"),
        normals=cat(a.normals, b.normals, "normals"),
        valid=jnp.concatenate([a.valid, b.valid], axis=0),
    )


def transform(pc: PointCloud, T: jax.Array) -> PointCloud:
    """Apply a 4x4 rigid transform (reference: pointcloud_alignment.py:44)."""
    R, t = T[:3, :3], T[:3, 3]
    pts = pc.points @ R.T + t
    normals = None if pc.normals is None else pc.normals @ R.T
    return dataclasses.replace(pc, points=pts, normals=normals)


@_pytree_dataclass
class RGBDImage:
    """An aligned color+depth frame.

    color: (H, W, 3) float32 in [0, 1]
    depth: (H, W)   float32 metric depth in meters; 0 or non-finite = invalid.

    Mirrors o3d.geometry.RGBDImage.create_from_color_and_depth
    (reference: test/mini1.py:147-151) but keeps metric depth directly.
    """

    color: jax.Array
    depth: jax.Array

    @property
    def shape(self):
        return self.depth.shape


@_pytree_dataclass
class TriangleMesh:
    """Fixed-capacity triangle mesh with validity masks.

    vertices:      (V, 3) float32
    triangles:     (F, 3) int32 vertex indices
    vertex_valid:  (V,)  bool
    triangle_valid:(F,)  bool
    vertex_colors: (V, 3) float32 or None
    vertex_normals:(V, 3) float32 or None

    Replaces o3d.geometry.TriangleMesh (reference: mesh_reconstruction.py:22).
    """

    vertices: jax.Array
    triangles: jax.Array
    vertex_valid: jax.Array
    triangle_valid: jax.Array
    vertex_colors: Optional[jax.Array] = None
    vertex_normals: Optional[jax.Array] = None

    def to_numpy(self):
        """Return (vertices, triangles, colors, normals) host arrays, re-indexed
        so triangles reference the compacted vertex array."""
        vv = np.asarray(self.vertex_valid)
        tv = np.asarray(self.triangle_valid)
        verts = np.asarray(self.vertices)
        tris = np.asarray(self.triangles)
        remap = -np.ones(len(verts), np.int64)
        remap[vv] = np.arange(vv.sum())
        out_tris = remap[tris[tv]]
        keep = (out_tris >= 0).all(axis=1)
        out_tris = out_tris[keep]
        cols = None if self.vertex_colors is None else np.asarray(self.vertex_colors)[vv]
        nrm = None if self.vertex_normals is None else np.asarray(self.vertex_normals)[vv]
        return verts[vv], out_tris.astype(np.int32), cols, nrm


@_pytree_dataclass
class CameraIntrinsics:
    """Pinhole intrinsics (fx, fy, cx, cy) + image size.

    Mirrors test/dataset/realsense/camera_intrinsic.json (fx=616.63 ...).
    width/height are static Python ints (aux data), so this is registered
    manually below rather than via _pytree_dataclass semantics.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    def matrix(self) -> jax.Array:
        K = jnp.zeros((3, 3), jnp.float32)
        K = K.at[0, 0].set(self.fx).at[1, 1].set(self.fy)
        K = K.at[0, 2].set(self.cx).at[1, 2].set(self.cy).at[2, 2].set(1.0)
        return K

    @staticmethod
    def from_matrix(K) -> "CameraIntrinsics":
        K = jnp.asarray(K, jnp.float32)
        return CameraIntrinsics(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2])

    @staticmethod
    def from_json(path: str) -> "CameraIntrinsics":
        import json

        with open(path) as f:
            d = json.load(f)
        return CameraIntrinsics(
            fx=jnp.float32(d["fx"]),
            fy=jnp.float32(d["fy"]),
            cx=jnp.float32(d.get("ppx", d.get("cx"))),
            cy=jnp.float32(d.get("ppy", d.get("cy"))),
        )
