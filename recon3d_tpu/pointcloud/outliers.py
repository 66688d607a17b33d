"""Statistical and radius outlier removal.

Replaces o3d remove_statistical_outlier / remove_radius_outlier
(pointcloud_processing.py:36-40) with masked reductions over the blocked
k-NN/range machinery in ops.knn — shapes stay fixed; "removal" clears mask
bits (compact() repacks if a smaller buffer is wanted).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from recon3d_tpu.ops import knn as _knn
from recon3d_tpu.utils.types import PointCloud


@partial(jax.jit, static_argnames=("nb_neighbors",))
def remove_statistical_outliers(
    pc: PointCloud,
    nb_neighbors: int = 30,
    std_ratio: float = 1.2,
) -> PointCloud:
    """Open3D remove_statistical_outlier(nb_neighbors, std_ratio)
    (pointcloud_processing.py:36): drop points whose mean k-NN distance
    exceeds mean + std_ratio * std of that statistic over the cloud."""
    _, d2 = _knn.knn(pc.points, pc.valid, k=nb_neighbors)
    mean_d = jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)), axis=1)  # (N,)
    v = pc.valid
    n = jnp.maximum(jnp.sum(v), 1)
    mu = jnp.sum(jnp.where(v, mean_d, 0.0)) / n
    var = jnp.sum(jnp.where(v, (mean_d - mu) ** 2, 0.0)) / jnp.maximum(n - 1, 1)
    thresh = mu + std_ratio * jnp.sqrt(var)
    keep = v & (mean_d <= thresh)
    return dataclasses.replace(pc, valid=keep)


@jax.jit
def remove_radius_outliers(
    pc: PointCloud,
    nb_points: int = 16,
    radius: float = 0.01,
) -> PointCloud:
    """Open3D remove_radius_outlier(nb_points, radius)
    (pointcloud_processing.py:40): keep points with at least nb_points
    neighbors inside radius."""
    counts = _knn.radius_count(pc.points, pc.valid, radius)
    keep = pc.valid & (counts >= nb_points)
    return dataclasses.replace(pc, valid=keep)
