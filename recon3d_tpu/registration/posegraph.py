"""Pose graph construction and global optimization.

Replaces o3d.pipelines.registration.PoseGraph + global_optimization with
LevenbergMarquardt (test/mini1.py:307-341, check2.py:111-179): nodes are
absolute poses, edges carry measured relative transforms + 6x6 information
matrices and an `uncertain` flag (loop closures; odometry edges are
certain). The optimizer is LM over node twists (node 0 pinned), with
Open3D-style line-process weights on uncertain edges so bad loop closures
switch off rather than distorting the trajectory.

All edges are evaluated batched (vmapped residuals); the normal equations
are a dense (6V x 6V) solve — graphs here are tens of fragments
(mini1.py max_fragments, check83.py:318-330), far below dense-solver limits.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.registration import se3


@dataclasses.dataclass
class PoseGraphEdge:
    source: int
    target: int
    transformation: np.ndarray  # (4,4) measured T_target_from_source
    information: np.ndarray  # (6,6)
    uncertain: bool = False


@dataclasses.dataclass
class PoseGraph:
    """Mirrors o3d PoseGraph: nodes[i].pose is world_from_node_i."""

    nodes: List[np.ndarray] = dataclasses.field(default_factory=list)
    edges: List[PoseGraphEdge] = dataclasses.field(default_factory=list)

    def add_node(self, pose: np.ndarray) -> int:
        self.nodes.append(np.asarray(pose, np.float64))
        return len(self.nodes) - 1

    def add_edge(self, source: int, target: int, transformation, information,
                 uncertain: bool = False) -> None:
        self.edges.append(PoseGraphEdge(source, target,
                                        np.asarray(transformation, np.float64),
                                        np.asarray(information, np.float64),
                                        uncertain))


class OptimizeResult(NamedTuple):
    poses: jax.Array  # (V, 4, 4)
    cost: jax.Array
    edge_weights: jax.Array  # (E,) final line-process weights


@partial(jax.jit, static_argnames=("max_iterations",))
def _optimize(poses0, edge_src, edge_tgt, edge_T, edge_info, edge_uncertain,
              max_iterations: int = 50, mu: float = 0.1):
    """LM over node twists; line-process weights on uncertain edges.

    Residual per edge: log( T_meas^{-1} (X_tgt^{-1} X_src) ) weighted by
    sqrt(info); uncertain edges additionally scaled by sqrt(w_e) with
    w_e = (mu / (mu + r^T Lambda r))^2 recomputed per sweep (Geman-McClure
    line process, Choi/Zhou/Koltun robust reconstruction scheme).
    """
    V = poses0.shape[0]
    E = edge_src.shape[0]
    sqrt_info = jnp.linalg.cholesky(
        edge_info + 1e-9 * jnp.eye(6)[None].repeat(E, 0))

    def edge_residuals(xis, weights):
        # xis: (V, 6) correction twists applied to initial poses
        X = jax.vmap(lambda x, P: se3.se3_exp(x) @ P)(xis, poses0)
        Xs = X[edge_src]
        Xt = X[edge_tgt]
        rel = jax.vmap(lambda a, b: se3.inverse(a) @ b)(Xt, Xs)
        err = jax.vmap(lambda m, r: se3.se3_log(se3.inverse(m) @ r))(edge_T, rel)
        wr = jnp.einsum("eij,ej->ei", sqrt_info, err)
        return wr * jnp.sqrt(weights)[:, None]

    def weights_of(xis):
        X = jax.vmap(lambda x, P: se3.se3_exp(x) @ P)(xis, poses0)
        rel = jax.vmap(lambda a, b: se3.inverse(a) @ b)(X[edge_tgt], X[edge_src])
        err = jax.vmap(lambda m, r: se3.se3_log(se3.inverse(m) @ r))(edge_T, rel)
        maha = jnp.einsum("ei,eij,ej->e", err, edge_info, err)
        w = (mu / (mu + maha)) ** 2
        return jnp.where(edge_uncertain, w, 1.0)

    def body(carry, _):
        xis, lam = carry
        w = weights_of(xis)

        def res_flat(x_flat):
            x = x_flat.reshape(V, 6)
            # pin node 0
            x = x.at[0].set(0.0)
            return edge_residuals(x, w).ravel()

        x_flat = xis.ravel()
        r = res_flat(x_flat)
        J = jax.jacfwd(res_flat)(x_flat)
        A = J.T @ J
        g = J.T @ r
        diag = jnp.maximum(jnp.diag(A), 1e-9)
        dx = -jnp.linalg.solve(A + lam * jnp.diag(diag), g)
        new_flat = x_flat + dx
        new_r = res_flat(new_flat)
        improved = jnp.sum(new_r * new_r) < jnp.sum(r * r)
        xis_new = jnp.where(improved, new_flat, x_flat).reshape(V, 6)
        xis_new = xis_new.at[0].set(0.0)
        lam_new = jnp.where(improved, jnp.maximum(lam / 3.0, 1e-9),
                            jnp.minimum(lam * 5.0, 1e8))
        return (xis_new, lam_new), None

    (xis, _), _ = jax.lax.scan(body, (jnp.zeros((V, 6)), jnp.asarray(1e-3)),
                               None, length=max_iterations)
    w = weights_of(xis)
    r = edge_residuals(xis, w)
    poses = jax.vmap(lambda x, P: se3.se3_exp(x) @ P)(xis, poses0)
    return OptimizeResult(poses=poses, cost=0.5 * jnp.sum(r * r), edge_weights=w)


def global_optimization(
    graph: PoseGraph,
    max_iterations: int = 50,
    edge_prune_threshold: float = 0.25,
    mu: float = 0.1,
) -> PoseGraph:
    """o3d global_optimization(LevenbergMarquardt) (mini1.py:323-341).

    Optimizes in place semantics: returns a new PoseGraph with updated node
    poses; uncertain edges whose final line-process weight fell below
    edge_prune_threshold are dropped (Open3D's edge pruning)."""
    if len(graph.nodes) < 2 or not graph.edges:
        return graph
    poses0 = jnp.asarray(np.stack(graph.nodes), jnp.float32)
    esrc = jnp.asarray([e.source for e in graph.edges], jnp.int32)
    etgt = jnp.asarray([e.target for e in graph.edges], jnp.int32)
    eT = jnp.asarray(np.stack([e.transformation for e in graph.edges]), jnp.float32)
    einfo = jnp.asarray(np.stack([e.information for e in graph.edges]), jnp.float32)
    eunc = jnp.asarray([e.uncertain for e in graph.edges])

    res = _optimize(poses0, esrc, etgt, eT, einfo, eunc,
                    max_iterations=max_iterations, mu=mu)
    out = PoseGraph()
    for p in np.asarray(res.poses):
        out.add_node(p)
    w = np.asarray(res.edge_weights)
    for e, wi in zip(graph.edges, w):
        if e.uncertain and wi < edge_prune_threshold:
            continue
        out.add_edge(e.source, e.target, e.transformation, e.information, e.uncertain)
    return out
