"""Pose-graph optimization on SE(3) (Open3D GlobalOptimization replacement).

Reference: src/entities/lc.py:204-330 — odometry edges between consecutive
submaps + loop edges from gaussian registration, information matrices, and
Open3D's LevenbergMarquardt global optimization with
`pgo_edge_prune_thres`.

TPU-native design: the graph is tiny (#submaps <= ~40 nodes), so the whole
Gauss-Newton solve is one jitted program: residuals r_ij =
log(Z_ij^-1 X_i^-1 X_j) for all edges at once (vmap), J via `jax.jacrev`
over the stacked tangent increments, normal equations solved densely.
Node 0 is gauged (fixed). Huber weighting on loop edges approximates the
reference's edge pruning.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.se3 import se3_exp, se3_log


class PoseGraph(NamedTuple):
    poses: jnp.ndarray        # (N, 4, 4) node poses (world)
    edges_ij: jnp.ndarray     # (E, 2) int32 node index pairs
    edges_T: jnp.ndarray      # (E, 4, 4) measured T_i_j
    edges_info: jnp.ndarray   # (E,) scalar information weights
    edges_valid: jnp.ndarray  # (E,) bool


@functools.partial(jax.jit, static_argnames=("iters", "huber"))
def optimize_pose_graph(
    graph: PoseGraph, iters: int = 20, huber: float = 0.5
) -> jnp.ndarray:
    """Gauss-Newton PGO; returns corrected poses (N, 4, 4). Node 0 fixed."""
    n = graph.poses.shape[0]

    def residuals(tangents, base_poses):
        # X_i = base_i @ exp(tau_i)
        X = base_poses @ se3_exp(tangents)
        Xi = X[graph.edges_ij[:, 0]]
        Xj = X[graph.edges_ij[:, 1]]
        # r = log(Z^-1 X_i^-1 X_j)
        Zi_inv = jnp.linalg.inv(graph.edges_T)
        rel = Zi_inv @ jnp.linalg.inv(Xi) @ Xj
        r = se3_log(rel)  # (E, 6)
        # Huber weight per edge on the residual norm.
        nrm = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(nrm > huber, huber / jnp.maximum(nrm, 1e-9), 1.0)
        w = w * graph.edges_info * graph.edges_valid
        return (r * jnp.sqrt(w)[:, None]).reshape(-1)

    def gn_step(poses, _):
        z = jnp.zeros((n, 6))
        J = jax.jacrev(residuals)(z, poses)       # (E*6, N, 6)
        r = residuals(z, poses)
        J = J.reshape(r.shape[0], n * 6)
        # Gauge: fix node 0 by zeroing its columns and adding identity prior.
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones((n - 1) * 6)])
        J = J * mask[None, :]
        H = J.T @ J + 1e-6 * jnp.eye(n * 6) + jnp.diag(1.0 - mask)
        g = -J.T @ r
        delta = jnp.linalg.solve(H, g).reshape(n, 6) * mask.reshape(n, 6)
        return poses @ se3_exp(delta), jnp.sum(r * r)

    poses, costs = jax.lax.scan(gn_step, graph.poses, jnp.arange(iters))
    return poses
