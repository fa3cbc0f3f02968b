"""Pose-graph optimization on SE(3) (Open3D GlobalOptimization replacement).

Reference: src/entities/lc.py:204-330 — odometry edges between consecutive
submaps + loop edges from gaussian registration, per-edge 6x6 information
matrices from point-cloud correspondences (lc.py:555-560), and Open3D's
LevenbergMarquardt global optimization with `pgo_edge_prune_thres`
(lc.py:302-316), which down-weights/drops bad loop edges via a line
process.

TPU-native design: the graph is tiny (#submaps <= ~40 nodes), so the whole
Gauss-Newton solve is one jitted program: residuals r_ij =
log(Z_ij^-1 X_i^-1 X_j) for all edges at once, whitened by the Cholesky
factor of each edge's 6x6 information matrix, J via `jax.jacrev` over the
stacked tangent increments, normal equations solved densely. Node 0 is
gauged (fixed).

Loop-edge robustness uses the same LINE PROCESS as o3d's
GlobalOptimization (switchable constraints): each loop edge carries a
weight s_e updated in closed form every GN iteration,
s_e = (mu / (mu + chi2_e))^2 — a wildly inconsistent edge gets s ~ 0
immediately and cannot drag the trajectory; a genuine closure under drift
keeps s high and s -> 1 as the drift is corrected. Edges whose final
weight falls below `edge_prune_thres` (o3d edge_prune_threshold, default
0.25) are dropped and the graph re-solved at full weight
(reference `pgo_edge_prune_thres`, lc.py:302-316).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.se3 import se3_exp, se3_log


class PoseGraph(NamedTuple):
    poses: jnp.ndarray        # (N, 4, 4) node poses (world)
    edges_ij: jnp.ndarray     # (E, 2) int32 node index pairs
    edges_T: jnp.ndarray      # (E, 4, 4) measured T_i_j
    edges_info: jnp.ndarray   # (E, 6, 6) information matrices
    edges_valid: jnp.ndarray  # (E,) bool
    edges_is_loop: jnp.ndarray  # (E,) bool — prunable (odometry edges never)


def scalar_info(w) -> jnp.ndarray:
    """Backward-compatible scalar weight -> isotropic 6x6 information."""
    return jnp.asarray(w)[..., None, None] * jnp.eye(6)


def _edge_residuals(poses, graph: PoseGraph):
    Xi = poses[graph.edges_ij[:, 0]]
    Xj = poses[graph.edges_ij[:, 1]]
    rel = jnp.linalg.inv(graph.edges_T) @ jnp.linalg.inv(Xi) @ Xj
    return se3_log(rel)  # (E, 6)


@functools.partial(jax.jit, static_argnames=("iters", "huber", "line_mu"))
def _gn_solve(graph: PoseGraph, iters: int = 20, huber: float = 0.5,
              line_mu: Optional[float] = None):
    """Whitened Gauss-Newton over all valid edges.

    With `line_mu` set, loop edges carry line-process weights
    s_e = (mu / (mu + chi2_e))^2 recomputed each iteration (switchable
    constraints, as in o3d's GlobalOptimization). Returns
    (poses (N,4,4), per-edge chi2 (E,), per-edge final line weight (E,)).
    """
    n = graph.poses.shape[0]
    # Whitening: L^T r with L = cholesky(info) gives |L^T r|^2 = r^T info r.
    info = graph.edges_info + 1e-9 * jnp.eye(6)
    L = jnp.linalg.cholesky(info)                      # (E, 6, 6)

    def chi2_of(poses):
        r = _edge_residuals(poses, graph)
        chi2 = jnp.einsum("ei,eij,ej->e", r, info, r)
        # A non-finite residual (degenerate se3_log) is maximal
        # inconsistency, not a solver poison.
        return jnp.where(jnp.isfinite(chi2), chi2, 1e12)

    def line_weights(poses):
        if line_mu is None:
            return jnp.ones((graph.edges_T.shape[0],))
        s = (line_mu / (line_mu + chi2_of(poses))) ** 2
        return jnp.where(graph.edges_is_loop, s, 1.0)

    def residuals(tangents, base_poses, s):
        X = base_poses @ se3_exp(tangents)
        r = _edge_residuals(X, graph)                  # (E, 6)
        # Invalid edges are masked with `where` (0 * NaN = NaN: se3_log of
        # a wildly wrong pruned edge must not poison the solve).
        r = jnp.where(graph.edges_valid[:, None] & jnp.isfinite(r), r, 0.0)
        rw = jnp.einsum("eij,ei->ej", L, r)            # L^T r
        # Huber on the whitened norm (robustness on top of the line
        # process, like o3d's robust kernel). sqrt(max(., eps)) keeps the
        # JACOBIAN finite at exactly-zero residuals (norm() has a NaN
        # gradient at 0, which poisons perfectly-consistent edges).
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(rw * rw, axis=-1), 1e-18))
        w = jnp.where(nrm > huber, huber / jnp.maximum(nrm, 1e-9), 1.0)
        w = w * s * graph.edges_valid
        return (rw * jnp.sqrt(w)[:, None]).reshape(-1)

    def gn_step(poses, _):
        s = line_weights(poses)
        z = jnp.zeros((n, 6))
        J = jax.jacrev(residuals)(z, poses, s)
        r = residuals(z, poses, s)
        J = J.reshape(r.shape[0], n * 6)
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones((n - 1) * 6)])
        J = J * mask[None, :]
        H = J.T @ J + 1e-6 * jnp.eye(n * 6) + jnp.diag(1.0 - mask)
        g = -J.T @ r
        delta = jnp.linalg.solve(H, g).reshape(n, 6) * mask.reshape(n, 6)
        return poses @ se3_exp(delta), jnp.sum(r * r)

    poses, _ = jax.lax.scan(gn_step, graph.poses, jnp.arange(iters))
    return poses, chi2_of(poses), line_weights(poses)


def _next_pow2(x: int, lo: int = 4) -> int:
    p = lo
    while p < x:
        p *= 2
    return p


def _pad_graph(graph: PoseGraph) -> PoseGraph:
    """Pad nodes/edges to power-of-two buckets so `_gn_solve` compiles once
    per BUCKET instead of once per (submap count, edge count) — on the
    tunneled TPU each fresh shape cost ~2.4 s of compile at every closure
    (measured, 4-node graph). Padded nodes carry identity poses and no
    edges: their H block is the 1e-6 Tikhonov diagonal with zero gradient,
    so their update is exactly zero and real nodes are untouched. Padded
    edges are `edges_valid=False`, which the solver already masks."""
    n = graph.poses.shape[0]
    e = graph.edges_T.shape[0]
    n_pad = _next_pow2(n)
    e_pad = _next_pow2(e)
    if n_pad == n and e_pad == e:
        return graph
    import numpy as np

    poses = np.concatenate(
        [np.asarray(graph.poses),
         np.tile(np.eye(4, dtype=np.float32), (n_pad - n, 1, 1))])
    ij = np.concatenate(
        [np.asarray(graph.edges_ij),
         np.zeros((e_pad - e, 2), np.int32)])
    T = np.concatenate(
        [np.asarray(graph.edges_T),
         np.tile(np.eye(4, dtype=np.float32), (e_pad - e, 1, 1))])
    info = np.concatenate(
        [np.asarray(graph.edges_info),
         np.tile(np.eye(6, dtype=np.float32), (e_pad - e, 1, 1))])
    valid = np.concatenate(
        [np.asarray(graph.edges_valid), np.zeros(e_pad - e, bool)])
    is_loop = np.concatenate(
        [np.asarray(graph.edges_is_loop), np.zeros(e_pad - e, bool)])
    return PoseGraph(poses, ij, T, info, valid, is_loop)


def _host_device():
    """CPU device for the solve when the session backend is an accelerator:
    the graph is tiny (<= ~64 nodes), the persistent compile cache covers
    CPU executables (it does NOT cover tunneled-TPU programs), and running
    here keeps the chip free for the main loop."""
    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def optimize_pose_graph(
    graph: PoseGraph, iters: int = 20, huber: float = 0.5,
    edge_prune_thres: Optional[float] = None, line_mu: float = 0.25,
) -> jnp.ndarray:
    """GN PGO with line-process loop edges; returns corrected poses.

    Node 0 fixed. When `edge_prune_thres` is set (o3d edge_prune_threshold
    semantics, typically 0.25): loop edges run with line-process weights
    during the solve; edges whose final weight falls below the threshold
    are dropped and the graph re-solved from the original poses at full
    weight. `line_mu` is the chi-square scale at which a loop edge's
    weight halves (drift tolerance of a genuine closure).
    """
    import contextlib

    n = graph.poses.shape[0]
    graph = _pad_graph(graph)
    dev = _host_device()
    ctx = jax.default_device(dev) if dev is not None else (
        contextlib.nullcontext())
    with ctx:
        if edge_prune_thres is None:
            poses, _, _ = _gn_solve(graph, iters=iters, huber=huber)
            return poses[:n]
        poses, _, s = _gn_solve(graph, iters=iters, huber=huber,
                                line_mu=line_mu)
        bad = graph.edges_is_loop & (s < edge_prune_thres) & graph.edges_valid
        if not bool(jnp.any(bad)):
            return poses[:n]
        # Full-weight re-solve WITHOUT the pruned edges. Clearing
        # edges_is_loop (instead of passing line_mu=None) makes every line
        # weight exactly 1.0 through the SAME compiled program — a
        # line_mu=None call is a different static signature and cost a
        # second fresh compile (~2.4 s on the tunneled chip) at every
        # pruning closure.
        poses, _, _ = _gn_solve(
            graph._replace(
                edges_valid=graph.edges_valid & ~bad,
                edges_is_loop=jnp.zeros_like(graph.edges_is_loop),
            ),
            iters=iters, huber=huber, line_mu=line_mu,
        )
    return poses[:n]


def derive_pgo_buckets(max_nodes: int, max_edges: Optional[int] = None):
    """(n_pad, e_pad) buckets covering graphs up to `max_nodes` submaps.

    Mirrors `_pad_graph`'s power-of-two padding: for each node bucket n in
    4..pad(max_nodes), edges land in (n, n) or (n, 2n) — a pose chain plus
    up to ~n accumulated loop edges. `max_edges` extends the largest node
    bucket for loop-edge-heavy runs."""
    out = []
    n = 4
    n_cap = _next_pow2(max(int(max_nodes), 2))
    while n <= n_cap:
        out.append((n, n))
        out.append((n, 2 * n))
        n *= 2
    if max_edges is not None:
        e = 2 * n_cap
        e_cap = _next_pow2(max(int(max_edges), 2))
        while e < e_cap:
            e *= 2
            out.append((n_cap, e))
    return tuple(out)


def warm_pgo_buckets(
    buckets=None, max_nodes: int = 8, max_edges: Optional[int] = None,
    iters: int = 20, huber: float = 0.5, line_mu: float = 0.25,
    edge_prune_thres: Optional[float] = 0.25,
) -> None:
    """Compile `_gn_solve` for the given (n_pad, e_pad) shape buckets.

    The PGO program compiles per padded-shape bucket (see `_pad_graph`);
    warm-up runs without closures never reach it, so a cold process pays
    the compile (~2.4-5 s each, measured) inside the FIRST real closure.
    Call this during a warm-up phase (bench.py `_warm_lc_programs`) to move
    those compiles out of the measured/latency-critical path. Pass the
    ACTIVE config's statics (`LoopCloser.warm_pgo` does): with
    `edge_prune_thres=None` the line_mu=None `_gn_solve` signature is the
    one that compiles — warming only the default would be silently
    ineffective for that config. Without explicit `buckets`, they are
    derived from the expected submap count (`max_nodes`/`max_edges`).
    """
    import numpy as np

    if buckets is None:
        buckets = derive_pgo_buckets(max_nodes, max_edges)
    for n, e in buckets:
        if e < n - 1:
            raise ValueError(
                f"bucket ({n}, {e}): a connected {n}-node graph needs at "
                f"least {n - 1} edges")
        ij = np.zeros((e, 2), np.int32)
        ij[: n - 1, 0] = np.arange(n - 1)
        ij[: n - 1, 1] = np.arange(1, n)
        # Remaining edges are consistent identity "loops" 0->1 so the
        # line process keeps them (no prune re-solve needed: the re-solve
        # reuses this same compiled program).
        ij[n - 1:, 1] = 1 if n > 1 else 0
        graph = PoseGraph(
            poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1)),
            edges_ij=jnp.asarray(ij),
            edges_T=jnp.tile(jnp.eye(4, dtype=jnp.float32), (e, 1, 1)),
            edges_info=jnp.tile(jnp.eye(6, dtype=jnp.float32), (e, 1, 1)),
            edges_valid=jnp.ones(e, bool),
            edges_is_loop=jnp.asarray(np.arange(e) >= n - 1),
        )
        optimize_pose_graph(graph, iters=iters, huber=huber,
                            edge_prune_thres=edge_prune_thres,
                            line_mu=line_mu)
