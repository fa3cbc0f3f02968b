"""Global point-cloud registration: FPFH features + RANSAC.

Reference: src/gsr/pcr.py:10-45 — Open3D `preprocess_point_cloud` (voxel
downsample, normal + FPFH estimation) and
`execute_global_registration` (RANSAC over FPFH correspondences with
edge-length + distance checkers), used by the `robust_icp` registration
path (lc.py:454-566) to recover large-basin misalignments before local ICP.

TPU/JAX re-design: everything is fixed-shape batched array math —
  - normals from kNN PCA (one eigh over (N, 3, 3) scatter matrices);
  - FPFH per Rusu'09: SPFH angular triplets (alpha, phi, theta) histogrammed
    into 3x11 bins via one-hot matmuls over the kNN neighbor lists, then
    FPFH_p = SPFH_p + mean_k SPFH_k / (1 + d_k) — no loops, no trees;
  - correspondences = mutual FPFH nearest neighbors;
  - RANSAC: vmapped Kabsch over thousands of sampled triples at once,
    scored by inlier count on the correspondence set (with the edge-length
    prefilter as a validity mask) — one device program instead of a
    sequential hypothesis loop.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import knn


def voxel_downsample(pts: np.ndarray, voxel: float, cap: int = 8192,
                     seed: int = 0) -> np.ndarray:
    """One point per occupied voxel (first hit), capped to `cap` points."""
    keys = np.floor(pts / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    out = pts[np.sort(idx)]
    if len(out) > cap:
        rng = np.random.default_rng(seed)
        out = out[rng.choice(len(out), cap, replace=False)]
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_indices(pts: jnp.ndarray, k: int):
    """(N, k) neighbor indices (excluding self) + distances."""
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, -1)
    d2 = d2 + jnp.eye(pts.shape[0]) * 1e9
    neg, idx = jax.lax.top_k(-d2, k)
    return idx, jnp.sqrt(jnp.maximum(-neg, 1e-12))


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(pts: jnp.ndarray, k: int = 16) -> jnp.ndarray:
    """kNN-PCA normals, orientation-normalized to +z halfspace (sign is
    consistent-enough for FPFH's symmetric angular features)."""
    idx, _ = _knn_indices(pts, k)
    nbrs = pts[idx]                                   # (N, k, 3)
    mean = nbrs.mean(axis=1, keepdims=True)
    d = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", d, d) / k
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[..., 0]                                  # smallest eigenvector
    sign = jnp.where(n[..., 2:3] < 0, -1.0, 1.0)
    return n * sign


@functools.partial(jax.jit, static_argnames=("k", "bins"))
def fpfh(pts: jnp.ndarray, normals: jnp.ndarray, k: int = 16,
         bins: int = 11) -> jnp.ndarray:
    """(N, 3*bins) L1-normalized FPFH descriptors."""
    n_pts = pts.shape[0]
    idx, dist = _knn_indices(pts, k)                  # (N, k)
    p = pts[:, None, :]                               # (N, 1, 3)
    q = pts[idx]                                      # (N, k, 3)
    np_ = normals[:, None, :]
    nq = normals[idx]

    pq = q - p
    d = jnp.linalg.norm(pq, axis=-1, keepdims=True)
    pq_n = pq / jnp.maximum(d, 1e-9)

    u = jnp.broadcast_to(np_, pq.shape)
    v = jnp.cross(pq_n, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * nq, -1)                       # [-1, 1]
    phi = jnp.sum(u * pq_n, -1)                       # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * nq, -1), jnp.sum(u * nq, -1))  # [-pi,pi]

    def hist(x, lo, hi):
        # One-hot binning summed over neighbors -> (N, bins).
        t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0 - 1e-6)
        b = jnp.floor(t * bins).astype(jnp.int32)     # (N, k)
        oh = jax.nn.one_hot(b, bins)                  # (N, k, bins)
        return oh.sum(axis=1)

    spfh = jnp.concatenate(
        [hist(alpha, -1.0, 1.0), hist(phi, -1.0, 1.0),
         hist(theta, -jnp.pi, jnp.pi)], axis=-1,
    )                                                 # (N, 3*bins)
    # FPFH = SPFH + mean over neighbors of SPFH_k / (1 + d_k).
    wk = 1.0 / (1.0 + dist)                           # (N, k)
    nbr = spfh[idx]                                   # (N, k, 3*bins)
    out = spfh + jnp.einsum("nk,nkb->nb", wk, nbr) / k
    return out / jnp.maximum(
        jnp.sum(jnp.abs(out), axis=-1, keepdims=True), 1e-9
    )


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def _ransac_core(key, src, tgt, corr_s, corr_t, dist_thres: float,
                 n_hyp: int = 4096):
    """Batched 3-point RANSAC over a correspondence set.

    corr_s/corr_t: (M,) index arrays into src/tgt. Returns (T_best 4x4,
    inlier fraction). Edge-length checker (o3d, factor 0.9) masks
    degenerate/implausible triples before scoring.
    """
    m = corr_s.shape[0]
    trip = jax.random.randint(key, (n_hyp, 3), 0, m)
    a = src[corr_s[trip]]                             # (H, 3, 3)
    b = tgt[corr_t[trip]]

    def edge_ok(x, y):
        def el(z):
            return jnp.stack([
                jnp.linalg.norm(z[:, 0] - z[:, 1], axis=-1),
                jnp.linalg.norm(z[:, 1] - z[:, 2], axis=-1),
                jnp.linalg.norm(z[:, 0] - z[:, 2], axis=-1),
            ], -1)
        ex, ey = el(x), el(y)
        r = jnp.minimum(ex, ey) / jnp.maximum(jnp.maximum(ex, ey), 1e-9)
        return jnp.all(r > 0.9, axis=-1) & jnp.all(ex > 1e-4, axis=-1)

    ok = edge_ok(a, b)

    def kabsch(x, y):
        xc = x - x.mean(0)
        yc = y - y.mean(0)
        H = xc.T @ yc
        U, _, Vt = jnp.linalg.svd(H)
        s = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, s]))
        R = Vt.T @ S @ U.T
        t = y.mean(0) - R @ x.mean(0)
        return R, t

    Rs, ts = jax.vmap(kabsch)(a, b)                   # (H,3,3), (H,3)
    # Score on the full correspondence set.
    sp = src[corr_s]                                  # (M, 3)
    tp = tgt[corr_t]
    moved = jnp.einsum("hij,mj->hmi", Rs, sp) + ts[:, None, :]
    inl = jnp.sum(
        jnp.sum((moved - tp[None]) ** 2, -1) < dist_thres * dist_thres, axis=1
    )
    inl = jnp.where(ok, inl, -1)
    best = jnp.argmax(inl)
    T = jnp.eye(4).at[:3, :3].set(Rs[best]).at[:3, 3].set(ts[best])
    return T, inl[best] / jnp.maximum(m, 1)


def global_registration(
    src_pts: np.ndarray, tgt_pts: np.ndarray, voxel: float = 0.05,
    dist_thres: float = None, seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """FPFH + RANSAC coarse alignment: returns (T mapping src->tgt frame,
    inlier fraction). Reference execute_global_registration
    (src/gsr/pcr.py:25-45, distance_threshold = 1.5 * voxel)."""
    if dist_thres is None:
        dist_thres = 1.5 * voxel
    s = jnp.asarray(voxel_downsample(src_pts, voxel, seed=seed), jnp.float32)
    t = jnp.asarray(voxel_downsample(tgt_pts, voxel, seed=seed), jnp.float32)
    ns = estimate_normals(s)
    nt = estimate_normals(t)
    fs = fpfh(s, ns)
    ft = fpfh(t, nt)
    # Mutual nearest neighbors in feature space.
    d_st = jnp.sum((fs[:, None, :] - ft[None, :, :]) ** 2, -1)
    nn_st = jnp.argmin(d_st, axis=1)                  # (Ns,)
    nn_ts = jnp.argmin(d_st, axis=0)                  # (Nt,)
    mutual = nn_ts[nn_st] == jnp.arange(fs.shape[0])
    corr_s = np.nonzero(np.asarray(mutual))[0]
    if corr_s.size < 10:
        return np.eye(4), 0.0
    corr_t = np.asarray(nn_st)[corr_s]
    T, frac = _ransac_core(
        jax.random.PRNGKey(seed), s, t,
        jnp.asarray(corr_s, jnp.int32), jnp.asarray(corr_t, jnp.int32),
        dist_thres,
    )
    return np.asarray(T, np.float64), float(frac)
