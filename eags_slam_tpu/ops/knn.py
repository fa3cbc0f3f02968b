"""Nearest-neighbor primitives on device (faiss / simple-knn replacements).

Replaces (SURVEY.md §2.3):
  - `simple-knn` `distCUDA2`: mean squared distance to the 3 nearest
    neighbors, used for scale init (reference gaussian_model.py:17,143,253);
  - `faiss` radius dedup of new mapper points (mapper_utils.py:193-226);
  - Open3D statistical outlier removal (mapper.py:348-350);
  - `faiss` 1-NN overlap ratio (gsr/overlap.py:41-66).

All are chunked brute force: the cross term of ||x-y||^2 is a (chunk, 3) @
(3, N) matmul, so the heavy op lands on the MXU and scales to the point
counts this system sees (<= a few 100k). Masked entries use +inf distances.
Static shapes: inputs are capacity-padded with validity masks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def _pad_to(x: jnp.ndarray, n: int, fill=0.0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
    )


def _chunked_min_or_topk(query, qmask, ref, rmask, k, chunk, exclude_self_offset=None):
    """Per-query top-k smallest squared distances to ref (masked).

    exclude_self_offset: if not None, ref[i + offset] is excluded for query i
    (used when query is a slice of ref to drop self-matches).
    """
    nq = query.shape[0]
    nq_pad = -(-nq // chunk) * chunk
    query_p = _pad_to(query, nq_pad)
    qmask_p = _pad_to(qmask.astype(bool), nq_pad, False)

    ref_sq = jnp.sum(ref * ref, axis=-1)
    ref_sq = jnp.where(rmask, ref_sq, _INF)

    def body(ci):
        q = jax.lax.dynamic_slice(query_p, (ci * chunk, 0), (chunk, 3))
        # precision=HIGHEST: the expansion ||q||^2 - 2 q.r + ||r||^2 needs f32
        # accumulation; default (bf16-ish) matmul precision breaks dedup radii.
        cross = jnp.matmul(q, ref.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(q * q, axis=-1, keepdims=True) - 2.0 * cross + ref_sq[None, :]
        d2 = jnp.where(rmask[None, :], d2, _INF)
        if exclude_self_offset is not None:
            rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + ci * chunk
            cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            d2 = jnp.where(cols == rows + exclude_self_offset, _INF, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return -neg_top  # (chunk, k) ascending-ish (top_k is sorted desc on -d2)

    out = jax.lax.map(body, jnp.arange(nq_pad // chunk))
    out = out.reshape(nq_pad, k)[:nq]
    return jnp.maximum(out, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mean_sq_dist_knn(pts, mask, k: int = 3, chunk: int = 1024):
    """distCUDA2 equivalent: mean squared distance to k nearest neighbors.

    Self-matches excluded. Returns (N,) f32; invalid entries get 1e-8.
    """
    d2 = _chunked_min_or_topk(pts, mask, pts, mask, k, chunk, exclude_self_offset=0)
    md = jnp.mean(jnp.where(d2 >= _INF * 0.5, 0.0, d2), axis=-1)
    return jnp.where(mask, jnp.maximum(md, 1e-8), 1e-8)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "self_offset"))
def mean_sq_dist_knn_query(query, qmask, ref, rmask, k: int = 3,
                           chunk: int = 1024, self_offset=None):
    """distCUDA2 for QUERY rows only against a reference set.

    Same semantics as `mean_sq_dist_knn` restricted to the query rows —
    when the queries are a slice of ref starting at `self_offset`,
    self-matches are excluded. Avoids the full ref x ref pass when only a
    few new rows need scale init (mapper growth: ~30k candidates vs ~300k
    union; the square pass measured ~2.8 s per mapped frame on the v5e).
    """
    d2 = _chunked_min_or_topk(query, qmask, ref, rmask, k, chunk,
                              exclude_self_offset=self_offset)
    md = jnp.mean(jnp.where(d2 >= _INF * 0.5, 0.0, d2), axis=-1)
    return jnp.where(qmask, jnp.maximum(md, 1e-8), 1e-8)


@functools.partial(jax.jit, static_argnames=("chunk",))
def nearest_sq_dist(query, qmask, ref, rmask, chunk: int = 1024):
    """Squared distance to the nearest reference point, (Nq,)."""
    d2 = _chunked_min_or_topk(query, qmask, ref, rmask, 1, chunk)
    return d2[:, 0]


@functools.partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor(query, qmask, ref, rmask, chunk: int = 1024):
    """(d2, index) of the nearest reference point per query."""
    nq = query.shape[0]
    nq_pad = -(-nq // chunk) * chunk
    query_p = _pad_to(query, nq_pad)
    ref_sq = jnp.sum(ref * ref, axis=-1)
    ref_sq = jnp.where(rmask, ref_sq, _INF)

    def body(ci):
        q = jax.lax.dynamic_slice(query_p, (ci * chunk, 0), (chunk, 3))
        cross = jnp.matmul(q, ref.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(q * q, axis=-1, keepdims=True) - 2.0 * cross + ref_sq[None, :]
        d2 = jnp.where(rmask[None, :], d2, _INF)
        idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        return jnp.min(d2, axis=-1), idx

    d2, idx = jax.lax.map(body, jnp.arange(nq_pad // chunk))
    return (
        jnp.maximum(d2.reshape(nq_pad)[:nq], 0.0),
        idx.reshape(nq_pad)[:nq],
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def radius_dedup(new_pts, new_mask, existing, ex_mask, radius, chunk: int = 1024):
    """Keep-mask for candidate points, reproducing the reference rule
    (mapper_utils.py:193-226): candidate i is dropped when any point with a
    smaller concat index (all existing points, or candidates j < i) lies
    within `radius`.
    """
    r2 = radius * radius
    d2_exist = nearest_sq_dist(new_pts, new_mask, existing, ex_mask, chunk)
    keep = d2_exist > r2

    n = new_pts.shape[0]
    n_pad = -(-n // chunk) * chunk
    pts_p = _pad_to(new_pts, n_pad)
    msk_p = _pad_to(new_mask.astype(bool), n_pad, False)
    sq = jnp.sum(pts_p * pts_p, axis=-1)
    sq = jnp.where(msk_p, sq, _INF)

    def body(ci):
        q = jax.lax.dynamic_slice(pts_p, (ci * chunk, 0), (chunk, 3))
        cross = jnp.matmul(q, pts_p.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(q * q, axis=-1, keepdims=True) - 2.0 * cross + sq[None, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + ci * chunk
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        d2 = jnp.where((cols < rows) & msk_p[None, :], d2, _INF)
        return jnp.min(d2, axis=-1)

    d2_prior = jax.lax.map(body, jnp.arange(n_pad // chunk)).reshape(n_pad)[:n]
    keep = keep & (d2_prior > r2) & new_mask
    return keep


@functools.partial(jax.jit, static_argnames=("nb", "std_ratio", "chunk"))
def statistical_inlier_mask(pts, mask, nb: int = 20, std_ratio: float = 2.0,
                            chunk: int = 1024):
    """Open3D remove_statistical_outlier equivalent: inlier iff the mean
    distance to `nb` nearest neighbors is below global mean + ratio * std.
    """
    d2 = _chunked_min_or_topk(pts, mask, pts, mask, nb, chunk, exclude_self_offset=0)
    d = jnp.mean(jnp.sqrt(jnp.where(d2 >= _INF * 0.5, 0.0, d2)), axis=-1)
    w = mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(d * w) / cnt
    var = jnp.sum(w * (d - mean) ** 2) / cnt
    thresh = mean + std_ratio * jnp.sqrt(var)
    return mask & (d < thresh)


@functools.partial(jax.jit, static_argnames=("chunk",))
def overlap_ratio(pts_a, mask_a, pts_b, mask_b, dist_thresh, chunk: int = 1024):
    """Fraction of A-points whose 1-NN in B is within dist_thresh, and the
    symmetric B->A fraction. Reference: gsr/overlap.py:41-66 (faiss-gpu).
    Returns the max of the two directional ratios (reference takes max).
    """
    d2_ab = nearest_sq_dist(pts_a, mask_a, pts_b, mask_b, chunk)
    d2_ba = nearest_sq_dist(pts_b, mask_b, pts_a, mask_a, chunk)
    t2 = dist_thresh * dist_thresh
    ra = jnp.sum((d2_ab < t2) & mask_a) / jnp.maximum(jnp.sum(mask_a), 1)
    rb = jnp.sum((d2_ba < t2) & mask_b) / jnp.maximum(jnp.sum(mask_b), 1)
    return jnp.maximum(ra, rb)
