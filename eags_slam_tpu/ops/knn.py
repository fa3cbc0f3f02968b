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


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of uint32 x to every 3rd bit (Morton helper)."""
    x = x & jnp.uint32(0x3FF)
    x = (x ^ (x << 16)) & jnp.uint32(0xFF0000FF)
    x = (x ^ (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x ^ (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x ^ (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_codes(pts: jnp.ndarray, valid: jnp.ndarray,
                 offset: float = 0.0) -> jnp.ndarray:
    """30-bit Morton (Z-order) codes over the valid points' bounding box.

    `offset` shifts the quantization grid by that many cells (multi-pass
    window searches use offset + axis-permuted grids to break cell-boundary
    adjacency misses). Invalid rows get the max uint32 key so they sort to
    the end."""
    big = jnp.float32(1e30)
    v = valid[:, None]
    lo = jnp.min(jnp.where(v, pts, big), axis=0)
    hi = jnp.max(jnp.where(v, pts, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((pts - lo) / extent) * 1023.0 + offset, 0.0, 1023.0)
    q = q.astype(jnp.uint32)
    code = (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << 1)
        | (_part1by2(q[:, 2]) << 2)
    )
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


def _window_pass(pts, valid, code, window: int, k: int):
    """One sorted-window pass: sort rows by `code`, compare each row against
    its +-window neighbors. Returns, in ORIGINAL row order, the k smallest
    neighbor (d2, neighbor-id) pairs (INF/-1-padded) and the smallest d2 to
    a lower-priority row (priority = original row index)."""
    m = pts.shape[0]
    window = min(window, m - 1)
    if window < 1:
        return (jnp.full((m, k), _INF), jnp.full((m, k), -1, jnp.int32),
                jnp.full((m,), _INF))
    prio = jnp.arange(m, dtype=jnp.int32)
    _, xs, ys, zs, prio_s, val_s = jax.lax.sort(
        (code, pts[:, 0], pts[:, 1], pts[:, 2], prio,
         valid.astype(jnp.int32)),
        dimension=0, num_keys=1,
    )
    val_s = val_s == 1

    nbr_d2 = []      # (m,) per shifted neighbor, INF when invalid
    nbr_id = []      # (m,) original index of that neighbor, -1 when invalid
    prior_min = jnp.full((m,), _INF)
    neg1 = jnp.full((m,), -1, jnp.int32)
    for s in range(1, window + 1):
        d2s = ((xs[s:] - xs[:-s]) ** 2 + (ys[s:] - ys[:-s]) ** 2
               + (zs[s:] - zs[:-s]) ** 2)
        pad = jnp.full((s,), _INF)
        fwd = jnp.concatenate([d2s, pad])           # row i vs row i+s
        bwd = jnp.concatenate([pad, d2s])           # row i vs row i-s
        fwd_ok = jnp.concatenate([val_s[s:], jnp.zeros((s,), bool)])
        bwd_ok = jnp.concatenate([jnp.zeros((s,), bool), val_s[:-s]])
        fwd_d2 = jnp.where(fwd_ok, fwd, _INF)
        bwd_d2 = jnp.where(bwd_ok, bwd, _INF)
        fwd_prio = jnp.concatenate([prio_s[s:], neg1[:s]])
        bwd_prio = jnp.concatenate([neg1[:s], prio_s[:-s]])
        nbr_d2.append(fwd_d2)
        nbr_d2.append(bwd_d2)
        nbr_id.append(jnp.where(fwd_ok, fwd_prio, -1))
        nbr_id.append(jnp.where(bwd_ok, bwd_prio, -1))
        # Priority rule for dedup: neighbor with smaller original index.
        prior_min = jnp.minimum(
            prior_min, jnp.where(fwd_prio < prio_s, fwd_d2, _INF)
        )
        prior_min = jnp.minimum(
            prior_min, jnp.where(bwd_prio < prio_s, bwd_d2, _INF)
        )

    stack = jnp.stack(nbr_d2, axis=1)               # (m, 2*window)
    ids = jnp.stack(nbr_id, axis=1)
    stack, ids = jax.lax.sort((stack, ids), dimension=1, num_keys=1)
    top, top_id = stack[:, :k], ids[:, :k]
    # Restore original order: prio_s is a permutation of [0, m).
    sorted_back = jax.lax.sort(
        (prio_s, prior_min)
        + tuple(top[:, i] for i in range(k))
        + tuple(top_id[:, i] for i in range(k)),
        dimension=0, num_keys=1,
    )
    return (
        jnp.stack(sorted_back[2:2 + k], axis=1),
        jnp.stack(sorted_back[2 + k:], axis=1),
        sorted_back[1],
    )


@functools.partial(jax.jit, static_argnames=("k", "window"))
def morton_window_nn(cand, cand_mask, existing, ex_mask, radius,
                     k: int = 3, window: int = 16):
    """Fused approximate radius-dedup + k-NN scale init for mapper growth.

    Replaces the brute-force `radius_dedup` + `mean_sq_dist_knn_query` pair
    (reference mapper_utils.py:193-226 faiss dedup + simple-knn distCUDA2,
    gaussian_model.py:251-255): all points (existing submap + candidates)
    are sorted by 30-bit Morton code and each point compares against its
    +-`window` neighbors in sorted order — multi-operand sorts plus
    2*window shifted elementwise passes, ZERO per-index gathers (the
    brute-force pair measured 0.5-1.1 s per mapped frame on the v5e; this
    is ~tens of ms at the same shapes). TWO grid passes (offset + permuted
    axis interleave) merge their neighbor candidates to suppress
    cell-boundary adjacency misses.

    Approximation: a true neighbor > `window` positions away in BOTH Morton
    orders is missed. For dedup that direction is conservative (a missed
    neighbor KEEPS the candidate — extra gaussians, later pruned); for the
    scale init a missed neighbor inflates the k-NN distance estimate
    (bounded in tests/test_knn_losses.py against brute force). Coincident
    points share a Morton cell and sort adjacently, so exact-duplicate
    removal (the Replica-config radius regime) is exact up to `window`
    coincident rows.

    Dedup rule matches the reference's index-priority convention: candidate
    i is dropped when a point with smaller concat priority (any existing
    point, or candidate j < i) lies within `radius`.

    Returns (keep_mask, mean_sq_knn_dist) for the candidate rows.
    """
    na = existing.shape[0]
    pts = jnp.concatenate([existing, cand], axis=0).astype(jnp.float32)
    valid = jnp.concatenate([ex_mask.astype(bool), cand_mask.astype(bool)])

    code_a = morton_codes(pts, valid)
    top_a, id_a, prior_a = _window_pass(pts, valid, code_a, window, k)
    code_b = morton_codes(pts[:, (2, 0, 1)], valid, offset=0.5)
    top_b, id_b, prior_b = _window_pass(pts, valid, code_b, window, k)

    # A neighbor found by BOTH passes appears twice (bitwise-equal d2, same
    # id); sort the merged candidates by (d2, id) and drop adjacent
    # identical PAIRS so the k-NN mean doesn't double-count it — distinct
    # neighbors at exactly equal d2 (regular grids) have different ids and
    # are both kept.
    merged, mids = jax.lax.sort(
        (jnp.concatenate([top_a, top_b], axis=1),
         jnp.concatenate([id_a, id_b], axis=1)),
        dimension=1, num_keys=2,
    )
    dup = jnp.concatenate(
        [jnp.zeros((merged.shape[0], 1), bool),
         (merged[:, 1:] == merged[:, :-1]) & (mids[:, 1:] == mids[:, :-1])],
        axis=1,
    )
    merged = jnp.where(dup, _INF, merged)
    top = jnp.sort(merged, axis=1)[:, :k]
    # Brute-force semantics: missing (INF) slots count as 0 in the mean.
    knn_mean = jnp.mean(jnp.where(top >= _INF * 0.5, 0.0, top), axis=1)
    prior_min = jnp.minimum(prior_a, prior_b)

    keep = cand_mask.astype(bool) & (prior_min[na:] > radius * radius)
    mean_d2 = jnp.where(cand_mask, jnp.maximum(knn_mean[na:], 1e-8), 1e-8)
    return keep, mean_d2


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
