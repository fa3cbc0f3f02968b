"""Fixed-capacity 3D Gaussian map state (the reference's GaussianModel).

Design (SURVEY.md §7.1 decision 2): the reference grows/prunes parameter
tensors dynamically via torch concat / index-select
(src/entities/gaussian_model.py:501-583) — poison for XLA. Here a submap is a
capacity-padded pytree with an alive-mask:

  - seeding writes rows into dead slots (dead-first `argsort` allocation,
    one scatter, no reallocation, no recompile);
  - pruning clears alive bits (rows become inert: the rasterizer multiplies
    contributions by `alive`, the optimizer sees zero gradients);
  - Adam moments are zeroed at newly-seeded rows, matching the reference's
    zero-initialized optimizer state for concatenated points
    (gaussian_model.py:535-583).

Also implements the headline **edge-assisted seeding**
(`edge_pair_seeds`, reference add_points_with_edge gaussian_model.py:169-325)
as pure gather/scatter array ops: 3x3 patches around sampled edge pixels,
depth-consistency filter, 2..3-edge-count patch gate, sorted-deduped pixel
pairs, elongated gaussians at pair midpoints with the x-axis rotated onto the
pair direction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils import optim
from .sh import rgb_to_sh


class GaussianParams(NamedTuple):
    xyz: jnp.ndarray            # (N, 3)
    f_dc: jnp.ndarray           # (N, 3) SH degree-0 coefficients
    f_rest: jnp.ndarray         # (N, 15, 3) SH degree 1..3 (zero during SLAM)
    log_scales: jnp.ndarray     # (N, 3)
    quats: jnp.ndarray          # (N, 4) wxyz
    opacity_logits: jnp.ndarray  # (N, 1)


class OptimizedParams(NamedTuple):
    """The SLAM-trainable subset (SH features frozen during mapping)."""

    xyz: jnp.ndarray
    log_scales: jnp.ndarray
    quats: jnp.ndarray
    opacity_logits: jnp.ndarray


class GaussianState(NamedTuple):
    params: GaussianParams
    alive: jnp.ndarray          # (N,) bool
    # Adam moments over the SLAM-trainable subset (xyz, log_scales, quats,
    # opacity_logits — SH features are frozen during mapping, mapper.py:358).
    # Kept across map() calls within a submap like the reference's per-submap
    # torch optimizer; `insert` zeroes the rows of newly seeded gaussians.
    adam: optim.AdamState


def empty_params(capacity: int) -> GaussianParams:
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3)),
        f_dc=jnp.zeros((capacity, 3)),
        f_rest=jnp.zeros((capacity, 15, 3)),
        log_scales=jnp.full((capacity, 3), -10.0),
        quats=jnp.concatenate(
            [jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))], axis=-1
        ),
        opacity_logits=jnp.full((capacity, 1), -10.0),
    )


def opt_subset(params: GaussianParams) -> OptimizedParams:
    return OptimizedParams(params.xyz, params.log_scales, params.quats,
                           params.opacity_logits)


def empty_state(capacity: int) -> GaussianState:
    params = empty_params(capacity)
    return GaussianState(
        params=params,
        alive=jnp.zeros((capacity,), bool),
        adam=optim.adam_init(opt_subset(params)),
    )


def num_alive(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.alive.astype(jnp.int32))


@jax.jit
def insert(state: GaussianState, rows: GaussianParams, valid: jnp.ndarray
           ) -> Tuple[GaussianState, jnp.ndarray]:
    """Write `rows` (M-row pytree) into dead slots; returns (state, n_inserted).

    Valid rows beyond the free capacity are dropped (the reference would grow
    without bound; our capacity is the documented budget `mapping.max_gaussians`).
    """
    capacity = state.alive.shape[0]
    # Stable sort: dead slots first, in index order.
    slot_order = jnp.argsort(state.alive.astype(jnp.int32), stable=True)
    num_dead = capacity - jnp.sum(state.alive.astype(jnp.int32))

    k = jnp.cumsum(valid.astype(jnp.int32)) - 1          # rank among valid rows
    ok = valid & (k < num_dead)
    dest = jnp.where(ok, slot_order[jnp.clip(k, 0, capacity - 1)], capacity)

    def scatter(slot_arr, row_arr):
        return slot_arr.at[dest].set(row_arr, mode="drop")

    new_params = jax.tree.map(scatter, state.params, rows)
    new_alive = state.alive.at[dest].set(True, mode="drop")
    new_adam = optim.reset_slots(state.adam, jnp.clip(dest, 0, capacity), ok)
    return (
        GaussianState(new_params, new_alive, new_adam),
        jnp.sum(ok.astype(jnp.int32)),
    )


@jax.jit
def prune(state: GaussianState, kill: jnp.ndarray) -> GaussianState:
    """Clear alive bits (reference prune_points gaussian_model.py:501-533)."""
    return state._replace(alive=state.alive & ~kill)


def point_rows(xyz: jnp.ndarray, rgb: jnp.ndarray, dist2: jnp.ndarray,
               opacity: jnp.ndarray) -> GaussianParams:
    """Plain point-gaussian rows: identity rotation, isotropic sqrt(knn-dist2)
    scale (reference add_points gaussian_model.py:141-152).

    rgb in [0,1]; opacity per-row pre-sigmoid probability.
    """
    m = xyz.shape[0]
    logit = jnp.log(opacity / (1.0 - opacity))
    return GaussianParams(
        xyz=xyz,
        f_dc=rgb_to_sh(rgb),
        f_rest=jnp.zeros((m, 15, 3)),
        log_scales=jnp.tile(
            0.5 * jnp.log(jnp.maximum(dist2, 1e-7))[:, None], (1, 3)
        ),
        quats=jnp.concatenate([jnp.ones((m, 1)), jnp.zeros((m, 3))], -1),
        opacity_logits=logit[:, None] if logit.ndim == 1 else logit,
    )


def _quat_from_x_axis(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Quaternion rotating the x-axis onto unit vectors v (..., 3).

    Reference formula (axis = x cross v, angle = acos(x . v)),
    gaussian_model.py:266-277, with the parallel-vector fallback.
    """
    x = jnp.array([1.0, 0.0, 0.0], v.dtype)
    cross = jnp.stack(
        [jnp.zeros_like(v[..., 0]), -v[..., 2], v[..., 1]], axis=-1
    )  # x cross v
    dot = jnp.clip(v[..., 0], -1.0, 1.0)
    angle = jnp.arccos(dot)
    norm = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    axis = jnp.where(norm > eps, cross / jnp.maximum(norm, eps), x)
    half = angle / 2.0
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("height", "width"))
def edge_pair_seeds(
    sample_ids: jnp.ndarray,    # (S,) flat pixel ids (row*W + col)
    sample_valid: jnp.ndarray,  # (S,) bool
    edge: jnp.ndarray,          # (H, W) bool edge image
    depth: jnp.ndarray,         # (H, W) f32
    points: jnp.ndarray,        # (H*W, 3) backprojected world points
    colors: jnp.ndarray,        # (H*W, 3) rgb in [0,1]
    height: int,
    width: int,
    depth_thres: float = 0.025,
):
    """Edge-gaussian candidates from sampled edge pixels.

    Returns:
      pair_lo, pair_hi: (S*8,) flat pixel ids of deduped pairs
      pair_valid:       (S*8,) bool
      xyz, rgb, log_scales, quats: per-pair gaussian attributes (S*8, ...)
      member: (S,) bool — sample ids that participate in some pair (their
              point-gaussian opacity drops to 0.1, reference :283-284)
    """
    s = sample_ids.shape[0]
    edge_f = edge.reshape(-1)
    depth_f = depth.reshape(-1)

    rows = sample_ids // width
    cols = sample_ids % width
    is_edge_sample = sample_valid & edge_f[sample_ids]

    # 3x3 patch neighbors (8 offsets, center excluded).
    dr = jnp.array([-1, -1, -1, 0, 0, 1, 1, 1], jnp.int32)
    dc = jnp.array([-1, 0, 1, -1, 1, -1, 0, 1], jnp.int32)
    nr = rows[:, None] + dr[None, :]
    nc = cols[:, None] + dc[None, :]
    inb = (nr >= 0) & (nr < height) & (nc >= 0) & (nc < width)
    nid = jnp.clip(nr, 0, height - 1) * width + jnp.clip(nc, 0, width - 1)

    d_mid = depth_f[sample_ids][:, None]
    nbr_edge = (
        inb
        & edge_f[nid]
        & (jnp.abs(depth_f[nid] - d_mid) < depth_thres)
        & is_edge_sample[:, None]
    )
    # Patch gate: 1 < count < 4 where count includes the (always-consistent)
    # center pixel (reference :208-209) => 1..2 valid neighbors.
    cnt = jnp.sum(nbr_edge, axis=1) + is_edge_sample.astype(jnp.int32)
    good = (cnt > 1) & (cnt < 4)
    pair_ok = nbr_edge & good[:, None]

    center = jnp.broadcast_to(sample_ids[:, None], nid.shape)
    lo = jnp.minimum(center, nid).reshape(-1)
    hi = jnp.maximum(center, nid).reshape(-1)
    ok = pair_ok.reshape(-1)

    # Dedup: lexicographic sort on (ok_last, lo, hi); equal-neighbor rows are
    # duplicates (a pair appears twice when both endpoints were sampled).
    sort_lo = jnp.where(ok, lo, jnp.iinfo(jnp.int32).max)
    sort_hi = jnp.where(ok, hi, jnp.iinfo(jnp.int32).max)
    s_lo, s_hi, s_ok = jax.lax.sort(
        (sort_lo, sort_hi, ok.astype(jnp.int32)), dimension=0, num_keys=2
    )
    dup = jnp.concatenate(
        [jnp.array([False]), (s_lo[1:] == s_lo[:-1]) & (s_hi[1:] == s_hi[:-1])]
    )
    pair_valid = (s_ok == 1) & ~dup
    safe_lo = jnp.clip(s_lo, 0, height * width - 1)
    safe_hi = jnp.clip(s_hi, 0, height * width - 1)

    p1 = points[safe_lo]
    p2 = points[safe_hi]
    vec = p2 - p1
    dist = jnp.linalg.norm(vec, axis=-1)
    unit = vec / jnp.maximum(dist, 1e-8)[:, None]

    xyz = 0.5 * (p1 + p2)
    rgb = 0.5 * (colors[safe_lo] + colors[safe_hi])
    # Elongated scale (1.25 d, 0.5 d, 0.5 d), reference :258-264.
    d_safe = jnp.maximum(dist, 1e-6)
    log_scales = jnp.log(
        jnp.stack([1.25 * d_safe, 0.5 * d_safe, 0.5 * d_safe], axis=-1)
    )
    quats = _quat_from_x_axis(unit)

    # Membership of sample ids in any pair endpoint (reference isin, :284).
    member_px = jnp.zeros((height * width,), bool)
    drop_lo = jnp.where(pair_valid, safe_lo, height * width)
    drop_hi = jnp.where(pair_valid, safe_hi, height * width)
    member_px = member_px.at[drop_lo].set(True, mode="drop")
    member_px = member_px.at[drop_hi].set(True, mode="drop")
    member = member_px[sample_ids] & sample_valid

    return s_lo, s_hi, pair_valid, xyz, rgb, log_scales, quats, member


def edge_rows(xyz, rgb, log_scales, quats) -> GaussianParams:
    """Assemble edge-gaussian rows (opacity 0.5, reference :283)."""
    m = xyz.shape[0]
    return GaussianParams(
        xyz=xyz,
        f_dc=rgb_to_sh(rgb),
        f_rest=jnp.zeros((m, 15, 3)),
        log_scales=log_scales,
        quats=quats,
        opacity_logits=jnp.zeros((m, 1)),  # sigmoid(0) = 0.5
    )


def concat_rows(a: GaussianParams, b: GaussianParams) -> GaussianParams:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


# ---------------------------------------------------------------------------
# Bucketed compaction
# ---------------------------------------------------------------------------

_BUCKETS = (1 << 13, 1 << 14, 1 << 15, 1 << 16, 1 << 17, 1 << 18, 1 << 19)


def bucket_for(n: int, cap: int) -> int:
    """Smallest static bucket >= n, clamped to the configured capacity."""
    bucket = next((b for b in _BUCKETS if b >= max(n, 1)), cap)
    return min(bucket, cap)


@functools.partial(jax.jit, static_argnames=("new_capacity",))
def _expand_state_jit(state: GaussianState, new_capacity: int) -> GaussianState:
    old = state.alive.shape[0]
    pad_params = empty_params(new_capacity - old)

    def cat(a, b):
        return jnp.concatenate([a, b], axis=0)

    params = jax.tree.map(cat, state.params, pad_params)
    alive = cat(state.alive, jnp.zeros((new_capacity - old,), bool))
    pad_opt = opt_subset(pad_params)
    zeros = jax.tree.map(jnp.zeros_like, pad_opt)
    adam = optim.AdamState(
        state.adam.step,
        jax.tree.map(cat, state.adam.mu, zeros),
        jax.tree.map(cat, state.adam.nu, zeros),
        jax.tree.map(cat, state.adam.vmax, zeros),
    )
    return GaussianState(params, alive, adam)


def expand_state(state: GaussianState, new_capacity: int) -> GaussianState:
    """Grow the submap state to a larger static capacity (adaptive-capacity
    submaps: the state lives at the smallest bucket that fits its alive
    count + incoming rows, so every per-frame program — tracking render,
    seeding, optimization — scales with the ACTUAL map size instead of the
    max_gaussians budget, with no per-frame compaction gathers)."""
    if new_capacity <= state.alive.shape[0]:
        return state
    return _expand_state_jit(state, new_capacity)


@functools.partial(jax.jit, static_argnames=("m",))
def _gather_alive(params: GaussianParams, alive: jnp.ndarray, m: int):
    cap = alive.shape[0]
    idx = jnp.nonzero(alive, size=m, fill_value=cap)[0].astype(jnp.int32)
    safe = jnp.clip(idx, 0, cap - 1)
    packed = jax.tree.map(lambda x: x[safe], params)
    packed_alive = idx < cap
    return packed, packed_alive, idx


def compact_view(state: GaussianState, n_alive: int):
    """Pack alive gaussians into the smallest static bucket >= n_alive.

    Rendering cost on this TPU scales with the ENTRY COUNT, which scales with
    the array length fed to the rasterizer — a fixed-capacity submap with few
    alive gaussians would otherwise pay full-capacity gather/scatter/sort
    prices every iteration (PERF.md: per-index costs). Buckets keep the
    number of distinct compiled shapes small (one per power of two).

    Read-only view: callers must not write through it (tracker / LC use).
    Returns (params, alive) sized to the bucket.
    """
    cap = state.alive.shape[0]
    bucket = next((b for b in _BUCKETS if b >= max(n_alive, 1)), cap)
    bucket = min(bucket, cap)
    if bucket >= cap:
        return state.params, state.alive
    packed, packed_alive, _ = _gather_alive(state.params, state.alive, bucket)
    return packed, packed_alive


@functools.partial(jax.jit, static_argnames=("m",))
def _compact_state_jit(state: GaussianState, m: int):
    cap = state.alive.shape[0]
    idx = jnp.nonzero(state.alive, size=m, fill_value=cap)[0].astype(jnp.int32)
    safe = jnp.clip(idx, 0, cap - 1)
    packed_params = jax.tree.map(lambda x: x[safe], state.params)
    packed_adam = optim.AdamState(
        state.adam.step,
        jax.tree.map(lambda x: x[safe], state.adam.mu),
        jax.tree.map(lambda x: x[safe], state.adam.nu),
        jax.tree.map(lambda x: x[safe], state.adam.vmax),
    )
    packed = GaussianState(packed_params, idx < cap, packed_adam)
    return packed, idx


def compact_state(state: GaussianState, n_alive: int):
    """Writable compaction: pack params + alive + Adam moments into a bucket.

    Use with `scatter_state` to write optimization results back. Returns
    (packed GaussianState, idx) or (state, None) when no bucket is smaller
    than the capacity.
    """
    cap = state.alive.shape[0]
    bucket = next((b for b in _BUCKETS if b >= max(n_alive, 1)), cap)
    bucket = min(bucket, cap)
    if bucket >= cap:
        return state, None
    return _compact_state_jit(state, bucket)


@jax.jit
def scatter_state(full: GaussianState, packed: GaussianState,
                  idx: jnp.ndarray) -> GaussianState:
    """Write a compacted state's rows back into the full-capacity state.

    Sentinel indices (== capacity) drop. Rows pruned inside the packed
    optimization clear their alive bits in the full state.
    """
    def sc(x, rows):
        return x.at[idx].set(rows, mode="drop")

    params = jax.tree.map(sc, full.params, packed.params)
    alive = full.alive.at[idx].set(packed.alive, mode="drop")
    adam = optim.AdamState(
        packed.adam.step,
        jax.tree.map(sc, full.adam.mu, packed.adam.mu),
        jax.tree.map(sc, full.adam.nu, packed.adam.nu),
        jax.tree.map(sc, full.adam.vmax, packed.adam.vmax),
    )
    return GaussianState(params, alive, adam)
