"""Per-frame edge pyramid construction (on-device).

Replaces `ImgPyramidRGBD` (VO/datastructures/imgpyramidrgbd.{h,cpp}):
  - gray pyrDown / hole-aware depth subsample per level (:171-231, h:198-245);
  - Canny edges per level (:183) with the low-density **edge fill-in** from
    the finer level (BMVC17 trick, :102-168);
  - fixed-capacity 3D edge point clouds per level (backprojection with
    DEPTH_MIN/MAX gates, :200-227) — capacity-padded with validity masks and
    a deterministic hash-priority subsample instead of dynamic counts;
  - keyframe promotion = distance transform + gradient acceleration structure
    per level (`makeKeyframe`, :234-280) via `ops.image.dt_with_gradients`.

One jitted function per pyramid level shape; the host assembles the level
list (shapes differ per level, so per-level jits are the natural unit).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..ops.image import (canny, depth_pyr_down, dt_with_gradients, pyr_down,
                         rgb_to_gray)


class PyramidLevel(NamedTuple):
    gray: jnp.ndarray     # (H, W) f32 [0, 255]
    depth: jnp.ndarray    # (H, W) f32 meters (0 = hole)
    edges: jnp.ndarray    # (H, W) bool
    pts: jnp.ndarray      # (P, 3) camera-frame 3D edge points (padded)
    pts_valid: jnp.ndarray  # (P,) bool
    edge_count: jnp.ndarray  # () int32


class KeyframeLevel(NamedTuple):
    gx: jnp.ndarray
    gy: jnp.ndarray
    dt: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("cam", "max_pts", "low", "high", "depth_min", "depth_max"),
)
def _build_level(
    gray, depth, finer_edges_or_none, cam: Camera, max_pts: int,
    low: float, high: float, depth_min: float, depth_max: float,
    fill_percentage: float = 0.3,
):
    edges = canny(gray, low, high)
    if finer_edges_or_none is not None:
        # Edge fill-in: if this level lost too many edges relative to the
        # finer level (2x2-OR downsampled), union them in (reference
        # imgpyramidrgbd.cpp:102-168,190-197).
        fe = finer_edges_or_none
        h2, w2 = edges.shape
        fe_ds = (
            fe[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).any(axis=(1, 3))
        )
        need_fill = jnp.sum(edges) < fill_percentage * jnp.sum(fe_ds)
        edges = jnp.where(need_fill, edges | fe_ds, edges)

    valid_depth = (depth > depth_min) & (depth < depth_max)
    usable = edges & valid_depth
    flat = usable.reshape(-1)
    edge_count = jnp.sum(flat.astype(jnp.int32))

    # Deterministic hash priority -> uniform-ish subset of edge pixels.
    n = flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    prio = (idx * jnp.uint32(2654435761)).astype(jnp.uint32)
    prio = jnp.where(flat, prio, jnp.uint32(0xFFFFFFFF))
    # Smallest-priority edge pixels win.
    order = jnp.argsort(prio)
    sel = order[:max_pts].astype(jnp.int32)
    sel_valid = flat[sel]

    v = sel // cam.width
    u = sel % cam.width
    z = depth.reshape(-1)[sel]
    x = (u.astype(jnp.float32) - cam.cx) / cam.fx * z
    y = (v.astype(jnp.float32) - cam.cy) / cam.fy * z
    pts = jnp.stack([x, y, z], axis=-1)
    return PyramidLevel(gray, depth, edges, pts, sel_valid, edge_count)


@functools.partial(jax.jit, static_argnames=())
def _downsample(gray, depth):
    return pyr_down(gray), depth_pyr_down(depth)


class FramePyramid(NamedTuple):
    levels: tuple  # of PyramidLevel, finest first
    timestamp: float


@functools.partial(
    jax.jit,
    static_argnames=("cam", "n_levels", "max_pts", "low", "high",
                     "depth_min", "depth_max"),
)
def _build_all_levels(gray, d, cam: Camera, n_levels: int, max_pts: int,
                      low: float, high: float, depth_min: float,
                      depth_max: float):
    levels: List[PyramidLevel] = []
    finer_edges = None
    for lvl in range(n_levels):
        cam_l = cam.scaled(lvl)
        cap = max(max_pts >> lvl, 256)
        level = _build_level(
            gray, d, finer_edges, cam_l, cap, low, high, depth_min, depth_max
        )
        levels.append(level)
        finer_edges = level.edges
        if lvl + 1 < n_levels:
            gray, d = _downsample(gray, d)
    return tuple(levels)


def build_pyramid(
    rgb_u8, depth, cam: Camera, n_levels: int, max_pts: int,
    low: float, high: float, depth_min: float, depth_max: float,
    timestamp: float = 0.0,
) -> FramePyramid:
    """All levels assembled in ONE device program (per-level programs cost
    a ~30 ms tunnel round trip each on this host)."""
    gray = rgb_to_gray(jnp.asarray(rgb_u8).astype(jnp.float32))
    d = jnp.asarray(depth)
    levels = _build_all_levels(gray, d, cam, n_levels, max_pts, low, high,
                               depth_min, depth_max)
    return FramePyramid(tuple(levels), timestamp)


@functools.partial(jax.jit, static_argnames=("window",))
def _kf_level(edges, window: int):
    gx, gy, dt = dt_with_gradients(edges, window)
    return KeyframeLevel(gx, gy, dt)


@functools.partial(jax.jit, static_argnames=("window",))
def _kf_all_levels(edges_tuple, window: int):
    return tuple(_kf_level(e, window) for e in edges_tuple)


def make_keyframe(pyr: FramePyramid, window: int = 32) -> tuple:
    """DT + gradient structure per level (`makeKeyframe`), one program."""
    return _kf_all_levels(tuple(lv.edges for lv in pyr.levels), window)
