"""TSDF volume fusion as device scatter/gather ops.

Replaces Open3D's ScalableTSDFVolume use in the evaluator
(reference src/evaluation/evaluator.py:196-229: voxel_length 5/512,
sdf_trunc 0.04, RGB-D integration of rendered keyframes).

TPU design: a dense fixed-shape voxel grid; integration of one RGB-D frame
is voxel-major — project every voxel center into the frame, gather depth
(nearest pixel), truncate, weighted running average. One jitted program per
frame; no sparse block allocation (rooms of <=10 m at 1-2 cm voxels fit HBM
comfortably: 512^3 f32 = 512 MB for sdf+weight at 256^3 = 134 MB).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera


class TSDFGrid(NamedTuple):
    sdf: jnp.ndarray      # (X, Y, Z) f32 in [-1, 1]
    weight: jnp.ndarray   # (X, Y, Z) f32
    color: jnp.ndarray    # (X, Y, Z, 3) f32
    origin: jnp.ndarray   # (3,)
    voxel: float
    trunc: float


def make_grid(origin, dims: Tuple[int, int, int], voxel: float,
              trunc: float) -> TSDFGrid:
    return TSDFGrid(
        sdf=jnp.ones(dims),
        weight=jnp.zeros(dims),
        color=jnp.zeros(dims + (3,)),
        origin=jnp.asarray(origin, dtype=jnp.float32),
        voxel=float(voxel),
        trunc=float(trunc),
    )


def grid_bounds_from_trajectory(c2ws: np.ndarray, depth_max: float,
                                voxel: float, max_dim: int = 384):
    """Host helper: bounding box covering the trajectory +- depth range."""
    centers = np.asarray(c2ws)[:, :3, 3]
    lo = centers.min(0) - depth_max
    hi = centers.max(0) + depth_max
    dims = np.minimum(np.ceil((hi - lo) / voxel).astype(int) + 1, max_dim)
    # When the depth_max box exceeds the capped grid, CENTER the grid on the
    # trajectory instead of anchoring at the box corner (an lo-anchored
    # capped grid covers only the corner octant and cuts the scene off).
    span = dims * voxel
    mid = 0.5 * (lo + hi)
    lo = np.where(span < hi - lo, mid - 0.5 * span, lo)
    return lo.astype(np.float32), tuple(int(d) for d in dims)


def grid_bounds_from_depths(depths, c2ws, cam: Camera, voxel: float,
                            margin: float = 0.3, max_dim: int = 512,
                            stride: int = 8):
    """Host helper: tight scene AABB from backprojected sensor depths.

    `grid_bounds_from_trajectory`'s +-depth_max box is ~3x the true scene
    span for a room-scale orbit, so at reference-parity voxels (~1 cm,
    Open3D voxel_length 5/512 in
    /root/reference/src/evaluation/evaluator.py:196-229) the max_dim cap
    would CLIP the scene. Backprojecting a strided subsample of a few real
    depth frames at their (estimated) poses bounds the actual observed
    surface instead, wasting no grid span. `margin` absorbs pose error plus
    the TSDF truncation band.
    """
    pts = []
    for depth, c2w in zip(depths, c2ws):
        d = np.asarray(depth)[::stride, ::stride].astype(np.float64)
        H, W = d.shape
        v, u = np.meshgrid(
            np.arange(0, cam.height, stride, dtype=np.float64)[:H],
            np.arange(0, cam.width, stride, dtype=np.float64)[:W],
            indexing="ij",
        )
        m = d > 0
        if not m.any():
            continue
        z = d[m]
        x = (u[m] - cam.cx) / cam.fx * z
        y = (v[m] - cam.cy) / cam.fy * z
        pc = np.stack([x, y, z], -1)
        c2w = np.asarray(c2w, np.float64)
        pts.append(pc @ c2w[:3, :3].T + c2w[:3, 3])
    if not pts:
        return grid_bounds_from_trajectory(np.asarray(c2ws), 6.0, voxel,
                                           max_dim)
    allp = np.concatenate(pts)
    lo = allp.min(0) - margin
    hi = allp.max(0) + margin
    dims = np.minimum(np.ceil((hi - lo) / voxel).astype(int) + 1, max_dim)
    span = dims * voxel
    mid = 0.5 * (lo + hi)
    lo = np.where(span < hi - lo, mid - 0.5 * span, lo)
    return lo.astype(np.float32), tuple(int(d) for d in dims)


@functools.partial(jax.jit, static_argnames=("cam",))
def integrate(grid: TSDFGrid, color_img, depth_img, w2c, cam: Camera
              ) -> TSDFGrid:
    """Fuse one RGB-D frame into the grid (weighted running average)."""
    dims = grid.sdf.shape
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(dims[0]), jnp.arange(dims[1]), jnp.arange(dims[2]),
        indexing="ij",
    )
    pts = grid.origin + grid.voxel * jnp.stack(
        [ii, jj, kk], axis=-1
    ).astype(jnp.float32)                       # (X, Y, Z, 3)
    p_cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = p_cam[..., 2]
    u = jnp.round(p_cam[..., 0] / jnp.maximum(z, 1e-6) * cam.fx + cam.cx)
    v = jnp.round(p_cam[..., 1] / jnp.maximum(z, 1e-6) * cam.fy + cam.cy)
    inb = (z > 0.05) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    ui = jnp.clip(u, 0, cam.width - 1).astype(jnp.int32)
    vi = jnp.clip(v, 0, cam.height - 1).astype(jnp.int32)
    d = depth_img[vi, ui]
    c = color_img[vi, ui]

    sdf = (d - z) / grid.trunc
    valid = inb & (d > 0) & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)
    w_new = valid.astype(jnp.float32)
    w_tot = grid.weight + w_new
    safe = jnp.maximum(w_tot, 1e-6)
    return grid._replace(
        sdf=jnp.where(valid, (grid.sdf * grid.weight + sdf * w_new) / safe,
                      grid.sdf),
        color=jnp.where(valid[..., None],
                        (grid.color * grid.weight[..., None] + c * w_new[..., None])
                        / safe[..., None], grid.color),
        weight=w_tot,
    )
