"""Pinhole camera model, pyramids of intrinsics, and (back)projection.

Replaces the reference's camera plumbing:
  - `Camera{fx,fy,cx,cy,w,h}` scaled by 1/2^lvl (VO/datastructures/camerapyr.h:111-128),
  - OpenGL-style render settings `get_render_settings` (src/utils/utils.py:77-117),
  - `getWorld2View2` / `getProjectionMatrix2` (src/utils/graphics_utils.py:73-97),
  - backprojection `create_point_cloud` (src/utils/mapper_utils.py:305-336).

TPU-first design note: we never build OpenGL NDC matrices. The rasterizer
projects directly with (fx, fy, cx, cy) — the OpenGL detour in the reference
exists only because the CUDA kernel inherited graphics conventions.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    """Static pinhole intrinsics. Members are Python floats/ints so a Camera

    can be a static (hashable) argument to jitted functions.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @staticmethod
    def from_intrinsics(K, width: int, height: int) -> "Camera":
        K = np.asarray(K)
        return Camera(float(K[0, 0]), float(K[1, 1]), float(K[0, 2]), float(K[1, 2]),
                      int(width), int(height))

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    def scaled(self, level: int) -> "Camera":
        """Intrinsics at pyramid level `level` (each level halves resolution).

        Matches VO/datastructures/camerapyr.h:111-128: fx,fy,cx,cy scale by
        1/2^lvl (with the half-pixel convention cx' = (cx + 0.5)/2 - 0.5).
        """
        s = 1.0 / (2**level)
        return Camera(
            self.fx * s,
            self.fy * s,
            (self.cx + 0.5) * s - 0.5,
            (self.cy + 0.5) * s - 0.5,
            self.width >> level,
            self.height >> level,
        )

    def crop(self, edge: int) -> "Camera":
        """`crop_edge` adjustment (reference datasets.py:34-39)."""
        return Camera(
            self.fx, self.fy, self.cx - edge, self.cy - edge,
            self.width - 2 * edge, self.height - 2 * edge,
        )


def project(cam: Camera, pts_cam: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame points (..., 3) -> pixel coords (..., 2) and depth (...,)."""
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.maximum(z, 1e-8)
    u = pts_cam[..., 0] * inv_z * cam.fx + cam.cx
    v = pts_cam[..., 1] * inv_z * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1), z


def pixel_rays(cam: Camera, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 3) unit-depth rays ((u-cx)/fx, (v-cy)/fy, 1).

    Equivalent to the precomputed normalized-ray template of
    VO/datastructures/camerapyr.h:170-183.
    """
    u = jnp.arange(cam.width, dtype=dtype)
    v = jnp.arange(cam.height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    x = (uu - cam.cx) / cam.fx
    y = (vv - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def backproject(cam: Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """Depth (H, W) -> camera-frame points (H, W, 3).

    Reference: `create_point_cloud` (src/utils/mapper_utils.py:305-336).
    """
    return pixel_rays(cam, depth.dtype) * depth[..., None]


def w2c_from_c2w(c2w: jnp.ndarray) -> jnp.ndarray:
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    w2c = jnp.zeros_like(c2w)
    w2c = w2c.at[..., :3, :3].set(Rt)
    w2c = w2c.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    w2c = w2c.at[..., 3, 3].set(1.0)
    return w2c
