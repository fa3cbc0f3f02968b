"""Dense reference splatter: brute force, O(N * H * W).

Used as the golden model for rasterizer tests (SURVEY.md §4 implication:
golden-value tests vs. a tiny dense splatter) and for debugging. Applies the
EXACT same projection/culling/alpha rules as `rasterizer.render`, but
composites every gaussian over every pixel with a global depth sort, so tile
capacity/duplication artifacts are absent by construction.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.camera import Camera
from .rasterizer import RasterConfig, RenderOutput, project_gaussians


def render_dense(
    means3d, quats, log_scales, opacity_logits, colors, w2c,
    cam: Camera, cfg: RasterConfig = RasterConfig(), alive=None,
    respect_tile_span: bool = True,
) -> RenderOutput:
    proj = project_gaussians(
        means3d, quats, log_scales, opacity_logits, w2c, cam, cfg, alive
    )
    n = means3d.shape[0]
    order = jnp.argsort(proj.depth)
    m2 = proj.mean2d[order]
    co = proj.conic[order]
    op = proj.opacity[order]
    rad = proj.radius[order]
    dep = proj.depth[order]
    col = colors[order]

    uu, vv = jnp.meshgrid(
        jnp.arange(cam.width, dtype=jnp.float32),
        jnp.arange(cam.height, dtype=jnp.float32),
    )
    pu = uu.reshape(-1)  # (P,)
    pv = vv.reshape(-1)

    du = pu[None, :] - m2[:, :1]
    dv = pv[None, :] - m2[:, 1:2]
    power = -0.5 * (co[:, :1] * du * du + co[:, 2:3] * dv * dv) - co[:, 1:2] * du * dv
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.where(power <= 0.0, op[:, None] * g, 0.0)

    if respect_tile_span:
        # Match the tiled rasterizer's rectangle culling: a pixel sees the
        # gaussian iff the pixel's tile is inside the gaussian's tile span.
        ts = cfg.tile
        tiles_x = -(-cam.width // ts)
        tiles_y = -(-cam.height // ts)
        tx0 = jnp.clip(jnp.floor((m2[:, 0] - rad) / ts), 0, tiles_x - 1)
        ty0 = jnp.clip(jnp.floor((m2[:, 1] - rad) / ts), 0, tiles_y - 1)
        tx1 = jnp.clip(jnp.floor((m2[:, 0] + rad) / ts), 0, tiles_x - 1)
        ty1 = jnp.clip(jnp.floor((m2[:, 1] + rad) / ts), 0, tiles_y - 1)
        ptx = jnp.floor(pu / ts)
        pty = jnp.floor(pv / ts)
        in_span = (
            (ptx[None, :] >= tx0[:, None]) & (ptx[None, :] <= tx1[:, None])
            & (pty[None, :] >= ty0[:, None]) & (pty[None, :] <= ty1[:, None])
            & (rad[:, None] > 0)
        )
        alpha = jnp.where(in_span, alpha, 0.0)

    alpha = jnp.minimum(alpha, cfg.alpha_max)
    alpha = jnp.where(alpha < cfg.alpha_min, 0.0, alpha)

    log1m = jnp.log1p(-alpha)
    cum_excl = jnp.cumsum(log1m, axis=0) - log1m
    w = alpha * jnp.exp(cum_excl)  # (N, P)

    feat = jnp.concatenate([col, dep[:, None], jnp.ones((n, 1), col.dtype)], -1)
    img = jnp.einsum("kp,kf->pf", w, feat)
    img = img.reshape(cam.height, cam.width, 5)
    radii = jnp.ceil(proj.radius).astype(jnp.int32)
    return RenderOutput(img[..., :3], img[..., 3], img[..., 4], radii)
