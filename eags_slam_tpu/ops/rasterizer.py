"""Differentiable tile-binned 3D Gaussian splat rasterizer (TPU-native).

One kernel family replaces BOTH CUDA rasterizers of the reference
(SURVEY.md §2.3):
  - `gaussian_rasterizer` (VladimirYugay fork): forward+backward splatting
    returning (color, depth, alpha, radii), gradients to all gaussian params
    (reference call site src/utils/utils.py:120-186);
  - `diff-gaussian-rasterization-w-pose` (MonoGS): same + camera-pose
    gradients (reference src/gsr/renderer.py:117-142). Here pose gradients are
    free: the world->camera transform is part of the traced JAX graph, so
    `jax.grad` w.r.t. `w2c` (or a pose parameterization upstream of it) works
    without a dedicated kernel.

Pipeline (all static shapes, fully jit-able):
  1. EWA projection: 3D cov = R S S^T R^T -> 2D conic via the perspective
     Jacobian (+0.3 px low-pass, as in 3DGS), written as elementwise row
     algebra (batched tiny matmuls lower poorly on TPU).
  2. Tile binning: each gaussian is duplicated into <= dup_side^2 covered
     tiles; entries are sorted with `lax.sort` on (tile_id, depth_bits) —
     depth bits use the monotone float32->int32 bitcast, so one lexicographic
     sort yields per-tile front-to-back order. Per-tile segments come from
     searchsorted.
  3. Compositing, two backends behind `RasterConfig.backend`:
     - "pallas" (TPU): grouped-grid kernel with count-bounded chunks, early
       termination, and an analytic reverse-replay backward
       (rasterizer_pallas.py); entry layout built via int32-id scatter + one
       attr-major gather with a hand-written scatter-add VJP (per-index
       gather/scatter pricing on TPU — see PERF.md);
     - "jnp" (CPU tests / golden reference): a fixed-capacity per-tile index
       table, vmap over tiles, `jax.checkpoint`-ed `lax.scan` over chunks.

Additionally `freeze_binning`/`render_frozen` provide the tracking fast path:
binning + per-entry 3D attribute gather once per frame, per-iteration
elementwise reprojection (pose gradients via the compositing kernel's VJP).

Capacity semantics: entries beyond `tile_capacity`/`max_per_tile` are the
*deepest* in that tile (sorted order) and are dropped — occluded in practice.
Radii are clamped so a gaussian spans at most `dup_side`^2 tiles; the
isotropic regularizer + pruning of the SLAM loop keep scales below this cap.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera


class RasterConfig(NamedTuple):
    tile: int = 16            # square tile side in pixels
    dup_side: int = 4         # gaussian may cover up to dup_side^2 tiles
    tile_capacity: int = 1024  # jnp backend: max gaussians composited per tile
    chunk: int = 64           # gaussians per compositing step
    near: float = 0.2         # z culling plane (matches CUDA raster near)
    alpha_min: float = 1.0 / 255.0
    alpha_max: float = 0.99
    sigma_clip: float = 3.0   # radius = sigma_clip * sqrt(lambda_max)
    low_pass: float = 0.3     # 2D covariance dilation (3DGS convention)
    backend: str = "auto"     # auto | sorted | pallas | jnp (auto: sorted on TPU)
    max_per_tile: int = 8192  # pallas backend: safety cap per tile
    group: int = 16           # pallas backend: tiles per grid program
    entry_cap_factor: int = 4  # pallas: total entry budget = factor * N
    seg_cap: int = 1024       # sorted backend: per-band segment capacity
    bands: int = 3            # sorted backend: center-tile neighborhood side
    kernel_bf16: bool = False  # sorted backend: bf16 triangular matmuls
    kernel_quadform: bool = False  # sorted backend: MXU quadform exponent
    rmw_window: bool = False  # sorted bwd: retire-on-advance windowed rmw


def apply_rcfg_env(cfg: "RasterConfig") -> "RasterConfig":
    """Return cfg with `EAGS_RCFG` comma-separated overrides applied
    (e.g. EAGS_RCFG="tile=64,seg_cap=2048,group=4,dup_side=2").

    Keys map 1:1 onto RasterConfig fields; ints/floats/bools parse by the
    field's current type, unknown keys raise (typo protection). Lets a
    bench/sweep run A/B kernel-shape knobs without config edits — used by
    scripts/map_bench.py and GaussianSLAM (so a full bench can run a
    seg_sweep winner directly)."""
    import os

    spec = os.environ.get("EAGS_RCFG", "").strip()
    if not spec:
        return cfg
    kv = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in cfg._fields:
            raise KeyError(f"EAGS_RCFG: unknown RasterConfig field {k!r}")
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            kv[k] = v.strip().lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            kv[k] = int(v)
        elif isinstance(cur, float):
            kv[k] = float(v)
        else:
            kv[k] = v.strip()
    print(f"EAGS_RCFG overrides: {kv}")
    return cfg._replace(**kv)


class RenderOutput(NamedTuple):
    color: jnp.ndarray   # (H, W, 3)
    depth: jnp.ndarray   # (H, W)
    alpha: jnp.ndarray   # (H, W)
    radii: jnp.ndarray   # (N,) int32, 0 for culled gaussians


class _Projected(NamedTuple):
    mean2d: jnp.ndarray  # (N, 2)
    conic: jnp.ndarray   # (N, 3) upper-triangular inverse 2D covariance
    depth: jnp.ndarray   # (N,)
    radius: jnp.ndarray  # (N,) float, 0 for culled
    opacity: jnp.ndarray  # (N,) post-sigmoid


def _quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    # Local copy to keep the rasterizer self-contained for jit caching.
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def project_gaussians(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    opacity_logits: jnp.ndarray,
    w2c: jnp.ndarray,
    cam: Camera,
    cfg: RasterConfig,
    alive: Optional[jnp.ndarray] = None,
    radius_cap: Optional[float] = None,
) -> _Projected:
    """EWA projection of 3D gaussians to image-space conics."""
    R_cw = w2c[:3, :3]
    t_cw = w2c[:3, 3]
    p_cam = means3d @ R_cw.T + t_cw  # (N, 3)
    z = p_cam[..., 2]
    in_front = z > cfg.near
    zc = jnp.maximum(z, cfg.near)

    inv_z = 1.0 / zc
    u = p_cam[..., 0] * inv_z * cam.fx + cam.cx
    v = p_cam[..., 1] * inv_z * cam.fy + cam.cy
    mean2d = jnp.stack([u, v], axis=-1)

    # 3D covariance in world frame: R S S^T R^T, then the EWA 2D covariance
    # J W cov3d W^T J^T. Written as purely ELEMENTWISE ops over N: batched
    # (N, 3, 3) matmuls lower terribly on TPU (tiny MXU tiles); the explicit
    # row algebra is ~60 VPU flops per gaussian.
    S = jnp.exp(log_scales)                            # (N, 3)
    Rg = _quat_to_rotmat(quats)                        # (N, 3, 3)
    M = Rg * S[..., None, :]                           # rows m0, m1, m2

    # Rows of A = Wc @ M (camera-frame scaled axes): a_i = R_cw row_i . M
    def rot_rows(mat_rows):
        # mat_rows: (N, 3, 3); returns (N, 3, 3) = R_cw @ mat_rows
        return jnp.einsum("ij,njk->nik", R_cw, mat_rows)

    A = rot_rows(M)                                    # (N, 3, 3)

    # Perspective Jacobian rows (with 3DGS's frustum clamping of x/z, y/z).
    lim_x = 1.3 * (0.5 * cam.width / cam.fx)
    lim_y = 1.3 * (0.5 * cam.height / cam.fy)
    tx = jnp.clip(p_cam[..., 0] * inv_z, -lim_x, lim_x) * zc
    ty = jnp.clip(p_cam[..., 1] * inv_z, -lim_y, lim_y) * zc
    j00 = cam.fx * inv_z
    j02 = -cam.fx * tx * inv_z * inv_z
    j11 = cam.fy * inv_z
    j12 = -cam.fy * ty * inv_z * inv_z

    # B = J @ A: (N, 2, 3) with rows b0 = j00 a0 + j02 a2, b1 = j11 a1 + j12 a2.
    b0 = j00[:, None] * A[:, 0, :] + j02[:, None] * A[:, 2, :]
    b1 = j11[:, None] * A[:, 1, :] + j12[:, None] * A[:, 2, :]
    # cov2d = B B^T.
    a = jnp.sum(b0 * b0, axis=-1) + cfg.low_pass
    b = jnp.sum(b0 * b1, axis=-1)
    c = jnp.sum(b1 * b1, axis=-1) + cfg.low_pass

    det = a * c - b * b
    det = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    opacity = jax.nn.sigmoid(opacity_logits.reshape(-1))
    # Opacity-aware EXACT footprint: beyond r_cut = sqrt(2 ln(op/a_min)) σ
    # the per-pixel alpha = op * exp(-q/2) is below alpha_min, which every
    # compositor here zeroes EXACTLY — value AND gradient (alpha < ALPHA_MIN
    # -> 0 in the kernels; d_alpha masked on alpha > 0 in the backward). So
    # candidates past that iso-contour are pure dead work: tighter binning,
    # identical image and grads. The CUDA reference bins a fixed 3σ
    # footprint regardless of opacity (src/utils/utils.py:149-186); this
    # matters most mid-optimization, when decaying gaussians (opacity ->
    # pruning threshold) otherwise keep full-size footprints. The 1/255
    # floor matches the kernels' compiled ALPHA_MIN.
    a_min = min(float(cfg.alpha_min), 1.0 / 255.0)
    r_cut = jnp.sqrt(2.0 * jnp.log(jnp.maximum(opacity / a_min, 1.0 + 1e-6)))
    radius = jnp.minimum(cfg.sigma_clip, r_cut) * jnp.sqrt(lam_max)
    # Cap so the span fits the duplication budget (see module docstring).
    if radius_cap is None:
        radius_cap = 0.5 * cfg.dup_side * cfg.tile - 1.0
    radius = jnp.minimum(radius, radius_cap)
    visible = (
        in_front
        & (u + radius > 0) & (u - radius < cam.width)
        & (v + radius > 0) & (v - radius < cam.height)
        & (opacity > cfg.alpha_min)
    )
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius, 0.0)
    return _Projected(mean2d, conic, z, radius, opacity)


def _bin_entries(proj: _Projected, cam: Camera, cfg: RasterConfig,
                 margin: float = 0.0):
    """Duplicate gaussians into covered tiles and sort by (tile, depth).

    Returns (s_tile, s_gauss, start, count): sorted entry arrays of length
    E = N * dup_side^2 (invalid entries hold tile sentinel and sort last),
    plus per-tile segment starts/counts.
    """
    n = proj.mean2d.shape[0]
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    d = cfg.dup_side

    u, v = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = jnp.where(proj.radius > 0, proj.radius + margin, 0.0)
    tx0 = jnp.clip(jnp.floor((u - r) / cfg.tile), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((v - r) / cfg.tile), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((u + r) / cfg.tile), 0, tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((v + r) / cfg.tile), 0, tiles_y - 1).astype(jnp.int32)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1

    k = jnp.arange(d * d, dtype=jnp.int32)
    dx = (k % d)[None, :]
    dy = (k // d)[None, :]
    valid = (
        (proj.radius[:, None] > 0.0) & (dx < span_x[:, None]) & (dy < span_y[:, None])
    )
    tile_id = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
    tile_id = jnp.where(valid, tile_id, num_tiles)  # sentinel sorts last

    # Monotone float->int for positive depths; invalid entries get int32 max.
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-6), jnp.int32
    )
    depth_key = jnp.broadcast_to(depth_bits[:, None], tile_id.shape)
    depth_key = jnp.where(valid, depth_key, jnp.iinfo(jnp.int32).max)

    flat_tile = tile_id.reshape(-1)
    flat_depth = depth_key.reshape(-1)
    e = flat_tile.shape[0]
    flat_id = jnp.arange(e, dtype=jnp.int32)  # presort entry id: gauss*d^2+k
    s_tile, _, s_flat = jax.lax.sort(
        (flat_tile, flat_depth, flat_id), dimension=0, num_keys=2
    )
    s_gauss = s_flat // (d * d)

    start = jnp.searchsorted(s_tile, jnp.arange(num_tiles, dtype=jnp.int32))
    end = jnp.searchsorted(
        s_tile, jnp.arange(1, num_tiles + 1, dtype=jnp.int32)
    )
    count = (end - start).astype(jnp.int32)
    return s_tile, s_gauss, s_flat, start.astype(jnp.int32), count


def _build_tile_table(
    proj: _Projected, cam: Camera, cfg: RasterConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sorted fixed-capacity per-tile gaussian index table (jnp backend).

    Returns (tile_gauss (T, C) int32 indices, tile_count (T,) int32). Invalid
    slots hold index N (one-past-end sentinel; callers pad gathers).
    """
    n = proj.mean2d.shape[0]
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    s_tile, s_gauss, _, start, count = _bin_entries(proj, cam, cfg)

    e = s_tile.shape[0]
    pos = jnp.arange(e, dtype=jnp.int32) - start[jnp.clip(s_tile, 0, num_tiles - 1)]
    ok = (s_tile < num_tiles) & (pos < cfg.tile_capacity)
    scat_tile = jnp.where(ok, s_tile, num_tiles)
    scat_pos = jnp.where(ok, pos, 0)
    table = jnp.full((num_tiles + 1, cfg.tile_capacity), n, dtype=jnp.int32)
    table = table.at[scat_tile, scat_pos].set(jnp.where(ok, s_gauss, n))
    return table[:num_tiles], jnp.minimum(count, cfg.tile_capacity)


@jax.custom_vjp
def _gather_entries(attrs_t, slot_gid):
    """entries_t (NCH, Epad) = attrs_t[:, slot_gid] with a hand-written VJP.

    XLA's autodiff of this gather emits a row-granular scatter that measures
    ~10x slower than the column-layout scatter-add used here (TPU gathers and
    scatters cost per-INDEX, ~40ns each, independent of row width — so the
    (NCH, .) column orientation with one index list is the cheap shape).
    Empty slots carry the sentinel column (last), which accumulates their
    zero cotangents harmlessly and is dropped.
    """
    return attrs_t[:, slot_gid]


def _gather_entries_fwd(attrs_t, slot_gid):
    return attrs_t[:, slot_gid], (slot_gid, attrs_t.shape)


def _gather_entries_bwd(res, g):
    slot_gid, shape = res
    d_attrs = jnp.zeros(shape, g.dtype).at[:, slot_gid].add(g)
    return (d_attrs, None)


_gather_entries.defvjp(_gather_entries_fwd, _gather_entries_bwd)


def _build_slots(proj: _Projected, cam: Camera, cfg: RasterConfig,
                 margin: float = 0.0):
    """Binning -> 128-aligned per-tile slot layout.

    Steps (each sized by measurement on this TPU):
      1. truncate the sorted entries to a static budget
         E_cap = entry_cap_factor * N (sorted order is valid-first, so this
         only drops entries when the scene overflows the budget);
      2. scatter int32 ids into a 128-aligned per-tile padded layout (TPU HBM
         slices must be 128-lane aligned) — scattering 4-byte ids is ~8x
         cheaper than scattering 64-byte attribute rows.

    Returns (slot_gid (Epad,), pstart (T,), count (T,)).
    """
    pchunk = 128
    n = proj.mean2d.shape[0]
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    s_tile, s_gauss, s_flat, start, count = _bin_entries(proj, cam, cfg, margin)
    e_raw = s_gauss.shape[0]

    e_cap = min(e_raw, ((cfg.entry_cap_factor * n + pchunk - 1) // pchunk) * pchunk)
    start = jnp.minimum(start, e_cap)
    count = jnp.minimum(jnp.minimum(start + count, e_cap) - start,
                        cfg.max_per_tile)
    s_gauss_c = s_gauss[:e_cap]
    s_tile_c = s_tile[:e_cap]

    padded = ((count + pchunk - 1) // pchunk) * pchunk
    pstart = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    e_pad = e_cap + pchunk * num_tiles  # static

    tile_c = jnp.clip(s_tile_c, 0, num_tiles - 1)
    pos = jnp.arange(e_cap, dtype=jnp.int32) - start[tile_c]
    ok = (s_tile_c < num_tiles) & (pos >= 0) & (pos < count[tile_c])
    dest = jnp.where(ok, pstart[tile_c] + pos, e_pad)
    slot_gid = jnp.full((e_pad,), n, jnp.int32).at[dest].set(
        jnp.clip(s_gauss_c, 0, n - 1), mode="drop"
    )
    return slot_gid, pstart, count


def _assemble_image(out, cam: Camera, cfg: RasterConfig):
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    ts = cfg.tile
    img = out[: tiles_x * tiles_y, :5].reshape(tiles_y, tiles_x, 5, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * ts, tiles_x * ts, 5)
    return img[..., :3], img[..., 3], img[..., 4]


def _composite_pallas(
    proj: _Projected, colors: jnp.ndarray, cam: Camera, cfg: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas-backed compositing: slot layout + one attr-major gather whose
    custom VJP avoids the pathological scatter-add (see _gather_entries)."""
    from .rasterizer_pallas import NCH, composite_entries

    pchunk = 128
    n = proj.mean2d.shape[0]
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    ts = cfg.tile
    slot_gid, pstart, count = _build_slots(proj, cam, cfg)

    # 3. attr-major per-gaussian table (NCH, N+1) with an inert sentinel row.
    zeros_n = jnp.zeros((n,), jnp.float32)
    attrs = jnp.stack(
        [
            proj.mean2d[:, 0], proj.mean2d[:, 1],
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.opacity,
            colors[:, 0], colors[:, 1], colors[:, 2],
            proj.depth,
        ] + [zeros_n] * (NCH - 10),
        axis=0,
    )
    attrs_t = jnp.concatenate([attrs, jnp.zeros((NCH, 1), jnp.float32)], axis=1)
    entries_t = _gather_entries(attrs_t, slot_gid)

    out = composite_entries(entries_t, pstart, count, num_tiles,
                            pchunk, ts, tiles_x, cfg.group)
    return _assemble_image(out, cam, cfg)


def _composite(
    table: jnp.ndarray,
    count: jnp.ndarray,
    proj: _Projected,
    colors: jnp.ndarray,
    cam: Camera,
    cfg: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Front-to-back alpha compositing over the tile table.

    Returns padded (Hp, Wp) images: color (.., 3), depth, alpha.
    """
    n = proj.mean2d.shape[0]
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    ts = cfg.tile
    px = ts * ts

    # Padded per-gaussian attribute rows; sentinel row n is inert.
    def pad(x, fill=0.0):
        return jnp.concatenate([x, jnp.full((1,) + x.shape[1:], fill, x.dtype)], 0)

    mean2d_p = pad(proj.mean2d, -1e6)
    conic_p = pad(proj.conic)
    opac_p = pad(proj.opacity)
    feat_p = pad(
        jnp.concatenate([colors, proj.depth[:, None], jnp.ones((n, 1), colors.dtype)], -1)
    )  # (N+1, 5): rgb, depth, 1(for alpha map)

    # Pixel centers per tile (tile-local, integer pixel convention as CUDA).
    tid = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_u0 = (tid % tiles_x) * ts
    tile_v0 = (tid // tiles_x) * ts
    lu = jnp.arange(ts, dtype=jnp.float32)
    luu, lvv = jnp.meshgrid(lu, lu)  # (ts, ts): local u, v
    local_u = luu.reshape(-1)  # (px,)
    local_v = lvv.reshape(-1)

    num_chunks = cfg.tile_capacity // cfg.chunk

    def tile_fn(tidx, u0, v0, cnt):
        pu = u0 + local_u  # (px,)
        pv = v0 + local_v

        @jax.checkpoint
        def chunk_step(carry, ci):
            log_T, acc = carry
            idx = jax.lax.dynamic_slice(
                table[tidx], (ci * cfg.chunk,), (cfg.chunk,)
            )
            m2 = mean2d_p[idx]            # (chunk, 2)
            co = conic_p[idx]             # (chunk, 3)
            op = opac_p[idx]              # (chunk,)
            ft = feat_p[idx]              # (chunk, 5)

            du = pu[None, :] - m2[:, :1]  # (chunk, px)
            dv = pv[None, :] - m2[:, 1:2]
            power = -0.5 * (co[:, :1] * du * du + co[:, 2:3] * dv * dv) - co[:, 1:2] * du * dv
            g = jnp.exp(jnp.minimum(power, 0.0))
            in_slot = (
                jnp.arange(cfg.chunk, dtype=jnp.int32) + ci * cfg.chunk < cnt
            )
            alpha = jnp.where(
                (power <= 0.0) & in_slot[:, None], op[:, None] * g, 0.0
            )
            alpha = jnp.minimum(alpha, cfg.alpha_max)
            alpha = jnp.where(alpha < cfg.alpha_min, 0.0, alpha)

            log1m = jnp.log1p(-alpha)                       # (chunk, px)
            cum = jnp.cumsum(log1m, axis=0)
            cum_excl = cum - log1m                           # exclusive
            w = alpha * jnp.exp(cum_excl + log_T[None, :])   # (chunk, px)
            acc = acc + jnp.einsum(
                "kp,kf->pf", w, ft, preferred_element_type=jnp.float32
            )
            log_T = log_T + cum[-1]
            return (log_T, acc), None

        init = (
            jnp.zeros((px,), jnp.float32),
            jnp.zeros((px, 5), jnp.float32),
        )
        (log_T, acc), _ = jax.lax.scan(
            chunk_step, init, jnp.arange(num_chunks, dtype=jnp.int32)
        )
        return acc  # (px, 5)

    acc = jax.vmap(tile_fn)(tid, tile_u0.astype(jnp.float32), tile_v0.astype(jnp.float32), count)
    # (T, px, 5) -> (Hp, Wp, 5)
    img = acc.reshape(tiles_y, tiles_x, ts, ts, 5)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, 5)
    return img[..., :3], img[..., 3], img[..., 4]


# ---------------------------------------------------------------------------
# Center-tile-sorted backend (v2): N-index binning + in-kernel rank ordering
# ---------------------------------------------------------------------------


def _v2_radius_cap(cfg: RasterConfig) -> float:
    """Coverage reach must stay within the +-r_n tile neighborhood: a
    gaussian centered in tile c with radius <= r_n*tile cannot cover a tile
    outside [c - r_n, c + r_n] in either axis."""
    return ((cfg.bands - 1) // 2) * cfg.tile - 1.0


def _center_sort(proj: _Projected, cam: Camera, cfg: RasterConfig):
    """Sort gaussians by (center_tile, depth); build the per-(tile, band)
    segment table consumed by composite_sorted.

    Returns (order (N,), seg_start (T, B), seg_cnt (T, B)).
    """
    n = proj.mean2d.shape[0]
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    bands = cfg.bands
    r_n = (bands - 1) // 2

    u, v = proj.mean2d[:, 0], proj.mean2d[:, 1]
    ctx = jnp.clip(jnp.floor(u / cfg.tile), 0, tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(v / cfg.tile), 0, tiles_y - 1).astype(jnp.int32)
    ct = jnp.where(proj.radius > 0, cty * tiles_x + ctx, num_tiles)
    dbits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-6), jnp.int32
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    s_ct, _, order = jax.lax.sort((ct, dbits, idx), dimension=0, num_keys=2)

    t = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = t % tiles_x
    ty = t // tiles_x
    rows = ty[:, None] + jnp.arange(bands, dtype=jnp.int32)[None, :] - r_n
    row_ok = (rows >= 0) & (rows < tiles_y)
    rows_c = jnp.clip(rows, 0, tiles_y - 1)
    c_lo = rows_c * tiles_x + jnp.clip(tx[:, None] - r_n, 0, tiles_x - 1)
    c_hi = rows_c * tiles_x + jnp.clip(tx[:, None] + r_n, 0, tiles_x - 1)
    start = jnp.searchsorted(s_ct, c_lo.reshape(-1)).reshape(num_tiles, bands)
    end = jnp.searchsorted(
        s_ct, c_hi.reshape(-1) + 1
    ).reshape(num_tiles, bands)
    cnt = jnp.where(row_ok, end - start, 0)
    # The kernel loads seg_cap lanes from the 128-aligned start; entries
    # past that window are dropped (highest center columns of the band).
    lead = start % 128
    cnt = jnp.minimum(cnt, cfg.seg_cap - lead)
    return order, start.astype(jnp.int32), cnt.astype(jnp.int32)


def _pad_sorted(attrs_sorted: jnp.ndarray, cfg: RasterConfig) -> jnp.ndarray:
    """Pad (NCH, N) to (NCH, Npad) so any aligned band DMA stays in bounds;
    pad columns have radius 0 -> never covered."""
    n = attrs_sorted.shape[1]
    n128 = -(-n // 128) * 128
    return jnp.pad(attrs_sorted, ((0, 0), (0, n128 + cfg.seg_cap - n)))


def _sorted_attrs(proj: _Projected, colors: jnp.ndarray, cam: Camera,
                  cfg: RasterConfig):
    """Sorted attr array + segment table for the sorted backend: one
    N-column gather (custom scatter-add VJP) replaces the v1 entry
    expansion/scatter/gather."""
    from .rasterizer_pallas import NCH

    n = proj.mean2d.shape[0]
    order, seg_start, seg_cnt = _center_sort(proj, cam, cfg)
    zeros_n = jnp.zeros((n,), jnp.float32)
    attrs = jnp.stack(
        [
            proj.mean2d[:, 0], proj.mean2d[:, 1],
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.opacity,
            colors[:, 0], colors[:, 1], colors[:, 2],
            proj.depth,
            jax.lax.stop_gradient(proj.radius),
        ] + [zeros_n] * (NCH - 11),
        axis=0,
    )
    return _pad_sorted(_gather_entries(attrs, order), cfg), seg_start, seg_cnt


def _composite_v2(
    proj: _Projected, colors: jnp.ndarray, cam: Camera, cfg: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    from .rasterizer_pallas_v2 import composite_sorted

    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    attrs_sorted, seg_start, seg_cnt = _sorted_attrs(proj, colors, cam, cfg)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    out = composite_sorted(attrs_sorted, seg_start, seg_cnt, tile_ids,
                           cfg.tile, tiles_x, cfg.group, cfg.bands,
                           cfg.seg_cap, cfg.kernel_bf16,
                           cfg.kernel_quadform, cfg.rmw_window)
    return _assemble_image(out, cam, cfg)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def render(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    opacity_logits: jnp.ndarray,
    colors: jnp.ndarray,
    w2c: jnp.ndarray,
    cam: Camera,
    cfg: RasterConfig = RasterConfig(),
    alive: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Render gaussians into (color, depth, alpha, radii).

    `colors` are per-gaussian RGB (SH already evaluated — see
    `eags_slam_tpu.core.sh.eval_sh`). Differentiable w.r.t. every array input
    including `w2c` (pose gradients, replacing the reference's
    diff-gaussian-rasterization-w-pose theta/rho plumbing).
    """
    backend = cfg.backend
    if backend == "auto":
        backend = "sorted" if jax.default_backend() == "tpu" else "jnp"
    proj = project_gaussians(
        means3d, quats, log_scales, opacity_logits, w2c, cam, cfg, alive,
        radius_cap=_v2_radius_cap(cfg) if backend == "sorted" else None,
    )
    if backend == "sorted":
        color, depth, alpha = _composite_v2(proj, colors, cam, cfg)
    elif backend == "pallas":
        color, depth, alpha = _composite_pallas(proj, colors, cam, cfg)
    else:
        table, count = _build_tile_table(proj, cam, cfg)
        color, depth, alpha = _composite(table, count, proj, colors, cam, cfg)
    color = color[: cam.height, : cam.width]
    depth = depth[: cam.height, : cam.width]
    alpha = alpha[: cam.height, : cam.width]
    radii = jnp.ceil(proj.radius).astype(jnp.int32)
    return RenderOutput(color, depth, alpha, radii)


def sorted_layout(means3d, quats, log_scales, opacity_logits, w2c,
                  cam: Camera, cfg: RasterConfig, alive=None):
    """Center-tile layout of the CURRENT array order: (order, seg_start,
    seg_cnt) such that permuting rows by `order` puts them in (center_tile,
    depth) order for pose `w2c`. Used by the resident-sorted mapping loop
    (mapper.optimize_submap): params/Adam state are physically permuted once
    per keyframe block, then `render_sorted_resident` composites with NO
    per-iteration gather/scatter."""
    proj = project_gaussians(means3d, quats, log_scales, opacity_logits,
                             w2c, cam, cfg, alive,
                             radius_cap=_v2_radius_cap(cfg))
    return _center_sort(proj, cam, cfg)


def render_sorted_resident(
    means3d, quats, log_scales, opacity_logits, colors, w2c,
    seg_start, seg_cnt, cam: Camera, cfg: RasterConfig, alive=None,
) -> RenderOutput:
    """Render gaussians that are ALREADY stored in center-tile-sorted order
    for pose `w2c` (see `sorted_layout`). Differentiable w.r.t. every array
    input; kernel grads arrive directly in the resident order, so the
    per-iteration N-index gather (fwd) and column scatter-add (bwd) of
    `render` disappear entirely.

    Exactness: per-iteration projection/coverage/depth-rank are computed from
    the CURRENT params; only segment membership is frozen — a gaussian whose
    center drifts outside its init +-r_n tile neighborhood within a block is
    clipped (same semantics as the tracking FrozenSorted path)."""
    proj, attrs_sorted = _resident_attrs(
        means3d, quats, log_scales, opacity_logits, colors, w2c, cam, cfg,
        alive,
    )
    from .rasterizer_pallas_v2 import composite_sorted

    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    out = composite_sorted(attrs_sorted, seg_start, seg_cnt, tile_ids,
                           cfg.tile, tiles_x, cfg.group, cfg.bands,
                           cfg.seg_cap, cfg.kernel_bf16,
                           cfg.kernel_quadform, cfg.rmw_window)
    color, depth, alpha = _assemble_image(out, cam, cfg)
    color = color[: cam.height, : cam.width]
    depth = depth[: cam.height, : cam.width]
    alpha = alpha[: cam.height, : cam.width]
    radii = jnp.ceil(proj.radius).astype(jnp.int32)
    return RenderOutput(color, depth, alpha, radii)


def _resident_attrs(means3d, quats, log_scales, opacity_logits, colors, w2c,
                    cam: Camera, cfg: RasterConfig, alive):
    """Shared projection + sorted-order attr stack for the resident renders
    (rows are ALREADY in `sorted_layout` order — no gather)."""
    proj = project_gaussians(means3d, quats, log_scales, opacity_logits,
                             w2c, cam, cfg, alive,
                             radius_cap=_v2_radius_cap(cfg))
    n = means3d.shape[0]
    zeros_n = jnp.zeros((n,), jnp.float32)
    from .rasterizer_pallas import NCH

    attrs = jnp.stack(
        [
            proj.mean2d[:, 0], proj.mean2d[:, 1],
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.opacity,
            colors[:, 0], colors[:, 1], colors[:, 2],
            proj.depth,
            jax.lax.stop_gradient(proj.radius),
        ] + [zeros_n] * (NCH - 11),
        axis=0,
    )
    return proj, _pad_sorted(attrs, cfg)


def render_sorted_resident_tiles(
    means3d, quats, log_scales, opacity_logits, colors, w2c,
    seg_start, seg_cnt, tile_ids, cam: Camera, cfg: RasterConfig, alive=None,
) -> "TileRender":
    """Tile-subset variant of `render_sorted_resident` (adaptive
    converged-tile freezing, PERF.md round 3): composites only `tile_ids`
    (S,) from the RESIDENT center-tile-sorted layout. Kernel work scales
    with S; projection stays N-proportional. Same frozen-segment-membership
    semantics as `render_sorted_resident`."""
    from .rasterizer_pallas_v2 import composite_sorted

    _, attrs_sorted = _resident_attrs(
        means3d, quats, log_scales, opacity_logits, colors, w2c, cam, cfg,
        alive,
    )
    tiles_x = -(-cam.width // cfg.tile)
    out = composite_sorted(attrs_sorted, seg_start, seg_cnt,
                           tile_ids.astype(jnp.int32), cfg.tile, tiles_x,
                           cfg.group, cfg.bands, cfg.seg_cap,
                           cfg.kernel_bf16, cfg.kernel_quadform, cfg.rmw_window)
    s = tile_ids.shape[0]
    ts = cfg.tile
    img = out[:s, :5].reshape(s, 5, ts, ts)
    return TileRender(
        color=jnp.transpose(img[:, 0:3], (0, 2, 3, 1)),
        depth=img[:, 3],
        alpha=img[:, 4],
    )


# ---------------------------------------------------------------------------
# Frozen-binning pose refinement (tracking fast path)
# ---------------------------------------------------------------------------


class FrozenBinning(NamedTuple):
    """Per-entry STATIC 3D attributes + slot layout, built once per frame.

    During pose refinement the gaussians are constants and the pose moves by
    at most a few pixels, so the tile assignment (binning) from the init pose
    stays valid given a small margin. Freezing it removes the per-iteration
    sort + scatter + gather (each costs per-INDEX on this TPU, see PERF.md):
    a tracking iteration becomes elementwise re-projection of the frozen
    entries + the compositing kernel. The reference rebins every iteration
    because CUDA makes that free; the observable difference here is only that
    a gaussian whose footprint moves across a tile boundary by more than
    `margin` px mid-refinement is clipped at that tile's edge.

    e3d rows (NCH=16, Epad): 0-2 xyz(world), 3-8 cov3d packed
    (c00,c01,c02,c11,c12,c22), 9 opacity (post-sigmoid, 0 for dead/sentinel),
    10-12 rgb, 13-15 pad.
    """

    e3d: jnp.ndarray      # (NCH, Epad) f32, stop-gradient static
    pstart: jnp.ndarray   # (T,)
    count: jnp.ndarray    # (T,)


def freeze_binning(
    means3d, quats, log_scales, opacity_logits, colors, init_w2c,
    cam: Camera, cfg: RasterConfig, alive=None, margin: Optional[float] = None,
) -> FrozenBinning:
    """Bin once at the init pose (with margin) and gather per-entry 3D attrs."""
    from .rasterizer_pallas import NCH

    n = means3d.shape[0]
    if margin is None:
        margin = cfg.tile / 2.0
    proj = project_gaussians(means3d, quats, log_scales, opacity_logits,
                             init_w2c, cam, cfg, alive)
    slot_gid, pstart, count = _build_slots(proj, cam, cfg, margin)

    # World-frame 3D covariance, packed symmetric (elementwise).
    S = jnp.exp(log_scales)
    Rg = _quat_to_rotmat(quats)
    M = Rg * S[..., None, :]
    c00 = jnp.sum(M[:, 0] * M[:, 0], -1)
    c01 = jnp.sum(M[:, 0] * M[:, 1], -1)
    c02 = jnp.sum(M[:, 0] * M[:, 2], -1)
    c11 = jnp.sum(M[:, 1] * M[:, 1], -1)
    c12 = jnp.sum(M[:, 1] * M[:, 2], -1)
    c22 = jnp.sum(M[:, 2] * M[:, 2], -1)
    opac = proj.opacity * (proj.radius > 0)  # dead/culled -> 0
    zeros_n = jnp.zeros((n,), jnp.float32)
    attrs = jnp.stack(
        [means3d[:, 0], means3d[:, 1], means3d[:, 2],
         c00, c01, c02, c11, c12, c22, opac,
         colors[:, 0], colors[:, 1], colors[:, 2]]
        + [zeros_n] * (NCH - 13),
        axis=0,
    )
    attrs_t = jnp.concatenate([attrs, jnp.zeros((NCH, 1), jnp.float32)], 1)
    e3d = jax.lax.stop_gradient(attrs_t[:, slot_gid])
    return FrozenBinning(e3d, pstart, count)


def _reproject_rows(e3d, w2c, cam: Camera, cfg: RasterConfig,
                    radius_cap: Optional[float] = None):
    """Elementwise EWA reprojection of packed 3D rows (xyz 0-2, cov3d 3-8,
    opacity 9, rgb 10-12) under a new pose. Returns the kernel channel rows
    [u, v, conic a/b/c, opacity, rgb, depth, radius]; radius only matters
    for the sorted backend (coverage) and is None-capped like
    project_gaussians."""
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    x = e3d[0:3]                                       # (3, Epad)
    p = R @ x + t[:, None]                             # camera frame
    z = p[2]
    vis = z > cfg.near
    zc = jnp.maximum(z, cfg.near)
    inv_z = 1.0 / zc
    u = p[0] * inv_z * cam.fx + cam.cx
    v = p[1] * inv_z * cam.fy + cam.cy

    # C = R cov3d R^T per entry (packed symmetric), then cov2d = J C J^T.
    s00, s01, s02, s11, s12, s22 = (e3d[3], e3d[4], e3d[5],
                                    e3d[6], e3d[7], e3d[8])

    def sandwich_row(ri, rj):
        # ri . Sigma . rj for R rows ri, rj (3-vectors of scalars).
        return (
            ri[0] * (s00 * rj[0] + s01 * rj[1] + s02 * rj[2])
            + ri[1] * (s01 * rj[0] + s11 * rj[1] + s12 * rj[2])
            + ri[2] * (s02 * rj[0] + s12 * rj[1] + s22 * rj[2])
        )

    r0, r1, r2 = R[0], R[1], R[2]
    C00 = sandwich_row(r0, r0)
    C01 = sandwich_row(r0, r1)
    C02 = sandwich_row(r0, r2)
    C11 = sandwich_row(r1, r1)
    C12 = sandwich_row(r1, r2)
    C22 = sandwich_row(r2, r2)

    lim_x = 1.3 * (0.5 * cam.width / cam.fx)
    lim_y = 1.3 * (0.5 * cam.height / cam.fy)
    tx = jnp.clip(p[0] * inv_z, -lim_x, lim_x) * zc
    ty = jnp.clip(p[1] * inv_z, -lim_y, lim_y) * zc
    j00 = cam.fx * inv_z
    j02 = -cam.fx * tx * inv_z * inv_z
    j11 = cam.fy * inv_z
    j12 = -cam.fy * ty * inv_z * inv_z
    a = j00 * (j00 * C00 + j02 * C02) + j02 * (j00 * C02 + j02 * C22) + cfg.low_pass
    b = j11 * (j00 * C01 + j02 * C12) + j12 * (j00 * C02 + j02 * C22)
    c = j11 * (j11 * C11 + j12 * C12) + j12 * (j11 * C12 + j12 * C22) + cfg.low_pass
    det = jnp.maximum(a * c - b * b, 1e-12)
    inv_det = 1.0 / det

    opac = e3d[9] * vis

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = cfg.sigma_clip * jnp.sqrt(lam_max)
    if radius_cap is None:
        radius_cap = 0.5 * cfg.dup_side * cfg.tile - 1.0
    radius = jnp.minimum(radius, radius_cap)
    radius = jnp.where(vis & (e3d[9] > 0), radius, 0.0)

    return [u, v, c * inv_det, -b * inv_det, a * inv_det, opac,
            e3d[10], e3d[11], e3d[12], z,
            jax.lax.stop_gradient(radius)]


def render_frozen(
    fb: FrozenBinning, w2c, cam: Camera, cfg: RasterConfig
) -> RenderOutput:
    """Render from frozen binning; differentiable w.r.t. `w2c` only.

    Per-entry EWA projection is pure elementwise math over Epad; the
    compositing kernel's custom VJP returns per-entry cotangents which chain
    elementwise back to the pose — no per-iteration sort/scatter/gather.
    """
    from .rasterizer_pallas import NCH, composite_entries

    rows = _reproject_rows(fb.e3d, w2c, cam, cfg)
    e_pad = fb.e3d.shape[1]
    entries_t = jnp.stack(
        rows[:10] + [jnp.zeros((e_pad,), jnp.float32)] * (NCH - 10),
        axis=0,
    )

    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    out = composite_entries(entries_t, fb.pstart, fb.count,
                            tiles_x * tiles_y, 128, cfg.tile, tiles_x,
                            cfg.group)
    color, depth, alpha = _assemble_image(out, cam, cfg)
    color = color[: cam.height, : cam.width]
    depth = depth[: cam.height, : cam.width]
    alpha = alpha[: cam.height, : cam.width]
    radii = jnp.zeros((1,), jnp.int32)  # not tracked on the frozen path
    return RenderOutput(color, depth, alpha, radii)


# ---------------------------------------------------------------------------
# Frozen-sorted pose refinement (tracking fast path, sorted backend)
# ---------------------------------------------------------------------------


class FrozenSorted(NamedTuple):
    """Center-tile-sorted per-GAUSSIAN 3D attrs + frozen segment table.

    v2 analog of FrozenBinning, but 3D rows are per gaussian (N columns,
    not N*dup^2 entries — 4x less reprojection work per iteration) and the
    per-tile depth order is re-derived in-kernel each iteration (exact
    under pose motion, unlike the v1 frozen layout whose compositing order
    was the init pose's). Segment membership is frozen: a gaussian whose
    center drifts so far that it covers a tile outside its init +-r_n
    neighborhood is clipped — same observable semantics as the v1 margin.

    e3d rows: 0-2 xyz (world), 3-8 cov3d packed, 9 opacity (0 for dead),
    10-12 rgb, 13-15 pad. All stop-gradient.
    """

    e3d: jnp.ndarray       # (NCH, Npad)
    seg_start: jnp.ndarray  # (T, B)
    seg_cnt: jnp.ndarray   # (T, B)


def freeze_sorted(
    means3d, quats, log_scales, opacity_logits, colors, init_w2c,
    cam: Camera, cfg: RasterConfig, alive=None,
) -> FrozenSorted:
    """Center-sort once at the init pose; gather 3D attrs into that order."""
    from .rasterizer_pallas import NCH

    n = means3d.shape[0]
    proj = project_gaussians(means3d, quats, log_scales, opacity_logits,
                             init_w2c, cam, cfg, alive,
                             radius_cap=_v2_radius_cap(cfg))
    order, seg_start, seg_cnt = _center_sort(proj, cam, cfg)

    S = jnp.exp(log_scales)
    Rg = _quat_to_rotmat(quats)
    M = Rg * S[..., None, :]
    c00 = jnp.sum(M[:, 0] * M[:, 0], -1)
    c01 = jnp.sum(M[:, 0] * M[:, 1], -1)
    c02 = jnp.sum(M[:, 0] * M[:, 2], -1)
    c11 = jnp.sum(M[:, 1] * M[:, 1], -1)
    c12 = jnp.sum(M[:, 1] * M[:, 2], -1)
    c22 = jnp.sum(M[:, 2] * M[:, 2], -1)
    opac = proj.opacity * (proj.radius > 0)  # dead/culled -> 0
    zeros_n = jnp.zeros((n,), jnp.float32)
    attrs = jnp.stack(
        [means3d[:, 0], means3d[:, 1], means3d[:, 2],
         c00, c01, c02, c11, c12, c22, opac,
         colors[:, 0], colors[:, 1], colors[:, 2]]
        + [zeros_n] * (NCH - 13),
        axis=0,
    )
    e3d = jax.lax.stop_gradient(
        _pad_sorted(attrs[:, order], cfg)
    )
    return FrozenSorted(e3d, seg_start, seg_cnt)


def _frozen_sorted_attrs(fs: FrozenSorted, w2c, cam: Camera,
                         cfg: RasterConfig) -> jnp.ndarray:
    return _stack_reproj_rows(fs.e3d, w2c, cam, cfg)


def render_frozen_sorted_tiles(
    fs: FrozenSorted, w2c, tile_ids: jnp.ndarray, cam: Camera,
    cfg: RasterConfig,
) -> "TileRender":
    """Render only `tile_ids` (S,) from a frozen sorted layout.

    Tile-subset tracking fast path: the pose has ~7 DOF, so a subset of
    information-rich tiles yields nearly the same gradient as the full image
    at S/T of the kernel cost. Differentiable w.r.t. `w2c` like
    render_frozen_sorted."""
    from .rasterizer_pallas_v2 import composite_sorted

    attrs_sorted = _frozen_sorted_attrs(fs, w2c, cam, cfg)
    tiles_x = -(-cam.width // cfg.tile)
    out = composite_sorted(attrs_sorted, fs.seg_start, fs.seg_cnt,
                           tile_ids.astype(jnp.int32), cfg.tile, tiles_x,
                           cfg.group, cfg.bands, cfg.seg_cap,
                           cfg.kernel_bf16, cfg.kernel_quadform, cfg.rmw_window)
    s = tile_ids.shape[0]
    ts = cfg.tile
    img = out[:s, :5].reshape(s, 5, ts, ts)
    return TileRender(
        color=jnp.transpose(img[:, 0:3], (0, 2, 3, 1)),
        depth=img[:, 3],
        alpha=img[:, 4],
    )


def render_frozen_sorted(
    fs: FrozenSorted, w2c, cam: Camera, cfg: RasterConfig
) -> RenderOutput:
    """Render from a frozen sorted layout; differentiable w.r.t. `w2c`.

    Per-iteration work = elementwise reprojection of N sorted gaussians +
    the sorted compositing kernel (which re-ranks depths in VMEM)."""
    from .rasterizer_pallas_v2 import composite_sorted

    attrs_sorted = _frozen_sorted_attrs(fs, w2c, cam, cfg)
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    out = composite_sorted(attrs_sorted, fs.seg_start, fs.seg_cnt, tile_ids,
                           cfg.tile, tiles_x, cfg.group,
                           cfg.bands, cfg.seg_cap, cfg.kernel_bf16,
                           cfg.kernel_quadform, cfg.rmw_window)
    color, depth, alpha = _assemble_image(out, cam, cfg)
    color = color[: cam.height, : cam.width]
    depth = depth[: cam.height, : cam.width]
    alpha = alpha[: cam.height, : cam.width]
    radii = jnp.zeros((1,), jnp.int32)  # not tracked on the frozen path
    return RenderOutput(color, depth, alpha, radii)


# ---------------------------------------------------------------------------
# Pose-contraction tracking path (PERF.md roadmap #6)
# ---------------------------------------------------------------------------
#
# The frozen-sorted tracking loss only differentiates w.r.t. the 7 relative
# pose parameters (quat wxyz + trans xyz; exposure never enters the render).
# The legacy chain pays a full per-gaussian gradient anyway: the kernel
# rmw's a (NCH, Npad) grad array to HBM which XLA contracts through the
# reprojection VJP down to 7 scalars. This path instead hands the backward
# kernel PRECOMPUTED per-gaussian jacobians d(attr)/d(pose) and contracts
# per-entry cotangents in VMEM (rasterizer_pallas_v2.pose_grad_sorted):
# no grad buffer, no rmw, no N-sized XLA VJP. Numerically it computes the
# exact same chain-rule sum in a different association order.
# Enabled by TrackerConfig.pose_grad_kernel / EAGS_POSE_KERNEL (default
# off; sweepable on the bench).


def _pose_rel_w2c(pose_vec: jnp.ndarray, last_w2c: jnp.ndarray):
    """w2c = last_w2c @ Rel(quat=pose_vec[:4], trans=pose_vec[4:7]) — the
    exact float chain of tracker._rel_matrix (core.se3.quat_to_rotmat and
    the local _quat_to_rotmat share formula and normalization eps)."""
    R = _quat_to_rotmat(pose_vec[:4])
    rel = jnp.eye(4, dtype=jnp.float32)
    rel = rel.at[:3, :3].set(R)
    rel = rel.at[:3, 3].set(pose_vec[4:7])
    return last_w2c @ rel


def _pose_rows6(e3d, pose_vec, last_w2c, cam: Camera, cfg: RasterConfig):
    """The 6 pose-DEPENDENT attr rows (u, v, conic a/b/c, depth) as a
    (6, Npad) stack — the jacobian target for the pose-contraction
    backward. Row order must match rasterizer_pallas_v2._GROWS."""
    rows = _reproject_rows(e3d, _pose_rel_w2c(pose_vec, last_w2c), cam, cfg,
                           radius_cap=_v2_radius_cap(cfg))
    return jnp.stack([rows[0], rows[1], rows[2], rows[3], rows[4], rows[9]],
                     axis=0)


def _pose_jacobian(e3d, pose_vec, last_w2c, cam: Camera, cfg: RasterConfig):
    """(P_MAX * PJ, Npad) f32 jacobian d(pose-dep attrs)/d(pose_vec) in the
    kernel's row layout (p * PJ + ch). Built as 7 elementwise JVP passes
    (one per parameter basis vector) — stacking tangents first keeps the
    (7, 6, Npad) result row-major so the reshape to kernel rows is free
    (a jacfwd would put the parameter axis LAST and pay a transpose)."""
    from .rasterizer_pallas_v2 import P_MAX, PJ

    eye = jnp.eye(pose_vec.shape[0], dtype=pose_vec.dtype)
    jac = jax.vmap(
        lambda t: jax.jvp(
            lambda pv: _pose_rows6(e3d, pv, last_w2c, cam, cfg),
            (pose_vec,), (t,),
        )[1]
    )(eye)                                            # (7, 6, Npad)
    n_pad = jac.shape[-1]
    jac = jac.reshape(pose_vec.shape[0] * PJ, n_pad)
    pad_rows = P_MAX * PJ - jac.shape[0]
    return jnp.concatenate(
        [jac, jnp.zeros((pad_rows, n_pad), jnp.float32)], axis=0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _frozen_pose_tiles(e3d, seg_start, seg_cnt, tile_ids, pose_vec,
                       last_w2c, cam: Camera, cfg: RasterConfig):
    """Raw tile blocks of the frozen-sorted render, differentiable w.r.t.
    `pose_vec` (7,) ONLY (e3d/last_w2c cotangents are zero — both are
    constants during tracking refinement)."""
    from .rasterizer_pallas_v2 import composite_sorted

    tiles_x = -(-cam.width // cfg.tile)
    attrs = _stack_reproj_rows(e3d, _pose_rel_w2c(pose_vec, last_w2c), cam,
                               cfg)
    return composite_sorted(attrs, seg_start, seg_cnt, tile_ids, cfg.tile,
                            tiles_x, cfg.group, cfg.bands, cfg.seg_cap,
                            cfg.kernel_bf16, cfg.kernel_quadform, False)


def _frozen_pose_tiles_fwd(e3d, seg_start, seg_cnt, tile_ids, pose_vec,
                           last_w2c, cam, cfg):
    from .rasterizer_pallas_v2 import composite_sorted_fwd_res

    tiles_x = -(-cam.width // cfg.tile)
    attrs = _stack_reproj_rows(e3d, _pose_rel_w2c(pose_vec, last_w2c), cam,
                               cfg)
    out, rank, attrs_dma = composite_sorted_fwd_res(
        attrs, seg_start, seg_cnt, tile_ids, cfg.tile, tiles_x, cfg.group,
        cfg.bands, cfg.seg_cap, cfg.kernel_bf16, cfg.kernel_quadform)
    return out, (e3d, seg_start, seg_cnt, tile_ids, pose_vec, last_w2c,
                 attrs_dma, out, rank)


def _frozen_pose_tiles_bwd(cam, cfg, res, dout):
    from .rasterizer_pallas_v2 import pose_grad_sorted

    (e3d, seg_start, seg_cnt, tile_ids, pose_vec, last_w2c, attrs_dma, out,
     rank) = res
    tiles_x = -(-cam.width // cfg.tile)
    jac = _pose_jacobian(e3d, pose_vec, last_w2c, cam, cfg)
    dpose = pose_grad_sorted(attrs_dma, jac, seg_start, seg_cnt, tile_ids,
                             out, rank, dout, cfg.tile, tiles_x, cfg.group,
                             cfg.bands, cfg.seg_cap, cfg.kernel_bf16,
                             cfg.kernel_quadform)
    return (jnp.zeros_like(e3d), None, None, None,
            dpose[: pose_vec.shape[0]], jnp.zeros_like(last_w2c))


_frozen_pose_tiles.defvjp(_frozen_pose_tiles_fwd, _frozen_pose_tiles_bwd)


def _stack_reproj_rows(e3d, w2c, cam: Camera, cfg: RasterConfig):
    from .rasterizer_pallas import NCH

    rows = _reproject_rows(e3d, w2c, cam, cfg,
                           radius_cap=_v2_radius_cap(cfg))
    n_pad = e3d.shape[1]
    return jnp.stack(
        rows + [jnp.zeros((n_pad,), jnp.float32)] * (NCH - len(rows)),
        axis=0,
    )


def render_frozen_sorted_tiles_pose(
    fs: FrozenSorted, pose_vec, last_w2c, tile_ids: jnp.ndarray, cam: Camera,
    cfg: RasterConfig,
) -> "TileRender":
    """`render_frozen_sorted_tiles` with the pose-contraction backward:
    identical forward; the gradient w.r.t. `pose_vec` (quat4 + trans3) is
    contracted in-kernel against precomputed jacobians instead of passing
    through a (NCH, Npad) per-gaussian grad array. rmw_window is moot here
    (the pose backward performs no rmw at all)."""
    out = _frozen_pose_tiles(fs.e3d, fs.seg_start, fs.seg_cnt,
                             tile_ids.astype(jnp.int32), pose_vec, last_w2c,
                             cam, cfg)
    s = tile_ids.shape[0]
    ts = cfg.tile
    img = out[:s, :5].reshape(s, 5, ts, ts)
    return TileRender(
        color=jnp.transpose(img[:, 0:3], (0, 2, 3, 1)),
        depth=img[:, 3],
        alpha=img[:, 4],
    )


def render_frozen_sorted_pose(
    fs: FrozenSorted, pose_vec, last_w2c, cam: Camera, cfg: RasterConfig
) -> RenderOutput:
    """Full-image `render_frozen_sorted` with the pose-contraction
    backward (see render_frozen_sorted_tiles_pose)."""
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    out = _frozen_pose_tiles(fs.e3d, fs.seg_start, fs.seg_cnt, tile_ids,
                             pose_vec, last_w2c, cam, cfg)
    color, depth, alpha = _assemble_image(out, cam, cfg)
    return RenderOutput(
        color[: cam.height, : cam.width],
        depth[: cam.height, : cam.width],
        alpha[: cam.height, : cam.width],
        jnp.zeros((1,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Tile-subset rendering (stochastic mapping, PERF.md roadmap #1)
# ---------------------------------------------------------------------------


class TileRender(NamedTuple):
    color: jnp.ndarray   # (S, ts, ts, 3)
    depth: jnp.ndarray   # (S, ts, ts)
    alpha: jnp.ndarray   # (S, ts, ts)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def render_tiles(
    means3d, quats, log_scales, opacity_logits, colors, w2c,
    tile_ids: jnp.ndarray, cam: Camera, cfg: RasterConfig, alive=None,
) -> TileRender:
    """Render only the tiles in `tile_ids` (S,) — sorted backend only.

    Cost scales with S: the grid shrinks proportionally and only selected
    tiles' candidates are composited. Binning (center sort + one N-gather)
    is per-call. Used for tile-subset stochastic mapping: optimizing a
    random tile subset per iteration cuts kernel work ~T/S-fold while
    keeping the gradient an unbiased estimate of the full-image one.
    """
    from .rasterizer_pallas_v2 import composite_sorted

    proj = project_gaussians(means3d, quats, log_scales, opacity_logits,
                             w2c, cam, cfg, alive,
                             radius_cap=_v2_radius_cap(cfg))
    tiles_x = -(-cam.width // cfg.tile)
    attrs_sorted, seg_start, seg_cnt = _sorted_attrs(proj, colors, cam, cfg)
    out = composite_sorted(attrs_sorted, seg_start, seg_cnt,
                           tile_ids.astype(jnp.int32), cfg.tile, tiles_x,
                           cfg.group, cfg.bands, cfg.seg_cap,
                           cfg.kernel_bf16, cfg.kernel_quadform, cfg.rmw_window)
    s = tile_ids.shape[0]
    ts = cfg.tile
    img = out[:s, :5].reshape(s, 5, ts, ts)
    return TileRender(
        color=jnp.transpose(img[:, 0:3], (0, 2, 3, 1)),
        depth=img[:, 3],
        alpha=img[:, 4],
    )


def tile_sums(x: jnp.ndarray, ts: int, tiles_x: int, tiles_y: int):
    """Per-tile sums of an (H, W) map, flattened to (tiles_y * tiles_x,).

    Two staged single-axis reductions instead of
    `reshape(TY, ts, TX, ts).sum((1, 3))`: the two-axis 4D reduce lowers to
    a transposing reduction costing ~6-12 ms at 1200x680 on the v5e
    (measured, PERF.md round 3); minor-axis-then-sublane reduces are ~free.
    """
    hp, wp = tiles_y * ts, tiles_x * ts
    xp = jnp.pad(x, ((0, hp - x.shape[0]), (0, wp - x.shape[1])))
    col = xp.reshape(hp, tiles_x, ts).sum(-1)            # (hp, TX)
    return col.reshape(tiles_y, ts, tiles_x).sum(1).reshape(-1)


def gt_tiles(image: jnp.ndarray, tile_ids: jnp.ndarray, ts: int,
             tiles_x: int, tiles_y: int):
    """Gather ground-truth tiles matching `render_tiles` output.

    image (H, W[, C]) is zero-padded to the tile grid; returns
    (S, ts, ts[, C]). One row-gather of S indices (cheap on TPU).
    """
    chan = image.shape[2:] 
    hp, wp = tiles_y * ts, tiles_x * ts
    pad = [(0, hp - image.shape[0]), (0, wp - image.shape[1])] + [
        (0, 0)
    ] * len(chan)
    img = jnp.pad(image, pad)
    img = img.reshape((tiles_y, ts, tiles_x, ts) + chan)
    img = jnp.moveaxis(img, 2, 1).reshape((tiles_y * tiles_x, ts, ts) + chan)
    return img[tile_ids]
