"""Jittable image ops: Canny, distance transform, pyramids, sampling.

Replaces the OpenCV surface of the reference (SURVEY.md §7.2 stage 6):
  - `cv2.Canny` (mapper seeding mask, src/utils/mapper_utils.py:271-290;
    per-pyramid-level VO edges, VO/datastructures/imgpyramidrgbd.cpp:183);
  - `cv2.distanceTransform` L2 on inverted edges + the gradient acceleration
    structure (0.5 dx, 0.5 dy, dt) (imgpyramidrgbd.cpp:234-280);
  - `cv2.pyrDown` gray pyramid + InfiniTAM-style hole-aware depth subsample
    (imgpyramidrgbd.h:198-245);
  - `cv2.dilate` 2x2 for edge-mask dilation (mapper_utils.py:271-290);
  - Scharr gradients / gradient mask (src/gsr/loss.py:6-41, camera.py:117-146).

TPU reformulations (SURVEY.md §7.3 hard part 3):
  - Canny hysteresis = fixpoint of masked 3x3 dilations (a few iterations),
    not a stack-based flood fill;
  - the L2 distance transform is the exact two-pass separable squared-distance
    envelope, *windowed* to `window` pixels: distances beyond the VO's
    per-level edge-distance filter (max 30 px, optimizer.h:62) are clamped
    anyway, so a (2W+1)-shift min-plus scan is exact where it matters and
    fully vectorized.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma, rgb in [0,255] or [0,1]; returns same scale."""
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def _conv2_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2D convolution, SAME/edge-replicate padding, (H, W) single channel."""
    kh, kw = kernel.shape
    pad_img = jnp.pad(img, ((kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    return jax.lax.conv_general_dilated(
        pad_img[None, None],
        kernel[None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def gaussian_blur5(img: jnp.ndarray) -> jnp.ndarray:
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    return _conv2_same(_conv2_same(img, k[None, :]), k[:, None])


def sobel(img: jnp.ndarray):
    kx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ky = kx.T
    return _conv2_same(img, kx), _conv2_same(img, ky)


def scharr(img: jnp.ndarray):
    kx = jnp.array([[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]]) / 32.0
    ky = kx.T
    return _conv2_same(img, kx), _conv2_same(img, ky)


def dilate(mask: jnp.ndarray, size: int = 2) -> jnp.ndarray:
    """Binary dilation with a size x size structuring element."""
    return (
        jax.lax.reduce_window(
            mask.astype(jnp.float32),
            0.0,
            jax.lax.max,
            (size, size),
            (1, 1),
            "SAME",
        )
        > 0.0
    )


def _nms(mag: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Non-maximum suppression with 4-way quantized gradient direction."""
    pad = jnp.pad(mag, 1, mode="constant")

    def sh(dr, dc):
        return jax.lax.dynamic_slice(pad, (1 + dr, 1 + dc), mag.shape)

    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    a = jnp.abs(ang)
    # Quantize to {0, 45, 90, 135} degrees.
    horiz = (a <= jnp.pi / 8) | (a >= 7 * jnp.pi / 8)
    vert = (a >= 3 * jnp.pi / 8) & (a <= 5 * jnp.pi / 8)
    diag1 = (~horiz) & (~vert) & (jnp.sign(gx) == jnp.sign(gy))
    n1 = jnp.where(horiz, sh(0, 1), jnp.where(vert, sh(1, 0),
         jnp.where(diag1, sh(1, 1), sh(1, -1))))
    n2 = jnp.where(horiz, sh(0, -1), jnp.where(vert, sh(-1, 0),
         jnp.where(diag1, sh(-1, -1), sh(-1, 1))))
    return (mag >= n1) & (mag >= n2)


@functools.partial(jax.jit, static_argnames=("hysteresis_iters", "l2gradient"))
def canny(
    gray: jnp.ndarray,
    low: float,
    high: float,
    hysteresis_iters: int = 8,
    l2gradient: bool = True,
) -> jnp.ndarray:
    """Canny edges on a (H, W) gray image in [0, 255]. Returns bool mask.

    Same thresholds semantics as cv2.Canny (reference uses 100/200 with
    L2gradient=True, mapper_utils.py:271-290). Hysteresis runs a fixed number
    of strong-label dilation steps — edges more than `hysteresis_iters` px of
    weak-chain away from a strong pixel are dropped (visually negligible,
    bounded compute).
    """
    gx, gy = sobel(gray)
    mag = jnp.sqrt(gx * gx + gy * gy) if l2gradient else jnp.abs(gx) + jnp.abs(gy)
    local_max = _nms(mag, gx, gy)
    strong = local_max & (mag >= high)
    weak = local_max & (mag >= low)

    def body(_, s):
        return weak & dilate(s, 3)

    grown = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    return grown | strong


@functools.partial(jax.jit, static_argnames=("window",))
def distance_transform_l2(edges: jnp.ndarray, window: int = 32) -> jnp.ndarray:
    """Euclidean distance (px) to the nearest edge pixel, exact up to `window`
    and clamped to `window` beyond. Two-pass separable squared-distance
    min-plus with 2*window+1 shifts per axis.
    """
    h, w = edges.shape
    big = jnp.float32(window * window * 4)
    f = jnp.where(edges, 0.0, big)  # (H, W) squared vertical seed

    def pass_axis(g, axis):
        out = g
        for d in range(1, window + 1):
            shift_p = jnp.roll(g, d, axis=axis)
            shift_n = jnp.roll(g, -d, axis=axis)
            # roll wraps; mask the wrapped region with `big`.
            idx = jnp.arange(g.shape[axis])
            mp = (idx >= d).astype(g.dtype)
            mn = (idx < g.shape[axis] - d).astype(g.dtype)
            if axis == 0:
                mp, mn = mp[:, None], mn[:, None]
            else:
                mp, mn = mp[None, :], mn[None, :]
            cand_p = shift_p * mp + big * (1 - mp) + d * d
            cand_n = shift_n * mn + big * (1 - mn) + d * d
            out = jnp.minimum(out, jnp.minimum(cand_p, cand_n))
        return out

    g = pass_axis(f, 0)     # min over rows: (r-r')^2 within column
    d2 = pass_axis(g, 1)    # + (c-c')^2 over columns
    return jnp.minimum(jnp.sqrt(d2), jnp.float32(window))


def dt_with_gradients(edges: jnp.ndarray, window: int = 32):
    """(gx, gy, dt) acceleration structure like the reference keyframe prep
    (imgpyramidrgbd.cpp:234-280): central differences halved.
    """
    dt = distance_transform_l2(edges, window)
    pad = jnp.pad(dt, 1, mode="edge")
    gx = 0.5 * (pad[1:-1, 2:] - pad[1:-1, :-2])
    gy = 0.5 * (pad[2:, 1:-1] - pad[:-2, 1:-1])
    return gx, gy, dt


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrDown equivalent: 5-tap gaussian then 2x subsample."""
    return gaussian_blur5(img)[::2, ::2]


def depth_pyr_down(depth: jnp.ndarray) -> jnp.ndarray:
    """Hole-aware 2x2 depth subsample: mean of the valid (>0) entries of each
    2x2 block; 0 when the block has no valid depth (imgpyramidrgbd.h:198-245).
    """
    h2, w2 = depth.shape[0] // 2, depth.shape[1] // 2
    d = depth[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2)
    valid = (d > 0).astype(depth.dtype)
    s = jnp.sum(d * valid, axis=(1, 3))
    c = jnp.sum(valid, axis=(1, 3))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray):
    """Sample (H, W) or (H, W, C) image at float pixel coords uv (..., 2).

    Returns (values, in_bounds mask). Border-safe (clamped); callers should
    mask with in_bounds.
    """
    h, w = img.shape[:2]
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, w - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, h - 2)
    in_b = (u >= 0) & (u <= w - 1.001) & (v >= 0) & (v <= h - 1.001)

    def gather(r, c):
        return img[r, c]

    i00 = gather(v0i, u0i)
    i01 = gather(v0i, u0i + 1)
    i10 = gather(v0i + 1, u0i)
    i11 = gather(v0i + 1, u0i + 1)
    if img.ndim == 3:
        fu = fu[..., None]
        fv = fv[..., None]
    val = (
        i00 * (1 - fu) * (1 - fv)
        + i01 * fu * (1 - fv)
        + i10 * (1 - fu) * fv
        + i11 * fu * fv
    )
    return val, in_b


def unpack_mask_bits(bits: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Expand an np.packbits-packed (H, ceil(W/8)) uint8 mask to (H, W) bool.

    Host->device edge-mask uploads travel bit-packed (~100 KB instead of
    ~800 KB of bool bytes on the ~20 MB/s tunneled link); np.packbits uses
    big-endian bit order within each byte."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    b = (bits[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return b.reshape(h, -1)[:, :w].astype(bool)


def gradient_sample_probs(gray: jnp.ndarray) -> jnp.ndarray:
    """Pixel sampling distribution proportional to |grad| (reference
    gradient-probability sampling, mapper_utils.py:169-190)."""
    gx, gy = sobel(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    p = mag.reshape(-1)
    return p / jnp.maximum(jnp.sum(p), 1e-8)


def gradient_mask(gray: jnp.ndarray, multiplier: float = 1.0) -> jnp.ndarray:
    """Median-threshold Scharr edge mask (gsr/camera.py:117-146)."""
    gx, gy = scharr(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    med = jnp.median(mag)
    return mag > multiplier * med
