"""Mapping/tracking losses.

Reference: src/entities/losses.py (L1 with agg modes, 11x11 sigma-1.5 windowed
SSIM, isotropic scale regularizer :129-139) and the PSNR helper
(src/utils/mapper_utils.py:293-302).

SSIM uses separable 1D convolutions (two small convs instead of one 11x11) —
the same math, fewer FLOPs, and XLA maps both onto the conv/MXU path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, agg: str = "mean") -> jnp.ndarray:
    diff = jnp.abs(pred - gt)
    if agg == "mean":
        return jnp.mean(diff)
    if agg == "sum":
        return jnp.sum(diff)
    return diff  # "none"


def masked_l1(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of |pred-gt| over mask (sum/count), 0-safe.

    `mask` may have fewer trailing dims than `pred` (e.g. an (H, W) mask
    against (H, W, 3) images); it broadcasts and the count scales by the
    broadcasted channels — same value as materializing the tiled mask,
    without the HBM traffic."""
    scale = 1.0
    if mask.ndim < pred.ndim:
        for d in pred.shape[mask.ndim:]:
            scale *= d
        mask = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim))
    diff = jnp.abs(pred - gt) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask) * scale, 1.0)


def _band_matrix(n: int, g: jnp.ndarray, half: int) -> jnp.ndarray:
    """(n, n) banded blur matrix: B[i, j] = g[j - i + half] for |i-j|<=half
    (zero-padded borders — F.conv2d SAME semantics, like the reference's
    windowed SSIM)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = j - i + half
    ok = (d >= 0) & (d <= 2 * half)
    return jnp.where(ok, g[jnp.clip(d, 0, 2 * half)], 0.0)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) pair. Gaussian window sigma=1.5.

    The separable blur runs as two BANDED MATMULS instead of C=1
    convolutions: single-feature convs lower poorly on TPU, while
    (H, H) @ (H, W*C) and (H*C, W) @ (W, W) land on the MXU at trivial
    FLOP counts for these frame sizes."""
    sigma = 1.5
    half = window_size // 2
    x = jnp.arange(window_size, dtype=jnp.float32) - half
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)

    if img1.ndim == 2:
        h, w = img1.shape
        c = 1
        img1 = img1[..., None]
        img2 = img2[..., None]
    else:
        h, w, c = img1.shape
    bh = _band_matrix(h, g, half)       # vertical blur (applied from left)
    bw = _band_matrix(w, g, half)       # horizontal (applied from right)

    # ONE blur over all 5 SSIM quantities stacked on the channel axis
    # (img1, img2, img1^2, img2^2, img1*img2): two banded matmuls total
    # instead of ten — the matmuls were launch/bandwidth-bound, not
    # FLOP-bound, at frame sizes.
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )
    cs = 5 * c
    tmp = (bh @ stack.reshape(h, w * cs)).reshape(h, w, cs)
    t = jnp.transpose(tmp, (0, 2, 1)).reshape(h * cs, w)
    blurred = jnp.transpose((t @ bw).reshape(h, cs, w), (0, 2, 1))
    mu1, mu2, m11, m22, m12 = (
        blurred[..., :c], blurred[..., c:2 * c], blurred[..., 2 * c:3 * c],
        blurred[..., 3 * c:4 * c], blurred[..., 4 * c:],
    )
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu12
    C1, C2 = 0.01**2, 0.03**2
    # Separable-blur variance estimates can go slightly negative on flat
    # regions, pushing SSIM past 1 (and (1-ssim) losses negative); clamp.
    sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
    sigma2_sq = jnp.maximum(sigma2_sq, 0.0)
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(jnp.clip(ssim_map, -1.0, 1.0))


def _ssim_cs(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int):
    """Mean SSIM and mean contrast-structure (cs) over the VALID region —
    no-padding window statistics, the convention of pytorch_msssim (which
    the reference uses for its MS-SSIM metric,
    src/evaluation/evaluator.py:147-171). The SAME-padded banded blur equals
    a valid convolution everywhere `half` pixels away from the border, so
    valid = blur + crop."""
    sigma = 1.5
    half = window_size // 2
    x = jnp.arange(window_size, dtype=jnp.float32) - half
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)

    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    h, w, c = img1.shape
    bh = _band_matrix(h, g, half)
    bw = _band_matrix(w, g, half)
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )
    cs5 = 5 * c
    tmp = (bh @ stack.reshape(h, w * cs5)).reshape(h, w, cs5)
    t = jnp.transpose(tmp, (0, 2, 1)).reshape(h * cs5, w)
    blurred = jnp.transpose((t @ bw).reshape(h, cs5, w), (0, 2, 1))
    blurred = blurred[half:h - half, half:w - half]
    mu1, mu2, m11, m22, m12 = (
        blurred[..., :c], blurred[..., c:2 * c], blurred[..., 2 * c:3 * c],
        blurred[..., 3 * c:4 * c], blurred[..., 4 * c:],
    )
    C1, C2 = 0.01**2, 0.03**2
    sigma1_sq = m11 - mu1 * mu1
    sigma2_sq = m22 - mu2 * mu2
    sigma12 = m12 - mu1 * mu2
    cs_map = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    ssim_map = ((2 * mu1 * mu2 + C1) / (mu1 * mu1 + mu2 * mu2 + C1)) * cs_map
    # Per-channel means (pytorch_msssim averages over channels only after
    # the cross-scale product).
    return jnp.mean(ssim_map, axis=(0, 1)), jnp.mean(cs_map, axis=(0, 1))


def _avg_pool2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool with zero padding on odd dims,
    count_include_pad — F.avg_pool2d(x, 2, padding=dim%2) parity
    (pytorch_msssim's inter-scale downsample)."""
    h, w = img.shape[:2]
    ph, pw = h % 2, w % 2
    pads = ((ph, ph), (pw, pw)) + ((0, 0),) * (img.ndim - 2)
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add,
        (2, 2) + (1,) * (img.ndim - 2), (2, 2) + (1,) * (img.ndim - 2), pads,
    )
    return s * 0.25


# Standard 5-scale MS-SSIM weights (Wang et al. 2003; pytorch_msssim default).
MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray,
            window_size: int = 11) -> jnp.ndarray:
    """Multi-scale SSIM over an (H, W[, C]) pair in [0, 1].

    Algorithm and constants match pytorch_msssim.ms_ssim (the reference's
    metric backend, src/evaluation/evaluator.py:147-171): 5 scales, cs at
    scales 1-4 + full SSIM at scale 5, relu'd means, 2x avg-pool between
    scales, product of powers with the standard weights. Requires
    min(H, W) > (window_size - 1) * 16 (same constraint as the library)."""
    vals = []
    for lvl in range(5):
        s, cs = _ssim_cs(img1, img2, window_size)
        vals.append(s if lvl == 4 else cs)
        if lvl < 4:
            img1, img2 = _avg_pool2(img1), _avg_pool2(img2)
    vals = jax.nn.relu(jnp.stack(vals))  # (5, C); relu per pytorch_msssim
    w = jnp.asarray(MSSSIM_WEIGHTS)[:, None]
    return jnp.mean(jnp.prod(vals ** w, axis=0))


def isotropic_loss(log_scales: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """Penalize anisotropy: mean |s - mean(s)| over alive gaussians.

    Reference: src/entities/losses.py:129-139.
    """
    scales = jnp.exp(log_scales)
    mean_s = jnp.mean(scales, axis=-1, keepdims=True)
    per_g = jnp.mean(jnp.abs(scales - mean_s), axis=-1)
    w = alive.astype(per_g.dtype)
    return jnp.sum(per_g * w) / jnp.maximum(jnp.sum(w), 1.0)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
