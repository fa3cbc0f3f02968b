"""Global image descriptor for place recognition.

Role of NetVLAD in the reference (src/gsr/descriptor.py:14-28): image ->
R^4096 unit vector, cosine similarity drives loop-closure detection
(lc.py:97-202). The reference downloads pretrained VGG16+NetVLAD weights via
the hloc submodule — unavailable here (zero egress), and a learned extractor
is not load-bearing for the detection logic, which only needs a descriptor
whose cosine similarity is high for overlapping views.

This is a training-free GIST/HOG-style descriptor computed on device:
  - resize gray to a fixed 64x64 grid (bilinear average pooling);
  - Sobel gradient orientation histograms (8 bins, magnitude-weighted) over
    an 8x8 spatial grid  -> 512 dims;
  - mean RGB + gray over the same grid                      -> 256 dims;
  - coarse 4x4 luminance layout                              -> 16 dims;
padded/projected to `dim` (default 1024) and L2-normalized. Interface is
identical: `GlobalDesc()(image) -> (dim,)`, cosine similarity via dot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import rgb_to_gray, sobel


def _resize_avg(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Average-pool resize to (out_h, out_w) via jax.image (area-ish)."""
    return jax.image.resize(img, (out_h, out_w) + img.shape[2:], "linear")


@functools.partial(jax.jit, static_argnames=("dim",))
def global_descriptor(rgb: jnp.ndarray, dim: int = 1024) -> jnp.ndarray:
    """rgb (H, W, 3) float [0,1] -> (dim,) unit descriptor."""
    small = _resize_avg(rgb, 64, 64)
    gray = rgb_to_gray(small * 255.0)
    gx, gy = sobel(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    nbins = 8
    bin_idx = jnp.clip(
        ((ang + jnp.pi) / (2 * jnp.pi) * nbins).astype(jnp.int32), 0, nbins - 1
    )

    cell = 8  # 8x8 grid of 8x8-px cells
    cell_idx = (jnp.arange(64)[:, None] // cell) * 8 + (jnp.arange(64)[None, :] // cell)
    flat_cell = cell_idx.reshape(-1)
    flat_bin = bin_idx.reshape(-1)
    flat_mag = mag.reshape(-1)
    hog = jnp.zeros((64 * nbins,))
    hog = hog.at[flat_cell * nbins + flat_bin].add(flat_mag)
    hog = hog / jnp.maximum(jnp.linalg.norm(hog), 1e-6)

    color_grid = _resize_avg(small, 8, 8).reshape(-1)          # 192
    gray_grid = _resize_avg(gray, 8, 8).reshape(-1) / 255.0    # 64
    layout = _resize_avg(gray, 4, 4).reshape(-1) / 255.0       # 16

    def center(f):
        # Positive-only feature blocks share a large DC component, pushing
        # the cosine similarity of ANY two images toward ~0.9 and drowning
        # true matches; removing each block's mean (GIST-style whitening
        # lite) restores discrimination (measured in
        # tests/test_lc_round3.py's recall/precision scenario).
        return f - jnp.mean(f)

    feats = jnp.concatenate(
        [center(hog), center(color_grid), center(gray_grid), center(layout)]
    )

    if feats.shape[0] < dim:
        feats = jnp.pad(feats, (0, dim - feats.shape[0]))
    else:
        feats = feats[:dim]
    return feats / jnp.maximum(jnp.linalg.norm(feats), 1e-6)


class GlobalDesc:
    """Drop-in analog of the reference's NetVLAD wrapper.

    Weight-gated like LPIPS: when `weights/netvlad.npz` is present the full
    VGG16+NetVLAD architecture (lc/netvlad.py) is used (4096-d, as the
    reference's hloc NetVLAD, src/gsr/descriptor.py:14-28); otherwise the
    training-free HOG/GIST stand-in above (1024-d). Both produce unit
    vectors compared by dot product, so the detection logic is unchanged.
    """

    def __init__(self, dim: int = 1024):
        from . import netvlad

        self._net = netvlad.load() is not None
        self.dim = 4096 if self._net else dim

    def __call__(self, rgb) -> jnp.ndarray:
        if self._net:
            from . import netvlad

            return netvlad.describe(np.asarray(rgb))
        return global_descriptor(jnp.asarray(rgb), self.dim)
