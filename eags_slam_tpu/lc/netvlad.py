"""NetVLAD global descriptor in JAX (gated on pretrained weights).

The reference uses hloc's NetVLAD (VGG16 trunk -> NetVLAD pooling over 64
clusters -> PCA/whitening to 4096 dims, src/gsr/descriptor.py:14-28) with
weights downloaded at first run. This zero-egress environment ships no
checkpoint, so — like LPIPS (evaluation/lpips.py) — the full architecture
is implemented here and activates when a weights file is dropped in at
`weights/netvlad.npz`; otherwise `load()` returns None and the loop-closure
descriptor falls back to the training-free HOG/GIST stand-in
(lc/descriptor.py).

Expected npz keys:
  conv{1..13}_w (OIHW), conv{1..13}_b       VGG16 conv trunk (through
                                            conv5_3, no maxpool after it)
  assign_w (K, D, 1, 1), assign_b (K,)      NetVLAD soft-assignment conv
  centroids (K, D)                          cluster centers (K=64, D=512)
  pca_w (4096, K*D), pca_b (4096,)          whitening projection

Pipeline per hloc/NetVLAD (Arandjelovic et al. 2016):
  feats  = VGG16(image*255 - mean)          (H', W', 512), L2-норм per pixel
  a      = softmax(conv1x1(feats))          (H', W', K)
  vlad_k = sum_p a_pk (f_p - c_k)           (K, D)
  intra-normalize each vlad_k, flatten, L2, PCA, L2 -> (4096,)
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHTS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "weights", "netvlad.npz"
)
_NET = None

# VGG16 conv layout: (out_channels, maxpool_after)
_VGG = [
    (64, False), (64, True),
    (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False), (512, False),  # conv5_3, no final pool
]
_RGB_MEAN = np.array([123.68, 116.779, 103.939], np.float32)


def load(path: Optional[str] = None):
    """Returns the weights dict, or None when the gate is closed."""
    global _NET
    if _NET is not None:
        return _NET if _NET is not False else None
    p = path or _WEIGHTS_PATH
    if not os.path.exists(p):
        _NET = False
        return None
    z = np.load(p)
    _NET = {k: jnp.asarray(z[k]) for k in z.files}
    return _NET


def _conv_relu(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jax.nn.relu(out + b[None, :, None, None])


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


@jax.jit
def _forward(net, rgb255: jnp.ndarray) -> jnp.ndarray:
    """rgb255 (H, W, 3) float in [0, 255] -> (4096,) unit descriptor."""
    x = (rgb255 - jnp.asarray(_RGB_MEAN))[None].transpose(0, 3, 1, 2)
    for i, (_, pool) in enumerate(_VGG):
        x = _conv_relu(x, net[f"conv{i + 1}_w"], net[f"conv{i + 1}_b"])
        if pool:
            x = _maxpool2(x)
    # (1, D, H', W') -> (P, D), L2 per descriptor (hloc normalizes input
    # features before VLAD aggregation).
    d = x.shape[1]
    f = x[0].reshape(d, -1).T                                  # (P, D)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)

    aw = net["assign_w"].reshape(net["assign_w"].shape[0], d)  # (K, D)
    logits = f @ aw.T + net["assign_b"][None, :]               # (P, K)
    a = jax.nn.softmax(logits, axis=-1)
    c = net["centroids"]                                       # (K, D)
    # vlad_k = sum_p a_pk f_p - (sum_p a_pk) c_k
    vlad = a.T @ f - jnp.sum(a, axis=0)[:, None] * c           # (K, D)
    vlad = vlad / jnp.maximum(
        jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12
    )
    v = vlad.reshape(-1)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    out = net["pca_w"] @ v + net["pca_b"]
    return out / jnp.maximum(jnp.linalg.norm(out), 1e-12)


def describe(rgb01: np.ndarray, resize_max: int = 1024) -> jnp.ndarray:
    """Image [0,1] -> 4096-d unit descriptor (resize_max per hloc's conf)."""
    net = load()
    assert net is not None, "netvlad weights not loaded"
    img = jnp.asarray(rgb01) * 255.0
    h, w = img.shape[:2]
    m = max(h, w)
    if m > resize_max:
        s = resize_max / m
        img = jax.image.resize(
            img, (int(round(h * s)), int(round(w * s)), 3), "linear"
        )
    return _forward(net, img)
