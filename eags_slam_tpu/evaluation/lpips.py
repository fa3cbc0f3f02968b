"""LPIPS perceptual metric (gated on pretrained weights).

The reference reports LPIPS(alex) (src/evaluation/evaluator.py:147-171 via
torchmetrics). LPIPS needs pretrained AlexNet conv features + linear head
weights; this zero-egress environment ships no torchvision/lpips checkpoints,
so the metric is gated: place a weights file at `weights/lpips_alex.npz`
(keys: conv{1..5}_w, conv{1..5}_b, lin{1..5}_w) and `lpips()` becomes active;
otherwise it returns None and the evaluator reports `lpips: null`, keeping
json schemas stable.

The network itself is implemented here in JAX (AlexNet feature trunk +
unit-normalized feature distances + 1x1 linear heads), so enabling the metric
is purely a weights drop-in.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHTS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "weights", "lpips_alex.npz"
)
_NET = None


def _load():
    global _NET
    if _NET is not None:
        return _NET
    if not os.path.exists(_WEIGHTS_PATH):
        _NET = False
        return False
    z = np.load(_WEIGHTS_PATH)
    _NET = {k: jnp.asarray(z[k]) for k in z.files}
    return _NET


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _alex_features(params, x):
    """AlexNet trunk; returns the 5 relu feature maps LPIPS uses."""
    feats = []
    x = jax.nn.relu(_conv(x, params["conv1_w"], params["conv1_b"], 4, 2))
    feats.append(x)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                              (1, 1, 2, 2), "VALID")
    x = jax.nn.relu(_conv(x, params["conv2_w"], params["conv2_b"], 1, 2))
    feats.append(x)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                              (1, 1, 2, 2), "VALID")
    x = jax.nn.relu(_conv(x, params["conv3_w"], params["conv3_b"], 1, 1))
    feats.append(x)
    x = jax.nn.relu(_conv(x, params["conv4_w"], params["conv4_b"], 1, 1))
    feats.append(x)
    x = jax.nn.relu(_conv(x, params["conv5_w"], params["conv5_b"], 1, 1))
    feats.append(x)
    return feats


def lpips(img1, img2) -> Optional[float]:
    """LPIPS(alex) between (H, W, 3) images in [0, 1]; None if no weights."""
    params = _load()
    if params is False:
        return None
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])

    def prep(im):
        x = (jnp.asarray(im) - mean) / std
        return jnp.transpose(x, (2, 0, 1))[None]

    f1 = _alex_features(params, prep(img1))
    f2 = _alex_features(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        na = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        nb = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        d = (na - nb) ** 2
        w = params[f"lin{i + 1}_w"].reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1))
    return float(total)
