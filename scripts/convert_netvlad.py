#!/usr/bin/env python3
"""Convert a pretrained NetVLAD checkpoint to `weights/netvlad.npz`.

The reference downloads hloc's NetVLAD (VGG16 trunk + NetVLAD pooling + PCA
whitening, /root/reference/src/gsr/descriptor.py:14-28) at first run. This
environment has zero egress, so `eags_slam_tpu.lc.netvlad` is weight-gated:
users who have a checkpoint run this script once and the full architecture
activates (otherwise the HOG/GIST stand-in is used).

Supported sources:

1. hloc / matconvnet `.mat` struct (e.g. Pitts30K_struct.mat): layers are
   read from `net.layers` / `net.params` pairs in matconvnet order —
   13 VGG16 conv filters (H, W, I, O) -> OIHW, the NetVLAD soft-assignment
   conv `vlad:assign` (1, 1, D, K) + bias, cluster centers `vlad:centers`
   (D, K) -> (K, D), and the whitening projection `WPCA` (1, 1, K*D, 4096)
   + bias -> (4096, K*D).

2. A PyTorch `state_dict` (.pth, e.g. github.com/Nanne/pytorch-NetVlad,
   loaded with torch.load(map_location="cpu")): keys
   `encoder.<i>.weight/.bias` for the conv trunk (OIHW already),
   `pool.conv.weight` (K, D, 1, 1) / `pool.conv.bias`, `pool.centroids`
   (K, D), and optionally `whiten.weight` (4096, K*D) / `whiten.bias`.
   Checkpoints without a whitening head get an identity-slice projection
   (descriptor = first 4096 dims of the L2-normalized VLAD vector).

Target schema (eags_slam_tpu/lc/netvlad.py:12-18):
  conv{1..13}_w (OIHW), conv{1..13}_b, assign_w (K, D, 1, 1), assign_b (K,),
  centroids (K, D), pca_w (4096, K*D), pca_b (4096,).

Usage:
  python scripts/convert_netvlad.py <checkpoint.(mat|pth)> [out.npz]
"""
from __future__ import annotations

import os
import sys

import numpy as np

_N_CONV = 13


def _from_state_dict(sd) -> dict:
    """pytorch-NetVlad style state_dict -> npz dict."""
    out = {}
    enc = sorted(
        {k for k in sd if k.startswith("encoder.") and k.endswith(".weight")},
        key=lambda k: int(k.split(".")[1]),
    )
    convs = [k for k in enc if np.asarray(sd[k]).ndim == 4]
    if len(convs) < _N_CONV:
        raise ValueError(
            f"expected >= {_N_CONV} conv layers in encoder, got {len(convs)}"
        )
    for i, k in enumerate(convs[:_N_CONV]):
        base = k[: -len(".weight")]
        out[f"conv{i + 1}_w"] = np.asarray(sd[k], np.float32)
        out[f"conv{i + 1}_b"] = np.asarray(sd[base + ".bias"], np.float32)
    aw = np.asarray(sd["pool.conv.weight"], np.float32)     # (K, D, 1, 1)
    out["assign_w"] = aw.reshape(aw.shape[0], aw.shape[1], 1, 1)
    if "pool.conv.bias" in sd:
        out["assign_b"] = np.asarray(sd["pool.conv.bias"], np.float32)
    else:
        out["assign_b"] = np.zeros((aw.shape[0],), np.float32)
    out["centroids"] = np.asarray(sd["pool.centroids"], np.float32)
    k, d = out["centroids"].shape
    if "whiten.weight" in sd:
        out["pca_w"] = np.asarray(sd["whiten.weight"], np.float32)
        out["pca_b"] = np.asarray(
            sd.get("whiten.bias", np.zeros(out["pca_w"].shape[0])), np.float32
        )
    else:
        n_out = min(4096, k * d)
        pca = np.zeros((n_out, k * d), np.float32)
        pca[np.arange(n_out), np.arange(n_out)] = 1.0
        out["pca_w"] = pca
        out["pca_b"] = np.zeros((n_out,), np.float32)
    return out


def _from_mat(path: str) -> dict:
    """hloc/matconvnet NetVLAD .mat struct -> npz dict."""
    from scipy.io import loadmat

    mat = loadmat(path, struct_as_record=False, squeeze_me=True)
    net = mat["net"]
    params = {p.name: np.asarray(p.value, np.float32) for p in net.params}

    out = {}
    conv_names = [n for n in params if n.endswith("f") and
                  params[n].ndim == 4 and not n.startswith(("vlad", "WPCA"))]
    # matconvnet keeps layer order in net.layers; fall back to name sort.
    try:
        order = [l.params[0] for l in net.layers
                 if getattr(l, "params", None) is not None
                 and len(np.atleast_1d(l.params)) and
                 np.atleast_1d(l.params)[0] in conv_names]
        order = [np.atleast_1d(o)[0] for o in order]
    except Exception:
        order = sorted(conv_names)
    if len(order) < _N_CONV:
        order = sorted(conv_names)
    for i, name in enumerate(order[:_N_CONV]):
        w = params[name]                       # (H, W, I, O) matconvnet
        out[f"conv{i + 1}_w"] = np.transpose(w, (3, 2, 0, 1))
        out[f"conv{i + 1}_b"] = params[name[:-1] + "b"].reshape(-1)
    aw = params["vlad:assignf" if "vlad:assignf" in params else "assignf"]
    out["assign_w"] = np.transpose(aw, (3, 2, 0, 1))        # (K, D, 1, 1)
    ab_key = "vlad:assignb" if "vlad:assignb" in params else "assignb"
    out["assign_b"] = params.get(
        ab_key, np.zeros((out["assign_w"].shape[0],), np.float32)
    ).reshape(-1)
    cen = params["vlad:centers" if "vlad:centers" in params else "centers"]
    out["centroids"] = cen.T                                 # (K, D)
    ww = params["WPCAf"]                                     # (1,1,KD,4096)
    out["pca_w"] = ww.reshape(ww.shape[-2], ww.shape[-1]).T  # (4096, K*D)
    out["pca_b"] = params.get(
        "WPCAb", np.zeros((out["pca_w"].shape[0],), np.float32)
    ).reshape(-1)
    return out


def convert(src: str, dst: str):
    if src.endswith(".mat"):
        weights = _from_mat(src)
    else:
        import torch

        sd = torch.load(src, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        weights = _from_state_dict(sd)
    _validate(weights)
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    np.savez(dst, **weights)
    print(f"wrote {dst}: " + ", ".join(
        f"{k}{list(v.shape)}" for k, v in sorted(weights.items())[:6]) + ", ...")


def _validate(w: dict):
    for i in range(1, _N_CONV + 1):
        assert w[f"conv{i}_w"].ndim == 4, f"conv{i}_w must be OIHW"
        assert w[f"conv{i}_b"].ndim == 1
    k, d = w["centroids"].shape
    assert w["assign_w"].shape == (k, d, 1, 1)
    assert w["assign_b"].shape == (k,)
    assert w["pca_w"].shape[1] == k * d
    assert w["pca_b"].shape == (w["pca_w"].shape[0],)


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "weights", "netvlad.npz"
    )
    convert(sys.argv[1], out)
