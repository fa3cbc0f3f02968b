#!/usr/bin/env python3
"""Convert LPIPS(alex) checkpoints to `weights/lpips_alex.npz`.

The reference reports LPIPS(alex) per rendered keyframe
(/root/reference/src/evaluation/evaluator.py:147-171, torchmetrics). This
zero-egress environment ships no pretrained weights, so
`eags_slam_tpu.evaluation.lpips` is weight-gated; users with the standard
checkpoints run this once and `rendering_metrics.json` gains real LPIPS
numbers instead of null.

Sources (both are needed; LPIPS = pretrained AlexNet trunk + linear heads):
  --alexnet  torchvision AlexNet state_dict (.pth): features.{0,3,6,8,10}
             .weight/.bias -> conv{1..5}_w/_b (OIHW, unchanged).
  --lins     lpips repo v0.1 alex head (.pth): lin{0..4}.model.1.weight
             (O, I, 1, 1) -> lin{1..5}_w (flattened to (I,)); LPIPS heads
             have O=1 and no bias.

Target schema (eags_slam_tpu/evaluation/lpips.py:5-8):
  conv{1..5}_w, conv{1..5}_b, lin{1..5}_w.

Usage:
  python scripts/convert_lpips.py --alexnet alexnet.pth --lins alex.pth \
      [--out weights/lpips_alex.npz]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

_FEATURE_IDX = (0, 3, 6, 8, 10)   # torchvision AlexNet conv layer indices


def convert(alexnet_path: str, lins_path: str, out_path: str):
    import torch

    sd = torch.load(alexnet_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    lins = torch.load(lins_path, map_location="cpu")
    if isinstance(lins, dict) and "state_dict" in lins:
        lins = lins["state_dict"]

    weights = {}
    for i, fi in enumerate(_FEATURE_IDX):
        weights[f"conv{i + 1}_w"] = np.asarray(
            sd[f"features.{fi}.weight"], np.float32
        )
        weights[f"conv{i + 1}_b"] = np.asarray(
            sd[f"features.{fi}.bias"], np.float32
        )
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lins:                   # some exports drop the prefix
            key = f"lins.{i}.model.1.weight"
        w = np.asarray(lins[key], np.float32)      # (1, C, 1, 1)
        weights[f"lin{i + 1}_w"] = w.reshape(-1)
    _validate(weights)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **weights)
    print(f"wrote {out_path}")


def _validate(w: dict):
    chans = (64, 192, 384, 256, 256)
    for i, c in enumerate(chans):
        assert w[f"conv{i + 1}_w"].ndim == 4
        assert w[f"conv{i + 1}_w"].shape[0] == c, \
            f"conv{i + 1}_w out-channels {w[f'conv{i + 1}_w'].shape[0]} != {c}"
        assert w[f"lin{i + 1}_w"].shape == (c,)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--alexnet", required=True)
    ap.add_argument("--lins", required=True)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "weights", "lpips_alex.npz"))
    a = ap.parse_args()
    convert(a.alexnet, a.lins, a.out)
