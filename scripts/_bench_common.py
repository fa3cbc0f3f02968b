"""Shared helpers for the TPU micro-bench scripts.

EAGS_RCFG lets one command sweep kernel-shape knobs without editing the
script, e.g.:

  EAGS_RCFG="tile=64,seg_cap=2048,group=4,dup_side=2" \
      python scripts/map_bench.py 262144

Keys map 1:1 onto RasterConfig fields; ints/floats/bools are parsed by the
field's current type. Unknown keys raise (typo protection).
"""
from __future__ import annotations

import os


def apply_rcfg_env(cfg):
    """Return cfg with EAGS_RCFG comma-separated overrides applied."""
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
    out = cfg._replace(**kv)
    print(f"EAGS_RCFG overrides: {kv}")
    return out
