"""Shared helpers for the TPU micro-bench scripts.

EAGS_RCFG lets one command sweep kernel-shape knobs without editing the
script, e.g.:

  EAGS_RCFG="tile=64,seg_cap=2048,group=4,dup_side=2" \
      python scripts/map_bench.py 262144

The parser lives in the package (eags_slam_tpu.ops.rasterizer.apply_rcfg_env)
so GaussianSLAM-level runs (bench.py, run_slam.py) honor the same variable.
"""
from __future__ import annotations

from eags_slam_tpu.ops.rasterizer import apply_rcfg_env  # noqa: F401
