"""Run logging/observability (reference src/entities/logger.py).

Console + JSONL structured logs; matplotlib panels and wandb uploads are
optional (both are debugging/visualization-only in the reference; wandb needs
network egress which this environment does not have, so it is gated).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Logger:
    def __init__(self, output_path: str, verbose: bool = False,
                 use_wandb: bool = False):
        self.output_path = output_path
        self.verbose = verbose
        self.use_wandb = use_wandb
        self._wandb = None
        if use_wandb:
            try:  # pragma: no cover - network-gated
                import wandb

                self._wandb = wandb
            except ImportError:
                self.use_wandb = False
        os.makedirs(output_path, exist_ok=True)
        self._jsonl = open(os.path.join(output_path, "log.jsonl"), "a")

    def log(self, kind: str, payload: Dict):
        rec = {"t": time.time(), "kind": kind, **payload}
        self._jsonl.write(json.dumps(rec, default=float) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log({f"{kind}/{k}": v for k, v in payload.items()
                             if isinstance(v, (int, float))})
        if self.verbose:
            print(f"[{kind}] " + ", ".join(f"{k}={v}" for k, v in payload.items()))

    def log_tracking(self, frame_id: int, stats: Dict):
        """Per-frame tracking summary (reference log_tracking_iteration)."""
        self.log("tracking", {"frame": frame_id, **stats})

    def log_mapping(self, frame_id: int, stats: Dict):
        self.log("mapping", {"frame": frame_id, **stats})

    def close(self):
        self._jsonl.close()
