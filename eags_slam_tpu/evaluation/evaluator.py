"""Post-hoc evaluation over saved run outputs.

Reference: src/evaluation/evaluator.py — trajectory eval (:111-114),
per-submap rendering eval PSNR / MS-SSIM / depth-L1 (:116-186; LPIPS needs
pretrained AlexNet weights, gated off in this environment), mesh/TSDF and the
30k-iter global refinement are later stages (SURVEY.md §7.2 stage 9).

Loads `estimated_c2w.npz` + `submaps/*.npz`, restores each submap into world
frame via the (loop-corrected) anchor chain, renders its keyframes, and
reports metrics to `rendering_metrics.json`.
"""
from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..ops.losses import psnr, ssim
from ..ops.rasterizer import RasterConfig, render
from ..core.sh import sh_to_rgb
from .trajectory import evaluate_trajectory


class Evaluator:
    def __init__(self, output_path: str, dataset, config: Dict):
        self.output_path = output_path
        self.dataset = dataset
        self.config = config
        self.cam: Camera = dataset.camera
        self.rcfg = RasterConfig(
            tile=16, dup_side=4,
            tile_capacity=int(config["mapping"].get("tile_capacity", 1024)),
            chunk=64,
        )
        z = np.load(os.path.join(output_path, "estimated_c2w.npz"))
        self.estimated_c2ws = z["c2ws"]
        self.exposures = z.get("exposures")

    # ------------------------------------------------------------------
    def run_trajectory_eval(self) -> Dict:
        n = len(self.dataset)
        gt = np.stack([self.dataset.poses[i] for i in range(n)])
        return evaluate_trajectory(
            self.estimated_c2ws[:n], gt, self.output_path
        )

    # ------------------------------------------------------------------
    def _submaps(self):
        for path in sorted(glob(os.path.join(self.output_path, "submaps", "*.npz"))):
            from ..slam.submap import Submap

            yield Submap.load(path)

    def run_rendering_eval(self) -> Dict:
        """Render each submap's keyframes from the restored world gaussians
        (reference :116-186)."""
        psnrs, ssims, depth_l1s = [], [], []
        Twm_chain = np.eye(4)
        for sm in self._submaps():
            Twm_chain = Twm_chain @ sm.T_prev_m
            g = sm.restore_world(Twm_chain)
            args = tuple(
                jnp.asarray(g[k])
                for k in ("xyz", "quats", "log_scales", "opacity_logits")
            )
            colors = sh_to_rgb(jnp.asarray(g["f_dc"]))
            for k, fid in enumerate(sm.kf_frame_ids):
                w2c = np.linalg.inv(Twm_chain @ sm.Tmc[k])
                out = render(
                    args[0], args[1], args[2], args[3], colors,
                    jnp.asarray(w2c, dtype=jnp.float32), self.cam, self.rcfg,
                )
                _, gt_color, gt_depth, _ = self.dataset[int(fid)]
                img = jnp.clip(out.color, 0.0, 1.0)
                gt_c = jnp.asarray(gt_color)
                psnrs.append(float(psnr(img, gt_c)))
                ssims.append(float(ssim(img, gt_c)))
                mask = gt_depth > 0
                dl1 = np.abs(np.asarray(out.depth) - gt_depth)[mask]
                depth_l1s.append(float(dl1.mean()) if dl1.size else 0.0)
        out = {
            "mean_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "mean_ssim": float(np.mean(ssims)) if ssims else 0.0,
            "mean_depth_l1": float(np.mean(depth_l1s)) if depth_l1s else 0.0,
            "num_views": len(psnrs),
        }
        with open(os.path.join(self.output_path, "rendering_metrics.json"), "w") as f:
            json.dump(out, f, indent=2)
        return out

    # ------------------------------------------------------------------
    def run(self) -> Dict:
        results = {"trajectory": self.run_trajectory_eval()}
        results["rendering"] = self.run_rendering_eval()
        with open(os.path.join(self.output_path, "evaluation.json"), "w") as f:
            json.dump(results, f, indent=2)
        return results
