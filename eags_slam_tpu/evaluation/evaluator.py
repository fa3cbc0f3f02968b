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
from ..ops.losses import ms_ssim, psnr, ssim
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
        (reference :116-186). LPIPS is weights-gated (evaluation/lpips.py)."""
        from .lpips import lpips

        psnrs, ssims, ms_ssims, depth_l1s, lpipss = [], [], [], [], []
        save_render = bool(self.config.get("evaluation", {}).get(
            "save_render", False))
        render_dir = os.path.join(self.output_path, "eval_render")
        if save_render:
            os.makedirs(render_dir, exist_ok=True)
        Twm_chain = np.eye(4)
        for sm in self._submaps():
            Twm_chain = Twm_chain @ sm.T_prev_m
            g = sm.restore_world(Twm_chain)
            # Pad to a static capacity bucket: one compiled render program
            # serves every submap size (per-submap compiles take minutes on
            # the tunneled TPU).
            from ..core.gaussians import bucket_for

            n = g["xyz"].shape[0]
            cap = bucket_for(n, 1 << 22)
            alive = jnp.arange(cap) < n

            def pad(x, fill=0.0):
                out = np.full((cap,) + x.shape[1:], fill, x.dtype)
                out[:n] = x
                return jnp.asarray(out)

            args = (pad(g["xyz"]), pad(g["quats"]),
                    pad(g["log_scales"], -10.0),
                    pad(g["opacity_logits"], -10.0))
            colors = sh_to_rgb(pad(g["f_dc"]))
            for k, fid in enumerate(sm.kf_frame_ids):
                w2c = np.linalg.inv(Twm_chain @ sm.Tmc[k])
                out = render(
                    args[0], args[1], args[2], args[3], colors,
                    jnp.asarray(w2c, dtype=jnp.float32), self.cam, self.rcfg,
                    alive=alive,
                )
                _, gt_color, gt_depth, _ = self.dataset[int(fid)]
                img = out.color
                if self.exposures is not None:
                    # Exposure-compensated comparison (the tracker estimates
                    # per-frame (a, b); observations carry real auto-exposure
                    # drift — reference evaluator renders the compensated
                    # image, evaluator.py:147-171).
                    a, b = self.exposures[int(fid)]
                    img = img * float(np.exp(a)) + float(b)
                img = jnp.clip(img, 0.0, 1.0)
                gt_c = jnp.asarray(gt_color)
                psnrs.append(float(psnr(img, gt_c)))
                ssims.append(float(ssim(img, gt_c)))
                # MS-SSIM needs min(H, W) > (win-1)*2**4 = 160 (5 scales),
                # same constraint pytorch_msssim enforces; skip on tiny
                # test frames.
                if min(img.shape[0], img.shape[1]) > 160:
                    ms_ssims.append(float(ms_ssim(img, gt_c)))
                lp = lpips(img, gt_c)
                if lp is not None:
                    lpipss.append(lp)
                mask = gt_depth > 0
                dl1 = np.abs(np.asarray(out.depth) - gt_depth)[mask]
                depth_l1s.append(float(dl1.mean()) if dl1.size else 0.0)
                if save_render:
                    from PIL import Image

                    Image.fromarray(
                        (np.asarray(img) * 255).astype(np.uint8)
                    ).save(os.path.join(render_dir, f"{int(fid):05d}.png"))
        out = {
            "mean_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "mean_ssim": float(np.mean(ssims)) if ssims else 0.0,
            "mean_ms_ssim": float(np.mean(ms_ssims)) if ms_ssims else None,
            "mean_depth_l1": float(np.mean(depth_l1s)) if depth_l1s else 0.0,
            "mean_lpips": float(np.mean(lpipss)) if lpipss else None,
            "num_views": len(psnrs),
        }
        with open(os.path.join(self.output_path, "rendering_metrics.json"), "w") as f:
            json.dump(out, f, indent=2)
        return out

    # ------------------------------------------------------------------
    def run_reconstruction_eval(self) -> Dict:
        """TSDF-fuse rendered keyframes, extract + clean mesh, mesh metrics
        vs. the GT surface (reference :188-243 + evaluate_reconstruction.py).

        The GT surface is a supplied GT mesh (`evaluation.gt_mesh` ply path,
        reference clean_mesh + F-score path :257-290) when available,
        otherwise the sensor-depth point cloud. Also reports the
        1000-random-virtual-view unseen depth-L1 (reference :97-197).
        """
        from ..ops.tsdf import (grid_bounds_from_depths, integrate,
                                make_grid)
        from ..slam.submap import Submap
        from .mesh import (clean_mesh, load_ply, mesh_metrics, sample_surface,
                           save_ply, surface_nets, unseen_depth_l1)

        # Reference parity: Open3D voxel_length 5/512 ~ 0.0098 m, sdf_trunc
        # 0.04 (reference evaluator.py:196-229). The earlier 0.02 default
        # cost most of the F-score at tau=0.01: surface placement error
        # scales with the voxel, so a 2 cm grid cannot score against a 1 cm
        # threshold (measured: scripts/mesh_bound.py).
        ev_cfg = self.config.get("evaluation", {})
        voxel = float(ev_cfg.get("mesh_voxel", 5.0 / 512.0))
        trunc = 4 * voxel
        n = len(self.dataset)
        # Tight bounds from a few real depth frames at their estimated
        # poses — the trajectory +-depth_max box would make max_dim clip
        # the scene at 1 cm voxels.
        sel = np.unique(np.linspace(0, n - 1, 8).astype(int))
        origin, dims = grid_bounds_from_depths(
            [self.dataset[int(i)][2] for i in sel],
            [self.estimated_c2ws[int(i)] for i in sel],
            self.cam, voxel=voxel,
            max_dim=int(ev_cfg.get("mesh_max_dim", 512)),
        )
        grid = make_grid(origin, dims, voxel, trunc)

        gt_pts = []
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
                c2w = Twm_chain @ sm.Tmc[k]
                w2c = jnp.asarray(np.linalg.inv(c2w), dtype=jnp.float32)
                out = render(args[0], args[1], args[2], args[3], colors, w2c,
                             self.cam, self.rcfg)
                rdepth = np.asarray(out.depth)
                ralpha = np.asarray(out.alpha)
                depth_n = np.where(ralpha > 0.5, rdepth / np.maximum(ralpha, 1e-6), 0.0)
                grid = integrate(
                    grid, jnp.clip(out.color, 0, 1),
                    jnp.asarray(depth_n.astype(np.float32)), w2c, self.cam,
                )
                # GT surface samples from the sensor depth. Density matters:
                # at 2000 pts/frame the GT cloud's nearest-neighbor spacing
                # is ~3-5 cm for a room, so precision@tau=1cm is bounded by
                # SAMPLING, not surface error (measured: a GT-depth/GT-pose
                # fusion scored F1 0.22 — scripts/mesh_bound.py). 20k/frame
                # brings the spacing safely under tau.
                _, _, gt_depth, _ = self.dataset[int(fid)]
                from ..core.camera import backproject

                pc = np.asarray(backproject(self.cam, jnp.asarray(gt_depth)))
                mask = gt_depth > 0
                pts_cam = pc[mask]
                n_gt = int(ev_cfg.get("gt_samples_per_frame", 20000))
                sel = np.random.default_rng(0).choice(
                    len(pts_cam), min(n_gt, len(pts_cam)), replace=False
                )
                pts_w = pts_cam[sel] @ np.asarray(c2w)[:3, :3].T + np.asarray(c2w)[:3, 3]
                gt_pts.append(pts_w)

        verts, faces = surface_nets(
            np.asarray(grid.sdf), np.asarray(grid.weight),
            np.asarray(grid.origin), grid.voxel,
        )
        verts, faces = clean_mesh(verts, faces)
        mesh_dir = os.path.join(self.output_path, "mesh")
        os.makedirs(mesh_dir, exist_ok=True)
        save_ply(os.path.join(mesh_dir, "cleaned_mesh.ply"), verts, faces)

        ev = self.config.get("evaluation", {})
        gt_mesh_path = ev.get("gt_mesh")
        if gt_mesh_path and os.path.exists(gt_mesh_path):
            gv, gf = load_ply(gt_mesh_path)
            gt_surface = sample_surface(gv, gf, 200000)
            gt_source = "gt_mesh"
        else:
            gt_surface = np.concatenate(gt_pts) if gt_pts else np.zeros((0, 3))
            gt_source = "sensor_depth"

        out: Dict = {"n_vertices": int(len(verts)), "n_faces": int(len(faces)),
                     "gt_source": gt_source}
        if len(faces) and len(gt_surface):
            pred_pts = sample_surface(
                verts, faces, int(ev.get("mesh_samples", 200000)))
            out.update(mesh_metrics(pred_pts, gt_surface, tau=0.01))
            n_views = int(ev.get("unseen_views", 1000))
            if n_views > 0:
                out["depth_l1_sample_view"] = unseen_depth_l1(
                    sample_surface(verts, faces, 200000), gt_surface,
                    n_views=n_views, res=int(ev.get("unseen_res", 128)),
                )
        with open(os.path.join(self.output_path,
                               "reconstruction_metrics.json"), "w") as f:
            json.dump(out, f, indent=2)
        return out

    def run_global_map_eval(self) -> Dict:
        """Merge submaps + full-SH global refinement + re-render metrics
        (reference :245-360)."""
        from ..core.sh import sh_colors
        from ..slam.submap import Submap
        from .merged_map import merge_submaps, refine_global_map

        dicts = []
        Twm_chain = np.eye(4)
        kf_ids = []
        for sm in self._submaps():
            Twm_chain = Twm_chain @ sm.T_prev_m
            dicts.append(sm.restore_world(Twm_chain))
            kf_ids.extend(int(f) for f in sm.kf_frame_ids)
        if not dicts:
            return {}
        merged = merge_submaps(dicts)

        exposures = self.exposures if self.exposures is not None else np.zeros(
            (len(self.dataset), 2)
        )

        def frame_fn(fid):
            _, color, depth, _ = self.dataset[fid]
            return color, depth, self.estimated_c2ws[fid], exposures[fid]

        iters = int(self.config.get("evaluation", {}).get(
            "global_refine_iters", 30000))
        params, alive = refine_global_map(
            merged, frame_fn, sorted(set(kf_ids)), self.cam, self.rcfg,
            iterations=iters,
        )

        psnrs, ssims, ms_ssims = [], [], []
        for fid in sorted(set(kf_ids)):
            _, color, depth, _ = self.dataset[fid]
            c2w = self.estimated_c2ws[fid]
            rgb = sh_colors(3, params.f_dc, params.f_rest, params.xyz,
                            jnp.asarray(c2w[:3, 3], dtype=jnp.float32))
            out = render(params.xyz, params.quats, params.log_scales,
                         params.opacity_logits, rgb,
                         jnp.asarray(np.linalg.inv(c2w), dtype=jnp.float32),
                         self.cam, self.rcfg, alive=jnp.asarray(alive))
            img = jnp.clip(out.color, 0, 1)
            gt_c = jnp.asarray(color)
            psnrs.append(float(psnr(img, gt_c)))
            ssims.append(float(ssim(img, gt_c)))
            if min(img.shape[0], img.shape[1]) > 160:
                ms_ssims.append(float(ms_ssim(img, gt_c)))
        res = {
            "mean_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "mean_ssim": float(np.mean(ssims)) if ssims else 0.0,
            "mean_ms_ssim": float(np.mean(ms_ssims)) if ms_ssims else None,
            "num_views": len(psnrs),
            "iterations": iters,
        }
        with open(os.path.join(self.output_path,
                               "rendering_metrics_global.json"), "w") as f:
            json.dump(res, f, indent=2)
        # Export the refined global map (reference mesh/global_splats.ply).
        from ..utils.ply import save_gaussian_ply

        mesh_dir = os.path.join(self.output_path, "mesh")
        os.makedirs(mesh_dir, exist_ok=True)
        keep = np.asarray(alive)
        save_gaussian_ply(
            os.path.join(mesh_dir, "global_splats.ply"),
            {
                "xyz": np.asarray(params.xyz)[keep],
                "f_dc": np.asarray(params.f_dc)[keep],
                "f_rest": np.asarray(params.f_rest)[keep],
                "log_scales": np.asarray(params.log_scales)[keep],
                "quats": np.asarray(params.quats)[keep],
                "opacity_logits": np.asarray(params.opacity_logits)[keep],
            },
        )
        return res

    def run_nvs_eval(self) -> Dict:
        """ScanNet++ novel-view PSNR on the held-out test split
        (reference :270-298). Requires a dataset exposing `test_ids`."""
        test_ids = sorted(getattr(self.dataset, "test_ids", []) or [])
        if not test_ids:
            return {}
        from ..core.sh import sh_to_rgb as _s2r

        psnrs = []
        Twm_chain = np.eye(4)
        submaps = list(self._submaps())
        chains = []
        for sm in submaps:
            Twm_chain = Twm_chain @ sm.T_prev_m
            chains.append(Twm_chain.copy())
        for fid in test_ids:
            if fid >= len(self.dataset):
                continue
            # Nearest submap by keyframe coverage.
            best = min(
                range(len(submaps)),
                key=lambda s: min(
                    abs(int(k) - fid) for k in submaps[s].kf_frame_ids
                ),
            )
            g = submaps[best].restore_world(chains[best])
            out = render(
                jnp.asarray(g["xyz"]), jnp.asarray(g["quats"]),
                jnp.asarray(g["log_scales"]), jnp.asarray(g["opacity_logits"]),
                _s2r(jnp.asarray(g["f_dc"])),
                jnp.asarray(np.linalg.inv(self.estimated_c2ws[fid]),
                            dtype=jnp.float32),
                self.cam, self.rcfg,
            )
            _, gt_color, _, _ = self.dataset[int(fid)]
            psnrs.append(float(psnr(jnp.clip(out.color, 0, 1),
                                    jnp.asarray(gt_color))))
        res = {"nvs_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
               "num_views": len(psnrs)}
        nvs_dir = os.path.join(self.output_path, "nvs_eval")
        os.makedirs(nvs_dir, exist_ok=True)
        with open(os.path.join(nvs_dir, "results.json"), "w") as f:
            json.dump(res, f, indent=2)
        return res

    # ------------------------------------------------------------------
    def run(self) -> Dict:
        results = {"trajectory": self.run_trajectory_eval()}
        results["rendering"] = self.run_rendering_eval()
        if getattr(self.dataset, "test_ids", None):
            results["nvs"] = self.run_nvs_eval()
        ev = self.config.get("evaluation", {})
        if ev.get("eval_mesh", False):
            results["reconstruction"] = self.run_reconstruction_eval()
        if ev.get("eval_global", False):
            results["global"] = self.run_global_map_eval()
        with open(os.path.join(self.output_path, "evaluation.json"), "w") as f:
            json.dump(results, f, indent=2)
        return results
