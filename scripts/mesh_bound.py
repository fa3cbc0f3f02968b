#!/usr/bin/env python3
"""Mesh-quality upper bounds: split pose error vs map quality vs TSDF cost.

VERDICT r4 weak #4: the bench's mesh F1 (0.171 at tau=1 cm) had no
attribution — nothing separated (a) the TSDF+surface-nets pipeline's own
ceiling, (b) the rendered map's depth quality, and (c) pose error. This
script measures (a) directly: fuse GT sensor depth at GT poses — the best
any reconstruction path could do — through the SAME grid/fusion/meshing/
metrics code the evaluator runs, across voxel settings.

  python scripts/mesh_bound.py            # bench scene (1200x680, TPU)
  python scripts/mesh_bound.py --small    # CPU-sized smoke (240x136)

Prints one JSON line per (voxel, bounds) config:
  {"mode": "gt_depth_gt_pose", "voxel": ..., "f1": ..., ...}

Compare against the bench's reconstruction_metrics.json (rendered depth at
estimated poses) to attribute the remaining gap. Reference protocol:
/root/reference/src/evaluation/evaluate_reconstruction.py:257-290 (F-score
at tau=0.01) with Open3D TSDF voxel_length 5/512, sdf_trunc 0.04
(evaluator.py:196-229).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="CPU-sized scene (240x136) on the cpu backend")
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--kf_every", type=int, default=5)
    ap.add_argument("--voxels", type=float, nargs="*",
                    default=[0.02, 5.0 / 512.0])
    args = ap.parse_args()

    if args.small:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eags_slam_tpu.config import load_config
    from eags_slam_tpu.datasets import get_dataset
    from eags_slam_tpu.evaluation.mesh import (clean_mesh, mesh_metrics,
                                               sample_surface, surface_nets)
    from eags_slam_tpu.ops.tsdf import (grid_bounds_from_depths,
                                        grid_bounds_from_trajectory,
                                        integrate, make_grid)

    config = load_config("configs/synthetic/base.yaml")
    if args.small:
        config["cam"].update({"H": 136, "W": 240, "fx": 120.0, "fy": 120.0,
                              "cx": 119.5, "cy": 67.5})
    else:
        config["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                              "cx": 599.5, "cy": 339.5})
    config["data"].update({
        "dataset_name": "synthetic_hard", "n_frames": args.frames,
        "orbit_speed": 1.5 / 72.0, "depth_noise": 0.002,
        "depth_dropout": 0.003, "exposure_amp": 0.08,
    })
    ds = get_dataset(config["data"]["dataset_name"])(config)
    from eags_slam_tpu.core.camera import Camera

    cam = ds.camera
    kf_ids = list(range(0, len(ds), args.kf_every))
    print(f"# scene {cam.width}x{cam.height}, {len(ds)} frames, "
          f"{len(kf_ids)} keyframes", file=sys.stderr)

    frames = [ds[i] for i in kf_ids]          # (idx, color, depth, pose)
    depths = [f[2] for f in frames]
    poses = [f[3] for f in frames]

    # GT surface cloud: same sampling the evaluator uses (20k pts/kf —
    # denser than tau=1cm nearest-neighbor spacing; 2000/kf capped F1 at
    # ~0.22 even for this script's perfect-input fusion).
    rng = np.random.default_rng(0)
    gt_pts = []
    for (_, _, depth, c2w) in frames:
        H, W = depth.shape
        v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        m = depth > 0
        z = depth[m]
        pc = np.stack([(u[m] - cam.cx) / cam.fx * z,
                       (v[m] - cam.cy) / cam.fy * z, z], -1)
        sel = rng.choice(len(pc), min(20000, len(pc)), replace=False)
        c2w = np.asarray(c2w)
        gt_pts.append(pc[sel] @ c2w[:3, :3].T + c2w[:3, 3])
    gt_surface = np.concatenate(gt_pts)

    for voxel in args.voxels:
        for bounds_kind in ("trajectory", "depths"):
            t0 = time.time()
            if bounds_kind == "trajectory":
                origin, dims = grid_bounds_from_trajectory(
                    np.stack([np.asarray(p) for p in poses]), 6.0, voxel,
                    max_dim=384)
            else:
                origin, dims = grid_bounds_from_depths(
                    depths[::3], poses[::3], cam, voxel, max_dim=512)
            grid = make_grid(origin, dims, voxel, 4 * voxel)
            for (_, color, depth, c2w) in frames:
                w2c = jnp.asarray(np.linalg.inv(np.asarray(c2w)),
                                  dtype=jnp.float32)
                grid = integrate(grid, jnp.asarray(color),
                                 jnp.asarray(depth), w2c, cam)
            sdf = np.asarray(grid.sdf)
            weight = np.asarray(grid.weight)
            verts, faces = surface_nets(sdf, weight, np.asarray(grid.origin),
                                        grid.voxel)
            verts, faces = clean_mesh(verts, faces)
            line = {"mode": "gt_depth_gt_pose", "voxel": round(voxel, 5),
                    "bounds": bounds_kind, "dims": list(dims),
                    "n_vertices": int(len(verts)), "n_faces": int(len(faces))}
            if len(faces):
                pred = sample_surface(verts, faces, 200000)
                line.update({k: round(float(v), 4) for k, v in
                             mesh_metrics(pred, gt_surface, tau=0.01).items()})
            line["wall_s"] = round(time.time() - t0, 1)
            print(json.dumps(line), flush=True)
    ds.close()


if __name__ == "__main__":
    main()
