#!/usr/bin/env python3
"""End-to-end SLAM throughput benchmark (runs on the real TPU chip).

Runs the full pipeline (tracking refinement + mapping + submaps) on a
procedural synthetic scene at Replica resolution (1200x680) with
Replica-scale settings, measures steady-state end-to-end FPS (compile
warm-up excluded), and prints ONE JSON line.

Baseline: the reference publishes no numbers (BASELINE.md); literature for
this system family (Gaussian-SLAM / LoopSplat lineage) puts submap-based
GS-SLAM at ~1-2 FPS end-to-end on an RTX 4090 — we use 1.5 FPS as the
comparison point. The driver's target is >= 2x reference (BASELINE.json).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

BASELINE_FPS = 1.5  # RTX-4090 end-to-end GS-SLAM FPS (see module docstring)


def main():
    quick = "--quick" in sys.argv
    from eags_slam_tpu.config import load_config
    from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM

    config = load_config("configs/synthetic/base.yaml")
    config["data"]["output_path"] = "/tmp/bench_out"
    # Replica-scale shapes/settings.
    config["cam"].update(
        {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0, "cx": 599.5, "cy": 339.5}
    )
    config["data"].update({"n_frames": 10 if quick else 16,
                           "gaussians_per_wall": 4000, "tile_capacity": 512})
    config["mapping"].update(
        {
            "map_every": 2,
            "new_submap_every": 50,
            "iterations": 100,
            "new_submap_iterations": 100,
            "new_submap_points_num": 100000,
            "new_submap_gradient_points_num": 50000,
            "new_frame_sample_size": 30000,
            "max_gaussians": 1 << 18,
            "tile_capacity": 1024,
            "max_keyframes": 32,
        }
    )
    config["tracking"].update({"iterations": 60, "odometry_type": "const_speed"})
    config["lc"] = {"enabled": False}

    gslam = GaussianSLAM(config)
    try:
        n = len(gslam.dataset)
        # Warm-up: first frames trigger every compile path (new submap,
        # update mapping, tracking).
        warm = min(5, n - 1)
        t0 = time.perf_counter()
        times = []
        for frame_id in range(n):
            t_f = time.perf_counter()
            gslam_step(gslam, frame_id)
            dt = time.perf_counter() - t_f
            if frame_id >= warm:
                times.append(dt)
        steady_fps = len(times) / sum(times) if times else 0.0
    finally:
        gslam.cleanup()

    print(
        json.dumps(
            {
                "metric": "e2e_slam_fps_replica_scale",
                "value": round(steady_fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(steady_fps / BASELINE_FPS, 3),
            }
        )
    )


def gslam_step(gslam, frame_id):
    """One iteration of GaussianSLAM.run()'s frame loop."""
    import numpy as np
    import jax.numpy as jnp

    from eags_slam_tpu.core.se3 import const_speed_extrapolate

    _, color, depth, gt_pose = gslam.dataset[frame_id]
    if frame_id in (0, 1):
        gslam.estimated_c2ws[frame_id] = gt_pose
    else:
        candidates = {
            "const_speed": np.asarray(
                const_speed_extrapolate(
                    jnp.asarray(gslam.estimated_c2ws[frame_id - 2]),
                    jnp.asarray(gslam.estimated_c2ws[frame_id - 1]),
                )
            ),
            "previous": gslam.estimated_c2ws[frame_id - 1],
        }
        c2w, exposure, _ = gslam.tracker.track(
            gslam.state.params, gslam.state.alive,
            gslam.estimated_c2ws[frame_id - 1], candidates,
            jnp.asarray(color), jnp.asarray(depth),
        )
        gslam.estimated_c2ws[frame_id] = c2w

    is_new = False
    if frame_id != 0 and gslam.should_start_new_submap(frame_id):
        gslam.save_current_submap()
        gslam.start_new_submap(frame_id)
        is_new = True
    if frame_id in gslam.mapping_frame_ids:
        gslam.map_frame(frame_id, color, depth, is_new or frame_id == 0)


if __name__ == "__main__":
    main()
