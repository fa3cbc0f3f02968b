#!/usr/bin/env python3
"""SLAM entry point: `python run_slam.py configs/<dataset>/<scene>.yaml [...]`.

Mirrors the reference CLI (run_slam.py:16-43 flags, :46-87 overrides,
:90-121 main: seed, run SLAM, then evaluate).
"""
import argparse
import os
import random

import numpy as np


def get_args():
    p = argparse.ArgumentParser(description="EAGS-SLAM-TPU")
    p.add_argument("config_path", type=str, help="scene yaml")
    p.add_argument("--input_path", type=str, default=None)
    p.add_argument("--output_path", type=str, default=None)
    p.add_argument("--frame_limit", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--map_every", type=int, default=None)
    p.add_argument("--new_submap_every", type=int, default=None)
    p.add_argument("--mapping_iterations", type=int, default=None)
    p.add_argument("--tracking_iterations", type=int, default=None)
    p.add_argument("--odometry_type", type=str, default=None,
                   choices=["gt", "const_speed", "odometer"])
    p.add_argument("--gt_camera", action="store_true", default=None)
    p.add_argument("--help_camera_initialization", action="store_true", default=None)
    p.add_argument("--soft_alpha", type=lambda s: s == "True", default=None)
    p.add_argument("--submap_using_motion_heuristic", type=lambda s: s == "True",
                   default=None)
    p.add_argument("--lc_parallel", type=lambda s: s == "True", default=None)
    p.add_argument("--lc_registration", type=str, default=None)
    p.add_argument("--lc_min_interval", type=int, default=None)
    p.add_argument("--lc_final", type=lambda s: s == "True", default=None)
    p.add_argument("--group_name", type=str, default=None)
    p.add_argument("--no_eval", action="store_true")
    return p.parse_args()


def setup_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def main():
    args = get_args()
    from eags_slam_tpu.config import load_config, update_config_with_args

    config = load_config(args.config_path)
    config = update_config_with_args(config, args)
    setup_seed(int(config.get("seed", 0)))

    from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM

    gslam = GaussianSLAM(config)
    try:
        report = gslam.run()
        print(f"FPS: {report['fps']:.3f}  ({report['total_s']:.1f}s for "
              f"{report['frames']} frames)")
        print(f"Track avg: {report['track_ms_avg']:.1f} ms, "
              f"Map avg: {report['map_ms_avg']:.1f} ms")
        if not args.no_eval:
            from eags_slam_tpu.evaluation.evaluator import Evaluator

            ev = Evaluator(config["data"]["output_path"], gslam.dataset, config)
            results = ev.run()
            ate = results["trajectory"]["ate"]["rmse"] * 100
            print(f"ATE-RMSE: {ate:.3f} cm, "
                  f"PSNR: {results['rendering']['mean_psnr']:.2f} dB, "
                  f"SSIM: {results['rendering']['mean_ssim']:.4f}")
    finally:
        gslam.cleanup()


if __name__ == "__main__":
    main()
