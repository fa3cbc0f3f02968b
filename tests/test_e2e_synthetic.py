"""End-to-end SLAM slice on the synthetic procedural room.

The synthetic dataset's frames are rendered from a GT gaussian scene with
this framework's own rasterizer, so the map model can represent the scene
exactly; with const_speed tracking the pipeline must recover a low-ATE
trajectory and a reasonable PSNR. This is the SURVEY.md §4 "synthetic-scene
integration test where GT poses are known".
"""
import numpy as np
import pytest

from eags_slam_tpu.config import load_config
from eags_slam_tpu.evaluation.evaluator import Evaluator
from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM


@pytest.fixture(scope="module")
def slam_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("slam_out")
    config = load_config("configs/synthetic/base.yaml")
    config["data"]["output_path"] = str(out)
    config["data"]["n_frames"] = 12
    config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                          "cx": 47.5, "cy": 31.5})
    config["mapping"]["new_submap_every"] = 6
    config["mapping"]["iterations"] = 60
    config["mapping"]["new_submap_iterations"] = 120
    config["mapping"]["max_gaussians"] = 8192
    config["mapping"]["new_submap_points_num"] = 2000
    config["mapping"]["new_submap_gradient_points_num"] = 500
    config["mapping"]["new_frame_sample_size"] = 500
    config["tracking"]["iterations"] = 20
    gslam = GaussianSLAM(config)
    try:
        report = gslam.run()
    finally:
        gslam.cleanup()
    return config, gslam, report, str(out)


def test_run_completes(slam_run):
    config, gslam, report, out = slam_run
    assert report["frames"] == 12
    assert report["fps"] > 0


def test_trajectory_accuracy(slam_run):
    config, gslam, report, out = slam_run
    ds = gslam.dataset
    gt = np.stack([ds.poses[i] for i in range(len(ds))])
    err = np.linalg.norm(
        gslam.estimated_c2ws[:, :3, 3] - gt[:, :3, 3], axis=-1
    )
    # Synthetic motion is ~1-2 cm/frame; tracking should stay within ~4 cm
    # (the model-error-induced pose bias of render-based tracking bounds
    # accuracy at roughly the rendered depth L1; fresh-submap frames are the
    # worst case).
    assert err.max() < 0.04, err


def test_outputs_and_evaluator(slam_run):
    config, gslam, report, out = slam_run
    ev = Evaluator(out, gslam.dataset, config)
    results = ev.run()
    assert results["trajectory"]["ate"]["rmse"] < 0.05
    assert results["rendering"]["mean_psnr"] > 20.0
    assert results["rendering"]["num_views"] > 0


def test_e2e_with_pipelined_cpu_vo(tmp_path):
    """Edge-VO in the loop with the CPU-pinned, one-frame-ahead pipelined
    odometer (the bench/tunneled-TPU configuration): the run completes and
    the trajectory stays sane, and the odometer candidate actually wins
    frames (it is being consumed, not recomputed)."""
    config = load_config("configs/synthetic/base.yaml")
    config["data"]["output_path"] = str(tmp_path / "out")
    config["data"]["n_frames"] = 8
    config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                          "cx": 47.5, "cy": 31.5})
    config["mapping"].update({
        "new_submap_every": 8, "iterations": 40, "new_submap_iterations": 80,
        "max_gaussians": 8192, "new_submap_points_num": 2000,
        "new_submap_gradient_points_num": 500, "new_frame_sample_size": 500,
    })
    config["tracking"].update({"iterations": 15, "odometry_type": "odometer"})
    config["vo"] = {"device": "cpu", "max_edge_points": 1024}
    gslam = GaussianSLAM(config)
    try:
        report = gslam.run()
    finally:
        gslam.cleanup()
    assert gslam.odometer is not None and gslam.odometer.on_cpu
    assert report["frames"] == 8
    ds = gslam.dataset
    gt = np.stack([ds.poses[i] for i in range(len(ds))])
    err = np.linalg.norm(
        gslam.estimated_c2ws[:, :3, 3] - gt[:, :3, 3], axis=-1
    )
    assert err.max() < 0.06, err
    cnt = report["tracker"]["init_pose_cnt"]
    assert sum(cnt.values()) == 6  # frames 2..7 tracked


def test_boundary_frame_is_mapped_when_misaligned(tmp_path):
    """Submap-boundary frames are mapped even when `new_submap_every` is not
    a multiple of `map_every` (reference gaussian_slam.py:246-252 maps on
    is_new_submap unconditionally). Regression: the fresh submap used to
    stay EMPTY until the next scheduled mapping frame, so the frames in
    between tracked against nothing (inf loss, raw-odometry poses)."""
    import json
    import os

    out = tmp_path / "out"
    config = load_config("configs/synthetic/base.yaml")
    config["data"]["output_path"] = str(out)
    config["data"]["n_frames"] = 8
    config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                          "cx": 47.5, "cy": 31.5})
    config["mapping"].update({
        # Boundary at frame 3 (anchor 0 + 3); mapping ids are 0,2,4,6 —
        # misaligned on purpose.
        "map_every": 2, "new_submap_every": 3,
        "iterations": 30, "new_submap_iterations": 60,
        "max_gaussians": 8192, "new_submap_points_num": 2000,
        "new_submap_gradient_points_num": 500, "new_frame_sample_size": 500,
    })
    config["tracking"]["iterations"] = 10
    gslam = GaussianSLAM(config)
    try:
        gslam.run()
    finally:
        gslam.cleanup()

    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "log.jsonl"))]
    mapped = {r["frame"] for r in rows if r.get("kind") == "mapping"}
    # Boundaries land on 3 and 6 (anchor advances to the boundary frame).
    assert 3 in mapped, mapped
    track_losses = [r["loss"] for r in rows if r.get("kind") == "tracking"]
    assert track_losses and all(np.isfinite(track_losses)), track_losses


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
