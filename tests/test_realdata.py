"""Real-dataset smoke runs (VERDICT r3 next #10): exercised only when the
benchmark datasets exist on disk (`data/Replica/room0`, fetched by
`scripts/fetch_replica_room0.sh`). In this zero-egress container they SKIP;
in an environment with the datasets, `pytest -m realdata` gives real-scene
parity vs BASELINE.md targets in one command.

Reader failure modes these catch on real data (VERDICT r3 weak #3): TUM/
Replica depth-scale conventions, pose file layout, and the full SLAM loop's
behavior on non-synthetic frames.
"""
import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
ROOM0 = REPO / "data" / "Replica" / "room0"

realdata = pytest.mark.skipif(
    not (ROOM0 / "traj.txt").exists(),
    reason="Replica room0 not on disk (scripts/fetch_replica_room0.sh)",
)


@pytest.mark.realdata
@pytest.mark.slow
@realdata
def test_replica_room0_reader():
    from eags_slam_tpu.config import load_config
    from eags_slam_tpu.datasets import get_dataset

    config = load_config(str(REPO / "configs/Replica/room0.yaml"))
    config["data"]["input_path"] = str(ROOM0)
    ds = get_dataset(config["data"]["dataset_name"])(
        {**config, "frame_limit": 10}
    )
    assert len(ds) == 10
    idx, color, depth, pose = ds[0]
    assert color.shape == (680, 1200, 3) and color.dtype == np.float32
    assert 0.0 < color.mean() < 1.0
    # Replica depth: depth_scale 6553.5 -> meters in a room-scale range.
    d = depth[depth > 0]
    assert d.size and 0.1 < np.median(d) < 10.0
    assert np.allclose(pose[3], [0, 0, 0, 1])


@pytest.mark.realdata
@pytest.mark.slow
@realdata
def test_replica_room0_slam_50_frames(tmp_path):
    """50 frames of room0 through the FULL system; loose quality gates
    (BASELINE.md full-sequence targets are ATE ~0.3 cm / PSNR ~34 on 2000
    frames — 50 frames with submaps+VO should land well inside these)."""
    from eags_slam_tpu.config import load_config
    from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM

    config = load_config(str(REPO / "configs/Replica/room0.yaml"))
    config["data"]["input_path"] = str(ROOM0)
    config["data"]["output_path"] = str(tmp_path / "out")
    config["frame_limit"] = 50
    gslam = GaussianSLAM(config)
    try:
        gslam.run()
    finally:
        gslam.cleanup()

    from eags_slam_tpu.evaluation.evaluator import Evaluator

    ev = Evaluator(str(tmp_path / "out"), gslam.dataset, config)
    traj = ev.run_trajectory_eval()
    rend = ev.run_rendering_eval()
    ate_cm = 100.0 * float(traj["ate_aligned"]["rmse"])
    assert ate_cm < 2.0, f"room0 ATE {ate_cm:.2f} cm"
    assert float(rend["mean_psnr"]) > 27.0, rend["mean_psnr"]
