"""Loop-closure manager end-to-end plumbing on a revisiting trajectory.

gt_camera tracking + identity registration keep it fast: the test verifies
detection (descriptor self-sim thresholds on a full orbit revisit), pose
graph construction/optimization, correction drain, and T_prev_m rewrite —
the full background pipeline of lc/loop_closure.py.
"""
import numpy as np
import pytest

from eags_slam_tpu.config import load_config
from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM


@pytest.fixture(scope="module")
def lc_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("lc_out")
    config = load_config("configs/synthetic/base.yaml")
    config["data"].update({
        "output_path": str(out),
        "n_frames": 18,
        "orbit_speed": 1.0 / 18.0,  # full revisit within the run
    })
    config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                          "cx": 47.5, "cy": 31.5})
    config["mapping"].update({
        "new_submap_every": 6, "iterations": 10, "new_submap_iterations": 15,
        "max_gaussians": 8192, "new_submap_points_num": 1500,
        "new_submap_gradient_points_num": 300, "new_frame_sample_size": 300,
        "submap_using_motion_heuristic": False,
    })
    config["tracking"]["gt_camera"] = True
    config["lc"] = {
        "enabled": True, "parallel": False, "min_interval": 2,
        "min_similarity": 0.5, "registration": "identity", "final": True,
        "capacity": 8192,
    }
    gslam = GaussianSLAM(config)
    try:
        gslam.run()
    finally:
        gslam.cleanup()
    return gslam, str(out)


def test_lc_ran_and_closed_loops(lc_run):
    gslam, out = lc_run
    lc = gslam.loop_closer
    assert lc is not None
    assert len(lc.infos) >= 3          # all submaps registered with LC
    # The orbit revisits its start: at least one closure must be detected.
    assert lc.n_closures >= 1, "no loop closures detected on a full orbit"


def test_lc_corrections_consistent(lc_run):
    gslam, out = lc_run
    # gt poses + identity registration => PGO must not corrupt the
    # trajectory (corrections stay tiny).
    gt = np.stack([gslam.dataset.poses[i] for i in range(len(gslam.dataset))])
    err = np.linalg.norm(
        gslam.estimated_c2ws[:, :3, 3] - gt[:, :3, 3], axis=-1
    )
    assert err.max() < 1e-3, err.max()


def test_lc_submap_files_rewritten(lc_run):
    from glob import glob

    from eags_slam_tpu.slam.submap import Submap

    gslam, out = lc_run
    files = sorted(glob(out + "/submaps/*.npz"))
    assert len(files) >= 3
    for f in files:
        sm = Submap.load(f)
        assert np.all(np.isfinite(sm.T_prev_m))


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
