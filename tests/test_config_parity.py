"""Config-plumbing parity tests for the round-4 protocol fixes.

Covers: nested lc.registration parsing (reference configs/ScanNet/
scannet.yaml:66-70), plateau scheduler threading (reference
gaussian_model.py:382-383 + scheduler_factor/patience in every scene
config), the L1-gradient Canny fallback (reference gaussian_slam.py:253),
and new_frame_sample_size: -1 (reference mapper.py:327-331).
"""
import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.config import load_config
from eags_slam_tpu.lc.loop_closure import LoopClosure
from eags_slam_tpu.ops.image import canny
from eags_slam_tpu.slam.tracker import TrackerConfig


def _lc_from(lc_section):
    config = {
        "lc": dict(enabled=True, parallel=False, **lc_section),
        "mapping": {"max_gaussians": 64},
    }
    return LoopClosure(config, "/tmp/lc_cfg_test", cam=None, dataset=None)


def test_lc_registration_nested_dict_form():
    lc = _lc_from({
        "registration": {
            "method": "gs_reg",
            "base_lr": 0.005,
            "min_overlap_ratio": 0.35,
            "use_render": True,
        },
    })
    assert lc.registration == "gs_reg"
    assert lc.reg_base_lr == 0.005
    assert lc.overlap_thre == 0.35
    assert lc.use_render is True


def test_lc_registration_flat_string_form():
    lc = _lc_from({"registration": "icp", "overlap_thre": 0.2})
    assert lc.registration == "icp"
    assert lc.reg_base_lr == 1e-3
    assert lc.overlap_thre == 0.2
    assert lc.use_render is False


def test_tracker_plateau_defaults_match_reference():
    tcfg = TrackerConfig()
    assert tcfg.plateau_factor == 0.95
    assert tcfg.plateau_patience == 5


def test_scene_configs_carry_scheduler_keys():
    for scene in ("configs/Replica/replica.yaml",
                  "configs/TUM_RGBD/tum_rgbd.yaml",
                  "configs/ScanNet/scannet.yaml",
                  "configs/scannetpp/scannetpp.yaml"):
        cfg = load_config(scene)
        assert cfg["tracking"]["scheduler_factor"] == 0.95, scene
        assert cfg["tracking"]["scheduler_patience"] == 5, scene


def test_scannetpp_protocol_values():
    cfg = load_config("configs/scannetpp/scannetpp.yaml")
    m, t = cfg["mapping"], cfg["tracking"]
    assert m["new_submap_every"] == 100
    assert m["iterations"] == 400
    assert m["new_submap_iterations"] == 500
    assert m["new_frame_sample_size"] == 100000
    assert t["iterations"] == 300
    assert t["help_camera_initialization"] is True
    assert t["enable_exposure"] is False
    assert cfg["lc"]["min_similarity"] == 0.34
    assert cfg["lc"]["final"] is False


def test_canny_l1_gradient_differs_and_detects_edges():
    # A diagonal step edge: L1 (|gx|+|gy|) inflates diagonal magnitudes by
    # up to sqrt(2) vs L2, so a threshold can pass L1 and fail L2.
    img = np.zeros((32, 32), np.float32)
    ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    img[ii + jj >= 32] = 120.0
    e_l1 = np.asarray(canny(jnp.asarray(img), 100.0, 150.0, l2gradient=False))
    e_l2 = np.asarray(canny(jnp.asarray(img), 100.0, 150.0, l2gradient=True))
    assert e_l1.sum() > 0
    # L1 magnitude >= L2 everywhere -> the L1 edge set is a superset here.
    assert e_l1.sum() >= e_l2.sum()


def test_new_frame_sample_size_minus_one_maps_to_full_frame(tmp_path):
    # The orchestrator maps -1 -> H*W (static shape, invalid ids masked
    # downstream) and forces the Canny edge fallback for scannetpp.
    from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM

    cfg = load_config("configs/synthetic/base.yaml")
    cfg["data"]["output_path"] = str(tmp_path / "out")
    cfg["data"]["n_frames"] = 2
    cfg["cam"].update({"H": 32, "W": 48, "fx": 40.0, "fy": 40.0,
                       "cx": 23.5, "cy": 15.5})
    cfg["mapping"]["max_gaussians"] = 1024
    cfg["mapping"]["new_frame_sample_size"] = -1
    gslam = GaussianSLAM(cfg)
    try:
        assert gslam.mcfg.new_frame_sample_size == 32 * 48
        gslam.config["data"]["dataset_name"] = "scannetpp"
        assert gslam._edge_bits(0) is None
    finally:
        gslam.cleanup()
