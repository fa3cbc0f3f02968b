"""Dataset readers exercised on generated on-disk fixtures (real formats)."""
import numpy as np
import pytest
from PIL import Image

from eags_slam_tpu.datasets import Replica, TUM_RGBD, get_dataset


def _write_frame(color_path, depth_path, rng, depth_mm=2000):
    rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    depth = np.full((24, 32), depth_mm, np.uint16)
    if str(color_path).endswith(".jpg"):
        Image.fromarray(rgb).save(color_path, quality=95)
    else:
        Image.fromarray(rgb).save(color_path)
    Image.fromarray(depth, mode="I;16").save(depth_path)


@pytest.fixture(scope="module")
def replica_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("replica")
    (root / "results").mkdir()
    poses = []
    for i in range(4):
        _write_frame(root / "results" / f"frame{i:06d}.jpg",
                     root / "results" / f"depth{i:06d}.png", rng)
        T = np.eye(4)
        T[0, 3] = 0.1 * i
        poses.append(T.reshape(-1))
    np.savetxt(root / "traj.txt", np.stack(poses))
    return root


def _cam_cfg():
    return {
        "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "depth_scale": 1000.0, "crop_edge": 0},
        "data": {"input_path": "", "prefetch": 2},
        "frame_limit": -1,
    }


def test_replica_reader(replica_dir):
    cfg = _cam_cfg()
    cfg["data"]["input_path"] = str(replica_dir)
    ds = Replica(cfg)
    assert len(ds) == 4
    idx, color, depth, pose = ds[2]
    assert color.shape == (24, 32, 3) and color.dtype == np.float32
    assert 0.0 <= color.min() and color.max() <= 1.0
    np.testing.assert_allclose(depth, 2.0, atol=1e-3)  # 2000mm / 1000
    assert abs(pose[0, 3] - 0.2) < 1e-9


def test_replica_native_prefetch(replica_dir):
    cfg = _cam_cfg()
    cfg["data"]["input_path"] = str(replica_dir)
    ds = Replica(cfg)
    ds.start_prefetch()
    try:
        _, c0, d0, _ = ds[0]
        _, c3, d3, _ = ds[3]
        assert np.isfinite(c0).all() and np.isfinite(d3).all()
        rgb, depth = ds.get_origin_image(1)
        assert rgb.dtype == np.uint8 and rgb.shape == (24, 32, 3)
    finally:
        ds.close()


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    rng = np.random.default_rng(1)
    root = tmp_path_factory.mktemp("tum")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(5):
        t = 10.0 + i / 30.0
        _write_frame(root / "rgb" / f"{t:.4f}.png",
                     root / "depth" / f"{t + 0.01:.4f}.png", rng,
                     depth_mm=5000)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t + 0.01:.4f} depth/{t + 0.01:.4f}.png")
        gt_lines.append(f"{t:.4f} {0.05 * i:.4f} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(depth_lines))
    (root / "groundtruth.txt").write_text("\n".join(gt_lines))
    return root


def test_tum_reader_association(tum_dir):
    cfg = _cam_cfg()
    cfg["cam"]["depth_scale"] = 5000.0
    cfg["data"]["input_path"] = str(tum_dir)
    cfg["data"]["frame_rate"] = 32
    ds = TUM_RGBD(cfg)
    assert len(ds) == 5
    _, color, depth, pose0 = ds[0]
    np.testing.assert_allclose(depth, 1.0, atol=1e-3)  # 5000/5000
    # Poses are made relative to the first frame.
    np.testing.assert_allclose(pose0, np.eye(4), atol=1e-12)
    _, _, _, pose2 = ds[2]
    assert abs(pose2[0, 3] - 0.10) < 1e-9


def test_factory():
    assert get_dataset("replica") is Replica
    assert get_dataset("TUM_RGBD".lower()) is TUM_RGBD
    with pytest.raises(KeyError):
        get_dataset("nope")
