"""Native C++ loader vs PIL decode on generated JPEG/PNG frames."""
import numpy as np
import pytest
from PIL import Image

from eags_slam_tpu.utils.native_loader import try_create


@pytest.fixture(scope="module")
def frame_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    color_paths, depth_paths = [], []
    for i in range(4):
        rgb = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        depth = rng.integers(100, 60000, (32, 48), dtype=np.uint16)
        cp = d / f"frame{i:03d}.png"   # lossless: exact comparison
        dp = d / f"depth{i:03d}.png"
        Image.fromarray(rgb).save(cp)
        Image.fromarray(depth, mode="I;16").save(dp)
        color_paths.append(str(cp))
        depth_paths.append(str(dp))
    return color_paths, depth_paths


def test_native_matches_pil(frame_files):
    color_paths, depth_paths = frame_files
    loader = try_create(color_paths, depth_paths, depth_scale=5000.0,
                        readahead=2, n_threads=2)
    if loader is None:
        pytest.skip("native loader unavailable (no toolchain)")
    try:
        assert (loader.width, loader.height) == (48, 32)
        for i in [0, 2, 1, 3]:  # out-of-order access exercises re-decode
            rgb, depth = loader.get(i)
            ref_rgb = np.asarray(Image.open(color_paths[i]))
            ref_d = np.asarray(Image.open(depth_paths[i])).astype(np.float32) / 5000.0
            np.testing.assert_array_equal(rgb, ref_rgb)
            np.testing.assert_allclose(depth, ref_d, rtol=1e-6)
    finally:
        loader.close()


def test_native_jpeg(frame_files, tmp_path):
    color_paths, depth_paths = frame_files
    rgb = np.zeros((32, 48, 3), np.uint8)
    rgb[8:24, 12:36] = [200, 50, 100]
    jp = tmp_path / "c.jpg"
    Image.fromarray(rgb).save(jp, quality=95)
    loader = try_create([str(jp)], [depth_paths[0]], depth_scale=1.0)
    if loader is None:
        pytest.skip("native loader unavailable")
    try:
        out, _ = loader.get(0)
        ref = np.asarray(Image.open(jp))
        # JPEG decoders may differ by a few LSBs.
        assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0
    finally:
        loader.close()


def test_native_rejects_dim_mismatch(frame_files, tmp_path):
    """A frame larger than frame 0 must error, not overflow the caller's
    numpy buffers (round-1 advisor finding)."""
    color_paths, depth_paths = frame_files
    rng = np.random.default_rng(1)
    big_rgb = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    big_d = rng.integers(100, 60000, (64, 96), dtype=np.uint16)
    cp = tmp_path / "big.png"
    dp = tmp_path / "bigd.png"
    Image.fromarray(big_rgb).save(cp)
    Image.fromarray(big_d, mode="I;16").save(dp)
    loader = try_create([color_paths[0], str(cp)],
                        [depth_paths[0], str(dp)], depth_scale=1.0)
    if loader is None:
        pytest.skip("native loader unavailable")
    try:
        loader.get(0)  # frame 0 fine
        with pytest.raises(RuntimeError):
            loader.get(1)
    finally:
        loader.close()


def test_native_survives_corrupt_jpeg(frame_files, tmp_path):
    """A truncated JPEG must raise, not exit() the whole process
    (libjpeg default error_exit; round-1 advisor finding)."""
    color_paths, depth_paths = frame_files
    rgb = np.zeros((32, 48, 3), np.uint8)
    jp = tmp_path / "ok.jpg"
    Image.fromarray(rgb).save(jp, quality=95)
    data = jp.read_bytes()
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(data[: len(data) // 3])  # truncate mid-stream
    loader = try_create([str(jp), str(bad)],
                        [depth_paths[0], depth_paths[1]], depth_scale=1.0)
    if loader is None:
        pytest.skip("native loader unavailable")
    try:
        loader.get(0)
        with pytest.raises(RuntimeError):
            loader.get(1)
    finally:
        loader.close()
