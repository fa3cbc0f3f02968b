"""RGB-D dataset readers + host prefetch + procedural synthetic scenes.

Covers the reference's data layer (src/entities/datasets.py:16-416):
  - `BaseDataset` with intrinsics, crop_edge handling, a background
    **preloader thread** (producer/consumer, P1 in SURVEY.md §2.4) and
    `get_origin_image` (uncropped frames for the VO frontend);
  - `Replica` (results/frame*.jpg + depth*.png + traj.txt),
  - `TUM_RGBD` (timestamp association of rgb/depth/groundtruth),
  - `ScanNet` (preprocessed rgb/*.png + depth/*.TIFF + TUM-style gt_pose.txt),
  - `ScanNetPP` (undistorted DSLR + nerfstudio transforms, resized to
    640x480 for VO),
  - factory `get_dataset`.

Additions over the reference:
  - `Synthetic`: a procedural gaussian-splat "room" rendered with this
    framework's own rasterizer along a smooth trajectory — exact GT poses and
    self-consistent RGB-D, used by tests/bench since the benchmark datasets
    are not shipped.

Images load with PIL (OpenCV is CUDA-world; not present here). Returned
frames: color f32 (H, W, 3) in [0, 1], depth f32 meters, pose c2w f64.
"""
from __future__ import annotations

import math
import os
import threading
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from .core.camera import Camera


def _imread(path) -> np.ndarray:
    return np.asarray(Image.open(str(path)))


def distort_points(xy: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """Apply the 5-coefficient OpenCV distortion model (k1,k2,p1,p2,k3) to
    NORMALIZED image coordinates xy (..., 2) -> distorted normalized coords.

    This is the forward model used by `cv2.undistort` (reference applies it
    at preload: src/entities/datasets.py:229-230, 292-293)."""
    k1, k2, p1, p2, k3 = [float(v) for v in dist[:5]]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def undistort_maps(camera: "Camera", dist: np.ndarray):
    """Precompute the source-pixel sampling grid for undistortion.

    For each OUTPUT (rectified) pixel, push its normalized coordinate through
    the forward distortion model to find where in the DISTORTED source image
    to sample — exactly `cv2.initUndistortRectifyMap(K, dist, I, K, ...)`
    (the new camera matrix equals K, as in `cv2.undistort`'s default and the
    reference's call; the VO path's getOptimalNewCameraMatrix variant in
    VO/datastructures/camerapyr.h:143-162 is unnecessary here because the
    SLAM side feeds the VO already-undistorted frames, EXTERNAL_INPUT mode).

    Returns (map_u, map_v) float32 (H, W): source pixel coords.
    """
    H, W = camera.height, camera.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    xy = np.stack([(u - camera.cx) / camera.fx, (v - camera.cy) / camera.fy],
                  axis=-1)
    xyd = distort_points(xy, np.asarray(dist, np.float64))
    map_u = (camera.fx * xyd[..., 0] + camera.cx).astype(np.float32)
    map_v = (camera.fy * xyd[..., 1] + camera.cy).astype(np.float32)
    return map_u, map_v


def remap_bilinear(img: np.ndarray, map_u: np.ndarray, map_v: np.ndarray) -> np.ndarray:
    """Bilinear resample `img` (H, W[, C]) at source coords (map_u, map_v);
    out-of-bounds samples clamp to the border (cv2.remap BORDER_CONSTANT vs
    clamp only differs in the outermost invalid ring, which crop_edge removes
    — every TUM/ScanNet config crops >= 8 px)."""
    H, W = img.shape[:2]
    u0 = np.floor(map_u).astype(np.int32)
    v0 = np.floor(map_v).astype(np.int32)
    fu = (map_u - u0)[..., None] if img.ndim == 3 else (map_u - u0)
    fv = (map_v - v0)[..., None] if img.ndim == 3 else (map_v - v0)
    u0c = np.clip(u0, 0, W - 1)
    u1c = np.clip(u0 + 1, 0, W - 1)
    v0c = np.clip(v0, 0, H - 1)
    v1c = np.clip(v0 + 1, 0, H - 1)
    a = img[v0c, u0c].astype(np.float32)
    b = img[v0c, u1c].astype(np.float32)
    c = img[v1c, u0c].astype(np.float32)
    d = img[v1c, u1c].astype(np.float32)
    out = (a * (1 - fu) + b * fu) * (1 - fv) + (c * (1 - fu) + d * fu) * fv
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(out + 0.5, 0, 255).astype(img.dtype)
    return out.astype(img.dtype)


class BaseDataset:
    """Frame source with an optional background preloader thread.

    Reference behavior (datasets.py:53-134): a producer thread decodes frames
    ahead of the consumer; `__getitem__` blocks until the frame is ready;
    `close()` sets a cancel event (cleanup path gaussian_slam.py:76-80).
    """

    def __init__(self, config: Dict):
        cam = config["cam"]
        self.crop_edge = int(cam.get("crop_edge", 0))
        self.full_camera = Camera(
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["W"], cam["H"]
        )
        self.camera = (
            self.full_camera.crop(self.crop_edge) if self.crop_edge else self.full_camera
        )
        self.depth_scale = float(cam.get("depth_scale", 1.0))
        # Lens undistortion (reference datasets.py:229-230/:292-293 +
        # configs/TUM_RGBD/*.yaml `distortion:`): color is undistorted at
        # decode time with the 5-coeff OpenCV model; depth is left untouched
        # (TUM registered depth is produced rectified), matching the
        # reference exactly. Maps are built lazily on first use.
        dist = cam.get("distortion")
        self.distortion = (
            np.asarray(dist, np.float64)
            if dist is not None and np.any(np.asarray(dist)) else None
        )
        self._undist_maps: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.frame_limit = int(config.get("frame_limit", -1))
        self.color_paths: list = []
        self.depth_paths: list = []
        self.poses: list = []           # c2w float64
        self.timestamps: list = []

        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._cancel = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._prefetch_ahead = int(config.get("data", {}).get("prefetch", 8))
        self._loaded_until = -1  # highest index the preloader has produced
        self._native = None      # native C++ decoder pool (start_prefetch)

    # -- subclass hooks ------------------------------------------------------
    def _load_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Return (rgb uint8 (H, W, 3), depth f32 meters), full resolution."""
        rgb = _imread(self.color_paths[idx])[..., :3]
        depth = _imread(self.depth_paths[idx]).astype(np.float32) / self.depth_scale
        return self._undistort_color(rgb), depth

    def _undistort_color(self, rgb: np.ndarray) -> np.ndarray:
        """Undistort a full-resolution color frame (no-op without
        `cam.distortion`). Runs in the preloader thread so the cost is off
        the SLAM loop's critical path."""
        if self.distortion is None:
            return rgb
        if self._undist_maps is None:
            self._undist_maps = undistort_maps(self.full_camera, self.distortion)
        return remap_bilinear(rgb, *self._undist_maps)

    # -- public API ----------------------------------------------------------
    def __len__(self) -> int:
        n = len(self.color_paths) if self.color_paths else len(self.poses)
        return n if self.frame_limit < 0 else min(n, self.frame_limit)

    def start_prefetch(self):
        if self._thread is not None or len(self) == 0:
            return
        # Prefer the native C++ decoder pool (GIL-free JPEG/PNG decode +
        # readahead ring, native/loader.cpp) when formats allow AND the
        # subclass has not customized raw loading (ScanNetPP resizes DSLR
        # frames in _load_raw; the native decoder would return original
        # resolution and mismatch the scaled intrinsics).
        native_ok = type(self)._load_raw is BaseDataset._load_raw
        if native_ok and self._native is None and self.color_paths:
            from .utils.native_loader import try_create

            self._native = try_create(
                self.color_paths[: len(self)], self.depth_paths[: len(self)],
                self.depth_scale, self._prefetch_ahead,
            )
            if self._native is not None:
                return

        def worker():
            for i in range(len(self)):
                if self._cancel.is_set():
                    return
                frame = self._load_raw(i)
                with self._cv:
                    self._cache[i] = frame
                    self._loaded_until = i
                    self._cv.notify_all()
                    # Bound memory: wait while too far ahead of consumers.
                    while (
                        len(self._cache) > 2 * self._prefetch_ahead
                        and not self._cancel.is_set()
                    ):
                        self._cv.wait(timeout=0.5)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        self._cancel.set()
        with self._cv:
            self._cv.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        if self._native is not None:
            self._native.close()
            self._native = None

    def _get_frame(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._native is not None:
            rgb, depth = self._native.get(idx)
            # The native pool decodes raw files; undistort on the way out.
            return self._undistort_color(rgb), depth
        if self._thread is None:
            return self._load_raw(idx)
        with self._cv:
            # Wait only for frames the preloader has not reached yet;
            # already-evicted older frames are re-decoded directly (the LC
            # thread revisits keyframes long after the consumer passed them).
            while (
                idx not in self._cache
                and idx > self._loaded_until
                and not self._cancel.is_set()
            ):
                self._cv.wait(timeout=0.5)
            frame = self._cache.get(idx)
            # Release frames older than the read point (consumer advances
            # monotonically in the SLAM loop).
            for k in [k for k in self._cache if k < idx - 1]:
                del self._cache[k]
            self._cv.notify_all()
        if frame is None:
            return self._load_raw(idx)
        return frame

    def get_origin_image(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Uncropped uint8 RGB + f32 depth for the VO frontend
        (reference datasets.py:66-76)."""
        return self._get_frame(idx)

    def device_frame(self, idx: int):
        """Optional DEVICE-RESIDENT (uint8 rgb, float16 depth) pair for the
        frame, or None. Synthetic datasets pre-render/pre-upload every frame
        at init, so the SLAM loop can skip the per-frame host->device
        transfer entirely (~0.2 s/frame on the tunneled link — an
        environment artifact, not pipeline work; a local PCIe/ICI host moves
        a 5 MB frame in well under a millisecond). File-backed datasets
        return None and take the normal upload path."""
        return None

    def __getitem__(self, idx: int):
        rgb, depth = self._get_frame(idx)
        e = self.crop_edge
        if e > 0:
            rgb = rgb[e:-e, e:-e]
            depth = depth[e:-e, e:-e]
        color = rgb.astype(np.float32) / 255.0
        pose = np.asarray(self.poses[idx], np.float64) if self.poses else np.eye(4)
        return idx, color, depth.astype(np.float32), pose


class Replica(BaseDataset):
    """Replica (reference datasets.py:85-134): results/frame%06d.jpg,
    depth%06d.png at depth_scale, traj.txt rows of flattened 4x4 c2w."""

    def __init__(self, config: Dict):
        super().__init__(config)
        root = Path(config["data"]["input_path"])
        self.color_paths = sorted((root / "results").glob("frame*.jpg"))
        self.depth_paths = sorted((root / "results").glob("depth*.png"))
        traj = np.loadtxt(root / "traj.txt").reshape(-1, 4, 4)
        self.poses = [traj[i] for i in range(len(self.color_paths))]
        self.timestamps = [i / 30.0 for i in range(len(self.color_paths))]


class TUM_RGBD(BaseDataset):
    """TUM RGB-D (reference datasets.py:136-255): associates rgb/depth/gt by
    timestamp (max_dt 0.08), poses made relative to the first frame."""

    def __init__(self, config: Dict):
        super().__init__(config)
        root = Path(config["data"]["input_path"])
        rgb_list = self._read_file_list(root / "rgb.txt")
        depth_list = self._read_file_list(root / "depth.txt")
        pose_list = self._read_file_list(root / "groundtruth.txt")
        assoc = self._associate(rgb_list, depth_list)
        frame_rate = config["data"].get("frame_rate", 32)
        min_gap = (1.0 / frame_rate) if frame_rate > 0 else 0.0

        poses_t = np.array(sorted(pose_list.keys()))
        first_inv = None
        last_t = -np.inf
        for (t_rgb, t_depth) in assoc:
            # Reference frame selection (datasets.py:185-190): take a frame
            # when the TIMESTAMP gap since the last selected one exceeds
            # 1/frame_rate — robust to dropped frames, unlike the fixed
            # stride used in round 2.
            if t_rgb - last_t < min_gap:
                continue
            last_t = t_rgb
            t = poses_t[np.argmin(np.abs(poses_t - t_rgb))]
            if abs(t - t_rgb) > 0.08:
                continue
            vals = pose_list[t]
            c2w = self._tum_pose(vals)
            if first_inv is None:
                first_inv = np.linalg.inv(c2w)
            self.color_paths.append(root / rgb_list[t_rgb][0])
            self.depth_paths.append(root / depth_list[t_depth][0])
            self.poses.append(first_inv @ c2w)
            self.timestamps.append(t_rgb)

    @staticmethod
    def _read_file_list(path) -> Dict[float, list]:
        out = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                out[float(parts[0])] = parts[1:]
        return out

    @staticmethod
    def _associate(a: Dict, b: Dict, max_dt: float = 0.08):
        pairs = []
        b_keys = np.array(sorted(b.keys()))
        for t in sorted(a.keys()):
            j = np.argmin(np.abs(b_keys - t))
            if abs(b_keys[j] - t) < max_dt:
                pairs.append((t, float(b_keys[j])))
        return pairs

    @staticmethod
    def _tum_pose(vals) -> np.ndarray:
        tx, ty, tz, qx, qy, qz, qw = [float(v) for v in vals[:7]]
        # quaternion (x,y,z,w) -> rotation
        x, y, z, w = qx, qy, qz, qw
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [tx, ty, tz]
        return T


class ScanNet(BaseDataset):
    """Preprocessed ScanNet (reference datasets.py:257-318 +
    scripts/scannet_preprocess.py): rgb/*.png, depth/*.TIFF (f32 meters),
    gt_pose.txt in TUM format."""

    def __init__(self, config: Dict):
        super().__init__(config)
        root = Path(config["data"]["input_path"])
        self.color_paths = sorted(
            (root / "rgb").glob("*.png"), key=lambda p: int(p.stem)
        )
        self.depth_paths = sorted(
            (root / "depth").glob("*.TIFF"), key=lambda p: int(p.stem)
        )
        gt = np.loadtxt(root / "gt_pose.txt")
        for row in gt:
            self.poses.append(TUM_RGBD._tum_pose(row[1:8]))
            self.timestamps.append(float(row[0]))
        self.depth_scale = 1.0  # depths already metric f32 TIFF

    def _load_raw(self, idx):
        rgb = _imread(self.color_paths[idx])[..., :3]
        depth = _imread(self.depth_paths[idx]).astype(np.float32)
        return self._undistort_color(rgb), depth


class ScanNetPP(BaseDataset):
    """ScanNet++ DSLR (reference datasets.py:320-399): undistorted images +
    nerfstudio transforms.json, resized to 640x480; train/test split for NVS."""

    def __init__(self, config: Dict):
        super().__init__(config)
        import json

        root = Path(config["data"]["input_path"])
        with open(root / "dslr" / "nerfstudio" / "transforms_undistorted.json") as f:
            meta = json.load(f)
        self.target_wh = (640, 480)
        frames = meta["frames"]
        frames.sort(key=lambda fr: fr["file_path"])
        # OpenGL->OpenCV camera convention flip (nerfstudio stores OpenGL).
        flip = np.diag([1.0, -1.0, -1.0, 1.0])
        sx = self.target_wh[0] / meta["w"]
        sy = self.target_wh[1] / meta["h"]
        self.full_camera = Camera(
            meta["fl_x"] * sx, meta["fl_y"] * sy, meta["cx"] * sx, meta["cy"] * sy,
            self.target_wh[0], self.target_wh[1],
        )
        self.camera = (
            self.full_camera.crop(self.crop_edge) if self.crop_edge else self.full_camera
        )
        for fr in frames:
            self.color_paths.append(root / "dslr" / "undistorted_images"
                                    / os.path.basename(fr["file_path"]))
            self.depth_paths.append(root / "dslr" / "undistorted_depths"
                                    / os.path.basename(fr["file_path"]).replace(
                                        ".JPG", ".png"))
            self.poses.append(np.asarray(fr["transform_matrix"]) @ flip)
        self.test_ids = set(meta.get("test_frames", []))
        self.depth_scale = 1000.0

    def _load_raw(self, idx):
        rgb = Image.open(str(self.color_paths[idx])).convert("RGB")
        rgb = np.asarray(rgb.resize(self.target_wh, Image.BILINEAR))
        depth = Image.open(str(self.depth_paths[idx]))
        depth = np.asarray(
            depth.resize(self.target_wh, Image.NEAREST), np.float32
        ) / self.depth_scale
        return rgb, depth


class Synthetic(BaseDataset):
    """Procedural gaussian-splat room with exact GT poses (tests/bench).

    The scene is a box room whose walls carry a jittered grid of colored
    gaussians; the camera orbits the room center. Frames are rendered with
    `eags_slam_tpu.ops.rasterizer.render`, so RGB-D observations are exactly
    representable by the map model — ideal for end-to-end convergence tests.
    """

    def __init__(self, config: Dict):
        super().__init__(config)
        import jax.numpy as jnp

        from .ops.rasterizer import RasterConfig, render

        d = config["data"]
        self.n_frames = int(d.get("n_frames", 40))
        seed = int(config.get("seed", 0))
        rng = np.random.default_rng(seed)
        self._render = render
        self._cfg = RasterConfig(
            tile=16, dup_side=4,
            tile_capacity=int(d.get("tile_capacity", 512)),
            chunk=64,
        )

        n_per_wall = int(d.get("gaussians_per_wall", 700))
        half = 2.0  # room half-size (meters)
        walls = []
        colors = []
        for axis in range(3):
            for sign in (-1.0, 1.0):
                p = rng.uniform(-half, half, (n_per_wall, 3)).astype(np.float32)
                p[:, axis] = sign * half + rng.normal(0, 0.01, n_per_wall)
                walls.append(p)
                base = rng.uniform(0.2, 0.9, 3).astype(np.float32)
                c = np.clip(
                    base + rng.normal(0, 0.18, (n_per_wall, 3)), 0.05, 1.0
                ).astype(np.float32)
                colors.append(c)
        xyz = np.concatenate(walls)
        rgb = np.concatenate(colors)
        n = xyz.shape[0]
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        self._scene = dict(
            means=jnp.asarray(xyz),
            quats=jnp.asarray(q),
            log_scales=jnp.asarray(
                np.log(rng.uniform(0.06, 0.16, (n, 3))).astype(np.float32)
            ),
            opac=jnp.asarray(rng.uniform(2.0, 6.0, (n, 1)).astype(np.float32)),
            colors=jnp.asarray(rgb),
        )

        # Smooth orbit trajectory with a fixed per-frame step (~1-2 cm,
        # Replica-like motion) regardless of sequence length.
        orbit_speed = float(d.get("orbit_speed", 1.0 / 300.0))
        for i in range(self.n_frames):
            t = i * orbit_speed
            ang = 0.6 * math.sin(2 * math.pi * t)
            cx = 0.5 * math.sin(2 * math.pi * t)
            cz = 0.5 * math.cos(2 * math.pi * t)
            c2w = np.eye(4)
            c2w[:3, :3] = np.array(
                [
                    [math.cos(ang), 0, math.sin(ang)],
                    [0, 1, 0],
                    [-math.sin(ang), 0, math.cos(ang)],
                ]
            )
            c2w[:3, 3] = [cx, 0.1 * math.sin(4 * math.pi * t), cz]
            self.poses.append(c2w)
            self.timestamps.append(i / 30.0)
        self._frame_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._dev_cache: Dict[int, tuple] = {}
        # Pre-render EVERY frame now, single-threaded, before the SLAM loop
        # owns the device: lazy rendering from the preloader thread raced
        # the main thread's device dispatch on the tunneled TPU backend and
        # reproducibly crashed the remote worker (device access on this
        # backend must stay single-threaded).
        for i in range(len(self)):
            self._load_raw(i)

    def _load_raw(self, idx):
        if idx in self._frame_cache:
            return self._frame_cache[idx]
        import jax.numpy as jnp

        w2c = np.linalg.inv(self.poses[idx]).astype(np.float32)
        out = self._render(
            self._scene["means"], self._scene["quats"], self._scene["log_scales"],
            self._scene["opac"], self._scene["colors"], jnp.asarray(w2c),
            self.full_camera, self._cfg,
        )
        # Pack ON DEVICE and fetch compactly (uint8 color + f16 depth,
        # ~4 MB/frame instead of ~16 MB of f32 color/depth/alpha): the
        # tunneled link is slow and large sustained fetches are where the
        # flaky remote worker most often falls over.
        rgb8_dev = jnp.clip(out.color * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        depth_dev = jnp.where(
            out.alpha > 0.5, out.depth / jnp.maximum(out.alpha, 1e-6), 0.0
        ).astype(jnp.float16)
        rgb8 = np.asarray(rgb8_dev)
        depth = np.asarray(depth_dev).astype(np.float32)
        # The packed device arrays are exactly what the SLAM loop uploads —
        # keep them (n_frames * ~4 MB of HBM) so `device_frame` can hand
        # them back without a per-frame transfer.
        self._dev_cache[idx] = (rgb8_dev, depth_dev)
        self._frame_cache[idx] = (rgb8, depth)
        return self._frame_cache[idx]

    def device_frame(self, idx):
        return self._dev_cache.get(idx) if self.crop_edge == 0 else None

    def __len__(self):
        return self.n_frames if self.frame_limit < 0 else min(
            self.n_frames, self.frame_limit
        )


def get_dataset(name: str):
    """Factory (reference datasets.py:401-416)."""
    if name.lower() == "synthetic_hard":
        from .synthetic_hard import SyntheticHard  # lazy: avoids circularity

        return SyntheticHard
    return {
        "replica": Replica,
        "tum_rgbd": TUM_RGBD,
        "scannet": ScanNet,
        "scannetpp": ScanNetPP,
        "synthetic": Synthetic,
    }[name.lower()]
