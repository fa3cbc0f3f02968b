"""Edge-VO system: frame lifecycle, keyframe policy, pose graph.

Replaces the C++ REVO system (VO/system/system.{h,cpp} + tracker.{h,cpp}):
  - per-frame pyramid build + coarse-to-fine LM tracking over levels
    (tracker.cpp:357-376);
  - constant-velocity init from the pose graph (system.cpp:105-112) with the
    coarsest-level sanity check identity-vs-init (tracker.cpp:292-314);
  - keyframe decision A: good/bad edge-point ratio < 4 (tracker.cpp:394-395);
  - keyframe decision B: histogram voting over the last
    `n_frames_histogram_voting`(=3) reprojected edge clouds with weights
    (0, 1, 1.25, 1.5): NEW_KF when sum(w_i * overlap_i) < overlap_0
    (`assessTrackingQuality`, tracker.cpp:120-226);
  - on NEW_KF: promote the PREVIOUS frame to keyframe and re-track
    (system.cpp:121-140);
  - pose graph Pose{T_kf_curr, kf} with world pose T_w_kf @ T_kf_curr and
    external pose injection `setTwc` (system.h:88-134, system.cpp:167-182);
  - `report()` timing summary (system.cpp:212-255).

All numerics run as jitted device programs; this module is the thin host
state machine around them (the same role system.cpp's control flow plays).
"""
from __future__ import annotations

import functools
import time
from collections import deque
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from .lm import LMResult, LMSettings, lm_align
from .pyramid import FramePyramid, build_pyramid, make_keyframe


class VOConfig(NamedTuple):
    levels: int = 3
    min_level: int = 0
    canny_low: float = 100.0
    canny_high: float = 200.0
    depth_min: float = 0.1
    depth_max: float = 10.0
    max_edge_points: int = 8192
    huber_edge: float = 0.3
    dist_filter: tuple = (30.0, 20.0, 10.0, 5.0, 5.0, 5.0)
    lm_max_iters: int = 100
    lm_eps: float = 0.999
    n_frames_histogram_voting: int = 3
    hist_weights: tuple = (0.0, 1.0, 1.25, 1.5)
    histogram_level: int = 1
    good_bad_ratio: float = 4.0
    dt_window: int = 32
    # Input decimation: the VO runs at full_res / 2^downscale_levels
    # (the reference itself resizes ScanNetPP to 640x480 for VO,
    # datasets.py:397-399). 1 level halves each dimension: 4x less work on
    # the 1-core host backend with no measurable odometry quality loss at
    # SLAM-init accuracy (the render tracker refines the pose anyway).
    # Default 0; GaussianSLAM enables 1 level automatically for frames
    # wider than 800 px unless the config pins it.
    downscale_levels: int = 0
    # Where the VO device programs run. "default" (inherit the session
    # backend) serializes ~5 fused programs/frame with tracking on a single
    # chip — measured cheaper than "cpu" on this 1-core host, where the VO
    # thread starves the host loop that feeds the TPU. Multi-core hosts can
    # set "cpu" to overlap like the reference's C++ frontend.
    device: str = "default"

    @staticmethod
    def from_dict(d: Dict) -> "VOConfig":
        return VOConfig(
            levels=int(d.get("pyramid_levels", 3)),
            min_level=int(d.get("min_level", 0)),
            canny_low=float(d.get("canny_low", 100.0)),
            canny_high=float(d.get("canny_high", 200.0)),
            depth_min=float(d.get("depth_min", 0.1)),
            depth_max=float(d.get("depth_max", 10.0)),
            max_edge_points=int(d.get("max_edge_points", 8192)),
            huber_edge=float(d.get("huber_edge", 0.3)),
            dist_filter=tuple(d.get("edge_distance_filter",
                                    (30.0, 20.0, 10.0, 5.0, 5.0, 5.0))),
            lm_max_iters=int(d.get("lm_max_iters", 100)),
            lm_eps=float(d.get("lm_eps", 0.999)),
            good_bad_ratio=float(d.get("good_bad_ratio", 4.0)),
            dt_window=int(d.get("dt_window", 32)),
            downscale_levels=int(d.get("downscale_levels", 0)),
            device=str(d.get("device", "default")),
        )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _fused_track(levels, kf_levels, R0, t0, cam: Camera, cfg: "VOConfig"):
    """Coarse-to-fine LM over all pyramid levels in one program, with the
    coarsest-level identity-vs-init sanity check selected in-graph
    (reference tracker.cpp:292-314, 357-376)."""
    df = cfg.dist_filter

    def settings(lvl):
        return LMSettings(
            huber_edge=cfg.huber_edge, max_iters=cfg.lm_max_iters,
            eps=cfg.lm_eps, dist_filter=float(df[min(lvl, len(df) - 1)]),
        )

    R, t = R0, t0
    res = None
    for lvl in range(cfg.levels - 1, cfg.min_level - 1, -1):
        pts, valid = levels[lvl]
        gx, gy, dt = kf_levels[lvl]
        cam_l = cam.scaled(lvl)
        if lvl == cfg.levels - 1:
            res_init = lm_align(pts, valid, gx, gy, dt, R, t, cam_l,
                                settings(lvl))
            res_eye = lm_align(pts, valid, gx, gy, dt, jnp.eye(3),
                               jnp.zeros(3), cam_l, settings(lvl))
            use_eye = res_eye.cost < res_init.cost
            res = jax.tree.map(
                lambda a, b: jnp.where(use_eye, a, b), res_eye, res_init
            )
        else:
            res = lm_align(pts, valid, gx, gy, dt, R, t, cam_l, settings(lvl))
        R, t = res.R, res.t
    return res


def _voting_counts(
    past_pts, past_valid, rel_transforms, curr_edges, curr_depth,
    depth_min, depth_max, cam: Camera,
):
    """Weighted-overlap histogram KF test (tracker.cpp:120-226).

    past_pts: (F, P, 3) past edge clouds (histogram level); rel_transforms:
    (F, 4, 4) past-frame -> current-frame. Returns (overlap_counts (F+1,),)
    where index i counts current *edge* pixels hit by exactly i clouds.
    """
    f = past_pts.shape[0]
    h, w = curr_edges.shape

    def one_cloud(pts, valid, T):
        p = pts @ T[:3, :3].T + T[:3, 3]
        z = jnp.maximum(p[:, 2], 1e-6)
        u = jnp.floor(p[:, 0] / z * cam.fx + cam.cx).astype(jnp.int32)
        v = jnp.floor(p[:, 1] / z * cam.fy + cam.cy).astype(jnp.int32)
        ok = valid & (p[:, 2] > 1e-6) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        flat = jnp.where(ok, v * w + u, h * w)
        m = jnp.zeros((h * w,), jnp.int32).at[flat].set(1, mode="drop")
        return m

    M = jnp.sum(jax.vmap(one_cloud)(past_pts, past_valid, rel_transforms),
                axis=0).reshape(h, w)
    valid_px = (curr_depth > depth_min) & (curr_depth < depth_max)
    edge_px = curr_edges & valid_px
    counts = jnp.stack(
        [jnp.sum(edge_px & (M == i)) for i in range(f + 1)]
    )
    return counts


@functools.partial(jax.jit, static_argnames=("cam",))
def _histogram_voting(
    past_pts, past_valid, rel_transforms, curr_edges, curr_depth,
    depth_min, depth_max, cam: Camera,
):
    return _voting_counts(past_pts, past_valid, rel_transforms, curr_edges,
                          curr_depth, depth_min, depth_max, cam)


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "hl"))
def _track_and_vote(
    levels, kf_levels, R0, t0, past_pts, past_valid, A_kf_past,
    hist_edges, hist_depth, cam: Camera, cfg: "VOConfig", hl: int,
):
    """Fused coarse-to-fine LM + histogram-voting counts at the FINAL pose:
    one dispatch + one fetch per frame instead of two (each round trip on
    the tunneled link costs ~35 ms; reference runs these as separate CPU
    stages, tracker.cpp:357-397 then :120-226).

    A_kf_past[i] = inv(T_w_kf) @ T_w_past_i, so the past->current transform
    is rel_i = inv(T_kf_cur) @ A_i with T_kf_cur from the LM result."""
    res = _fused_track(levels, kf_levels, R0, t0, cam, cfg)
    Rt = res.R.T
    Tinv = (jnp.eye(4, dtype=jnp.float32)
            .at[:3, :3].set(Rt).at[:3, 3].set(-Rt @ res.t))
    rels = jnp.einsum("ij,fjk->fik", Tinv, A_kf_past)
    counts = _voting_counts(
        past_pts, past_valid, rels, hist_edges, hist_depth,
        cfg.depth_min, cfg.depth_max, cam.scaled(hl),
    )
    return res, counts


@dataclass
class _Keyframe:
    frame_id: int
    pyramid: FramePyramid
    dt_levels: tuple
    T_w_kf: np.ndarray  # (4,4) f64


class EdgeVO:
    """Public surface mirrors the pybind module (VO/pybind/vo.cpp:17-36):
    `step(rgb, depth, ts) -> Twc`, `set_pose/ get_pose` (setTwc/getTwc),
    `get_edge_image`, `report`."""

    def __init__(self, cfg: VOConfig, cam: Camera):
        self.cfg = cfg
        self._ds = max(int(cfg.downscale_levels), 0)
        self.cam = cam.scaled(self._ds) if self._ds else cam
        self._device = None
        if cfg.device == "cpu":
            try:
                self._device = jax.devices("cpu")[0]
            except RuntimeError:
                self._device = None  # cpu backend unavailable: inherit

        self.keyframes: List[_Keyframe] = []
        # pose graph: per frame (kf_index, T_kf_frame f64)
        self.graph: List[tuple] = []
        # edge_cache is written by step() (possibly on the pipelined VO
        # worker thread) and read by the main thread's map_frame via
        # get_edge_image; the lock makes that explicit instead of leaning
        # on GIL atomicity + the eviction-window timing invariant
        # (step(f+1) evicts only keys < f-3) — advisor r2.
        import threading

        self._edge_lock = threading.Lock()
        self.edge_cache: Dict[int, np.ndarray] = {}
        self.prev_pyramid: Optional[FramePyramid] = None
        self.past_clouds = deque(maxlen=cfg.n_frames_histogram_voting)
        self.track_times: List[float] = []
        self.dt_times: List[float] = []
        self._start_pose = np.eye(4)

    @property
    def on_cpu(self) -> bool:
        return self._device is not None

    # -- pose graph ---------------------------------------------------------
    def _world_pose(self, frame_id: int) -> np.ndarray:
        kf_idx, T_kf_frame = self.graph[frame_id]
        return self.keyframes[kf_idx].T_w_kf @ T_kf_frame

    def get_pose(self, frame_id: int) -> np.ndarray:
        return self._world_pose(frame_id)

    def set_pose(self, frame_id: int, c2w: np.ndarray):
        """External pose injection (REVO::setPose system.cpp:167-182)."""
        c2w = np.asarray(c2w, np.float64)
        if frame_id >= len(self.graph):
            self._start_pose = c2w
            return
        kf_idx, _ = self.graph[frame_id]
        kf = self.keyframes[kf_idx]
        if kf.frame_id == frame_id:
            kf.T_w_kf = c2w
            self.graph[frame_id] = (kf_idx, np.eye(4))
        else:
            self.graph[frame_id] = (kf_idx, np.linalg.inv(kf.T_w_kf) @ c2w)

    def get_edge_image(self, frame_id: int) -> Optional[np.ndarray]:
        with self._edge_lock:
            e = self.edge_cache.get(frame_id)
        return None if e is None else np.asarray(e)

    # -- tracking -----------------------------------------------------------
    def _lm_settings(self, lvl: int) -> LMSettings:
        df = self.cfg.dist_filter
        return LMSettings(
            huber_edge=self.cfg.huber_edge,
            max_iters=self.cfg.lm_max_iters,
            eps=self.cfg.lm_eps,
            dist_filter=float(df[min(lvl, len(df) - 1)]),
        )

    def _track_against(self, kf: _Keyframe, pyr: FramePyramid,
                       T_kf_cur_init: np.ndarray):
        """Coarse-to-fine LM over pyramid levels, fused into ONE device
        program (the per-level dispatch + the identity-vs-init cost fetches
        cost a ~30 ms tunnel round trip each). Returns (T_kf_cur, result)."""
        R = jnp.asarray(T_kf_cur_init[:3, :3], dtype=jnp.float32)
        t = jnp.asarray(T_kf_cur_init[:3, 3], dtype=jnp.float32)
        res = _fused_track(
            tuple((lv.pts, lv.pts_valid) for lv in pyr.levels),
            tuple((d.gx, d.gy, d.dt) for d in kf.dt_levels),
            R, t, self.cam, self.cfg,
        )
        res = jax.device_get(res)
        T = np.eye(4)
        T[:3, :3] = np.asarray(res.R, np.float64)
        T[:3, 3] = np.asarray(res.t, np.float64)
        return T, res

    def _track_vote(self, kf: _Keyframe, pyr: FramePyramid,
                    T_kf_cur_init: np.ndarray):
        """Fused LM track + voting counts: ONE dispatch + ONE fetch.

        The past-cloud stack is padded to a fixed F with valid=False rows so
        the program traces once (deque fill-up would otherwise retrace)."""
        F = self.cfg.n_frames_histogram_voting
        hl = min(self.cfg.histogram_level, self.cfg.levels - 1)
        lv = pyr.levels[hl]
        clouds = list(self.past_clouds)
        pad_pts = clouds[0][0] if clouds else lv.pts
        pad = (pad_pts, jnp.zeros(pad_pts.shape[:1], bool), np.eye(4))
        while len(clouds) < F:
            clouds.append(pad)
        pts = jnp.stack([c[0] for c in clouds])
        val = jnp.stack([c[1] for c in clouds])
        kf_inv = np.linalg.inv(kf.T_w_kf)
        A = np.stack([kf_inv @ c[2] for c in clouds]).astype(np.float32)

        res, counts = _track_and_vote(
            tuple((l.pts, l.pts_valid) for l in pyr.levels),
            tuple((d.gx, d.gy, d.dt) for d in kf.dt_levels),
            jnp.asarray(T_kf_cur_init[:3, :3], dtype=jnp.float32),
            jnp.asarray(T_kf_cur_init[:3, 3], dtype=jnp.float32),
            pts, val, jnp.asarray(A), lv.edges, lv.depth,
            self.cam, self.cfg, hl,
        )
        res, counts = jax.device_get((res, counts))
        T = np.eye(4)
        T[:3, :3] = np.asarray(res.R, np.float64)
        T[:3, 3] = np.asarray(res.t, np.float64)
        return T, res, np.asarray(counts)

    def _needs_new_kf(self, res: LMResult, counts: np.ndarray) -> bool:
        good, bad = int(res.good), int(res.bad)
        if bad > 0 and good / max(bad, 1) < self.cfg.good_bad_ratio:
            return True
        if len(self.past_clouds) < self.cfg.n_frames_histogram_voting:
            return False
        w = self.cfg.hist_weights
        overlap = sum(float(counts[i]) * w[min(i, len(w) - 1)]
                      for i in range(1, len(counts)))
        return overlap < float(counts[0])

    def _promote_keyframe(self, frame_id: int, pyr: FramePyramid,
                          T_w_frame: np.ndarray):
        t0 = time.perf_counter()
        dt_levels = make_keyframe(pyr, self.cfg.dt_window)
        jax.block_until_ready(dt_levels[0].dt)
        self.dt_times.append(time.perf_counter() - t0)
        self.keyframes.append(
            _Keyframe(frame_id, pyr, dt_levels, np.asarray(T_w_frame, np.float64))
        )

    def step(self, rgb: np.ndarray, depth: np.ndarray, timestamp: float
             ) -> np.ndarray:
        """Process one frame; returns Twc (4,4) float64."""
        if self._device is not None:
            with jax.default_device(self._device):
                return self._step(rgb, depth, timestamp)
        return self._step(rgb, depth, timestamp)

    def _step(self, rgb: np.ndarray, depth: np.ndarray, timestamp: float
              ) -> np.ndarray:
        t0 = time.perf_counter()
        if self._ds:
            f = 1 << self._ds
            h, w = self.cam.height * f, self.cam.width * f
            rgb = rgb[:h:f, :w:f]
            depth = depth[:h:f, :w:f]
        frame_id = len(self.graph)
        pyr = build_pyramid(
            rgb, depth, self.cam, self.cfg.levels, self.cfg.max_edge_points,
            self.cfg.canny_low, self.cfg.canny_high, self.cfg.depth_min,
            self.cfg.depth_max, timestamp,
        )
        # Device array; fetched lazily in get_edge_image (only mapped
        # frames ask, and each fetch is a tunnel round trip).
        with self._edge_lock:
            self.edge_cache[frame_id] = pyr.levels[0].edges
            for k in [k for k in self.edge_cache if k < frame_id - 4]:
                del self.edge_cache[k]

        if frame_id == 0:
            self._promote_keyframe(0, pyr, self._start_pose)
            self.graph.append((0, np.eye(4)))
            self.prev_pyramid = pyr
            self.track_times.append(time.perf_counter() - t0)
            return self._world_pose(0)

        # Constant-velocity init (system.cpp:105-112).
        T_w_prev = self._world_pose(frame_id - 1)
        if frame_id >= 2:
            T_w_prev2 = self._world_pose(frame_id - 2)
            T_w_init = T_w_prev @ (np.linalg.inv(T_w_prev2) @ T_w_prev)
        else:
            T_w_init = T_w_prev

        kf_idx = len(self.keyframes) - 1
        kf = self.keyframes[kf_idx]
        T_kf_cur_init = np.linalg.inv(kf.T_w_kf) @ T_w_init
        T_kf_cur, res, counts = self._track_vote(kf, pyr, T_kf_cur_init)

        T_w_cur = kf.T_w_kf @ T_kf_cur
        if self._needs_new_kf(res, counts) and self.prev_pyramid is not None:
            # Promote the previous frame and re-track (system.cpp:121-140).
            self._promote_keyframe(frame_id - 1, self.prev_pyramid,
                                   self._world_pose(frame_id - 1))
            kf_idx = len(self.keyframes) - 1
            kf = self.keyframes[kf_idx]
            T_kf_cur_init = np.linalg.inv(kf.T_w_kf) @ T_w_init
            T_kf_cur, res = self._track_against(kf, pyr, T_kf_cur_init)
            T_w_cur = kf.T_w_kf @ T_kf_cur

        self.graph.append((kf_idx, T_kf_cur))

        # Past-cloud deque for histogram voting (tracker.cpp:235-250).
        hl = min(self.cfg.histogram_level, self.cfg.levels - 1)
        self.past_clouds.append(
            (pyr.levels[hl].pts, pyr.levels[hl].pts_valid, T_w_cur)
        )
        self.prev_pyramid = pyr
        self.track_times.append(time.perf_counter() - t0)
        return T_w_cur

    def report(self) -> Dict:
        return {
            "n_keyframes": len(self.keyframes),
            "mean_track_ms": 1e3 * float(np.mean(self.track_times))
            if self.track_times else 0.0,
            "mean_dt_ms": 1e3 * float(np.mean(self.dt_times))
            if self.dt_times else 0.0,
        }

    def dump_tum(self, path: str, timestamps=None):
        """Write the VO pose-graph trajectory in TUM format
        `timestamp tx ty tz qx qy qz qw` (reference REVO dumps its
        trajectory the same way, VO/system/system.cpp:212-255)."""
        from ..slam.submap import _rotmat_to_quat_np

        with open(path, "w") as f:
            f.write("# timestamp tx ty tz qx qy qz qw\n")
            for fid in range(len(self.graph)):
                if self.graph[fid] is None:
                    continue
                T = self._world_pose(fid)
                t = T[:3, 3]
                q = _rotmat_to_quat_np(T[:3, :3])  # wxyz
                ts = (timestamps[fid] if timestamps is not None
                      else fid / 30.0)
                f.write(
                    f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
                )
