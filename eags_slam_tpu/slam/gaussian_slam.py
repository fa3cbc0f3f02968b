"""GaussianSLAM orchestrator: the per-frame host loop.

Reference: src/entities/gaussian_slam.py — output dir setup (:82-101), submap
decision `should_start_new_submap` (:103-117, motion heuristic rot>50deg /
trans>0.5m or every `new_submap_every` frames), submap save (:119-130),
frame-0/1 GT poses (:198-206), mapping frames = every map_every-th + last
(:54), loop-closure dispatch at submap boundaries (:233-235), final submap
save + optional final LC (:278-296), FPS/time report (:298-313).

The host loop stays Python (it is control flow over device programs, exactly
like the reference's run()); every hot path it calls — tracking refinement,
seeding, growth, submap optimization — is a single jitted device program.
"""
from __future__ import annotations

import math
import os
import shutil
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import save_config
from ..core import gaussians as G
from ..core.camera import Camera
from ..datasets import get_dataset
from ..ops.rasterizer import RasterConfig
from . import mapper as M
from .logger import Logger
from .submap import Submap, pack_state
from .tracker import Tracker, TrackerConfig


def _rotation_angle_deg(R1: np.ndarray, R2: np.ndarray) -> float:
    cosang = (np.trace(R1.T @ R2) - 1.0) / 2.0
    return math.degrees(math.acos(min(max(cosang, -1.0), 1.0)))


def exceeds_motion_thresholds(c2w: np.ndarray, anchor_c2w: np.ndarray,
                              rot_thre: float, trans_thre: float) -> bool:
    """Reference mapper_utils.py:229-268 motion heuristic."""
    rot = _rotation_angle_deg(anchor_c2w[:3, :3], c2w[:3, :3])
    trans = float(np.linalg.norm(c2w[:3, 3] - anchor_c2w[:3, 3]))
    return rot > rot_thre or trans > trans_thre


class GaussianSLAM:
    def __init__(self, config: Dict):
        self.config = config
        self.verbose = bool(config.get("verbose", False))
        self.output_path = config["data"]["output_path"]
        self._setup_output_path()

        DatasetClass = get_dataset(config["data"]["dataset_name"])
        self.dataset = DatasetClass(config)
        self.dataset.start_prefetch()
        self.cam: Camera = self.dataset.camera

        mc = config["mapping"]
        tc = config["tracking"]
        self.map_every = int(mc["map_every"])
        self.new_submap_every = int(mc["new_submap_every"])
        self.motion_heuristic = bool(mc["submap_using_motion_heuristic"])
        self.rot_thre = float(mc.get("new_submap_rot_thre", 50.0))
        self.trans_thre = float(mc.get("new_submap_trans_thre", 0.5))
        self.capacity = int(mc.get("max_gaussians", 1 << 18))

        import jax

        on_tpu = jax.default_backend() == "tpu"
        self.rcfg = RasterConfig(
            # TPU: bigger tiles + grouped grid amortize per-program overhead
            # (measured ~50-150us/program); CPU tests use small images.
            tile=int(mc.get("raster_tile", 32 if on_tpu else 16)),
            dup_side=int(mc.get("dup_side", 3 if on_tpu else 4)),
            tile_capacity=int(mc.get("tile_capacity", 1024)),
            chunk=64,
            group=int(mc.get("raster_group", 8)),
            entry_cap_factor=int(mc.get("entry_cap_factor", 4)),
            # Per-band segment capacity (sorted backend). Bands that overflow
            # clip their DEEPEST entries (depth-sorted segments), so smaller
            # caps trade far-occluded contributions for ~linear kernel time.
            seg_cap=int(mc.get("seg_cap", 1024)),
            # bf16 kernel data path (tri matmuls + DMA storage): measured
            # FLAT on this chip (PERF.md) while adding <=0.4% attr noise,
            # so it defaults OFF; the flag stays for bandwidth-bound parts.
            kernel_bf16=bool(mc.get("kernel_bf16", False)),
            kernel_quadform=bool(mc.get("kernel_quadform", False)),
            # Retire-on-advance windowed bwd rmw (PERF.md roadmap #5).
            # EAGS_RMW_WINDOW overrides the config knob so a bench run can
            # A/B it without editing configs.
            rmw_window=bool(int(os.environ.get(
                "EAGS_RMW_WINDOW", int(bool(mc.get("rmw_window", False)))))),
        )
        # EAGS_RCFG="tile=64,seg_cap=2048,..." A/B's kernel-shape knobs
        # (e.g. a seg_sweep winner) on a full run without config edits.
        from ..ops.rasterizer import apply_rcfg_env

        self.rcfg = apply_rcfg_env(self.rcfg)
        self.mcfg = M.MapperConfig(
            iterations=int(mc["iterations"]),
            new_submap_iterations=int(mc["new_submap_iterations"]),
            new_submap_points_num=int(mc["new_submap_points_num"]),
            new_submap_gradient_points_num=int(mc["new_submap_gradient_points_num"]),
            # -1 = ALL seeding-mask pixels (reference mapper.py:327-331 /
            # Replica protocol new_frame_sample_size: -1): statically sized
            # as H*W, invalid ids masked downstream.
            new_frame_sample_size=(
                int(mc["new_frame_sample_size"])
                if int(mc["new_frame_sample_size"]) > 0
                else self.cam.height * self.cam.width),
            new_points_radius=float(mc["new_points_radius"]),
            current_view_opt_iterations=float(mc["current_view_opt_iterations"]),
            alpha_thre=float(mc["alpha_thre"]),
            pruning_thre=float(mc["pruning_thre"]),
            edge_dilate=int(mc.get("edge_dilate_kernel", 2)),
            outlier_removal=bool(mc.get("outlier_removal", False)),
            max_keyframes=int(mc.get("max_keyframes", 32)),
            tile_subset=int(mc.get("tile_subset", 0)),
            kf_block=int(mc.get("kf_block", 10)),
            freeze_frac=float(mc.get("freeze_frac", 0.0)),
            freeze_after=float(mc.get("freeze_after", 0.65)),
            # EAGS_INIT_HALFRES overrides the config knob so a bench
            # snapshot can sweep the init protocol without edits.
            init_halfres_frac=float(
                os.environ.get("EAGS_INIT_HALFRES",
                               mc.get("init_halfres_frac", 0.0))),
            init_warm_start=bool(int(
                os.environ.get("EAGS_INIT_WARM",
                               int(bool(mc.get("init_warm_start", False)))))),
            warm_min_visible=int(mc.get("warm_min_visible", 20000)),
            # EAGS_MAP_STALE A/Bs the mapping convergence stop without
            # config edits (0 = off = reference full budget).
            stale_best_cnt=int(os.environ.get(
                "EAGS_MAP_STALE", mc.get("stale_best_cnt", 0))),
        )
        self.tcfg = TrackerConfig(
            iterations=int(tc["iterations"]),
            cam_rot_lr=float(tc["cam_rot_lr"]),
            cam_trans_lr=float(tc["cam_trans_lr"]),
            w_color_loss=float(tc["w_color_loss"]),
            alpha_thre=float(tc["alpha_thre"]),
            filter_alpha=bool(tc["filter_alpha"]),
            filter_outlier_depth=bool(tc["filter_outlier_depth"]),
            soft_alpha=bool(tc["soft_alpha"]),
            mask_invalid_depth=bool(tc.get("mask_invalid_depth", False)),
            early_stop_thre=float(tc.get("early_stop_thre", 5.0e-5)),
            early_stop_cnt=int(tc["early_stop_cnt"]),
            # EAGS_STALE_BEST lets a bench run A/B the stale-best stop
            # without config edits (0 = off = reference full budget).
            stale_best_cnt=int(os.environ.get(
                "EAGS_STALE_BEST", tc.get("stale_best_cnt", 0))),
            # ReduceLROnPlateau parity (reference gaussian_model.py:382-383
            # + configs scheduler_factor/patience 0.95/5).
            plateau_patience=int(tc.get("scheduler_patience", 5)),
            plateau_factor=float(tc.get("scheduler_factor", 0.95)),
            init_err_ratio=float(tc["init_err_ratio"]),
            enable_exposure=bool(tc.get("enable_exposure", False)),
            debug_per_iter=bool(tc.get("debug_per_iter", False)),
            tile_subset_frac=float(tc.get("tile_subset_frac", 0.25)),
            polish_iters=int(tc.get("polish_iters", 0)),
            polish_frac=float(tc.get("polish_frac", 1.0)),
            # EAGS_POSE_KERNEL lets a bench A/B the pose-contraction
            # backward (PERF.md roadmap #6) without config edits.
            pose_grad_kernel=bool(int(os.environ.get(
                "EAGS_POSE_KERNEL",
                int(bool(tc.get("pose_grad_kernel", False)))))),
        )
        self.gt_camera = bool(tc.get("gt_camera", False))
        self.odometry_type = str(tc.get("odometry_type", "const_speed"))

        self.logger = Logger(self.output_path, self.verbose,
                             config.get("use_wandb", False))

        # Device mesh (SURVEY.md §2.4 P4): with >1 devices, mapping runs
        # data-parallel over keyframes (gradients pmean over ICI) and loop
        # closure is pinned to the last device — the TPU equivalent of the
        # reference's pipeline-on-GPU0 / LC-on-GPU1 layout
        # (configs/Replica/replica.yaml:7,59).
        self.mesh = None
        self._lc_device = None
        n_dev = len(jax.devices())
        if n_dev > 1 and bool(config.get("use_mesh", True)):
            from ..parallel.mesh import make_mesh

            n_map = n_dev - 1 if n_dev > 2 else n_dev
            self.mesh = make_mesh(n_map)
            self._lc_device = jax.devices()[-1] if n_dev > 2 else None
        elif bool(config.get("force_mesh", False)):
            # Single-device mesh on demand (bench flag): the mapping step
            # runs through the SAME shard_map/psum code path a real v5e-8
            # would use, with the collectives degenerating to identity —
            # so the measured path is the multi-chip one.
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(n_dev)

        # Spatially-parallel tracking (parallel.mesh.sp_track_refine):
        # shard the refinement's tile grid over the mesh. Opt-in
        # (tracking.sp_track / EAGS_SP_TRACK) — on a single chip it is pure
        # collective overhead; on a v5e-8 it divides the latency-critical
        # per-iteration kernel work.
        sp_track = bool(int(os.environ.get(
            "EAGS_SP_TRACK", int(bool(tc.get("sp_track", False))))))
        self.tracker = Tracker(self.tcfg, self.rcfg, self.cam,
                               mesh=self.mesh, sp_track=sp_track)

        import concurrent.futures

        self._vo_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._vo_next = None  # (frame_id, future): pipelined VO step
        # Decoupled pipelining: the VO advances on its OWN pose chain (pure
        # REVO, no per-frame setTwc injection) and the tracker candidate is
        # composed relatively: slam(f-1) @ inv(vo(f-1)) @ vo(f). step(f+1)
        # can then be submitted BEFORE track(f)'s device dispatch, so the
        # CPU-pinned VO overlaps it fully (measured vo_wait ~274 ms/frame
        # when submission waited for track(f) + injection). The reference
        # injects the refined pose each frame (VO/system/system.cpp setTwc)
        # — with per-frame keyframe promotion the injection only re-anchors
        # the absolute frame, which the relative composition removes anyway.
        self._vo_decoupled = bool(config.get("vo", {}).get("decoupled", True))
        self._vo_last = None  # vo(f-1) in the VO's own world frame
        self.odometer = None
        if self.odometry_type == "odometer" or tc.get(
            "help_camera_initialization", False
        ):
            from ..vo.system import EdgeVO, VOConfig

            vo_cfg_dict = dict(self.config.get("vo", {}))
            if ("downscale_levels" not in vo_cfg_dict
                    and self.dataset.full_camera.width > 800):
                # Large frames: run VO at half resolution (the reference
                # resizes ScanNetPP to 640x480 for VO; the render tracker
                # refines the pose regardless).
                vo_cfg_dict["downscale_levels"] = 1
            if "device" not in vo_cfg_dict and on_tpu:
                # On the tunneled TPU the VO runs on the host CPU backend:
                # the keyframe distance-transform program faulted the remote
                # worker in 7/8 bench runs (pure-XLA program; backend bug),
                # and the reference's REVO frontend is a CPU module anyway.
                vo_cfg_dict["device"] = "cpu"
            self.odometer = EdgeVO(
                VOConfig.from_dict(vo_cfg_dict),
                self.dataset.full_camera,
            )

        self.loop_closer = None
        self.lc_final = bool(config.get("lc", {}).get("final", True))
        if config.get("lc", {}).get("enabled", False):
            from ..lc.loop_closure import LoopClosure

            self.loop_closer = LoopClosure(config, self.output_path, self.cam,
                                           self.dataset,
                                           device=self._lc_device)
            if on_tpu and n_dev == 1 and self.loop_closer.parallel:
                # Single tunneled chip: a background LC thread dispatching
                # full-capacity render programs concurrently with the main
                # loop is the exact crash class that pinned VO to the host
                # CPU (CLAUDE.md). Run LC synchronously at submap
                # boundaries instead; per-closure latency is recorded.
                self.logger.log(
                    "info",
                    {"msg": "single tunneled TPU chip: loop closure runs "
                            "synchronously at submap boundaries"},
                )
                self.loop_closer.parallel = False

        n = len(self.dataset)
        self.estimated_c2ws = np.tile(np.eye(4), (n, 1, 1))
        self.exposures_ab = np.zeros((n, 2))
        self.mapping_frame_ids = list(range(0, n, self.map_every)) + [n - 1]

        self._rng = np.random.default_rng(int(config.get("seed", 0)))
        self._kf_descs: Dict[int, np.ndarray] = {}
        self._new_submap()
        self.submap_id = 0
        self.submap_anchor_frame = 0
        self._prev_saved_anchor: Optional[int] = None
        self.submap_kf_frame_ids: List[int] = []
        self.submap_paths: List[str] = []
        self.track_times: List[float] = []
        self.map_times: List[float] = []
        # Host wall-clock per-stage accumulators (seconds). Free (no device
        # fetches): each bucket ends at a host-visible point anyway, so
        # these attribute the loop's wall time without perturbing it.
        self.stage_s: Dict[str, float] = {
            "upload": 0.0, "boundary": 0.0, "lc_drain": 0.0,
        }

    # ------------------------------------------------------------------
    def _setup_output_path(self):
        if os.path.exists(self.output_path):
            shutil.rmtree(self.output_path)
        os.makedirs(self.output_path, exist_ok=True)
        os.makedirs(os.path.join(self.output_path, "submaps"), exist_ok=True)
        save_config(self.config, os.path.join(self.output_path, "config.yaml"))

    def _new_submap(self):
        # Adaptive capacity: the state lives at the smallest bucket that
        # fits (core.gaussians.expand_state grows it before insertion), so
        # tracking/seeding/optimization all scale with the actual map size.
        self.state = G.empty_state(G.bucket_for(1, self.capacity))
        self.kfs = M.empty_keyframes(self.mcfg.max_keyframes, self.cam)
        self.n_kf = 0  # permanent keyframes in slots 1..n_kf
        self._n_alive = 0
        self._warm_inited = False  # set by start_new_submap's warm insert
        self._kf_seen = 0           # permanent keyframes pushed this submap
        self._warned_reservoir = False

    def _next_kf_slot(self) -> Optional[int]:
        """Permanent-keyframe slot for the current mapped frame.

        While the window has room: the next free slot (1..K-1). Once full:
        reservoir sampling — the n-th keyframe replaces a uniformly random
        slot with probability (K-1)/n, keeping slots 1..K-1 a uniform
        sample over ALL past keyframes of the submap. Returns None when
        the frame is not retained."""
        r = self.mcfg.max_keyframes - 1
        self._kf_seen += 1
        if self.n_kf < r:
            self.n_kf += 1
            return self.n_kf
        j = int(self._rng.integers(0, self._kf_seen))
        return 1 + j if j < r else None

    def _key(self):
        return np.asarray(
            self._rng.integers(0, 2**31 - 1, size=2, dtype=np.uint32)
        )

    # ------------------------------------------------------------------
    def should_start_new_submap(self, frame_id: int) -> bool:
        """Reference gaussian_slam.py:103-117."""
        if self.motion_heuristic:
            if exceeds_motion_thresholds(
                self.estimated_c2ws[frame_id],
                self.estimated_c2ws[self.submap_anchor_frame],
                self.rot_thre, self.trans_thre,
            ):
                return True
        return (frame_id - self.submap_anchor_frame) >= self.new_submap_every

    def save_current_submap(self) -> Optional[str]:
        if not self.submap_kf_frame_ids:
            return None
        anchor = self.submap_anchor_frame
        Twm = self.estimated_c2ws[anchor]
        # T_prev_m chains off the last SAVED submap's anchor (not merely the
        # previous submap, which may have been skipped empty) so the LC
        # anchor chain stays consistent across gaps in disk ids.
        if self._prev_saved_anchor is None:
            T_prev_m = Twm
        else:
            T_prev_m = (
                np.linalg.inv(self.estimated_c2ws[self._prev_saved_anchor]) @ Twm
            )
        self._prev_saved_anchor = anchor
        Tmc = np.stack(
            [
                np.linalg.inv(Twm) @ self.estimated_c2ws[f]
                for f in self.submap_kf_frame_ids
            ]
        )
        descs = None
        if all(f in self._kf_descs for f in self.submap_kf_frame_ids):
            descs = np.stack(
                [self._kf_descs[f] for f in self.submap_kf_frame_ids]
            )
        sm = Submap.from_world_arrays(
            self.submap_id, anchor, Twm, T_prev_m, Tmc,
            self.submap_kf_frame_ids, pack_state(self.state), descs,
        )
        path = sm.save(self.output_path)
        self.submap_paths.append(path)
        return path

    def _warm_pack(self, frame_id: int):
        """Frustum-visible rows of the OUTGOING submap for the warm-start
        init (MapperConfig.init_warm_start), or None when too few are
        visible (fall back to the reference's full re-seed protocol).
        Captured BEFORE `_new_submap` resets the state; the returned rows
        alias the old device arrays."""
        if not self.mcfg.init_warm_start:
            return None
        if self._n_alive < self.mcfg.warm_min_visible:
            return None
        w2c32 = jnp.asarray(
            np.linalg.inv(self.estimated_c2ws[frame_id]), dtype=jnp.float32)
        vis, n = M.warm_visible(
            self.state.params, self.state.alive, w2c32, self.cam)
        n_vis = int(n)
        if n_vis < self.mcfg.warm_min_visible:
            return None
        return self.state.params, vis, n_vis

    def start_new_submap(self, frame_id: int):
        warm = self._warm_pack(frame_id)
        self.submap_id += 1
        self.submap_anchor_frame = frame_id
        self.submap_kf_frame_ids = []
        self._new_submap()
        self._warm_inited = False
        if warm is not None:
            rows, vis, n_vis = warm
            cap = G.bucket_for(n_vis, self.capacity)
            if cap > self.state.alive.shape[0]:
                self.state = G.expand_state(self.state, cap)
            self.state, n_ins = G.insert(self.state, rows, vis)
            self._n_alive = int(n_ins)
            self._warm_inited = True

    # ------------------------------------------------------------------
    def _edge_bits(self, frame_id: int):
        """Bit-packed VO edge mask for seeding, or None for the Canny
        fallback (reference gaussian_slam.py:246-253). Packing keeps the
        host->device edge upload at ~100 KB on the slow tunneled link."""
        # ScanNet++ maps from the Canny fallback even with VO odometry
        # (reference gaussian_slam.py:246-253: `and dataset != scannetpp`
        # gates only the EDGE source, not the odometer).
        if self.config["data"]["dataset_name"] == "scannetpp":
            return None
        if self.odometer is not None:
            e = self.odometer.get_edge_image(frame_id)
            if e is not None:
                e = np.asarray(e, bool)
                # VO may run decimated (VOConfig.downscale_levels):
                # upsample its edge map back to full resolution first.
                full_h = self.dataset.full_camera.height
                sy = max(int(round(full_h / e.shape[0])), 1)
                if sy > 1:
                    e = np.repeat(np.repeat(e, sy, axis=0), sy, axis=1)
                    e = e[:full_h, :self.dataset.full_camera.width]
                c = self.config["cam"].get("crop_edge", 0)
                if c:
                    e = e[c:-c, c:-c]
                if e.shape == (self.cam.height, self.cam.width):
                    return jnp.asarray(np.packbits(e, axis=1))
        return None

    def map_frame(self, frame_id: int, color_np, depth_np, is_new_submap: bool):
        import jax

        prof = os.environ.get("EAGS_PROFILE", "") != ""
        stages = {}

        def _tick(name, *sync):
            if prof:
                if sync:
                    jax.block_until_ready(sync)
                    # block_until_ready is unreliable on the tunneled
                    # backend; force a value fetch.
                    jax.device_get(jax.tree.leaves(sync)[0].ravel()[:1])
                stages[name] = time.perf_counter()

        _tick("t0")
        c2w = self.estimated_c2ws[frame_id]
        w2c32 = jnp.asarray(np.linalg.inv(c2w), dtype=jnp.float32)
        c2w32 = jnp.asarray(c2w, dtype=jnp.float32)
        gt_color = jnp.asarray(color_np)
        gt_depth = jnp.asarray(depth_np)

        # 1. ONE dispatch for the whole seeding path: edges -> mask ->
        # sampling -> backprojection -> dedup + scale-init -> rows
        # (mapper.seed_rows; round 2 ran ~5 dispatches + brute-force NN).
        edge_bits = self._edge_bits(frame_id)
        use_canny = edge_bits is None
        if use_canny:
            wb = -(-self.cam.width // 8)
            edge_bits = self._zero_edge_bits = getattr(
                self, "_zero_edge_bits",
                jnp.zeros((self.cam.height, wb), jnp.uint8),
            )
        # A warm-started submap (start_new_submap copied the previous
        # submap's frustum-visible gaussians) seeds its boundary frame like
        # a REGULAR frame: render-based update mask over the warm map +
        # new_frame_sample_size samples, instead of the 100k+50k re-seed.
        # The iteration cap below stays at new_submap_iterations — the
        # early-stop while_loop exits as soon as the warm map converges.
        warm = is_new_submap and self._warm_inited
        seed_as_new = is_new_submap and not warm
        rows, row_valid, n_valid, seeding_mask = M.seed_rows(
            self.state.params, self.state.alive, jnp.asarray(self._key()),
            gt_color, gt_depth, c2w32, w2c32, edge_bits,
            self.cam, self.rcfg, self.mcfg, seed_as_new, use_canny,
            True, self.mcfg.outlier_removal and not seed_as_new,
        )
        n_valid = int(jax.device_get(n_valid))
        _tick("seed")

        # 2. grow the static capacity if the incoming rows need it.
        if self._n_alive + n_valid > self.state.alive.shape[0]:
            self.state = G.expand_state(
                self.state, G.bucket_for(self._n_alive + n_valid, self.capacity)
            )

        # 3. insert + optimize (current frame in keyframe slot 0) — the
        # second and last dispatch of the mapped frame.
        exposure = jnp.asarray(self.exposures_ab[frame_id], dtype=jnp.float32)
        self.kfs = M.push_keyframe(self.kfs, 0, gt_color, gt_depth, w2c32, exposure)
        iters = (
            self.mcfg.new_submap_iterations if is_new_submap else self.mcfg.iterations
        )
        # Half-res init applies only to the full re-seed protocol; a warm
        # init is already cheap (early stop on a converged map) and its
        # first phase would down-weight the warm map's full-res residuals.
        iters_half = (
            int(round(self.mcfg.init_halfres_frac * iters))
            if seed_as_new else 0
        )
        if iters_half > 0:
            # Half-res init phase (MapperConfig.init_halfres_frac): the
            # boundary frame is the only keyframe of a fresh submap, so
            # phase 1 optimizes against its 2x-downsampled copy (~1/4 the
            # tiles/iter), then phase 2 finishes full-res and computes the
            # full-res LC descriptor. Same two host fetches as the plain
            # path — phase 1's outputs stay on device.
            kfs_half = M.halfres_single_kf(gt_color, gt_depth, w2c32, exposure)
            self.state, n_added, _, _, _ = M.insert_and_optimize(
                self.state, rows, row_valid, kfs_half,
                jnp.asarray(1, jnp.int32), jnp.asarray(self._key()),
                iters_half, self.cam.scaled(1), self.rcfg, self.mcfg,
                mesh=self.mesh,
            )
            self.state, losses, n_alive, kf_desc = M.optimize_and_describe(
                self.state, self.kfs,
                jnp.asarray(self.n_kf + 1, jnp.int32),
                jnp.asarray(self._key()),
                iters - iters_half, self.cam, self.rcfg, self.mcfg,
                mesh=self.mesh,
            )
        else:
            self.state, n_added, losses, n_alive, kf_desc = M.insert_and_optimize(
                self.state, rows, row_valid, self.kfs,
                jnp.asarray(self.n_kf + 1, jnp.int32), jnp.asarray(self._key()),
                iters, self.cam, self.rcfg, self.mcfg, mesh=self.mesh,
            )
        _tick("optimize", losses)

        # 4. make the current frame a permanent keyframe. Past the window
        # capacity, slots 1..K-1 become a uniform RESERVOIR over all past
        # keyframes: the reference keeps every keyframe and samples
        # uniformly from them (mapper.py:143-214, mapper_utils.py:9-23); a
        # uniform reservoir preserves that sampling marginal with bounded
        # device memory instead of dropping every frame past #32
        # (VERDICT r2 weak #6 / next #8).
        slot = self._next_kf_slot()
        if slot is not None:
            self.kfs = M.push_keyframe(
                self.kfs, slot, gt_color, gt_depth, w2c32, exposure
            )
        elif not self._warned_reservoir:
            self._warned_reservoir = True
            self.logger.log(
                "info",
                {"msg": "keyframe window full; reservoir replacement "
                        "active", "frame_id": frame_id,
                 "max_keyframes": self.mcfg.max_keyframes},
            )
        self.submap_kf_frame_ids.append(frame_id)
        n_added, final_loss, n_alive, kf_desc = jax.device_get(
            (n_added, losses[-1, 0], n_alive, kf_desc)
        )
        self._n_alive = int(n_alive)
        # Cache the keyframe descriptor for the submap file (LC reads it
        # instead of re-decoding + re-describing every keyframe).
        self._kf_descs[frame_id] = np.asarray(kf_desc, np.float32)
        if prof:
            _tick("fetch")
            keys = list(stages)
            deltas = {
                f"{keys[i]}_ms": round(
                    1e3 * (stages[keys[i]] - stages[keys[i - 1]]), 1
                )
                for i in range(1, len(keys))
            }
            deltas["n_valid"] = int(n_valid)
            deltas["n_alive"] = int(n_alive)
            deltas["iters"] = int(iters)
            self.logger.log("map_profile", deltas)

        # Mapping visualization panel every 10 keyframes (reference
        # logger.py:116-199 saves 2x3 panels; verbose-gated inside).
        self._n_mapped = getattr(self, "_n_mapped", 0) + 1
        if self.verbose and self._n_mapped % 10 == 0:
            from ..core.sh import sh_to_rgb
            from ..ops.rasterizer import render

            p = self.state.params
            out = render(p.xyz, p.quats, p.log_scales, p.opacity_logits,
                         sh_to_rgb(p.f_dc), w2c32, self.cam, self.rcfg,
                         alive=self.state.alive)
            self.logger.vis_mapping(frame_id, out.color, out.depth,
                                    gt_color, gt_depth, seeding_mask)

        return {
            "n_added": int(n_added),
            "n_alive": self._n_alive,
            "final_loss": float(final_loss),
        }

    def _upload_frame(self, color, depth):
        """One compact host->device transfer per frame.

        The tunneled device link measures ~20 MB/s; a float32 frame pair is
        ~13 MB (~0.6 s). Color travels as uint8 and depth as float16
        (quantization 1/255 and ~0.1% — below sensor noise), expanded to
        f32 on device; tracker, mapper AND (crop_edge == 0) the VO frontend
        share the same device arrays instead of re-uploading."""
        c8 = np.clip(np.asarray(color) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        d16 = np.asarray(depth).astype(np.float16)
        c8_dev = jnp.asarray(c8)
        color_dev = c8_dev.astype(jnp.float32) / 255.0
        depth_dev = jnp.asarray(d16).astype(jnp.float32)
        # Host copies for a CPU-pinned VO (avoids device->host fetches).
        self._host_frame = (c8, d16.astype(np.float32))
        return color_dev, depth_dev, c8_dev

    def _vo_inputs(self, frame_id, c8_dev, depth_dev):
        """VO frame input: the shared device arrays when the map frame IS
        the origin frame (crop_edge 0), else the host origin image (the VO
        tracks the UNCROPPED frame, reference datasets.py:66-76). A
        CPU-pinned VO gets the HOST copies instead (feeding it tunneled
        device arrays would fetch ~4 MB/frame back through the link)."""
        if getattr(self.dataset, "crop_edge", 0) == 0:
            if self.odometer is not None and self.odometer.on_cpu:
                return self._host_frame
            return c8_dev, depth_dev
        return self.dataset.get_origin_image(frame_id)

    def _vo_host_inputs(self, frame_id):
        """Host-side VO inputs for PIPELINED submission (frame not uploaded
        yet; the preloader has the host arrays)."""
        if getattr(self.dataset, "crop_edge", 0) == 0:
            _, color, depth, _ = self.dataset[frame_id]
            c8 = np.clip(np.asarray(color) * 255.0 + 0.5, 0, 255).astype(
                np.uint8
            )
            return c8, np.asarray(depth, np.float32)
        return self.dataset.get_origin_image(frame_id)

    def _submit_vo_next(self, frame_id: int, n: int):
        """Pipeline the NEXT frame's VO step one frame ahead (reference P2
        only overlapped the CURRENT step with candidate prep; a CPU-pinned
        VO can instead run across this frame's mapping and the next frame's
        upload, hiding its full ~0.5-1 s). Only safe when the VO is on the
        host CPU backend: its programs never touch the tunneled device, so
        the worker thread cannot race main-thread device dispatch. In
        coupled mode this must be called AFTER set_pose(frame_id, ...) so
        the step sees the corrected pose chain; in decoupled mode the VO
        advances on its own chain and is submitted before the track
        dispatch (the main thread must not mutate VO state afterwards)."""
        if (self.odometer is None or not self.odometer.on_cpu
                or frame_id + 1 >= n):
            return
        nxt = frame_id + 1
        rgb, d = self._vo_host_inputs(nxt)
        self._vo_next = (
            nxt,
            self._vo_pool.submit(self.odometer.step, rgb, d,
                                 self.dataset.timestamps[nxt]),
        )

    def _apply_lc_corrections(self):
        """Apply pending LC correction transforms to the LIVE pose array.

        Each entry left-multiplies a frame range; the last range is
        open-ended so frames tracked after the LC submit boundary inherit
        their submap chain's correction instead of reverting to a stale
        snapshot."""
        corrs = self.loop_closer.drain_corrections()
        if not corrs:
            return
        for start, end, corr in corrs:
            e = len(self.estimated_c2ws) if end is None else end
            self.estimated_c2ws[start:e] = corr @ self.estimated_c2ws[start:e]

    # ------------------------------------------------------------------
    def _fetch_frame(self, frame_id: int):
        gt_pose = (
            np.asarray(self.dataset.poses[frame_id], np.float64)
            if self.dataset.poses else np.eye(4)
        )
        dev = self.dataset.device_frame(frame_id)
        if dev is not None:
            # Device-resident frame (synthetic datasets pre-upload at init):
            # expand on device, no per-frame host->device transfer and no
            # host f32 conversion. The raw host cache still feeds the
            # CPU-pinned VO.
            c8_dev, d16_dev = dev
            color_dev = c8_dev.astype(jnp.float32) / 255.0
            depth_dev = d16_dev.astype(jnp.float32)
            rgb8, depth = self.dataset.get_origin_image(frame_id)
            self._host_frame = (rgb8, depth)
            return color_dev, depth_dev, c8_dev, gt_pose
        _, color, depth, _ = self.dataset[frame_id]
        return self._upload_frame(color, depth) + (gt_pose,)

    def run(self) -> Dict:
        n = len(self.dataset)
        t0 = time.perf_counter()
        # Cooperative deadline (bench.py): exit BETWEEN frame dispatches
        # instead of being SIGKILLed mid-RPC by a parent timeout — a kill
        # with a tunnel dispatch in flight reproducibly crashes the remote
        # TPU worker (observed twice on 2026-08-20: each bench killed at
        # its deadline left the next run's backend probe hanging ~25 min).
        deadline_ts = float(self.config.get("bench_deadline_ts", 0) or 0)
        frames_run = n
        for frame_id in range(n):
            if deadline_ts and time.time() > deadline_ts:
                print(f"deadline: stopping cleanly after {frame_id}/{n} "
                      "frames", flush=True)
                frames_run = frame_id
                break
            # Upload inline, consumed by the immediately-following dispatch.
            # Prefetching the NEXT frame's transfer (worker thread or
            # main-thread async) leaves a DMA in flight overlapping
            # unrelated compute, which reproducibly crashed the tunneled
            # TPU worker (4/4 bench attempts, 3 at the same fetch); the
            # tunnel only tolerates transfers serialized against compute
            # by data dependency.
            t_up = time.perf_counter()
            color_dev, depth_dev, c8_dev, gt_pose = self._fetch_frame(frame_id)
            self.stage_s["upload"] += time.perf_counter() - t_up

            t_track = time.perf_counter()
            if frame_id in (0, 1) or self.gt_camera:
                # Frames 0/1 use GT pose (reference :198-206).
                self.estimated_c2ws[frame_id] = gt_pose
                if self.odometer is not None:
                    pending = getattr(self, "_vo_next", None)
                    if pending is not None and pending[0] == frame_id:
                        pending[1].result()  # pipelined step already ran
                        self._vo_next = None
                    else:
                        rgb0, d0 = self._vo_inputs(frame_id, c8_dev, depth_dev)
                        if frame_id == 0:
                            self.odometer.set_pose(0, gt_pose)
                        self.odometer.step(
                            rgb0, d0, self.dataset.timestamps[frame_id]
                        )
                    self.odometer.set_pose(frame_id, gt_pose)
                    self._vo_last = np.asarray(gt_pose, np.float64)
                    self._submit_vo_next(frame_id, n)
            else:
                # VO step dispatched concurrently with candidate prep
                # (reference P2: 1-worker future, tracker.py:199-202), or
                # already in flight since the previous frame (pipelined,
                # see _submit_vo_next).
                vo_future = None
                if self.odometer is not None:
                    pending = getattr(self, "_vo_next", None)
                    if pending is not None and pending[0] == frame_id:
                        vo_future = pending[1]
                        self._vo_next = None
                    else:
                        rgb0, d0 = self._vo_inputs(frame_id, c8_dev, depth_dev)
                        vo_future = self._vo_pool.submit(
                            self.odometer.step, rgb0, d0,
                            self.dataset.timestamps[frame_id],
                        )
                # Host numpy: a 4x4 chain is not worth a device round trip.
                p1 = self.estimated_c2ws[frame_id - 1]
                p2 = self.estimated_c2ws[frame_id - 2]
                candidates = {
                    "const_speed": p1 @ np.linalg.inv(p2) @ p1,
                    "previous": p1,
                }
                t_vo = time.perf_counter()
                if vo_future is not None:
                    vo_c2w = np.asarray(vo_future.result(), np.float64)
                    if self._vo_decoupled:
                        # Compose the VO's own relative motion onto the
                        # SLAM chain; vo(f-1)/vo(f) live in the VO frame.
                        if frame_id >= 3 and self._vo_last is not None:
                            candidates["odometer"] = (
                                p1
                                @ np.linalg.inv(self._vo_last)
                                @ vo_c2w
                            )
                        self._vo_last = vo_c2w
                        # The worker is idle now; step(f+1) overlaps the
                        # track dispatch below (no injection afterwards).
                        self._submit_vo_next(frame_id, n)
                    elif frame_id >= 3:
                        candidates["odometer"] = vo_c2w
                vo_wait_ms = 1e3 * (time.perf_counter() - t_vo)

                # Tracking reads the map but never writes it; the state
                # already lives at the smallest capacity bucket that fits
                # the alive count (adaptive capacity, _new_submap), so no
                # per-frame compaction gather is needed.
                c2w, exposure, stats = self.tracker.track(
                    self.state.params, self.state.alive,
                    self.estimated_c2ws[frame_id - 1], candidates,
                    color_dev, depth_dev,
                )
                self.estimated_c2ws[frame_id] = c2w
                self.exposures_ab[frame_id] = np.asarray(exposure)
                if self.odometer is not None and not self._vo_decoupled:
                    # Coupled mode (reference setTwc semantics): inject the
                    # refined pose, then pipeline step(f+1) — it must see
                    # the corrected chain, so submission waits until here.
                    self.odometer.set_pose(frame_id, c2w)
                    self._submit_vo_next(frame_id, n)
                stats["vo_wait_ms"] = vo_wait_ms
                self.logger.log_tracking(
                    frame_id, {k: float(v) for k, v in stats.items()}
                )
                if self.tcfg.debug_per_iter:
                    per = getattr(self.tracker, "last_per_iter", None)
                    if per is not None:
                        from .tracker import DEBUG_ITER_NAMES

                        self.logger.log("track_iters", {
                            "frame_id": frame_id,
                            "names": list(DEBUG_ITER_NAMES),
                            "iters": np.round(per, 6).tolist(),
                        })
            self.track_times.append(time.perf_counter() - t_track)

            # Submap boundary (reference :220-244).
            is_new_submap = False
            if frame_id not in (0,) and self.should_start_new_submap(frame_id):
                t_b = time.perf_counter()
                path = self.save_current_submap()
                if self.loop_closer is not None and path is not None:
                    self.loop_closer.submit(self.submap_id, frame_id,
                                            self.estimated_c2ws)
                self.start_new_submap(frame_id)
                is_new_submap = True
                self.stage_s["boundary"] += time.perf_counter() - t_b

            # Boundary frames are ALWAYS mapped (reference
            # gaussian_slam.py:246-252 maps on `is_new_submap` regardless of
            # map_every): the fresh submap must be seeded+optimized before
            # the next frame tracks against it — otherwise tracking renders
            # an empty map (inf loss) until the next scheduled mapping
            # frame and falls back to raw odometry for those frames.
            if frame_id in self.mapping_frame_ids or is_new_submap:
                t_map = time.perf_counter()
                stats = self.map_frame(
                    frame_id, color_dev, depth_dev,
                    is_new_submap or frame_id == 0,
                )
                self.map_times.append(time.perf_counter() - t_map)
                stats["map_ms"] = 1e3 * (time.perf_counter() - t_map)
                stats["is_new"] = bool(is_new_submap or frame_id == 0)
                self.logger.log_mapping(frame_id, stats)

            if self.loop_closer is not None:
                t_d = time.perf_counter()
                self.loop_closer.check_futures()
                self._apply_lc_corrections()
                self.stage_s["lc_drain"] += time.perf_counter() - t_d

        # Final submap + final LC, gated by `lc.final` (reference :278-296).
        path = self.save_current_submap()
        if self.loop_closer is not None:
            if path is not None and self.lc_final:
                self.loop_closer.submit(self.submap_id, frames_run - 1,
                                        self.estimated_c2ws)
            self.loop_closer.finalize()
            self._apply_lc_corrections()

        total = time.perf_counter() - t0
        np.savez(
            os.path.join(self.output_path, "estimated_c2w.npz"),
            c2ws=self.estimated_c2ws,
            exposures=self.exposures_ab,
        )
        report = {
            "frames": frames_run,
            "fps": frames_run / total,
            "total_s": total,
            "track_ms_avg": 1e3 * float(np.mean(self.track_times)),
            "map_ms_avg": 1e3 * float(np.mean(self.map_times)) if self.map_times else 0,
            "stage_totals_s": {
                "track": round(float(np.sum(self.track_times)), 2),
                "map": round(float(np.sum(self.map_times)), 2),
                **{k: round(v, 2) for k, v in self.stage_s.items()},
            },
            "tracker": self.tracker.report(),
        }
        if self.odometer is not None:
            report["vo"] = self.odometer.report()
            self.odometer.dump_tum(
                os.path.join(self.output_path, "vo_traj_tum.txt"),
                self.dataset.timestamps,
            )
        if self.loop_closer is not None:
            report["lc"] = self.loop_closer.report()
        self._save_iteration_histogram()
        self.logger.log("report", report)
        return report

    def _save_iteration_histogram(self):
        """Tracking iteration-count histogram PNG (reference
        gaussian_slam.py:149-167, tracking_vis/). Verbose-gated."""
        if not self.verbose or not self.tracker.iter_cnt:
            return
        try:  # pragma: no cover - visualization only
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            d = os.path.join(self.output_path, "tracking_vis")
            os.makedirs(d, exist_ok=True)
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.hist(self.tracker.iter_cnt, bins=20)
            ax.set_xlabel("tracking iterations")
            ax.set_ylabel("frames")
            fig.savefig(os.path.join(d, "iteration_histogram.png"), dpi=80)
            plt.close(fig)
        except Exception:
            pass

    def cleanup(self):
        self.dataset.close()
        self.logger.close()
        self._vo_pool.shutdown(wait=False)
        if self.loop_closer is not None:
            self.loop_closer.shutdown()
