"""Submap-to-submap registration by rendering-based pose optimization.

Reference: src/gsr/solver.py — overlap gate < 0.2 (:113-120), top-2
most-similar keyframe views per direction by descriptor score (:135-145),
per-view `viewpoint_localizer` (:16-98, 100 iters of render + pose-gradient
descent), residual-weighted probabilistic fusion with
`roma.special_procrustes` rotation averaging (:181-201).

The pose-gradient rasterizer ("diff-gaussian-rasterization-w-pose") is not a
separate kernel here: `slam.tracker.refine_pose` differentiates the shared
rasterizer w.r.t. the camera transform directly (SURVEY.md §7.1 decision 3).
Submap gaussians are padded to a fixed capacity so every registration hits
the same compiled program.
"""
from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..core.se3 import rotation_average
from ..ops import knn
from ..ops.rasterizer import RasterConfig
from ..slam.tracker import TrackerConfig, refine_pose


class RegistrationResult(NamedTuple):
    successful: bool
    # Correction C: corrected_world_pose_of_target = C @ current_world_pose.
    transformation: np.ndarray   # (4, 4)
    fitness: float               # mean residual-derived weight
    overlap: float
    # 6x6 information matrix of the estimate (point-cloud correspondence
    # J^T J, reference lc.py:555-560 / o3d get_information_matrix_...);
    # None -> caller substitutes a scalar-weight isotropic matrix.
    information: Optional[np.ndarray] = None


def information_matrix(points_src: np.ndarray, points_tgt: np.ndarray,
                       max_corr: float) -> np.ndarray:
    """Open3D-style 6x6 information matrix from NN correspondences.

    For each source point p with a target neighbor within `max_corr`, the
    point-to-point residual's Jacobian wrt the [rho, phi] twist at identity
    is A_p = [I3 | -skew(p)]; the information is sum_p A_p^T A_p (the same
    J^T J the reference gets from
    o3d.pipelines.registration.get_information_matrix_from_point_clouds,
    lc.py:555-560).
    """
    from ..ops import knn as _knn

    p_src = jnp.asarray(points_src, jnp.float32)
    p_tgt = jnp.asarray(points_tgt, jnp.float32)
    d2, _ = _knn.nearest_neighbor(
        p_src, jnp.ones((p_src.shape[0],), bool),
        p_tgt, jnp.ones((p_tgt.shape[0],), bool),
    )
    m = np.asarray(d2) < max_corr * max_corr
    p = np.asarray(points_src)[m]
    if p.shape[0] == 0:
        return np.eye(6)
    # A^T A in closed form with S = skew(p):
    #   sum_p S        = skew(sum_p p)
    #   sum_p S^T S    = (sum |p|^2) I3 - sum p p^T
    n = p.shape[0]
    ps = p.sum(axis=0)
    sk = np.array([
        [0.0, -ps[2], ps[1]],
        [ps[2], 0.0, -ps[0]],
        [-ps[1], ps[0], 0.0],
    ])
    info = np.zeros((6, 6))
    info[:3, :3] = n * np.eye(3)
    info[:3, 3:] = -sk
    info[3:, :3] = -sk.T
    info[3:, 3:] = float((p * p).sum()) * np.eye(3) - p.T @ p
    return info


def _pad_params(g: Dict[str, np.ndarray], capacity: int):
    """Packed world-frame gaussian dict -> capacity-padded GaussianParams."""
    n = g["xyz"].shape[0]
    if n > capacity:
        idx = np.random.default_rng(0).choice(n, capacity, replace=False)
        g = {k: v[idx] for k, v in g.items()}
        n = capacity

    def pad(x, fill=0.0):
        if x.size and fill == 0.0 and not x.any():
            # All-zero channel (SH rest at degree 0 is 45 of the ~59
            # floats/row): materialize device-side, skipping both the
            # capacity-sized host buffer and the tunnel upload.
            return jnp.zeros((capacity,) + x.shape[1:], x.dtype)
        out = np.full((capacity,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out)

    params = GaussianParams(
        xyz=pad(g["xyz"]),
        f_dc=pad(g["f_dc"]),
        f_rest=pad(g["f_rest"]),
        log_scales=pad(g["log_scales"], -10.0),
        quats=pad(g["quats"]),
        opacity_logits=pad(g["opacity_logits"], -10.0),
    )
    alive = jnp.arange(capacity) < n
    return params, alive


def viewpoint_localize(
    params: GaussianParams, alive, view_c2w: np.ndarray, gt_color, gt_depth,
    cam: Camera, rcfg: RasterConfig, iters: int = 100,
    base_lr: float = 1e-3,
) -> Tuple[np.ndarray, float]:
    """Optimize a camera pose so the rendered map matches the view's RGB-D.

    Returns (corrected c2w, final loss). reference viewpoint_localizer
    (:16-98): MonoGS tracking loss, SE3 update (rot lr = 3*base_lr, trans
    lr = base_lr, solver.py:27-34), plateau 0.98/5 (:53).
    """
    tcfg = TrackerConfig(
        iterations=iters, cam_rot_lr=3.0 * base_lr, cam_trans_lr=base_lr,
        w_color_loss=0.95, alpha_thre=0.95, filter_alpha=True,
        filter_outlier_depth=True, soft_alpha=False, early_stop_cnt=15,
        plateau_factor=0.98, plateau_patience=5,
        # Loop-closure drift can exceed the frozen-binning margin (tracking
        # moves px-scale; LC corrections can be dm-scale) — rebin per step.
        frozen_binning=False,
    )
    last_w2c = np.linalg.inv(np.asarray(view_c2w, np.float64))
    rel, _, stats = refine_pose(
        params, alive, jnp.eye(4), jnp.asarray(last_w2c, dtype=jnp.float32),
        gt_color, gt_depth, jnp.asarray(iters, jnp.int32), jnp.zeros(2),
        cam, rcfg, tcfg,
    )
    w2c_new = last_w2c @ np.asarray(rel, np.float64)
    return np.linalg.inv(w2c_new), float(stats[0])  # loss (STAT_NAMES)


@functools.partial(jax.jit,
                   static_argnames=("iters", "restarts", "cam", "rcfg",
                                    "subset_frac", "base_lr"))
def _localize_batch(params: GaussianParams, alive, last_w2cs, colors, depths,
                    iters: int, restarts: int, cam: Camera,
                    rcfg: RasterConfig, subset_frac: float = 0.25,
                    base_lr: float = 1e-3):
    """All of one registration side's viewpoint localizations in ONE device
    dispatch (VERDICT r2 next #5): `lax.map` over the stacked views runs the
    per-view refinement loops sequentially inside a single program —
    avoiding both the per-view dispatch round trips and vmap-batching the
    Pallas rasterizer (which Mosaic does not lift).

    `restarts > 1` splits the iteration budget into that many frozen-sorted
    refinement segments, RE-FREEZING the tile binning at the updated pose
    between segments: per-iteration cost drops from sort+gather+kernel to
    the cheap frozen-sorted path, while the periodic re-freeze still tracks
    the dm-scale corrections loop closure must solve (a single frozen
    binning would be stale at that scale; measured rebin-per-step
    registration was 16-40 s each, PERF.md round 3).

    With `subset_frac` > 0 (sorted backend), every segment EXCEPT the last
    refines on the top-`subset_frac` information tiles (selected per
    segment from a render at the segment's start pose — the same ranking
    the tracker uses); the FINAL segment always runs full-image, so the
    returned loss stays full-image comparable for the residual-weighted
    fusion and the last dm->mm refinement carries no tile-selection bias.
    Returns (rels (V,4,4), losses (V,))."""
    from ..slam.tracker import (_in_image_mask, _make_loss_fn, _refine,
                                _select_tiles)
    from ..core.sh import sh_to_rgb
    from ..ops.rasterizer import gt_tiles, render

    inner = -(-iters // max(restarts, 1))
    # Reference viewpoint_localizer LRs: rot 3*base_lr, trans base_lr
    # (solver.py:27-34); ReduceLROnPlateau 0.98/5 (:53). base_lr comes from
    # the scene config's lc.registration.base_lr (1e-3 Replica, 5e-3
    # TUM/ScanNet/ScanNet++).
    tcfg = TrackerConfig(
        iterations=inner, cam_rot_lr=3.0 * base_lr, cam_trans_lr=base_lr,
        w_color_loss=0.95, alpha_thre=0.95, filter_alpha=True,
        filter_outlier_depth=True, soft_alpha=False, early_stop_cnt=15,
        plateau_factor=0.98, plateau_patience=5,
        frozen_binning=restarts > 1,
    )
    backend = rcfg.backend
    if backend == "auto":
        backend = "sorted" if jax.default_backend() == "tpu" else "jnp"
    ts = rcfg.tile
    tiles_x = -(-cam.width // ts)
    tiles_y = -(-cam.height // ts)
    num_tiles = tiles_x * tiles_y
    s = int(round(subset_frac * num_tiles))
    use_subset = (0 < s < num_tiles and restarts > 1
                  and backend == "sorted" and tcfg.frozen_binning)
    colors_g = sh_to_rgb(params.f_dc)

    def one(args):
        last_w2c, color, depth = args
        rel_acc = jnp.eye(4)
        loss = jnp.float32(jnp.inf)
        n_seg = max(restarts, 1)
        for seg in range(n_seg):
            base_w2c = last_w2c @ rel_acc
            subset = None
            if use_subset and seg < n_seg - 1:
                out0 = render(params.xyz, params.quats, params.log_scales,
                              params.opacity_logits, colors_g, base_w2c,
                              cam, rcfg, alive=alive)
                tile_ids = _select_tiles(color, depth, out0.alpha, cam, ts,
                                         tiles_x, tiles_y, s)
                subset = (tile_ids,
                          gt_tiles(color, tile_ids, ts, tiles_x, tiles_y),
                          gt_tiles(depth, tile_ids, ts, tiles_x, tiles_y),
                          _in_image_mask(tile_ids, ts, tiles_x, cam))
            loss_fn = _make_loss_fn(params, alive, colors_g, jnp.eye(4),
                                    base_w2c, color, depth, cam, rcfg, tcfg,
                                    subset=subset)
            rel, _, stats, _, _ = _refine(loss_fn, jnp.eye(4),
                                          jnp.asarray(inner, jnp.int32),
                                          jnp.zeros(2), tcfg)
            rel_acc = rel_acc @ rel
            loss = stats[0]
        return rel_acc, loss

    return jax.lax.map(one, (last_w2cs, colors, depths))


def icp_registration(
    gauss_src: Dict[str, np.ndarray],
    gauss_tgt: Dict[str, np.ndarray],
    iters: int = 15,
    dist: float = 0.25,
    robust: bool = False,
) -> RegistrationResult:
    """Point-to-point ICP on gaussian centers (reference icp/robust_icp
    paths lc.py:454-566, Open3D). `robust` first runs the FPFH + RANSAC
    global registration (lc/pcr.py, reference gsr/pcr.py:10-45) to escape
    large-basin misalignments, then refines with a shrinking-distance ICP
    schedule. Returns the correction C for the target cloud."""
    src = gauss_src["xyz"].astype(np.float64)
    tgt = gauss_tgt["xyz"].astype(np.float64)
    cap = 20000
    rng = np.random.default_rng(0)
    if len(src) > cap:
        src = src[rng.choice(len(src), cap, replace=False)]
    if len(tgt) > cap:
        tgt = tgt[rng.choice(len(tgt), cap, replace=False)]
    C = np.eye(4)
    if robust:
        from .pcr import global_registration

        # C maps target-cloud points toward the source cloud.
        T_init, inl = global_registration(tgt, src)
        if inl > 0.1:
            C = T_init
    fitness = 0.0
    src_j = jnp.asarray(src, dtype=jnp.float32)
    src_mask = jnp.ones((len(src),), bool)
    for it in range(iters):
        d = dist * (0.5 ** (it // 5)) if robust else dist
        cur = tgt @ C[:3, :3].T + C[:3, 3]
        d2, nn_all = knn.nearest_neighbor(
            jnp.asarray(cur, dtype=jnp.float32),
            jnp.ones((len(cur),), bool), src_j, src_mask,
        )
        d2 = np.asarray(d2)
        nn_all = np.asarray(nn_all)
        match = d2 < d * d
        fitness = float(match.mean())
        if match.sum() < 10:
            return RegistrationResult(False, np.eye(4), fitness, fitness)
        sub = cur[match]
        nn = nn_all[match]
        A = sub - sub.mean(0)
        B = src[nn] - src[nn].mean(0)
        H = A.T @ B
        U, _, Vt = np.linalg.svd(H)
        S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ S @ U.T
        t = src[nn].mean(0) - R @ sub.mean(0)
        step = np.eye(4)
        step[:3, :3] = R
        step[:3, 3] = t
        C = step @ C
    return RegistrationResult(fitness > 0.3, C, fitness, fitness)


def gaussian_registration(
    gauss_src: Dict[str, np.ndarray],
    gauss_tgt: Dict[str, np.ndarray],
    views_src: List[dict],
    views_tgt: List[dict],
    desc_src: np.ndarray,
    desc_tgt: np.ndarray,
    cam: Camera,
    rcfg: RasterConfig,
    capacity: int,
    overlap_thre: float = 0.2,
    top_views: int = 2,
    pose_opt_iters: int = 100,
    base_lr: float = 1e-3,
    use_render: bool = False,
    overlap_dist: float = 0.05,
    localize_level: int = 0,
    localize_restarts: int = 4,
    localize_subset_frac: float = 0.25,
    timings: Optional[Dict[str, object]] = None,
) -> RegistrationResult:
    """Estimate correction C aligning the *target* submap onto the *source*.

    views_*: list of {c2w, color (H,W,3) jnp, depth (H,W) jnp} keyframes OR
    zero-arg callables returning such dicts (lazy loading: only the
    top-`top_views` selected views per side are ever resolved/decoded).
    desc_*: (K, D) descriptors of those keyframes.

    localize_level: pyramid level for the viewpoint localizations (each
    level halves resolution; the reference runs full-res, :16-98). The
    correction C solves dm-scale inter-submap drift — a half-res solve
    reaches the same basin at ~1/4 the per-iteration render cost, and the
    non-frozen rebin-per-step path dominates LC latency (measured 21.7 s
    per registration full-res at 262k / 1200x680, PERF.md).
    """
    import time as _time

    def _tick(name, t0):
        if timings is not None:
            timings[name] = timings.get(name, 0.0) + 1e3 * (
                _time.perf_counter() - t0)
        return _time.perf_counter()

    t0 = _time.perf_counter()
    p_src, a_src = _pad_params(gauss_src, capacity)
    p_tgt, a_tgt = _pad_params(gauss_tgt, capacity)
    t0 = _tick("pad_ms", t0)

    overlap = float(
        knn.overlap_ratio(p_src.xyz, a_src, p_tgt.xyz, a_tgt, overlap_dist)
    )
    t0 = _tick("overlap_ms", t0)
    if overlap < overlap_thre:
        return RegistrationResult(False, np.eye(4), 0.0, overlap)

    # Cross-similarity: pick target views that look like source content and
    # vice versa (reference :135-145).
    sim = desc_src @ desc_tgt.T  # (Ks, Kt)
    tgt_best = np.argsort(-sim.max(axis=0))[:top_views]   # target views
    src_best = np.argsort(-sim.max(axis=1))[:top_views]   # source views

    def resolve(views, idxs):
        out = []
        for vi in idxs:
            v = views[int(vi)]
            out.append(v() if callable(v) else v)
        return out

    corrections: List[np.ndarray] = []
    losses: List[float] = []
    # Target views rendered against the SOURCE map give C directly
    # (C = c2w' @ inv(c2w)); source views against the TARGET map give the
    # inverse correction. Each side's localizations run as ONE dispatch.
    # p_own is the view's OWN submap: with use_render the localization
    # target is a render of the view from its own map instead of the raw
    # observation (reference solver.py:155-168, `use_render` in the ScanNet
    # configs — suppresses sensor noise/exposure drift in the target).
    for p_map, a_map, p_own, a_own, view_list, invert in (
        (p_src, a_src, p_tgt, a_tgt, resolve(views_tgt, tgt_best), False),
        (p_tgt, a_tgt, p_src, a_src, resolve(views_src, src_best), True),
    ):
        if not view_list:
            continue
        last_w2cs = np.stack([
            np.linalg.inv(np.asarray(v["c2w"], np.float64)) for v in view_list
        ])
        if use_render:
            from ..core.sh import sh_to_rgb
            from ..ops.rasterizer import render as _render

            own_colors = sh_to_rgb(p_own.f_dc)
            rc, rd = [], []
            for k, v in enumerate(view_list):
                out = _render(p_own.xyz, p_own.quats, p_own.log_scales,
                              p_own.opacity_logits, own_colors,
                              jnp.asarray(last_w2cs[k], jnp.float32),
                              cam, rcfg, alive=a_own)
                rc.append(jnp.clip(out.color, 0.0, 1.0))
                # NaN depth = empty pixels -> 0 (masked invalid downstream).
                rd.append(jnp.nan_to_num(out.depth, nan=0.0))
            colors = jnp.stack(rc)
            depths = jnp.stack(rd)
        else:
            colors = jnp.stack([jnp.asarray(v["color"]) for v in view_list])
            depths = jnp.stack([jnp.asarray(v["depth"]) for v in view_list])
        cam_l = cam
        if localize_level > 0:
            f = 1 << localize_level
            cam_l = cam.scaled(localize_level)
            hc, wc = cam_l.height * f, cam_l.width * f
            # Color: box average (anti-aliased); depth: stride sample
            # (averaging across depth edges fabricates phantom surfaces).
            colors = colors[:, :hc, :wc].reshape(
                colors.shape[0], cam_l.height, f, cam_l.width, f, 3
            ).mean(axis=(2, 4))
            depths = depths[:, :hc:f, :wc:f]
        t0 = _tick("views_ms", t0)
        rels, losses_v = _localize_batch(
            p_map, a_map, jnp.asarray(last_w2cs, dtype=jnp.float32),
            colors, depths, pose_opt_iters, localize_restarts, cam_l, rcfg,
            subset_frac=localize_subset_frac, base_lr=base_lr,
        )
        rels = np.asarray(rels, np.float64)
        t0 = _tick("localize_ms", t0)
        losses_v = np.asarray(losses_v)
        for k, v in enumerate(view_list):
            w2c_new = last_w2cs[k] @ rels[k]
            c2w_new = np.linalg.inv(w2c_new)
            C = c2w_new @ np.linalg.inv(np.asarray(v["c2w"], np.float64))
            corrections.append(np.linalg.inv(C) if invert else C)
            losses.append(float(losses_v[k]))

    losses_np = np.asarray(losses)
    if not np.all(np.isfinite(losses_np)) or not all(
        np.all(np.isfinite(c)) for c in corrections
    ):
        return RegistrationResult(False, np.eye(4), 0.0, overlap)

    # Residual-weighted fusion (reference :181-201): softmax over -loss.
    w = np.exp(-(losses_np - losses_np.min()) / max(losses_np.std(), 1e-6))
    w = w / w.sum()
    Rs = jnp.asarray(np.stack([c[:3, :3] for c in corrections]), dtype=jnp.float32)
    R_fused = np.asarray(
        rotation_average(Rs, jnp.asarray(w, dtype=jnp.float32)), np.float64
    )
    t_fused = np.sum(
        np.stack([c[:3, 3] for c in corrections]) * w[:, None], axis=0
    )
    C = np.eye(4)
    C[:3, :3] = R_fused
    C[:3, 3] = t_fused
    return RegistrationResult(True, C, float(w.max()), overlap)
