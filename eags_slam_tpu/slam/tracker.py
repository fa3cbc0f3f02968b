"""Render-based camera tracking (the gaussian refinement half of
coarse-to-fine tracking).

Reference: src/entities/tracker.py — `compute_losses` (:69-128, masked L1
color+depth w.r.t. a relative w2c transform), `init_pose_min_loss` (:130-169,
candidate init poses scored by loss), the per-frame optimization loop
(:258-327, Adam(amsgrad) + ReduceLROnPlateau + early stop + best-iterate
recovery) and adaptive iteration doubling (:230-242).

TPU re-design: the whole per-frame refinement is ONE jitted
`lax.while_loop` — pose (quat, trans, exposure) updates, plateau LR
scheduling, early-stop counting and best-pose tracking are carried state, so
a frame costs a single device dispatch instead of 60-200+ kernel launches.
The pose is parameterized exactly like the reference: w2c_cur =
last_w2c @ Rel(q, t), and gradients flow through the rasterizer's projection
(no override_means/override_rotations plumbing needed — autodiff w.r.t. the
pose replaces the reference's transformed-gaussian trick, tracker.py:85-98).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..core.se3 import quat_to_rotmat, rotmat_to_quat
from ..core.sh import sh_to_rgb
from ..ops.rasterizer import (FrozenBinning, RasterConfig, TileRender,
                              freeze_binning, freeze_sorted, gt_tiles, render,
                              render_frozen, render_frozen_sorted,
                              render_frozen_sorted_pose,
                              render_frozen_sorted_tiles,
                              render_frozen_sorted_tiles_pose)
from ..utils import optim


class TrackerConfig(NamedTuple):
    iterations: int = 60
    cam_rot_lr: float = 0.002
    cam_trans_lr: float = 0.01
    exposure_lr: float = 0.01
    w_color_loss: float = 0.95
    alpha_thre: float = 0.98
    filter_alpha: bool = True
    filter_outlier_depth: bool = True
    soft_alpha: bool = True
    mask_invalid_depth: bool = False
    early_stop_thre: float = 1e-6
    early_stop_cnt: int = 10
    # Stop when the BEST iterate hasn't improved for this many iterations
    # (the loop returns the best pose, so this rarely changes the result —
    # see _refine). 0 disables (reference protocol: full budget).
    stale_best_cnt: int = 0
    # Freeze tile binning at the init pose for the whole refinement loop
    # (pallas backend): per-iteration cost drops from sort+scatter+gather+
    # kernel to elementwise reprojection + kernel (see PERF.md / rasterizer
    # FrozenBinning). margin px guard against footprint drift.
    frozen_binning: bool = True
    init_err_ratio: float = 5.0
    enable_exposure: bool = False
    # ReduceLROnPlateau parity (reference configs scheduler_factor/patience
    # = 0.95/5; gaussian_model.py:382-383).
    plateau_patience: int = 5
    plateau_factor: float = 0.95
    # Pose-contraction backward (sorted backend, PERF.md roadmap #6): the
    # refinement gradient is contracted in-kernel against precomputed
    # per-gaussian pose jacobians instead of materializing + rmw-ing a
    # (NCH, Npad) per-gaussian grad array that XLA reduces to 7 scalars.
    # Same chain-rule sum in a different association order (golden-tested
    # to ~1e-6 relative); default off pending a chip measurement.
    pose_grad_kernel: bool = False
    # Tile-subset refinement (sorted backend): refine the pose on the
    # top-`frac * T` tiles ranked by mapped (alpha^3-weighted) image+depth
    # gradient energy. The pose has ~7 DOF, so information-rich tiles carry
    # nearly the full-image gradient at a fraction of the kernel cost;
    # candidate scoring stays full-image (reference protocol). 0 disables.
    tile_subset_frac: float = 0.25
    # Polish phase: with tile-subset refinement on, run the LAST
    # `polish_iters` iterations on a WIDER tile set (`polish_frac` of the
    # tiles; 1.0 = full image), warm-starting pose AND optimizer state from
    # the subset phase. The subset phase does the cheap bulk convergence;
    # the polish removes (most of) the subset-selection bias from the final
    # pose (the subset optimum is shifted by whichever tiles were picked).
    # 0 disables (pure subset refinement).
    polish_iters: int = 0
    polish_frac: float = 1.0
    # Per-iteration diagnostics (reference logger.py:24-93 logs loss + pose
    # error per tracking iteration): the refinement runs as a scan with
    # stacked per-iter (total, color, depth, lr_scale, quat4, trans3)
    # records returned to the host. Tuning aid; adds the stacked-output
    # traffic, off by default.
    debug_per_iter: bool = False


class PoseParams(NamedTuple):
    quat: jnp.ndarray      # (4,) wxyz, relative rotation (w2c side)
    trans: jnp.ndarray     # (3,)
    exposure: jnp.ndarray  # (2,) (a, b)


def _rel_matrix(p: PoseParams) -> jnp.ndarray:
    R = quat_to_rotmat(p.quat)
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(p.trans)
    return T


def _losses_from_output(out, pose: PoseParams, gt_color, gt_depth,
                        tcfg: TrackerConfig, valid=None):
    """Masked tracking losses (reference compute_losses tracker.py:69-128).

    Works on full images (H, W, *) or stacked tile subsets (S, ts, ts, *);
    `valid` (same shape as gt_depth) excludes pixels outside the image on
    tiles straddling the padded boundary."""
    image = out.color
    if tcfg.enable_exposure:
        image = jnp.clip(jnp.exp(pose.exposure[0]) * image + pose.exposure[1],
                         0.0, 1.0)
    depth_mask = gt_depth > 0.0
    if valid is not None:
        depth_mask = depth_mask & valid
    tracking_mask = depth_mask
    if tcfg.filter_alpha:
        tracking_mask = tracking_mask & (out.alpha > tcfg.alpha_thre)
    if tcfg.filter_outlier_depth:
        depth_err = jnp.abs(out.depth - gt_depth) * depth_mask
        # Median over a regular 1/16 pixel subsample: the exact full-image
        # median is a per-iteration sort of every pixel (~1-3 ms at bench
        # shapes, comparable to the subset render itself); the reference's
        # 50x-median outlier gate (tracker.py:107-113) is insensitive to
        # the ~0.5%-quantile sampling error of a strided subsample.
        med = jnp.median(depth_err[..., ::4, ::4])
        tracking_mask = tracking_mask & jnp.where(
            med > 0, depth_err < 50.0 * med, True
        )

    color_px = jnp.abs(image - gt_color) + 1e-8            # (H, W, 3)
    if valid is not None:
        color_px = color_px * valid[..., None]
    depth_px = (jnp.abs(out.depth - gt_depth) + 1e-8) * tracking_mask

    if tcfg.soft_alpha:
        a3 = out.alpha**3
        color_px = color_px * a3[..., None]
        depth_px = depth_px * a3
        if tcfg.mask_invalid_depth:
            color_px = color_px * tracking_mask[..., None]
    else:
        color_px = color_px * tracking_mask[..., None]

    # Empty-render guard: a pose from which nothing renders has zero masked
    # pixels; sum/count would yield 0 and "win" the candidate selection (the
    # reference hits 0/0 = NaN there, which torch comparisons also never
    # select). Make it explicitly +inf.
    n_color = jnp.sum(color_px > 0)
    n_depth = jnp.sum(depth_px > 0)
    color_loss = jnp.where(
        n_color > 0, jnp.sum(color_px) / jnp.maximum(n_color, 1), jnp.inf
    )
    depth_loss = jnp.where(
        n_depth > 0, jnp.sum(depth_px) / jnp.maximum(n_depth, 1), jnp.inf
    )
    return color_loss, depth_loss


def _losses(
    params: GaussianParams, alive, colors, pose: PoseParams, last_w2c,
    gt_color, gt_depth, cam: Camera, rcfg: RasterConfig, tcfg: TrackerConfig,
):
    w2c = last_w2c @ _rel_matrix(pose)
    out = render(params.xyz, params.quats, params.log_scales,
                 params.opacity_logits, colors, w2c, cam, rcfg, alive=alive)
    return _losses_from_output(out, pose, gt_color, gt_depth, tcfg)


@functools.partial(jax.jit, static_argnames=("cam", "rcfg", "tcfg"))
def eval_init_candidates(
    params: GaussianParams, alive, rel_mats, last_w2c, gt_color, gt_depth,
    cam: Camera, rcfg: RasterConfig, tcfg: TrackerConfig,
):
    """Loss of each candidate init pose (reference init_pose_min_loss).

    rel_mats: (C, 4, 4) relative transforms (w2c side). Returns (C,) total
    losses plus (C,) color and depth components.
    """
    colors = sh_to_rgb(params.f_dc)

    def one(rel):
        q = rotmat_to_quat(rel[:3, :3])
        pose = PoseParams(q, rel[:3, 3], jnp.zeros(2))
        cl, dl = _losses(params, alive, colors, pose, last_w2c, gt_color,
                         gt_depth, cam, rcfg, tcfg)
        return jnp.stack([tcfg.w_color_loss * cl + (1 - tcfg.w_color_loss) * dl,
                          cl, dl])

    out = jax.lax.map(one, rel_mats)
    return out  # (C, 3): total, color, depth — ONE fetch for the caller


STAT_NAMES = ("loss", "color_loss", "depth_loss", "iters", "best_iter")


class _TrackCarry(NamedTuple):
    it: jnp.ndarray
    pose: PoseParams
    adam: optim.AdamState
    plateau: optim.PlateauState
    prev_loss: jnp.ndarray
    break_cnt: jnp.ndarray
    done: jnp.ndarray
    best_loss: jnp.ndarray
    best_pose: PoseParams
    best_cl: jnp.ndarray
    best_dl: jnp.ndarray
    best_it: jnp.ndarray


def _make_loss_fn(
    params: GaussianParams, alive, colors, init_rel, last_w2c, gt_color,
    gt_depth, cam: Camera, rcfg: RasterConfig, tcfg: TrackerConfig,
    subset=None,
):
    """Build the refinement loss over the backend-appropriate fast path.

    `subset` (tile_ids, gt_c_tiles, gt_d_tiles, in_img) switches the
    frozen-sorted path to tile-subset rendering (see TrackerConfig
    .tile_subset_frac)."""
    backend = rcfg.backend
    if backend == "auto":
        backend = "sorted" if jax.default_backend() == "tpu" else "jnp"
    if tcfg.frozen_binning and backend == "sorted":
        # v2 fast path: freeze the center-sorted segment table once; the
        # kernel re-ranks depths per iteration (exact ordering under pose
        # motion; see ops.rasterizer.FrozenSorted).
        fs = freeze_sorted(params.xyz, params.quats, params.log_scales,
                           params.opacity_logits, colors,
                           last_w2c @ init_rel, cam, rcfg, alive=alive)

        if subset is not None:
            tile_ids, gt_c_t, gt_d_t, in_img = subset

            if tcfg.pose_grad_kernel:
                def loss_fn(pose: PoseParams):
                    pv = jnp.concatenate([pose.quat, pose.trans])
                    out = render_frozen_sorted_tiles_pose(
                        fs, pv, last_w2c, tile_ids, cam, rcfg)
                    cl, dl = _losses_from_output(out, pose, gt_c_t, gt_d_t,
                                                 tcfg, valid=in_img)
                    return (tcfg.w_color_loss * cl
                            + (1 - tcfg.w_color_loss) * dl, (cl, dl))
            else:
                def loss_fn(pose: PoseParams):
                    out = render_frozen_sorted_tiles(
                        fs, last_w2c @ _rel_matrix(pose), tile_ids, cam, rcfg
                    )
                    cl, dl = _losses_from_output(out, pose, gt_c_t, gt_d_t,
                                                 tcfg, valid=in_img)
                    return (tcfg.w_color_loss * cl
                            + (1 - tcfg.w_color_loss) * dl, (cl, dl))
        elif tcfg.pose_grad_kernel:
            def loss_fn(pose: PoseParams):
                pv = jnp.concatenate([pose.quat, pose.trans])
                out = render_frozen_sorted_pose(fs, pv, last_w2c, cam, rcfg)
                cl, dl = _losses_from_output(out, pose, gt_color, gt_depth,
                                             tcfg)
                return (tcfg.w_color_loss * cl
                        + (1 - tcfg.w_color_loss) * dl, (cl, dl))
        else:
            def loss_fn(pose: PoseParams):
                out = render_frozen_sorted(fs, last_w2c @ _rel_matrix(pose),
                                           cam, rcfg)
                cl, dl = _losses_from_output(out, pose, gt_color, gt_depth,
                                             tcfg)
                return (tcfg.w_color_loss * cl
                        + (1 - tcfg.w_color_loss) * dl, (cl, dl))
    elif tcfg.frozen_binning and backend == "pallas":
        fb = freeze_binning(params.xyz, params.quats, params.log_scales,
                            params.opacity_logits, colors,
                            last_w2c @ init_rel, cam, rcfg, alive=alive)

        def loss_fn(pose: PoseParams):
            out = render_frozen(fb, last_w2c @ _rel_matrix(pose), cam, rcfg)
            cl, dl = _losses_from_output(out, pose, gt_color, gt_depth, tcfg)
            return (tcfg.w_color_loss * cl + (1 - tcfg.w_color_loss) * dl,
                    (cl, dl))
    else:
        def loss_fn(pose: PoseParams):
            cl, dl = _losses(params, alive, colors, pose, last_w2c, gt_color,
                             gt_depth, cam, rcfg, tcfg)
            return (tcfg.w_color_loss * cl + (1 - tcfg.w_color_loss) * dl,
                    (cl, dl))
    return loss_fn


def _refine(loss_fn, init_rel, num_iters, exposure0, tcfg: TrackerConfig,
            warm=None):
    """Pose-refinement while_loop over `loss_fn(PoseParams) -> (total, (cl,
    dl))`; returns (rel_best 4x4, exposure, stats_vec, per_iter, carry).

    `warm` (adam, plateau) continues a previous phase's optimizer state
    instead of a cold Adam start (used by the tile-subset -> full-image
    polish, where a fresh Adam's bias-corrected first steps are full-size
    +-lr kicks that a short polish budget cannot recover from)."""
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def cond(c: _TrackCarry):
        return (c.it < num_iters) & ~c.done

    def body(c: _TrackCarry):
        (total, (cl, dl)), grads = grad_fn(c.pose)

        # Early stop bookkeeping (reference :264-277): the counter tracks
        # consecutive |loss delta| < thre REGARDLESS of sign — a slow
        # sub-threshold descent is converged and stops. (A previous
        # improved-resets-counter variant never fired at bench motion:
        # 58.3/60 iters avg in PERF.md run 7.)
        flat = jnp.abs(total - c.prev_loss) < tcfg.early_stop_thre
        break_cnt = jnp.where(flat, c.break_cnt + 1, 0)
        done = break_cnt > tcfg.early_stop_cnt
        if tcfg.stale_best_cnt > 0:
            # Stale-best stop: the refinement RETURNS the best iterate, so
            # once the best hasn't improved for K iterations, further
            # iterations can only change the result if a late improvement
            # arrives — cheap compute cut with a bounded effect on the
            # returned pose (the |delta| counter above never fires at bench
            # motion: 58.3/60 iters avg, PERF.md run 7). Protocol knob,
            # default off (reference runs its full budget, tracker.py:
            # 264-277).
            done = done | (c.it - c.best_it > tcfg.stale_best_cnt)

        lr = optim.PlateauState(*c.plateau).lr_scale
        lr_tree = PoseParams(
            quat=tcfg.cam_rot_lr * lr,
            trans=tcfg.cam_trans_lr * lr,
            exposure=tcfg.exposure_lr * lr,
        )
        new_pose, adam = optim.adam_update(
            c.adam, c.pose, grads, lr_tree, amsgrad=True
        )
        new_pose = new_pose._replace(
            quat=new_pose.quat / jnp.maximum(jnp.linalg.norm(new_pose.quat), 1e-12)
        )
        plateau = optim.plateau_update(
            c.plateau, total, tcfg.plateau_patience, tcfg.plateau_factor
        )

        improved = total < c.best_loss
        best_pose = jax.tree.map(
            lambda n, o: jnp.where(improved, n, o), c.pose, c.best_pose
        )
        return _TrackCarry(
            it=c.it + 1,
            pose=new_pose,
            adam=adam,
            plateau=plateau,
            prev_loss=total,
            break_cnt=break_cnt,
            done=done,
            best_loss=jnp.minimum(total, c.best_loss),
            best_pose=best_pose,
            best_cl=jnp.where(improved, cl, c.best_cl),
            best_dl=jnp.where(improved, dl, c.best_dl),
            best_it=jnp.where(improved, c.it, c.best_it),
        )

    q0 = rotmat_to_quat(init_rel[:3, :3])
    pose0 = PoseParams(q0, init_rel[:3, 3], exposure0)
    adam0 = optim.adam_init(pose0) if warm is None else warm[0]
    plateau0 = optim.plateau_init() if warm is None else warm[1]
    init = _TrackCarry(
        it=jnp.zeros((), jnp.int32),
        pose=pose0,
        adam=adam0,
        plateau=plateau0,
        prev_loss=jnp.array(jnp.inf),
        break_cnt=jnp.zeros((), jnp.int32),
        done=jnp.array(False),
        best_loss=jnp.array(jnp.inf),
        best_pose=pose0,
        best_cl=jnp.array(jnp.inf),
        best_dl=jnp.array(jnp.inf),
        best_it=jnp.zeros((), jnp.int32),
    )
    if tcfg.debug_per_iter:
        # Scan over the static max iteration count with a done-masked body:
        # same trajectory as the while_loop, plus stacked per-iter records
        # (DEBUG_ITER_NAMES) for the host.
        def scan_body(c: _TrackCarry, _):
            nxt = jax.lax.cond(cond(c), body, lambda c: c, c)
            rec = jnp.concatenate([
                jnp.stack([
                    nxt.prev_loss, nxt.best_cl, nxt.best_dl,
                    optim.PlateauState(*c.plateau).lr_scale,
                    cond(c).astype(jnp.float32),
                ]),
                c.pose.quat, c.pose.trans,
            ])
            return nxt, rec

        max_iters = 2 * tcfg.iterations   # doubling headroom
        final, per_iter = jax.lax.scan(scan_body, init, None,
                                       length=max_iters)
    else:
        final = jax.lax.while_loop(cond, body, init)
        per_iter = None
    rel = _rel_matrix(final.best_pose)
    # Packed stats (see STAT_NAMES): one array -> one host fetch.
    stats_vec = jnp.stack([
        final.best_loss, final.best_cl, final.best_dl,
        final.it.astype(jnp.float32), final.best_it.astype(jnp.float32),
    ])
    return (rel, final.best_pose.exposure, stats_vec, per_iter,
            (final.adam, final.plateau))


@functools.partial(jax.jit, static_argnames=("cam", "rcfg", "tcfg"))
def refine_pose(
    params: GaussianParams, alive, init_rel, last_w2c, gt_color, gt_depth,
    num_iters, exposure0, cam: Camera, rcfg: RasterConfig, tcfg: TrackerConfig,
):
    """Optimize the relative pose; returns (rel_best 4x4, exposure, stats).

    num_iters is a runtime value (the reference doubles iterations on high
    init loss, tracker.py:230-242) — a `while_loop` keeps one compilation.
    """
    colors = sh_to_rgb(params.f_dc)
    loss_fn = _make_loss_fn(params, alive, colors, init_rel, last_w2c,
                            gt_color, gt_depth, cam, rcfg, tcfg)
    rel, exposure, stats_vec, _, _ = _refine(loss_fn, init_rel, num_iters,
                                             exposure0, tcfg)
    return rel, exposure, stats_vec


def _select_tiles(gt_color, gt_depth, alpha, cam: Camera, ts: int,
                  tiles_x: int, tiles_y: int, s: int):
    """Top-`s` tiles by mapped information content.

    Score = alpha^3-weighted image-gradient energy + (capped) depth-gradient
    energy, plus a small valid-depth bonus: tiles that are both textured and
    already mapped (high alpha -> pixels survive the tracking mask) carry
    the pose gradient; flat or unmapped tiles contribute ~nothing."""
    gray = jnp.mean(gt_color, axis=-1)
    gx = jnp.diff(gray, axis=1, append=gray[:, -1:])
    gy = jnp.diff(gray, axis=0, append=gray[-1:, :])
    dgx = jnp.diff(gt_depth, axis=1, append=gt_depth[:, -1:])
    dgy = jnp.diff(gt_depth, axis=0, append=gt_depth[-1:, :])
    energy = (gx * gx + gy * gy
              + 0.01 * jnp.minimum(dgx * dgx + dgy * dgy, 1.0))
    energy = energy * jnp.clip(alpha, 0.0, 1.0) ** 3
    valid = (gt_depth > 0).astype(jnp.float32)

    def tile_sum(x):
        from ..ops.rasterizer import tile_sums
        return tile_sums(x, ts, tiles_x, tiles_y)

    score = tile_sum(energy * valid) + 1e-4 * tile_sum(valid)
    _, tile_ids = jax.lax.top_k(score, s)
    return tile_ids.astype(jnp.int32)


def _in_image_mask(tile_ids, ts: int, tiles_x: int, cam: Camera):
    tx0 = (tile_ids % tiles_x) * ts
    ty0 = (tile_ids // tiles_x) * ts
    uu = tx0[:, None, None] + jnp.arange(ts, dtype=jnp.int32)[None, None, :]
    vv = ty0[:, None, None] + jnp.arange(ts, dtype=jnp.int32)[None, :, None]
    return (uu < cam.width) & (vv < cam.height)


TRACK_STAT_NAMES = STAT_NAMES + ("best_cand", "init_color_loss",
                                 "init_depth_loss")

# Per-iteration debug record layout (TrackerConfig.debug_per_iter).
DEBUG_ITER_NAMES = ("loss", "color_loss", "depth_loss", "lr_scale",
                    "active", "qw", "qx", "qy", "qz", "tx", "ty", "tz")


@functools.partial(jax.jit, static_argnames=("cam", "rcfg", "tcfg"))
def track_frame(
    params: GaussianParams, alive, rel_mats, last_w2c, gt_color, gt_depth,
    med_cl, med_dl, exposure0, cam: Camera, rcfg: RasterConfig,
    tcfg: TrackerConfig,
):
    """Fused per-frame tracking: candidate scoring, adaptive iteration
    doubling, and refinement in ONE device dispatch (one tunnel round trip —
    the reference runs these as separate host-driven stages,
    tracker.py:130-169, 230-242, 258-327).

    Candidate scoring renders full images (reference protocol); the
    refinement optionally runs on a top-score tile subset (sorted backend,
    `tcfg.tile_subset_frac`), selected from the best candidate's alpha map.
    Returns (rel 4x4, exposure, stats_vec of TRACK_STAT_NAMES)."""
    colors = sh_to_rgb(params.f_dc)

    def cand_one(rel):
        q = rotmat_to_quat(rel[:3, :3])
        pose = PoseParams(q, rel[:3, 3], jnp.zeros(2))
        out = render(params.xyz, params.quats, params.log_scales,
                     params.opacity_logits, colors,
                     last_w2c @ _rel_matrix(pose), cam, rcfg, alive=alive)
        cl, dl = _losses_from_output(out, pose, gt_color, gt_depth, tcfg)
        tot = tcfg.w_color_loss * cl + (1 - tcfg.w_color_loss) * dl
        return jnp.stack([tot, cl, dl]), out.alpha

    cand, alphas = jax.lax.map(cand_one, rel_mats)
    best = jnp.argmin(cand[:, 0])
    init_rel = rel_mats[best]
    init_cl, init_dl = cand[best, 1], cand[best, 2]
    double = (init_cl > tcfg.init_err_ratio * med_cl) | (
        init_dl > tcfg.init_err_ratio * med_dl
    )
    num_iters = jnp.where(double, 2 * tcfg.iterations,
                          tcfg.iterations).astype(jnp.int32)

    backend = rcfg.backend
    if backend == "auto":
        backend = "sorted" if jax.default_backend() == "tpu" else "jnp"
    ts = rcfg.tile
    tiles_x = -(-cam.width // ts)
    tiles_y = -(-cam.height // ts)
    num_tiles = tiles_x * tiles_y
    s = int(round(tcfg.tile_subset_frac * num_tiles))
    subset = None
    if 0 < s < num_tiles and backend == "sorted" and tcfg.frozen_binning:
        tile_ids = _select_tiles(gt_color, gt_depth, alphas[best], cam, ts,
                                 tiles_x, tiles_y, s)
        gt_c_t = gt_tiles(gt_color, tile_ids, ts, tiles_x, tiles_y)
        gt_d_t = gt_tiles(gt_depth, tile_ids, ts, tiles_x, tiles_y)
        in_img = _in_image_mask(tile_ids, ts, tiles_x, cam)
        subset = (tile_ids, gt_c_t, gt_d_t, in_img)

    loss_fn = _make_loss_fn(params, alive, colors, init_rel, last_w2c,
                            gt_color, gt_depth, cam, rcfg, tcfg,
                            subset=subset)
    polish = int(tcfg.polish_iters)
    if subset is not None and polish > 0 and not tcfg.debug_per_iter:
        # Two-phase refinement: bulk convergence on the tile subset, then a
        # full-image polish from the subset phase's best pose. The polish
        # loss/stats feed the host's doubling medians, so the loss history
        # stays full-image like the reference's (tracker.py:230-242).
        n1 = jnp.maximum(num_iters - polish, 0)
        rel1, exp1, stats1, per_iter, opt_state = _refine(
            loss_fn, init_rel, n1, exposure0, tcfg)
        s2 = int(round(tcfg.polish_frac * num_tiles))
        subset2 = None
        if 0 < s2 < num_tiles:
            tile_ids2 = _select_tiles(gt_color, gt_depth, alphas[best], cam,
                                      ts, tiles_x, tiles_y, s2)
            subset2 = (tile_ids2,
                       gt_tiles(gt_color, tile_ids2, ts, tiles_x, tiles_y),
                       gt_tiles(gt_depth, tile_ids2, ts, tiles_x, tiles_y),
                       _in_image_mask(tile_ids2, ts, tiles_x, cam))
        loss_wide = _make_loss_fn(params, alive, colors, init_rel, last_w2c,
                                  gt_color, gt_depth, cam, rcfg, tcfg,
                                  subset=subset2)
        n2 = jnp.minimum(jnp.asarray(polish, jnp.int32), num_iters)
        rel, exposure, stats_vec, _, _ = _refine(loss_wide, rel1, n2, exp1,
                                                 tcfg, warm=opt_state)
        # Combined counters: iters/best_iter offset by the subset phase.
        stats_vec = jnp.stack([
            stats_vec[0], stats_vec[1], stats_vec[2],
            stats1[3] + stats_vec[3], stats1[3] + stats_vec[4],
        ])
    else:
        rel, exposure, stats_vec, per_iter, _ = _refine(loss_fn, init_rel,
                                                        num_iters, exposure0,
                                                        tcfg)
    stats_vec = jnp.concatenate([
        stats_vec,
        jnp.stack([best.astype(jnp.float32), init_cl, init_dl]),
    ])
    return rel, exposure, stats_vec, per_iter


class Tracker:
    """Host-side per-frame tracking flow (reference Tracker.track,
    tracker.py:181-348): init-candidate selection, adaptive iteration count,
    jitted refinement, loss history for the init_err_ratio heuristic."""

    def __init__(self, tcfg: TrackerConfig, rcfg: RasterConfig, cam: Camera,
                 mesh=None, sp_track: bool = False):
        self.tcfg = tcfg
        self.rcfg = rcfg
        self.cam = cam
        self.frame_color_loss = []
        self.frame_depth_loss = []
        self.init_pose_cnt = {"const_speed": 0, "previous": 0, "odometer": 0}
        self.iter_cnt = []
        # Spatially-parallel refinement over a device mesh (tile grid
        # sharded, full-grid loss — see parallel.mesh.sp_track_refine).
        # Candidate scoring + iteration doubling move host-side (two
        # dispatches instead of the fused one; on real multi-chip the
        # per-iteration division dominates the extra round trip).
        self._sp_refine = None
        if mesh is not None and sp_track:
            from ..parallel.mesh import sp_track_refine

            if tcfg.debug_per_iter:
                import warnings

                warnings.warn("sp_track drops debug_per_iter records "
                              "(per-iteration diagnostics stay on the "
                              "single-device path)")
            self._sp_refine, _ = sp_track_refine(mesh, cam, rcfg, tcfg)

    def track(
        self, params, alive, last_c2w, init_candidates: dict,
        gt_color, gt_depth, exposure0=None,
    ):
        """Returns (c2w (4,4) np-convertible, exposure, stats dict)."""
        import time

        import numpy as np

        last_w2c = np.linalg.inv(np.asarray(last_c2w, np.float64))
        names = list(init_candidates.keys())
        rels = np.stack(
            [
                np.linalg.inv(np.asarray(c2w, np.float64) @ last_w2c)
                for c2w in init_candidates.values()
            ]
        ).astype(np.float32)

        # Iteration-doubling thresholds (reference tracker.py:230-242); inf
        # with no history -> never doubles, matching the reference's guard.
        med_cl = (np.median(self.frame_color_loss)
                  if self.frame_color_loss else np.inf)
        med_dl = (np.median(self.frame_depth_loss)
                  if self.frame_depth_loss else np.inf)
        exp0 = jnp.zeros(2) if exposure0 is None else jnp.asarray(exposure0)

        t0 = time.perf_counter()
        if self._sp_refine is not None:
            w2c32 = jnp.asarray(last_w2c, dtype=jnp.float32)
            cand = np.asarray(jax.device_get(eval_init_candidates(
                params, alive, jnp.asarray(rels), w2c32, gt_color, gt_depth,
                self.cam, self.rcfg, self.tcfg)))
            best_i = int(np.argmin(cand[:, 0]))
            double = (cand[best_i, 1] > self.tcfg.init_err_ratio * med_cl
                      or cand[best_i, 2] > self.tcfg.init_err_ratio * med_dl)
            num_iters = (2 if double else 1) * self.tcfg.iterations
            rel, exposure, sv = self._sp_refine(
                params, alive, jnp.asarray(rels[best_i]), w2c32, gt_color,
                gt_depth, exp0, num_iters)
            rel, exposure, sv = jax.device_get((rel, exposure, sv))
            stats_vec = np.concatenate([
                np.asarray(sv),
                [best_i, cand[best_i, 1], cand[best_i, 2]],
            ])
            per_iter = None
        else:
            rel, exposure, stats_vec, per_iter = track_frame(
                params, alive, jnp.asarray(rels),
                jnp.asarray(last_w2c, dtype=jnp.float32), gt_color, gt_depth,
                jnp.float32(med_cl), jnp.float32(med_dl), exp0,
                self.cam, self.rcfg, self.tcfg,
            )
            # ONE round trip for everything the host needs this frame.
            rel, exposure, stats_vec = jax.device_get(
                (rel, exposure, stats_vec))
        if per_iter is not None:
            self.last_per_iter = np.asarray(per_iter)  # (I, 12), see
            # DEBUG_ITER_NAMES; rows with active == 0 are past the exit.
        stats = dict(zip(TRACK_STAT_NAMES, (float(v) for v in stats_vec)))
        stats["track_dispatch_ms"] = 1e3 * (time.perf_counter() - t0)
        best = int(stats.pop("best_cand"))
        self.init_pose_cnt[names[best]] = self.init_pose_cnt.get(names[best], 0) + 1
        self.frame_color_loss.append(stats["color_loss"])
        self.frame_depth_loss.append(stats["depth_loss"])
        self.iter_cnt.append(int(stats["iters"]))

        w2c = last_w2c @ np.asarray(rel, np.float64)
        c2w = np.linalg.inv(w2c)
        c2w[3] = [0.0, 0.0, 0.0, 1.0]
        return c2w, exposure, stats

    def report(self) -> dict:
        import numpy as np

        return {
            "init_pose_cnt": dict(self.init_pose_cnt),
            "iters_avg": float(np.mean(self.iter_cnt)) if self.iter_cnt else 0.0,
        }
