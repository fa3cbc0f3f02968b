"""Keyframe mapping: seeding, submap growth, jitted submap optimization.

Reference: src/entities/mapper.py (262-399 `map`, 114-228 `optimize_submap`,
230-260 `grow_submap`, seeding mask :299-314, sampling :317-334) and
src/utils/mapper_utils.py (keyframe distribution :9-23, gradient sampling
:169-190, radius dedup :193-226, Canny mask :271-290).

TPU re-design:
  - all sampling is Gumbel-top-k on device (static sample counts + validity
    masks instead of np.random.choice's dynamic shapes);
  - `optimize_submap` is ONE jitted `lax.scan` over iterations: keyframe
    selection, render, loss, masked-Adam step, the two pruning passes, the
    every-5%-iters best-state checkpoint with rollback-on-bad-prune, and the
    post-prune early-stop counter all live in the scan carry — no host
    round-trips inside the hot loop (SURVEY.md §7.3 hard part 7);
  - SH features are NOT optimized during SLAM (the reference freezes
    _features_dc/_features_rest after growth, mapper.py:358-359), so the
    optimized pytree excludes them entirely;
  - dedup of new points runs against all alive gaussians (the reference
    first frustum-culls then dedups, mapper.py:338-343; with the default
    radius this is equivalent for in-frustum candidates and the full masked
    kNN is one MXU matmul).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera, backproject
from ..core.gaussians import (GaussianParams, GaussianState, OptimizedParams,
                              concat_rows, edge_pair_seeds, edge_rows, insert,
                              point_rows, prune)
from ..core.sh import sh_to_rgb
from ..ops import knn
from ..ops.image import dilate, gradient_sample_probs
from ..ops.losses import isotropic_loss, l1_loss, masked_l1, ssim
from ..ops.rasterizer import (RasterConfig, gt_tiles, render,
                              render_tiles)
from ..utils import optim


class MapperConfig(NamedTuple):
    iterations: int = 100
    new_submap_iterations: int = 100
    new_submap_points_num: int = 100000
    new_submap_gradient_points_num: int = 50000
    new_frame_sample_size: int = 30000
    new_points_radius: float = 1e-7
    current_view_opt_iterations: float = 0.4
    alpha_thre: float = 0.6
    pruning_thre: float = 0.1
    edge_dilate: int = 2
    depth_thres: float = 0.025          # edge-pair depth consistency
    lambda_dssim: float = 0.2
    outlier_removal: bool = False       # TUM/ScanNet statistical filter
    max_keyframes: int = 32
    # Growth NN backend: "morton" = fused sorted-window dedup + scale-init
    # (ops.knn.morton_window_nn, ~tens of ms); "brute" = exact chunked
    # matmul passes (0.5-1.1 s/mapped frame at bench shapes on the v5e).
    nn_backend: str = "morton"
    # Tile-subset stochastic mapping (PERF.md roadmap): optimize a random
    # subset of tiles per iteration; 0 disables (full image). Only active on
    # the sorted backend; the gradient is an unbiased estimate of the
    # full-image one (tiles sampled uniformly without replacement).
    tile_subset: int = 0
    # Resident-sorted mapping (PERF.md roadmap #4): sample a keyframe once
    # per `kf_block` iterations and keep params + Adam moments physically
    # permuted in that keyframe's center-tile order for the whole block —
    # the per-iteration N-index gather (fwd) and column scatter-add (bwd)
    # vanish; one stacked permute per block amortizes over the block.
    # 0 disables (per-iteration keyframe sampling, as the reference).
    kf_block: int = 10
    # Adaptive converged-tile freezing (PERF.md round 3): once `it >=
    # freeze_after * iterations` (default just past the last 60% prune),
    # each kf_block starts with ONE full-image iteration that does the
    # bookkeeping tick and ranks tiles by masked L1 residual; the rest of
    # the block optimizes only the top `freeze_frac` fraction of tiles.
    # Converged tiles contribute ~zero gradient, so skipping them leaves
    # the optimization unchanged while kernel work drops ~1/freeze_frac
    # for the frozen phase. 0 disables. Resident path only.
    freeze_frac: float = 0.0
    freeze_after: float = 0.65
    # Half-resolution submap-init phase (VERDICT r3 next #4): the first
    # `init_halfres_frac` of new_submap_iterations optimize against a
    # 2x-downsampled copy of the boundary keyframe (tiles/iter divide by
    # ~4), then the remainder runs full-res. 0 disables (= reference
    # protocol: all init iters full-res, mapper.py:317-334).
    init_halfres_frac: float = 0.0
    # Warm-start submap init (VERDICT r3 next #4 "frustum re-anchor instead
    # of re-seeding"): a new submap starts from the previous submap's
    # frustum-visible gaussians (live state is world-frame, so this is a
    # masked copy — no transform) and the boundary frame seeds like a
    # REGULAR frame (new_frame_sample_size, render-based update mask)
    # instead of the 100k+50k re-seed. The iteration cap stays at
    # new_submap_iterations; the early-stop while_loop exits sooner on the
    # warm map. Off (= reference protocol, mapper.py:317-334: fresh seeds
    # every submap) unless both flags below are satisfiable.
    init_warm_start: bool = False
    # Convergence stop for the optimization loops (0 = off = reference
    # behavior): stop once the loss EMA has failed to beat the checkpointed
    # best for this many consecutive post-last-prune iterations.
    stale_best_cnt: int = 0
    # Fall back to the full re-seed protocol when fewer than this many
    # gaussians are visible in the boundary frame (sharp turns, new rooms).
    warm_min_visible: int = 20000
    # 3DGS LRs (reference arguments.py:53-72; xyz schedule barely moves over
    # <=1k submap iters so the initial value is used).
    lr_xyz: float = 1e-4
    lr_scaling: float = 5e-3
    lr_rotation: float = 1e-3
    lr_opacity: float = 0.05


class KeyframeBatch(NamedTuple):
    """Fixed-capacity stacked keyframes of the active submap."""

    color: jnp.ndarray      # (K, H, W, 3)
    depth: jnp.ndarray      # (K, H, W)
    w2c: jnp.ndarray        # (K, 4, 4)
    exposure: jnp.ndarray   # (K, 2) (a, b)
    valid: jnp.ndarray      # (K,) bool


def empty_keyframes(k: int, cam: Camera) -> KeyframeBatch:
    return KeyframeBatch(
        color=jnp.zeros((k, cam.height, cam.width, 3)),
        depth=jnp.zeros((k, cam.height, cam.width)),
        w2c=jnp.tile(jnp.eye(4)[None], (k, 1, 1)),
        exposure=jnp.zeros((k, 2)),
        valid=jnp.zeros((k,), bool),
    )


@functools.partial(jax.jit, donate_argnums=0)
def push_keyframe(kfs: KeyframeBatch, slot, color, depth, w2c, exposure
                  ) -> KeyframeBatch:
    """Write a keyframe into `slot` (dynamic index, ONE compile for all
    slots — a Python-int slot made XLA specialize per value, ~55 s of
    compiles over a submap's lifetime). Donation updates the stacked
    keyframe buffers in place (hundreds of MB at Replica resolution)."""
    slot = jnp.asarray(slot, jnp.int32)
    return KeyframeBatch(
        color=kfs.color.at[slot].set(color),
        depth=kfs.depth.at[slot].set(depth),
        w2c=kfs.w2c.at[slot].set(w2c),
        exposure=kfs.exposure.at[slot].set(exposure),
        valid=kfs.valid.at[slot].set(True),
    )


def _split(params: GaussianParams) -> OptimizedParams:
    return OptimizedParams(params.xyz, params.log_scales, params.quats,
                           params.opacity_logits)


def _merge(params: GaussianParams, opt: OptimizedParams) -> GaussianParams:
    return params._replace(xyz=opt.xyz, log_scales=opt.log_scales,
                           quats=opt.quats, opacity_logits=opt.opacity_logits)


# ---------------------------------------------------------------------------
# Seeding
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cam", "rcfg", "alpha_thre"))
def seeding_mask_update(
    params: GaussianParams, alive, w2c, gt_depth, cam: Camera,
    rcfg: RasterConfig, alpha_thre: float,
):
    """Non-new-submap seeding mask (reference mapper.py:307-314):
    alpha < thre  OR  (rendered_depth > gt AND depth_err > 40 * median)."""
    out = render(params.xyz, params.quats, params.log_scales,
                 params.opacity_logits, sh_to_rgb(params.f_dc), w2c, cam, rcfg,
                 alive=alive)
    valid_d = gt_depth > 0
    err = jnp.abs(gt_depth - out.depth) * valid_d
    med = jnp.median(err)
    depth_mask = (out.depth > gt_depth) & (err > 40.0 * med)
    return (out.alpha < alpha_thre) | depth_mask


@functools.partial(
    jax.jit,
    static_argnames=("n_uniform", "n_gradient", "n_mask", "is_new"),
)
def sample_seed_ids(
    key, seeding_mask, gt_depth, gray, n_uniform: int, n_gradient: int,
    n_mask: int, is_new: bool,
):
    """Seed pixel ids, fixed size, validity-masked.

    New submap (reference :320-326): union(uniform U, gradient-weighted G,
    all mask pixels capped at n_mask) with duplicates removed.
    Update (:327-331): up to n_mask pixels uniformly from the seeding mask.
    Zero-depth pixels are dropped (:332-333).
    """
    p = seeding_mask.size
    flat_mask = seeding_mask.reshape(-1) & (gt_depth.reshape(-1) > 0)

    def gumbel_topk(k2, logits, n):
        g = jax.random.gumbel(k2, logits.shape)
        _, idx = jax.lax.top_k(logits + g, n)
        return idx.astype(jnp.int32)

    if is_new:
        k1, k2, k3 = jax.random.split(key, 3)
        uni = gumbel_topk(k1, jnp.zeros((p,)), n_uniform)
        grad_logits = jnp.log(gradient_sample_probs(gray) + 1e-12)
        grd = gumbel_topk(k2, grad_logits, n_gradient)
        mask_logits = jnp.where(flat_mask, 0.0, -jnp.inf)
        msk = gumbel_topk(k3, mask_logits, n_mask)
        msk_valid = flat_mask[msk]
        ids = jnp.concatenate([uni, grd, msk])
        valid = jnp.concatenate(
            [jnp.ones((n_uniform + n_gradient,), bool), msk_valid]
        )
        # unique: sort and drop adjacent equals
        order = jnp.argsort(jnp.where(valid, ids, jnp.iinfo(jnp.int32).max))
        s_ids = ids[order]
        s_val = valid[order]
        dup = jnp.concatenate([jnp.array([False]), s_ids[1:] == s_ids[:-1]])
        ids, valid = s_ids, s_val & ~dup
    else:
        mask_logits = jnp.where(flat_mask, 0.0, -jnp.inf)
        ids = gumbel_topk(key, mask_logits, n_mask)
        valid = flat_mask[ids]

    valid = valid & (gt_depth.reshape(-1)[ids] > 0)
    return ids, valid


@functools.partial(jax.jit, static_argnames=("cam",))
def backproject_world(gt_color, gt_depth, c2w, cam: Camera):
    """(H*W, 3) world points (at 1.0001 * depth, reference :318) + colors."""
    pts_cam = backproject(cam, 1.0001 * gt_depth)
    R, t = c2w[:3, :3], c2w[:3, 3]
    pts_w = pts_cam.reshape(-1, 3) @ R.T + t
    return pts_w, gt_color.reshape(-1, 3)


# ---------------------------------------------------------------------------
# Growth
# ---------------------------------------------------------------------------


def _build_rows(
    map_xyz, map_alive,
    sample_ids, sample_valid,
    all_pts_w, all_rgb,
    edge_img, gt_depth,
    radius: float,
    height: int, width: int,
    use_edge: bool, outlier: bool,
    depth_thres: float,
    nn_backend: str,
) -> Tuple[GaussianParams, jnp.ndarray]:
    """Candidate gaussian rows for insertion: dedup vs the submap, optional
    outlier filter, kNN scale init, point + edge rows (shared by
    `grow_submap` and the fused `seed_rows`)."""
    cand = all_pts_w[sample_ids]
    if nn_backend == "morton":
        # One fused pass computes dedup AND the scale-init kNN. Deviation
        # from the reference's order (dedup first, then distCUDA2 over the
        # FILTERED union, gaussian_model.py:251-255): dedup-dropped rows
        # still count as kNN neighbors here; they lie within `radius` of a
        # kept point, so the estimate shifts by at most O(radius).
        keep, dist2 = knn.morton_window_nn(
            cand, sample_valid, map_xyz, map_alive, radius
        )
        if outlier:
            keep = keep & knn.statistical_inlier_mask(cand, keep, nb=20)
        sample_valid = keep
    else:
        keep = knn.radius_dedup(cand, sample_valid, map_xyz, map_alive, radius)
        if outlier:
            keep = keep & knn.statistical_inlier_mask(cand, keep, nb=20)
        sample_valid = keep

        # Scale init: kNN over (alive submap + new samples), like the
        # reference's global_scale_init distCUDA2 over the concatenated
        # cloud (:251-255) — computed for the CANDIDATE rows only
        # (query-vs-union), not the full union x union square.
        union_pts = jnp.concatenate([map_xyz, cand], axis=0)
        union_mask = jnp.concatenate([map_alive, sample_valid], axis=0)
        dist2 = knn.mean_sq_dist_knn_query(
            cand, sample_valid, union_pts, union_mask,
            self_offset=map_xyz.shape[0],
        )

    if use_edge:
        (_, _, pair_valid, exyz, ergb, elog_s, equat, member) = edge_pair_seeds(
            sample_ids, sample_valid, edge_img, gt_depth,
            all_pts_w, all_rgb, height, width, depth_thres,
        )
        opacity = jnp.where(member, 0.1, 0.5)
        rows = concat_rows(
            point_rows(cand, all_rgb[sample_ids], dist2, opacity),
            edge_rows(exyz, ergb, elog_s, equat),
        )
        valid = jnp.concatenate([sample_valid, pair_valid])
    else:
        rows = point_rows(cand, all_rgb[sample_ids], dist2,
                          jnp.full(sample_ids.shape, 0.5))
        valid = sample_valid
    return rows, valid


@functools.partial(
    jax.jit, static_argnames=("cam", "height", "width", "use_edge", "outlier"))
def grow_submap(
    state: GaussianState,
    key,
    sample_ids, sample_valid,
    all_pts_w, all_rgb,
    edge_img, gt_depth,
    radius: float,
    cam: Camera, height: int, width: int,
    use_edge: bool, outlier: bool,
    depth_thres: float = 0.025,
) -> Tuple[GaussianState, jnp.ndarray]:
    """Dedup new samples vs the submap, optional outlier filter, then insert
    point gaussians (+ edge gaussians when an edge image is available).
    Exact (brute-force) NN semantics; the pipeline path is `seed_rows` +
    `insert_and_optimize`."""
    rows, valid = _build_rows(
        state.params.xyz, state.alive, sample_ids, sample_valid,
        all_pts_w, all_rgb, edge_img, gt_depth, radius, height, width,
        use_edge, outlier, depth_thres, nn_backend="brute",
    )
    return insert(state, rows, valid)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "rcfg", "mcfg", "is_new", "use_canny", "use_edge",
                     "outlier"),
)
def seed_rows(
    params: GaussianParams, alive, key, gt_color, gt_depth, c2w, w2c,
    edge_bits, cam: Camera, rcfg: RasterConfig, mcfg: MapperConfig,
    is_new: bool, use_canny: bool, use_edge: bool = True,
    outlier: bool = False,
):
    """The WHOLE pre-optimization mapped-frame path in ONE dispatch.

    Fuses seeding-mask computation (render-based update mask or dilated
    edges, reference mapper.py:299-314), seed-pixel sampling (:317-334),
    backprojection (:318), radius dedup + scale-init kNN
    (mapper_utils.py:193-226 / gaussian_model.py:251-255) and candidate row
    assembly. Round 2 ran these as ~5 separate dispatches on a tunnel with
    a ~35 ms dispatch floor plus 0.5-1.1 s of brute-force NN (VERDICT r2
    next #1); this is one dispatch whose output feeds `insert_and_optimize`.

    `edge_bits`: np.packbits-packed (H, ceil(W/8)) uint8 VO edge mask (used
    when use_canny=False); with use_canny=True the Canny fallback runs
    in-graph and `edge_bits` is ignored.

    Returns (rows, valid, n_valid, seeding_mask); the host fetches
    `n_valid` to pick the insertion bucket (core.gaussians.expand_state).
    """
    from ..ops.image import canny, rgb_to_gray, unpack_mask_bits

    gray255 = rgb_to_gray(gt_color) * 255.0
    if use_canny:
        # Non-VO fallback = the reference's orchestrator-side edge image
        # cv2.Canny(gray, 150, 100) with default L1 gradient
        # (gaussian_slam.py:253) — low 100 / high 150. (mapper_utils.py:285's
        # 100/200 L2 mask is dead code there: the orchestrator always passes
        # an edge image.)
        edge_b = canny(gray255, 100.0, 150.0, l2gradient=False)
    else:
        edge_b = unpack_mask_bits(edge_bits, cam.height, cam.width)
    edge_b = edge_b.at[0].set(False).at[-1].set(False)
    edge_b = edge_b.at[:, 0].set(False).at[:, -1].set(False)

    if is_new:
        seeding_mask = dilate(edge_b, mcfg.edge_dilate)
    else:
        seeding_mask = seeding_mask_update(
            params, alive, w2c, gt_depth, cam, rcfg, mcfg.alpha_thre
        )

    ids, valid = sample_seed_ids(
        key, seeding_mask, gt_depth, gray255,
        mcfg.new_submap_points_num, mcfg.new_submap_gradient_points_num,
        mcfg.new_frame_sample_size, is_new,
    )
    pts_w, rgbs = backproject_world(gt_color, gt_depth, c2w, cam)
    rows, row_valid = _build_rows(
        params.xyz, alive, ids, valid, pts_w, rgbs, edge_b, gt_depth,
        mcfg.new_points_radius, cam.height, cam.width, use_edge, outlier,
        mcfg.depth_thres, mcfg.nn_backend,
    )
    n_valid = jnp.sum(row_valid.astype(jnp.int32))
    return rows, row_valid, n_valid, seeding_mask


# ---------------------------------------------------------------------------
# Submap optimization (the #1 hot loop)
# ---------------------------------------------------------------------------


def _keyframe_distribution(n_kf, k_max: int, cur_frac: float):
    """P(keyframe): index 0 (current frame) gets `cur_frac`, the remaining
    mass is uniform over the other valid keyframes (mapper_utils.py:9-23)."""
    idx = jnp.arange(k_max)
    valid = idx < n_kf
    others = jnp.maximum(n_kf - 1, 1)
    p = jnp.where(idx == 0, cur_frac, (1.0 - cur_frac) / others)
    p = jnp.where(valid, p, 0.0)
    return p / jnp.sum(p)


class _BookState(NamedTuple):
    """Per-iteration bookkeeping carried by both optimization loops:
    best-loss EMA, the every-5%-iters best-(params, adam) checkpoint, the
    prune/rollback flags and the post-prune early-stop counter (reference
    mapper.py:181-198)."""

    best_loss: jnp.ndarray
    ema: jnp.ndarray
    ckpt_opt: OptimizedParams
    ckpt_adam: optim.AdamState
    has_ckpt: jnp.ndarray
    early_cnt: jnp.ndarray
    stale_cnt: jnp.ndarray
    stopped: jnp.ndarray


def _book_step(book: _BookState, it, total, opt, adam, alive, *,
               pruning_thre, ckpt_every, early_thre, prune_iters, ema_beta,
               stale_best_cnt=0):
    """One bookkeeping step on POST-update (opt, adam): checkpoint every 5%
    iters, prune (+rollback-on-bad) at 30%/60%, early-stop counting after the
    last prune. Returns (book', opt', adam', alive')."""
    ema = jnp.where(it == 0, total, ema_beta * book.ema + (1 - ema_beta) * total)

    # Checkpoint best state every 5% iters (reference :192-198). The tree
    # copies are `lax.cond`s, NOT `jnp.where` selects: a scalar-pred where
    # over the (params + Adam moments) x2 trees materializes ~90 channels
    # of N rows EVERY iteration (~12 ms/iter at 262k on the v5e — measured,
    # PERF.md round 3), while a cond's identity branch aliases the carry
    # and the copy runs only on the iterations that actually checkpoint.
    is_ckpt_iter = (it % ckpt_every == 0) & (it != 0)
    improved = ema < book.best_loss
    take = is_ckpt_iter & improved
    ckpt_opt, ckpt_adam = jax.lax.cond(
        take,
        lambda _: (opt, adam),
        lambda _: (book.ckpt_opt, book.ckpt_adam),
        None,
    )
    best_loss = jnp.where(take, ema, book.best_loss)
    has_ckpt = book.has_ckpt | take

    # Prune (+ rollback to checkpoint when the prune-time loss is worse).
    is_prune = (it == prune_iters[0]) | (it == prune_iters[1])
    rollback = is_prune & has_ckpt & (best_loss < ema)
    opt, adam = jax.lax.cond(
        rollback,
        lambda _: (ckpt_opt, ckpt_adam),
        lambda _: (opt, adam),
        None,
    )
    alive = jax.lax.cond(
        is_prune,
        lambda a: a & ~(jax.nn.sigmoid(opt.opacity_logits[:, 0])
                        < pruning_thre),
        lambda a: a,
        alive,
    )
    best_loss = jnp.where(is_prune, jnp.inf, best_loss)
    has_ckpt = has_ckpt & ~is_prune

    # Early stop after the last prune (reference :181-190).
    after = it > prune_iters[1]
    bad = after & has_ckpt & (ema - best_loss > 0.15 * best_loss)
    early_cnt = jnp.where(bad, book.early_cnt + 1, 0)
    stopped = book.stopped | (early_cnt > early_thre)

    # Optional CONVERGENCE stop (beyond the reference, default off): the
    # reference's early stop is a divergence guard only — a flat converged
    # loss never exceeds 1.15x best, so every mapped frame burns the full
    # budget even when the render is no longer improving. With
    # `stale_best_cnt > 0`, count consecutive post-last-prune iterations
    # whose EMA fails to beat the checkpointed best and stop once the run
    # exceeds the count. Active only after the last prune so the
    # prune/rollback protocol (and its best_loss resets) is untouched.
    if stale_best_cnt > 0:
        # `improved` is vs the PRE-update best (the post-update best equals
        # the EMA on every checkpoint iteration by construction).
        stale = after & ~improved
        stale_cnt = jnp.where(stale, book.stale_cnt + 1, 0)
        stopped = stopped | (stale_cnt > stale_best_cnt)
    else:
        stale_cnt = book.stale_cnt

    new_book = _BookState(best_loss, ema, ckpt_opt, ckpt_adam, has_ckpt,
                          early_cnt, stale_cnt, stopped)
    return new_book, opt, adam, alive


def _permute_rows(trees, order):
    """Permute the leading axis of every leaf in `trees` (a tuple of pytrees
    whose leaves are all (N, ...)) by `order`, using ONE N-index gather for
    the float leaves.

    Gathers on this TPU cost per-INDEX (PERF.md), so one stacked gather
    beats a dozen per-leaf gathers ~12x; the stack is ATTR-MAJOR (CH, N) —
    the column-gather orientation measured ~3x cheaper than gathering
    (N, CH) rows (the transposes around it are plain bandwidth copies).

    Non-float leaves (alive mask, index vectors) are permuted with plain
    per-leaf takes: routing int32 indices through the f32 stack would
    silently corrupt values above 2^24 (advisor r2 medium)."""
    leaves, treedef = jax.tree_util.tree_flatten(trees)
    n = leaves[0].shape[0]
    is_f = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]
    cols = [jnp.transpose(l.reshape(n, -1)).astype(jnp.float32)
            for l, f in zip(leaves, is_f) if f]
    widths = [c.shape[0] for c in cols]
    big = jnp.concatenate(cols, axis=0)[:, order]
    outs = []
    off = 0
    wi = iter(widths)
    for l, f in zip(leaves, is_f):
        if f:
            w = next(wi)
            outs.append(
                jnp.transpose(big[off:off + w]).reshape(l.shape).astype(l.dtype)
            )
            off += w
        else:
            outs.append(l[order])
    return jax.tree_util.tree_unflatten(treedef, outs)


def _optimize_resident(state, frozen, kfs, key, iterations, cam, rcfg, mcfg,
                       p_kf, lr_tree, book_step, opt0, book0, losses0):
    """Keyframe-blocked resident-sorted optimization (PERF.md roadmap #4).

    Samples a keyframe once per `mcfg.kf_block` iterations; at each block
    boundary the trainable params, Adam moments, checkpoint trees, colors and
    alive mask are physically permuted into that keyframe's (center_tile,
    depth) order (one stacked N-index gather), after which every iteration
    in the block renders via `render_sorted_resident` with ZERO per-iteration
    gather/scatter — kernel gradients arrive already in the resident order.

    Deviations from the reference schedule (src/entities/mapper.py:143-214),
    both documented in PERF.md: (a) the keyframe is re-sampled every
    kf_block-th iteration instead of every iteration (same marginal
    distribution, block-correlated draws); (b) early stop exits at block
    granularity. Segment membership is frozen within a block (drift-clipping
    semantics of ops.rasterizer.render_sorted_resident).
    """
    from ..ops.rasterizer import (render_sorted_resident,
                                  render_sorted_resident_tiles, sorted_layout)

    r_block = int(mcfg.kf_block)
    n = state.alive.shape[0]
    tiles_x = -(-cam.width // rcfg.tile)
    tiles_y = -(-cam.height // rcfg.tile)
    num_tiles = tiles_x * tiles_y
    use_freeze = mcfg.freeze_frac > 0 and r_block > 1
    k_act = max(1, int(round(num_tiles * mcfg.freeze_frac)))
    freeze_start = max(1, int(mcfg.freeze_after * iterations))

    def loss_fn(opt: OptimizedParams, f_dc, alive, kidx, seg_start, seg_cnt):
        gt_color = kfs.color[kidx]
        gt_depth = kfs.depth[kidx]
        w2c = kfs.w2c[kidx]
        exp_a, exp_b = kfs.exposure[kidx, 0], kfs.exposure[kidx, 1]
        out = render_sorted_resident(
            opt.xyz, opt.quats, opt.log_scales, opt.opacity_logits,
            sh_to_rgb(f_dc), w2c, seg_start, seg_cnt, cam, rcfg, alive=alive,
        )
        image = jnp.clip(out.color * jnp.exp(exp_a) + exp_b, 0.0, 1.0)
        mask = (gt_depth > 0) & ~jnp.isnan(out.depth)
        color_l1 = masked_l1(image, gt_color, mask.astype(image.dtype))
        color_loss = (1.0 - mcfg.lambda_dssim) * color_l1 + mcfg.lambda_dssim * (
            1.0 - ssim(image, gt_color)
        )
        depth_loss = masked_l1(out.depth, gt_depth, mask.astype(image.dtype))
        reg = isotropic_loss(opt.log_scales, alive)
        total = color_loss + depth_loss + reg
        # Per-tile masked residual map for the freeze-phase tile ranking
        # (DCE'd by XLA when unused).
        err = (jnp.abs(image - gt_color).mean(-1)
               + jnp.abs(jnp.nan_to_num(out.depth) - gt_depth)
               ) * mask.astype(image.dtype)
        from ..ops.rasterizer import tile_sums
        res_tiles = tile_sums(err, rcfg.tile, tiles_x, tiles_y)
        return total, (color_loss, depth_loss,
                       jax.lax.stop_gradient(res_tiles))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def loss_fn_sub(opt: OptimizedParams, f_dc, alive, kidx, seg_start,
                    seg_cnt, tile_sel):
        gt_c = gt_tiles(kfs.color[kidx], tile_sel, rcfg.tile, tiles_x,
                        tiles_y)
        gt_d = gt_tiles(kfs.depth[kidx], tile_sel, rcfg.tile, tiles_x,
                        tiles_y)
        exp_a, exp_b = kfs.exposure[kidx, 0], kfs.exposure[kidx, 1]
        out = render_sorted_resident_tiles(
            opt.xyz, opt.quats, opt.log_scales, opt.opacity_logits,
            sh_to_rgb(f_dc), kfs.w2c[kidx], seg_start, seg_cnt, tile_sel,
            cam, rcfg, alive=alive,
        )
        image = jnp.clip(out.color * jnp.exp(exp_a) + exp_b, 0.0, 1.0)
        mask = (gt_d > 0) & ~jnp.isnan(out.depth)
        color_l1 = masked_l1(image, gt_c, mask.astype(image.dtype))
        # SSIM windowed within each tile (same border bias every iteration;
        # see the tile-subset loss in _optimize_core).
        ssim_t = jnp.mean(jax.vmap(ssim)(image, gt_c))
        color_loss = (
            (1.0 - mcfg.lambda_dssim) * color_l1
            + mcfg.lambda_dssim * (1.0 - ssim_t)
        )
        depth_loss = masked_l1(out.depth, gt_d, mask.astype(image.dtype))
        reg = isotropic_loss(opt.log_scales, alive)
        return color_loss + depth_loss + reg, (color_loss, depth_loss)

    grad_fn_sub = jax.value_and_grad(loss_fn_sub, has_aux=True)

    class RCarry(NamedTuple):
        it: jnp.ndarray
        perm: jnp.ndarray       # (N,) canonical index of each current row
        opt: OptimizedParams
        adam: optim.AdamState
        f_dc: jnp.ndarray
        alive: jnp.ndarray
        book: _BookState
        key: jax.Array
        losses: jnp.ndarray

    def block(c: RCarry):
        key, k_sel = jax.random.split(c.key)
        it0 = c.it
        kidx = jnp.where(
            it0 < 5, 0, jax.random.categorical(k_sel, jnp.log(p_kf + 1e-12))
        ).astype(jnp.int32)
        w2c = kfs.w2c[kidx]

        # Re-sort the CURRENT layout for this keyframe and permute all
        # per-row state into it (adam.step / ckpt_adam.step are scalars and
        # stay outside the permute).
        order, seg_start, seg_cnt = sorted_layout(
            c.opt.xyz, c.opt.quats, c.opt.log_scales, c.opt.opacity_logits,
            w2c, cam, rcfg, alive=c.alive,
        )
        (opt, mu, nu, vmax, ck_opt, ck_mu, ck_nu, ck_vmax, f_dc, alive,
         perm) = _permute_rows(
            (c.opt, c.adam.mu, c.adam.nu, c.adam.vmax, c.book.ckpt_opt,
             c.book.ckpt_adam.mu, c.book.ckpt_adam.nu, c.book.ckpt_adam.vmax,
             c.f_dc, c.alive, c.perm),
            order,
        )
        adam = optim.AdamState(c.adam.step, mu, nu, vmax)
        book = c.book._replace(
            ckpt_opt=ck_opt,
            ckpt_adam=optim.AdamState(c.book.ckpt_adam.step, ck_mu, ck_nu,
                                      ck_vmax),
        )

        def full_step(it, opt, adam, alive, book, losses):
            (total, (cl, dl, res)), grads = grad_fn(opt, f_dc, alive, kidx,
                                                    seg_start, seg_cnt)
            gmask = alive.astype(jnp.float32)
            grads = jax.tree.map(
                lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)),
                grads,
            )
            new_opt, new_adam = optim.adam_update(adam, opt, grads, lr_tree)
            book, opt, adam, alive = book_step(book, it, total, new_opt,
                                               new_adam, alive)
            losses = losses.at[it].set(jnp.stack([total, cl, dl]))
            return (it + 1, opt, adam, alive, book, losses), res

        def iter_body(ic):
            out, _ = full_step(*ic)
            return out

        # Blocks never straddle the 5-iteration pin boundary: any block
        # starting below it=5 ends exactly at 5, so the current frame is
        # pinned for PRECISELY the reference's 5 iterations
        # (mapper.py:146-150) at every kf_block setting (advisor r2 /
        # VERDICT r3 weak #5 — including kf_block < 5, where a later block
        # could previously re-pin past iteration 5). The inner loop is a
        # while_loop so early stop exits mid-block.
        n_it = jnp.minimum(r_block, iterations - it0)
        n_it = jnp.where(it0 < 5, jnp.minimum(n_it, 5 - it0), n_it)
        end = it0 + n_it
        carry0 = (it0, opt, adam, alive, book, c.losses)

        def full_tail(carry_in):
            return jax.lax.while_loop(
                lambda ic: (ic[0] < end) & ~ic[4].stopped, iter_body,
                carry_in,
            )

        if use_freeze:
            def subset_tail(carry_in):
                # One full iteration: bookkeeping tick + tile ranking; then
                # the rest of the block on the top-k_act residual tiles.
                # Frozen tiles carry ~zero gradient, so skipping them leaves
                # the update stream unchanged while kernel work scales with
                # k_act/num_tiles. The bookkeeping EMA is fed only by full
                # iterations (subset losses are high-residual-biased);
                # prune/ckpt stay keyed on the iteration index.
                carry_f, res = full_step(*carry_in)
                _, tile_sel = jax.lax.top_k(res, k_act)
                tile_sel = tile_sel.astype(jnp.int32)

                def sub_body(ic):
                    it, opt, adam, alive, book, losses = ic
                    (total, (cl, dl)), grads = grad_fn_sub(
                        opt, f_dc, alive, kidx, seg_start, seg_cnt, tile_sel
                    )
                    gmask = alive.astype(jnp.float32)
                    grads = jax.tree.map(
                        lambda g: g * gmask.reshape(
                            (-1,) + (1,) * (g.ndim - 1)),
                        grads,
                    )
                    new_opt, new_adam = optim.adam_update(adam, opt, grads,
                                                          lr_tree)
                    book, opt, adam, alive = book_step(book, it, book.ema,
                                                       new_opt, new_adam,
                                                       alive)
                    losses = losses.at[it].set(jnp.stack([total, cl, dl]))
                    return (it + 1, opt, adam, alive, book, losses)

                return jax.lax.while_loop(
                    lambda ic: (ic[0] < end) & ~ic[4].stopped, sub_body,
                    carry_f,
                )

            it, opt, adam, alive, book, losses = jax.lax.cond(
                it0 >= freeze_start, subset_tail, full_tail, carry0
            )
        else:
            it, opt, adam, alive, book, losses = full_tail(carry0)
        return RCarry(it, perm, opt, adam, f_dc, alive, book, key, losses)

    init = RCarry(
        it=jnp.zeros((), jnp.int32),
        perm=jnp.arange(n, dtype=jnp.int32),
        opt=opt0,
        adam=state.adam,
        f_dc=frozen.f_dc,
        alive=state.alive,
        book=book0,
        key=key,
        losses=losses0,
    )
    final = jax.lax.while_loop(
        lambda c: (c.it < iterations) & ~c.book.stopped, block, init
    )

    # Un-permute back to canonical order: inverse permutation via one sort
    # (scatters are the expensive orientation on this TPU), then one stacked
    # gather.
    _, inv = jax.lax.sort(
        (final.perm, jnp.arange(n, dtype=jnp.int32)), dimension=0, num_keys=1
    )
    (opt, mu, nu, vmax, ck_opt, ck_mu, ck_nu, ck_vmax, alive) = _permute_rows(
        (final.opt, final.adam.mu, final.adam.nu, final.adam.vmax,
         final.book.ckpt_opt, final.book.ckpt_adam.mu,
         final.book.ckpt_adam.nu, final.book.ckpt_adam.vmax, final.alive),
        inv,
    )
    adam = optim.AdamState(final.adam.step, mu, nu, vmax)
    book = final.book._replace(
        ckpt_opt=ck_opt,
        ckpt_adam=optim.AdamState(final.book.ckpt_adam.step, ck_mu, ck_nu,
                                  ck_vmax),
    )
    return opt, adam, alive, book, final.it, final.losses


def _optimize_core(
    state: GaussianState,
    kfs: KeyframeBatch,
    n_kf,
    key,
    iterations: int,
    cam: Camera,
    rcfg: RasterConfig,
    mcfg: MapperConfig,
    mesh=None,
) -> Tuple[GaussianState, dict]:
    """Submap optimization body. Keyframe 0 is the current frame.

    Per iteration (reference mapper.py:143-214): sample keyframe (first 5
    iters pinned to the current frame), render, loss = (1-lambda) L1_masked +
    lambda (1-SSIM) + L1_depth_masked + isotropic reg, Adam step. Every 5%
    iters snapshot best-(params, adam); at 30%/60% iters roll back if the
    current loss is worse than the snapshot, then prune opacity < thre.
    After the last prune an early-stop counter exits once the loss exceeds
    1.15x the best for >5% consecutive iters. Final prune < 0.01.

    With `mesh` (jax.sharding.Mesh, data axis = devices), each iteration
    samples one keyframe PER DEVICE from the same distribution; per-device
    render+grad runs under shard_map and gradients/losses pmean over ICI —
    the data-parallel generalization of the reference's one-keyframe loop
    (SURVEY.md §2.4 P4: the TPU equivalent of the dual-GPU layout).
    """
    frozen = state.params
    ckpt_every = max(int(0.05 * iterations), 1)
    early_thre = max(int(0.05 * iterations), 1)
    prune_iters = (int(0.3 * iterations), int(0.6 * iterations))
    p_kf = _keyframe_distribution(n_kf, mcfg.max_keyframes,
                                  mcfg.current_view_opt_iterations)
    lr_tree = OptimizedParams(
        xyz=mcfg.lr_xyz, log_scales=mcfg.lr_scaling,
        quats=mcfg.lr_rotation, opacity_logits=mcfg.lr_opacity,
    )

    import jax as _jax

    backend = rcfg.backend
    if backend == "auto":
        backend = "sorted" if _jax.default_backend() == "tpu" else "jnp"
    use_subset = mcfg.tile_subset > 0 and backend == "sorted"
    tiles_x = -(-cam.width // rcfg.tile)
    tiles_y = -(-cam.height // rcfg.tile)
    num_tiles = tiles_x * tiles_y
    n_sub = min(mcfg.tile_subset, num_tiles)

    if use_subset:
        def loss_fn(opt: OptimizedParams, alive, kidx, tile_ids):
            params = _merge(frozen, opt)
            gt_c = gt_tiles(kfs.color[kidx], tile_ids, rcfg.tile, tiles_x,
                            tiles_y)
            gt_d = gt_tiles(kfs.depth[kidx], tile_ids, rcfg.tile, tiles_x,
                            tiles_y)
            exp_a, exp_b = kfs.exposure[kidx, 0], kfs.exposure[kidx, 1]
            out = render_tiles(params.xyz, params.quats, params.log_scales,
                               params.opacity_logits, sh_to_rgb(params.f_dc),
                               kfs.w2c[kidx], tile_ids, cam, rcfg,
                               alive=alive)
            image = jnp.clip(out.color * jnp.exp(exp_a) + exp_b, 0.0, 1.0)
            mask = (gt_d > 0) & ~jnp.isnan(out.depth)
            color_l1 = masked_l1(image, gt_c, mask.astype(image.dtype))
            # SSIM per tile (windowed within each tile; border bias is the
            # same every iteration so the stochastic objective stays
            # aligned with the full-image one).
            ssim_t = jnp.mean(jax.vmap(ssim)(image, gt_c))
            color_loss = (
                (1.0 - mcfg.lambda_dssim) * color_l1
                + mcfg.lambda_dssim * (1.0 - ssim_t)
            )
            depth_loss = masked_l1(out.depth, gt_d, mask.astype(image.dtype))
            reg = isotropic_loss(params.log_scales, alive)
            total = color_loss + depth_loss + reg
            return total, (color_loss, depth_loss)
    else:
        def loss_fn(opt: OptimizedParams, alive, kidx, tile_ids):
            del tile_ids
            params = _merge(frozen, opt)
            gt_color = kfs.color[kidx]
            gt_depth = kfs.depth[kidx]
            w2c = kfs.w2c[kidx]
            exp_a, exp_b = kfs.exposure[kidx, 0], kfs.exposure[kidx, 1]
            out = render(params.xyz, params.quats, params.log_scales,
                         params.opacity_logits, sh_to_rgb(params.f_dc),
                         w2c, cam, rcfg, alive=alive)
            image = jnp.clip(out.color * jnp.exp(exp_a) + exp_b, 0.0, 1.0)
            mask = (gt_depth > 0) & ~jnp.isnan(out.depth)
            color_l1 = masked_l1(image, gt_color, mask.astype(image.dtype))
            color_loss = (1.0 - mcfg.lambda_dssim) * color_l1 + mcfg.lambda_dssim * (
                1.0 - ssim(image, gt_color)
            )
            depth_loss = masked_l1(out.depth, gt_depth, mask.astype(image.dtype))
            reg = isotropic_loss(params.log_scales, alive)
            total = color_loss + depth_loss + reg
            return total, (color_loss, depth_loss)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    n_dev = 1
    if mesh is not None and mesh.devices.size > 1:
        n_dev = int(mesh.devices.size)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]

        def _one_dev(opt, alive, color, depth, w2c, exp):
            # Per-device single-keyframe loss (leading shard axis size 1).
            def lf(opt):
                params = _merge(frozen, opt)
                out = render(params.xyz, params.quats, params.log_scales,
                             params.opacity_logits, sh_to_rgb(params.f_dc),
                             w2c[0], cam, rcfg, alive=alive)
                image = jnp.clip(
                    out.color * jnp.exp(exp[0, 0]) + exp[0, 1], 0.0, 1.0
                )
                mask = (depth[0] > 0) & ~jnp.isnan(out.depth)
                cl1 = masked_l1(image, color[0], mask.astype(image.dtype))
                cl = (1.0 - mcfg.lambda_dssim) * cl1 + mcfg.lambda_dssim * (
                    1.0 - ssim(image, color[0])
                )
                dl = masked_l1(out.depth, depth[0], mask.astype(image.dtype))
                reg = isotropic_loss(params.log_scales, alive)
                return cl + dl + reg, (cl, dl)

            (total, (cl, dl)), grads = jax.value_and_grad(lf, has_aux=True)(opt)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
            return (jax.lax.pmean(total, axis),
                    (jax.lax.pmean(cl, axis), jax.lax.pmean(dl, axis))), grads

        _dp_grad = shard_map(
            _one_dev, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=((P(), (P(), P())), P()),
            check_rep=False,
        )

        def grad_fn_dp(opt, alive, kidxs):
            return _dp_grad(opt, alive, kfs.color[kidxs], kfs.depth[kidxs],
                            kfs.w2c[kidxs], kfs.exposure[kidxs])

    # Under tile-subset SGD the per-iteration loss is a noisy estimate:
    # checkpoint/rollback/early-stop decisions compare an EMA instead of the
    # raw draw (otherwise a lucky low draw becomes an unbeatable best_loss
    # and the noise trips the 15% early-stop band constantly).
    ema_beta = 0.8 if use_subset else 0.0

    def book_step(book: _BookState, it, total, opt, adam, alive):
        """Shared per-iteration bookkeeping (see _BookState)."""
        return _book_step(book, it, total, opt, adam, alive,
                          pruning_thre=mcfg.pruning_thre,
                          ckpt_every=ckpt_every, early_thre=early_thre,
                          prune_iters=prune_iters, ema_beta=ema_beta,
                          stale_best_cnt=mcfg.stale_best_cnt)

    resident = (backend == "sorted" and mesh is None and not use_subset
                and mcfg.kf_block > 0)
    opt0 = _split(state.params)
    book0 = _BookState(
        best_loss=jnp.array(jnp.inf),
        ema=jnp.array(jnp.inf),
        ckpt_opt=opt0,
        # Moments persist across map() calls within a submap (the reference
        # keeps one torch optimizer per submap; new rows were zeroed by
        # `insert`).
        ckpt_adam=state.adam,
        has_ckpt=jnp.array(False),
        early_cnt=jnp.zeros((), jnp.int32),
        stale_cnt=jnp.zeros((), jnp.int32),
        stopped=jnp.array(False),
    )
    losses0 = jnp.zeros((iterations, 3))

    if resident:
        final_opt, final_adam, final_alive, final_book, final_it, losses = (
            _optimize_resident(
                state, frozen, kfs, key, iterations, cam, rcfg, mcfg,
                p_kf, lr_tree, book_step, opt0, book0, losses0,
            )
        )
    else:
        class Carry(NamedTuple):
            it: jnp.ndarray
            opt: OptimizedParams
            adam: optim.AdamState
            alive: jnp.ndarray
            book: _BookState
            key: jax.Array
            losses: jnp.ndarray

        def step(c: Carry):
            key, k_sel, k_tiles = jax.random.split(c.key, 3)
            it = c.it
            kidx = jnp.where(
                it < 5, 0, jax.random.categorical(k_sel, jnp.log(p_kf + 1e-12))
            ).astype(jnp.int32)
            if use_subset:
                tile_ids = jax.random.permutation(k_tiles, num_tiles)[:n_sub]
                tile_ids = tile_ids.astype(jnp.int32)
            else:
                tile_ids = None
            if n_dev > 1:
                kidxs = jnp.where(
                    it < 5,
                    jnp.zeros((n_dev,), jnp.int32),
                    jax.random.categorical(
                        k_sel, jnp.log(p_kf + 1e-12), shape=(n_dev,)
                    ).astype(jnp.int32),
                )
                (total, (cl, dl)), grads = grad_fn_dp(c.opt, c.alive, kidxs)
            else:
                (total, (cl, dl)), grads = grad_fn(c.opt, c.alive, kidx, tile_ids)
            gmask = c.alive.astype(jnp.float32)
            grads = jax.tree.map(
                lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)), grads
            )
            new_opt, new_adam = optim.adam_update(c.adam, c.opt, grads, lr_tree)
            book, opt, adam, alive = book_step(
                c.book, it, total, new_opt, new_adam, c.alive
            )
            losses = c.losses.at[it].set(jnp.stack([total, cl, dl]))
            return Carry(it + 1, opt, adam, alive, book, key, losses)

        init = Carry(
            it=jnp.zeros((), jnp.int32),
            opt=opt0,
            adam=state.adam,
            alive=state.alive,
            book=book0,
            key=key,
            # Unvisited slots keep the last visited loss (forward-filled below).
            losses=losses0,
        )
        # A while_loop EXITS on early stop (the reference breaks; the previous
        # scan kept rendering with frozen params, paying full iteration cost).
        final = jax.lax.while_loop(
            lambda c: (c.it < iterations) & ~c.book.stopped,
            step,
            init,
        )
        final_opt, final_adam, final_alive = final.opt, final.adam, final.alive
        final_book, final_it, losses = final.book, final.it, final.losses

    # Forward-fill the tail of the loss log with the last real entry.
    last = losses[jnp.maximum(final_it - 1, 0)]
    it_idx = jnp.arange(iterations)[:, None]
    losses = jnp.where(it_idx < final_it, losses, last[None, :])

    # Final rollback + prune < 0.01 (reference :216-223).
    roll = final_book.has_ckpt & (final_book.best_loss < final_book.ema)
    opt = jax.tree.map(
        lambda ck, o: jnp.where(roll, ck, o), final_book.ckpt_opt, final_opt
    )
    adam = jax.tree.map(
        lambda ck, a: jnp.where(roll, ck, a), final_book.ckpt_adam, final_adam
    )
    alive = final_alive & (jax.nn.sigmoid(opt.opacity_logits[:, 0]) >= 0.01)
    new_state = GaussianState(
        params=_merge(frozen, opt), alive=alive, adam=adam
    )
    return new_state, {"losses": losses}


@functools.partial(
    jax.jit, static_argnames=("iterations", "cam", "rcfg", "mcfg", "mesh"))
def optimize_submap(
    state: GaussianState,
    kfs: KeyframeBatch,
    n_kf,
    key,
    iterations: int,
    cam: Camera,
    rcfg: RasterConfig,
    mcfg: MapperConfig,
    mesh=None,
) -> Tuple[GaussianState, dict]:
    """Jitted submap optimization (see `_optimize_core`)."""
    return _optimize_core(state, kfs, n_kf, key, iterations, cam, rcfg, mcfg,
                          mesh)


@functools.partial(jax.jit, static_argnames=("cam",))
def warm_visible(params: GaussianParams, alive, w2c, cam: Camera,
                 min_opacity: float = 0.05, margin_frac: float = 0.05):
    """Mask of alive gaussians visible in the frame at `w2c`, for the
    warm-start submap init (MapperConfig.init_warm_start).

    The live state is WORLD-frame (submaps re-anchor only at save time,
    slam/submap.py), so warm-starting a new submap is `insert(empty, params,
    warm_visible(...))` — a masked copy, no coordinate transform. Selection:
    in front of the camera, inside the image with a `margin_frac` border
    (gaussians straddling the edge still contribute), and effective opacity
    above `min_opacity` (near-dead gaussians would be re-pruned anyway).

    Replaces the reference's per-submap fresh re-seed
    (mapper.py:317-334) when the flag is on; its errors relative to the
    pose chain are exactly the live state's own (LC corrections rewrite
    poses, not live geometry — optimization re-fits, same as after any
    mid-submap correction drain)."""
    xyz_cam = params.xyz @ w2c[:3, :3].T + w2c[:3, 3]
    z = xyz_cam[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = cam.fx * xyz_cam[:, 0] / zs + cam.cx
    v = cam.fy * xyz_cam[:, 1] / zs + cam.cy
    mx = margin_frac * cam.width
    my = margin_frac * cam.height
    op = jax.nn.sigmoid(params.opacity_logits[:, 0])
    vis = (
        alive
        & (z > 1e-2)
        & (u >= -mx) & (u <= cam.width - 1 + mx)
        & (v >= -my) & (v <= cam.height - 1 + my)
        & (op >= min_opacity)
    )
    return vis, jnp.sum(vis.astype(jnp.int32))


@jax.jit
def halfres_single_kf(color, depth, w2c, exposure) -> KeyframeBatch:
    """One-keyframe batch at half resolution for the submap-init phase.

    Color: 2x2 mean; depth: hole-aware 2x2 (ops.image.depth_pyr_down —
    mean of valid entries, 0 when the block is all-holes). The w2c pose is
    resolution-independent; intrinsics come from Camera.scaled(1)."""
    from ..ops.image import depth_pyr_down

    h2, w2 = color.shape[0] // 2, color.shape[1] // 2
    c = color[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, 3)
    color_half = jnp.mean(c, axis=(1, 3))
    depth_half = depth_pyr_down(depth)[:h2, :w2]
    return KeyframeBatch(
        color=color_half[None],
        depth=depth_half[None],
        w2c=w2c[None],
        exposure=exposure[None],
        valid=jnp.ones((1,), bool),
    )


@functools.partial(
    jax.jit, static_argnames=("iterations", "cam", "rcfg", "mcfg", "mesh"))
def optimize_and_describe(
    state: GaussianState,
    kfs: KeyframeBatch,
    n_kf,
    key,
    iterations: int,
    cam: Camera,
    rcfg: RasterConfig,
    mcfg: MapperConfig,
    mesh=None,
):
    """`optimize_submap` + the slot-0 place-recognition descriptor + alive
    count in one dispatch — the full-res tail of a half-res submap init
    (the descriptor must come from the FULL-res boundary frame so LC
    detection is resolution-independent)."""
    from ..core.gaussians import num_alive
    from ..lc.descriptor import global_descriptor

    new_state, aux = _optimize_core(state, kfs, n_kf, key, iterations, cam,
                                    rcfg, mcfg, mesh)
    desc = global_descriptor(kfs.color[0])
    return new_state, aux["losses"], num_alive(new_state), desc


@functools.partial(
    jax.jit, static_argnames=("iterations", "cam", "rcfg", "mcfg", "mesh"))
def insert_and_optimize(
    state: GaussianState,
    rows: GaussianParams,
    valid,
    kfs: KeyframeBatch,
    n_kf,
    key,
    iterations: int,
    cam: Camera,
    rcfg: RasterConfig,
    mcfg: MapperConfig,
    mesh=None,
):
    """Insert `seed_rows` output into the submap, then optimize — the second
    (and last) device dispatch of a mapped frame. Returns
    (state, n_added, losses, n_alive, desc); the caller fetches the scalars
    in one round trip (reference map flow: mapper.py:262-399).

    `desc` is the current keyframe's global place-recognition descriptor
    (lc.descriptor.global_descriptor on the already-uploaded frame in slot
    0) — cached into the submap file so loop closure never re-decodes
    keyframes just to recompute descriptors (VERDICT r2 weak #7)."""
    from ..core.gaussians import num_alive
    from ..lc.descriptor import global_descriptor

    state, n_added = insert(state, rows, valid)
    new_state, aux = _optimize_core(state, kfs, n_kf, key, iterations, cam,
                                    rcfg, mcfg, mesh)
    desc = global_descriptor(kfs.color[0])
    return new_state, n_added, aux["losses"], num_alive(new_state), desc
