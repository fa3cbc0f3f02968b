"""Device-mesh parallelism: data-parallel map optimization over ICI.

The reference's cross-device story is thread+dual-GPU (SURVEY.md §2.4): the
pipeline on GPU 0 and loop closure on GPU 1, communicating through submap
files on disk. The TPU-native equivalent is a single `jax.sharding.Mesh`:

  - **data-parallel mapping** (`dp_map_step`): the submap's keyframes are
    sharded over the `data` axis; every device renders + differentiates its
    own keyframe against the replicated gaussian state and gradients are
    `psum`-averaged over ICI — the multi-view generalization of the
    reference's one-keyframe-per-iteration loop (mapper.py:143-170). With
    K devices one optimization step consumes K views, so wall-clock for the
    dominant hot loop divides by the mesh size;
  - **spatially-parallel mapping** (`sp_map_step`): ONE view's tile grid is
    sharded over the mesh — every device composites its tile slice against
    the replicated map, masked-loss sums `psum` over ICI and the exact
    global gradient is the `pmean` of the per-device contributions. This
    keeps the reference's one-view-per-step protocol while dividing the
    per-iteration wall-clock by the mesh size;
  - **mesh-sliced loop closure** (`lc_submesh`): LC registration work is
    dispatched onto a device subset, replacing `lc.device: 1`
    (configs/Replica/replica.yaml:59) — see eags_slam_tpu.lc.

Single-chip runs degrade gracefully: mesh of 1, shard_map becomes identity.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.camera import Camera
from ..core.sh import sh_to_rgb
from ..ops.losses import isotropic_loss, masked_l1, ssim
from ..ops.rasterizer import (RasterConfig, gt_tiles, render, render_tiles)
from ..slam.mapper import MapperConfig, OptimizedParams, _merge, _split
from ..utils import optim


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def make_mesh2d(n_data: int, n_space: int,
                axes=("data", "space")) -> Mesh:
    """2D (data x space) mesh for `dpsp_map_step`."""
    import numpy as np

    devs = np.array(jax.devices()[: n_data * n_space]).reshape(
        n_data, n_space)
    return Mesh(devs, axes)


def dp_map_step(mesh: Mesh, cam: Camera, rcfg: RasterConfig, mcfg: MapperConfig):
    """Build a jitted data-parallel mapping train step over `mesh`.

    Returned step: (opt_params, adam, alive, frozen, colors_batch...) where
    keyframe arrays carry a leading device axis sharded over `data`.
    """
    axis = mesh.axis_names[0]
    lr_tree = OptimizedParams(
        xyz=mcfg.lr_xyz, log_scales=mcfg.lr_scaling,
        quats=mcfg.lr_rotation, opacity_logits=mcfg.lr_opacity,
    )

    def local_loss(opt: OptimizedParams, frozen, alive, color, depth, w2c):
        params = _merge(frozen, opt)
        out = render(params.xyz, params.quats, params.log_scales,
                     params.opacity_logits, sh_to_rgb(params.f_dc), w2c, cam,
                     rcfg, alive=alive)
        mask = (depth > 0) & ~jnp.isnan(out.depth)
        m3 = mask.astype(out.color.dtype)
        color_l1 = masked_l1(out.color, color, m3)
        closs = (1 - mcfg.lambda_dssim) * color_l1 + mcfg.lambda_dssim * (
            1.0 - ssim(out.color, color)
        )
        dloss = masked_l1(out.depth, depth, mask.astype(out.color.dtype))
        reg = isotropic_loss(params.log_scales, alive)
        return closs + dloss + reg

    def sharded_step(opt, adam, alive, frozen, colors, depths, w2cs):
        # Each device holds ONE keyframe (leading axis sharded to size 1).
        loss, grads = jax.value_and_grad(local_loss)(
            opt, frozen, alive, colors[0], depths[0], w2cs[0]
        )
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        loss = jax.lax.pmean(loss, axis)
        gmask = alive.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)), grads
        )
        new_opt, new_adam = optim.adam_update(adam, opt, grads, lr_tree)
        return new_opt, new_adam, loss

    step = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def train_step(state, adam, kf_colors, kf_depths, kf_w2cs):
        opt = _split(state.params)
        new_opt, new_adam, loss = step(
            opt, adam, state.alive, state.params, kf_colors, kf_depths, kf_w2cs
        )
        return state._replace(params=_merge(state.params, new_opt)), new_adam, loss

    def init_adam(state):
        return optim.adam_init(_split(state.params))

    return train_step, init_adam


def sp_map_step(mesh: Mesh, cam: Camera, rcfg: RasterConfig,
                mcfg: MapperConfig):
    """Spatially-parallel (sp) mapping train step: ONE view's tile grid is
    sharded over the mesh.

    Complements `dp_map_step`: dp scales across KEYFRAMES (more views per
    optimization step), sp scales WITHIN a single view — the reference
    protocol's one-keyframe-per-iteration hot loop (mapper.py:143-170)
    runs at ~1/D wall-clock per step on a v5e-8. Every device composites
    its slice of the tile grid against the replicated gaussian state
    (`render_tiles`), the masked-loss numerators/denominators `psum` over
    ICI so each device sees the exact GLOBAL loss, and the backward pass
    produces each device's local-tile gradient contribution; their `psum`
    is the exact full-image gradient (the tile slices partition the image).

    Loss semantics match the tile-subset mapping loss: masked L1
    color+depth plus per-tile windowed SSIM (window support clipped at
    tile borders — the same documented deviation from the reference's
    full-image window as `MapperConfig.tile_subset`/freeze paths).

    Returns (train_step, init_adam, aux) where train_step(state, adam,
    color, depth, w2c) -> (state', adam', loss) takes ONE replicated view.
    """
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    ts = rcfg.tile
    tiles_x = -(-cam.width // ts)
    tiles_y = -(-cam.height // ts)
    n_tiles = tiles_x * tiles_y
    s_pad = -(-n_tiles // n_dev) * n_dev
    tile_ids_all = jnp.concatenate([
        jnp.arange(n_tiles, dtype=jnp.int32),
        jnp.zeros((s_pad - n_tiles,), jnp.int32),   # weight-0 pad tiles
    ])
    tmask_all = (jnp.arange(s_pad) < n_tiles).astype(jnp.float32)

    lr_tree = OptimizedParams(
        xyz=mcfg.lr_xyz, log_scales=mcfg.lr_scaling,
        quats=mcfg.lr_rotation, opacity_logits=mcfg.lr_opacity,
    )

    def _in_image(tile_ids):
        tx0 = (tile_ids % tiles_x) * ts
        ty0 = (tile_ids // tiles_x) * ts
        uu = tx0[:, None, None] + jnp.arange(ts, dtype=jnp.int32)[None, None]
        vv = ty0[:, None, None] + jnp.arange(ts, dtype=jnp.int32)[..., None]
        return (uu < cam.width) & (vv < cam.height)

    def local_loss(opt, frozen, alive, color, depth, w2c, tile_ids, tmask):
        params = _merge(frozen, opt)
        out = render_tiles(params.xyz, params.quats, params.log_scales,
                           params.opacity_logits, sh_to_rgb(params.f_dc),
                           w2c, tile_ids, cam, rcfg, alive=alive)
        gt_c = gt_tiles(color, tile_ids, ts, tiles_x, tiles_y)
        gt_d = gt_tiles(depth, tile_ids, ts, tiles_x, tiles_y)
        valid = _in_image(tile_ids) & (tmask[:, None, None] > 0)
        mask = (gt_d > 0) & ~jnp.isnan(out.depth) & valid
        m = mask.astype(jnp.float32)

        dc = jnp.abs(out.color - gt_c) * m[..., None]
        cnum = jax.lax.psum(jnp.sum(dc), axis)
        cden = jax.lax.psum(jnp.sum(m), axis) * 3.0
        color_l1 = cnum / jnp.maximum(cden, 1.0)

        dd = jnp.abs(out.depth - gt_d) * m
        dnum = jax.lax.psum(jnp.sum(dd), axis)
        depth_l1 = dnum / jnp.maximum(jax.lax.psum(jnp.sum(m), axis), 1.0)

        ssim_t = jax.vmap(ssim)(jnp.clip(out.color, 0.0, 1.0), gt_c)
        snum = jax.lax.psum(jnp.sum(ssim_t * tmask), axis)
        sden = jax.lax.psum(jnp.sum(tmask), axis)
        ssim_mean = snum / jnp.maximum(sden, 1.0)

        closs = (1.0 - mcfg.lambda_dssim) * color_l1 + mcfg.lambda_dssim * (
            1.0 - ssim_mean
        )
        # Replicated reg scaled 1/D: its psum'd gradient is exact.
        reg = jax.lax.psum(
            isotropic_loss(params.log_scales, alive) / n_dev, axis
        )
        return closs + depth_l1 + reg

    def sharded_step(opt, adam, alive, frozen, color, depth, w2c,
                     tile_ids, tmask):
        loss, grads = jax.value_and_grad(local_loss)(
            opt, frozen, alive, color, depth, w2c, tile_ids, tmask
        )
        # shard_map's psum TRANSPOSE is psum (cotangent 1 -> D per device),
        # so each device's grad is D x its partition share — pmean, not
        # psum, reconstructs the exact global gradient (verified against a
        # single-device evaluation in tests/test_parallel.py; a psum here
        # scales every grad by D, which Adam's step-1 scale invariance
        # masks everywhere except the eps-transition zone).
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        gmask = alive.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)), grads
        )
        new_opt, new_adam = optim.adam_update(adam, opt, grads, lr_tree)
        return new_opt, new_adam, loss, grads

    step = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def train_step(state, adam, color, depth, w2c):
        opt = _split(state.params)
        new_opt, new_adam, loss, grads = step(
            opt, adam, state.alive, state.params, color, depth, w2c,
            tile_ids_all, tmask_all,
        )
        return (state._replace(params=_merge(state.params, new_opt)),
                new_adam, loss, grads)

    def init_adam(state):
        return optim.adam_init(_split(state.params))

    return train_step, init_adam, dict(tile_ids=tile_ids_all,
                                       tmask=tmask_all)


def dpsp_map_step(mesh: Mesh, cam: Camera, rcfg: RasterConfig,
                  mcfg: MapperConfig):
    """Composed data x spatial parallelism over a 2D mesh (axes
    ("data", "space")): device (d, s) composites KEYFRAME d's TILE SLICE s
    against the replicated gaussian state. Per-view masked-loss sums `psum`
    over the `space` axis (each view's loss is its exact full-image loss),
    the total is their `pmean` over `data` (the dp multi-view average), and
    the exact global gradient is the `pmean` of per-device contributions
    over BOTH axes (same psum-transpose algebra as `sp_map_step`).

    On a v5e-8 a (2, 4) or (4, 2) mesh trades view-throughput against
    per-view latency without changing the optimization semantics of either
    axis. Returns (train_step, init_adam, aux); train_step(state, adam,
    colors, depths, w2cs) takes keyframe arrays with a leading axis of
    size mesh.shape["data"].
    """
    ax_d, ax_s = mesh.axis_names
    n_space = int(mesh.shape[ax_s])
    ts = rcfg.tile
    tiles_x = -(-cam.width // ts)
    tiles_y = -(-cam.height // ts)
    n_tiles = tiles_x * tiles_y
    s_pad = -(-n_tiles // n_space) * n_space
    tile_ids_all = jnp.concatenate([
        jnp.arange(n_tiles, dtype=jnp.int32),
        jnp.zeros((s_pad - n_tiles,), jnp.int32),
    ])
    tmask_all = (jnp.arange(s_pad) < n_tiles).astype(jnp.float32)

    lr_tree = OptimizedParams(
        xyz=mcfg.lr_xyz, log_scales=mcfg.lr_scaling,
        quats=mcfg.lr_rotation, opacity_logits=mcfg.lr_opacity,
    )

    def _in_image(tile_ids):
        tx0 = (tile_ids % tiles_x) * ts
        ty0 = (tile_ids // tiles_x) * ts
        uu = tx0[:, None, None] + jnp.arange(ts, dtype=jnp.int32)[None, None]
        vv = ty0[:, None, None] + jnp.arange(ts, dtype=jnp.int32)[..., None]
        return (uu < cam.width) & (vv < cam.height)

    def local_loss(opt, frozen, alive, color, depth, w2c, tile_ids, tmask):
        params = _merge(frozen, opt)
        out = render_tiles(params.xyz, params.quats, params.log_scales,
                           params.opacity_logits, sh_to_rgb(params.f_dc),
                           w2c[0], tile_ids, cam, rcfg, alive=alive)
        gt_c = gt_tiles(color[0], tile_ids, ts, tiles_x, tiles_y)
        gt_d = gt_tiles(depth[0], tile_ids, ts, tiles_x, tiles_y)
        valid = _in_image(tile_ids) & (tmask[:, None, None] > 0)
        mask = (gt_d > 0) & ~jnp.isnan(out.depth) & valid
        m = mask.astype(jnp.float32)

        dc = jnp.abs(out.color - gt_c) * m[..., None]
        cnum = jax.lax.psum(jnp.sum(dc), ax_s)
        cden = jax.lax.psum(jnp.sum(m), ax_s) * 3.0
        color_l1 = cnum / jnp.maximum(cden, 1.0)

        dd = jnp.abs(out.depth - gt_d) * m
        dnum = jax.lax.psum(jnp.sum(dd), ax_s)
        depth_l1 = dnum / jnp.maximum(jax.lax.psum(jnp.sum(m), ax_s), 1.0)

        ssim_t = jax.vmap(ssim)(jnp.clip(out.color, 0.0, 1.0), gt_c)
        snum = jax.lax.psum(jnp.sum(ssim_t * tmask), ax_s)
        sden = jax.lax.psum(jnp.sum(tmask), ax_s)
        ssim_mean = snum / jnp.maximum(sden, 1.0)

        view_loss = ((1.0 - mcfg.lambda_dssim) * color_l1
                     + mcfg.lambda_dssim * (1.0 - ssim_mean) + depth_l1)
        total = jax.lax.pmean(view_loss, ax_d)
        n_all = int(mesh.devices.size)
        reg = jax.lax.psum(
            isotropic_loss(params.log_scales, alive) / n_all, (ax_d, ax_s)
        )
        return total + reg

    def sharded_step(opt, adam, alive, frozen, colors, depths, w2cs,
                     tile_ids, tmask):
        loss, grads = jax.value_and_grad(local_loss)(
            opt, frozen, alive, colors, depths, w2cs, tile_ids, tmask
        )
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, (ax_d, ax_s)), grads
        )
        gmask = alive.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)), grads
        )
        new_opt, new_adam = optim.adam_update(adam, opt, grads, lr_tree)
        return new_opt, new_adam, loss, grads

    step = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(ax_d), P(ax_d), P(ax_d),
                  P(ax_s), P(ax_s)),
        out_specs=(P(), P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def train_step(state, adam, colors, depths, w2cs):
        opt = _split(state.params)
        new_opt, new_adam, loss, grads = step(
            opt, adam, state.alive, state.params, colors, depths, w2cs,
            tile_ids_all, tmask_all,
        )
        return (state._replace(params=_merge(state.params, new_opt)),
                new_adam, loss, grads)

    def init_adam(state):
        return optim.adam_init(_split(state.params))

    return train_step, init_adam, dict(tile_ids=tile_ids_all,
                                       tmask=tmask_all)


def sp_track_refine(mesh: Mesh, cam: Camera, rcfg: RasterConfig, tcfg):
    """Tile-sharded (sp) tracking refinement over a device mesh.

    Tracking is the LATENCY-critical dispatch (one pose per frame, ~60
    sequential iterations — reference tracker.py:258-327), so unlike
    mapping it cannot scale by throughput; sp divides the per-iteration
    kernel work instead. Each device renders its slice of the frozen-sorted
    tile grid (`render_frozen_sorted_tiles`), the masked tracking-loss
    numerators/denominators `psum` over ICI, the outlier-depth median's
    1/16 pixel subsample is `all_gather`'d (~a few hundred KB — sub-ms on
    ICI) so the median is the exact global one, and the pose cotangent is
    `pmean`'d through a custom_vjp identity hook — so `tracker._refine`
    (plateau LR, early stop, best-iterate selection) runs UNMODIFIED and
    bit-identically replicated inside shard_map.

    Goes beyond the reference's parallelism inventory: its dual-GPU layout
    (SURVEY §2.4 P4) never shards tracking. Gradient/trajectory exactness
    vs the single-device tile-subset tracker path is asserted in
    tests/test_parallel.py.

    Returns `refine(params, alive, init_rel, last_w2c, gt_color, gt_depth,
    exposure0, num_iters) -> (rel 4x4, exposure (2,), stats_vec)` (jitted).
    Pad tiles (tile grid not divisible by the mesh) carry zero loss weight;
    their zero depth-err samples enter the median subsample exactly like
    the single-device full-grid subset path's would.
    """
    from ..ops.rasterizer import (FrozenSorted, freeze_sorted,
                                  render_frozen_sorted_tiles)
    from ..slam.tracker import (PoseParams, _in_image_mask, _refine,
                                _rel_matrix)

    if rcfg.backend not in ("auto", "sorted"):
        raise ValueError(
            "sp_track_refine renders via the frozen-sorted tile path; "
            f"backend must be 'sorted' (or 'auto'), got {rcfg.backend!r}")
    if not tcfg.frozen_binning:
        raise ValueError("sp_track_refine requires tcfg.frozen_binning")

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    ts = rcfg.tile
    tiles_x = -(-cam.width // ts)
    tiles_y = -(-cam.height // ts)
    n_tiles = tiles_x * tiles_y
    s_pad = -(-n_tiles // n_dev) * n_dev
    tile_ids_all = jnp.concatenate([
        jnp.arange(n_tiles, dtype=jnp.int32),
        jnp.zeros((s_pad - n_tiles,), jnp.int32),
    ])
    treal_all = jnp.arange(s_pad) < n_tiles
    # Static count of REAL-tile median samples (see _sp_losses): every real
    # tile contributes its full ::4,::4 subsample grid, zeros included,
    # exactly like the single-device full-grid subset path.
    m_sub = len(range(0, ts, 4))
    n_med = n_tiles * m_sub * m_sub

    @jax.custom_vjp
    def _pmean_grad(pose):
        # Identity forward; pmean cotangent. A replicated input feeding
        # psum'd per-device terms gets a D-scaled partition share back
        # through shard_map's psum transpose (see sp_map_step) — the pmean
        # here reconstructs the exact replicated gradient so the optimizer
        # state inside _refine stays identical on every device.
        return pose

    def _pg_fwd(pose):
        return pose, None

    def _pg_bwd(_, g):
        return (jax.tree.map(lambda t: jax.lax.pmean(t, axis), g),)

    _pmean_grad.defvjp(_pg_fwd, _pg_bwd)

    def _sp_losses(out, pose, gt_c, gt_d, valid, treal):
        """tracker._losses_from_output with psum'd reductions (same math,
        tracker.py:99-154; reference compute_losses tracker.py:69-128)."""
        image = out.color
        if tcfg.enable_exposure:
            image = jnp.clip(
                jnp.exp(pose.exposure[0]) * image + pose.exposure[1], 0.0, 1.0)
        depth_mask = (gt_d > 0.0) & valid
        tracking_mask = depth_mask
        if tcfg.filter_alpha:
            tracking_mask = tracking_mask & (out.alpha > tcfg.alpha_thre)
        if tcfg.filter_outlier_depth:
            depth_err = jnp.abs(out.depth - gt_d) * depth_mask
            # Median over REAL tiles' subsamples only: pad tiles would
            # inject fabricated zeros and bias the gate low (or disable it
            # on small grids). Pads -> +inf, sort, index the middle of the
            # STATIC n_med real samples — jnp.median semantics over exactly
            # the sample set the single-device full-grid path sees.
            sub = jnp.where(treal[:, None, None],
                            depth_err[..., ::4, ::4], jnp.inf)
            srt = jnp.sort(jax.lax.all_gather(sub, axis).ravel())
            med = 0.5 * (srt[(n_med - 1) // 2] + srt[n_med // 2])
            tracking_mask = tracking_mask & jnp.where(
                med > 0, depth_err < 50.0 * med, True)
        color_px = (jnp.abs(image - gt_c) + 1e-8) * valid[..., None]
        depth_px = (jnp.abs(out.depth - gt_d) + 1e-8) * tracking_mask
        if tcfg.soft_alpha:
            a3 = out.alpha**3
            color_px = color_px * a3[..., None]
            depth_px = depth_px * a3
            if tcfg.mask_invalid_depth:
                color_px = color_px * tracking_mask[..., None]
        else:
            color_px = color_px * tracking_mask[..., None]
        n_color = jax.lax.psum(jnp.sum(color_px > 0), axis)
        n_depth = jax.lax.psum(jnp.sum(depth_px > 0), axis)
        csum = jax.lax.psum(jnp.sum(color_px), axis)
        dsum = jax.lax.psum(jnp.sum(depth_px), axis)
        cl = jnp.where(n_color > 0, csum / jnp.maximum(n_color, 1), jnp.inf)
        dl = jnp.where(n_depth > 0, dsum / jnp.maximum(n_depth, 1), jnp.inf)
        return cl, dl

    def _local_run(e3d, seg_start, seg_cnt, gt_c_t, gt_d_t, valid_t,
                   treal, tile_ids, init_rel, last_w2c, exposure0,
                   num_iters):
        fs = FrozenSorted(e3d, seg_start, seg_cnt)

        def loss_fn(pose: PoseParams):
            pose = _pmean_grad(pose)
            out = render_frozen_sorted_tiles(
                fs, last_w2c @ _rel_matrix(pose), tile_ids, cam, rcfg)
            cl, dl = _sp_losses(out, pose, gt_c_t, gt_d_t, valid_t, treal)
            return (tcfg.w_color_loss * cl
                    + (1 - tcfg.w_color_loss) * dl, (cl, dl))

        rel, exposure, stats_vec, _, _ = _refine(
            loss_fn, init_rel, num_iters, exposure0, tcfg)
        return rel, exposure, stats_vec

    run = shard_map(
        _local_run,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def refine(params, alive, init_rel, last_w2c, gt_color, gt_depth,
               exposure0, num_iters):
        colors = sh_to_rgb(params.f_dc)
        fs = freeze_sorted(params.xyz, params.quats, params.log_scales,
                           params.opacity_logits, colors,
                           last_w2c @ init_rel, cam, rcfg, alive=alive)
        gt_c_t = gt_tiles(gt_color, tile_ids_all, ts, tiles_x, tiles_y)
        gt_d_t = gt_tiles(gt_depth, tile_ids_all, ts, tiles_x, tiles_y)
        valid_t = (_in_image_mask(tile_ids_all, ts, tiles_x, cam)
                   & treal_all[:, None, None])
        return run(fs.e3d, fs.seg_start, fs.seg_cnt, gt_c_t, gt_d_t, valid_t,
                   treal_all, tile_ids_all, init_rel, last_w2c, exposure0,
                   jnp.asarray(num_iters, jnp.int32))

    return refine, dict(n_tiles=n_tiles, s_pad=s_pad)


def lc_submesh(mesh: Mesh, n_lc_devices: int = 2) -> Mesh:
    """Carve an LC slice off the mesh (the `lc.device: 1` equivalent)."""
    devs = list(mesh.devices.flat)
    n_lc = min(n_lc_devices, max(len(devs) - 1, 1))
    return Mesh(devs[-n_lc:], ("lc",))
