"""Amortized micro-benchmark of the TRACKING iteration on the real TPU.

After the round-4 mapping fixes, tracking is the largest budget line
(PERF.md run 7: 23.1 s dispatch over ~70 frames = ~5.7 ms/iter at the 1/8
tile subset). This decomposes a tracked frame at bench scale (262k-capacity
map, 1200x680):

  - freeze:      per-frame freeze_sorted cost (center sort + attr gather)
  - cand:        per-candidate full-image scoring render (reference protocol)
  - fwd@f:       frozen-sorted forward-only render at tile-subset frac f
  - iter@f:      value_and_grad of the tracking loss at frac f (the
                 refinement iteration's kernel+loss+pose-VJP cost; includes
                 one freeze_sorted amortized over K iters)
  - refine:      full _refine dispatch at fixed iters (adds adam/plateau/
                 early-stop bookkeeping)
  - track_frame: the real fused bench-path dispatch (candidates + doubling
                 + subset refinement + polish)

EAGS_RCFG honors kernel-shape overrides (tile/seg_cap/group/...) so the
seg_sweep winners can be A/B'd on the tracking shapes too.

Usage (from /root/repo, TPU idle):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/track_bench.py [n]
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


@functools.partial(jax.jit, static_argnames=("cam", "rcfg"))
def _freeze(params, alive, colors, w2c, cam, rcfg):
    from eags_slam_tpu.ops.rasterizer import freeze_sorted

    return freeze_sorted(params.xyz, params.quats, params.log_scales,
                         params.opacity_logits, colors, w2c, cam, rcfg,
                         alive=alive)


@functools.partial(jax.jit,
                   static_argnames=("cam", "rcfg", "K", "fwd_only"))
def _iter_many(fs, gt_c_t, gt_d_t, in_img, tile_ids, w2c, pose0, cam, rcfg,
               K, fwd_only):
    """K frozen-sorted subset iterations in ONE dispatch (scan-carried pose
    so iterations serialize). fwd_only skips the grad."""
    from eags_slam_tpu.ops.rasterizer import (
        render_frozen_sorted_tiles, render_frozen_sorted_tiles_pose)
    from eags_slam_tpu.slam import tracker as T

    # EAGS_POSE_KERNEL=1 routes the refinement gradient through the
    # pose-contraction backward (PERF.md roadmap #6) for an iter@f A/B.
    pose_kernel = bool(int(os.environ.get("EAGS_POSE_KERNEL", "0") or 0))

    def loss_fn(pose):
        if pose_kernel:
            pv = jnp.concatenate([pose.quat, pose.trans])
            out = render_frozen_sorted_tiles_pose(
                fs, pv, w2c, tile_ids, cam, rcfg)
        else:
            out = render_frozen_sorted_tiles(
                fs, w2c @ T._rel_matrix(pose), tile_ids, cam, rcfg)
        cl, dl = T._losses_from_output(
            out, pose, gt_c_t, gt_d_t,
            T.TrackerConfig(enable_exposure=True), valid=in_img)
        return 0.95 * cl + 0.05 * dl, (cl, dl)

    if fwd_only:
        def step(carry, _):
            out = render_frozen_sorted_tiles(
                fs, w2c @ T._rel_matrix(carry), tile_ids, cam, rcfg)
            v = out.color.ravel()[0]
            return carry._replace(quat=carry.quat + 1e-9 * v), v
    else:
        def step(carry, _):
            (tot, _), g = jax.value_and_grad(loss_fn, has_aux=True)(carry)
            new = jax.tree.map(lambda p, gr: p - 1e-4 * gr, carry, g)
            return new, tot

    return jax.lax.scan(step, pose0, None, length=K)[1].sum()


@functools.partial(jax.jit, static_argnames=("cam", "rcfg", "tcfg", "K"))
def _refine_fixed(params, alive, colors, rel0, w2c, gt_color, gt_depth,
                  tile_ids, gt_c_t, gt_d_t, in_img, cam, rcfg, tcfg, K):
    from eags_slam_tpu.slam import tracker as T

    loss_fn = T._make_loss_fn(params, alive, colors, rel0, w2c, gt_color,
                              gt_depth, cam, rcfg, tcfg,
                              subset=(tile_ids, gt_c_t, gt_d_t, in_img))
    rel, _, stats, _, _ = T._refine(loss_fn, rel0,
                                    jnp.asarray(K, jnp.int32),
                                    jnp.zeros(2), tcfg)
    return rel.sum() + stats[0]


def main():
    from map_bench import make_scene, measure_floor, timed

    from eags_slam_tpu.core.gaussians import GaussianParams
    from eags_slam_tpu.core.sh import rgb_to_sh, sh_to_rgb
    from eags_slam_tpu.ops.rasterizer import (RasterConfig, apply_rcfg_env,
                                              gt_tiles, render)
    from eags_slam_tpu.slam import tracker as T

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 680
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1200
    cam, (means, quats, log_scales, opac, f_dc) = make_scene(n, h, w)
    rcfg = apply_rcfg_env(RasterConfig(
        tile=32, dup_side=3, group=8, backend="sorted", seg_cap=1024,
        bands=3))
    tcfg = T.TrackerConfig(iterations=60, enable_exposure=True,
                           tile_subset_frac=0.125, polish_iters=12,
                           polish_frac=0.25)
    params = GaussianParams(
        xyz=means, f_dc=rgb_to_sh(jnp.clip(f_dc, 0, 1)),
        f_rest=jnp.zeros((n, 15, 3)), log_scales=log_scales, quats=quats,
        opacity_logits=opac,
    )
    alive = jnp.ones((n,), bool)
    colors = sh_to_rgb(params.f_dc)
    w2c = jnp.eye(4)

    floor = measure_floor()
    print(f"backend={jax.default_backend()} n={n} {w}x{h} "
          f"floor={floor*1e3:.1f}ms rcfg(tile={rcfg.tile},"
          f"seg={rcfg.seg_cap},g={rcfg.group},win={rcfg.rmw_window})")

    # GT frame = the scene rendered at identity (model-exact, like the
    # tracker sees after mapping converges).
    rend = jax.jit(render, static_argnames=("cam", "cfg"))
    out = rend(params.xyz, params.quats, params.log_scales,
               params.opacity_logits, colors, w2c, cam, cfg=rcfg,
               alive=alive)
    gt_color = jax.block_until_ready(out.color)
    gt_depth = out.depth
    rel0 = jnp.eye(4).at[0, 3].set(0.01)

    t = timed(lambda: float(_freeze(params, alive, colors, w2c @ rel0, cam,
                                    rcfg).seg_cnt.sum()))
    print(f"freeze_sorted:   {max(t - floor, 0)*1e3:8.2f} ms/frame")
    fs = _freeze(params, alive, colors, w2c @ rel0, cam, rcfg)

    rels = jnp.tile(jnp.eye(4)[None], (3, 1, 1))
    t = timed(lambda: float(T.eval_init_candidates(
        params, alive, rels, w2c, gt_color, gt_depth, cam, rcfg,
        tcfg).sum()))
    print(f"candidates (3):  {max(t - floor, 0)*1e3:8.2f} ms "
          f"({max(t - floor, 0)/3*1e3:.2f} ms/cand)")

    ts_ = rcfg.tile
    tiles_x = -(-cam.width // ts_)
    tiles_y = -(-cam.height // ts_)
    num_tiles = tiles_x * tiles_y
    K = 40
    pose0 = T.PoseParams(jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3),
                         jnp.zeros(2))

    for frac in (0.125, 0.25, 1.0):
        s = max(int(round(frac * num_tiles)), 1)
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)[:s]
        gt_c_t = gt_tiles(gt_color, tile_ids, ts_, tiles_x, tiles_y)
        gt_d_t = gt_tiles(gt_depth, tile_ids, ts_, tiles_x, tiles_y)
        in_img = T._in_image_mask(tile_ids, ts_, tiles_x, cam)
        for fwd_only in (True, False):
            t = timed(lambda fo=fwd_only, ti=tile_ids, gc=gt_c_t, gd=gt_d_t,
                      im=in_img: float(_iter_many(
                          fs, gc, gd, im, ti, w2c, pose0, cam, rcfg, K, fo)))
            tag = "fwd " if fwd_only else "iter"
            print(f"{tag}@{frac:<5}: {max(t - floor, 0)/K*1e3:8.2f} ms/iter")

    tcfg_nostop = tcfg._replace(early_stop_cnt=10**6, polish_iters=0)
    s = int(round(0.125 * num_tiles))
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)[:s]
    t = timed(lambda: float(_refine_fixed(
        params, alive, colors, rel0, w2c, gt_color, gt_depth, tile_ids,
        gt_tiles(gt_color, tile_ids, ts_, tiles_x, tiles_y),
        gt_tiles(gt_depth, tile_ids, ts_, tiles_x, tiles_y),
        T._in_image_mask(tile_ids, ts_, tiles_x, cam), cam, rcfg,
        tcfg_nostop, K)))
    print(f"_refine@0.125 ({K} it): {max(t - floor, 0)/K*1e3:8.2f} ms/iter "
          f"(incl. freeze + adam/plateau bookkeeping)")

    t = timed(lambda: float(T.track_frame(
        params, alive, rels, w2c, gt_color, gt_depth, jnp.float32(np.inf),
        jnp.float32(np.inf), jnp.zeros(2), cam, rcfg, tcfg)[0].sum()))
    print(f"track_frame (fused, 60 it + 12 polish): "
          f"{max(t - floor, 0)*1e3:8.2f} ms/frame")


if __name__ == "__main__":
    main()
