"""Multi-device mesh: dp mapping step on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_sp_map_step_matches_single_device():
    """Spatially-parallel mapping step (tile grid sharded over 8 devices):
    the psum'd loss and the applied update must match a single-device
    evaluation of the SAME per-tile loss over all tiles (the tile slices
    partition the image, so the gradient psum is exact, not approximate)."""
    import jax.numpy as jnp

    from eags_slam_tpu.core import gaussians as G
    from eags_slam_tpu.core.camera import Camera
    from eags_slam_tpu.core.sh import sh_to_rgb
    from eags_slam_tpu.ops.losses import isotropic_loss, ssim
    from eags_slam_tpu.ops.rasterizer import (RasterConfig, gt_tiles,
                                              render_tiles)
    from eags_slam_tpu.parallel.mesh import make_mesh, sp_map_step
    from eags_slam_tpu.slam.mapper import (MapperConfig, OptimizedParams,
                                           _merge, _split)
    from eags_slam_tpu.utils import optim

    h = w = 64
    cam = Camera(fx=70.0, fy=70.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    rcfg = RasterConfig(tile=16, dup_side=4, chunk=16, backend="sorted",
                        seg_cap=128, bands=3, group=2)
    mcfg = MapperConfig(max_keyframes=4)
    rng = np.random.default_rng(3)

    cap = 256
    state = G.empty_state(cap)
    n = 160
    xyz = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n),
         rng.uniform(1.2, 3.0, n)], -1).astype(np.float32)
    rows = G.point_rows(
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)),
        jnp.full((n,), 0.05), jnp.full((n,), 0.8),
    )
    state, _ = G.insert(state, rows, jnp.ones(n, bool))

    color = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1.0, 3.0, (h, w)).astype(np.float32))
    w2c = jnp.eye(4)

    mesh = make_mesh(8)
    step, init_adam, aux = sp_map_step(mesh, cam, rcfg, mcfg)
    adam = init_adam(state)
    new_state, new_adam, loss_sp, grads_sp = step(state, adam, color, depth,
                                                  w2c)
    loss_sp = float(loss_sp)
    assert np.isfinite(loss_sp)

    # Single-device reference: identical per-tile formula over ALL tiles.
    ts = rcfg.tile
    tiles_x = tiles_y = -(-w // ts)
    tile_ids, tmask = aux["tile_ids"], aux["tmask"]

    def ref_loss(opt):
        params = _merge(state.params, opt)
        out = render_tiles(params.xyz, params.quats, params.log_scales,
                           params.opacity_logits, sh_to_rgb(params.f_dc),
                           w2c, tile_ids, cam, rcfg, alive=state.alive)
        gt_c = gt_tiles(color, tile_ids, ts, tiles_x, tiles_y)
        gt_d = gt_tiles(depth, tile_ids, ts, tiles_x, tiles_y)
        mask = (gt_d > 0) & ~jnp.isnan(out.depth) & (tmask[:, None, None] > 0)
        m = mask.astype(jnp.float32)
        color_l1 = jnp.sum(jnp.abs(out.color - gt_c) * m[..., None]) / (
            jnp.maximum(jnp.sum(m) * 3.0, 1.0))
        depth_l1 = jnp.sum(jnp.abs(out.depth - gt_d) * m) / jnp.maximum(
            jnp.sum(m), 1.0)
        ssim_t = jax.vmap(ssim)(jnp.clip(out.color, 0.0, 1.0), gt_c)
        ssim_mean = jnp.sum(ssim_t * tmask) / jnp.sum(tmask)
        return ((1 - mcfg.lambda_dssim) * color_l1
                + mcfg.lambda_dssim * (1 - ssim_mean) + depth_l1
                + isotropic_loss(params.log_scales, state.alive))

    opt0 = _split(state.params)
    loss_ref, grads = jax.value_and_grad(ref_loss)(opt0)
    gmask = state.alive.astype(jnp.float32)
    grads = jax.tree.map(
        lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)), grads)
    lr_tree = OptimizedParams(
        xyz=mcfg.lr_xyz, log_scales=mcfg.lr_scaling,
        quats=mcfg.lr_rotation, opacity_logits=mcfg.lr_opacity)
    opt_ref, _ = optim.adam_update(init_adam(state), opt0, grads, lr_tree)

    assert abs(loss_sp - float(loss_ref)) < 1e-4, (loss_sp, float(loss_ref))
    # GRADIENT equivalence is the real invariant (Adam's step-1 saturation
    # amplifies fp-reordering dust on ~zero gradients into full +-lr step
    # differences, so post-update params only agree where the gradient is
    # clearly signed).
    for name in OptimizedParams._fields:
        gs = np.asarray(getattr(grads_sp, name))
        gr = np.asarray(getattr(grads, name))
        np.testing.assert_allclose(gs, gr, rtol=2e-3, atol=1e-6,
                                   err_msg=name)
    got = _split(new_state.params)
    for name in OptimizedParams._fields:
        a = np.asarray(getattr(got, name))
        b = np.asarray(getattr(opt_ref, name))
        g = np.asarray(getattr(grads, name))
        strong = np.abs(g) > 1e-3
        np.testing.assert_allclose(a[strong], b[strong], atol=2e-5,
                                   err_msg=name)
        if name == "xyz":  # the scene must actually produce real gradients
            assert strong.mean() > 0.02, strong.mean()


def test_dpsp_map_step_matches_single_device():
    """Composed 2x4 (data x space) mesh: two keyframes, each view's tile
    grid split over 4 devices. Gradients must equal the single-device
    two-view-average of the same per-tile loss."""
    import jax.numpy as jnp

    from eags_slam_tpu.core import gaussians as G
    from eags_slam_tpu.core.camera import Camera
    from eags_slam_tpu.core.se3 import se3_exp
    from eags_slam_tpu.core.sh import sh_to_rgb
    from eags_slam_tpu.ops.losses import isotropic_loss, ssim
    from eags_slam_tpu.ops.rasterizer import (RasterConfig, gt_tiles,
                                              render_tiles)
    from eags_slam_tpu.parallel.mesh import dpsp_map_step, make_mesh2d
    from eags_slam_tpu.slam.mapper import (MapperConfig, OptimizedParams,
                                           _merge, _split)

    h = w = 64
    cam = Camera(fx=70.0, fy=70.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    rcfg = RasterConfig(tile=16, dup_side=4, chunk=16, backend="sorted",
                        seg_cap=128, bands=3, group=2)
    mcfg = MapperConfig(max_keyframes=4)
    rng = np.random.default_rng(5)

    cap = 256
    state = G.empty_state(cap)
    n = 150
    xyz = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n),
         rng.uniform(1.2, 3.0, n)], -1).astype(np.float32)
    rows = G.point_rows(
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)),
        jnp.full((n,), 0.05), jnp.full((n,), 0.8),
    )
    state, _ = G.insert(state, rows, jnp.ones(n, bool))

    colors = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1.0, 3.0, (2, h, w)).astype(np.float32))
    w2cs = jnp.stack([
        jnp.eye(4),
        jnp.asarray(np.asarray(
            se3_exp(jnp.asarray([0.03, 0.0, -0.02, 0.01, 0.0, 0.0])),
            np.float32)),
    ])

    mesh = make_mesh2d(2, 4)
    step, init_adam, aux = dpsp_map_step(mesh, cam, rcfg, mcfg)
    _, _, loss_sp, grads_sp = step(state, init_adam(state), colors, depths,
                                   w2cs)
    assert np.isfinite(float(loss_sp))

    ts = rcfg.tile
    tiles_x = tiles_y = -(-w // ts)
    tile_ids, tmask = aux["tile_ids"], aux["tmask"]

    def ref_loss(opt):
        params = _merge(state.params, opt)

        def one_view(color, depth, w2c):
            out = render_tiles(params.xyz, params.quats, params.log_scales,
                               params.opacity_logits, sh_to_rgb(params.f_dc),
                               w2c, tile_ids, cam, rcfg, alive=state.alive)
            gt_c = gt_tiles(color, tile_ids, ts, tiles_x, tiles_y)
            gt_d = gt_tiles(depth, tile_ids, ts, tiles_x, tiles_y)
            mask = ((gt_d > 0) & ~jnp.isnan(out.depth)
                    & (tmask[:, None, None] > 0))
            m = mask.astype(jnp.float32)
            color_l1 = jnp.sum(jnp.abs(out.color - gt_c) * m[..., None]) / (
                jnp.maximum(jnp.sum(m) * 3.0, 1.0))
            depth_l1 = jnp.sum(jnp.abs(out.depth - gt_d) * m) / jnp.maximum(
                jnp.sum(m), 1.0)
            ssim_t = jax.vmap(ssim)(jnp.clip(out.color, 0.0, 1.0), gt_c)
            ssim_mean = jnp.sum(ssim_t * tmask) / jnp.sum(tmask)
            return ((1 - mcfg.lambda_dssim) * color_l1
                    + mcfg.lambda_dssim * (1 - ssim_mean) + depth_l1)

        vl = (one_view(colors[0], depths[0], w2cs[0])
              + one_view(colors[1], depths[1], w2cs[1])) / 2.0
        return vl + isotropic_loss(params.log_scales, state.alive)

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(_split(state.params))
    gmask = state.alive.astype(jnp.float32)
    grads_ref = jax.tree.map(
        lambda g: g * gmask.reshape((-1,) + (1,) * (g.ndim - 1)), grads_ref)

    assert abs(float(loss_sp) - float(loss_ref)) < 1e-4
    for name in OptimizedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(grads_sp, name)),
            np.asarray(getattr(grads_ref, name)),
            rtol=2e-3, atol=1e-6, err_msg=name)


def test_sp_track_refine_matches_single_device():
    """Tile-sharded tracking refinement (parallel.mesh.sp_track_refine):
    the full pose TRAJECTORY (while_loop with plateau LR + early stop +
    best-iterate selection) must match the single-device tracker running
    the same full-tile-grid subset loss — the psum'd loss, the all_gather'd
    outlier median and the pmean'd pose cotangent reproduce the exact
    single-chip math. 24 tiles over 8 devices (3/device, no pad tiles so
    the reference's subset path is directly comparable)."""
    import jax.numpy as jnp

    from eags_slam_tpu.core import gaussians as G
    from eags_slam_tpu.core.camera import Camera
    from eags_slam_tpu.core.sh import sh_to_rgb
    from eags_slam_tpu.ops.rasterizer import RasterConfig, gt_tiles
    from eags_slam_tpu.parallel.mesh import make_mesh, sp_track_refine
    from eags_slam_tpu.slam import tracker as T

    h, w = 64, 96
    cam = Camera(fx=80.0, fy=80.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    rcfg = RasterConfig(tile=16, dup_side=4, chunk=16, backend="sorted",
                        seg_cap=128, bands=3, group=2)
    tcfg = T.TrackerConfig(iterations=15, enable_exposure=True,
                           frozen_binning=True, tile_subset_frac=0.0,
                           early_stop_cnt=50)
    rng = np.random.default_rng(11)

    n = 200
    xyz = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
         rng.uniform(1.2, 3.0, n)], -1).astype(np.float32)
    rows = G.point_rows(
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)),
        jnp.full((n,), 0.05), jnp.full((n,), 0.85),
    )
    state = G.empty_state(256)
    state, _ = G.insert(state, rows, jnp.ones(n, bool))
    params, alive = state.params, state.alive

    # GT frame rendered at identity; track from a slightly-off init pose.
    from eags_slam_tpu.ops.rasterizer import render
    colors = sh_to_rgb(params.f_dc)
    out = render(params.xyz, params.quats, params.log_scales,
                 params.opacity_logits, colors, jnp.eye(4), cam, rcfg,
                 alive=alive)
    gt_color, gt_depth = out.color, out.depth
    last_w2c = jnp.eye(4)
    init_rel = jnp.asarray(np.array([
        [1, 0, 0, 0.01], [0, 1, 0, -0.008], [0, 0, 1, 0.012], [0, 0, 0, 1],
    ], np.float32))
    exp0 = jnp.zeros(2)
    iters = jnp.asarray(15, jnp.int32)

    mesh = make_mesh(8)
    refine_sp, aux = sp_track_refine(mesh, cam, rcfg, tcfg)
    assert aux["s_pad"] == aux["n_tiles"] == 24  # no pad tiles
    rel_sp, exp_sp, stats_sp = refine_sp(params, alive, init_rel, last_w2c,
                                         gt_color, gt_depth, exp0, iters)

    # Single-device reference: the tracker's own subset path over the FULL
    # tile grid (identical tile stack, identical loss + refinement loop).
    ts = rcfg.tile
    tiles_x, tiles_y = w // ts, h // ts
    tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    gt_c_t = gt_tiles(gt_color, tile_ids, ts, tiles_x, tiles_y)
    gt_d_t = gt_tiles(gt_depth, tile_ids, ts, tiles_x, tiles_y)
    in_img = T._in_image_mask(tile_ids, ts, tiles_x, cam)
    loss_ref = T._make_loss_fn(params, alive, colors, init_rel, last_w2c,
                               gt_color, gt_depth, cam, rcfg, tcfg,
                               subset=(tile_ids, gt_c_t, gt_d_t, in_img))
    rel_ref, exp_ref, stats_ref, _, _ = T._refine(
        loss_ref, init_rel, iters, exp0, tcfg)

    np.testing.assert_allclose(np.asarray(rel_sp), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(exp_sp), np.asarray(exp_ref),
                               rtol=0, atol=1e-4)
    # Final/best loss agrees; the refinement actually improved the pose.
    np.testing.assert_allclose(np.asarray(stats_sp)[:2],
                               np.asarray(stats_ref)[:2], rtol=1e-3,
                               atol=1e-6)
    err0 = float(jnp.linalg.norm(init_rel[:3, 3]))
    err1 = float(jnp.linalg.norm(jnp.asarray(rel_sp)[:3, 3]))
    assert err1 < err0, (err1, err0)

    # Degenerate mesh of 1 (the single-chip EAGS_BENCH_MESH+EAGS_SP_TRACK
    # path): collectives are identities, trajectory matches too.
    refine_1, _ = sp_track_refine(make_mesh(1), cam, rcfg, tcfg)
    rel_1, _, stats_1 = refine_1(params, alive, init_rel, last_w2c,
                                 gt_color, gt_depth, exp0, iters)
    np.testing.assert_allclose(np.asarray(rel_1), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)


def test_sp_track_refine_padded_grid_matches_single_device():
    """Same trajectory parity with a tile grid NOT divisible by the mesh
    (20 real tiles + 4 pads on 8 devices): pad tiles must contribute
    nothing — zero loss weight AND no fabricated zero samples in the
    outlier-depth median (the regression this test pins: a plain gathered
    median over padded subsamples biases the 50x gate low)."""
    import jax.numpy as jnp

    from eags_slam_tpu.core import gaussians as G
    from eags_slam_tpu.core.camera import Camera
    from eags_slam_tpu.core.sh import sh_to_rgb
    from eags_slam_tpu.ops.rasterizer import (RasterConfig, gt_tiles,
                                              render)
    from eags_slam_tpu.parallel.mesh import make_mesh, sp_track_refine
    from eags_slam_tpu.slam import tracker as T

    h, w = 64, 80  # 5x4 = 20 tiles at ts=16 -> s_pad 24, 4 pad tiles
    cam = Camera(fx=80.0, fy=80.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    rcfg = RasterConfig(tile=16, dup_side=4, chunk=16, backend="sorted",
                        seg_cap=128, bands=3, group=2)
    tcfg = T.TrackerConfig(iterations=12, enable_exposure=True,
                           tile_subset_frac=0.0, early_stop_cnt=50)
    rng = np.random.default_rng(23)
    n = 180
    xyz = np.stack(
        [rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
         rng.uniform(1.2, 3.0, n)], -1).astype(np.float32)
    rows = G.point_rows(
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)),
        jnp.full((n,), 0.05), jnp.full((n,), 0.85),
    )
    state, _ = G.insert(G.empty_state(256), rows, jnp.ones(n, bool))
    params, alive = state.params, state.alive
    colors = sh_to_rgb(params.f_dc)
    out = render(params.xyz, params.quats, params.log_scales,
                 params.opacity_logits, colors, jnp.eye(4), cam, rcfg,
                 alive=alive)
    gt_color, gt_depth = out.color, out.depth
    init_rel = jnp.eye(4, dtype=jnp.float32).at[1, 3].set(0.012)
    iters = jnp.asarray(12, jnp.int32)

    refine_sp, aux = sp_track_refine(make_mesh(8), cam, rcfg, tcfg)
    assert aux["n_tiles"] == 20 and aux["s_pad"] == 24
    rel_sp, exp_sp, stats_sp = refine_sp(
        params, alive, init_rel, jnp.eye(4), gt_color, gt_depth,
        jnp.zeros(2), iters)

    # Single-device reference over the REAL tiles only.
    ts = rcfg.tile
    tiles_x = w // ts
    tile_ids = jnp.arange(20, dtype=jnp.int32)
    subset = (tile_ids,
              gt_tiles(gt_color, tile_ids, ts, tiles_x, h // ts),
              gt_tiles(gt_depth, tile_ids, ts, tiles_x, h // ts),
              T._in_image_mask(tile_ids, ts, tiles_x, cam))
    loss_ref = T._make_loss_fn(params, alive, colors, init_rel, jnp.eye(4),
                               gt_color, gt_depth, cam, rcfg, tcfg,
                               subset=subset)
    rel_ref, exp_ref, stats_ref, _, _ = T._refine(
        loss_ref, init_rel, iters, jnp.zeros(2), tcfg)

    np.testing.assert_allclose(np.asarray(rel_sp), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats_sp)[:2],
                               np.asarray(stats_ref)[:2], rtol=1e-3,
                               atol=1e-6)


def test_e2e_sp_tracking(tmp_path):
    """Full pipeline with tracking.sp_track on (the tracker's refinement
    runs tile-sharded over the test mesh): the run completes and the
    trajectory stays within the fresh-protocol e2e bound."""
    import jax.numpy as jnp  # noqa: F401  (mesh init ordering)

    from eags_slam_tpu.config import load_config
    from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM

    config = load_config("configs/synthetic/base.yaml")
    config["use_mesh"] = True  # base.yaml opts out for the CPU e2e tests
    config["data"]["output_path"] = str(tmp_path / "out")
    config["data"]["n_frames"] = 8
    config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                          "cx": 47.5, "cy": 31.5})
    config["mapping"].update({
        "new_submap_every": 6, "iterations": 40,
        "new_submap_iterations": 80, "max_gaussians": 8192,
        "new_submap_points_num": 2000,
        "new_submap_gradient_points_num": 500,
        "new_frame_sample_size": 500,
    })
    config["tracking"].update({"iterations": 15, "sp_track": True})
    gslam = GaussianSLAM(config)
    try:
        assert gslam.tracker._sp_refine is not None  # mesh + flag wired
        report = gslam.run()
    finally:
        gslam.cleanup()
    assert report["frames"] == 8
    gt = np.stack([gslam.dataset.poses[i] for i in range(8)])
    err = np.linalg.norm(
        gslam.estimated_c2ws[:, :3, 3] - gt[:, :3, 3], axis=-1)
    assert err.max() < 0.04, err


def test_lc_submesh():
    from eags_slam_tpu.parallel.mesh import lc_submesh, make_mesh

    mesh = make_mesh()
    lc = lc_submesh(mesh, 2)
    assert lc.devices.size == 2
    assert lc.axis_names == ("lc",)


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
