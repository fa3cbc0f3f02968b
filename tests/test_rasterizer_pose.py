"""Golden tests for the pose-contraction tracking backward (PERF.md
roadmap #6): `render_frozen_sorted_tiles_pose` / `render_frozen_sorted_pose`
must reproduce the legacy frozen-sorted pose gradient (kernel rmw +
XLA reprojection VJP) — the same chain-rule sum in a different association
order. Covers subset (shuffled tile ids), full grid, bf16 DMA layout,
MXU quadform, overflowing segments, empty tiles, and the tracker-level
`_refine` trajectory with the flag on.

Replaces nothing in the reference (the CUDA rasterizers always materialize
per-gaussian grads, src/gsr/renderer.py:117-142); this is a TPU-side
optimization with exact-gradient semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.ops.rasterizer import (RasterConfig, freeze_sorted,
                                          render_frozen_sorted,
                                          render_frozen_sorted_pose,
                                          render_frozen_sorted_tiles,
                                          render_frozen_sorted_tiles_pose)
from eags_slam_tpu.slam.tracker import PoseParams, _rel_matrix


def _scene(n, h, w, seed, scale_hi=0.06):
    rng = np.random.default_rng(seed)
    cam = Camera(fx=150.0, fy=150.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    means = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1, 1, n),
         rng.uniform(0.5, 5, n)], axis=-1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ls = np.log(rng.uniform(0.01, scale_hi, (n, 3))).astype(np.float32)
    op = rng.uniform(0.5, 3.0, (n, 1)).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return cam, tuple(jnp.asarray(x) for x in (means, quats, ls, op, col))


def _freeze(cam, arrs, cfg, last_w2c):
    means, quats, ls, op, col = arrs
    return freeze_sorted(means, quats, ls, op, col, last_w2c, cam, cfg)


QT0 = jnp.asarray([0.999, 0.01, -0.02, 0.015, 0.01, -0.02, 0.03],
                  jnp.float32)


def _loss_of(out):
    return (out.color.sum() + 0.3 * out.depth.sum()
            + (out.alpha ** 2).sum() + (out.color * out.color).sum())


def _grads(fs, last_w2c, tile_ids, cam, cfg, qt):
    def legacy(qt):
        pose = PoseParams(qt[:4], qt[4:7], jnp.zeros(2))
        w2c = last_w2c @ _rel_matrix(pose)
        if tile_ids is None:
            return _loss_of(render_frozen_sorted(fs, w2c, cam, cfg))
        return _loss_of(
            render_frozen_sorted_tiles(fs, w2c, tile_ids, cam, cfg))

    def posek(qt):
        if tile_ids is None:
            return _loss_of(
                render_frozen_sorted_pose(fs, qt, last_w2c, cam, cfg))
        return _loss_of(render_frozen_sorted_tiles_pose(
            fs, qt, last_w2c, tile_ids, cam, cfg))

    v1, g1 = jax.jit(jax.value_and_grad(legacy))(qt)
    v2, g2 = jax.jit(jax.value_and_grad(posek))(qt)
    return (np.asarray(v1), np.asarray(g1)), (np.asarray(v2), np.asarray(g2))


def _assert_close(res1, res2, rtol=2e-4):
    (v1, g1), (v2, g2) = res1, res2
    assert np.isfinite(g1).all() and np.isfinite(g2).all()
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    denom = max(float(np.abs(g1).max()), 1e-6)
    np.testing.assert_allclose(g1 / denom, g2 / denom, atol=rtol)


@pytest.mark.parametrize("seed", [0, 1])
def test_pose_grad_subset_matches_legacy(seed):
    cam, arrs = _scene(4000, 128, 256, seed)
    cfg = RasterConfig(tile=16, group=4, backend="sorted", seg_cap=256,
                       bands=3)
    last_w2c = jnp.eye(4).at[0, 3].set(0.05)
    fs = _freeze(cam, arrs, cfg, last_w2c)
    num_tiles = (-(-256 // 16)) * (-(-128 // 16))
    # Shuffled, non-contiguous tile ids — the tracking top_k order.
    rng = np.random.default_rng(seed + 7)
    tile_ids = jnp.asarray(
        rng.permutation(num_tiles)[: num_tiles // 3].astype(np.int32))
    _assert_close(*_grads(fs, last_w2c, tile_ids, cam, cfg, QT0))


def test_pose_grad_full_grid_matches_legacy():
    cam, arrs = _scene(3000, 96, 192, 3)
    cfg = RasterConfig(tile=16, group=4, backend="sorted", seg_cap=256,
                       bands=3)
    last_w2c = jnp.eye(4)
    fs = _freeze(cam, arrs, cfg, last_w2c)
    _assert_close(*_grads(fs, last_w2c, None, cam, cfg, QT0))


@pytest.mark.parametrize("bf16,quadform", [(True, False), (False, True)])
def test_pose_grad_kernel_variants(bf16, quadform):
    cam, arrs = _scene(3000, 96, 192, 4)
    cfg = RasterConfig(tile=16, group=4, backend="sorted", seg_cap=256,
                       bands=3, kernel_bf16=bf16, kernel_quadform=quadform)
    last_w2c = jnp.eye(4)
    fs = _freeze(cam, arrs, cfg, last_w2c)
    num_tiles = (-(-192 // 16)) * (-(-96 // 16))
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)[::2]
    _assert_close(*_grads(fs, last_w2c, tile_ids, cam, cfg, QT0))


def test_pose_grad_overflow_segments():
    # n >> seg_cap per band: the overflow clipping must match bit-for-bit
    # (both paths read the same clipped windows).
    cam, arrs = _scene(20000, 64, 128, 5, scale_hi=0.12)
    cfg = RasterConfig(tile=16, group=2, backend="sorted", seg_cap=128,
                       bands=3)
    last_w2c = jnp.eye(4)
    fs = _freeze(cam, arrs, cfg, last_w2c)
    num_tiles = (-(-128 // 16)) * (-(-64 // 16))
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    _assert_close(*_grads(fs, last_w2c, tile_ids, cam, cfg, QT0))


def test_pose_grad_empty_tiles_zero():
    # Gaussians confined to the left half; right-half tiles are empty.
    cam, arrs = _scene(800, 64, 256, 6)
    means = np.array(arrs[0])
    means[:, 0] = -np.abs(means[:, 0]) - 0.5
    arrs = (jnp.asarray(means),) + arrs[1:]
    cfg = RasterConfig(tile=16, group=2, backend="sorted", seg_cap=128,
                       bands=3)
    last_w2c = jnp.eye(4)
    fs = _freeze(cam, arrs, cfg, last_w2c)
    tiles_x = -(-256 // 16)
    right = jnp.asarray([r * tiles_x + tiles_x - 1 for r in range(4)],
                        jnp.int32)

    def posek(qt):
        return _loss_of(render_frozen_sorted_tiles_pose(
            fs, qt, last_w2c, right, cam, cfg))

    g = jax.jit(jax.grad(posek))(QT0)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_refine_trajectory_with_pose_kernel():
    """Tracker-level: _refine with pose_grad_kernel=True converges to the
    same pose as the legacy path on a model-exact scene."""
    from eags_slam_tpu.slam import tracker as T

    cam, arrs = _scene(4000, 128, 256, 8)
    means, quats, ls, op, col = arrs
    cfg = RasterConfig(tile=16, group=4, backend="sorted", seg_cap=256,
                       bands=3)
    gt_w2c = jnp.eye(4)
    from eags_slam_tpu.ops.rasterizer import render
    out = render(means, quats, ls, op, col, gt_w2c, cam, cfg)
    gt_color, gt_depth = out.color, out.depth

    rel0 = jnp.eye(4).at[0, 3].set(0.01).at[1, 3].set(-0.008)
    from eags_slam_tpu.core.gaussians import GaussianParams
    from eags_slam_tpu.core.sh import rgb_to_sh
    params = GaussianParams(
        xyz=means, f_dc=rgb_to_sh(jnp.clip(col, 0, 1)),
        f_rest=jnp.zeros((means.shape[0], 15, 3)), log_scales=ls,
        quats=quats, opacity_logits=op)
    alive = jnp.ones((means.shape[0],), bool)

    finals = []
    for flag in (False, True):
        tcfg = T.TrackerConfig(iterations=20, enable_exposure=False,
                               tile_subset_frac=0.5, frozen_binning=True,
                               pose_grad_kernel=flag)
        rcfg = cfg._replace(backend="sorted")
        rel, _, stats = T.refine_pose(
            params, alive, rel0, gt_w2c, gt_color, gt_depth,
            jnp.asarray(20, jnp.int32), jnp.zeros(2), cam, rcfg, tcfg)
        finals.append(np.asarray(rel))
    # Same optimizer, same gradients (different float association):
    # trajectories agree to float noise.
    np.testing.assert_allclose(finals[0], finals[1], atol=5e-5)


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
