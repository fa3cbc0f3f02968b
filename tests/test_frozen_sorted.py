"""Frozen-sorted (v2) tracking path: parity with regular render + pose grads.

Mirrors test_frozen_binning.py for the center-tile-sorted backend. Unlike
v1 frozen binning, the v2 kernel re-ranks depths per iteration, so results
under pose motion should match the regular render even more closely (only
segment membership is frozen).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.core.se3 import se3_exp
from eags_slam_tpu.ops.rasterizer import (RasterConfig, freeze_sorted,
                                          render, render_frozen_sorted)

CAM = Camera(fx=60.0, fy=60.0, cx=23.5, cy=15.5, width=48, height=32)
CFG = RasterConfig(tile=16, dup_side=4, chunk=16, backend="sorted",
                   seg_cap=256, bands=3, group=2)


def make_scene(rng, n=48):
    means = np.stack(
        [rng.uniform(-0.6, 0.6, n), rng.uniform(-0.4, 0.4, n),
         rng.uniform(1.0, 3.0, n)], axis=-1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return (
        jnp.asarray(means), jnp.asarray(quats),
        jnp.asarray(np.log(rng.uniform(0.02, 0.07, (n, 3))).astype(np.float32)),
        jnp.asarray(rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
    )


def test_frozen_sorted_matches_regular_at_init_pose(rng):
    args = make_scene(rng)
    w2c = jnp.eye(4)
    fs = freeze_sorted(*args, w2c, CAM, CFG)
    out_f = render_frozen_sorted(fs, w2c, CAM, CFG)
    out_r = render(*args, w2c, CAM, CFG)
    np.testing.assert_allclose(np.asarray(out_f.color), np.asarray(out_r.color),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f.depth), np.asarray(out_r.depth),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_f.alpha), np.asarray(out_r.alpha),
                               atol=1e-4)


def test_frozen_sorted_close_under_small_pose_shift(rng):
    args = make_scene(rng)
    w2c0 = jnp.eye(4)
    fs = freeze_sorted(*args, w2c0, CAM, CFG)
    w2c1 = jnp.asarray(se3_exp(jnp.asarray([0.03, 0.0, 0.0, 0.0, 0.0, 0.0])))
    out_f = render_frozen_sorted(fs, w2c1 @ w2c0, CAM, CFG)
    out_r = render(*args, w2c1 @ w2c0, CAM, CFG)
    diff = np.abs(np.asarray(out_f.color) - np.asarray(out_r.color))
    assert diff.mean() < 5e-3, diff.mean()


def test_frozen_sorted_pose_gradients(rng):
    args = make_scene(rng, n=32)
    w2c = jnp.eye(4)
    fs = freeze_sorted(*args, w2c, CAM, CFG)
    target = render_frozen_sorted(fs, w2c, CAM, CFG).color

    def loss(tau):
        T = se3_exp(tau) @ w2c
        out = render_frozen_sorted(fs, T, CAM, CFG)
        return jnp.mean((out.color - target) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.zeros(6)))
    assert np.isfinite(g).all()
    eps = 1e-3
    for i in range(6):
        e = np.zeros(6, np.float32)
        e[i] = eps
        fd = (float(loss(jnp.asarray(e))) - float(loss(jnp.asarray(-e)))) / (2 * eps)
        assert abs(g[i] - fd) < 0.05 * max(abs(fd), 1e-3) + 1e-5, (i, g[i], fd)


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
