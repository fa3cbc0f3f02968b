import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.ops.rasterizer import RasterConfig, render
from eags_slam_tpu.ops.rasterizer_ref import render_dense

CAM = Camera(fx=60.0, fy=60.0, cx=23.5, cy=15.5, width=48, height=32)
CFG = RasterConfig(tile=16, dup_side=4, tile_capacity=128, chunk=32)


def make_scene(rng, n=64, seed_colors=True):
    means = np.stack(
        [
            rng.uniform(-0.6, 0.6, n),
            rng.uniform(-0.4, 0.4, n),
            rng.uniform(1.0, 3.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    log_scales = np.log(rng.uniform(0.02, 0.08, (n, 3))).astype(np.float32)
    opac = rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    return tuple(jnp.asarray(x) for x in (means, quats, log_scales, opac, colors, w2c))


def test_forward_matches_dense(rng):
    args = make_scene(rng)
    out = render(*args, CAM, CFG)
    ref = render_dense(*args, CAM, CFG)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.radii), np.asarray(ref.radii))
    # Scene is in front of the camera: something must be rendered.
    assert float(jnp.max(out.alpha)) > 0.5


def test_gradients_match_dense(rng):
    args = make_scene(rng, n=48)
    target = jnp.asarray(rng.uniform(0, 1, (CAM.height, CAM.width, 3)).astype(np.float32))

    def loss_tiled(means, quats, ls, op, col, w2c):
        out = render(means, quats, ls, op, col, w2c, CAM, CFG)
        return jnp.mean(jnp.abs(out.color - target)) + 0.1 * jnp.mean(out.depth)

    def loss_dense(means, quats, ls, op, col, w2c):
        out = render_dense(means, quats, ls, op, col, w2c, CAM, CFG)
        return jnp.mean(jnp.abs(out.color - target)) + 0.1 * jnp.mean(out.depth)

    g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["means", "quats", "log_scales", "opacity", "colors", "w2c"]
    for name, gt, gd in zip(names, g_tiled, g_dense):
        gt, gd = np.asarray(gt), np.asarray(gd)
        scale = max(np.abs(gd).max(), 1e-6)
        np.testing.assert_allclose(gt, gd, atol=3e-3 * scale, err_msg=name)
        assert np.abs(gt).max() > 0, f"zero gradient for {name}"


def test_pose_gradient_finite_diff(rng):
    # Pose gradients (the -w-pose rasterizer capability) via tangent-space FD.
    from eags_slam_tpu.core import se3

    args = make_scene(rng, n=32)
    means, quats, ls, op, col, w2c = args
    target = render(*args, CAM, CFG).color

    def loss(tau):
        T = se3.se3_exp(tau) @ w2c
        out = render(means, quats, ls, op, col, T, CAM, CFG)
        return jnp.mean((out.color - target) ** 2)

    tau0 = jnp.zeros(6)
    g = np.asarray(jax.grad(loss)(tau0))
    eps = 1e-3
    for i in range(6):
        e = np.zeros(6, np.float32)
        e[i] = eps
        fd = (float(loss(jnp.asarray(e))) - float(loss(jnp.asarray(-e)))) / (2 * eps)
        assert abs(g[i] - fd) < 0.05 * max(abs(fd), 1e-3) + 1e-5, (i, g[i], fd)


def test_alive_mask():
    n = 16
    means = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1))
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    ls = jnp.full((n, 3), np.log(0.1))
    op = jnp.full((n, 1), 5.0)
    col = jnp.ones((n, 3))
    w2c = jnp.eye(4)
    alive = jnp.zeros(n, bool)
    out = render(means, quats, ls, op, col, w2c, CAM, CFG, alive=alive)
    assert float(jnp.max(out.alpha)) == 0.0
    out2 = render(means, quats, ls, op, col, w2c, CAM, CFG, alive=~alive)
    assert float(jnp.max(out2.alpha)) > 0.9


def test_empty_scene_is_black():
    n = 8
    means = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1))  # behind camera
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    out = render(
        means, quats, jnp.full((n, 3), -3.0), jnp.zeros((n, 1)),
        jnp.ones((n, 3)), jnp.eye(4), CAM, CFG,
    )
    assert float(jnp.max(out.alpha)) == 0.0
    assert np.all(np.asarray(out.radii) == 0)


def test_depth_ordering_occlusion():
    # A near opaque red gaussian in front of a far green one: pixel is red.
    means = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    ls = jnp.full((2, 3), np.log(0.3))
    op = jnp.full((2, 1), 8.0)  # sigmoid ~ 1
    col = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    out = render(means, quats, ls, op, col, jnp.eye(4), CAM, CFG)
    center = np.asarray(out.color[16, 24])
    assert center[0] > 0.9 and center[1] < 0.1
    d = float(out.depth[16, 24] / out.alpha[16, 24])
    assert abs(d - 1.0) < 0.1


def test_tile_capacity_overflow_drops_deepest(rng):
    # More gaussians in one tile than capacity: output should match dense
    # rendering restricted to the front-most `capacity` gaussians.
    cfg = RasterConfig(tile=16, dup_side=4, tile_capacity=32, chunk=16)
    n = 64
    means = np.concatenate(
        [
            np.zeros((n, 1), np.float32),
            np.zeros((n, 1), np.float32),
            np.linspace(1.0, 4.0, n, dtype=np.float32)[:, None],
        ],
        axis=1,
    )
    means[:, 0] = rng.uniform(-0.02, 0.02, n)
    args = (
        jnp.asarray(means),
        jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        jnp.full((n, 3), np.log(0.01)),
        jnp.full((n, 1), -2.0),  # low opacity so nothing saturates
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        jnp.eye(4),
    )
    out = render(*args, CAM, cfg)
    assert np.isfinite(np.asarray(out.color)).all()
    assert float(jnp.max(out.alpha)) > 0.0


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
