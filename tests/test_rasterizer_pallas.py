"""Pallas compositing kernel vs the dense reference (interpret mode on CPU)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.ops.rasterizer import RasterConfig, render
from eags_slam_tpu.ops.rasterizer_ref import render_dense

CAM = Camera(fx=60.0, fy=60.0, cx=23.5, cy=15.5, width=48, height=32)
CFG_P = RasterConfig(tile=16, dup_side=4, chunk=16, backend="pallas",
                     max_per_tile=256)
CFG_D = RasterConfig(tile=16, dup_side=4, tile_capacity=256, chunk=16,
                     backend="jnp")


def make_scene(rng, n=48):
    means = np.stack(
        [rng.uniform(-0.6, 0.6, n), rng.uniform(-0.4, 0.4, n),
         rng.uniform(1.0, 3.0, n)], axis=-1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return tuple(
        jnp.asarray(x)
        for x in (
            means, quats,
            np.log(rng.uniform(0.02, 0.08, (n, 3))).astype(np.float32),
            rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32),
            rng.uniform(0, 1, (n, 3)).astype(np.float32),
            np.eye(4, dtype=np.float32),
        )
    )


def test_pallas_forward_matches_dense(rng):
    args = make_scene(rng)
    out = render(*args, CAM, CFG_P)
    ref = render_dense(*args, CAM, CFG_D)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=1e-4)
    assert float(jnp.max(out.alpha)) > 0.5


def test_pallas_gradients_match_dense(rng):
    args = make_scene(rng, n=32)
    target = jnp.asarray(
        rng.uniform(0, 1, (CAM.height, CAM.width, 3)).astype(np.float32)
    )

    def loss(backend_cfg):
        def f(means, quats, ls, op, col, w2c):
            out = render(means, quats, ls, op, col, w2c, CAM, backend_cfg)
            return (
                jnp.mean(jnp.abs(out.color - target))
                + 0.1 * jnp.mean(out.depth)
                + 0.05 * jnp.mean(out.alpha)
            )
        return f

    g_p = jax.grad(loss(CFG_P), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_d = jax.grad(loss(CFG_D), argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["means", "quats", "log_scales", "opacity", "colors", "w2c"]
    for name, gp, gd in zip(names, g_p, g_d):
        gp, gd = np.asarray(gp), np.asarray(gd)
        scale = max(np.abs(gd).max(), 1e-6)
        np.testing.assert_allclose(gp, gd, atol=5e-3 * scale, err_msg=name)
        assert np.abs(gp).max() > 0, f"zero gradient for {name}"


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
