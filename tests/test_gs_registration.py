"""Rendering-based submap registration recovers a known misalignment."""
import jax.numpy as jnp
import numpy as np
import pytest

from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.core.se3 import se3_exp
from eags_slam_tpu.lc.descriptor import GlobalDesc
from eags_slam_tpu.lc.solver import gaussian_registration
from eags_slam_tpu.ops.rasterizer import RasterConfig, render

CAM = Camera(fx=70.0, fy=70.0, cx=31.5, cy=23.5, width=64, height=48)
RCFG = RasterConfig(tile=16, dup_side=4, tile_capacity=128, chunk=32,
                    backend="jnp")


def _scene(rng, n=300):
    xyz = np.stack(
        [rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
         rng.uniform(1.5, 3.0, n)], -1,
    ).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    from eags_slam_tpu.core.sh import rgb_to_sh

    return {
        "xyz": xyz,
        "f_dc": np.asarray(
            rgb_to_sh(jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)))
        ),
        "f_rest": np.zeros((n, 15, 3), np.float32),
        "log_scales": np.log(rng.uniform(0.06, 0.15, (n, 3))).astype(np.float32),
        "quats": np.asarray(q),
        "opacity_logits": rng.uniform(1.5, 4.0, (n, 1)).astype(np.float32),
    }


def _views(gauss, c2ws):
    from eags_slam_tpu.core.sh import sh_to_rgb

    desc = GlobalDesc()
    views, descs = [], []
    for c2w in c2ws:
        out = render(
            jnp.asarray(gauss["xyz"]), jnp.asarray(gauss["quats"]),
            jnp.asarray(gauss["log_scales"]),
            jnp.asarray(gauss["opacity_logits"]),
            sh_to_rgb(jnp.asarray(gauss["f_dc"])),
            jnp.asarray(np.linalg.inv(c2w), dtype=jnp.float32), CAM, RCFG,
        )
        color = jnp.clip(out.color, 0, 1)
        depth = jnp.where(out.alpha > 0.5,
                          out.depth / jnp.maximum(out.alpha, 1e-6), 0.0)
        views.append({"c2w": c2w, "color": color, "depth": depth})
        descs.append(np.asarray(desc(color)))
    return views, np.stack(descs)


def test_gs_registration_recovers_offset(rng):
    src = _scene(rng)
    # Target submap: same content, but its ESTIMATED world placement is off
    # by a known small transform err (as drift would cause). Views taken from
    # slightly different cams.
    err = np.asarray(
        se3_exp(jnp.asarray([0.04, -0.03, 0.02, 0.01, -0.015, 0.01])),
        np.float64,
    )
    tgt = dict(src)
    tgt["xyz"] = (
        src["xyz"] @ np.linalg.inv(err)[:3, :3].T.astype(np.float32)
        + np.linalg.inv(err)[:3, 3].astype(np.float32)
    )
    c2w_a = np.eye(4)
    c2w_b = np.eye(4)
    c2w_b[0, 3] = 0.05
    # Source views see the source (true) map; target views believe the
    # drifted placement, so their stored poses carry the same drift.
    views_src, desc_src = _views(src, [c2w_a, c2w_b])
    views_tgt, desc_tgt = _views(
        tgt, [np.linalg.inv(err) @ c2w_a, np.linalg.inv(err) @ c2w_b]
    )

    res = gaussian_registration(
        src, tgt, views_src, views_tgt, desc_src, desc_tgt, CAM, RCFG,
        capacity=512, overlap_thre=0.1, top_views=1, pose_opt_iters=200,
        overlap_dist=0.2,
    )
    assert res.successful
    # Correction C should approximate err (align target back onto source).
    diff = res.transformation @ np.linalg.inv(err)
    t_err = np.linalg.norm(diff[:3, 3])
    r_err = np.degrees(
        np.arccos(np.clip((np.trace(diff[:3, :3]) - 1) / 2, -1, 1))
    )
    assert t_err < 0.03, (t_err, res.transformation)
    assert r_err < 1.5, r_err


def test_gs_registration_sorted_subset_localize(rng):
    """Sorted-backend registration with tile-subset localization segments
    (lc/solver._localize_batch subset_frac): the first restarts refine on
    the top-information tiles, the final segment full-image — the recovered
    correction must still match the injected drift."""
    rcfg = RasterConfig(tile=16, dup_side=4, chunk=16, backend="sorted",
                        seg_cap=256, bands=3, group=3)
    src = _scene(rng)
    err = np.asarray(
        se3_exp(jnp.asarray([0.03, -0.02, 0.015, 0.008, -0.01, 0.008])),
        np.float64,
    )
    tgt = dict(src)
    tgt["xyz"] = (
        src["xyz"] @ np.linalg.inv(err)[:3, :3].T.astype(np.float32)
        + np.linalg.inv(err)[:3, 3].astype(np.float32)
    )
    c2w_a = np.eye(4)
    views_src, desc_src = _views(src, [c2w_a])
    views_tgt, desc_tgt = _views(tgt, [np.linalg.inv(err) @ c2w_a])

    res = gaussian_registration(
        src, tgt, views_src, views_tgt, desc_src, desc_tgt, CAM, rcfg,
        capacity=512, overlap_thre=0.1, top_views=1, pose_opt_iters=200,
        overlap_dist=0.2, localize_restarts=4, localize_subset_frac=0.5,
    )
    assert res.successful
    diff = res.transformation @ np.linalg.inv(err)
    t_err = np.linalg.norm(diff[:3, 3])
    r_err = np.degrees(
        np.arccos(np.clip((np.trace(diff[:3, :3]) - 1) / 2, -1, 1))
    )
    assert t_err < 0.03, (t_err, res.transformation)
    assert r_err < 1.5, r_err


def test_gs_registration_overlap_gate(rng):
    src = _scene(rng)
    far = dict(src)
    far["xyz"] = src["xyz"] + 100.0
    res = gaussian_registration(
        src, far, [], [], np.zeros((0, 1024)), np.zeros((0, 1024)), CAM, RCFG,
        capacity=512,
    )
    assert not res.successful
    assert res.overlap < 0.2

def test_gs_registration_use_render_recovers_offset(rng):
    """use_render=True: localization targets are renders from the view's
    OWN submap (reference solver.py:155-168, ScanNet configs) — since the
    test views were generated by rendering the same maps, the recovered
    correction must match the raw-observation path."""
    src = _scene(rng)
    err = np.asarray(
        se3_exp(jnp.asarray([0.04, -0.03, 0.02, 0.01, -0.015, 0.01])),
        np.float64,
    )
    tgt = dict(src)
    tgt["xyz"] = (
        src["xyz"] @ np.linalg.inv(err)[:3, :3].T.astype(np.float32)
        + np.linalg.inv(err)[:3, 3].astype(np.float32)
    )
    c2w_a = np.eye(4)
    views_src, desc_src = _views(src, [c2w_a])
    views_tgt, desc_tgt = _views(tgt, [np.linalg.inv(err) @ c2w_a])

    res = gaussian_registration(
        src, tgt, views_src, views_tgt, desc_src, desc_tgt, CAM, RCFG,
        capacity=512, overlap_thre=0.1, top_views=1, pose_opt_iters=200,
        overlap_dist=0.2, use_render=True, base_lr=1e-3,
    )
    assert res.successful
    diff = res.transformation @ np.linalg.inv(err)
    t_err = np.linalg.norm(diff[:3, 3])
    r_err = np.degrees(
        np.arccos(np.clip((np.trace(diff[:3, :3]) - 1) / 2, -1, 1))
    )
    assert t_err < 0.03, (t_err, res.transformation)
    assert r_err < 1.5, r_err


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
