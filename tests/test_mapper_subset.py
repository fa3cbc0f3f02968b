"""Tile-subset stochastic mapping reaches full-image optimization quality.

PERF.md roadmap item / VERDICT r1 #9: optimizing a random tile subset per
iteration must match the full-image PSNR on the synthetic scene (the
gradient is an unbiased estimate; only the SGD noise differs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eags_slam_tpu.core import gaussians as G
from eags_slam_tpu.core.camera import Camera, backproject
from eags_slam_tpu.core.sh import sh_to_rgb
from eags_slam_tpu.ops.losses import psnr
from eags_slam_tpu.ops.rasterizer import RasterConfig, render
from eags_slam_tpu.slam import mapper as M

CAM = Camera(fx=80.0, fy=80.0, cx=47.5, cy=31.5, width=96, height=64)
RCFG = RasterConfig(tile=16, dup_side=4, chunk=16, backend="sorted",
                    seg_cap=256, bands=3, group=2)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    # A colored fronto-parallel wall with depth bumps.
    u, v = np.meshgrid(np.arange(CAM.width), np.arange(CAM.height))
    depth = 2.0 + 0.3 * np.sin(u / 11.0) * np.cos(v / 7.0)
    color = np.stack(
        [0.5 + 0.5 * np.sin(u / 5.0), 0.5 + 0.5 * np.cos(v / 9.0),
         np.full_like(u, 0.4, dtype=float)], axis=-1,
    ).astype(np.float32)
    return jnp.asarray(color), jnp.asarray(depth.astype(np.float32))


def _seeded_state(color, depth, rng_seed=0):
    pts = backproject(CAM, depth).reshape(-1, 3)
    rgb = color.reshape(-1, 3)
    key = jax.random.PRNGKey(rng_seed)
    sel = jax.random.permutation(key, pts.shape[0])[:2000]
    state = G.empty_state(4096)
    rows = G.point_rows(pts[sel], rgb[sel], jnp.full((2000,), 2e-3),
                        jnp.full((2000,), 0.5))
    state, _ = G.insert(state, rows, jnp.ones(2000, bool))
    return state


def _optimize(state, color, depth, mcfg, iters=80, seed=0):
    kfs = M.empty_keyframes(mcfg.max_keyframes, CAM)
    kfs = M.push_keyframe(kfs, 0, color, depth, jnp.eye(4), jnp.zeros(2))
    out_state, _ = M.optimize_submap(
        state, kfs, jnp.asarray(1, jnp.int32),
        jax.random.PRNGKey(seed), iters, CAM, RCFG, mcfg,
    )
    return out_state


def _psnr_of(state, color):
    p = state.params
    out = render(p.xyz, p.quats, p.log_scales, p.opacity_logits,
                 sh_to_rgb(p.f_dc), jnp.eye(4), CAM, RCFG, alive=state.alive)
    return float(psnr(out.color, color))


def test_subset_matches_full_psnr_at_visit_parity(scene):
    """Subset SGD reaches full-image quality at VISIT parity.

    Measured reality (PERF.md): a tile needs ~the same number of visits
    whether visited every iteration (full) or 1-in-3 iterations (subset of
    8/24 tiles at 3x iterations). The gradient estimate is unbiased; the
    feature is therefore a scheduling knob, not a free speedup — it only
    pays when per-iteration FIXED costs dominate kernel work (they do not
    after rasterizer v2), so `tile_subset` defaults to 0.
    """
    color, depth = scene
    # kf_block=0 on BOTH sides: the claim is subset-vs-full under the SAME
    # (per-iteration-sampling) schedule; the resident-sorted path converges
    # slightly better at equal iterations and would skew the baseline.
    mc_full = M.MapperConfig(max_keyframes=4, tile_subset=0, kf_block=0)
    mc_sub = M.MapperConfig(max_keyframes=4, tile_subset=8)  # 8 of 24 tiles

    s_full = _optimize(_seeded_state(color, depth), color, depth, mc_full,
                       iters=80)
    s_sub = _optimize(_seeded_state(color, depth), color, depth, mc_sub,
                      iters=240)

    p_full = _psnr_of(s_full, color)
    p_sub = _psnr_of(s_sub, color)
    assert p_full > 24, p_full
    assert p_sub > p_full - 1.0, (p_sub, p_full)


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
