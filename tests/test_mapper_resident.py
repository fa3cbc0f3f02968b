"""Resident-sorted mapping (PERF.md roadmap #4): correctness vs the
per-iteration-sampling path.

The resident loop permutes params/Adam/checkpoint state into the sampled
keyframe's center-tile order once per `kf_block` iterations and renders with
zero per-iteration gather/scatter. With the keyframe pinned (first 5 iters
are always keyframe 0, reference mapper.py:150) and few iterations, it must
reproduce the regular path's result almost exactly: the only semantic
difference is frozen segment membership within a block, inert while centers
barely move.
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
    u, v = np.meshgrid(np.arange(CAM.width), np.arange(CAM.height))
    depth = 2.0 + 0.3 * np.sin(u / 11.0) * np.cos(v / 7.0)
    color = np.stack(
        [0.5 + 0.5 * np.sin(u / 5.0), 0.5 + 0.5 * np.cos(v / 9.0),
         np.full_like(u, 0.4, dtype=float)], axis=-1,
    ).astype(np.float32)
    return jnp.asarray(color), jnp.asarray(depth.astype(np.float32))


def _seeded_state(color, depth, n=1500, rng_seed=0):
    pts = backproject(CAM, depth).reshape(-1, 3)
    rgb = color.reshape(-1, 3)
    key = jax.random.PRNGKey(rng_seed)
    sel = jax.random.permutation(key, pts.shape[0])[:n]
    state = G.empty_state(2048)
    rows = G.point_rows(pts[sel], rgb[sel], jnp.full((n,), 2e-3),
                        jnp.full((n,), 0.5))
    state, _ = G.insert(state, rows, jnp.ones(n, bool))
    return state


def _optimize(state, color, depth, mcfg, iters, seed=0):
    kfs = M.empty_keyframes(mcfg.max_keyframes, CAM)
    kfs = M.push_keyframe(kfs, 0, color, depth, jnp.eye(4), jnp.zeros(2))
    out_state, aux = M.optimize_submap(
        state, kfs, jnp.asarray(1, jnp.int32),
        jax.random.PRNGKey(seed), iters, CAM, RCFG, mcfg,
    )
    return out_state, aux


def _psnr_of(state, color):
    p = state.params
    out = render(p.xyz, p.quats, p.log_scales, p.opacity_logits,
                 sh_to_rgb(p.f_dc), jnp.eye(4), CAM, RCFG, alive=state.alive)
    return float(psnr(out.color, color))


def test_resident_matches_regular_when_keyframe_pinned(scene):
    """4 iterations, single keyframe (pinned): resident == regular modulo
    discontinuity noise. The kernel inputs at a block start are bit-identical
    (verified during development: attrs/seg tables maxdiff 0.0); the residual
    differences come from jit-fusion FP noise amplified by the alpha_min
    inclusion cutoff and, within a block, frozen segment membership — both
    affect isolated gaussians, so the assertions are quantile-based, not
    max-based (a permutation bug would scramble nearly every row)."""
    color, depth = scene
    mc_reg = M.MapperConfig(max_keyframes=4, kf_block=0)
    mc_res = M.MapperConfig(max_keyframes=4, kf_block=4)

    # 600 gaussians over 24 tiles: band occupancy (~75 + alignment lead)
    # stays far below seg_cap=256, so the re-sort-vs-frozen truncation-victim
    # differences of a dense scene cannot occur here — any row-level mismatch
    # beyond discontinuity noise would be a real permutation bug.
    s0 = _seeded_state(color, depth, n=600)
    s_reg, aux_reg = _optimize(s0, color, depth, mc_reg, iters=4)
    s_res, aux_res = _optimize(s0, color, depth, mc_res, iters=4)

    l_res = np.asarray(aux_res["losses"])
    l_reg = np.asarray(aux_reg["losses"])
    # Iteration 0 is computed on identical layouts -> near-exact.
    np.testing.assert_allclose(l_res[0], l_reg[0], rtol=1e-4)
    np.testing.assert_allclose(l_res, l_reg, rtol=2e-2)
    assert np.mean(np.asarray(s_res.alive) == np.asarray(s_reg.alive)) > 0.995
    for a, b in zip(jax.tree_util.tree_leaves(s_res.params),
                    jax.tree_util.tree_leaves(s_reg.params)):
        a, b = np.asarray(a), np.asarray(b)
        frac_bad = np.mean(np.abs(a - b) > 1e-3 + 1e-3 * np.abs(b))
        assert frac_bad < 0.01, frac_bad
    for a, b in zip(jax.tree_util.tree_leaves(s_res.adam.mu),
                    jax.tree_util.tree_leaves(s_reg.adam.mu)):
        a, b = np.asarray(a), np.asarray(b)
        frac_bad = np.mean(np.abs(a - b) > 1e-3 + 1e-2 * np.abs(b))
        assert frac_bad < 0.01, frac_bad


def test_resident_reaches_regular_quality(scene):
    """Longer run with block-resampled keyframes: quality parity with the
    reference per-iteration sampling schedule (within SGD noise)."""
    color, depth = scene
    mc_reg = M.MapperConfig(max_keyframes=4, kf_block=0)
    mc_res = M.MapperConfig(max_keyframes=4, kf_block=8)

    s_reg, _ = _optimize(_seeded_state(color, depth), color, depth, mc_reg,
                         iters=64)
    s_res, _ = _optimize(_seeded_state(color, depth), color, depth, mc_res,
                         iters=64)

    p_reg = _psnr_of(s_reg, color)
    p_res = _psnr_of(s_res, color)
    assert p_reg > 23, p_reg
    assert p_res > p_reg - 0.75, (p_res, p_reg)


def test_freeze_tiles_quality_parity(scene):
    """Adaptive converged-tile freezing (PERF.md round 3): with the last
    ~60% of iterations optimizing only the top-residual quarter of tiles,
    final quality must stay within SGD noise of the full-image run —
    frozen tiles are the converged ones, whose gradients are ~zero."""
    color, depth = scene
    mc_full = M.MapperConfig(max_keyframes=4, kf_block=8)
    mc_frz = M.MapperConfig(max_keyframes=4, kf_block=8,
                            freeze_frac=0.25, freeze_after=0.4)

    s_full, _ = _optimize(_seeded_state(color, depth), color, depth,
                          mc_full, iters=64)
    s_frz, aux = _optimize(_seeded_state(color, depth), color, depth,
                           mc_frz, iters=64)

    p_full = _psnr_of(s_full, color)
    p_frz = _psnr_of(s_frz, color)
    assert p_full > 23, p_full
    assert p_frz > p_full - 1.0, (p_frz, p_full)
    # The freeze phase ran: subset losses (high-residual tiles only) are
    # recorded in the tail and differ from the full-image scale.
    losses = np.asarray(aux["losses"])
    assert losses.shape[0] == 64 and np.all(np.isfinite(losses[:, 0]))


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
