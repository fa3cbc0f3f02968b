"""Half-res submap-init phase (MapperConfig.init_halfres_frac).

The first fraction of new-submap iterations optimizes against a
2x-downsampled boundary keyframe, then the tail runs full-res
(gaussian_slam.map_frame). Quality must match the all-full-res init within
a small margin, and the LC descriptor must come from the FULL-res frame.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eags_slam_tpu.core import gaussians as G
from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.core.sh import sh_to_rgb
from eags_slam_tpu.ops.losses import psnr
from eags_slam_tpu.ops.rasterizer import RasterConfig, render
from eags_slam_tpu.slam import mapper as M

CAM = Camera(fx=40.0, fy=40.0, cx=23.5, cy=15.5, width=48, height=32)
RCFG = RasterConfig(tile=16, dup_side=4, tile_capacity=128, chunk=32,
                    backend="jnp")
MCFG = M.MapperConfig(
    new_submap_points_num=800, new_submap_gradient_points_num=200,
    new_frame_sample_size=400, new_points_radius=1e-7, alpha_thre=0.6,
    pruning_thre=0.1, max_keyframes=4, kf_block=5,
)


def _plane_frame():
    """Slanted textured plane: smooth depth + banded color."""
    u, v = np.meshgrid(np.arange(48), np.arange(32))
    depth = (1.5 + 0.2 * u / 48 + 0.1 * v / 32).astype(np.float32)
    color = np.stack([
        0.3 + 0.4 * np.sin(u / 10.0) ** 2,
        0.2 + 0.5 * (v / 32.0),
        0.5 + 0.3 * np.cos((u + v) / 16.0),
    ], -1).astype(np.float32)
    return jnp.asarray(color), jnp.asarray(depth)


def _seed(key):
    color, depth = _plane_frame()
    st = G.empty_state(2048)
    wb = -(-CAM.width // 8)
    edge_bits = jnp.zeros((CAM.height, wb), jnp.uint8)
    rows, row_valid, n_valid, _ = M.seed_rows(
        st.params, st.alive, key, color, depth,
        jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
        edge_bits, CAM, RCFG, MCFG, True, True, True, False,
    )
    return st, rows, row_valid, color, depth


def _final_psnr(state, color):
    out = render(
        state.params.xyz, state.params.quats, state.params.log_scales,
        state.params.opacity_logits, sh_to_rgb(state.params.f_dc),
        jnp.eye(4, dtype=jnp.float32), CAM, RCFG, alive=state.alive,
    )
    return float(psnr(jnp.clip(out.color, 0, 1), color))


def test_halfres_init_matches_fullres_quality(rng):
    key = jnp.asarray(np.array([7, 9], np.uint32))
    iters = 160

    # All-full-res init (reference protocol).
    st, rows, row_valid, color, depth = _seed(key)
    kfs = M.push_keyframe(
        M.empty_keyframes(MCFG.max_keyframes, CAM), 0, color, depth,
        jnp.eye(4, dtype=jnp.float32), jnp.zeros(2),
    )
    st_full, _, _, _, desc_full = M.insert_and_optimize(
        st, rows, row_valid, kfs, jnp.asarray(1, jnp.int32), key, iters,
        CAM, RCFG, MCFG,
    )
    psnr_full = _final_psnr(st_full, color)

    # Half-res phase (25% half + 75% full, the realistic sweep setting —
    # a 50/50 split measurably costs >1 dB at this scale) from the same
    # seeds.
    iters_half = iters // 4
    st, rows, row_valid, color, depth = _seed(key)
    kfs_half = M.halfres_single_kf(
        color, depth, jnp.eye(4, dtype=jnp.float32), jnp.zeros(2))
    assert kfs_half.color.shape == (1, 16, 24, 3)
    assert kfs_half.depth.shape == (1, 16, 24)
    st_mid, _, _, _, _ = M.insert_and_optimize(
        st, rows, row_valid, kfs_half, jnp.asarray(1, jnp.int32), key,
        iters_half, CAM.scaled(1), RCFG, MCFG,
    )
    kfs = M.push_keyframe(
        M.empty_keyframes(MCFG.max_keyframes, CAM), 0, color, depth,
        jnp.eye(4, dtype=jnp.float32), jnp.zeros(2),
    )
    st_half, losses, n_alive, desc_half = M.optimize_and_describe(
        st_mid, kfs, jnp.asarray(1, jnp.int32), key, iters - iters_half,
        CAM, RCFG, MCFG,
    )
    psnr_half = _final_psnr(st_half, color)

    assert int(n_alive) > 0
    assert np.isfinite(np.asarray(losses)).all()
    # Descriptor comes from the full-res frame: identical input -> identical
    # descriptor as the all-full-res path.
    np.testing.assert_allclose(
        np.asarray(desc_half), np.asarray(desc_full), rtol=1e-5, atol=1e-5)
    # Quality parity within 1 dB (half-res phase only warm-starts the tail).
    assert psnr_half > psnr_full - 1.0, (psnr_half, psnr_full)
    assert psnr_full > 15.0, psnr_full


def test_halfres_depth_holes_stay_holes():
    color, depth = _plane_frame()
    depth = depth.at[8:12, 8:12].set(0.0)
    kfs = M.halfres_single_kf(color, depth, jnp.eye(4, dtype=jnp.float32),
                              jnp.zeros(2))
    # Full-res hole rows/cols 8..11 cover half-res blocks 4..5 exactly ->
    # all-invalid blocks stay 0; the neighboring block keeps its valid mean.
    assert float(kfs.depth[0, 4, 4]) == 0.0
    assert float(kfs.depth[0, 5, 5]) == 0.0
    assert float(kfs.depth[0, 3, 3]) > 0.0


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
