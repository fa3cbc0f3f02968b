"""Device-mesh pipeline integration (VERDICT r1 #3).

On the 8-device virtual CPU mesh: data-parallel submap optimization
(shard_map over keyframes, pmean gradients) must reach single-device
quality, and the full SLAM loop with `use_mesh: true` must match the
single-device trajectory within tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eags_slam_tpu.config import load_config
from eags_slam_tpu.core import gaussians as G
from eags_slam_tpu.core.camera import Camera, backproject
from eags_slam_tpu.core.sh import sh_to_rgb
from eags_slam_tpu.ops.losses import psnr
from eags_slam_tpu.ops.rasterizer import RasterConfig, render
from eags_slam_tpu.parallel.mesh import make_mesh
from eags_slam_tpu.slam import mapper as M

CAM = Camera(fx=80.0, fy=80.0, cx=47.5, cy=31.5, width=96, height=64)
RCFG = RasterConfig(tile=16, dup_side=4, tile_capacity=256, chunk=16,
                    backend="jnp")


def _scene(rng):
    u, v = np.meshgrid(np.arange(CAM.width), np.arange(CAM.height))
    depth = 2.0 + 0.3 * np.sin(u / 11.0) * np.cos(v / 7.0)
    color = np.stack(
        [0.5 + 0.5 * np.sin(u / 5.0), 0.5 + 0.5 * np.cos(v / 9.0),
         np.full_like(u, 0.4, dtype=float)], axis=-1,
    ).astype(np.float32)
    return jnp.asarray(color), jnp.asarray(depth.astype(np.float32))


def _state(color, depth):
    pts = backproject(CAM, depth).reshape(-1, 3)
    rgb = color.reshape(-1, 3)
    sel = jax.random.permutation(jax.random.PRNGKey(0), pts.shape[0])[:2000]
    state = G.empty_state(4096)
    rows = G.point_rows(pts[sel], rgb[sel], jnp.full((2000,), 2e-3),
                        jnp.full((2000,), 0.5))
    state, _ = G.insert(state, rows, jnp.ones(2000, bool))
    return state


def test_dp_optimize_matches_single_device(rng):
    color, depth = _scene(rng)
    mcfg = M.MapperConfig(max_keyframes=4)
    kfs = M.empty_keyframes(4, CAM)
    kfs = M.push_keyframe(kfs, 0, color, depth, jnp.eye(4), jnp.zeros(2))

    def run(mesh):
        st, _ = M.optimize_submap(
            _state(color, depth), kfs, jnp.asarray(1, jnp.int32),
            jax.random.PRNGKey(0), 60, CAM, RCFG, mcfg, mesh=mesh,
        )
        p = st.params
        out = render(p.xyz, p.quats, p.log_scales, p.opacity_logits,
                     sh_to_rgb(p.f_dc), jnp.eye(4), CAM, RCFG, alive=st.alive)
        return float(psnr(out.color, color))

    p_single = run(None)
    p_mesh = run(make_mesh(8))
    assert p_single > 23, p_single
    # DP consumes 8 views/step of the same keyframe here -> at least equal.
    assert p_mesh > p_single - 1.0, (p_mesh, p_single)


@pytest.mark.slow
def test_mesh_e2e_matches_single_device(tmp_path):
    """Full SLAM loop with the mesh on vs off: trajectories agree."""
    def run(use_mesh, out):
        config = load_config("configs/synthetic/base.yaml")
        config["use_mesh"] = use_mesh
        config["data"].update({"output_path": str(out), "n_frames": 6})
        config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                              "cx": 47.5, "cy": 31.5})
        config["mapping"].update({
            "new_submap_every": 10, "iterations": 12,
            "new_submap_iterations": 20, "max_gaussians": 8192,
            "new_submap_points_num": 1500,
            "new_submap_gradient_points_num": 300,
            "new_frame_sample_size": 300,
            "submap_using_motion_heuristic": False,
        })
        config["lc"] = {"enabled": False}
        from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM

        gslam = GaussianSLAM(config)
        try:
            gslam.run()
        finally:
            gslam.cleanup()
        if use_mesh:
            assert gslam.mesh is not None, "mesh was not constructed"
        gt = np.stack([gslam.dataset.poses[i]
                       for i in range(len(gslam.dataset))])
        err = np.linalg.norm(
            gslam.estimated_c2ws[:, :3, 3] - gt[:, :3, 3], axis=-1
        )
        return float(err.max())

    e_single = run(False, tmp_path / "single")
    e_mesh = run(True, tmp_path / "mesh")
    assert e_single < 0.05, e_single
    assert e_mesh < max(2.0 * e_single, 0.05), (e_mesh, e_single)
