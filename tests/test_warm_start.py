"""Warm-start submap init (MapperConfig.init_warm_start).

VERDICT r3 next #4's "frustum re-anchor instead of re-seeding" option: a new
submap starts from the previous submap's frustum-visible gaussians (live
state is world-frame, so the copy needs no transform) and the boundary frame
seeds like a regular frame. The reference re-seeds every submap from scratch
(mapper.py:317-334); this is a flag-gated deviation whose iteration CAP is
unchanged — the early-stop while_loop just exits sooner on a warm map.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import eags_slam_tpu.core.gaussians as G
import eags_slam_tpu.slam.mapper as M
from eags_slam_tpu.config import load_config
from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM


def test_warm_visible_selection():
    cam = Camera(fx=50.0, fy=50.0, cx=31.5, cy=23.5, width=64, height=48)
    xyz = np.zeros((8, 3), np.float32)
    xyz[0] = [0.0, 0.0, 2.0]       # center, in front -> visible
    xyz[1] = [0.0, 0.0, -1.0]      # behind the camera
    xyz[2] = [10.0, 0.0, 2.0]      # u = 50*10/2+31.5 = 281 >> W+margin
    xyz[3] = [0.0, 0.0, 2.0]       # visible geometry but dead (alive=False)
    xyz[4] = [0.0, 0.0, 2.0]       # visible but transparent (low opacity)
    xyz[5] = [1.35, 0.0, 2.0]      # u = 65.25, inside the 5% margin (66.2)
    xyz[6] = [1.6, 0.0, 2.0]       # u = 71.5, outside the margin
    xyz[7] = [0.0, 0.0, 0.001]     # closer than the z floor
    params = G.empty_params(8)._replace(
        xyz=jnp.asarray(xyz),
        # empty_params defaults opacity_logits to -10 (transparent); row 4
        # stays at -10, the rest get logit(0.9).
        opacity_logits=jnp.full((8, 1), 2.2).at[4].set(-10.0),
    )
    alive = jnp.asarray([True, True, True, False, True, True, True, True])
    w2c = jnp.eye(4, dtype=jnp.float32)

    vis, n = M.warm_visible(params, alive, w2c, cam)
    np.testing.assert_array_equal(
        np.asarray(vis),
        [True, False, False, False, False, True, False, False],
    )
    assert int(n) == 2


def test_warm_rows_insert_roundtrip():
    """insert(empty, params, warm_visible(...)) compacts exactly the visible
    rows, any old/new capacity combination."""
    cam = Camera(fx=50.0, fy=50.0, cx=31.5, cy=23.5, width=64, height=48)
    rng = np.random.default_rng(3)
    n_old = 64
    xyz = np.stack([rng.uniform(-3, 3, n_old), rng.uniform(-2, 2, n_old),
                    rng.uniform(-1, 6, n_old)], -1).astype(np.float32)
    params = G.empty_params(n_old)._replace(
        xyz=jnp.asarray(xyz), opacity_logits=jnp.full((n_old, 1), 2.0),
        f_dc=jnp.asarray(rng.uniform(0, 1, (n_old, 3)).astype(np.float32)),
    )
    alive = jnp.asarray(rng.uniform(size=n_old) < 0.8)
    vis, n = M.warm_visible(params, alive, jnp.eye(4, dtype=jnp.float32), cam)
    n_vis = int(n)
    assert 0 < n_vis < n_old

    state = G.empty_state(G.bucket_for(n_vis, 256))
    state, n_ins = G.insert(state, params, vis)
    assert int(n_ins) == n_vis
    assert int(G.num_alive(state)) == n_vis
    # The inserted rows are exactly the visible subset (set equality on xyz).
    got = np.asarray(state.params.xyz)[np.asarray(state.alive)]
    want = xyz[np.asarray(vis)]
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_sorted, want_sorted, rtol=1e-6)


@pytest.mark.slow
def test_warm_start_with_lc(tmp_path):
    """Warm-started submaps share geometry with their predecessor; the LC
    pipeline (detection, registration, PGO, correction drain, T_prev_m
    rewrite) must behave on such a chain: closures detected on the revisit
    orbit, corrections tiny under gt tracking + identity registration."""
    config = load_config("configs/synthetic/base.yaml")
    config["data"].update({
        "output_path": str(tmp_path / "out"),
        "n_frames": 18,
        "orbit_speed": 1.0 / 18.0,
    })
    config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                          "cx": 47.5, "cy": 31.5})
    config["mapping"].update({
        "new_submap_every": 6, "iterations": 10,
        "new_submap_iterations": 15, "max_gaussians": 8192,
        "new_submap_points_num": 1500,
        "new_submap_gradient_points_num": 300,
        "new_frame_sample_size": 300,
        "submap_using_motion_heuristic": False,
        "init_warm_start": True, "warm_min_visible": 64,
    })
    config["tracking"]["gt_camera"] = True
    config["lc"] = {
        "enabled": True, "parallel": False, "min_interval": 2,
        "min_similarity": 0.5, "registration": "identity", "final": True,
        "capacity": 8192,
    }
    gslam = GaussianSLAM(config)
    try:
        gslam.run()
    finally:
        gslam.cleanup()
    assert gslam._warm_inited                    # warm path exercised
    lc = gslam.loop_closer
    assert lc is not None and len(lc.infos) >= 3
    assert lc.n_closures >= 1
    gt = np.stack([gslam.dataset.poses[i]
                   for i in range(len(gslam.dataset))])
    err = np.linalg.norm(
        gslam.estimated_c2ws[:, :3, 3] - gt[:, :3, 3], axis=-1)
    assert err.max() < 1e-3, err.max()


@pytest.mark.slow
def test_warm_start_e2e(tmp_path):
    """Full tiny run with warm-start inits on: boundaries take the warm
    path, trajectory/rendering stay within the fresh-protocol test bounds
    (test_e2e_synthetic.py)."""
    config = load_config("configs/synthetic/base.yaml")
    config["data"]["output_path"] = str(tmp_path / "out")
    config["data"]["n_frames"] = 12
    config["cam"].update({"H": 64, "W": 96, "fx": 80.0, "fy": 80.0,
                          "cx": 47.5, "cy": 31.5})
    config["mapping"].update({
        "new_submap_every": 6,
        "iterations": 60,
        "new_submap_iterations": 120,
        "max_gaussians": 8192,
        "new_submap_points_num": 2000,
        "new_submap_gradient_points_num": 500,
        "new_frame_sample_size": 500,
        "init_warm_start": True,
        "warm_min_visible": 64,
    })
    config["tracking"]["iterations"] = 20
    gslam = GaussianSLAM(config)
    try:
        report = gslam.run()
    finally:
        gslam.cleanup()
    assert report["frames"] == 12
    # The boundary at frame 6 had a populated map -> warm path fired.
    assert gslam._warm_inited
    ds = gslam.dataset
    gt = np.stack([ds.poses[i] for i in range(len(ds))])
    err = np.linalg.norm(
        gslam.estimated_c2ws[:, :3, 3] - gt[:, :3, 3], axis=-1)
    assert err.max() < 0.04, err
