"""Loop-closure components: descriptor, PGO, ICP registration."""
import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.core.se3 import se3_exp
from eags_slam_tpu.lc.descriptor import GlobalDesc
from eags_slam_tpu.lc.pgo import (PoseGraph, optimize_pose_graph,
                                  scalar_info)
from eags_slam_tpu.lc.solver import icp_registration


def test_descriptor_similarity(rng):
    desc = GlobalDesc()
    # Structured content (real frames are structured; pure noise
    # decorrelates under shift once the DC component is removed).
    u, v = np.meshgrid(np.arange(64), np.arange(48))
    img = np.stack([
        0.5 + 0.4 * np.sin(0.3 * u),
        0.5 + 0.4 * np.sin(0.25 * v + 1.0),
        ((u // 8 + v // 8) % 2).astype(np.float32),
    ], axis=-1).astype(np.float32)
    d1 = np.asarray(desc(img))
    assert abs(np.linalg.norm(d1) - 1.0) < 1e-4
    # Same image -> sim 1; slightly shifted -> still high; different -> lower.
    d2 = np.asarray(desc(np.roll(img, 2, axis=1)))
    other = np.linspace(0, 1, 64)[None, :, None] * np.ones((48, 1, 3), np.float32)
    d3 = np.asarray(desc(other))
    assert d1 @ d2 > 0.8
    assert d1 @ d2 > d1 @ d3 + 0.2


def test_pgo_corrects_drift(rng):
    """Chain of 6 nodes with drifted odometry + one exact loop edge 0->5."""
    n = 6
    true_poses = [np.eye(4)]
    step = np.asarray(se3_exp(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.2, 0.0])))
    for i in range(1, n):
        true_poses.append(true_poses[-1] @ step)
    true_poses = np.stack(true_poses)

    # Estimated poses: accumulate noisy odometry.
    est = [np.eye(4)]
    noises = []
    for i in range(1, n):
        noise = np.asarray(
            se3_exp(jnp.asarray(0.03 * rng.normal(size=6).astype(np.float32)))
        )
        noises.append(noise)
        est.append(est[-1] @ step @ noise)
    est = np.stack(est)

    edges_ij = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
    # Odometry edges measure the (noisy) relative transform actually
    # accumulated; the loop edge measures the TRUE relative transform.
    edges_T = [np.linalg.inv(est[i]) @ est[i + 1] for i in range(n - 1)]
    edges_T.append(np.linalg.inv(true_poses[0]) @ true_poses[n - 1])
    info = jnp.stack([scalar_info(1.0)] * (n - 1) + [scalar_info(5.0)])

    graph = PoseGraph(
        poses=jnp.asarray(est, dtype=jnp.float32),
        edges_ij=jnp.asarray(np.asarray(edges_ij, np.int32)),
        edges_T=jnp.asarray(np.stack(edges_T), dtype=jnp.float32),
        edges_info=info.astype(jnp.float32),
        edges_valid=jnp.ones((len(edges_ij),), bool),
        edges_is_loop=jnp.asarray([False] * (n - 1) + [True]),
    )
    corrected = np.asarray(optimize_pose_graph(graph, iters=15))

    err_before = np.linalg.norm(est[n - 1][:3, 3] - true_poses[n - 1][:3, 3])
    err_after = np.linalg.norm(
        corrected[n - 1][:3, 3] - true_poses[n - 1][:3, 3]
    )
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_icp_registration(rng):
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    T = np.asarray(se3_exp(jnp.asarray([0.05, -0.03, 0.02, 0.02, 0.03, -0.01])))
    # Target cloud = source misaligned by inv(T): correction should be ~T.
    tgt = pts @ np.linalg.inv(T)[:3, :3].T + np.linalg.inv(T)[:3, 3]
    res = icp_registration({"xyz": pts}, {"xyz": tgt.astype(np.float32)})
    assert res.successful
    err = np.linalg.norm(res.transformation - T)
    assert err < 0.02, (err, res.transformation, T)


def _chain_graph(rng, n=6, bad_loop=False):
    step = np.asarray(se3_exp(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.2, 0.0])))
    true_poses = [np.eye(4)]
    for i in range(1, n):
        true_poses.append(true_poses[-1] @ step)
    true_poses = np.stack(true_poses)
    est = [np.eye(4)]
    for i in range(1, n):
        noise = np.asarray(
            se3_exp(jnp.asarray(0.02 * rng.normal(size=6).astype(np.float32)))
        )
        est.append(est[-1] @ step @ noise)
    est = np.stack(est)
    edges_ij = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
    edges_T = [np.linalg.inv(est[i]) @ est[i + 1] for i in range(n - 1)]
    if bad_loop:
        wrong = np.asarray(se3_exp(jnp.asarray([1.5, -1.0, 0.8, 0.4, -0.5, 0.3])))
        edges_T.append(wrong @ np.linalg.inv(true_poses[0]) @ true_poses[n - 1])
    else:
        edges_T.append(np.linalg.inv(true_poses[0]) @ true_poses[n - 1])
    info = jnp.stack([scalar_info(1.0)] * (n - 1) + [scalar_info(5.0)])
    graph = PoseGraph(
        poses=jnp.asarray(est, dtype=jnp.float32),
        edges_ij=jnp.asarray(np.asarray(edges_ij, np.int32)),
        edges_T=jnp.asarray(np.stack(edges_T), dtype=jnp.float32),
        edges_info=info.astype(jnp.float32),
        edges_valid=jnp.ones((len(edges_ij),), bool),
        edges_is_loop=jnp.asarray([False] * (n - 1) + [True]),
    )
    return graph, est, true_poses


def test_pgo_prunes_bad_loop_edge(rng):
    """VERDICT r1 #7: a wildly wrong loop edge must be rejected by the
    chi-square prune and leave the trajectory unharmed."""
    graph, est, true_poses = _chain_graph(rng, bad_loop=True)
    n = est.shape[0]

    # Without pruning the bad edge drags the endpoint far off.
    no_prune = np.asarray(optimize_pose_graph(graph, iters=15))
    dragged = np.linalg.norm(no_prune[n - 1][:3, 3] - est[n - 1][:3, 3])
    assert dragged > 0.3, dragged

    pruned = np.asarray(
        optimize_pose_graph(graph, iters=15, edge_prune_thres=0.5)
    )
    moved = np.linalg.norm(pruned[n - 1][:3, 3] - est[n - 1][:3, 3])
    assert moved < 0.05, moved  # trajectory unharmed (edge dropped)


def test_pgo_keeps_good_loop_edge_under_prune(rng):
    """Pruning must NOT reject a consistent loop edge."""
    graph, est, true_poses = _chain_graph(rng, bad_loop=False)
    n = est.shape[0]
    corrected = np.asarray(
        optimize_pose_graph(graph, iters=15, edge_prune_thres=0.5)
    )
    err_before = np.linalg.norm(est[n - 1][:3, 3] - true_poses[n - 1][:3, 3])
    err_after = np.linalg.norm(
        corrected[n - 1][:3, 3] - true_poses[n - 1][:3, 3]
    )
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_information_matrix_structure(rng):
    """Closed-form A^T A: PSD, translation block = n*I, matches a brute
    force accumulation."""
    from eags_slam_tpu.lc.solver import information_matrix

    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    info = information_matrix(pts, pts, max_corr=0.05)
    assert np.allclose(info[:3, :3], 200 * np.eye(3))
    assert np.allclose(info, info.T, atol=1e-5)
    ev = np.linalg.eigvalsh(info)
    assert ev.min() > -1e-5

    def skew(p):
        return np.array([[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]])

    brute = np.zeros((6, 6))
    for p in pts:
        A = np.concatenate([np.eye(3), -skew(p)], axis=1)
        brute += A.T @ A
    np.testing.assert_allclose(info, brute, rtol=1e-4, atol=1e-3)


def test_robust_icp_recovers_large_rotation(rng):
    """VERDICT r1 #8: a 30-degree-rotated pair must register via the
    FPFH+RANSAC global init where plain ICP fails."""
    # Structured cloud (room-corner walls) so FPFH features are informative.
    n = 900
    a = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                  0.02 * rng.normal(size=n)], -1)
    b = np.stack([rng.uniform(0, 1, n), 0.02 * rng.normal(size=n),
                  rng.uniform(0, 0.7, n)], -1)
    c = np.stack([0.02 * rng.normal(size=n), rng.uniform(0, 1, n),
                  rng.uniform(0, 0.7, n)], -1)
    pts = np.concatenate([a, b, c]).astype(np.float32)
    ang = np.deg2rad(30.0)
    T = np.asarray(
        se3_exp(jnp.asarray([0.3, -0.2, 0.1, 0.0, 0.0, ang], jnp.float32))
    )
    tgt = (pts @ np.linalg.inv(T)[:3, :3].T + np.linalg.inv(T)[:3, 3]).astype(
        np.float32
    )

    plain = icp_registration({"xyz": pts}, {"xyz": tgt}, robust=False)
    plain_err = np.linalg.norm(plain.transformation[:3, 3] - T[:3, 3])

    robust = icp_registration({"xyz": pts}, {"xyz": tgt}, robust=True)
    rob_rot_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(robust.transformation[:3, :3].T @ T[:3, :3]) - 1) / 2,
        -1, 1)))
    rob_t_err = np.linalg.norm(robust.transformation[:3, 3] - T[:3, 3])
    assert robust.successful
    assert rob_rot_err < 3.0 and rob_t_err < 0.05, (rob_rot_err, rob_t_err)
    # ... and it must actually beat the plain-ICP basin failure.
    assert rob_t_err < 0.5 * max(plain_err, 1e-9) or plain_err > 0.1


def test_pgo_analysis_artifacts(tmp_path, rng):
    """Verbose PGO analysis (reference lc.py analyse_pgo :333-444): writes
    pgo/<count>/pgo_analysis.json with per-edge GT errors and before/after
    anchor ATE."""
    from eags_slam_tpu.core.camera import Camera
    from eags_slam_tpu.lc.loop_closure import LoopClosure, _SubmapInfo
    from eags_slam_tpu.slam.submap import Submap

    n = 4
    poses = [np.eye(4)]
    step = np.asarray(se3_exp(jnp.asarray([0.4, 0.0, 0.0, 0.0, 0.15, 0.0])))
    for _ in range(1, n):
        poses.append(poses[-1] @ step)

    class _DS:
        pass

    ds = _DS()
    ds.poses = {i * 10: p for i, p in enumerate(poses)}

    cfg = {"lc": {"enabled": True}, "mapping": {"max_gaussians": 64},
           "verbose": True}
    lc = LoopClosure(cfg, str(tmp_path), Camera(10, 10, 5, 5, 10, 10),
                     dataset=ds)
    for i in range(n):
        sm = Submap(i, i * 10, np.eye(4), np.eye(4)[None], [i * 10], {})
        lc.infos.append(_SubmapInfo(sm, np.zeros((1, 8)), np.zeros(1),
                                    i * 10, i * 10 + 10))

    anchors = np.stack([p @ np.asarray(
        se3_exp(jnp.asarray(rng.normal(size=6) * 0.01, jnp.float32)))
        for p in poses])
    corrected = np.stack(poses)
    edges_ij = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
    edges_T = [np.linalg.inv(anchors[i]) @ anchors[j]
               for i, j in edges_ij[:-1]]
    edges_T.append(np.linalg.inv(poses[0]) @ poses[-1])
    edges_is_loop = [False] * (n - 1) + [True]

    lc._pgo_count = 1
    lc._analyse_pgo(anchors, corrected, edges_ij, edges_T, edges_is_loop,
                    np.tile(np.eye(4), (40, 1, 1)))

    import json
    import os

    path = os.path.join(str(tmp_path), "pgo", "1", "pgo_analysis.json")
    assert os.path.exists(path)
    with open(path) as f:
        rep = json.load(f)
    assert len(rep["edges"]) == n
    assert all("rot_err_deg" in e for e in rep["edges"])
    assert rep["anchor_ate_after_m"] <= rep["anchor_ate_before_m"] + 1e-9
    assert rep["anchor_ate_after_m"] < 1e-6
