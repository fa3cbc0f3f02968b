"""Round-3 loop-closure additions: odometry-edge information matrices,
place-recognition recall/precision evidence, closure latency reporting.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from eags_slam_tpu.lc.descriptor import GlobalDesc
from eags_slam_tpu.lc.loop_closure import LoopClosure, _SubmapInfo
from eags_slam_tpu.lc.pgo import PoseGraph, optimize_pose_graph, scalar_info
from eags_slam_tpu.slam.submap import Submap


def _trans(x):
    T = np.eye(4)
    T[0, 3] = x
    return T


def test_odometry_information_weights_shift_pgo():
    """A low-information odometry edge must absorb more of the loop
    correction than a high-information one (reference computes o3d info
    matrices for odometry edges, lc.py:235-249; round 2 used identity)."""
    est = np.stack([_trans(0.0), _trans(1.2), _trans(2.4)])
    edges_ij = [(0, 1), (1, 2), (0, 2)]
    edges_T = [_trans(1.2), _trans(1.2), _trans(2.0)]   # loop edge is exact

    def solve(info_01, info_12):
        graph = PoseGraph(
            poses=jnp.asarray(est, dtype=jnp.float32),
            edges_ij=jnp.asarray(np.asarray(edges_ij, np.int32)),
            edges_T=jnp.asarray(np.stack(edges_T), dtype=jnp.float32),
            edges_info=jnp.stack(
                [info_01, info_12, scalar_info(50.0)]
            ).astype(jnp.float32),
            edges_valid=jnp.ones((3,), bool),
            edges_is_loop=jnp.asarray([False, False, True]),
        )
        return np.asarray(optimize_pose_graph(graph, iters=30), np.float64)

    # Edge (0,1) 25x more confident than (1,2).
    out = solve(scalar_info(25.0), scalar_info(1.0))
    rel01 = np.linalg.inv(out[0]) @ out[1]
    rel12 = np.linalg.inv(out[1]) @ out[2]
    err01 = abs(rel01[0, 3] - 1.2)
    err12 = abs(rel12[0, 3] - 1.2)
    # The low-info edge must deform several times more.
    assert err12 > 2.0 * err01, (err01, err12)


def _make_lc(tmp_path, config_extra=None):
    config = {
        "lc": dict({"enabled": True, "parallel": False,
                    "min_interval": 2}, **(config_extra or {})),
        "mapping": {"max_gaussians": 4096, "tile_capacity": 128},
    }
    from eags_slam_tpu.core.camera import Camera

    cam = Camera(60.0, 60.0, 31.5, 23.5, 64, 48)
    return LoopClosure(config, str(tmp_path), cam, dataset=None)


def _fake_info(lc, rng, pts, frame_ids, start, images=None):
    n = pts.shape[0]
    g = {
        "xyz": pts.astype(np.float32),
        "f_dc": np.zeros((n, 3), np.float32),
        "f_rest": np.zeros((n, 15, 3), np.float32),
        "log_scales": np.full((n, 3), -3.0, np.float32),
        "quats": np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        "opacity_logits": np.zeros((n, 1), np.float32),
    }
    sm = Submap(
        submap_id=start, kf_id=frame_ids[0], T_prev_m=np.eye(4),
        Tmc=np.stack([np.eye(4)] * len(frame_ids)),
        kf_frame_ids=list(frame_ids), gaussians=g,
    )
    if images is not None:
        descs = np.stack([np.asarray(lc.desc(im)) for im in images])
    else:
        descs = np.zeros((len(frame_ids), lc.desc.dim), np.float32)
    thre = np.full((len(frame_ids),), lc.min_similarity)
    return _SubmapInfo(sm, descs, thre, start, start + len(frame_ids))


def test_odo_information_reflects_overlap(tmp_path, rng):
    """Consecutive submaps with high point overlap produce a 'stiffer'
    information (relative to their size) than barely-overlapping ones,
    and both are non-identity."""
    lc = _make_lc(tmp_path)
    base = rng.uniform(-1, 1, (800, 3)).astype(np.float32)
    near = base + rng.normal(scale=0.01, size=base.shape).astype(np.float32)
    far = base + np.array([5.0, 0.0, 0.0], np.float32)

    lc.infos = [
        _fake_info(lc, rng, base, [0], 0),
        _fake_info(lc, rng, near, [10], 10),
        _fake_info(lc, rng, far, [20], 20),
    ]
    anchors = np.stack([np.eye(4)] * 3)
    info_hi = lc._odo_information(1, anchors)   # base vs near: full overlap
    info_lo = lc._odo_information(2, anchors)   # near vs far: none
    assert not np.allclose(info_hi, np.eye(6))
    # Normalized info: top-left block is ~identity * (fraction of matched
    # correspondences); disjoint clouds match ~nothing.
    assert info_hi[0, 0] > 0.5
    assert info_lo[0, 0] < 0.2 or np.allclose(info_lo, np.eye(6))
    # Cache hit returns the same object.
    assert lc._odo_information(1, anchors) is info_hi


def _room_image(room_seed, view, rng_global):
    """Deterministic 'room' appearance with per-view variation."""
    rng = np.random.default_rng(room_seed)
    h, w = 48, 64
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    fu, fv = rng.uniform(0.15, 0.6, 2)
    base = rng.uniform(0.2, 0.8, 3)
    orient = rng.uniform(0, np.pi)
    uu = np.cos(orient) * u + np.sin(orient) * v
    # "Viewpoint" = horizontal shift; views within a submap differ by
    # several pattern periods, a revisit lands NEAR an original viewpoint.
    shift = 9.0 * view
    img = np.stack([
        0.5 + 0.5 * np.sin(fu * (u + shift) + 2 * np.pi * base[0]),
        0.5 + 0.5 * np.sin(fv * v + 0.7 * fu * (uu + shift)),
        ((np.floor((u + shift) / (3 + 9 * base[2])) + np.floor(v / 5)) % 2),
    ], axis=-1).astype(np.float32)
    img += rng_global.normal(scale=0.02, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def test_detect_closures_recall_precision(tmp_path, rng):
    """Revisit trajectory with distractor rooms: detection must find the
    revisited room's submap (recall) without firing on distractors
    (precision). Quantifies the descriptor's place-recognition quality
    (VERDICT r2 missing #1)."""
    lc = _make_lc(tmp_path, {"min_similarity": 0.7, "self_sim_topk": 3})
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)

    # Submaps 0..3 are four DIFFERENT rooms; submap 4 revisits room 0.
    infos = []
    for s in range(4):
        imgs = [_room_image(1000 + s, k, rng) for k in range(4)]
        infos.append(_fake_info(lc, rng, pts, list(range(s * 4, s * 4 + 4)),
                                s * 4, images=imgs))
    revisit = [_room_image(1000 + 0, k + 0.04, rng) for k in range(4)]
    infos.append(_fake_info(lc, rng, pts, [16, 17, 18, 19], 16,
                            images=revisit))
    # Self-sim thresholds as the production path computes them (:111-124).
    for info in infos:
        sim = info.descriptors @ info.descriptors.T
        np.fill_diagonal(sim, -1.0)
        k = min(3, len(sim) - 1)
        info.self_sim_thre = np.maximum(
            np.sort(sim, axis=1)[:, -k:].mean(axis=1), lc.min_similarity
        )
    lc.infos = infos

    matches = lc._detect_closures(4)
    # min_interval=2 excludes submap 3; room 0 must be found; rooms 1, 2
    # must not fire.
    assert 0 in matches, f"revisit not detected: {matches}"
    false_hits = [m for m in matches if m != 0]
    assert len(false_hits) == 0, f"distractor rooms detected: {false_hits}"


def test_submit_records_latency(tmp_path, rng):
    """Synchronous submit path records per-closure latency stats."""
    lc = _make_lc(tmp_path)
    # No submap file on disk -> the pass warns + returns, but still logs a
    # latency entry and report() stays consistent.
    with pytest.warns(UserWarning):
        lc.submit(0, 5, np.stack([np.eye(4)] * 6))
    rep = lc.report()
    assert rep["n_submits"] == 1
    assert "total_ms" in lc.latencies[0]


def _production_self_sim(infos, lc):
    """Self-sim thresholds exactly as _load_submap_info computes them."""
    for info in infos:
        sim = info.descriptors @ info.descriptors.T
        np.fill_diagonal(sim, -1.0)
        k = min(lc.self_sim_topk, len(sim) - 1)
        info.self_sim_thre = np.maximum(
            np.sort(sim, axis=1)[:, -k:].mean(axis=1), lc.min_similarity
        )


def test_repeated_texture_decoy_no_false_correction(tmp_path, rng):
    """Repeated-texture decoy (VERDICT r3 next #8): submap 4 carries the
    SAME wall texture as room 0 but is a geometrically DIFFERENT room 8 m
    away (same wallpaper in two rooms — the GIST-fallback descriptor's worst
    case). The descriptor-level detection is EXPECTED to fire; the test
    asserts the downstream chain (registration gates + line-process PGO at
    default thresholds) lets no false correction through."""
    lc = _make_lc(tmp_path, {"registration": "robust_icp",
                             "min_interval": 2, "min_similarity": 0.7,
                             "self_sim_topk": 3})
    infos = []
    tex = [1000, 1001, 1002, 1003, 1000]   # submap 4 reuses room 0's texture
    for s in range(5):
        off = 0.03 if s == 4 else 0.0      # not bit-identical frames
        imgs = [_room_image(tex[s], k + off, rng) for k in range(4)]
        cloud_rng = np.random.default_rng(2000 + s)   # 5 DISTINCT geometries
        pts = (cloud_rng.uniform(-1, 1, (400, 3))
               + np.array([2.0 * s, 0, 0])).astype(np.float32)
        infos.append(_fake_info(lc, rng, pts, list(range(4 * s, 4 * s + 4)),
                                4 * s, images=imgs))
    _production_self_sim(infos, lc)
    lc.infos = infos

    matches = lc._detect_closures(4)
    assert 0 in matches, (
        "decoy did not fire at the descriptor level — the scenario no "
        f"longer exercises downstream rejection: {matches}")

    applied = {}
    lc._load_submap_info = lambda sid, fid: None
    lc._apply_corrections = (
        lambda anchors, corrected, twc: applied.update(
            anchors=anchors, corrected=corrected))
    lc._run_inner(4, 16, np.eye(4))

    if applied:
        dev = np.abs(applied["corrected"][:, :3, 3]
                     - applied["anchors"][:, :3, 3]).max()
        assert dev < 0.05, (
            f"false loop edge moved anchors by {dev:.3f} m — survived the "
            "line process")
    else:
        # Registration gate rejected the decoy before PGO — also correct.
        assert lc.n_closures == 0


def test_min_similarity_margin(tmp_path, rng):
    """Threshold-margin characterization for the fallback descriptor
    (VERDICT r3 next #8): over min_similarity in [0.5, 0.85], the genuine
    revisit must be detected and the distractor rooms must stay quiet —
    documenting that the default 0.7 sits inside a wide correct band."""
    lc = _make_lc(tmp_path, {"min_similarity": 0.7, "self_sim_topk": 3})
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    infos = []
    for s in range(4):
        imgs = [_room_image(1500 + s, k, rng) for k in range(4)]
        infos.append(_fake_info(lc, rng, pts, list(range(s * 4, s * 4 + 4)),
                                s * 4, images=imgs))
    revisit = [_room_image(1500 + 0, k + 0.04, rng) for k in range(4)]
    infos.append(_fake_info(lc, rng, pts, [16, 17, 18, 19], 16,
                            images=revisit))
    lc.infos = infos

    margins = {}
    for min_sim in (0.5, 0.6, 0.7, 0.8, 0.85):
        lc.min_similarity = min_sim
        _production_self_sim(infos, lc)
        matches = lc._detect_closures(4)
        margins[min_sim] = matches
        assert 0 in matches, f"revisit lost at min_similarity={min_sim}"
        assert all(m == 0 for m in matches), (
            f"distractor fired at min_similarity={min_sim}: {matches}")


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
