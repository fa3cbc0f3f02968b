"""Regression: LC corrections must be DELTAS applied to the live pose array.

Round-1 advisor finding (high): drain used to replace `estimated_c2ws` with
the corrected SNAPSHOT taken at submit time, reverting every frame tracked
between submit and drain to its stale (identity) value. The fix publishes
per-range correction transforms; the last range is open-ended so
post-boundary frames inherit their chain's correction.
"""
import pytest
import types

import numpy as np

from eags_slam_tpu.lc.loop_closure import LoopClosure, _SubmapInfo


def _fake_lc():
    config = {
        "lc": {"enabled": True, "parallel": False},
        "mapping": {"max_gaussians": 64},
    }
    return LoopClosure(config, "/tmp/lc_drain_test", cam=None, dataset=None)


def _fake_info(start_frame, end_frame):
    sm = types.SimpleNamespace(T_prev_m=np.eye(4), save=lambda path: None)
    return _SubmapInfo(
        submap=sm, descriptors=np.zeros((0, 8)),
        self_sim_thre=np.zeros((0,)), start_frame=start_frame,
        end_frame=end_frame,
    )


def _translation(t):
    T = np.eye(4)
    T[:3, 3] = t
    return T


def test_drain_applies_deltas_to_live_array():
    lc = _fake_lc()
    lc.infos = [_fake_info(0, 5), _fake_info(5, 10)]

    anchors = np.stack([np.eye(4), _translation([1.0, 0, 0])])
    # PGO moved submap 1 by +0.5 in x.
    corrected = np.stack([np.eye(4), _translation([1.5, 0, 0])])
    twc_snapshot = np.tile(np.eye(4), (10, 1, 1))
    lc._apply_corrections(anchors, corrected, twc_snapshot)

    corrs = lc.drain_corrections()
    assert corrs is not None and len(corrs) == 2
    # Last range must be open-ended.
    assert corrs[-1][1] is None
    assert lc.drain_corrections() is None  # drained

    # Live array: 14 frames; frames 10..13 were tracked AFTER submit and
    # carry real (non-snapshot) poses.
    live = np.tile(np.eye(4), (14, 1, 1))
    for f in range(14):
        live[f][:3, 3] = [0.1 * f, 0.0, 0.0]
    expect = live.copy()
    for start, end, corr in corrs:
        e = len(live) if end is None else end
        live[start:e] = corr @ live[start:e]

    # Submap-0 frames untouched (its correction is identity).
    np.testing.assert_allclose(live[:5], expect[:5], atol=1e-12)
    # Submap-1 frames AND post-boundary frames shifted by +0.5 — NOT
    # reverted to any snapshot value.
    delta = _translation([0.5, 0, 0])
    np.testing.assert_allclose(live[5:], delta @ expect[5:], atol=1e-12)


def test_pending_accumulates_across_passes():
    lc = _fake_lc()
    lc.infos = [_fake_info(0, 5)]
    anchors = np.eye(4)[None]
    corrected = _translation([0.2, 0, 0])[None]
    twc = np.tile(np.eye(4), (5, 1, 1))
    lc._apply_corrections(anchors, corrected, twc.copy())
    lc._apply_corrections(anchors, corrected, twc.copy())
    corrs = lc.drain_corrections()
    assert len(corrs) == 2  # both passes preserved in order


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
