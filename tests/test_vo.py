"""Edge-VO tests on synthetic box-texture frames with known motion."""
import numpy as np
import pytest

from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.vo.system import EdgeVO, VOConfig

CAM = Camera(fx=80.0, fy=80.0, cx=47.5, cy=31.5, width=96, height=64)
CFG = VOConfig(levels=2, max_edge_points=2048, dt_window=16,
               depth_min=0.1, depth_max=20.0, canny_low=40.0, canny_high=120.0)


# Aperiodic disc texture: periodic edge geometry (e.g. a checkerboard) gives
# a distance-transform tracker a lattice of aliased minima; real scenes are
# aperiodic, so the test scene must be too.
_DISC_RNG = np.random.default_rng(7)
_DISCS = np.stack(
    [
        _DISC_RNG.uniform(-3, 3, 50),          # cx
        _DISC_RNG.uniform(-2.2, 2.2, 50),      # cy
        _DISC_RNG.uniform(0.12, 0.45, 50),     # radius
    ],
    axis=1,
)


def make_frame(c2w, rng=None):
    """Render a textured plane z=3 (random discs) from c2w via raycast —
    independent of our rasterizer."""
    us, vs = np.meshgrid(np.arange(CAM.width), np.arange(CAM.height))
    d_cam = np.stack(
        [(us - CAM.cx) / CAM.fx, (vs - CAM.cy) / CAM.fy, np.ones_like(us, np.float64)],
        axis=-1,
    )
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    d_world = d_cam @ R.T
    lam = (3.0 - t[2]) / d_world[..., 2]
    pts = t + lam[..., None] * d_world
    inside = (
        (pts[..., 0, None] - _DISCS[None, None, :, 0]) ** 2
        + (pts[..., 1, None] - _DISCS[None, None, :, 1]) ** 2
        < _DISCS[None, None, :, 2] ** 2
    )
    gray = np.where(inside.sum(-1) % 2 == 1, 220.0, 40.0)
    rgb = np.stack([gray] * 3, axis=-1).astype(np.uint8)
    depth = (lam * 1.0).astype(np.float32)  # camera-frame z along ray z=1
    return rgb, depth


def test_vo_recovers_translation():
    # Per-frame motion ~1.5 px (DT alignment on integer-quantized Canny edges
    # is accurate to roughly the half-pixel level; sub-pixel motions are below
    # its resolution, like the reference's REVO).
    vo = EdgeVO(CFG, CAM)
    poses = []
    for i in range(5):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.055 * i, 0.0, 0.01 * i]
        poses.append(c2w)
        rgb, depth = make_frame(c2w)
        est = vo.step(rgb, depth, i / 30.0)
    err = np.linalg.norm(est[:3, 3] - poses[-1][:3, 3])
    # Final displacement 0.23 m (~6 px/frame); allow ~20% drift.
    assert err < 0.05, (est[:3, 3], poses[-1][:3, 3])


def test_vo_recovers_rotation():
    vo = EdgeVO(CFG, CAM)
    for i in range(4):
        ang = 0.025 * i  # ~1.4 deg (2 px) per frame
        c2w = np.eye(4)
        c2w[:3, :3] = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        rgb, depth = make_frame(c2w)
        est = vo.step(rgb, depth, i / 30.0)
    R_err = est[:3, :3].T @ c2w[:3, :3]
    ang_err = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang_err < 1.0, ang_err


def test_vo_set_pose_and_edges():
    vo = EdgeVO(CFG, CAM)
    rgb, depth = make_frame(np.eye(4))
    vo.step(rgb, depth, 0.0)
    e = vo.get_edge_image(0)
    assert e is not None and e.shape == (CAM.height, CAM.width)
    assert e.sum() > 50  # checkerboard has many edges

    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    vo.set_pose(0, T)
    np.testing.assert_allclose(vo.get_pose(0), T)
    rep = vo.report()
    assert rep["n_keyframes"] >= 1


def test_vo_promotes_keyframes_on_large_motion():
    """Histogram-voting / good-bad gates must promote new keyframes as the
    view drifts away from the first one (tracker.cpp:120-226 behavior)."""
    vo = EdgeVO(CFG, CAM)
    for i in range(8):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.15 * i, 0.0, 0.0]  # ~4 px/frame, large drift
        rgb, depth = make_frame(c2w)
        vo.step(rgb, depth, i / 30.0)
    rep = vo.report()
    assert rep["n_keyframes"] >= 2, rep
    # Pose graph stays consistent: world poses monotone in x.
    xs = [vo.get_pose(i)[0, 3] for i in range(8)]
    assert all(b > a - 1e-6 for a, b in zip(xs, xs[1:])), xs


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
