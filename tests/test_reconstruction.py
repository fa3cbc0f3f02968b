"""TSDF fusion + surface-nets mesh extraction + metrics on a known shape."""
import pytest
import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.evaluation.mesh import (clean_mesh, mesh_metrics,
                                           sample_surface, surface_nets)
from eags_slam_tpu.ops.tsdf import integrate, make_grid

CAM = Camera(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)


def test_tsdf_plane_reconstruction():
    # Fuse a synthetic flat wall at z=2 seen from the origin.
    depth = np.full((48, 64), 2.0, np.float32)
    color = np.full((48, 64, 3), 0.5, np.float32)
    grid = make_grid(origin=(-1.5, -1.5, 0.5), dims=(48, 48, 48),
                     voxel=0.0625, trunc=0.25)
    grid = integrate(grid, jnp.asarray(color), jnp.asarray(depth),
                     jnp.eye(4), CAM)
    sdf = np.asarray(grid.sdf)
    w = np.asarray(grid.weight)
    assert w.max() > 0
    # Voxels just in front of the wall have positive sdf; behind negative.
    k_wall = int(round((2.0 - 0.5) / 0.0625))
    mid = sdf[24, 24]
    assert mid[k_wall - 2] > 0.3
    assert mid[min(k_wall + 2, 47)] < 0.0

    verts, faces = surface_nets(sdf, w, np.array([-1.5, -1.5, 0.5]), 0.0625)
    assert len(verts) > 50 and len(faces) > 50
    # Extracted surface lies near z=2.
    assert abs(np.median(verts[:, 2]) - 2.0) < 0.08


def test_mesh_metrics_and_clean():
    # Plane grid mesh vs itself: near-perfect scores.
    xs, ys = np.meshgrid(np.linspace(0, 1, 12), np.linspace(0, 1, 12))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(144)], axis=1)
    faces = []
    for r in range(11):
        for c in range(11):
            i = r * 12 + c
            faces.append([i, i + 1, i + 12])
            faces.append([i + 1, i + 13, i + 12])
    faces = np.asarray(faces)
    pts = sample_surface(verts, faces, 500)
    m = mesh_metrics(pts, pts, tau=0.01)
    assert m["f1"] > 0.99 and m["accuracy"] < 1e-4

    # clean_mesh drops a tiny disconnected triangle.
    verts2 = np.concatenate([verts, verts[:3] + 10.0])
    faces2 = np.concatenate([faces, [[144, 145, 146]]])
    cv, cf = clean_mesh(verts2, faces2, min_faces=5)
    assert len(cf) == len(faces)


def test_merge_submaps_dedup():
    from eags_slam_tpu.evaluation.merged_map import merge_submaps

    g = {
        "xyz": np.random.default_rng(0).uniform(0, 1, (100, 3)).astype(np.float32),
        "f_dc": np.zeros((100, 3), np.float32),
    }
    merged = merge_submaps([g, g], voxel=0.001)  # exact duplicates collapse
    assert merged["xyz"].shape[0] == 100


def test_unseen_depth_l1_detects_offset(rng):
    """Identical surfaces -> ~0 cm; a 5 cm-offset box surface -> ~5 cm."""
    from eags_slam_tpu.evaluation.mesh import unseen_depth_l1

    # Dense samples of an axis-aligned box shell (room-like, cameras inside).
    n = 30000
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.zeros((n, 3), np.float32)
    ax = face // 2
    sign = np.where(face % 2 == 0, -1.0, 1.0)
    others = np.stack([(a + 1) % 3 for a in ax]), np.stack([(a + 2) % 3 for a in ax])
    pts[np.arange(n), ax] = sign * 1.0
    pts[np.arange(n), others[0]] = uv[:, 0]
    pts[np.arange(n), others[1]] = uv[:, 1]

    same = unseen_depth_l1(pts, pts.copy(), n_views=40, res=64)
    assert same < 0.5, same  # sub-voxel-ish, cm

    shrunk = pts * 0.95  # walls pulled in by 5% -> ~5 cm depth bias
    off = unseen_depth_l1(shrunk, pts, n_views=40, res=64)
    assert off > same + 1.0, (off, same)


pytestmark = pytest.mark.slow  # quick tier: pytest -m "not slow"
