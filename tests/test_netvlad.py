"""Weight-gated NetVLAD descriptor: gate behavior + architecture checks.

Real pretrained weights are unavailable in this zero-egress image (like
LPIPS); these tests validate the gate (HOG fallback without weights, full
VGG16+NetVLAD with a dropped-in npz) and the pooling math (unit norm,
determinism, correct shapes through the 13-conv trunk).
"""
import numpy as np
import pytest

import eags_slam_tpu.lc.netvlad as netvlad
from eags_slam_tpu.lc.descriptor import GlobalDesc


def _random_weights(tmp_path, k=8, d=512, out_dim=64):
    rng = np.random.default_rng(0)
    z = {}
    cin = 3
    for i, (cout, _) in enumerate(netvlad._VGG):
        z[f"conv{i + 1}_w"] = (
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        )
        z[f"conv{i + 1}_b"] = np.zeros(cout, np.float32)
        cin = cout
    z["assign_w"] = rng.normal(0, 0.1, (k, d, 1, 1)).astype(np.float32)
    z["assign_b"] = np.zeros(k, np.float32)
    z["centroids"] = rng.normal(0, 0.1, (k, d)).astype(np.float32)
    z["pca_w"] = rng.normal(0, 0.01, (out_dim, k * d)).astype(np.float32)
    z["pca_b"] = np.zeros(out_dim, np.float32)
    p = tmp_path / "netvlad.npz"
    np.savez(p, **z)
    return str(p)


@pytest.fixture(autouse=True)
def reset_gate():
    netvlad._NET = None
    yield
    netvlad._NET = None


def test_gate_closed_falls_back_to_hog():
    assert netvlad.load("/nonexistent/netvlad.npz") is None
    desc = GlobalDesc()
    assert desc.dim == 1024  # HOG stand-in
    d = np.asarray(desc(np.random.default_rng(0).uniform(0, 1, (48, 64, 3))
                        .astype(np.float32)))
    assert abs(np.linalg.norm(d) - 1.0) < 1e-4


def test_gate_open_runs_full_architecture(rng, tmp_path):
    path = _random_weights(tmp_path)
    net = netvlad.load(path)
    assert net is not None
    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    d1 = np.asarray(netvlad.describe(img))
    d2 = np.asarray(netvlad.describe(img))
    assert d1.shape == (64,)
    assert abs(np.linalg.norm(d1) - 1.0) < 1e-4
    np.testing.assert_allclose(d1, d2, atol=1e-6)  # deterministic
    # With RANDOM weights distinct inputs map to close-but-not-identical
    # codes (small-weight relu trunks contract noise); assert distinctness,
    # not recall — recall requires the real checkpoint.
    other = np.linspace(0, 1, 96, dtype=np.float32)[None, :, None] * np.ones(
        (64, 1, 3), np.float32
    )
    d3 = np.asarray(netvlad.describe(other))
    assert not np.allclose(d1, d3, atol=1e-4)
