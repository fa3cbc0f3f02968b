"""Weight-conversion tooling tests (VERDICT r2 next #7): build synthetic
source checkpoints, convert, and verify the gated JAX implementations
activate and produce sane outputs — so dropping in real weights is turnkey.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_script(name):
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_convert_lpips_and_gate_opens(tmp_path, rng):
    conv = _load_script("convert_lpips.py")
    chans = (64, 192, 384, 256, 256)
    in_ch = (3, 64, 192, 384, 256)
    ksz = (11, 5, 3, 3, 3)
    sd = {}
    for i, (c, ic, k) in enumerate(zip(chans, in_ch, ksz)):
        fi = conv._FEATURE_IDX[i]
        sd[f"features.{fi}.weight"] = torch.tensor(
            rng.normal(scale=0.05, size=(c, ic, k, k)).astype(np.float32)
        )
        sd[f"features.{fi}.bias"] = torch.tensor(
            np.zeros(c, np.float32)
        )
    lins = {
        f"lin{i}.model.1.weight": torch.tensor(
            np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
        )
        for i, c in enumerate(chans)
    }
    alex_p, lins_p, out_p = (
        tmp_path / "alexnet.pth", tmp_path / "alex.pth",
        tmp_path / "lpips_alex.npz",
    )
    torch.save(sd, alex_p)
    torch.save(lins, lins_p)
    conv.convert(str(alex_p), str(lins_p), str(out_p))

    from eags_slam_tpu.evaluation import lpips as L

    old_path, old_net = L._WEIGHTS_PATH, L._NET
    try:
        L._WEIGHTS_PATH, L._NET = str(out_p), None
        img1 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        img2 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        same = L.lpips(img1, img1)
        diff = L.lpips(img1, img2)
        assert same is not None and diff is not None
        assert same < 1e-6
        assert np.isfinite(diff) and diff > same
    finally:
        L._WEIGHTS_PATH, L._NET = old_path, old_net


def test_convert_netvlad_and_gate_opens(tmp_path, rng):
    conv = _load_script("convert_netvlad.py")
    # Minimal VGG16 trunk shapes (channel counts as the real net).
    vgg = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    sd = {}
    in_c = 3
    for i, oc in enumerate(vgg):
        sd[f"encoder.{2 * i}.weight"] = torch.tensor(
            rng.normal(scale=0.02, size=(oc, in_c, 3, 3)).astype(np.float32)
        )
        sd[f"encoder.{2 * i}.bias"] = torch.tensor(np.zeros(oc, np.float32))
        in_c = oc
    K, D = 16, 512
    sd["pool.conv.weight"] = torch.tensor(
        rng.normal(size=(K, D, 1, 1)).astype(np.float32)
    )
    sd["pool.conv.bias"] = torch.tensor(np.zeros(K, np.float32))
    sd["pool.centroids"] = torch.tensor(
        rng.normal(size=(K, D)).astype(np.float32)
    )
    src, dst = tmp_path / "netvlad.pth", tmp_path / "netvlad.npz"
    torch.save(sd, src)
    conv.convert(str(src), str(dst))

    from eags_slam_tpu.lc import netvlad as NV

    old_path, old_net = NV._WEIGHTS_PATH, NV._NET
    try:
        NV._WEIGHTS_PATH, NV._NET = str(dst), None
        img = rng.uniform(size=(96, 128, 3)).astype(np.float32)
        d = np.asarray(NV.describe(img))
        assert d.shape == (min(4096, K * D),)
        assert np.isfinite(d).all()
        np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-4)
    finally:
        NV._WEIGHTS_PATH, NV._NET = old_path, old_net
