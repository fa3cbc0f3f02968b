"""Cross-backend validation + perf probe for the v2 bwd pipelined rmw.

The interpret-mode pytest suite validates the NUMERICS of the backward
kernel; what it cannot catch is hardware DMA ordering (deferred band
writes vs the next tile's reads, semaphore accounting across grid steps).
This script runs the same two scenes — one dense enough that every tile
takes the parallel/deferred rmw path, one sparse enough that band windows
overlap and the serialized fallback fires — and dumps the full gradient
pytree, so a CPU (interpret) run and a TPU run can be diffed bit-for-bit
in float tolerance.

Usage (from /root/repo):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/rmw_check.py dump /tmp/rmw_cpu.npz
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/rmw_check.py dump /tmp/rmw_tpu.npz
  python scripts/rmw_check.py compare /tmp/rmw_cpu.npz /tmp/rmw_tpu.npz
  PYTHONPATH=... python scripts/rmw_check.py perf   # amortized 262k timing
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np


def scene(n, h, w, seed):
    import jax.numpy as jnp

    from eags_slam_tpu.core.camera import Camera

    rng = np.random.default_rng(seed)
    cam = Camera(fx=300.0, fy=300.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    means = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(0.5, 5, n)], axis=-1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ls = np.log(rng.uniform(0.01, 0.05, (n, 3))).astype(np.float32)
    op = rng.uniform(0.5, 3.0, (n, 1)).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return cam, tuple(jnp.asarray(x) for x in (means, quats, ls, op, col)) \
        + (jnp.eye(4),)


def grads_for(n, h, w, seed, **cfg_over):
    import jax

    from eags_slam_tpu.ops.rasterizer import RasterConfig, render

    kw = dict(tile=32, dup_side=3, group=8, backend="sorted",
              seg_cap=1024, bands=3)
    kw.update(cfg_over)
    cfg = RasterConfig(**kw)
    cam, args = scene(n, h, w, seed)

    def loss(*a):
        out = render(*a, cam=cam, cfg=cfg)
        return (out.color.sum() + out.depth.sum()
                + (out.color * out.color).sum())

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    return [np.asarray(x) for x in g]


def dump(path):
    out = {}
    # Dense: ~2500 gaussians per 32px tile-row -> disjoint band windows,
    # every tile takes the deferred-write path.
    for i, g in enumerate(grads_for(20000, 256, 480, 0)):
        out[f"dense_{i}"] = g
    # Sparse: ~190 per row -> overlapping windows, serialized fallback
    # (plus parallel->fallback->parallel transitions within a program).
    for i, g in enumerate(grads_for(1536, 256, 480, 1)):
        out[f"sparse_{i}"] = g
    np.savez(path, **out)
    print("wrote", path)


def compare(a_path, b_path):
    a, b = np.load(a_path), np.load(b_path)
    worst = 0.0
    for k in a.files:
        x, y = a[k], b[k]
        denom = np.maximum(np.abs(x), 1e-3)
        rel = float(np.max(np.abs(x - y) / denom))
        print(f"{k}: max_rel={rel:.3e}")
        worst = max(worst, rel)
    ok = worst < 5e-3
    print("OK" if ok else "MISMATCH", f"worst={worst:.3e}")
    sys.exit(0 if ok else 1)


def window():
    """On-chip golden check of the retire-on-advance windowed bwd rmw
    (RasterConfig.rmw_window) against the legacy full-window rmw, same
    process, same inputs. The interpret-mode pytest goldens cannot catch
    hardware DMA ordering (retire reads racing pending writes, window-shift
    chunk copies, cross-band collisions); a mismatch here means the sweep's
    rmw_window timings are garbage. Scenes: dense (disjoint band windows,
    steady monotone advance), sparse (overlapping windows, zero-delta
    tiles), and the sweep's big-tile shape (tile=64, seg_cap=2048)."""
    # CPU smoke only (=1 enables; the full-size scenes are the real gate).
    small = bool(int(os.environ.get("EAGS_RMWCHECK_SMALL", "0") or 0))
    cases = [
        ("dense32", dict(n=4096 if small else 20000, h=128 if small else 256,
                         w=256 if small else 480, seed=0), {}),
        ("sparse32", dict(n=768 if small else 1536, h=128 if small else 256,
                          w=256 if small else 480, seed=1), {}),
        ("dense64", dict(n=4096 if small else 20000, h=128 if small else 256,
                         w=256 if small else 480, seed=2),
         dict(tile=64, dup_side=2, group=4,
              seg_cap=1024 if small else 2048)),
    ]
    worst = 0.0
    for name, sc, over in cases:
        ref = grads_for(sc["n"], sc["h"], sc["w"], sc["seed"], **over)
        win = grads_for(sc["n"], sc["h"], sc["w"], sc["seed"],
                        rmw_window=True, **over)
        for i, (x, y) in enumerate(zip(ref, win)):
            denom = np.maximum(np.abs(x), 1e-3)
            rel = float(np.max(np.abs(x - y) / denom))
            worst = max(worst, rel)
            if rel > 1e-5:
                print(f"{name} grad[{i}]: max_rel={rel:.3e}")
    ok = worst < 5e-4  # same program order, both f32: near-bit-exact
    print(("OK" if ok else "MISMATCH"), f"window-vs-legacy worst={worst:.3e}")
    sys.exit(0 if ok else 1)


def _pose_grads_for(n, h, w, seed, use_pose_kernel, subset_frac=0.33,
                    **cfg_over):
    """Pose-parameter gradient of a frozen-sorted tile-subset tracking loss
    via the legacy rmw chain or the pose-contraction kernel."""
    import jax
    import jax.numpy as jnp

    from eags_slam_tpu.ops.rasterizer import (
        RasterConfig, freeze_sorted, render_frozen_sorted_tiles,
        render_frozen_sorted_tiles_pose)
    from eags_slam_tpu.slam.tracker import PoseParams, _rel_matrix

    kw = dict(tile=32, dup_side=3, group=8, backend="sorted",
              seg_cap=1024, bands=3)
    kw.update(cfg_over)
    cfg = RasterConfig(**kw)
    cam, (means, quats, ls, op, col, last_w2c) = scene(n, h, w, seed)
    fs = freeze_sorted(means, quats, ls, op, col, last_w2c, cam, cfg)
    tiles_x = -(-cam.width // cfg.tile)
    tiles_y = -(-cam.height // cfg.tile)
    num_tiles = tiles_x * tiles_y
    rng = np.random.default_rng(seed + 13)
    tile_ids = jnp.asarray(rng.permutation(num_tiles)[
        : max(int(subset_frac * num_tiles), 1)].astype(np.int32))
    qt = jnp.asarray([0.999, 0.01, -0.02, 0.015, 0.01, -0.02, 0.03],
                     jnp.float32)

    def loss(qt):
        if use_pose_kernel:
            out = render_frozen_sorted_tiles_pose(fs, qt, last_w2c,
                                                  tile_ids, cam, cfg)
        else:
            pose = PoseParams(qt[:4], qt[4:7], jnp.zeros(2))
            out = render_frozen_sorted_tiles(
                fs, last_w2c @ _rel_matrix(pose), tile_ids, cam, cfg)
        return (out.color.sum() + 0.3 * out.depth.sum()
                + (out.alpha ** 2).sum() + (out.color * out.color).sum())

    return np.asarray(jax.jit(jax.grad(loss))(qt))


def pose():
    """On-chip golden check of the pose-contraction backward
    (TrackerConfig.pose_grad_kernel) against the legacy rmw + XLA-VJP
    chain, same process, same inputs. Interpret-mode pytest goldens cannot
    see hardware DMA ordering (the dual attr+jacobian band prefetch);
    run this before trusting any EAGS_POSE_KERNEL timing. EAGS_RMWCHECK_
    SMALL=1 shrinks the scenes for a CPU smoke."""
    small = bool(int(os.environ.get("EAGS_RMWCHECK_SMALL", "0") or 0))
    cases = [
        ("dense32", dict(n=4096 if small else 20000, h=128 if small else 256,
                         w=256 if small else 480, seed=0), {}),
        ("sparse32", dict(n=768 if small else 1536, h=128 if small else 256,
                          w=256 if small else 480, seed=1), {}),
        ("dense64", dict(n=4096 if small else 20000, h=128 if small else 256,
                         w=256 if small else 480, seed=2),
         dict(tile=64, dup_side=2, group=4,
              seg_cap=1024 if small else 2048)),
    ]
    worst = 0.0
    for name, sc, over in cases:
        ref = _pose_grads_for(sc["n"], sc["h"], sc["w"], sc["seed"], False,
                              **over)
        new = _pose_grads_for(sc["n"], sc["h"], sc["w"], sc["seed"], True,
                              **over)
        denom = max(float(np.max(np.abs(ref))), 1e-3)
        rel = float(np.max(np.abs(ref - new)) / denom)
        worst = max(worst, rel)
        if rel > 1e-5:
            print(f"{name}: max_rel={rel:.3e} ref={ref} new={new}")
    # Different association order (contraction vs rmw+VJP): float-noise
    # tolerance, not bit-exact like the window gate.
    ok = worst < 1e-3
    print(("OK" if ok else "MISMATCH"), f"pose-vs-legacy worst={worst:.3e}")
    sys.exit(0 if ok else 1)


def perf():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(__file__))
    from raster_bench import amortized, make_scene, measure_floor

    from eags_slam_tpu.ops.rasterizer import RasterConfig, render

    cfg = RasterConfig(tile=32, dup_side=3, group=8, backend="sorted",
                       seg_cap=1024, bands=3)
    cam, args = make_scene(262144, 680, 1200)
    floor = measure_floor()
    print(f"backend={jax.default_backend()} floor={floor*1e3:.1f}ms")

    def fwd(*a):
        return render(*a, cam=cam, cfg=cfg).color

    def fwdbwd(*a):
        def loss(means, quats, ls, op, col, w2c):
            out = render(means, quats, ls, op, col, w2c, cam=cam, cfg=cfg)
            return out.color.sum() + out.depth.sum()
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*a)

    t = amortized(fwd, args, floor=floor)
    print(f"[v2 sorted] fwd:     {t*1e3:8.2f} ms")
    t = amortized(fwdbwd, args, floor=floor)
    print(f"[v2 sorted] fwd+bwd: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "dump":
        dump(sys.argv[2])
    elif cmd == "compare":
        compare(sys.argv[2], sys.argv[3])
    elif cmd == "window":
        window()
    elif cmd == "pose":
        pose()
    elif cmd == "perf":
        perf()
