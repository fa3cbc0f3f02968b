"""Amortized micro-benchmark of the rasterizer paths on the real TPU.

The axon tunnel costs ~32-40 ms per dispatch+fetch round trip, so per-call
timing measures the tunnel, not the kernel. This harness runs REPS renders
inside ONE jit (scan with a data dependency between reps), fetches once and
subtracts the measured floor.

Usage (from /root/repo, nothing else using the TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/raster_bench.py [n]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_scene(n, h, w, seed=0):
    from eags_slam_tpu.core.camera import Camera

    rng = np.random.default_rng(seed)
    cam = Camera(fx=600.0, fy=600.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    means = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(0.5, 6, n)],
        axis=-1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    log_scales = np.log(rng.uniform(0.005, 0.03, (n, 3))).astype(np.float32)
    opac = rng.uniform(0.5, 3.0, (n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return cam, tuple(
        jnp.asarray(x) for x in (means, quats, log_scales, opac, colors)
    ) + (jnp.eye(4),)


def measure_floor():
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones((8, 128))
    _ = float(f(x).sum())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f(x).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def amortized(fn, args, reps=20, floor=0.033):
    """Time fn(*args) averaged over reps chained inside one jit."""

    def many(args):
        def step(carry, _):
            # Perturb the first arg by the carry so each rep depends on the
            # previous one — XLA cannot hoist or CSE the loop body.
            a = (args[0] + carry * 1e-20,) + tuple(args[1:])
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + leaf.reshape(-1)[0] * 1e-20, ()

        carry, _ = jax.lax.scan(step, jnp.float32(0), None, length=reps)
        return carry

    jf = jax.jit(many)
    _ = float(jf(args))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jf(args))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - floor) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    h, w = 680, 1200
    from eags_slam_tpu.ops.rasterizer import (RasterConfig, freeze_binning,
                                              render, render_frozen)

    from eags_slam_tpu.ops.rasterizer import freeze_sorted, render_frozen_sorted

    cam, args = make_scene(n, h, w)
    floor = measure_floor()
    print(f"backend={jax.default_backend()} n={n} {w}x{h} floor={floor*1e3:.1f}ms")

    def bench_backend(name, cfg):
        def fwd(*a):
            out = render(*a, cam=cam, cfg=cfg)
            return out.color

        def fwdbwd(*a):
            def loss(means, quats, ls, op, col, w2c):
                out = render(means, quats, ls, op, col, w2c, cam=cam, cfg=cfg)
                return out.color.sum() + out.depth.sum()
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*a)

        t = amortized(fwd, args, floor=floor)
        print(f"[{name}] render fwd:      {t*1e3:8.2f} ms")
        t = amortized(fwdbwd, args, floor=floor)
        print(f"[{name}] render fwd+bwd:  {t*1e3:8.2f} ms")

    cfg1 = RasterConfig(tile=32, dup_side=3, tile_capacity=1024, chunk=128,
                        group=8, backend="pallas")
    cfg2 = RasterConfig(tile=32, dup_side=3, group=8, backend="sorted",
                        seg_cap=1024, bands=3)
    from _bench_common import apply_rcfg_env
    cfg2 = apply_rcfg_env(cfg2)
    bench_backend("v1", cfg1)
    bench_backend("v2", cfg2)

    fb = jax.jit(
        lambda *a: freeze_binning(a[0], a[1], a[2], a[3], a[4], a[5],
                                  cam=cam, cfg=cfg1)
    )(*args)
    jax.block_until_ready(fb)

    def f_fwd(w2c):
        return render_frozen(fb, w2c, cam, cfg1).color

    def f_fwdbwd(w2c):
        def loss(w2c):
            out = render_frozen(fb, w2c, cam, cfg1)
            return out.color.sum() + out.depth.sum()
        return jax.grad(loss)(w2c)

    t = amortized(f_fwd, (args[5],), floor=floor)
    print(f"[v1] frozen fwd:      {t*1e3:8.2f} ms")
    t = amortized(f_fwdbwd, (args[5],), floor=floor)
    print(f"[v1] frozen fwd+bwd:  {t*1e3:8.2f} ms")

    fs = jax.jit(
        lambda *a: freeze_sorted(a[0], a[1], a[2], a[3], a[4], a[5],
                                 cam=cam, cfg=cfg2)
    )(*args)
    jax.block_until_ready(fs)

    def s_fwd(w2c):
        return render_frozen_sorted(fs, w2c, cam, cfg2).color

    def s_fwdbwd(w2c):
        def loss(w2c):
            out = render_frozen_sorted(fs, w2c, cam, cfg2)
            return out.color.sum() + out.depth.sum()
        return jax.grad(loss)(w2c)

    t = amortized(s_fwd, (args[5],), floor=floor)
    print(f"[v2] frozen fwd:      {t*1e3:8.2f} ms")
    t = amortized(s_fwdbwd, (args[5],), floor=floor)
    print(f"[v2] frozen fwd+bwd:  {t*1e3:8.2f} ms")

    # Tile-subset tracking path (tracker.TrackerConfig.tile_subset_frac).
    from eags_slam_tpu.ops.rasterizer import render_frozen_sorted_tiles

    tiles_x = -(-w // cfg2.tile)
    tiles_y = -(-h // cfg2.tile)
    num_tiles = tiles_x * tiles_y
    for frac in (0.25, 0.125):
        s = int(round(frac * num_tiles))
        tile_ids = jnp.asarray(
            np.random.default_rng(0).permutation(num_tiles)[:s], jnp.int32
        )

        def t_fwd(w2c):
            return render_frozen_sorted_tiles(fs, w2c, tile_ids, cam,
                                              cfg2).color

        def t_fwdbwd(w2c):
            def loss(w2c):
                out = render_frozen_sorted_tiles(fs, w2c, tile_ids, cam, cfg2)
                return out.color.sum() + out.depth.sum()
            return jax.grad(loss)(w2c)

        t = amortized(t_fwd, (args[5],), floor=floor)
        print(f"[v2] frozen tiles {frac:5.3f} fwd:     {t*1e3:8.2f} ms")
        t = amortized(t_fwdbwd, (args[5],), floor=floor)
        print(f"[v2] frozen tiles {frac:5.3f} fwd+bwd: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
