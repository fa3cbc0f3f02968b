#!/usr/bin/env python3
"""Multi-chip scaling table on the virtual CPU mesh (VERDICT r3 next #5).

Measures the sharded mapping step's wall-clock vs mesh size for the three
parallel modes (dp / sp / dpsp) at a fixed shape, on the 8-device virtual
CPU mesh (`xla_force_host_platform_device_count`). Real multi-chip hardware
is not available in this container, and all 8 virtual devices timeshare ONE
host core — so the point of the table is NOT wall-clock speedup (expect
~flat): it validates that

  - per-device work divides with the mesh (sp: tiles/device, dp: the
    K-views-per-step throughput multiple),
  - collective overhead stays bounded as the mesh grows (a step at D=8
    costs about the same TOTAL CPU as D=1 — the psum/pmean transposes add
    little),

which, combined with the measured per-iteration device times in PERF.md,
gives the projected v5e-8 scaling (each real chip runs its slice
concurrently instead of timesharing).

Writes a markdown table to stdout and JSON to --out (default
/tmp/mesh_scaling.json).
"""
import argparse
import json
import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build_state(rng, cap=8192, n=6000):
    from eags_slam_tpu.core import gaussians as G

    state = G.empty_state(cap)
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(1.2, 5.0, n)], -1).astype(np.float32)
    rows = G.point_rows(
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)),
        jnp.full((n,), 0.05), jnp.full((n,), 0.8),
    )
    state, _ = G.insert(state, rows, jnp.ones(n, bool))
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mesh_scaling.json")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--hw", type=int, nargs=2, default=(192, 256))
    args = ap.parse_args()

    from eags_slam_tpu.core.camera import Camera
    from eags_slam_tpu.ops.rasterizer import RasterConfig
    from eags_slam_tpu.parallel.mesh import (dp_map_step, dpsp_map_step,
                                             make_mesh, make_mesh2d,
                                             sp_map_step)
    from eags_slam_tpu.slam.mapper import MapperConfig

    h, w = args.hw
    cam = Camera(fx=1.1 * w, fy=1.1 * w, cx=(w - 1) / 2, cy=(h - 1) / 2,
                 width=w, height=h)
    rcfg = RasterConfig(tile=16, dup_side=4, chunk=32, backend="sorted",
                        seg_cap=256, bands=3, group=4)
    mcfg = MapperConfig(max_keyframes=8)
    rng = np.random.default_rng(0)
    state = build_state(rng)
    n_tiles = (-(-w // 16)) * (-(-h // 16))

    color = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1.0, 4.0, (h, w)).astype(np.float32))
    w2c = jnp.eye(4)
    kf8_c = jnp.stack([color] * 8)
    kf8_d = jnp.stack([depth] * 8)
    kf8_w = jnp.stack([w2c] * 8)

    rows = []

    def timed(step_fn, fetch, n=args.steps):
        fetch(step_fn())  # warm (jit compile)
        t0 = time.perf_counter()
        for _ in range(n):
            out = step_fn()
        fetch(out)
        return (time.perf_counter() - t0) / n

    for d in (1, 2, 4, 8):
        mesh = make_mesh(d)
        step, init_adam = dp_map_step(mesh, cam, rcfg, mcfg)
        adam = init_adam(state)
        fn = lambda: step(state, adam, kf8_c[:d], kf8_d[:d], kf8_w[:d])
        dt = timed(fn, lambda o: float(o[2]))
        rows.append(dict(mode="dp", mesh=f"{d}", step_ms=1e3 * dt,
                         views_per_step=d, tiles_per_dev=n_tiles))
        print(f"dp    D={d}: {1e3*dt:8.1f} ms/step  ({d} views/step)",
              flush=True)

    for d in (1, 2, 4, 8):
        mesh = make_mesh(d)
        step, init_adam, _ = sp_map_step(mesh, cam, rcfg, mcfg)
        adam = init_adam(state)
        fn = lambda: step(state, adam, color, depth, w2c)
        dt = timed(fn, lambda o: float(o[2]))
        tpd = -(-n_tiles // d)
        rows.append(dict(mode="sp", mesh=f"{d}", step_ms=1e3 * dt,
                         views_per_step=1, tiles_per_dev=tpd))
        print(f"sp    D={d}: {1e3*dt:8.1f} ms/step  ({tpd} tiles/dev)",
              flush=True)

    for (nd, ns) in ((1, 2), (2, 2), (2, 4)):
        mesh = make_mesh2d(nd, ns)
        step, init_adam, _ = dpsp_map_step(mesh, cam, rcfg, mcfg)
        adam = init_adam(state)
        fn = lambda: step(state, adam, kf8_c[:nd], kf8_d[:nd], kf8_w[:nd])
        dt = timed(fn, lambda o: float(o[2]))
        tpd = -(-n_tiles // ns)
        rows.append(dict(mode="dpsp", mesh=f"{nd}x{ns}", step_ms=1e3 * dt,
                         views_per_step=nd, tiles_per_dev=tpd))
        print(f"dpsp  {nd}x{ns}: {1e3*dt:8.1f} ms/step  "
              f"({nd} views, {tpd} tiles/dev)", flush=True)

    with open(args.out, "w") as f:
        json.dump(dict(shape=dict(h=h, w=w, n_tiles=n_tiles,
                                  gaussians=6000, cap=8192),
                       host="1-core virtual CPU mesh", rows=rows), f,
                  indent=2)
    print("\n| mode | mesh | ms/step | views/step | tiles/dev |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['mode']} | {r['mesh']} | {r['step_ms']:.1f} | "
              f"{r['views_per_step']} | {r['tiles_per_dev']} |")


if __name__ == "__main__":
    main()
