"""Amortized micro-benchmark of the MAPPING iteration on the real TPU.

Decomposes the ~per-iteration cost of `optimize_submap` at bench scale
(262k gaussians, 1200x680): regular path (per-iteration center sort +
N-gather fwd + column scatter-add bwd) vs the resident-sorted path
(PERF.md roadmap #4), plus the loss-side cost (ssim & friends) in isolation.

Usage (from /root/repo, nothing else using the TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/map_bench.py [n] [iters]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

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
    f_dc = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return cam, (jnp.asarray(means), jnp.asarray(quats),
                 jnp.asarray(log_scales), jnp.asarray(opac),
                 jnp.asarray(f_dc))


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


def timed(fn, reps=3):
    _ = fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def load_npz_scene(path, n):
    """Real-scene occupancy: load a saved submap's gaussians, subsample or
    truncate to n rows (EAGS_MAPBENCH_NPZ mode)."""
    from eags_slam_tpu.core.camera import Camera

    d = np.load(path)
    m = d["g_xyz"].shape[0]
    idx = (np.random.default_rng(0).choice(m, n, replace=False)
           if m >= n else np.arange(m))
    pad = n - len(idx)

    def take(x, fill=0.0):
        out = x[idx]
        if pad:
            out = np.concatenate(
                [out, np.full((pad,) + x.shape[1:], fill, x.dtype)])
        return jnp.asarray(out)

    cam = Camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5, width=1200,
                 height=680)
    w2c = np.linalg.inv(d["Tmc"][0]).astype(np.float32)
    return cam, (take(d["g_xyz"]), take(d["g_quats"]),
                 take(d["g_log_scales"], -10.0),
                 take(d["g_opacity_logits"], -10.0),
                 take(d["g_f_dc"])), jnp.asarray(w2c), min(m, n), pad


def _decompose(state, kfs, cam, rcfg, mcfg, kf_w2c, floor):
    """Cumulative slices of one resident mapping iteration, each amortized
    over 20 reps chained in one jit (see PERF.md tunnel-floor rule)."""
    from eags_slam_tpu.core.sh import sh_to_rgb
    from eags_slam_tpu.ops.losses import isotropic_loss, masked_l1, ssim
    from eags_slam_tpu.ops.rasterizer import (render_sorted_resident,
                                              sorted_layout)
    from eags_slam_tpu.slam import mapper as M
    from eags_slam_tpu.utils import optim

    params, alive = state.params, state.alive
    w2c = jnp.asarray(kf_w2c, jnp.float32)
    order, seg_start, seg_cnt = jax.jit(
        lambda: sorted_layout(params.xyz, params.quats, params.log_scales,
                              params.opacity_logits, w2c, cam, rcfg,
                              alive=alive)
    )()
    jax.block_until_ready(order)
    perm = M._permute_rows((params, alive), order)
    params, alive = perm
    opt0 = M._split(params)
    f_dc = params.f_dc
    colors = sh_to_rgb(f_dc)
    gt_c, gt_d = kfs.color[0], kfs.depth[0]
    tiles_x = -(-cam.width // rcfg.tile)
    tiles_y = -(-cam.height // rcfg.tile)

    def render_out(opt):
        return render_sorted_resident(
            opt.xyz, opt.quats, opt.log_scales, opt.opacity_logits, colors,
            w2c, seg_start, seg_cnt, cam, rcfg, alive=alive)

    def loss_plain(opt):
        out = render_out(opt)
        return (jnp.sum(out.color)
                + jnp.sum(jnp.where(jnp.isnan(out.depth), 0.0, out.depth)),
                jnp.zeros((tiles_x * tiles_y,)))

    def loss_full(opt, with_res):
        out = render_out(opt)
        image = jnp.clip(out.color * jnp.exp(0.01) + 0.001, 0.0, 1.0)
        mask = (gt_d > 0) & ~jnp.isnan(out.depth)
        cl1 = masked_l1(image, gt_c, mask.astype(image.dtype))
        cl = (1 - mcfg.lambda_dssim) * cl1 + mcfg.lambda_dssim * (
            1.0 - ssim(image, gt_c))
        dl = masked_l1(out.depth, gt_d, mask.astype(image.dtype))
        reg = isotropic_loss(opt.log_scales, alive)
        total = cl + dl + reg
        if with_res:
            from eags_slam_tpu.ops.rasterizer import tile_sums
            err = (jnp.abs(image - gt_c).mean(-1)
                   + jnp.abs(jnp.nan_to_num(out.depth) - gt_d)
                   ) * mask.astype(image.dtype)
            res = tile_sums(err, rcfg.tile, tiles_x, tiles_y)
        else:
            res = jnp.zeros((tiles_x * tiles_y,))
        return total, jax.lax.stop_gradient(res)

    lr_tree = M.OptimizedParams(xyz=1e-4, log_scales=1e-3, quats=1e-3,
                                opacity_logits=0.025)
    gmask = alive.astype(jnp.float32)

    def stage(label, loss_fn, do_adam=False, do_book=False, reps=20):
        def many(opt_in):
            adam0 = optim.adam_init(opt_in)
            book0 = M._BookState(
                best_loss=jnp.array(jnp.inf), ema=jnp.array(0.0),
                ckpt_opt=opt_in, ckpt_adam=adam0,
                has_ckpt=jnp.array(False),
                early_cnt=jnp.zeros((), jnp.int32),
                stopped=jnp.array(False))

            def step(carry, it):
                c, opt, adam, book, al = carry
                optp = jax.tree.map(
                    lambda x: x + c * 1e-20 if x.dtype == jnp.float32 else x,
                    opt)
                (total, res), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(optp)
                c = c + total * 1e-20 + res[0] * 1e-20
                if do_adam:
                    grads = jax.tree.map(
                        lambda g: g * gmask.reshape(
                            (-1,) + (1,) * (g.ndim - 1)), grads)
                    opt, adam = optim.adam_update(adam, optp, grads, lr_tree)
                    c = c + opt.xyz[0, 0] * 1e-20
                if do_book:
                    book, opt, adam, al = M._book_step(
                        book, it, total, opt, adam, al,
                        pruning_thre=mcfg.pruning_thre, ckpt_every=5,
                        early_thre=5, prune_iters=(7, 13), ema_beta=0.8)
                    c = c + book.ema * 1e-20
                return (c, opt, adam, book, al), ()

            (c, *_), _ = jax.lax.scan(
                step, (jnp.float32(0), opt_in, adam0, book0, alive),
                jnp.arange(reps))
            return c

        jf = jax.jit(many)
        _ = float(jf(opt0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jf(opt0))
            ts.append(time.perf_counter() - t0)
        per = (float(np.median(ts)) - floor) / reps
        print(f"[{label}] per-iter {per*1e3:7.2f} ms")
        return per

    def loss_l1_only(opt):
        out = render_out(opt)
        image = jnp.clip(out.color * jnp.exp(0.01) + 0.001, 0.0, 1.0)
        mask = (gt_d > 0) & ~jnp.isnan(out.depth)
        cl1 = masked_l1(image, gt_c, mask.astype(image.dtype))
        dl = masked_l1(out.depth, gt_d, mask.astype(image.dtype))
        return cl1 + dl, jnp.zeros((tiles_x * tiles_y,))

    def loss_ssim_only(opt):
        out = render_out(opt)
        image = jnp.clip(out.color, 0.0, 1.0)
        return 1.0 - ssim(image, gt_c), jnp.zeros((tiles_x * tiles_y,))

    stage("D1 render-grad sum-loss      ", loss_plain)
    stage("D1a  masked l1 only          ", loss_l1_only)
    stage("D1b  ssim only               ", loss_ssim_only)
    stage("D2 render-grad full loss     ", lambda o: loss_full(o, False))
    stage("D2r  + freeze residual map   ", lambda o: loss_full(o, True))
    stage("D3   + adam update           ", lambda o: loss_full(o, False),
          do_adam=True)
    stage("D4   + book_step             ", lambda o: loss_full(o, False),
          do_adam=True, do_book=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    h, w = 680, 1200

    from eags_slam_tpu.core import gaussians as G
    from eags_slam_tpu.ops.rasterizer import RasterConfig
    from eags_slam_tpu.slam import mapper as M

    npz = os.environ.get("EAGS_MAPBENCH_NPZ")
    kf_w2c = jnp.eye(4)
    if npz:
        cam, (means, quats, log_scales, opac, f_dc), kf_w2c, n_real, pad = (
            load_npz_scene(npz, n))
        print(f"npz scene {npz}: {n_real} real rows, {pad} padded")
    else:
        cam, (means, quats, log_scales, opac, f_dc) = make_scene(n, h, w)
    rcfg = RasterConfig(tile=32, dup_side=3, group=8, backend="sorted",
                        seg_cap=1024, bands=3)
    from _bench_common import apply_rcfg_env
    rcfg = apply_rcfg_env(rcfg)
    floor = measure_floor()
    print(f"backend={jax.default_backend()} n={n} {w}x{h} iters={iters} "
          f"floor={floor*1e3:.1f}ms")

    # Build a GaussianState + 4-keyframe batch (distinct poses).
    state = G.empty_state(n)
    params = state.params._replace(
        xyz=means, f_dc=f_dc, log_scales=log_scales, quats=quats,
        opacity_logits=opac,
    )
    alive = (jnp.arange(n) < (n_real if npz else n))
    state = G.GaussianState(params, alive, state.adam)

    rng = np.random.default_rng(1)
    kfs = M.empty_keyframes(8, cam)
    for k in range(4):
        c = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        d = jnp.asarray(rng.uniform(1.0, 5.0, (h, w)).astype(np.float32))
        kfs = M.push_keyframe(kfs, k, c, d, kf_w2c, jnp.zeros(2))
    jax.block_until_ready(kfs.color)

    key = jax.random.PRNGKey(0)

    def opt_time(mcfg, label):
        def run():
            out, aux = M.optimize_submap(state, kfs, jnp.asarray(4, jnp.int32),
                                         key, iters, cam, rcfg, mcfg)
            # Honest fetch: pull a value that depends on the whole scan.
            return float(jnp.sum(aux["losses"]))

        t = timed(run)
        per = (t - floor) / iters
        print(f"[{label}] total {t*1e3:8.1f} ms  per-iter {per*1e3:7.2f} ms")
        return per

    base = M.MapperConfig(max_keyframes=8)
    mode = os.environ.get("EAGS_MAPBENCH_MODE", "all")
    if mode == "decompose":
        # Split the resident mapping iteration into cumulative slices to
        # locate the gap between the isolated kernel fwd+bwd (~25 ms at
        # 262k, PERF.md) and the in-loop per-iter cost (~35 ms): D1
        # render-grad only, D2 + the real loss stack, D2r + the freeze-
        # ranking residual map, D3 + Adam, D4 + book_step.
        _decompose(state, kfs, cam, rcfg, base, kf_w2c, floor)
        return
    if mode in ("all", "sweep"):
        opt_time(base._replace(kf_block=0), "regular  kf_block=0 ")
        opt_time(base._replace(kf_block=5), "resident kf_block=5 ")
        opt_time(base._replace(kf_block=10), "resident kf_block=10")
        opt_time(base._replace(kf_block=20), "resident kf_block=20")
    elif mode == "resident10":
        opt_time(base._replace(kf_block=10), "resident kf_block=10")
    if mode == "sweep":
        return

    # Loss-side cost, amortized: render-only grad vs render+mapping-loss
    # grad, each REPS chained inside one jit (single-dispatch numbers are
    # floor noise).
    from eags_slam_tpu.core.sh import sh_to_rgb
    from eags_slam_tpu.ops.losses import isotropic_loss, masked_l1, ssim
    from eags_slam_tpu.ops.rasterizer import render

    gt_c, gt_d = kfs.color[0], kfs.depth[0]
    alive = jnp.ones((n,), bool)
    w2c0 = jnp.eye(4)

    def render_sum(xyz):
        out = render(xyz, quats, log_scales, opac, sh_to_rgb(f_dc), w2c0,
                     cam, rcfg, alive=alive)
        return jnp.sum(out.color) + jnp.sum(jnp.where(jnp.isnan(out.depth),
                                                      0.0, out.depth))

    def render_loss(xyz):
        out = render(xyz, quats, log_scales, opac, sh_to_rgb(f_dc), w2c0,
                     cam, rcfg, alive=alive)
        image = jnp.clip(out.color, 0.0, 1.0)
        mask = (gt_d > 0) & ~jnp.isnan(out.depth)
        m3 = mask[..., None].astype(image.dtype)
        cl1 = masked_l1(image, gt_c, jnp.tile(m3, (1, 1, 3)))
        cl = 0.8 * cl1 + 0.2 * (1.0 - ssim(image, gt_c))
        dl = masked_l1(out.depth, gt_d, mask.astype(image.dtype))
        reg = isotropic_loss(log_scales, alive)
        return cl + dl + reg

    def amortized_grad(fn, reps=10):
        def many(x):
            def step(carry, _):
                g = jax.grad(fn)(means + carry * 1e-20)
                return carry + g.reshape(-1)[0] * 1e-20, ()
            carry, _ = jax.lax.scan(step, jnp.float32(0), None, length=reps)
            return carry

        jf = jax.jit(many)
        _ = float(jf(means))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jf(means))
            ts.append(time.perf_counter() - t0)
        return (float(np.median(ts)) - floor) / reps

    t1 = amortized_grad(render_sum)
    print(f"[loss] render-only grad/iter:   {t1*1e3:7.2f} ms")
    t2 = amortized_grad(render_loss)
    print(f"[loss] render+loss grad/iter:   {t2*1e3:7.2f} ms  "
          f"(loss side {1e3*(t2-t1):.2f} ms)")


if __name__ == "__main__":
    main()
