"""Pallas TPU kernel for the tile compositing stage of the rasterizer.

This is the perf-critical half of the splat rasterizer (SURVEY.md §7.3 hard
part 1). Projection + binning stay in XLA (`rasterizer.py`); this kernel
replaces the dense capacity-bound `_composite` path:

  - processes only `count[t]` real entries per tile (the dense path always
    pays `tile_capacity`), front-to-back with per-tile early termination
    once every pixel's transmittance saturates (like the CUDA original);
  - hot math is MXU-shaped: per 128-entry chunk, alphas are (PX, CHUNK)
    VPU work, the transmittance prefix is a (CHUNK, CHUNK) triangular
    matmul, and channel accumulation is a (NCH, CHUNK) x (CHUNK, PX) matmul;
  - the analytic backward replays chunks in REVERSE, carrying only the
    per-pixel transmittance and one per-pixel scalar ("behind" content
    dotted with the output gradient) — no per-entry forward state is stored
    beyond the final per-pixel log-transmittance;
  - **grid grouping**: measured per-grid-step overhead on this TPU is
    ~50-150us, so each program processes `group` tiles in an inner loop
    (grid = ceil(T / group)), amortizing the fixed cost group-fold.

Seam for autodiff: `composite_entries` takes the per-ENTRY buffer (already
gathered per sorted tile entry). The upstream jnp gathers give scatter-add
gradients to per-gaussian arrays for free, and the projection remains plain
differentiable jnp — so pose/means/scales/quats/opacity/color gradients all
flow (replacing both CUDA rasterizers' hand-written backwards).

Layouts (TPU constraints: HBM slices 128-lane aligned, no 1D vectors):
  entries_t: (NCH, Epad) f32, attr-major; each tile's segment starts at a
    128-aligned offset. Attr rows: 0 mean_u, 1 mean_v, 2 conic_a, 3 conic_b,
    4 conic_c, 5 opacity, 6-8 rgb, 9 depth, 10-15 pad.
  out: (Tpad, NCH, PX) f32; channels 0-2 rgb, 3 depth, 4 alpha,
    5 final log-transmittance.
  All in-kernel pixel tensors are (PX, CHUNK), (PX, 1) or (1, PX) — strict 2D.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCH = 16
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
LOG_T_MIN = -11.5  # stop once T < ~1e-5 everywhere in the tile


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests, virtual mesh)."""
    return jax.default_backend() != "tpu"


def _tri_excl_T(chunk: int):
    """U[k, j] = 1 iff k < j: exclusive prefix over the chunk dim as
    log1m (PX, CHUNK) @ U -> prefix (PX, CHUNK)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r < c).astype(jnp.float32)


def _tri_suffix_T(chunk: int):
    """L[k, j] = 1 iff k > j: exclusive suffix via wq (PX, CHUNK) @ L."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r > c).astype(jnp.float32)


def _pixel_coords(tile: int):
    """(PX, 1) local pixel coordinates (pixel index = v * tile + u)."""
    px = tile * tile
    p = jax.lax.broadcasted_iota(jnp.int32, (px, 1), 0)
    return (p % tile).astype(jnp.float32), (p // tile).astype(jnp.float32)


def _chunk_alpha(e_t, pu, pv, n_valid, chunk: int):
    """Alphas in (PX, CHUNK) orientation. e_t: (NCH, CHUNK) attr-major."""
    du = pu - e_t[0:1, :]        # (PX, CHUNK) via (PX,1) - (1,CHUNK)
    dv = pv - e_t[1:2, :]
    power = (
        -0.5 * (e_t[2:3, :] * du * du + e_t[4:5, :] * dv * dv)
        - e_t[3:4, :] * du * dv
    )
    g = jnp.exp(jnp.minimum(power, 0.0))
    slot_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) < n_valid
    )
    alpha = jnp.where((power <= 0.0) & slot_ok, e_t[5:6, :] * g, 0.0)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, g, du, dv


def _fwd_kernel(start_ref, count_ref, entries_hbm, out_ref, scratch, sem,
                *, chunk: int, tile: int, tiles_x: int, group: int,
                num_tiles: int):
    px = tile * tile
    base = pl.program_id(0) * group
    lu, lv = _pixel_coords(tile)
    tri = _tri_excl_T(chunk)

    def tile_body(g, _):
        t = base + g
        tc = jnp.minimum(t, num_tiles - 1)
        start = start_ref[tc]
        count = jnp.where(t < num_tiles, count_ref[tc], 0)
        pu = lu + ((t % tiles_x) * tile).astype(jnp.float32)
        pv = lv + ((t // tiles_x) * tile).astype(jnp.float32)
        num_chunks = (count + chunk - 1) // chunk

        def dma(ci):
            off = pl.multiple_of(start + ci * chunk, chunk)
            return pltpu.make_async_copy(
                entries_hbm.at[:, pl.ds(off, chunk)],
                scratch.at[ci % 2], sem.at[ci % 2],
            )

        def cond(carry):
            ci, log_t, acc = carry
            return (ci < num_chunks) & (jnp.max(log_t) > LOG_T_MIN)

        def body(carry):
            ci, log_t, acc = carry
            dma(ci).wait()
            # Prefetch the next chunk while computing this one.
            @pl.when(ci + 1 < num_chunks)
            def _():
                dma(ci + 1).start()

            e_t = scratch[ci % 2]
            alpha, _, _, _ = _chunk_alpha(e_t, pu, pv, count - ci * chunk,
                                          chunk)
            log1m = jnp.log1p(-alpha)                     # (PX, CHUNK)
            excl = jax.lax.dot_general(
                log1m, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            w = alpha * jnp.exp(excl + log_t)             # (PX, CHUNK)
            # acc (NCH, PX) += e_t (NCH, CHUNK) @ w^T (CHUNK, PX)
            contrib = jax.lax.dot_general(
                e_t, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            log_t = log_t + jnp.sum(log1m, axis=1, keepdims=True)
            return ci + 1, log_t, acc + contrib

        @pl.when(num_chunks > 0)
        def _():
            dma(0).start()

        log_t0 = jnp.zeros((px, 1), jnp.float32)
        acc0 = jnp.zeros((NCH, px), jnp.float32)
        eff, log_t, acc = jax.lax.while_loop(cond, body, (0, log_t0, acc0))
        # Drain the outstanding prefetch when the loop exited early.
        @pl.when((eff > 0) & (eff < num_chunks))
        def _():
            dma(eff).wait()

        log_t_row = jnp.transpose(log_t)                  # (1, PX)
        # channel 6 stores the EFFECTIVE chunk count (early termination) so
        # the backward pass replays only the chunks the forward composited.
        eff_row = jnp.full((1, px), eff.astype(jnp.float32))
        result = jnp.concatenate(
            [
                acc[6:10, :],                             # r g b depth
                1.0 - jnp.exp(log_t_row),                 # alpha
                log_t_row,
                eff_row,
                jnp.zeros((NCH - 7, px), jnp.float32),
            ],
            axis=0,
        )
        out_ref[pl.ds(g, 1)] = result[None]
        return 0

    jax.lax.fori_loop(0, group, tile_body, 0)


def _bwd_kernel(start_ref, count_ref, entries_hbm, fwd_out_ref, dout_ref,
                grad_hbm, scratch, gscratch, sem, gsem,
                *, chunk: int, tile: int, tiles_x: int, group: int,
                num_tiles: int):
    px = tile * tile
    base = pl.program_id(0) * group
    lu, lv = _pixel_coords(tile)
    tri = _tri_excl_T(chunk)
    tri_s = _tri_suffix_T(chunk)

    def tile_body(g, _):
        t = base + g
        tc = jnp.minimum(t, num_tiles - 1)
        start = start_ref[tc]
        count = jnp.where(t < num_tiles, count_ref[tc], 0)
        pu = lu + ((t % tiles_x) * tile).astype(jnp.float32)
        pv = lv + ((t // tiles_x) * tile).astype(jnp.float32)

        dout = dout_ref[g]                        # (NCH, PX)
        dout_px = jnp.transpose(dout[0:4, :])     # (PX, 4) rgb+depth cotang.
        d_alpha_map = jnp.transpose(dout[4:5, :])  # (PX, 1)
        log_t_final = jnp.transpose(fwd_out_ref[g][5:6, :])  # (PX, 1)
        # Replay only the chunks the forward actually composited.
        num_chunks = fwd_out_ref[g][6, 0].astype(jnp.int32)

        def dma(ci):
            off = pl.multiple_of(start + ci * chunk, chunk)
            return pltpu.make_async_copy(
                entries_hbm.at[:, pl.ds(off, chunk)],
                scratch.at[ci % 2], sem.at[ci % 2],
            )

        def body(carry):
            ci, log_t_end, b = carry
            off = pl.multiple_of(start + ci * chunk, chunk)
            dma(ci).wait()
            # Prefetch the next (reverse-order) chunk during compute.
            @pl.when(ci - 1 >= 0)
            def _():
                dma(ci - 1).start()

            e_t = scratch[ci % 2]
            alpha, g_, du, dv = _chunk_alpha(e_t, pu, pv, count - ci * chunk,
                                             chunk)
            log1m = jnp.log1p(-alpha)
            excl = jax.lax.dot_general(
                log1m, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            log_t_in = log_t_end - jnp.sum(log1m, axis=1, keepdims=True)
            T_i = jnp.exp(excl + log_t_in)                # (PX, CHUNK)
            w = alpha * T_i

            # q[p, j] = sum_c feat[j, c] dout[c, p]  (+ alpha channel f==1:
            # out_alpha = 1 - T_final = sum w_i, so the generic compositing
            # gradient covers the alpha output exactly).
            q = jax.lax.dot_general(
                dout_px, e_t[6:10, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + d_alpha_map                               # (PX, CHUNK)

            wq = w * q
            suffix = jax.lax.dot_general(
                wq, tri_s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            one_m = jnp.maximum(1.0 - alpha, 1e-6)
            d_alpha = T_i * q - (b + suffix) / one_m
            d_alpha = jnp.where(alpha > 0.0, d_alpha, 0.0)

            # Feature grads: dfeat[c, j] = sum_p dout[c, p] w[p, j].
            dfeat = jax.lax.dot_general(
                dout[0:4, :], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (4, CHUNK)

            dop = jnp.sum(d_alpha * g_, axis=0, keepdims=True)  # (1, CHUNK)
            dpower = d_alpha * alpha
            d_du = dpower * (-(e_t[2:3, :] * du + e_t[3:4, :] * dv))
            d_dv = dpower * (-(e_t[4:5, :] * dv + e_t[3:4, :] * du))
            dmu = -jnp.sum(d_du, axis=0, keepdims=True)
            dmv = -jnp.sum(d_dv, axis=0, keepdims=True)
            da = jnp.sum(-0.5 * du * du * dpower, axis=0, keepdims=True)
            db_ = jnp.sum(-du * dv * dpower, axis=0, keepdims=True)
            dc = jnp.sum(-0.5 * dv * dv * dpower, axis=0, keepdims=True)

            gscratch[:, :] = jnp.concatenate(
                [dmu, dmv, da, db_, dc, dop, dfeat,
                 jnp.zeros((NCH - 10, chunk), jnp.float32)],
                axis=0,
            )
            cpo = pltpu.make_async_copy(
                gscratch, grad_hbm.at[:, pl.ds(off, chunk)], gsem
            )
            cpo.start()
            cpo.wait()

            b_new = b + jnp.sum(wq, axis=1, keepdims=True)
            return ci - 1, log_t_in, b_new

        def cond(carry):
            ci, _, _ = carry
            return ci >= 0

        @pl.when(num_chunks > 0)
        def _():
            dma(num_chunks - 1).start()

        ci_end, _, _ = jax.lax.while_loop(
            cond, body,
            (num_chunks - 1, log_t_final, jnp.zeros((px, 1), jnp.float32)),
        )
        return 0

    jax.lax.fori_loop(0, group, tile_body, 0)


def _make_fwd(num_tiles, e_total, chunk, tile, tiles_x, group):
    px = tile * tile
    t_pad = -(-num_tiles // group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # start, count
        grid=(t_pad,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (group, NCH, px), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NCH, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, tile=tile,
                          tiles_x=tiles_x, group=group, num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad * group, NCH, px), jnp.float32),
        interpret=_interpret(),
    )


def _make_bwd(num_tiles, e_total, chunk, tile, tiles_x, group):
    px = tile * tile
    t_pad = -(-num_tiles // group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # entries
            pl.BlockSpec((group, NCH, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),         # fwd out
            pl.BlockSpec((group, NCH, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),         # dout
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),       # grad entries
        scratch_shapes=[
            pltpu.VMEM((2, NCH, chunk), jnp.float32),
            pltpu.VMEM((NCH, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, tile=tile,
                          tiles_x=tiles_x, group=group, num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCH, e_total), jnp.float32),
        interpret=_interpret(),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def composite_entries(entries_t, start, count, num_tiles: int, chunk: int,
                      tile: int, tiles_x: int, group: int):
    """entries_t (NCH, Epad) attr-major with chunk-aligned tile segments;
    returns (ceil(T/group)*group, NCH, PX) tile images."""
    return _make_fwd(num_tiles, entries_t.shape[1], chunk, tile, tiles_x,
                     group)(start, count, entries_t)


def _composite_fwd(entries_t, start, count, num_tiles, chunk, tile, tiles_x,
                   group):
    out = _make_fwd(num_tiles, entries_t.shape[1], chunk, tile, tiles_x,
                    group)(start, count, entries_t)
    return out, (entries_t, start, count, out)


def _composite_bwd(num_tiles, chunk, tile, tiles_x, group, res, dout):
    entries_t, start, count, out = res
    e_total = entries_t.shape[1]
    grads = _make_bwd(num_tiles, e_total, chunk, tile, tiles_x, group)(
        start, count, entries_t, out, dout
    )
    # The backward kernel writes only the chunks the FORWARD composited
    # (early termination; effective chunk counts live in out channel 6).
    # Columns never written — early-terminated chunks, alignment gaps and
    # the padded tail — hold uninitialized memory; zero them.
    eff_chunks = out[:num_tiles, 6, 0].astype(jnp.int32)
    e_idx = jnp.arange(e_total, dtype=jnp.int32)
    tile_of_entry = jnp.clip(
        jnp.searchsorted(start, e_idx, side="right") - 1, 0, num_tiles - 1
    )
    offset = e_idx - start[tile_of_entry]
    visited = (offset >= 0) & (offset < eff_chunks[tile_of_entry] * chunk)
    grads = jnp.where(visited[None, :], grads, 0.0)
    return (grads, None, None)


composite_entries.defvjp(_composite_fwd, _composite_bwd)
