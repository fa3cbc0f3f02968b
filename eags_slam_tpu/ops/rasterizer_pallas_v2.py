"""Pallas TPU kernels for the center-tile-sorted rasterizer (v2).

Replaces the v1 entry pipeline (duplicate into N*dup^2 entries -> sort ->
id-scatter -> attr-gather, ~30 ms of per-index XLA work per render at 262k
gaussians) with in-kernel binning over a CENTER-TILE-SORTED per-gaussian
attribute array:

  - XLA sorts the N gaussians once by (center_tile, depth) — N indices, not
    N*dup^2 — and hands the kernel per-(tile, band) contiguous segments of
    the sorted array (`rasterizer.py:_sorted_layout`).
  - The kernel DMAs each tile's `B` band segments (128-aligned, static
    size), tests exact tile coverage, and restores global front-to-back
    order with a RANK PASS (rank_j = #keys < key_j via chunked broadcast
    compares) — no scatter/gather/sort primitives, all VPU compare+reduce.
  - Depth-ordered chunks are materialized with one-hot MXU matmuls:
    e_chunk (NCH, 128) = attrs (NCH, CAPT) @ onehot(rank==i)^T.
  - The backward replays chunks in reverse (same recompute), accumulates
    per-entry grads into a VMEM (NCH, CAPT) buffer via the transposed
    one-hot matmul, and read-modify-writes the three band segments of the
    global grad array once per tile (grid steps are sequential on a
    single-TensorCore v5e, so cross-tile overlapping segments are safe).

Measured on this v5e (see PERF.md): full fwd compositing incl. in-kernel
binning ~14 us/tile at ~1000 candidates/tile — vs ~45 us/tile for the v1
XLA binning + kernel chain. The per-dispatch axon-tunnel floor is ~32 ms;
all numbers amortized (scripts/raster_bench.py).

Replaces the CUDA tile-binned rasterizers of the reference (SURVEY.md §2.3,
src/utils/utils.py:149-186 and src/gsr/renderer.py:117-142); pose gradients
flow through the traced projection as before.

Channel layout (NCH=16, attr-major):
  0 mean_u, 1 mean_v, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
  6 r, 7 g, 8 b, 9 depth, 10 radius (coverage only, non-diff), 11-15 pad.
Out block per tile (NCH, PX): 0-3 rgb+depth, 4 alpha, 5 log_T, 6 effective
chunk count (for backward replay), 7 n_survivors (debug).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterizer_pallas import (ALPHA_MAX, ALPHA_MIN, LOG_T_MIN, NCH,
                                _chunk_alpha, _interpret, _pixel_coords,
                                _tri_excl_T, _tri_suffix_T)

CHUNK = 128
INT_MAX = jnp.iinfo(jnp.int32).max


def _basis(tile: int):
    """(PX, 8) TILE-LOCAL quadratic pixel basis [lu^2, lv^2, lu*lv, lu, lv,
    1, 0, 0]: the per-(pixel, gaussian) EWA exponent becomes ONE small MXU
    matmul `power = P @ G` instead of ~15 VPU ops per (pixel, candidate)
    element — the dominant fwd VPU cost at SLAM scale. Tile-LOCAL
    coordinates keep the basis magnitudes <= tile^2 so the f32 matmul loses
    no precision to cancellation (global pixel coords would put ~1e6-sized
    terms against an O(1) result)."""
    px = tile * tile
    j = jax.lax.broadcasted_iota(jnp.int32, (px, 8), 1)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (px, 8), 0)
    lu = (pidx % tile).astype(jnp.float32)
    lv = (pidx // tile).astype(jnp.float32)
    return (
        jnp.where(j == 0, lu * lu, 0.0)
        + jnp.where(j == 1, lv * lv, 0.0)
        + jnp.where(j == 2, lu * lv, 0.0)
        + jnp.where(j == 3, lu, 0.0)
        + jnp.where(j == 4, lv, 0.0)
        + jnp.where(j == 5, 1.0, 0.0)
    )


def _gmat_chunk(e_t, tx0, ty0):
    """(8, CHUNK) per-gaussian quadform coefficients in tile-local coords:
    power(p, i) = P(p) . G(i) for P = [lu^2, lv^2, lu*lv, lu, lv, 1, 0, 0],
    expanding -0.5 a du^2 - 0.5 c dv^2 - b du dv with du = lu - u_loc."""
    u_ = e_t[0:1, :] - tx0
    v_ = e_t[1:2, :] - ty0
    a_, b_, c_ = e_t[2:3, :], e_t[3:4, :], e_t[4:5, :]
    g3 = a_ * u_ + b_ * v_
    g4 = c_ * v_ + b_ * u_
    g5 = -0.5 * (a_ * u_ * u_ + c_ * v_ * v_) - b_ * u_ * v_
    zero = jnp.zeros_like(a_)
    return jnp.concatenate(
        [-0.5 * a_, -0.5 * c_, -b_, g3, g4, g5, zero, zero], axis=0
    )


def _chunk_alpha_mxu(P, G_c, op_row, n_valid, chunk: int):
    """Alphas (PX, CHUNK) from the MXU quadform; returns (alpha, g)."""
    power = jax.lax.dot_general(
        P, G_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = jnp.exp(jnp.minimum(power, 0.0))
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) < n_valid
    alpha = jnp.where((power <= 0.0) & slot_ok, op_row * g, 0.0)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, g


def _mm(a, b, bf16: bool):
    """dot(a, b) contracting a's last dim with b's first, optionally with
    bf16 inputs (f32 accumulate). The triangular prefix/suffix matmuls are
    the largest MXU terms; their bf16 form halves-to-thirds the pass count
    at <=0.4% relative weight error (flag: RasterConfig.kernel_bf16)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def to_bf16_layout(attrs):
    """(NCH, Npad) f32 ORIGINAL-layout attrs -> (NCH, Npad) bf16 DMA layout.

    The band-segment DMA is the largest single kernel cost (~5 ms of a
    ~13 ms full-image fwd at 262k gaussians); storing the DMA'd attrs in
    bf16 halves it. Rows needing more than bf16 precision travel as hi/lo
    pairs (u, v: 1200 px would quantize to ~4 px; depth feeds the ordering
    keys and the depth-L1 loss): 0 u_hi, 1 u_lo, 2 v_hi, 3 v_lo, 4 conic_a,
    5 conic_b, 6 conic_c, 7 opacity, 8 r, 9 g, 10 b, 11 depth_hi,
    12 depth_lo, 13 radius, 14-15 zero. Conic/opacity/rgb/radius ride as
    single bf16 (<=0.4% relative — under SGD noise, same envelope as the
    bf16 triangular matmuls). The conversion lives INSIDE the custom-vjp
    boundary: callers keep the f32 original-layout interface and the
    backward kernel still emits f32 original-layout grads."""
    f32 = jnp.float32
    bf = jnp.bfloat16

    def split(x):
        hi = x.astype(bf)
        lo = (x - hi.astype(f32)).astype(bf)
        return hi, lo

    u_hi, u_lo = split(attrs[0])
    v_hi, v_lo = split(attrs[1])
    d_hi, d_lo = split(attrs[9])
    b16 = attrs.astype(bf)
    z = jnp.zeros_like(u_hi)
    return jnp.stack(
        [u_hi, u_lo, v_hi, v_lo, b16[2], b16[3], b16[4], b16[5], b16[6],
         b16[7], b16[8], d_hi, d_lo, b16[10], z, z], axis=0)


def _rebuild_f32(bufw, bsrc):
    """Unpack a bf16 DMA-layout buffer (NCH, capt) into ORIGINAL-layout f32
    rows of the bufw scratch (see to_bf16_layout)."""
    f32 = jnp.float32
    bufw[0:1, :] = bsrc[0:1].astype(f32) + bsrc[1:2].astype(f32)
    bufw[1:2, :] = bsrc[2:3].astype(f32) + bsrc[3:4].astype(f32)
    bufw[2:9, :] = bsrc[4:11].astype(f32)      # conic a/b/c, op, rgb
    bufw[9:10, :] = bsrc[11:12].astype(f32) + bsrc[12:13].astype(f32)
    bufw[10:11, :] = bsrc[13:14].astype(f32)
    bufw[11:, :] = jnp.zeros_like(bufw[11:, :])


def _band_dma(attrs_hbm, buf, sem, start_al, b, seg_cap):
    return pltpu.make_async_copy(
        attrs_hbm.at[:, pl.ds(start_al, seg_cap)],
        buf.at[:, b * seg_cap:(b + 1) * seg_cap],
        sem.at[b],
    )


def _candidates(start_ref, cnt_ref, buf, t, *, bands, seg_cap, tile,
                tiles_x):
    """Validity, exact-coverage mask and packed depth keys for one tile's
    loaded candidate buffer (1, CAPT).

    start_ref/cnt_ref are FLAT (T*bands,) int32 — a (T, bands) SMEM array
    would be lane-padded to (T, 128) and blow the 1 MB SMEM budget
    (observed: 1.65 MB at tile=16 on a 1200x680 frame)."""
    capt = bands * seg_cap
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, capt), 1)
    lane_in_band = lane % seg_cap
    band = lane // seg_cap
    valid = jnp.zeros((1, capt), jnp.bool_)
    for b in range(bands):
        start = start_ref[t * bands + b]
        lead = start - (start // CHUNK) * CHUNK
        vb = (lane_in_band >= lead) & (lane_in_band < lead + cnt_ref[t * bands + b])
        valid = valid | ((band == b) & vb)

    u = buf[0:1, :]
    v = buf[1:2, :]
    r = buf[10:11, :]
    tx0 = ((t % tiles_x) * tile).astype(jnp.float32)
    ty0 = ((t // tiles_x) * tile).astype(jnp.float32)
    cover = (
        valid & (r > 0.0)
        & (u + r > tx0) & (u - r < tx0 + tile)
        & (v + r > ty0) & (v - r < ty0 + tile)
    )
    depth = buf[9:10, :]
    dbits = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 1e-6), jnp.int32
    )
    # Pack the lane index into the low bits for a strict total order
    # (capt <= 4096 -> 12 bits; drops ~2^-11 relative depth resolution,
    # ties broken deterministically by lane).
    key = jnp.where(cover, (dbits & ~4095) | lane, INT_MAX - capt + lane)
    return cover, key


def _rank_pass(key, capt):
    """rank_j = #(key_i < key_j): chunked all-pairs broadcast compares."""
    rank = jnp.zeros((1, capt), jnp.int32)
    for ci in range(capt // CHUNK):
        kc = key[:, ci * CHUNK:(ci + 1) * CHUNK]
        lt = (jnp.transpose(kc) < key).astype(jnp.int32)  # (CHUNK, capt)
        rank = rank + jnp.sum(lt, axis=0, keepdims=True)
    return rank


def _rank_pass_banded(key, key_ref, start_ref, cnt_ref, t, *, bands,
                      seg_cap, capt):
    """Occupancy-bounded rank pass: compare only against the leading
    ceil((lead_b + cnt_b)/CHUNK) chunks of each band (the rest of the band
    holds only sentinel keys).

    Exactness: a skipped chunk contributes rank only to other SENTINEL
    lanes. Every covered lane's key is below every sentinel key, so covered
    ranks are exact; sentinel lanes keep rank >= n_surv (every covered lane
    still counts below them), and composite slots >= n_surv are masked by
    `_chunk_alpha`, so sentinel rank collisions above n_surv are inert.
    At SLAM-scale occupancy (~25-40% of capt) this cuts the dominant VPU
    compare cost of the kernel ~2.5-4x."""
    key_ref[...] = key
    rank = jnp.zeros((1, capt), jnp.int32)
    for b in range(bands):
        start = start_ref[t * bands + b]
        lead = start - (start // CHUNK) * CHUNK
        n_lanes = lead + cnt_ref[t * bands + b]
        n_chunks = (n_lanes + CHUNK - 1) // CHUNK

        def body(ci, r, b=b):
            off = pl.multiple_of(b * seg_cap + ci * CHUNK, CHUNK)
            kc = key_ref[0:1, pl.ds(off, CHUNK)]
            lt = (jnp.transpose(kc) < key).astype(jnp.int32)
            return r + jnp.sum(lt, axis=0, keepdims=True)

        rank = jax.lax.fori_loop(0, n_chunks, body, rank)
    return rank


def _onehot(rank, base, capt):
    """M[i, j] = 1 iff rank_j == base + i  -> (CHUNK, capt) f32."""
    sel = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + base
    return (rank == sel).astype(jnp.float32)


def _fwd_kernel(start_ref, cnt_ref, ids_ref, attrs_hbm, out_ref, rank_ref,
                buf, bufw, key_ref, sem, *, tile: int, tiles_x: int, group: int,
                n_sel: int, bands: int, seg_cap: int, bf16: bool,
                quadform: bool, emit_rank: bool):
    px = tile * tile
    capt = bands * seg_cap
    base_t = pl.program_id(0) * group
    P = _basis(tile) if quadform else None
    lu, lv = _pixel_coords(tile)
    tri = _tri_excl_T(CHUNK)

    def tile_of(s):
        return ids_ref[jnp.minimum(s, n_sel - 1)]

    def start_tile_dmas(slot, s):
        tc = tile_of(s)
        for b in range(bands):
            start = start_ref[tc * bands + b]
            al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            _band_dma(attrs_hbm, buf.at[slot], sem.at[slot], al, b,
                      seg_cap).start()

    def wait_tile_dmas(slot, s):
        tc = tile_of(s)
        for b in range(bands):
            start = start_ref[tc * bands + b]
            al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            _band_dma(attrs_hbm, buf.at[slot], sem.at[slot], al, b,
                      seg_cap).wait()

    start_tile_dmas(0, base_t)

    def tile_body(g, _):
        s = base_t + g
        tc = tile_of(s)
        slot = g % 2
        wait_tile_dmas(slot, s)
        # Prefetch the next tile's bands during this tile's compute.
        @pl.when(g + 1 < group)
        def _():
            start_tile_dmas((g + 1) % 2, s + 1)

        if bf16:
            _rebuild_f32(bufw, buf[slot])
            bufs = bufw[...]
        else:
            bufs = buf[slot]
        cover, key = _candidates(start_ref, cnt_ref, bufs, tc, bands=bands,
                                 seg_cap=seg_cap, tile=tile, tiles_x=tiles_x)
        is_live = s < n_sel
        n_surv = jnp.where(is_live, jnp.sum(cover.astype(jnp.int32)), 0)
        rank = _rank_pass_banded(key, key_ref, start_ref, cnt_ref, tc,
                                 bands=bands, seg_cap=seg_cap, capt=capt)
        # Persist the rank for the backward replay: recomputing it there
        # (candidates + banded rank pass) was the dominant bwd cost.
        # Inference-only renders (no vjp) skip the write — ~capt*4 B/tile
        # of dead HBM traffic otherwise (ADVICE r2).
        if emit_rank:
            rank_ref[0, pl.ds(g, 1)] = rank

        tx0 = ((tc % tiles_x) * tile).astype(jnp.float32)
        ty0 = ((tc // tiles_x) * tile).astype(jnp.float32)
        pu = lu + tx0
        pv = lv + ty0
        num_chunks = (n_surv + CHUNK - 1) // CHUNK

        def cond(carry):
            ci, log_t, acc = carry
            return (ci < num_chunks) & (jnp.max(log_t) > LOG_T_MIN)

        def body(carry):
            ci, log_t, acc = carry
            M = _onehot(rank, ci * CHUNK, capt)
            e_t = jax.lax.dot_general(
                bufs[:, :], M, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (NCH, CHUNK)
            if quadform:
                G_c = _gmat_chunk(e_t, tx0, ty0)
                alpha, _ = _chunk_alpha_mxu(P, G_c, e_t[5:6, :],
                                            n_surv - ci * CHUNK, CHUNK)
            else:
                alpha, _, _, _ = _chunk_alpha(e_t, pu, pv,
                                              n_surv - ci * CHUNK, CHUNK)
            log1m = jnp.log1p(-alpha)                      # (PX, CHUNK)
            excl = _mm(log1m, tri, bf16)
            w = alpha * jnp.exp(excl + log_t)
            contrib = jax.lax.dot_general(
                e_t, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (NCH, PX)
            log_t = log_t + jnp.sum(log1m, axis=1, keepdims=True)
            return ci + 1, log_t, acc + contrib

        log_t0 = jnp.zeros((px, 1), jnp.float32)
        acc0 = jnp.zeros((NCH, px), jnp.float32)
        eff, log_t, acc = jax.lax.while_loop(cond, body, (0, log_t0, acc0))

        log_t_row = jnp.transpose(log_t)
        result = jnp.concatenate(
            [
                acc[6:10, :],                              # r g b depth
                1.0 - jnp.exp(log_t_row),                  # alpha
                log_t_row,
                jnp.full((1, px), eff.astype(jnp.float32)),
                jnp.full((1, px), n_surv.astype(jnp.float32)),
                jnp.zeros((NCH - 8, px), jnp.float32),
            ],
            axis=0,
        )
        out_ref[pl.ds(g, 1)] = result[None]
        return 0

    jax.lax.fori_loop(0, group, tile_body, 0)


def _replay_chunks(bufs, rank, n_surv, fwd_g, dout_g, gbuf, tc, *,
                   tile: int, tiles_x: int, quadform: bool, bf16: bool,
                   P, lu, lv, tri, tri_s):
    """Reverse chunk replay for ONE tile `tc`: recompute alphas/weights from
    the attr buffer `bufs` (NCH, capt) and accumulate ALL per-entry grads
    into `gbuf` (NCH, capt) in the tile's band-window lane layout.

    Shared by the rmw backward (`_bwd_kernel`, grads scattered to the global
    per-gaussian array) and the pose-contraction backward
    (`_pose_bwd_kernel`, grads contracted against pose jacobians in VMEM).
    fwd_g / dout_g are the tile's forward-output and output-cotangent blocks
    (NCH, PX); rank is the forward's persisted depth rank (1, capt)."""
    px = tile * tile
    dout_px = jnp.transpose(dout_g[0:4, :])                # (PX, 4)
    d_alpha_map = jnp.transpose(dout_g[4:5, :])            # (PX, 1)
    log_t_final = jnp.transpose(fwd_g[5:6, :])
    eff = fwd_g[6, 0].astype(jnp.int32)

    tx0 = ((tc % tiles_x) * tile).astype(jnp.float32)
    ty0 = ((tc // tiles_x) * tile).astype(jnp.float32)
    pu = lu + tx0
    pv = lv + ty0
    capt = gbuf.shape[1]

    gbuf[:, :] = jnp.zeros((NCH, capt), jnp.float32)

    def body(carry):
        ci, log_t_end, bvec = carry
        M = _onehot(rank, ci * CHUNK, capt)
        e_t = jax.lax.dot_general(
            bufs[:, :], M, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if quadform:
            G_c = _gmat_chunk(e_t, tx0, ty0)
            alpha, g_ = _chunk_alpha_mxu(P, G_c, e_t[5:6, :],
                                         n_surv - ci * CHUNK, CHUNK)
            du = dv = None
        else:
            alpha, g_, du, dv = _chunk_alpha(e_t, pu, pv,
                                             n_surv - ci * CHUNK, CHUNK)
        log1m = jnp.log1p(-alpha)
        excl = _mm(log1m, tri, bf16)
        log_t_in = log_t_end - jnp.sum(log1m, axis=1, keepdims=True)
        T_i = jnp.exp(excl + log_t_in)
        w = alpha * T_i

        q = jax.lax.dot_general(
            dout_px, e_t[6:10, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + d_alpha_map                                # (PX, CHUNK)

        wq = w * q
        suffix = _mm(wq, tri_s, bf16)
        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = T_i * q - (bvec + suffix) / one_m
        d_alpha = jnp.where(alpha > 0.0, d_alpha, 0.0)

        dfeat = jax.lax.dot_general(
            dout_g[0:4, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (4, CHUNK)
        dop = jnp.sum(d_alpha * g_, axis=0, keepdims=True)
        dpower = d_alpha * alpha
        if quadform:
            # Quadform cotangents via dpower-weighted basis MOMENTS —
            # one (8, PX) x (PX, CHUNK) MXU matmul replaces the five
            # VPU (PX, CHUNK)-sized reductions: S rows are sums of
            # [lu^2, lv^2, lu*lv, lu, lv, 1] weighted by dpower.
            S = jax.lax.dot_general(
                P, dpower, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # (8, CHUNK)
            u_ = e_t[0:1, :] - tx0
            v_ = e_t[1:2, :] - ty0
            a_, b_, c_ = e_t[2:3, :], e_t[3:4, :], e_t[4:5, :]
            su_c = S[3:4, :] - u_ * S[5:6, :]
            sv_c = S[4:5, :] - v_ * S[5:6, :]
            dmu = a_ * su_c + b_ * sv_c
            dmv = c_ * sv_c + b_ * su_c
            da = -0.5 * (S[0:1, :] - 2.0 * u_ * S[3:4, :]
                         + u_ * u_ * S[5:6, :])
            db_ = -(S[2:3, :] - u_ * S[4:5, :] - v_ * S[3:4, :]
                    + u_ * v_ * S[5:6, :])
            dc = -0.5 * (S[1:2, :] - 2.0 * v_ * S[4:5, :]
                         + v_ * v_ * S[5:6, :])
        else:
            d_du = dpower * (-(e_t[2:3, :] * du + e_t[3:4, :] * dv))
            d_dv = dpower * (-(e_t[4:5, :] * dv + e_t[3:4, :] * du))
            dmu = -jnp.sum(d_du, axis=0, keepdims=True)
            dmv = -jnp.sum(d_dv, axis=0, keepdims=True)
            da = jnp.sum(-0.5 * du * du * dpower, axis=0, keepdims=True)
            db_ = jnp.sum(-du * dv * dpower, axis=0, keepdims=True)
            dc = jnp.sum(-0.5 * dv * dv * dpower, axis=0,
                         keepdims=True)

        dG = jnp.concatenate(
            [dmu, dmv, da, db_, dc, dop, dfeat,
             jnp.zeros((NCH - 10, CHUNK), jnp.float32)],
            axis=0,
        )                                              # (NCH, CHUNK)
        # Un-permute back to buffer lanes: gbuf += dG @ M.
        gbuf[:, :] = gbuf[:, :] + jax.lax.dot_general(
            dG, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bvec_new = bvec + jnp.sum(wq, axis=1, keepdims=True)
        return ci - 1, log_t_in, bvec_new

    jax.lax.while_loop(
        lambda c: c[0] >= 0, body,
        (eff - 1, log_t_final, jnp.zeros((px, 1), jnp.float32)),
    )


def _bwd_kernel(start_ref, cnt_ref, ids_ref, attrs_hbm, fwd_out_ref,
                rank_in_ref, dout_ref, zeros_in_ref, grad_hbm, *scratch,
                tile: int, tiles_x: int, group: int, n_sel: int, bands: int,
                seg_cap: int, bf16: bool, quadform: bool, window: bool):
    if window:
        buf, bufw, gbuf, rrbuf, wbuf, gacc, sem, rsem, wsem = scratch
    else:
        buf, bufw, gbuf, gtmp, sem, gsem, gsem_w = scratch
    px = tile * tile
    capt = bands * seg_cap
    base_t = pl.program_id(0) * group
    P = _basis(tile) if quadform else None
    lu, lv = _pixel_coords(tile)
    tri = _tri_excl_T(CHUNK)
    tri_s = _tri_suffix_T(CHUNK)

    def tile_of(s):
        return ids_ref[jnp.minimum(s, n_sel - 1)]

    def _band_al(tc, b):
        start = start_ref[tc * bands + b]
        return pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)

    def _gwin(al):
        return grad_hbm.at[:, pl.ds(al, seg_cap)]

    def start_tile_dmas(slot, s):
        tc = tile_of(s)
        for b in range(bands):
            start = start_ref[tc * bands + b]
            al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            _band_dma(attrs_hbm, buf.at[slot], sem.at[slot], al, b,
                      seg_cap).start()

    def wait_tile_dmas(slot, s):
        tc = tile_of(s)
        for b in range(bands):
            start = start_ref[tc * bands + b]
            al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            _band_dma(attrs_hbm, buf.at[slot], sem.at[slot], al, b,
                      seg_cap).wait()

    start_tile_dmas(0, base_t)

    def _replay(g, tc, slot, is_live):
        """Reverse chunk replay for one tile into gbuf (see _replay_chunks).
        Attr band DMAs must already be waited."""
        if bf16:
            _rebuild_f32(bufw, buf[slot])
            bufs = bufw[...]
        else:
            bufs = buf[slot]
        # Rank + survivor count persisted by the forward kernel (out ch 7):
        # no candidates / rank-pass recomputation in the replay.
        rank = rank_in_ref[0, pl.ds(g, 1)]
        n_surv = jnp.where(
            is_live, fwd_out_ref[g][7, 0].astype(jnp.int32), 0
        )
        _replay_chunks(bufs, rank, n_surv, fwd_out_ref[g], dout_ref[g],
                       gbuf, tc, tile=tile, tiles_x=tiles_x,
                       quadform=quadform, bf16=bf16, P=P, lu=lu, lv=lv,
                       tri=tri, tri_s=tri_s)

    if window:
        _bwd_rmw_window(grad_hbm, gbuf, rrbuf, wbuf, gacc, rsem, wsem,
                        tile_of, _band_al, start_tile_dmas, wait_tile_dmas,
                        _replay, base_t=base_t, group=group, n_sel=n_sel,
                        bands=bands, seg_cap=seg_cap)
        return

    def _wait_grad_writes(tc_prev):
        # Waiting only needs the semaphore + transfer size, so the
        # reconstructed descriptor's window (the previous tile's band) is
        # whatever _band_al returns for it — exactness of the address is
        # irrelevant to the wait amount.
        for b in range(bands):
            pltpu.make_async_copy(
                gtmp.at[b], _gwin(_band_al(tc_prev, b)), gsem_w.at[b]
            ).wait()

    def tile_body(g, pending):
        s_idx = base_t + g
        tc = tile_of(s_idx)
        slot = g % 2
        wait_tile_dmas(slot, s_idx)
        # Prefetch the next tile's bands during this tile's compute + rmw
        # (attrs_hbm reads never conflict with the grad_hbm rmw below).
        @pl.when(g + 1 < group)
        def _():
            start_tile_dmas((g + 1) % 2, s_idx + 1)

        is_live = s_idx < n_sel
        _replay(g, tc, slot, is_live)

        # Read-modify-write the bands into the global grad array. Grid
        # steps run sequentially on this single-TensorCore chip and the
        # ordering below serializes overlapping segments of NEIGHBORING
        # tiles, so cross-tile accumulation is race-free.
        #
        # Pipelined rmw (PERF.md roadmap #5): the previous per-band
        # blocking read -> add -> blocking write exposed 2*bands DMA
        # latencies per tile — the dominant bwd fixed cost. Now a tile's
        # band WRITES are left in flight through the NEXT tile's replay
        # compute and waited only just before that tile's band reads, and
        # the reads themselves are issued in parallel (one exposed
        # latency). Requires the tile's own band windows to be disjoint —
        # true whenever each covered tile-row holds > seg_cap gaussians
        # (always at SLAM scale); sparse tiles take the serialized
        # fallback, whose full waits also make its trailing state clean
        # (pending=0).
        @pl.when(is_live & (pending == 1))
        def _():
            _wait_grad_writes(tile_of(s_idx - 1))

        als = [_band_al(tc, b) for b in range(bands)]
        disjoint = jnp.bool_(True)
        for b in range(bands - 1):
            disjoint = disjoint & (als[b] + seg_cap <= als[b + 1])

        @pl.when(is_live & disjoint)
        def _():
            for b in range(bands):
                pltpu.make_async_copy(
                    _gwin(als[b]), gtmp.at[b], gsem.at[b]).start()
            for b in range(bands):
                pltpu.make_async_copy(
                    _gwin(als[b]), gtmp.at[b], gsem.at[b]).wait()
            for b in range(bands):
                gtmp[b, :, :] = gtmp[b, :, :] + gbuf[:, b * seg_cap:(b + 1) * seg_cap]
            for b in range(bands):
                pltpu.make_async_copy(
                    gtmp.at[b], _gwin(als[b]), gsem_w.at[b]).start()

        @pl.when(is_live & ~disjoint)
        def _():
            for b in range(bands):
                rd = pltpu.make_async_copy(
                    _gwin(als[b]), gtmp.at[b], gsem.at[b])
                rd.start()
                rd.wait()
                gtmp[b, :, :] = gtmp[b, :, :] + gbuf[:, b * seg_cap:(b + 1) * seg_cap]
                wr = pltpu.make_async_copy(
                    gtmp.at[b], _gwin(als[b]), gsem_w.at[b])
                wr.start()
                wr.wait()

        return jnp.where(
            is_live, jnp.where(disjoint, 1, 0), pending
        ).astype(jnp.int32)

    pending = jax.lax.fori_loop(0, group, tile_body, jnp.int32(0))

    # Drain the last live tile's deferred writes before the program ends.
    @pl.when(pending == 1)
    def _():
        _wait_grad_writes(tile_of(jnp.minimum(base_t + group, n_sel) - 1))


def _bwd_rmw_window(grad_hbm, gbuf, rrbuf, wbuf, gacc, rsem, wsem,
                    tile_of, band_al, start_tile_dmas, wait_tile_dmas,
                    replay, *, base_t, group, n_sel, bands, seg_cap):
    """Retire-on-advance windowed rmw (PERF.md roadmap #5, traffic half).

    The legacy path above rmw's each band's FULL seg_cap window per tile;
    consecutive tiles' windows overlap by (seg_cap - per-tile stride) lanes,
    so at SLAM shapes (stride ~128, seg_cap 1024) every grad lane is re-read
    and re-written ~8x per band per pass. Here each band keeps a VMEM
    accumulation window `gacc` anchored at the current tile's 128-aligned
    band start; advancing to the next tile RETIRES only the lanes that fall
    off the back (delta = new_start - anchor, typically 0-2 chunks) with one
    chunk-sized rmw each, then shifts the window left and adds the new
    tile's gbuf contributions. Each lane hits HBM once per band-row pass —
    ~(seg_cap/stride)x less rmw traffic.

    Pipelining: retire READS are issued before the tile's replay compute
    (they overlap it), retire WRITES stay in flight through the next tile's
    replay. Reads land in `rrbuf` and writes source `wbuf`, so an in-flight
    write's source is never overwritten by the next tile's reads. Backward
    window jumps (unsorted tile_ids) and advances > seg_cap retire the full
    window; a conservative region-overlap predicate forces an early wait of
    pending writes before reads in those rare unsafe cases.

    Window anchors are 128-aligned (band starts are), so every dynamic DMA
    offset is a CHUNK multiple. gacc is (bands, NCH, 2*seg_cap) with the
    top half kept zero: the in-place ascending chunk-copy left shift reads
    up to lane 2*seg_cap-1 and pulls zeros into the vacated tail for free.
    """
    maxc = seg_cap // CHUNK

    def _rd(b, ci, lane0):
        sl = slice(ci * CHUNK, (ci + 1) * CHUNK)
        return pltpu.make_async_copy(
            grad_hbm.at[:, pl.ds(pl.multiple_of(lane0, CHUNK), CHUNK)],
            rrbuf.at[b, :, sl], rsem.at[b, ci])

    def _wr(b, ci, lane0):
        sl = slice(ci * CHUNK, (ci + 1) * CHUNK)
        return pltpu.make_async_copy(
            wbuf.at[b, :, sl],
            grad_hbm.at[:, pl.ds(pl.multiple_of(lane0, CHUNK), CHUNK)],
            wsem.at[b, ci])

    gacc[...] = jnp.zeros((bands, NCH, 2 * seg_cap), jnp.float32)
    tc0 = tile_of(base_t)
    init = (jnp.int32(0),) + tuple(
        band_al(tc0, b) for b in range(bands)
    ) + (jnp.int32(0),) * bands + (jnp.int32(0),) * bands

    def tile_body(g, carry):
        pend = carry[0]
        base = list(carry[1:1 + bands])
        pdn = list(carry[1 + bands:1 + 2 * bands])
        ws = list(carry[1 + 2 * bands:1 + 3 * bands])

        s_idx = base_t + g
        tc = tile_of(s_idx)
        slot = g % 2
        wait_tile_dmas(slot, s_idx)
        @pl.when(g + 1 < group)
        def _():
            start_tile_dmas((g + 1) % 2, s_idx + 1)

        is_live = s_idx < n_sel
        als = [band_al(tc, b) for b in range(bands)]
        raw = [als[b] - base[b] for b in range(bands)]
        delta = [
            jnp.where(
                is_live,
                jnp.where((raw[b] < 0) | (raw[b] > seg_cap), seg_cap, raw[b]),
                0,
            )
            for b in range(bands)
        ]
        n_ret = [delta[b] // CHUNK for b in range(bands)]

        # Early wait: pending write regions [ws_i, ws_i+pdn_i*CHUNK) vs this
        # tile's retire-read regions [base_j, base_j+delta_j). Same-band
        # regions are adjacent by construction in the monotone case
        # (ws_b + pdn_b*CHUNK == base_b), so this only fires on jumps or
        # cross-band window collisions.
        safe = jnp.bool_(True)
        for i in range(bands):
            wend = ws[i] + pdn[i] * CHUNK
            for j in range(bands):
                overlap = ((pdn[i] > 0) & (n_ret[j] > 0)
                           & (ws[i] < base[j] + delta[j]) & (base[j] < wend))
                safe = safe & ~overlap
        for b in range(bands):
            for ci in range(maxc):
                @pl.when((pend == 1) & ~safe & (ci < pdn[b]))
                def _(b=b, ci=ci):
                    _wr(b, ci, ws[b] + ci * CHUNK).wait()
        pend_now = jnp.where(safe, pend, 0)

        # Same-tile cross-band retire overlap: two bands retiring the SAME
        # chunk in one tile must accumulate sequentially (read-add-write,
        # then the next band re-reads the updated value). The eager-read
        # pipeline below issues ALL bands' reads before any write, so an
        # overlapping pair would both read the stale value and the later
        # write would drop the earlier band's contribution (caught by
        # scripts/rmw_check.py window on a dense tile=64 scene). Detect the
        # overlap and take a fully serialized retire for this tile instead.
        cross = jnp.bool_(False)
        for i in range(bands):
            for j in range(i + 1, bands):
                ov = ((n_ret[i] > 0) & (n_ret[j] > 0)
                      & (base[i] < base[j] + delta[j])
                      & (base[j] < base[i] + delta[i]))
                cross = cross | ov

        # Issue retire reads; they overlap the replay compute below.
        for b in range(bands):
            for ci in range(maxc):
                @pl.when(~cross & (ci < n_ret[b]))
                def _(b=b, ci=ci):
                    _rd(b, ci, base[b] + ci * CHUNK).start()

        replay(g, tc, slot, is_live)

        any_ret = jnp.int32(0)
        for b in range(bands):
            any_ret = any_ret + n_ret[b]
        will_write = any_ret > 0

        # Previous tile's writes must land before wbuf is recomputed.
        for b in range(bands):
            for ci in range(maxc):
                @pl.when(will_write & (pend_now == 1) & (ci < pdn[b]))
                def _(b=b, ci=ci):
                    _wr(b, ci, ws[b] + ci * CHUNK).wait()

        # Retire: wait reads, add the window's accumulated grads, write.
        for b in range(bands):
            for ci in range(maxc):
                @pl.when(~cross & (ci < n_ret[b]))
                def _(b=b, ci=ci):
                    sl = slice(ci * CHUNK, (ci + 1) * CHUNK)
                    _rd(b, ci, base[b] + ci * CHUNK).wait()
                    wbuf[b, :, sl] = rrbuf[b, :, sl] + gacc[b, :, sl]
                    _wr(b, ci, base[b] + ci * CHUNK).start()

        # Serialized retire for the cross-band-overlap tile: each chunk's
        # write completes before the next chunk's read, so overlapping
        # bands accumulate instead of overwriting. Leaves nothing pending
        # (prior pending writes were drained above: will_write is true in
        # every cross tile).
        for b in range(bands):
            for ci in range(maxc):
                @pl.when(cross & (ci < n_ret[b]))
                def _(b=b, ci=ci):
                    sl = slice(ci * CHUNK, (ci + 1) * CHUNK)
                    _rd(b, ci, base[b] + ci * CHUNK).start()
                    _rd(b, ci, base[b] + ci * CHUNK).wait()
                    wbuf[b, :, sl] = rrbuf[b, :, sl] + gacc[b, :, sl]
                    _wr(b, ci, base[b] + ci * CHUNK).start()
                    _wr(b, ci, base[b] + ci * CHUNK).wait()

        # Shift each band's window left by delta (in-place ascending chunk
        # copy: src index >= dst + CHUNK whenever delta > 0, and the zero
        # top half back-fills the tail), then fold in this tile's grads.
        for b in range(bands):
            @pl.when(delta[b] > 0)
            def _(b=b):
                for ci in range(maxc):
                    off = pl.multiple_of(ci * CHUNK + delta[b], CHUNK)
                    gacc[b, :, ci * CHUNK:(ci + 1) * CHUNK] = (
                        gacc[b, :, pl.ds(off, CHUNK)])

        @pl.when(is_live)
        def _():
            for b in range(bands):
                gacc[b, :, 0:seg_cap] = (
                    gacc[b, :, 0:seg_cap]
                    + gbuf[:, b * seg_cap:(b + 1) * seg_cap])

        # A cross (serialized) tile completes its writes in-tile: nothing
        # pends into the next tile (waiting those semaphores again would
        # deadlock).
        wl = will_write & ~cross
        new_pend = jnp.where(
            wl, 1, jnp.where(cross, 0, pend_now)).astype(jnp.int32)
        new_base = [jnp.where(is_live, als[b], base[b]) for b in range(bands)]
        new_pdn = [
            jnp.where(wl, n_ret[b],
                      jnp.where(cross, 0,
                                jnp.where(pend_now == 1, pdn[b], 0)))
            for b in range(bands)
        ]
        new_ws = [
            jnp.where(wl, base[b], ws[b]) for b in range(bands)
        ]
        return (new_pend,) + tuple(new_base) + tuple(new_pdn) + tuple(new_ws)

    final = jax.lax.fori_loop(0, group, tile_body, init)
    pend = final[0]
    base = final[1:1 + bands]
    pdn = final[1 + bands:1 + 2 * bands]
    ws = final[1 + 2 * bands:1 + 3 * bands]

    # Drain outstanding writes, then flush each band's full residual window
    # (blocking per band; bands sequential so overlapping band windows
    # still accumulate correctly).
    for b in range(bands):
        for ci in range(maxc):
            @pl.when((pend == 1) & (ci < pdn[b]))
            def _(b=b, ci=ci):
                _wr(b, ci, ws[b] + ci * CHUNK).wait()
    for b in range(bands):
        for ci in range(maxc):
            _rd(b, ci, base[b] + ci * CHUNK).start()
        for ci in range(maxc):
            _rd(b, ci, base[b] + ci * CHUNK).wait()
        for ci in range(maxc):
            sl = slice(ci * CHUNK, (ci + 1) * CHUNK)
            wbuf[b, :, sl] = rrbuf[b, :, sl] + gacc[b, :, sl]
        for ci in range(maxc):
            _wr(b, ci, base[b] + ci * CHUNK).start()
        for ci in range(maxc):
            _wr(b, ci, base[b] + ci * CHUNK).wait()


def _make_fwd(n_sel, n_pad, tile, tiles_x, group, bands, seg_cap, bf16,
              quadform, emit_rank=True):
    px = tile * tile
    t_pad = -(-n_sel // group)
    capt = bands * seg_cap
    # Inference-only renders keep a 1-row dummy rank output (never
    # written); the f32 rebuild scratch exists only under bf16 (ADVICE r2:
    # ~capt*NCH*4 B of dead VMEM otherwise).
    # Ranks are (t_pad, group, capt) 3-D so the Mosaic-constrained LAST TWO
    # block dims are (group, capt) == the full array dims — legal for ANY
    # group (a 2-D (group, capt) block needs group % 8 == 0 and failed to
    # lower at the seg-sweep's group=4 big-tile shape).
    rank_rows = t_pad if emit_rank else 1
    rank_grp = group if emit_rank else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seg_start, seg_cnt, tile_ids
        grid=(t_pad,),
        # Explicit HBM: pl.ANY lets Mosaic choose SMEM for mid-sized
        # arrays and then fail its own 1 MB SMEM limit (observed at
        # Npad~26k; large arrays were placed in HBM anyway).
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec(
                (group, NCH, px), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Persisted depth ranks for the backward replay (see _bwd_kernel).
            pl.BlockSpec(
                (1, rank_grp, capt),
                (lambda t, *_: (t, 0, 0)) if emit_rank
                else (lambda t, *_: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NCH, capt),
                       jnp.bfloat16 if bf16 else jnp.float32),
            pltpu.VMEM((NCH, capt) if bf16 else (8, CHUNK), jnp.float32),
            pltpu.VMEM((1, capt), jnp.int32),
            pltpu.SemaphoreType.DMA((2, bands)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tile=tile, tiles_x=tiles_x,
                          group=group, n_sel=n_sel, bands=bands,
                          seg_cap=seg_cap, bf16=bf16,
                          quadform=quadform, emit_rank=emit_rank),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad * group, NCH, px), jnp.float32),
            jax.ShapeDtypeStruct((rank_rows, rank_grp, capt), jnp.int32),
        ],
        interpret=_interpret(),
    )


def _make_bwd(n_sel, n_pad, tile, tiles_x, group, bands, seg_cap, bf16,
              quadform, window=False):
    px = tile * tile
    t_pad = -(-n_sel // group)
    capt = bands * seg_cap
    if window:
        maxc = seg_cap // CHUNK
        rmw_scratch = [
            pltpu.VMEM((bands, NCH, seg_cap), jnp.float32),  # rrbuf (reads)
            pltpu.VMEM((bands, NCH, seg_cap), jnp.float32),  # wbuf (writes)
            pltpu.VMEM((bands, NCH, 2 * seg_cap), jnp.float32),  # gacc
            pltpu.SemaphoreType.DMA((2, bands)),
            pltpu.SemaphoreType.DMA((bands, maxc)),        # retire reads
            pltpu.SemaphoreType.DMA((bands, maxc)),        # retire writes
        ]
    else:
        rmw_scratch = [
            pltpu.VMEM((bands, NCH, seg_cap), jnp.float32),  # gtmp (per band)
            pltpu.SemaphoreType.DMA((2, bands)),
            pltpu.SemaphoreType.DMA((bands,)),             # grad reads
            pltpu.SemaphoreType.DMA((bands,)),             # deferred writes
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),          # attrs
            pl.BlockSpec((group, NCH, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # fwd out
            pl.BlockSpec((1, group, capt), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # fwd ranks
            pl.BlockSpec((group, NCH, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # dout
            pl.BlockSpec(memory_space=pltpu.HBM),          # zeroed grads in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),    # grads out
        scratch_shapes=[
            pltpu.VMEM((2, NCH, capt),
                       jnp.bfloat16 if bf16 else jnp.float32),  # buf
            pltpu.VMEM((NCH, capt) if bf16 else (8, CHUNK),
                       jnp.float32),                       # bufw (f32 view)
            pltpu.VMEM((NCH, capt), jnp.float32),          # gbuf
        ] + rmw_scratch,
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tile=tile, tiles_x=tiles_x,
                          group=group, n_sel=n_sel, bands=bands,
                          seg_cap=seg_cap, bf16=bf16,
                          quadform=quadform, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCH, n_pad), jnp.float32),
        # Flat input index 7 = the zeroed grad buffer (after the three
        # scalar-prefetch args, attrs, fwd_out, ranks, dout); aliased
        # in-place.
        input_output_aliases={7: 0},
        interpret=_interpret(),
    )


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def composite_sorted(attrs_sorted, seg_start, seg_cnt, tile_ids,
                     tile: int, tiles_x: int, group: int, bands: int,
                     seg_cap: int, bf16: bool = False,
                     quadform: bool = False, window: bool = False):
    """attrs_sorted (NCH, Npad) center-tile-sorted; tile_ids (S,) selects
    which tiles to render (arange(T) for a full image). Returns
    (ceil(S/group)*group, NCH, PX) tile images (channels: see module doc)."""
    attrs_dma = to_bf16_layout(attrs_sorted) if bf16 else attrs_sorted
    out, _ = _make_fwd(tile_ids.shape[0], attrs_sorted.shape[1], tile,
                       tiles_x, group, bands, seg_cap, bf16, quadform,
                       emit_rank=False)(
        seg_start.reshape(-1), seg_cnt.reshape(-1), tile_ids, attrs_dma)
    return out


def _composite_sorted_fwd(attrs_sorted, seg_start, seg_cnt, tile_ids, tile,
                          tiles_x, group, bands, seg_cap, bf16, quadform,
                          window):
    attrs_dma = to_bf16_layout(attrs_sorted) if bf16 else attrs_sorted
    out, rank = _make_fwd(tile_ids.shape[0], attrs_sorted.shape[1], tile,
                          tiles_x, group, bands, seg_cap, bf16, quadform)(
        seg_start.reshape(-1), seg_cnt.reshape(-1), tile_ids, attrs_dma)
    return out, (attrs_dma, seg_start, seg_cnt, tile_ids, out, rank)


def _composite_sorted_bwd(tile, tiles_x, group, bands, seg_cap, bf16,
                          quadform, window, res, dout):
    attrs_dma, seg_start, seg_cnt, tile_ids, out, rank = res
    n_pad = attrs_dma.shape[1]
    zeros = jnp.zeros((NCH, n_pad), jnp.float32)
    grads = _make_bwd(tile_ids.shape[0], n_pad, tile, tiles_x, group, bands,
                      seg_cap, bf16, quadform, window)(
        seg_start.reshape(-1), seg_cnt.reshape(-1),
                               tile_ids, attrs_dma, out, rank, dout,
                               zeros)
    return (grads, None, None, None)


composite_sorted.defvjp(_composite_sorted_fwd, _composite_sorted_bwd)


# ---------------------------------------------------------------------------
# Pose-contraction backward (tracking fast path, PERF.md roadmap #6)
# ---------------------------------------------------------------------------
#
# Tracking needs dL/dpose (7 params: rel quat + trans), not per-gaussian
# grads — but the rmw backward above always materializes the full
# (NCH, Npad) grad array (zero + rmw to HBM + readback) which XLA then
# contracts through the reprojection VJP down to 7 scalars. This variant
# contracts each tile's per-entry grads against PRECOMPUTED per-gaussian
# pose jacobians inside VMEM and emits one (8, 128) partial-sum block per
# program: no grad rmw, no (NCH, Npad) grad materialization, no N-sized
# XLA VJP — the only extra traffic is the jacobian band reads (pure
# streaming, prefetched like the attrs).
#
# Jacobian layout (P_MAX * PJ, Npad) f32, row p * PJ + ch:
#   p  in [0, 7): pose parameter (quat w/x/y/z, trans x/y/z); row 7 pad.
#   ch in [0, 6): pose-DEPENDENT attr channels in gbuf row order —
#     0 mean_u, 1 mean_v, 2 conic_a, 3 conic_b, 4 conic_c, 5 depth.
# (opacity's pose dependence is a z>near step — zero gradient a.e., same
# as the XLA chain; rgb/radius are pose-independent / stop-gradient.)

PJ = 6                      # pose-dependent channels per parameter
P_MAX = 8                   # padded parameter count (f32 sublane tile)
_GROWS = (0, 1, 2, 3, 4, 9)  # gbuf rows matching the PJ jacobian channels


def _pose_bwd_kernel(start_ref, cnt_ref, ids_ref, attrs_hbm, jac_hbm,
                     fwd_out_ref, rank_in_ref, dout_ref, out_ref,
                     buf, bufw, gbuf, jbuf, pacc, sem, jsem, *,
                     tile: int, tiles_x: int, group: int, n_sel: int,
                     bands: int, seg_cap: int, bf16: bool, quadform: bool):
    capt = bands * seg_cap
    base_t = pl.program_id(0) * group
    P = _basis(tile) if quadform else None
    lu, lv = _pixel_coords(tile)
    tri = _tri_excl_T(CHUNK)
    tri_s = _tri_suffix_T(CHUNK)

    def tile_of(s):
        return ids_ref[jnp.minimum(s, n_sel - 1)]

    def start_tile_dmas(slot, s):
        tc = tile_of(s)
        for b in range(bands):
            start = start_ref[tc * bands + b]
            al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            _band_dma(attrs_hbm, buf.at[slot], sem.at[slot], al, b,
                      seg_cap).start()
            _band_dma(jac_hbm, jbuf.at[slot], jsem.at[slot], al, b,
                      seg_cap).start()

    def wait_tile_dmas(slot, s):
        tc = tile_of(s)
        for b in range(bands):
            start = start_ref[tc * bands + b]
            al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            _band_dma(attrs_hbm, buf.at[slot], sem.at[slot], al, b,
                      seg_cap).wait()
            _band_dma(jac_hbm, jbuf.at[slot], jsem.at[slot], al, b,
                      seg_cap).wait()

    start_tile_dmas(0, base_t)
    pacc[...] = jnp.zeros((P_MAX, capt), jnp.float32)

    def tile_body(g, _):
        s_idx = base_t + g
        tc = tile_of(s_idx)
        slot = g % 2
        wait_tile_dmas(slot, s_idx)
        @pl.when(g + 1 < group)
        def _():
            start_tile_dmas((g + 1) % 2, s_idx + 1)

        is_live = s_idx < n_sel
        if bf16:
            _rebuild_f32(bufw, buf[slot])
            bufs = bufw[...]
        else:
            bufs = buf[slot]
        rank = rank_in_ref[0, pl.ds(g, 1)]
        n_surv = jnp.where(
            is_live, fwd_out_ref[g][7, 0].astype(jnp.int32), 0
        )
        _replay_chunks(bufs, rank, n_surv, fwd_out_ref[g], dout_ref[g],
                       gbuf, tc, tile=tile, tiles_x=tiles_x,
                       quadform=quadform, bf16=bf16, P=P, lu=lu, lv=lv,
                       tri=tri, tri_s=tri_s)

        # Contract this tile's per-entry grads against the jacobian bands:
        # pacc[p] += sum_ch gbuf[_GROWS[ch]] * jbuf[p * PJ + ch].
        # Dead tiles (s_idx >= n_sel) replay zero chunks -> gbuf is zero.
        gsel = jnp.concatenate([gbuf[0:5, :], gbuf[9:10, :]], axis=0)
        contrib = [
            jnp.sum(gsel * jbuf[slot, p * PJ:(p + 1) * PJ, :],
                    axis=0, keepdims=True)
            for p in range(P_MAX - 1)
        ] + [jnp.zeros((1, capt), jnp.float32)]
        pacc[...] = pacc[...] + jnp.concatenate(contrib, axis=0)
        return 0

    jax.lax.fori_loop(0, group, tile_body, 0)

    # Fold the lane accumulator down to one (P_MAX, CHUNK) output block.
    folded = jnp.zeros((P_MAX, CHUNK), jnp.float32)
    for ci in range(capt // CHUNK):
        folded = folded + pacc[:, ci * CHUNK:(ci + 1) * CHUNK]
    out_ref[0] = folded


def _make_pose_bwd(n_sel, n_pad, tile, tiles_x, group, bands, seg_cap, bf16,
                   quadform):
    px = tile * tile
    t_pad = -(-n_sel // group)
    capt = bands * seg_cap
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),          # attrs
            pl.BlockSpec(memory_space=pltpu.HBM),          # pose jacobians
            pl.BlockSpec((group, NCH, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # fwd out
            pl.BlockSpec((1, group, capt), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # fwd ranks
            pl.BlockSpec((group, NCH, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # dout
        ],
        out_specs=pl.BlockSpec((1, P_MAX, CHUNK), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NCH, capt),
                       jnp.bfloat16 if bf16 else jnp.float32),  # buf
            pltpu.VMEM((NCH, capt) if bf16 else (8, CHUNK),
                       jnp.float32),                       # bufw (f32 view)
            pltpu.VMEM((NCH, capt), jnp.float32),          # gbuf
            pltpu.VMEM((2, P_MAX * PJ, capt), jnp.float32),  # jbuf
            pltpu.VMEM((P_MAX, capt), jnp.float32),        # pacc
            pltpu.SemaphoreType.DMA((2, bands)),           # attr bands
            pltpu.SemaphoreType.DMA((2, bands)),           # jac bands
        ],
    )
    return pl.pallas_call(
        functools.partial(_pose_bwd_kernel, tile=tile, tiles_x=tiles_x,
                          group=group, n_sel=n_sel, bands=bands,
                          seg_cap=seg_cap, bf16=bf16, quadform=quadform),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, P_MAX, CHUNK), jnp.float32),
        interpret=_interpret(),
    )


def composite_sorted_fwd_res(attrs_sorted, seg_start, seg_cnt, tile_ids,
                             tile: int, tiles_x: int, group: int, bands: int,
                             seg_cap: int, bf16: bool, quadform: bool):
    """Forward compositing WITH backward residuals: returns
    (out, rank, attrs_dma) for a caller-managed custom VJP (the pose path
    in rasterizer.py)."""
    attrs_dma = to_bf16_layout(attrs_sorted) if bf16 else attrs_sorted
    out, rank = _make_fwd(tile_ids.shape[0], attrs_sorted.shape[1], tile,
                          tiles_x, group, bands, seg_cap, bf16, quadform)(
        seg_start.reshape(-1), seg_cnt.reshape(-1), tile_ids, attrs_dma)
    return out, rank, attrs_dma


def pose_grad_sorted(attrs_dma, jac, seg_start, seg_cnt, tile_ids, out, rank,
                     dout, tile: int, tiles_x: int, group: int, bands: int,
                     seg_cap: int, bf16: bool, quadform: bool):
    """Pose-parameter cotangent (P_MAX,) by in-VMEM contraction of the bwd
    replay's per-entry grads against per-gaussian pose jacobians `jac`
    (P_MAX * PJ, Npad) — see the section comment for the row layout.
    `attrs_dma`/`out`/`rank` are the forward residuals from
    composite_sorted_fwd_res; `dout` is the tile-image cotangent."""
    part = _make_pose_bwd(tile_ids.shape[0], attrs_dma.shape[1], tile,
                          tiles_x, group, bands, seg_cap, bf16, quadform)(
        seg_start.reshape(-1), seg_cnt.reshape(-1), tile_ids, attrs_dma,
        jac, out, rank, dout)
    return jnp.sum(part, axis=(0, 2))
