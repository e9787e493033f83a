"""Pallas TPU kernels for tile rasterization (forward + backward).

TPU re-design of gsplat's `rasterize_forward` / `rasterize_backward_kernel`
CUDA kernels (SURVEY.md §2c #5/#6). Key departures from the CUDA design:

  * Grid = one program per image tile (the CUDA thread-block analogue); the
    per-tile Gaussian list arrives as a dense packed (16, K) parameter block
    (built by the XLA sort/gather stage in `ops.tiling`), so the kernel does
    ZERO pointer chasing — pure dense VPU/MXU work with pipelined DMA.
  * The sequential front-to-back transmittance recurrence is evaluated per
    chunk of 128 Gaussians via an exclusive cumulative sum of log(1-alpha)
    computed as a strictly-triangular (128x128) MXU matmul — turning the
    per-pixel scalar loop of the CUDA kernel into systolic-array work.
  * Compute layout: pixels on sublanes (npix = tile^2), Gaussian chunk on
    lanes (128) — alpha matrices are (npix, 128) f32 tiles.
  * Per-tile dynamic trip count (ceil(count/128)) plus transmittance early
    exit via lax.while_loop; tiles with few Gaussians cost one iteration.
  * Fused exposure (motion blur): all S blur sub-frame times eps_s render
    inside ONE grid step per tile, STACKED along sublanes — every per-chunk
    op (quadratic basis sigma(t) = A + t(B + tC), one exp, every matmul) runs
    on (S*npix, chunk) arrays, so the matmul count and VPU instruction count
    per chunk are CONSTANT in S (the kernels were bound by the pipeline-fill
    latency of many small per-sample matmuls). The per-pixel readout time is
    t = eps_s + t_rs*(py/H - 1/2) and the Gaussian mean is shifted by
    pix_vel * t — the SAME first-order screen-space warp the method uses for
    rolling shutter (SURVEY.md Appendix B.3), applied to the exposure window.
    Sort/gather/grad-scatter run ONCE per frame instead of once per sub-frame
    (the reference re-projects and re-bins per sub-frame, train.py:22 x 20k
    steps). Exact per-sub-frame reprojection remains available as the model's
    blur_mode="exact" path.
  * Backward is a single FORWARD-order pass (no back-to-front re-traversal,
    no atomics): the suffix contribution S_i needed for d(alpha_i) is
    recovered as A_total - prefix_i, where A_total is reconstructed from the
    forward outputs (rgb = sum w_i c_i, depth_acc, T_final) — so the only
    residuals are the kernel's own inputs and outputs. Cotangents stay in the
    out-block ROW layout (lane<->sublane relayouts measured ~11 ms/step when
    done per sample), positional-gradient pixel reductions are deferred
    across samples via moment planes P_k = sum_s t^k d_sigma, and the global
    map back to Gaussians is a GATHER via the binning sort's slot<->entry
    bijection (see ops/pallas/__init__) — no race-prone constructs anywhere
    (SURVEY.md §5).

Packed layouts (K = max_per_tile, multiple of 128):
  params  (T, NPARAM=13, K): rows 0:mx 1:my 2:conic_a 3:conic_b 4:conic_c
                      5:r 6:g 7:b 8:op_eff 9:depth 10:pvx 11:pvy
                      12:log(op_eff) — no pad rows (HBM stays dense; Mosaic
                      pads VMEM sublanes internally)
  out     (T, 8, npix): rows 0-2 rgb, 3 depth_acc, 4 T_final (5..7 pad)
  d_params(T, NPARAM, K): same rows as params.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import ALPHA_THRESH, MAX_ALPHA, T_EPS

CHUNK = 128
NPARAM = 13   # used rows; Mosaic pads VMEM sublanes, HBM stays dense
NOUT = 8


def _tile_wh(tile_size) -> tuple[int, int]:
    """(tile_w, tile_h) from an int (square) or (w, h) tuple spec."""
    if isinstance(tile_size, (tuple, list)):
        return int(tile_size[0]), int(tile_size[1])
    return int(tile_size), int(tile_size)

# Compositing matmul precision. On TPU, DEFAULT lowers dot inputs to bf16,
# HIGHEST emulates true f32 (~14% slower end-to-end). Measured on the bench
# scene: bf16 compositing differs from f32 by at most one 8-bit display LSB
# (PSNR 65 dB between the two) — far beyond splatting training targets — so
# DEFAULT is the default. Override via SPLAT_TPU_MM_PRECISION=highest for
# numerics studies.
import os as _os
_EARLY_EXIT = _os.environ.get("SPLAT_TPU_EARLY_EXIT", "1") != "0"
_MM_PRECISION = (
    jax.lax.Precision.HIGHEST
    if _os.environ.get("SPLAT_TPU_MM_PRECISION", "default").lower() == "highest"
    else jax.lax.Precision.DEFAULT
)
# Precision of the backward epilogue's pixel-basis moment matmuls. These were
# HIGHEST (6-pass f32 MXU emulation) — ~36 MXU block passes per chunk, about
# equal to ALL five per-sample matmuls combined. HIGH (3-pass bf16_3x) keeps
# ~f32 fidelity at half the passes; see scripts_dev/probe_mom_precision.py.
_mom_env = _os.environ.get("SPLAT_TPU_MOM_PRECISION", "HIGHEST").upper()
if _mom_env not in ("DEFAULT", "HIGH", "HIGHEST"):
    raise ValueError(
        f"SPLAT_TPU_MOM_PRECISION={_mom_env!r}: expected one of "
        "DEFAULT | HIGH | HIGHEST"
    )
_MOM_PRECISION = getattr(jax.lax.Precision, _mom_env)


def _pixel_coords(tile_size, tx, ty, img_h: int, rs_time, row_offset, eps_s,
                  dtype=jnp.float32):
    """(npix, 1) TILE-LOCAL pixel-center coords and per-pixel sampling time.

    px/py are local to the TILE (the Gaussian means are shifted by the tile
    origin per chunk instead — same values in exact arithmetic, but keeps every
    pixel-basis quantity small so the moment matmuls of the backward epilogue
    are well-conditioned). The rolling-shutter scanline time uses the GLOBAL
    row (ty + py + row_offset over the full height) so row-strip-sharded
    rendering stays exact. eps_s is this blur sub-frame's time within the
    exposure window (0 for single-sample rendering)."""
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    p = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px = (p % tw_px).astype(dtype) + 0.5
    py = (p // tw_px).astype(dtype) + 0.5
    t_row = eps_s + rs_time * ((py + ty + row_offset) / img_h - 0.5)
    return px, py, t_row


def _cum_exc_log(alpha):
    """Exclusive cumulative log(1-alpha) along lanes via MXU."""
    chunk = alpha.shape[1]
    s = jnp.log1p(-alpha)                              # (npix, CHUNK)
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    M = (r < c).astype(s.dtype)                        # strictly upper
    return jax.lax.dot_general(
        s, M, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _cum_exc_log_roll(alpha):
    """Exclusive cumulative log(1-alpha) along lanes via Hillis-Steele rolls.

    log2(chunk) shift+add VPU passes instead of a (chunk, chunk) MXU matmul —
    for when the kernel is MXU-issue-bound so the scan rides the idle VPU."""
    chunk = alpha.shape[1]
    s = jnp.log1p(-alpha)                              # (npix, CHUNK)
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    # e[i] = s[i-1]; then doubling strides: window [i-2^k, i-1] of s.
    e = jnp.where(lane >= 1, pltpu.roll(s, 1, 1), 0.0)
    shift = 1
    while shift < chunk:
        e = e + jnp.where(lane >= shift, pltpu.roll(e, shift, 1), 0.0)
        shift *= 2
    return e


def _cum_exc_prod_roll(alpha):
    """Exclusive cumulative PRODUCT of (1-alpha) via Hillis-Steele rolls.

    The log-space formulations above cost log1p + exp transcendentals per
    element (XLA lowers each to a ~10-op polynomial on the VPU) around the
    scan; the kernels are VPU-issue-bound (scripts_dev/roofline.py), so
    computing the transmittance product directly — log2(chunk) shift+mul
    passes, no transcendentals — trades ~2 polynomial expansions for 7
    cheap roll/select/mul triples. Also bit-closer to the oracle's
    sequential product semantics than a round-trip through logs."""
    chunk = alpha.shape[1]
    om = 1.0 - alpha
    lane = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
    e = jnp.where(lane >= 1, pltpu.roll(om, 1, 1), 1.0)
    shift = 1
    while shift < chunk:
        e = e * jnp.where(lane >= shift, pltpu.roll(e, shift, 1), 1.0)
        shift *= 2
    return e


_CUM_MODE = _os.environ.get("SPLAT_TPU_CUMSUM", "mxu").lower()
_CUM_EXC = _cum_exc_log_roll if _CUM_MODE == "roll" else _cum_exc_log


def _texc(Ts, alpha):
    """Exclusive transmittance Ts * prod_{j<i}(1-alpha_j) along lanes."""
    if _CUM_MODE == "prod":
        return Ts * _cum_exc_prod_roll(alpha)
    return Ts * jnp.exp(_CUM_EXC(alpha))


import math as _math
_LOG_THRESH = float(_math.log(ALPHA_THRESH))
_LOG_MAX_ALPHA = float(_math.log(MAX_ALPHA))
_NEG_BIG = -1e30


def _chunk_basis(params_ref, blk, px, py, tx, ty, base, count, chunk=CHUNK):
    """Per-chunk quantities shared by ALL blur sub-frames.

    The Gaussian exponent along the warp mean(t) = mean + pix_vel*t is a
    quadratic polynomial in the per-pixel sampling time t:
        sigma(t) = A + B t + C t^2,  dx(t) = dx0 - pvx t,  dy(t) = dy0 - pvy t
    so each sub-frame costs 2 FMA passes + one exp instead of a full
    re-evaluation — the chunk basis (A, B, C, dx0, dy0) is computed ONCE per
    chunk and amortized over the S unrolled samples.

    px/py are tile-local; the means are shifted by the tile origin (tx, ty)
    here, as cheap (1, chunk) row ops. The per-lane validity (j < count) is
    folded into the effective log-opacity row `lo_hi`: invalid lanes get
    -1e30, so every `lo <= lo_hi` mask test kills them for free."""
    sub = params_ref[blk, :, pl.ds(base, chunk)]   # (16, chunk)
    mx, my = sub[0:1] - tx, sub[1:2] - ty          # (1, CHUNK), tile-local
    ca, cb, cc = sub[2:3], sub[3:4], sub[4:5]
    pvx, pvy = sub[10:11], sub[11:12]
    j = base + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    lo_hi = jnp.where(j < count, sub[12:13], _NEG_BIG)  # log(op_eff) row

    dx0 = px - mx                        # (npix, CHUNK)
    dy0 = py - my
    A = 0.5 * (ca * dx0 * dx0 + cc * dy0 * dy0) + cb * dx0 * dy0
    B = -(ca * dx0 * pvx + cb * (dx0 * pvy + dy0 * pvx) + cc * dy0 * pvy)
    C = 0.5 * (ca * pvx * pvx + cc * pvy * pvy) + cb * pvx * pvy
    return sub, dx0, dy0, A, B, C, lo_hi


def _stacked_alpha(A, B, C, lo_hi, t_stack, chunk):
    """Alpha matrix for ALL S sub-frames, stacked along sublanes.

    The S samples are evaluated as ONE set of vector ops on (S*npix, chunk)
    arrays (the chunk basis broadcasts over the leading sample axis), so the
    VPU instruction count and — critically — the matmul count per chunk stay
    constant in S: the kernels were bound by the pipeline-fill latency of
    many small per-sample matmuls, not by element throughput.

    One exp for everything: alpha = op*exp(-sigma) = exp(log_op - sigma),
    with every mask test a comparison in log space:
      sigma >= 0        <=>  lo <= lo_hi  (also kills j >= count lanes)
      alpha >= THRESH   <=>  lo >= log(THRESH)
    Returns (masked alpha, lo, mask) as (S*npix, chunk); the backward derives
    its clamp test (alpha_raw < MAX_ALPHA) as lo < log(MAX_ALPHA)."""
    s, npix = t_stack.shape[0], t_stack.shape[1]
    sigma = A[None] + t_stack * (B[None] + t_stack * C[None])  # (S, npix, chunk)
    lo3 = lo_hi[None] - sigma
    mask3 = (lo3 >= _LOG_THRESH) & (lo3 <= lo_hi[None])
    alpha3 = jnp.where(mask3, jnp.minimum(MAX_ALPHA, jnp.exp(lo3)), 0.0)
    flat = (s * npix, chunk)
    return alpha3.reshape(flat), lo3.reshape(flat), mask3.reshape(flat)


def _sample_alpha(A, B, C, lo_hi, t_row):
    """Alpha matrix for ONE sub-frame from the shared log-space chunk basis.

    Same math as `_stacked_alpha` for a single (npix, chunk) sample — used by
    the backward, where stacking all S samples was measured SLOWER (the
    backward's much larger live set of (S*npix, chunk) intermediates spills
    VMEM), while the forward is faster stacked."""
    sigma = A + t_row * (B + t_row * C)
    lo = lo_hi - sigma
    mask = (lo >= _LOG_THRESH) & (lo <= lo_hi)
    alpha = jnp.where(mask, jnp.minimum(MAX_ALPHA, jnp.exp(lo)), 0.0)
    return alpha, lo, mask


def _fwd_kernel(counts_ref, scalars_ref, params_ref, out_ref, *, tile_size,
                tiles_x, img_h, n_samples, tiles_per_step, chunk=CHUNK):
    # Several tiles per grid step: the Mosaic per-grid-step overhead
    # (~0.8 us measured) is amortized across tiles_per_step tiles.
    for blk in range(tiles_per_step):
        _fwd_one_tile(counts_ref, scalars_ref, params_ref, out_ref,
                      pl.program_id(0) * tiles_per_step + blk, blk,
                      tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
                      n_samples=n_samples, chunk=chunk)


def _fwd_one_tile(counts_ref, scalars_ref, params_ref, out_ref, t, blk, *,
                  tile_size, tiles_x, img_h, n_samples, chunk=CHUNK):
    count = counts_ref[t]
    rs_time = scalars_ref[0]
    row_offset = scalars_ref[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    sp = n_samples * npix
    tx = (t % tiles_x) * tw_px
    ty = (t // tiles_x) * th_px
    k_max = params_ref.shape[2]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, k_max // chunk)

    # All S blur sub-frames composite inside ONE grid step from the resident
    # param block (grid-step overhead paid once per tile), STACKED along the
    # sublane axis — per-chunk work is one set of (S*npix, chunk) vector ops
    # and ONE cumulative-transmittance matmul regardless of S.
    px, py, t_pix = _pixel_coords(tile_size, tx, ty, img_h, rs_time, row_offset, 0.0)
    t_stack = jnp.stack([scalars_ref[2 + s] + t_pix for s in range(n_samples)])
    # (S, npix, 1)

    def cond(carry):
        i, _, Ts = carry
        if _EARLY_EXIT:
            return (i < n_chunks) & (jnp.max(Ts) > T_EPS)
        return i < n_chunks

    def body(carry):
        i, rgbd_acc, Ts = carry                      # (4, S*npix), (S*npix, 1)
        base = i * chunk
        sub, _, _, A, B, C, lo_hi = _chunk_basis(
            params_ref, blk, px, py, tx, ty, base, count, chunk)
        cols4 = jnp.concatenate([sub[5:8], sub[9:10]], axis=0)  # rgb+depth rows

        alpha, _, _ = _stacked_alpha(A, B, C, lo_hi, t_stack, chunk)
        t_exc = _texc(Ts, alpha)                     # (S*npix, CHUNK)
        t_inc = t_exc * (1.0 - alpha)                # inclusive: one mul, no 2nd exp
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)

        # rgbd accumulator kept TRANSPOSED (4, S*npix): streaming the 4-row
        # side through the MXU costs ~4 passes instead of npix (the N=4
        # orientation would pad to a full 128-lane tile).
        acc = jax.lax.dot_general(
            cols4, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )                                            # (4, S*npix)
        new_T = jnp.min(jnp.where(active, t_inc, Ts), axis=1, keepdims=True)
        return i + 1, rgbd_acc + acc, new_T

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((4, sp), jnp.float32),
        jnp.ones((sp, 1), jnp.float32),
    )
    _, rgbd_acc_f, Ts_f = jax.lax.while_loop(cond, body, init)

    for s in range(n_samples):
        packed = jnp.concatenate(
            [rgbd_acc_f[:, s * npix:(s + 1) * npix],
             Ts_f[s * npix:(s + 1) * npix].T,
             jnp.zeros((NOUT - 5, npix), jnp.float32)],
            axis=0,
        )                                            # (8, npix)
        out_ref[blk, s] = packed


def _bwd_kernel(
    counts_ref, scalars_ref, params_ref, fwd_out_ref, g_out_ref, d_params_ref,
    *, tile_size, tiles_x, img_h, n_samples, tiles_per_step, chunk=CHUNK,
):
    for blk in range(tiles_per_step):
        _bwd_one_tile(counts_ref, scalars_ref, params_ref, fwd_out_ref,
                      g_out_ref, d_params_ref,
                      pl.program_id(0) * tiles_per_step + blk, blk,
                      tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
                      n_samples=n_samples, chunk=chunk)


def _bwd_one_tile(
    counts_ref, scalars_ref, params_ref, fwd_out_ref, g_out_ref, d_params_ref,
    t, blk, *, tile_size, tiles_x, img_h, n_samples, chunk=CHUNK,
):
    count = counts_ref[t]
    rs_time = scalars_ref[0]
    row_offset = scalars_ref[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    tx = (t % tiles_x) * tw_px
    ty = (t // tiles_x) * th_px
    k_max = params_ref.shape[2]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, k_max // chunk)

    # One d_params block per tile, zeroed once. The S blur sub-frames are
    # UNROLLED INSIDE the chunk loop: the chunk basis (A, B, C, dx0, dy0) is
    # shared across them and the per-sample gradients are summed in registers,
    # so the VMEM read-modify-write happens ONCE per chunk. (Stacking the
    # samples along sublanes like the forward was measured SLOWER here — the
    # backward's live set of (S*npix, chunk) intermediates spills VMEM.)
    d_params_ref[blk] = jnp.zeros_like(d_params_ref[blk])

    px, py, t_pix = _pixel_coords(tile_size, tx, ty, img_h, rs_time, row_offset, 0.0)
    t_rows = [scalars_ref[2 + s] + t_pix for s in range(n_samples)]

    # Per-sample cotangents + the total-contribution constant (residual trick:
    # A_total = sum_j w_j (c_j.dC + d_j dD) + T_final * dT, all from fwd outs).
    # Everything stays in the (8, npix) ROW layout of the out blocks — the
    # matmuls below contract the row axis directly, so the only lane<->sublane
    # relayout is the single (1, npix) -> (npix, 1) transpose of A_total.
    dC4s, A_totals = [], []
    for s in range(n_samples):
        fwd = fwd_out_ref[blk, s]               # (8, npix)
        g = g_out_ref[blk, s]                   # (8, npix)
        dC4 = g[0:4]                            # (4, npix) rgb+depth cotangents
        a_row = jnp.sum(fwd[0:4] * dC4, axis=0, keepdims=True) + fwd[4:5] * g[4:5]
        A_totals.append(a_row.T)                # (npix, 1)
        dC4s.append(dC4)

    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    Minc = (r <= c).astype(jnp.float32)         # inclusive-prefix matmul mask

    # Pixel-moment basis for the positional-gradient epilogue: every pixel
    # reduction below is sum_p f(px,py) * P_k with f in span{1,px,py,px^2,
    # px*py,py^2}, so the seven per-chunk reductions collapse into three tiny
    # (6,npix)@(npix,chunk) MXU matmuls. px/py are tile-local, so the basis is
    # a compile-time constant and the matmul is well-conditioned in f32.
    phi6 = jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=1
    )                                           # (npix, 6)

    def cond(carry):
        i, _, Ts = carry
        if _EARLY_EXIT:
            any_t = jnp.array(False)
            for s in range(n_samples):
                any_t |= jnp.max(Ts[s]) > T_EPS
            return (i < n_chunks) & any_t
        return i < n_chunks

    def body(carry):
        i, prefixes, Ts = carry
        base = i * chunk
        sub, _, _, A, B, C, lo_hi = _chunk_basis(
            params_ref, blk, px, py, tx, ty, base, count, chunk)
        mx_l, my_l = sub[0:1] - tx, sub[1:2] - ty   # (1, CHUNK) tile-local
        ca, cb, cc = sub[2:3], sub[3:4], sub[4:5]
        cols4 = jnp.concatenate([sub[5:8], sub[9:10]], axis=0)  # (4, CHUNK)
        op = sub[8:9]
        pvx, pvy = sub[10:11], sub[11:12]
        inv_op = pl.reciprocal(jnp.maximum(op, 1e-12), approx=False)

        g_cd = jnp.zeros((4, chunk), jnp.float32)   # colors+depth cotangent rows
        # Sample-summed moment planes: every positional gradient is a pixel
        # reduction of d_sigma-weighted monomials in (dx_s, dy_s), and
        # dx_s = dx0 - pvx*t_s, so summing P_k = sum_s t_s^k * d_sigma_s per
        # chunk lets ALL seven pixel reductions run ONCE per chunk (epilogue
        # below) instead of once per sample — the reductions were ~half the
        # per-sample pass count.
        P0 = jnp.zeros((npix, chunk), jnp.float32)
        P1 = jnp.zeros((npix, chunk), jnp.float32)
        P2 = jnp.zeros((npix, chunk), jnp.float32)
        new_prefix, new_T = [], []

        for s in range(n_samples):
            t_row = t_rows[s]
            alpha, lo, mask = _sample_alpha(A, B, C, lo_hi, t_row)
            t_exc = _texc(Ts[s], alpha)
            t_inc = t_exc * (1.0 - alpha)
            active = t_exc > T_EPS
            w = jnp.where(active, t_exc * alpha, 0.0)   # (npix, CHUNK)

            # per-gaussian-and-pixel loss sensitivity v_i = c_i.dC + d_i dD —
            # one K=4 contraction over the shared row axis (depth rides along)
            v = jax.lax.dot_general(
                dC4s[s], cols4, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_MM_PRECISION,
            )                                            # (npix, CHUNK)

            contrib = w * v                              # (npix, CHUNK)
            prefix_inc = prefixes[s] + jax.lax.dot_general(
                contrib, Minc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MM_PRECISION,
            )                                            # (npix, CHUNK) inclusive
            S = A_totals[s] - prefix_inc                 # suffix incl. T_final*dT

            # d_sigma = -alpha*d_alpha with d_alpha = t_exc v - S/(1-alpha);
            # alpha*t_exc*v = w*v = contrib (already computed for the prefix).
            # Grad 0 at the alpha clamp and outside the compositing mask.
            # 1-alpha >= 1e-3 is guaranteed by the MAX_ALPHA clamp, so the
            # reciprocal needs no max() guard (measured perf-neutral vs the
            # guarded division — this form just drops the dead clamp).
            live = active & mask & (lo < _LOG_MAX_ALPHA)
            ratio = alpha * pl.reciprocal(1.0 - alpha, approx=False)
            d_sigma = jnp.where(live, ratio * S - contrib, 0.0)
            td = t_row * d_sigma
            P0 = P0 + d_sigma
            P1 = P1 + td
            P2 = P2 + t_row * td

            g_cd = g_cd + jax.lax.dot_general(
                dC4s[s], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_MM_PRECISION,
            )                                            # (4, CHUNK)

            new_prefix.append(prefix_inc[:, -1:])
            new_T.append(jnp.min(jnp.where(active, t_inc, Ts[s]), axis=1, keepdims=True))

        # Per-chunk epilogue: all positional grads from the moment planes via
        # three tiny pixel-basis matmuls (MXU) instead of ~37 (npix, chunk)
        # VPU passes. With dx_s = dx0 - pvx*t_s and dx0 = px - mx, every
        # needed reduction sum_{s,p} dx_s^a dy_s^b d_sigma_s is a polynomial
        # in the basis moments M_k[f] = sum_p f(px,py) * P_k(p,·) recombined
        # with (1, chunk) per-Gaussian rows.
        def mom(Pk, nb):
            return jax.lax.dot_general(
                phi6[:, :nb], Pk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MOM_PRECISION,
            )                                       # (nb, chunk)

        M0 = mom(P0, 6)   # rows: 1, px, py, px^2, px*py, py^2
        M1 = mom(P1, 3)   # rows: 1, px, py
        M2 = mom(P2, 1)   # row:  1
        m2 = M2[0:1]
        X0 = M0[1:2] - mx_l * M0[0:1]               # sum dx0 P0
        Y0 = M0[2:3] - my_l * M0[0:1]
        X1 = M1[1:2] - mx_l * M1[0:1]               # sum dx0 P1
        Y1 = M1[2:3] - my_l * M1[0:1]
        XX0 = M0[3:4] - 2.0 * mx_l * M0[1:2] + mx_l * mx_l * M0[0:1]
        YY0 = M0[5:6] - 2.0 * my_l * M0[2:3] + my_l * my_l * M0[0:1]
        XY0 = M0[4:5] - mx_l * M0[2:3] - my_l * M0[1:2] + mx_l * my_l * M0[0:1]
        SU1 = X0 - pvx * M1[0:1]                    # sum_s,p dx_s d_sigma
        SU2 = Y0 - pvy * M1[0:1]
        SV1 = X1 - pvx * m2                         # sum_s,p t_s dx_s d_sigma
        SV2 = Y1 - pvy * m2
        g_mx = -(ca * SU1 + cb * SU2)
        g_my = -(cc * SU2 + cb * SU1)
        g_pvx = -(ca * SV1 + cb * SV2)
        g_pvy = -(cc * SV2 + cb * SV1)
        g_ca = 0.5 * (XX0 - 2.0 * pvx * X1 + pvx * pvx * m2)
        g_cc = 0.5 * (YY0 - 2.0 * pvy * Y1 + pvy * pvy * m2)
        g_cb = XY0 - pvx * Y1 - pvy * X1 + pvx * pvy * m2
        # d_op = sum expneg d_alpha = -inv_op * sum_s,p d_sigma (same masking)
        g_op = -M0[0:1] * inv_op

        grads = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_cd[0:3], g_op, g_cd[3:4], g_pvx,
             g_pvy, jnp.zeros((NPARAM - 12, chunk), jnp.float32)],
            axis=0,
        )                                            # (16, CHUNK)
        d_params_ref[blk, :, pl.ds(base, chunk)] += grads
        return i + 1, tuple(new_prefix), tuple(new_T)

    init = (
        jnp.zeros((), jnp.int32),
        tuple(jnp.zeros((npix, 1), jnp.float32) for _ in range(n_samples)),
        tuple(jnp.ones((npix, 1), jnp.float32) for _ in range(n_samples)),
    )
    jax.lax.while_loop(cond, body, init)


def _tiles_per_step(n_tiles: int, max_tps: int = int(_os.environ.get("SPLAT_TPU_TPS", "8"))) -> int:
    """Largest power-of-two tile batch (<= max_tps) dividing the tile count."""
    tps = 1
    while tps * 2 <= max_tps and n_tiles % (tps * 2) == 0:
        tps *= 2
    return tps


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _scalar_vec(rs_time, row_offset, eps):
    """Scalar-prefetch vector [rs_time, row_offset, eps_0..eps_{S-1}]."""
    if eps is None:
        eps = jnp.zeros((1,), jnp.float32)
    return jnp.concatenate([
        jnp.stack([jnp.asarray(rs_time, jnp.float32), jnp.asarray(row_offset, jnp.float32)]),
        jnp.asarray(eps, jnp.float32).reshape(-1),
    ])


@functools.partial(
    jax.jit, static_argnames=("tile_size", "tiles_x", "img_h", "chunk_width")
)
def rasterize_fwd_packed(
    params_packed: jax.Array,   # (T, 16, K)
    counts: jax.Array,          # (T,)
    rs_time: jax.Array,         # scalar
    tile_size: int,
    tiles_x: int,
    img_h: int,                 # FULL image height (rolling-shutter norm)
    row_offset: jax.Array | float = 0.0,
    eps: jax.Array | None = None,  # (S,) blur sample times; None -> S=1, t=0
    chunk_width: int = CHUNK,
) -> jax.Array:                 # (T, S, 8, npix)
    n_tiles, _, k = params_packed.shape
    assert k % chunk_width == 0, (k, chunk_width)
    n_samples = 1 if eps is None else eps.shape[0]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    tps = _tiles_per_step(n_tiles)
    kernel = functools.partial(
        _fwd_kernel, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        n_samples=n_samples, tiles_per_step=tps, chunk=chunk_width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tps,),
        in_specs=[
            # tps tiles per grid step; all S sub-frames of each render inside
            # it from the resident param block (grid-step overhead amortized).
            pl.BlockSpec((tps, NPARAM, k), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    flops_per_gauss = npix * 30
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_samples, NOUT, npix), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles * n_samples * k * flops_per_gauss),
            bytes_accessed=int(params_packed.size * 4 + n_tiles * n_samples * NOUT * npix * 4),
            transcendentals=int(n_tiles * n_samples * k * npix * 2),
        ),
    )(counts, _scalar_vec(rs_time, row_offset, eps), params_packed)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "tiles_x", "img_h", "chunk_width")
)
def rasterize_bwd_packed(
    params_packed: jax.Array,   # (T, 16, K)
    counts: jax.Array,
    rs_time: jax.Array,
    fwd_out: jax.Array,         # (T, S, 8, npix)
    g_out: jax.Array,           # (T, S, 8, npix) cotangent
    tile_size: int,
    tiles_x: int,
    img_h: int,
    row_offset: jax.Array | float = 0.0,
    eps: jax.Array | None = None,  # (S,) blur sample times
    chunk_width: int = CHUNK,
) -> jax.Array:                 # (T, 16, K), summed over samples
    n_tiles, _, k = params_packed.shape
    assert k % chunk_width == 0, (k, chunk_width)
    n_samples = fwd_out.shape[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    tps = _tiles_per_step(n_tiles)
    kernel = functools.partial(
        _bwd_kernel, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        n_samples=n_samples, tiles_per_step=tps, chunk=chunk_width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tps,),
        in_specs=[
            pl.BlockSpec((tps, NPARAM, k), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        # One d block per tile, zeroed + accumulated across samples in-kernel.
        out_specs=pl.BlockSpec((tps, NPARAM, k), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, NPARAM, k), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles * n_samples * k * npix * 60),
            bytes_accessed=int(2 * params_packed.size * 4 + 2 * n_tiles * n_samples * NOUT * npix * 4),
            transcendentals=int(n_tiles * n_samples * k * npix * 2),
        ),
    )(counts, _scalar_vec(rs_time, row_offset, eps), params_packed, fwd_out, g_out)
