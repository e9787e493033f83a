"""G-major Pallas rasterize kernels: gaussian chunk on SUBLANES, pixels x
blur-samples on LANES.

Motivation (scripts_dev/roofline.py + probe_kernel_variants): the row-major
kernels put the Gaussian chunk on the 128-lane axis, so a tile with count=26
(the bench scene's MEDIAN) still pays full 128-lane vector ops — measured
lane utilization ~40%. Sublanes have granularity 8, so flipping the chunk
onto sublanes lets the dynamic trip count advance in chunks of GCHUNK
gaussians (default 64; override via SPLAT_TPU_GCHUNK — values must divide
the padded per-tile capacity, which the wrapper aligns to K_ALIGN=GCHUNK in
'gmajor' layout and CHUNK=128 in 'mixed', so use a divisor of 128 there):
padding waste drops from (128 - c mod 128) to (GCHUNK - c mod GCHUNK) per
tile, and the early-exit check fires at finer depth granularity on
saturated tiles. GCHUNK=64 measured fastest (9.22 ms fwd vs 11.4 at 32 —
BASELINE.md kernel experiments table).

Two measured dead ends shaped this design (probe_kernel_variants on v5e):
  * Hillis-Steele ROLL scans (lane axis, SPLAT_TPU_CUMSUM=prod: 21.2 vs
    12.0 ms fwd; sublane axis in the v1 G-major kernels: 23.3 vs 20.4 ms
    bwd) — shifts+selects cost more VPU issue than the log-space MXU matmul
    they replace. The scan stays a strictly-triangular MXU matmul, now
    (chunk, chunk) @ (chunk, S*npix) along sublanes.
  * Per-sample unrolling (v1): evaluating S separate (chunk, npix) alpha
    passes loses the stacked-instruction amortization that made the
    row-major forward fast. Here ALL S sub-frames stack along LANES —
    (chunk, S*npix) arrays — so the VPU instruction count and the matmul
    count per chunk are constant in S, exactly like the row-major forward.
    At GCHUNK=32 the stacked live set is 4x smaller than the row-major
    backward's, so the BACKWARD stacks too (row-major had to unroll it:
    (S*npix, 128) intermediates spilled VMEM), and the moment epilogue
    contracts the stacked (chunk, S*npix) planes against sample-tiled pixel
    bases — the sample sum is absorbed into the moment matmul, no sample
    loop anywhere.

Per-gaussian parameters are needed as (chunk, 1) columns, so these kernels
consume the binning gather's NATURAL (T, K, NPARAM) layout directly — the
row-major kernels needed an extra (T, K, 16) -> (T, 16, K) transpose fused
into the XLA gather, and a v1 of this file transposed per grid step inside
the kernel (measured ~+4 ms/step at 512 grid steps — it ate the entire
layout win). Gradients come back as (T, K, NPARAM) too, which is exactly
the cotangent layout _gather_table's VJP wants — the gmajor path has NO
transpose anywhere.

Same math as rasterize_kernels.py (single-exp log-space alpha, forward-order
suffix-trick backward, moment-plane epilogue); see that module's docstring
for the method-level design and gsplat mapping (SURVEY.md §2c #5/#6).
"""
from __future__ import annotations

import functools
import math as _math
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import ALPHA_THRESH, MAX_ALPHA, T_EPS
from .rasterize_kernels import (
    NOUT,
    NPARAM,
    _MM_PRECISION,
    _MOM_PRECISION,
    _tile_wh,
    _tiles_per_step,
    _scalar_vec,
    _interpret,
)

GCHUNK = int(_os.environ.get("SPLAT_TPU_GCHUNK", "64"))
NPAD = 16   # per-tile column stride in the transposed scratch (lane-aligned)
_EARLY_EXIT = _os.environ.get("SPLAT_TPU_EARLY_EXIT", "1") != "0"
_LOG_THRESH = float(_math.log(ALPHA_THRESH))
_LOG_MAX_ALPHA = float(_math.log(MAX_ALPHA))
_NEG_BIG = -1e30


def _scan_matrices(chunk):
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    Mexc = (c < r).astype(jnp.float32)    # strictly lower: exclusive prefix
    Minc = (c <= r).astype(jnp.float32)   # lower: inclusive prefix
    return Mexc, Minc


def _prefix_sub(M, x):
    """Prefix sum along SUBLANES: (chunk, chunk) @ (chunk, L) on the MXU."""
    return jax.lax.dot_general(
        M, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MM_PRECISION,
    )


def _pixel_rows(tile_size, ty, img_h, rs_time, row_offset, dtype=jnp.float32):
    """(1, npix) tile-local pixel-center coords + scanline time row."""
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (p % tw_px).astype(dtype) + 0.5
    py = (p // tw_px).astype(dtype) + 0.5
    t_row = rs_time * ((py + ty + row_offset) / img_h - 0.5)
    return px, py, t_row


def _chunk_cols(params_ref, blk, base, tx, ty, count, chunk,
                from_scratch=False):
    """Per-gaussian parameter COLUMNS (chunk, 1) for one chunk — from the
    (tps, K, NPARAM) block, or from the (K, tps*NPAD) transposed scratch when
    the input arrived row-major; means tile-local; invalid sublanes get
    log-opacity -1e30 (kills every alpha via the threshold mask)."""
    if from_scratch:
        cols = params_ref[pl.ds(base, chunk), blk * NPAD:blk * NPAD + NPARAM]
    else:
        cols = params_ref[blk, pl.ds(base, chunk), :]
    mx, my = cols[:, 0:1] - tx, cols[:, 1:2] - ty
    ca, cb, cc = cols[:, 2:3], cols[:, 3:4], cols[:, 4:5]
    pvx, pvy = cols[:, 10:11], cols[:, 11:12]
    j = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    lo_hi = jnp.where(j < count, cols[:, 12:13], _NEG_BIG)
    return cols, mx, my, ca, cb, cc, pvx, pvy, lo_hi


def _stacked_basis(mx, my, ca, cb, cc, pvx, pvy, px, py, n_samples):
    """sigma(t) = A + t(B + tC) coefficients, sample-tiled along lanes.

    A/B are (chunk, npix) and get tiled S times along lanes so every
    downstream op runs once on (chunk, S*npix); C is per-gaussian (chunk, 1)
    and broadcasts for free."""
    dx0 = px - mx
    dy0 = py - my
    A = 0.5 * (ca * dx0 * dx0 + cc * dy0 * dy0) + cb * dx0 * dy0
    B = -(ca * dx0 * pvx + cb * (dx0 * pvy + dy0 * pvx) + cc * dy0 * pvy)
    C = 0.5 * (ca * pvx * pvx + cc * pvy * pvy) + cb * pvx * pvy  # (chunk, 1)
    if n_samples > 1:
        A = jnp.concatenate([A] * n_samples, axis=1)
        B = jnp.concatenate([B] * n_samples, axis=1)
    return A, B, C


def _stacked_alpha_g(A, B, C, lo_hi, t_stack):
    """(chunk, S*npix) alpha via one exp; masks as log comparisons."""
    sigma = A + t_stack * (B + t_stack * C)
    lo = lo_hi - sigma
    mask = (lo >= _LOG_THRESH) & (lo <= lo_hi)
    alpha = jnp.where(mask, jnp.minimum(MAX_ALPHA, jnp.exp(lo)), 0.0)
    return alpha, lo, mask


def _transpose_block(params_ref, subT_ref, tiles_per_step):
    """Per-tile (NPARAM, K) -> (K, NPARAM) transposes once per grid step —
    amortized over every chunk of every tile of the step (the 'mixed' path:
    row-major packed input shared with the row-major backward)."""
    for blk in range(tiles_per_step):
        subT_ref[:, blk * NPAD:blk * NPAD + NPARAM] = jnp.transpose(
            params_ref[blk], (1, 0)
        )


def _fwd_kernel_g(counts_ref, scalars_ref, params_ref, out_ref, *,
                  tile_size, tiles_x, img_h, n_samples, tiles_per_step,
                  chunk=GCHUNK):
    for blk in range(tiles_per_step):
        _fwd_one_tile_g(counts_ref, scalars_ref, out_ref, params_ref,
                        pl.program_id(0) * tiles_per_step + blk, blk,
                        tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
                        n_samples=n_samples, chunk=chunk)


def _fwd_kernel_g_rowin(counts_ref, scalars_ref, params_ref, out_ref,
                        subT_ref, *, tile_size, tiles_x, img_h, n_samples,
                        tiles_per_step, chunk=GCHUNK):
    _transpose_block(params_ref, subT_ref, tiles_per_step)
    for blk in range(tiles_per_step):
        _fwd_one_tile_g(counts_ref, scalars_ref, out_ref, subT_ref,
                        pl.program_id(0) * tiles_per_step + blk, blk,
                        tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
                        n_samples=n_samples, chunk=chunk, from_scratch=True)


def _fwd_one_tile_g(counts_ref, scalars_ref, out_ref, params_ref, t, blk, *,
                    tile_size, tiles_x, img_h, n_samples, chunk,
                    from_scratch=False):
    count = counts_ref[t]
    rs_time, row_offset = scalars_ref[0], scalars_ref[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    sp = n_samples * npix
    tx = (t % tiles_x) * tw_px
    ty = (t // tiles_x) * th_px
    k_max = params_ref.shape[0] if from_scratch else params_ref.shape[1]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, k_max // chunk)

    px, py, t_pix = _pixel_rows(tile_size, ty, img_h, rs_time, row_offset)
    t_stack = jnp.concatenate(
        [scalars_ref[2 + s] + t_pix for s in range(n_samples)], axis=1
    )                                                # (1, S*npix)
    Mexc, _ = _scan_matrices(chunk)

    def cond(carry):
        i, _, Ts = carry
        if _EARLY_EXIT:
            return (i < n_chunks) & (jnp.max(Ts) > T_EPS)
        return i < n_chunks

    def body(carry):
        i, acc, Ts = carry                 # acc (4, S*npix); Ts (1, S*npix)
        base = i * chunk
        cols, mx, my, ca, cb, cc, pvx, pvy, lo_hi = _chunk_cols(
            params_ref, blk, base, tx, ty, count, chunk,
            from_scratch=from_scratch)
        A, B, C = _stacked_basis(mx, my, ca, cb, cc, pvx, pvy, px, py, n_samples)
        cols4 = jnp.concatenate([cols[:, 5:8], cols[:, 9:10]], axis=1)  # (chunk,4)

        alpha, _, _ = _stacked_alpha_g(A, B, C, lo_hi, t_stack)
        t_exc = Ts * jnp.exp(_prefix_sub(Mexc, jnp.log1p(-alpha)))
        t_inc = t_exc * (1.0 - alpha)
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)    # (chunk, S*npix)

        acc_new = jax.lax.dot_general(
            cols4, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_MM_PRECISION,
        )                                            # (4, S*npix)
        new_T = jnp.min(jnp.where(active, t_inc, Ts), axis=0, keepdims=True)
        return i + 1, acc + acc_new, new_T

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((4, sp), jnp.float32),
        jnp.ones((1, sp), jnp.float32),
    )
    _, acc_f, Ts_f = jax.lax.while_loop(cond, body, init)

    for s in range(n_samples):
        packed = jnp.concatenate(
            [acc_f[:, s * npix:(s + 1) * npix],
             Ts_f[:, s * npix:(s + 1) * npix],
             jnp.zeros((NOUT - 5, npix), jnp.float32)],
            axis=0,
        )
        out_ref[blk, s] = packed


def _bwd_kernel_g(counts_ref, scalars_ref, params_ref, fwd_out_ref, g_out_ref,
                  d_params_ref, *, tile_size, tiles_x, img_h,
                  n_samples, tiles_per_step, chunk=GCHUNK):
    for blk in range(tiles_per_step):
        _bwd_one_tile_g(counts_ref, scalars_ref, fwd_out_ref, g_out_ref,
                        params_ref, d_params_ref,
                        pl.program_id(0) * tiles_per_step + blk, blk,
                        tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
                        n_samples=n_samples, chunk=chunk)


def _bwd_one_tile_g(counts_ref, scalars_ref, fwd_out_ref, g_out_ref, params_ref,
                    d_params_ref, t, blk, *, tile_size, tiles_x, img_h, n_samples,
                    chunk):
    count = counts_ref[t]
    rs_time, row_offset = scalars_ref[0], scalars_ref[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    sp = n_samples * npix
    tx = (t % tiles_x) * tw_px
    ty = (t // tiles_x) * th_px
    k_max = params_ref.shape[1]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, k_max // chunk)
    d_params_ref[blk] = jnp.zeros_like(d_params_ref[blk])

    px, py, t_pix = _pixel_rows(tile_size, ty, img_h, rs_time, row_offset)
    t_stack = jnp.concatenate(
        [scalars_ref[2 + s] + t_pix for s in range(n_samples)], axis=1
    )                                                # (1, S*npix)

    # Stacked cotangents + total-contribution row, (·, S*npix): built once per
    # tile from the (8, npix) out blocks — pixels are already on lanes there,
    # so this is plain lane concatenation, no relayout.
    dC4 = jnp.concatenate(
        [g_out_ref[blk, s][0:4] for s in range(n_samples)], axis=1
    )                                                # (4, S*npix)
    A_total = jnp.concatenate(
        [jnp.sum(fwd_out_ref[blk, s][0:4] * g_out_ref[blk, s][0:4], axis=0,
                 keepdims=True)
         + fwd_out_ref[blk, s][4:5] * g_out_ref[blk, s][4:5]
         for s in range(n_samples)],
        axis=1,
    )                                                # (1, S*npix)

    # Sample-tiled pixel-moment bases: contracting stacked (chunk, S*npix)
    # planes against phi*t^k rows sums over samples AND pixels in one MXU
    # matmul — the moment epilogue needs no per-sample loop at all.
    phi6 = jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=0
    )                                                # (6, npix)
    phi6_s = jnp.concatenate([phi6] * n_samples, axis=1)          # (6, S*npix)
    phi3_t = phi6_s[0:3] * t_stack                                # (3, S*npix)
    phi1_tt = t_stack * t_stack                                   # (1, S*npix)
    Mexc, Minc = _scan_matrices(chunk)

    def cond(carry):
        i, _, Ts = carry
        if _EARLY_EXIT:
            return (i < n_chunks) & (jnp.max(Ts) > T_EPS)
        return i < n_chunks

    def body(carry):
        i, prefix, Ts = carry              # prefix (1, S*npix); Ts (1, S*npix)
        base = i * chunk
        cols, mx, my, ca, cb, cc, pvx, pvy, lo_hi = _chunk_cols(
            params_ref, blk, base, tx, ty, count, chunk)
        A, B, C = _stacked_basis(mx, my, ca, cb, cc, pvx, pvy, px, py, n_samples)
        op = cols[:, 8:9]
        inv_op = pl.reciprocal(jnp.maximum(op, 1e-12), approx=False)
        colr, colg, colb, cold = (cols[:, 5:6], cols[:, 6:7], cols[:, 7:8],
                                  cols[:, 9:10])

        alpha, lo, mask = _stacked_alpha_g(A, B, C, lo_hi, t_stack)
        t_exc = Ts * jnp.exp(_prefix_sub(Mexc, jnp.log1p(-alpha)))
        t_inc = t_exc * (1.0 - alpha)
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)     # (chunk, S*npix)

        # v_i = c_i.dC + d_i dD as 4 broadcast FMAs (rows x columns) — no
        # small matmul, no relayout
        v = (colr * dC4[0:1] + colg * dC4[1:2] + colb * dC4[2:3]
             + cold * dC4[3:4])                       # (chunk, S*npix)

        contrib = w * v
        prefix_inc = prefix + _prefix_sub(Minc, contrib)
        S = A_total - prefix_inc                      # suffix incl. T_f*dT

        live = active & mask & (lo < _LOG_MAX_ALPHA)
        ratio = alpha * pl.reciprocal(1.0 - alpha, approx=False)
        d_sigma = jnp.where(live, ratio * S - contrib, 0.0)

        # moment epilogue: lane contractions over (samples x pixels) at once
        def mom(basis):
            return jax.lax.dot_general(
                d_sigma, basis, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_MOM_PRECISION,
            )                                         # (chunk, nb)

        M0 = mom(phi6_s)    # cols: 1, px, py, px^2, px*py, py^2
        M1 = mom(phi3_t)    # cols: t, t*px, t*py
        M2 = mom(phi1_tt)   # col:  t^2
        g_cd = jax.lax.dot_general(
            w, dC4, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_MM_PRECISION,
        )                                             # (chunk, 4)

        m2 = M2[:, 0:1]
        X0 = M0[:, 1:2] - mx * M0[:, 0:1]
        Y0 = M0[:, 2:3] - my * M0[:, 0:1]
        X1 = M1[:, 1:2] - mx * M1[:, 0:1]
        Y1 = M1[:, 2:3] - my * M1[:, 0:1]
        XX0 = M0[:, 3:4] - 2.0 * mx * M0[:, 1:2] + mx * mx * M0[:, 0:1]
        YY0 = M0[:, 5:6] - 2.0 * my * M0[:, 2:3] + my * my * M0[:, 0:1]
        XY0 = (M0[:, 4:5] - mx * M0[:, 2:3] - my * M0[:, 1:2]
               + mx * my * M0[:, 0:1])
        SU1 = X0 - pvx * M1[:, 0:1]
        SU2 = Y0 - pvy * M1[:, 0:1]
        SV1 = X1 - pvx * m2
        SV2 = Y1 - pvy * m2
        g_mx = -(ca * SU1 + cb * SU2)
        g_my = -(cc * SU2 + cb * SU1)
        g_pvx = -(ca * SV1 + cb * SV2)
        g_pvy = -(cc * SV2 + cb * SV1)
        g_ca = 0.5 * (XX0 - 2.0 * pvx * X1 + pvx * pvx * m2)
        g_cc = 0.5 * (YY0 - 2.0 * pvy * Y1 + pvy * pvy * m2)
        g_cb = XY0 - pvx * Y1 - pvy * X1 + pvx * pvy * m2
        g_op = -M0[:, 0:1] * inv_op

        grads = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_cd[:, 0:3], g_op, g_cd[:, 3:4],
             g_pvx, g_pvy, jnp.zeros((chunk, NPARAM - 12), jnp.float32)],
            axis=1,
        )                                             # (chunk, NPARAM)
        d_params_ref[blk, pl.ds(base, chunk), :] += grads

        new_prefix = prefix_inc[-1:, :]               # last sublane
        new_T = jnp.min(jnp.where(active, t_inc, Ts), axis=0, keepdims=True)
        return i + 1, new_prefix, new_T

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((1, sp), jnp.float32),
        jnp.ones((1, sp), jnp.float32),
    )
    jax.lax.while_loop(cond, body, init)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "tiles_x", "img_h", "chunk_width")
)
def rasterize_fwd_gpacked(
    params_packed: jax.Array,   # (T, K, NPARAM) — the gather's natural layout
    counts: jax.Array,
    rs_time: jax.Array,
    tile_size: int,
    tiles_x: int,
    img_h: int,
    row_offset: jax.Array | float = 0.0,
    eps: jax.Array | None = None,
    chunk_width: int = GCHUNK,
) -> jax.Array:                 # (T, S, NOUT, npix)
    n_tiles, k, _ = params_packed.shape
    assert k % chunk_width == 0, (k, chunk_width)
    n_samples = 1 if eps is None else eps.shape[0]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    tps = _tiles_per_step(n_tiles)
    kernel = functools.partial(
        _fwd_kernel_g, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        n_samples=n_samples, tiles_per_step=tps, chunk=chunk_width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tps,),
        in_specs=[
            pl.BlockSpec((tps, k, NPARAM), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_samples, NOUT, npix), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles * n_samples * k * npix * 30),
            bytes_accessed=int(params_packed.size * 4
                               + n_tiles * n_samples * NOUT * npix * 4),
            transcendentals=int(n_tiles * n_samples * k * npix),
        ),
    )(counts, _scalar_vec(rs_time, row_offset, eps), params_packed)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "tiles_x", "img_h", "chunk_width")
)
def rasterize_bwd_gpacked(
    params_packed: jax.Array,   # (T, K, NPARAM)
    counts: jax.Array,
    rs_time: jax.Array,
    fwd_out: jax.Array,         # (T, S, NOUT, npix)
    g_out: jax.Array,
    tile_size: int,
    tiles_x: int,
    img_h: int,
    row_offset: jax.Array | float = 0.0,
    eps: jax.Array | None = None,
    chunk_width: int = GCHUNK,
) -> jax.Array:                 # (T, K, NPARAM)
    n_tiles, k, _ = params_packed.shape
    assert k % chunk_width == 0, (k, chunk_width)
    n_samples = fwd_out.shape[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    tps = _tiles_per_step(n_tiles)
    kernel = functools.partial(
        _bwd_kernel_g, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        n_samples=n_samples, tiles_per_step=tps, chunk=chunk_width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tps,),
        in_specs=[
            pl.BlockSpec((tps, k, NPARAM), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tps, k, NPARAM), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, k, NPARAM), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles * n_samples * k * npix * 60),
            bytes_accessed=int(2 * params_packed.size * 4
                               + 2 * n_tiles * n_samples * NOUT * npix * 4),
            transcendentals=int(n_tiles * n_samples * k * npix),
        ),
    )(counts, _scalar_vec(rs_time, row_offset, eps), params_packed, fwd_out, g_out)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "tiles_x", "img_h", "chunk_width")
)
def rasterize_fwd_gpacked_rowin(
    params_packed: jax.Array,   # (T, NPARAM, K) — row-major packed input
    counts: jax.Array,
    rs_time: jax.Array,
    tile_size: int,
    tiles_x: int,
    img_h: int,
    row_offset: jax.Array | float = 0.0,
    eps: jax.Array | None = None,
    chunk_width: int = GCHUNK,
) -> jax.Array:                 # (T, S, NOUT, npix)
    """The 'mixed' forward: G-major compute over the ROW-MAJOR packed table
    (one in-kernel (NPARAM, K) -> (K, NPARAM) transpose per tile per grid
    step), so it pairs with the row-major backward on the SAME input — the
    best measured fwd (gmajor) and bwd (row) compose without duplicating the
    gather."""
    n_tiles, _, k = params_packed.shape
    assert k % chunk_width == 0, (k, chunk_width)
    n_samples = 1 if eps is None else eps.shape[0]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    tps = _tiles_per_step(n_tiles)
    kernel = functools.partial(
        _fwd_kernel_g_rowin, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        n_samples=n_samples, tiles_per_step=tps, chunk=chunk_width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tps,),
        in_specs=[
            pl.BlockSpec((tps, NPARAM, k), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((k, tps * NPAD), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_samples, NOUT, npix), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles * n_samples * k * npix * 30),
            bytes_accessed=int(params_packed.size * 4
                               + n_tiles * n_samples * NOUT * npix * 4),
            transcendentals=int(n_tiles * n_samples * k * npix),
        ),
    )(counts, _scalar_vec(rs_time, row_offset, eps), params_packed)
