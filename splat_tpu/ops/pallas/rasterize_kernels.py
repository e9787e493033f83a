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
  * Fused exposure (motion blur): the grid carries a second axis over blur
    sub-frame times eps_s. The per-pixel readout time becomes
    t = eps_s + t_rs*(py/H - 1/2) and the Gaussian mean is shifted by
    pix_vel * t — the SAME first-order screen-space warp the method uses for
    rolling shutter (SURVEY.md Appendix B.3), applied to the exposure window.
    The per-tile parameter block stays resident in VMEM across the S samples
    and the backward accumulates d_params across samples in-place, so the
    expensive sort/gather/scatter pipeline runs ONCE per frame instead of once
    per sub-frame (the reference re-projects and re-bins per sub-frame,
    train.py:22 x 20k steps). Exact per-sub-frame reprojection remains
    available as the model's blur_mode="exact" path.
  * Backward is a single FORWARD-order pass (no back-to-front re-traversal,
    no atomics): the suffix contribution S_i needed for d(alpha_i) is
    recovered as A_total - prefix_i, where A_total is reconstructed from the
    forward outputs (rgb = sum w_i c_i, depth_acc, T_final) — so the only
    residuals are the kernel's own inputs and outputs. Per-Gaussian gradients
    are pixel-reductions done as (npix,chunk) contractions; the global
    scatter back to Gaussians is the deterministic segment-sum VJP of the
    gather outside the kernel (SURVEY.md §5: no race-prone constructs).

Packed layouts (K = max_per_tile, multiple of 128):
  params  (T, 16, K): rows 0:mx 1:my 2:conic_a 3:conic_b 4:conic_c
                      5:r 6:g 7:b 8:op_eff 9:depth 10:pvx 11:pvy (12..15 pad)
  out     (T, 8, npix): rows 0-2 rgb, 3 depth_acc, 4 T_final (5..7 pad)
  d_params(T, 16, K): same rows as params.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import ALPHA_THRESH, MAX_ALPHA, T_EPS

CHUNK = 128
NPARAM = 16
NOUT = 8

# Compositing matmul precision. On TPU, DEFAULT lowers dot inputs to bf16,
# HIGHEST emulates true f32 (~14% slower end-to-end). Measured on the bench
# scene: bf16 compositing differs from f32 by at most one 8-bit display LSB
# (PSNR 65 dB between the two) — far beyond splatting training targets — so
# DEFAULT is the default. Override via SPLAT_TPU_MM_PRECISION=highest for
# numerics studies.
import os as _os
_MM_PRECISION = (
    jax.lax.Precision.HIGHEST
    if _os.environ.get("SPLAT_TPU_MM_PRECISION", "default").lower() == "highest"
    else jax.lax.Precision.DEFAULT
)


def _pixel_coords(tile_size: int, tx, ty, img_h: int, rs_time, row_offset, eps_s,
                  dtype=jnp.float32):
    """(npix, 1) pixel-center coords and per-pixel sampling-time offset.

    px/py are local to the rendered region (match means2d); the rolling-shutter
    scanline time uses the GLOBAL row (py + row_offset over the full height) so
    row-strip-sharded rendering stays exact. eps_s is this blur sub-frame's
    time within the exposure window (0 for single-sample rendering)."""
    npix = tile_size * tile_size
    p = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px = (tx + p % tile_size).astype(dtype) + 0.5
    py = (ty + p // tile_size).astype(dtype) + 0.5
    t_row = eps_s + rs_time * ((py + row_offset) / img_h - 0.5)
    return px, py, t_row


def _chunk_alpha(params_ref, px, py, t_row, base, count, chunk=CHUNK):
    """Alpha matrix (npix, chunk) for one chunk + the (16, chunk) sub-block.

    Loads the chunk directly from the VMEM ref (dynamic ref slices lower to
    Mosaic; dynamic_slice on materialized values does not). chunk is the lane
    width of one compositing wave — wider chunks raise ILP in the serial
    per-chunk dependency chain at the cost of coarser early-exit granularity."""
    sub = params_ref[0, :, pl.ds(base, chunk)]   # (16, chunk)
    mx, my = sub[0:1], sub[1:2]          # (1, CHUNK)
    ca, cb, cc = sub[2:3], sub[3:4], sub[4:5]
    op = sub[8:9]
    pvx, pvy = sub[10:11], sub[11:12]

    dx = px - (mx + pvx * t_row)         # (npix, CHUNK)
    dy = py - (my + pvy * t_row)
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha_raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    j = base + jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
    mask = (sigma >= 0) & (alpha >= ALPHA_THRESH) & (j < count)
    alpha = jnp.where(mask, alpha, 0.0)
    return alpha, alpha_raw, mask, dx, dy, sub


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


def _fwd_kernel(counts_ref, scalars_ref, params_ref, out_ref, *, tile_size, tiles_x, img_h, chunk=CHUNK):
    t = pl.program_id(0)
    s = pl.program_id(1)
    count = counts_ref[t]
    rs_time = scalars_ref[0]
    row_offset = scalars_ref[1]
    eps_s = scalars_ref[2 + s]
    npix = tile_size * tile_size
    tx = (t % tiles_x) * tile_size
    ty = (t // tiles_x) * tile_size
    px, py, t_row = _pixel_coords(tile_size, tx, ty, img_h, rs_time, row_offset, eps_s)
    k_max = params_ref.shape[2]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, k_max // chunk)

    def cond(carry):
        i, _, _, T = carry
        return (i < n_chunks) & (jnp.max(T) > T_EPS)

    def body(carry):
        i, rgb_acc, dep_acc, T = carry
        base = i * chunk
        alpha, _, _, _, _, sub = _chunk_alpha(params_ref, px, py, t_row, base, count, chunk)
        t_exc = T * jnp.exp(_cum_exc_log(alpha))  # (npix, CHUNK)
        t_inc = t_exc * (1.0 - alpha)             # inclusive: one mul, no 2nd exp
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)

        cols4 = jnp.concatenate([sub[5:8], sub[9:10]], axis=0)  # rgb+depth rows
        acc = jax.lax.dot_general(
            w, cols4, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )                                        # (npix, 4) — N-dim pads to the
        rgb_acc = rgb_acc + acc[:, 0:3]          # same MXU tile as 3, so the
        dep_acc = dep_acc + acc[:, 3:4]          # depth column rides free
        T = jnp.min(jnp.where(active, t_inc, T), axis=1, keepdims=True)
        return i + 1, rgb_acc, dep_acc, T

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((npix, 3), jnp.float32),
        jnp.zeros((npix, 1), jnp.float32),
        jnp.ones((npix, 1), jnp.float32),
    )
    _, rgb_acc, dep_acc, T = jax.lax.while_loop(cond, body, init)

    packed = jnp.concatenate(
        [rgb_acc, dep_acc, T, jnp.zeros((npix, NOUT - 5), jnp.float32)], axis=1
    )                                            # (npix, 8)
    out_ref[0, 0] = packed.T                     # (8, npix)


def _bwd_kernel(
    counts_ref, scalars_ref, params_ref, fwd_out_ref, g_out_ref, d_params_ref,
    *, tile_size, tiles_x, img_h, chunk=CHUNK,
):
    t = pl.program_id(0)
    s = pl.program_id(1)
    count = counts_ref[t]
    rs_time = scalars_ref[0]
    row_offset = scalars_ref[1]
    eps_s = scalars_ref[2 + s]
    npix = tile_size * tile_size
    tx = (t % tiles_x) * tile_size
    ty = (t // tiles_x) * tile_size
    px, py, t_row = _pixel_coords(tile_size, tx, ty, img_h, rs_time, row_offset, eps_s)
    k_max = params_ref.shape[2]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, k_max // chunk)

    fwd = fwd_out_ref[0, 0]                     # (8, npix)
    g = g_out_ref[0, 0]                         # (8, npix)
    dC = g[0:3].T                               # (npix, 3)
    dD = g[3:4].T                               # (npix, 1)
    dT = g[4:5].T                               # (npix, 1)
    rgb_out = fwd[0:3].T                        # (npix, 3)
    dep_out = fwd[3:4].T
    T_final = fwd[4:5].T

    # A_total = sum_j w_j (c_j.dC + d_j dD) + T_final * dT   (npix, 1)
    A_total = (
        jnp.sum(rgb_out * dC, axis=1, keepdims=True) + dep_out * dD + T_final * dT
    )
    G4 = jnp.concatenate([dC, dD], axis=1)      # (npix, 4) rgb+depth cotangents

    # One d_params block per tile, accumulated across the S blur samples (the
    # block index_map ignores s, so Mosaic keeps it resident in VMEM).
    @pl.when(s == 0)
    def _():
        d_params_ref[0] = jnp.zeros_like(d_params_ref[0])

    def cond(carry):
        i, _, _ = carry
        return (i < n_chunks) & (jnp.max(carry[2]) > T_EPS)

    def body(carry):
        i, prefix, T = carry
        base = i * chunk
        alpha, alpha_raw, mask, dx, dy, sub = _chunk_alpha(
            params_ref, px, py, t_row, base, count, chunk
        )
        t_exc = T * jnp.exp(_cum_exc_log(alpha))
        t_inc = t_exc * (1.0 - alpha)
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)   # (npix, CHUNK)

        cols = sub[5:8]                             # (3, CHUNK)
        dep = sub[9:10]                             # (1, CHUNK)
        op = sub[8:9]

        # per-gaussian-and-pixel loss sensitivity v_i = c_i.dC + d_i dD
        v = jax.lax.dot_general(
            dC, cols, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        ) + dD * dep                                 # (npix, CHUNK)

        contrib = w * v                              # (npix, CHUNK)
        # prefix including this chunk, per position (inclusive within chunk)
        r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        Minc = (r <= c).astype(contrib.dtype)
        prefix_inc = prefix + jax.lax.dot_general(
            contrib, Minc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )                                            # (npix, CHUNK)
        S = A_total - prefix_inc                     # suffix incl. T_final*dT

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = jnp.where(active, t_exc * v - S / one_m, 0.0)

        # chain through alpha = min(0.999, op * exp(-sigma)); grad zero at clamp
        live = mask & (alpha_raw < MAX_ALPHA)
        expneg = jnp.where(live, alpha * pl.reciprocal(jnp.maximum(op, 1e-12), approx=False), 0.0)
        d_op = jnp.sum(expneg * d_alpha, axis=0, keepdims=True)      # (1, CHUNK)
        d_sigma = jnp.where(live, -alpha * d_alpha, 0.0)             # (npix, CHUNK)

        ca, cb, cc = sub[2:3], sub[3:4], sub[4:5]
        d_ca = jnp.sum(0.5 * dx * dx * d_sigma, axis=0, keepdims=True)
        d_cb = jnp.sum(dx * dy * d_sigma, axis=0, keepdims=True)
        d_cc = jnp.sum(0.5 * dy * dy * d_sigma, axis=0, keepdims=True)
        d_dx = (ca * dx + cb * dy) * d_sigma
        d_dy = (cc * dy + cb * dx) * d_sigma
        d_mx = -jnp.sum(d_dx, axis=0, keepdims=True)
        d_my = -jnp.sum(d_dy, axis=0, keepdims=True)
        d_pvx = -jnp.sum(d_dx * t_row, axis=0, keepdims=True)
        d_pvy = -jnp.sum(d_dy * t_row, axis=0, keepdims=True)
        dcd = jax.lax.dot_general(
            G4, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )                                            # (4, CHUNK): colors+depth
        d_cols = dcd[0:3]
        d_dep = dcd[3:4]

        grads = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_cols, d_op, d_dep, d_pvx, d_pvy,
             jnp.zeros((NPARAM - 12, chunk), jnp.float32)],
            axis=0,
        )                                            # (16, CHUNK)
        d_params_ref[0, :, pl.ds(base, chunk)] += grads

        prefix = prefix_inc[:, -1:]
        T = jnp.min(jnp.where(active, t_inc, T), axis=1, keepdims=True)
        return i + 1, prefix, T

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((npix, 1), jnp.float32),
        jnp.ones((npix, 1), jnp.float32),
    )
    jax.lax.while_loop(cond, body, init)


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
    npix = tile_size * tile_size
    kernel = functools.partial(
        _fwd_kernel, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        chunk=chunk_width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_samples),
        in_specs=[
            # Param block resident across the inner sample axis (index ignores s).
            pl.BlockSpec((1, NPARAM, k), lambda t, s, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, NOUT, npix), lambda t, s, *_: (t, s, 0, 0), memory_space=pltpu.VMEM
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
    npix = tile_size * tile_size
    kernel = functools.partial(
        _bwd_kernel, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        chunk=chunk_width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_samples),
        in_specs=[
            pl.BlockSpec((1, NPARAM, k), lambda t, s, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NOUT, npix), lambda t, s, *_: (t, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NOUT, npix), lambda t, s, *_: (t, s, 0, 0), memory_space=pltpu.VMEM),
        ],
        # d block resident across the sample axis; accumulated in-kernel.
        out_specs=pl.BlockSpec((1, NPARAM, k), lambda t, s, *_: (t, 0, 0), memory_space=pltpu.VMEM),
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
