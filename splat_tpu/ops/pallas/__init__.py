"""Pallas TPU kernel package + the custom-VJP wrapper used by ops.rasterize.

`rasterize_tiles_pallas` is the drop-in replacement for
`ops.rasterize.composite_tiles_jnp`: same inputs (TileLists + projected
gaussians), same outputs (per-tile rgb / depth / transmittance), but the
per-tile compositing runs in the hand-written Pallas kernels of
`rasterize_kernels` with an analytic backward pass (SURVEY.md §2c #5/#6).

One custom_vjp (`_composite_sorted`) spans gather + kernels: the forward
slices each tile's parameter block straight out of the depth-sorted table
(no dense id table), and the backward maps per-slot gradients back to
gaussians by GATHER via the binning sort's slot<->entry bijection — both
directions deterministic, no scatter-adds anywhere (SURVEY.md §5).
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

# A/B knob: cut the gather<->transpose fusion with optimization_barriers so
# XLA materializes the (L, 16) row-gather and the (T, K, 16) slot-slice as
# separate contiguous buffers instead of one fused strided-write gather.
_GATHER_BARRIER = _os.environ.get("SPLAT_TPU_GATHER_BARRIER", "0") != "0"
# A/B knob: fetch the dense per-tile parameter blocks with an in-kernel DMA
# copy (seg_copy.py) instead of the XLA T*K-row gather.
_SEG_DMA = _os.environ.get("SPLAT_TPU_SEG_DMA", "0") != "0"

from .. import tiling
from ..projection import ProjectedGaussians
from .rasterize_kernels import (
    CHUNK,
    NPARAM,
)

# Kernel layout: "row" = gaussian chunk on lanes (CHUNK=128 granularity);
# "gmajor" = pixels x samples on lanes, gaussians on sublanes (GCHUNK
# granularity — see rasterize_kernels_gmajor.py for the lane-utilization
# math); "mixed" = gmajor forward + row-major backward over the SAME
# row-major packed table. Default is "mixed" — the best measured fwd
# (9.22 vs 12.0 ms at S=5, bench scene) composed with the best measured bwd
# (20.3 vs 26-27 ms); exact vs the oracle in every mode.
_LAYOUT = _os.environ.get("SPLAT_TPU_LAYOUT", "mixed").lower()
if _LAYOUT == "gmajor":
    from .rasterize_kernels_gmajor import (
        GCHUNK as _K_ALIGN,
        rasterize_bwd_gpacked as rasterize_bwd_packed,
        rasterize_fwd_gpacked as rasterize_fwd_packed,
    )
elif _LAYOUT == "mixed":
    from .rasterize_kernels import rasterize_bwd_packed
    from .rasterize_kernels_gmajor import (
        rasterize_fwd_gpacked_rowin as rasterize_fwd_packed,
    )
    _K_ALIGN = CHUNK
else:
    from .rasterize_kernels import (
        rasterize_bwd_packed,
        rasterize_fwd_packed,
    )
    _K_ALIGN = CHUNK


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _composite_packed(params_packed, counts, rs_time, row_offset, eps, tile_size, tiles_x, img_h):
    return rasterize_fwd_packed(
        params_packed, counts, rs_time, tile_size, tiles_x, img_h, row_offset, eps
    )


def _composite_fwd(params_packed, counts, rs_time, row_offset, eps, tile_size, tiles_x, img_h):
    out = rasterize_fwd_packed(
        params_packed, counts, rs_time, tile_size, tiles_x, img_h, row_offset, eps
    )
    return out, (params_packed, counts, rs_time, row_offset, eps, out)


def _composite_bwd(tile_size, tiles_x, img_h, res, g_out):
    params_packed, counts, rs_time, row_offset, eps, fwd_out = res
    d_params = rasterize_bwd_packed(
        params_packed, counts, rs_time, fwd_out, g_out, tile_size, tiles_x, img_h,
        row_offset, eps,
    )
    d_counts = np.zeros(counts.shape, jax.dtypes.float0)  # int arg: float0 zero
    return (d_params, d_counts, jnp.zeros_like(rs_time), jnp.zeros_like(row_offset),
            jnp.zeros_like(eps))


_composite_packed.defvjp(_composite_fwd, _composite_bwd)


def pack_param_table(
    proj: ProjectedGaussians, colors: jax.Array, opacities: jax.Array
) -> jax.Array:
    """Per-Gaussian packed (N+1, NPARAM) parameter table (row N = zero pad row).

    One contiguous row per Gaussian makes the per-tile parameter fetch a
    SINGLE XLA row-gather (measured 7x faster on v5e than 12 strided SoA
    gathers + stack); the transpose to the kernel's (T, 16, K) layout fuses
    into the gather.
    """
    op_eff = opacities * proj.compensations * proj.valid.astype(colors.dtype)
    # Row 12 = log(op_eff): lets the kernels evaluate alpha with a single
    # exp (alpha = exp(log_op - sigma)) and run every mask as a comparison
    # in log space. stop_gradient: the kernel emits the opacity gradient
    # through row 8 only (row 12 cotangents are zero by construction, and
    # log's VJP at op_eff=0 would be inf*0=nan without this).
    log_op = jax.lax.stop_gradient(jnp.log(jnp.maximum(op_eff, 1e-35)))
    cols = [
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
        colors[:, 0], colors[:, 1], colors[:, 2],
        op_eff, proj.depths,
        proj.pix_vels[:, 0], proj.pix_vels[:, 1],
        log_op,
    ]
    n = proj.means2d.shape[0]
    table = jnp.stack(cols, axis=1)                      # (N, 13)
    table = jnp.pad(table, ((0, 1), (0, NPARAM - len(cols))))  # (N+1, NPARAM)
    return table


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gather_table(table, sorted_ids, starts, entry_slots, max_per_tile, k_pad):
    """Per-tile parameter fetch straight from sorted order, with a GATHER-form
    backward.

    Forward: one L-row gather puts the table rows in sorted (tile, depth)
    order; each tile's slot block is then a contiguous (starts[t] + j) row
    slice of it — no dense (T, K) id table is ever materialized. (Composing
    the two hops at the ID level — int32 id table + one gather from the small
    (N+1, 16) table — wins a standalone microbenchmark 3x but traced SLOWER
    in the full pipeline: 9.4 vs 7.4 ms/step.) Lanes past a tile's count pick
    up NEIGHBORING tiles' rows; the kernel's count mask zeroes both their
    alpha and their gradients, so the garbage never escapes.

    Backward: instead of XLA's T*K-row scatter-add (measured 14.1 ms at 1M
    slots — it internally sorts the indices every step), use the slot<->entry
    bijection `entry_slots` prepared once by tiling.build_tile_lists: gather
    each candidate entry's slot gradient (L=N*M rows) and dense-reduce over
    the M axis. Deterministic, and ~3x cheaper because L << T*K and the sort
    already happened at binning time."""
    sp = jnp.take(table, sorted_ids, axis=0)                # (L, 16)
    if _GATHER_BARRIER:
        sp = jax.lax.optimization_barrier(sp)
    sp = jnp.concatenate([sp, jnp.zeros((k_pad, sp.shape[1]), sp.dtype)], axis=0)
    if _SEG_DMA:
        # in-kernel DMA: one async copy per tile of its contiguous row slice
        # (BASELINE.md's named experiment; A/B vs the XLA T*K-row gather)
        from .seg_copy import seg_copy

        return seg_copy(sp, starts, k_pad, starts.shape[0])
    pos = starts[:, None] + jnp.arange(k_pad, dtype=jnp.int32)[None, :]
    out = jnp.take(sp, pos, axis=0)                         # (T, K_pad, 16)
    if _GATHER_BARRIER:
        out = jax.lax.optimization_barrier(out)
    return out


def _gather_table_fwd(table, sorted_ids, starts, entry_slots, max_per_tile, k_pad):
    out = _gather_table(table, sorted_ids, starts, entry_slots, max_per_tile, k_pad)
    return out, (entry_slots, table.shape[0], sorted_ids.shape, starts.shape)


def _gather_table_bwd(max_per_tile, k_pad, res, g):
    entry_slots, n_rows, ids_shape, starts_shape = res
    k = max_per_tile
    n_tiles, npar = g.shape[0], g.shape[2]
    d_slots = g[:, :k, :].reshape(n_tiles * k, npar)
    d_slots = jnp.concatenate([d_slots, jnp.zeros((1, npar), g.dtype)], axis=0)
    d_entries = jnp.take(d_slots, entry_slots, axis=0)      # (N*M, 16)
    n = n_rows - 1                                          # table row n = pad
    m = entry_slots.shape[0] // n
    d_table = d_entries.reshape(n, m, npar).sum(axis=1)
    d_table = jnp.concatenate([d_table, jnp.zeros((1, npar), g.dtype)], axis=0)
    return (
        d_table,
        np.zeros(ids_shape, jax.dtypes.float0),
        np.zeros(starts_shape, jax.dtypes.float0),
        np.zeros(entry_slots.shape, jax.dtypes.float0),
    )


_gather_table.defvjp(_gather_table_fwd, _gather_table_bwd)


def rasterize_tiles_pallas(
    lists: tiling.TileLists,
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    img_w: int,
    img_h: int,
    tile_size: int,
    rs_time: jax.Array,
    max_per_tile: int,
    rs_full_height: int | None = None,
    rs_row_offset: jax.Array | int = 0,
    eps: jax.Array | None = None,
    reduce_mean: bool = False,
    mid_index: int | None = None,
    background: jax.Array | None = None,
):
    """Per-tile compositing via the Pallas kernels.

    eps: optional (S,) blur sub-frame times for the fused exposure path — the
    expensive binning/gather happened ONCE upstream; the kernels render all S
    sub-frames from the resident per-tile parameter blocks. Returns per-tile
    (rgb (T,S,s,s,3), depth (T,S,s,s), transmittance (T,S,s,s)); S=1 when
    eps is None.

    reduce_mean: training only ever consumes the blur AVERAGE (Appendix B.4)
    plus the mid-exposure depth, so reduce over S here — BEFORE the
    lane<->sublane relayout to image layout — and return SEPARATE tile
    tensors (rgb_with_bg (T,s,s,3), T_mean (T,s,s), depth_mid (T,s,s)).
    The relayout + assembly then covers 3 channel-planes instead of 3*S+S
    (measured ~9 ms/step at S=5, 1024²), the background term folds in as a
    cheap tile-space FMA, and — because each output is assembled separately —
    XLA dead-code-eliminates the T/depth relayouts when the caller only uses
    rgb (the training loss). Autodiff through the mean fans the image
    cotangent back across samples as a cheap broadcast.
    """
    tw, th = tiling.num_tiles(img_w, img_h, tile_size)
    table = pack_param_table(proj, colors, opacities)
    k = max_per_tile
    k_pad = k + ((-k) % _K_ALIGN)
    gathered = _gather_table(
        table, lists.sorted_ids, lists.starts, lists.entry_slots, k, k_pad
    )  # (T, K_pad, 16)
    if _LAYOUT == "gmajor":
        # gmajor kernels consume the gather's natural (T, K, NPARAM) layout;
        # no transpose anywhere (fwd input or bwd cotangent)
        packed = gathered
    else:
        packed = jnp.transpose(gathered, (0, 2, 1))        # (T, 16, K), fused
    eps_arr = jnp.zeros((1,), jnp.float32) if eps is None else jnp.asarray(eps, jnp.float32)
    out = _composite_packed(
        packed, lists.counts, jnp.asarray(rs_time, jnp.float32),
        jnp.asarray(rs_row_offset, jnp.float32), eps_arr,
        tile_size, tw, rs_full_height or img_h,
    )  # (T, S, 8, npix)
    n_tiles, n_samples = out.shape[0], out.shape[1]
    sw, sh = tiling.tile_wh(tile_size)
    if reduce_mean:
        mid = n_samples // 2 if mid_index is None else mid_index
        m = out.mean(axis=1)                             # (T, 8, npix)
        t_mean = m[:, 4]                                 # (T, npix)
        rgb_bg = m[:, 0:3] + background[None, :, None] * m[:, 4:5]
        rgb_t = jnp.transpose(rgb_bg, (0, 2, 1)).reshape(n_tiles, sh, sw, 3)
        alpha_mid = jnp.maximum(1.0 - out[:, mid, 4], 1e-10)
        depth_mid = (out[:, mid, 3] / alpha_mid).reshape(n_tiles, sh, sw)
        return rgb_t, t_mean.reshape(n_tiles, sh, sw), depth_mid
    rgb_t = jnp.transpose(out[:, :, 0:3, :], (0, 1, 3, 2)).reshape(n_tiles, n_samples, sh, sw, 3)
    dep_t = out[:, :, 3, :].reshape(n_tiles, n_samples, sh, sw)
    T_t = out[:, :, 4, :].reshape(n_tiles, n_samples, sh, sw)
    return rgb_t, dep_t, T_t
