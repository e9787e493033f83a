"""Per-tile segment fetch as an in-kernel DMA copy (gather2 replacement).

The production `_gather_table` materializes the dense (T, K_pad, 16) per-tile
parameter blocks from the depth-sorted (L, 16) stream with an XLA gather of
T*K_pad rows — priced at ~2.6 ns/ROW regardless of row width (BASELINE.md
roofline: 2.7 ms at bench shapes vs a 0.2 ms HBM-bytes bound). Every tile's
block is a CONTIGUOUS row slice [starts[t], starts[t]+K) of the sorted
stream, so a Pallas kernel can fetch it with ONE async copy per tile from an
ANY-space (HBM-resident) source at a dynamic row offset — no per-row issue
cost. This was BASELINE.md's named round-3 experiment ("in-kernel DMA of the
depth-sorted, per-tile-contiguous parameter rows").

Enabled via SPLAT_TPU_SEG_DMA=1 (see ops/pallas/__init__._gather_table);
gradients are untouched — _gather_table's custom VJP never differentiates
through this forward. Double-buffered: tile b+1's copy is issued before
waiting on tile b's.

MEASURED VERDICT (round 3, v5e via the remote tunnel): exact in interpret
mode (tests/test_pallas.py::test_seg_dma_gather_matches_xla_gather), but the
REAL-TPU Mosaic compile rejects the kernel (remote_compile HTTP 500) at
every tiles-per-step AND with the source offset floored to 8/32/128-row
alignment (probe variant C) — so the blocker is the dynamic-offset async
copy out of an ANY-space ref in this jax/Mosaic build, not offset
alignment. scripts_dev/probe_seg_dma.py reproduces both. Kept as an
env-gated documented dead end; the XLA gather path stays default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_kernels import _interpret, _tiles_per_step


def _copy_kernel(starts_ref, src_ref, out_ref, scratch, sem, *, tps, k_pad):
    t0 = pl.program_id(0) * tps

    def copy(b):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(starts_ref[t0 + b], k_pad), :],
            scratch.at[b], sem.at[b],
        )

    for b in range(tps):
        copy(b).start()
    for b in range(tps):
        copy(b).wait()
        out_ref[b] = scratch[b]


@functools.partial(jax.jit, static_argnames=("k_pad", "n_tiles"))
def seg_copy(sp: jax.Array, starts: jax.Array, k_pad: int, n_tiles: int):
    """(L_pad, P) sorted stream + (T,) row starts -> dense (T, k_pad, P).

    sp must have >= max(starts) + k_pad rows (the caller appends k_pad zero
    rows, exactly as for the XLA gather path)."""
    p = sp.shape[1]
    tps = _tiles_per_step(n_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tps, k_pad, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tps, k_pad, p), sp.dtype),
            pltpu.SemaphoreType.DMA((tps,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_copy_kernel, tps=tps, k_pad=k_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, k_pad, p), sp.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=int(2 * n_tiles * k_pad * p * sp.dtype.itemsize),
            transcendentals=0,
        ),
    )(starts, sp)
