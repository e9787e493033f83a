"""Probe: per-tile segment fetch — XLA row-gather vs in-kernel DMA.

The pipeline's gather2 materializes the dense (T, K, 16) per-tile parameter
blocks from the depth-sorted (L, 16) stream by an XLA gather of T*K rows
(positions starts[t] + j). BASELINE.md prices XLA gathers at ~2.6 ns/row —
2.7 ms at the bench shapes — vs an HBM-bytes bound of ~0.2 ms. Question: can
a Pallas kernel that issues ONE async copy per tile (K contiguous rows at a
dynamic, non-aligned offset) beat the gather? DMA issue overhead is ~1 us, so
T=4096 tiles -> ~4 ms IF each tile costs a full issue; the pipelined
BlockSpec path amortizes differently. Measure, don't guess.

Variants:
  A: XLA gather (the current production path)
  B: pallas copy kernel — grid over tiles, manual make_async_copy from an
     ANY-space (HBM) src at pl.ds(dynamic start), double-buffered
  C: same but tiles_per_step=8 batching (amortize grid overhead)
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

T, K, P = 4096, 256, 16          # bench shapes: 64x64 tiles, max_per_tile 256
L = 800_000                       # sorted stream length (N * M = 100k * 8)
ITERS = 16
rng = np.random.default_rng(0)

# plausible starts: sorted, segments averaging ~70 rows (286k real entries)
seg = rng.integers(0, 140, size=T)
starts = np.minimum(np.concatenate([[0], np.cumsum(seg)[:-1]]), L - 1).astype(np.int32)
starts_j = jnp.asarray(starts)
src = jnp.asarray(rng.normal(size=(L + K, P)).astype(np.float32))


def timeit(name, fn, *args):
    @jax.jit
    def loop(a0):
        def body(c, _):
            r = fn(c, *args[1:])
            return c + 0.0 * jnp.mean(r), jnp.mean(r)
        return jax.lax.scan(body, a0, None, length=ITERS)

    t0 = time.time(); jax.block_until_ready(loop(args[0])); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(args[0])); dt = (time.time() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:8.2f} ms/iter  (compile {comp:.0f}s)", flush=True)
    return dt


# --- A: XLA gather (production path shape)
def xla_gather(src, starts):
    pos = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    return jnp.take(src, pos, axis=0)             # (T, K, P)


# --- B/C: pallas manual-DMA copy
def dma_kernel(starts_ref, src_ref, out_ref, scratch, sem, *, tps):
    t0 = pl.program_id(0) * tps
    for b in range(tps):
        start = starts_ref[t0 + b]
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(start, K), :], scratch.at[b], sem.at[b]
        )
        cp.start()
    for b in range(tps):
        start = starts_ref[t0 + b]
        pltpu.make_async_copy(
            src_ref.at[pl.ds(start, K), :], scratch.at[b], sem.at[b]
        ).wait()
        out_ref[b] = scratch[b]


def pallas_dma(src, starts, tps):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // tps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tps, K, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tps, K, P), jnp.float32),
            pltpu.SemaphoreType.DMA((tps,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(dma_kernel, tps=tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, K, P), jnp.float32),
    )(starts, src)


if __name__ == "__main__":
    a = timeit("A xla row-gather (T*K rows)", xla_gather, src, starts_j)
    for tps in (1, 4, 8):
        try:
            timeit(f"B pallas DMA copy tps={tps}",
                   lambda s, st, _tps=tps: pallas_dma(s, st, _tps), src, starts_j)
        except Exception as e:
            print(f"B tps={tps} FAILED: {type(e).__name__}: {str(e)[:300]}")
    # sanity: B == A
    try:
        out_a = xla_gather(src, starts_j)
        out_b = pallas_dma(src, starts_j, 4)
        print("allclose:", bool(jnp.allclose(out_a, out_b)))
    except Exception as e:
        print("check failed:", str(e)[:200])


# --- C: aligned-floor DMA + in-VMEM shift. If Mosaic rejects only the
# UNALIGNED dynamic source offset, flooring the start to an 8/32-row boundary
# and slicing the remainder inside VMEM may compile.
def dma_kernel_al(starts_ref, src_ref, out_ref, scratch, sem, *, tps, align):
    t0 = pl.program_id(0) * tps
    for b in range(tps):
        st = starts_ref[t0 + b]
        fl = (st // align) * align
        pltpu.make_async_copy(
            src_ref.at[pl.ds(fl, K + align), :], scratch.at[b], sem.at[b]
        ).start()
    for b in range(tps):
        st = starts_ref[t0 + b]
        fl = (st // align) * align
        pltpu.make_async_copy(
            src_ref.at[pl.ds(fl, K + align), :], scratch.at[b], sem.at[b]
        ).wait()
        out_ref[b] = scratch[b, pl.ds(st - fl, K), :]


def pallas_dma_aligned(src, starts, tps, align):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // tps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tps, K, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tps, K + align, P), jnp.float32),
            pltpu.SemaphoreType.DMA((tps,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(dma_kernel_al, tps=tps, align=align),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, K, P), jnp.float32),
    )(starts, src)


def run_variant_c():
    for align in (8, 32, 128):
        for tps in (4,):
            try:
                timeit(f"C aligned-floor DMA align={align}",
                       lambda s, st, _t=tps, _a=align: pallas_dma_aligned(s, st, _t, _a),
                       src, starts_j)
                out_a = xla_gather(src, starts_j)
                out_c = pallas_dma_aligned(src, starts_j, 4, align)
                print(f"  C align={align} allclose:", bool(jnp.allclose(out_a, out_c)))
            except Exception as e:
                print(f"C align={align} FAILED: {type(e).__name__}: {str(e)[:200]}")
