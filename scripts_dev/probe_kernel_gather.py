"""Probe: Mosaic in-kernel dynamic row gather / accumulate throughput.

Question: can a Pallas kernel gather (and scatter-accumulate) param-table rows
by per-tile index lists faster than XLA's ~10-20 ns/row gather/scatter?

Table (N,16) f32 ~6.4MB lives in VMEM as a constant block across the grid.
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

T, K, N, P = 1024, 512, 100_000, 16
ITERS = 8
rng = np.random.default_rng(0)
NPAD = ((N + 1 + 7) // 8) * 8

idx = rng.integers(0, N, size=(T, K)).astype(np.int32)
idx_j = jnp.asarray(idx).reshape(T, 1, K)
table = jnp.asarray(rng.normal(size=(NPAD, P)).astype(np.float32))


def timeit(name, fn, x):
    @jax.jit
    def loop(x):
        def body(c, _):
            r = fn(c)
            return c + 0.0 * jnp.mean(r), jnp.mean(r)
        return jax.lax.scan(body, x, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(x)); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(x)); dt = (time.time() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms/iter  (compile {comp:.0f}s)")
    return dt


# --- A: in-kernel row-loop gather: out[t, j, :] = table[idx[t, j], :]
def gather_kernel(idx_ref, table_ref, out_ref):
    def body(j, _):
        i = idx_ref[0, 0, j]
        out_ref[0, j, :] = table_ref[i, :]
        return 0
    jax.lax.fori_loop(0, K, body, 0)


@jax.jit
def kernel_gather(table):
    return pl.pallas_call(
        gather_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((NPAD, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, P), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, K, P), jnp.float32),
    )(idx_j, table)


# --- B: in-kernel accumulate: d_table[idx[t, j], :] += g[t, j, :]
g_rows = jnp.asarray(rng.normal(size=(T, K, P)).astype(np.float32))

def scatter_kernel(idx_ref, g_ref, acc_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(j, _):
        i = idx_ref[0, 0, j]
        acc_ref[i, :] += g_ref[0, j, :]
        return 0
    jax.lax.fori_loop(0, K, body, 0)


@jax.jit
def kernel_scatter(g):
    return pl.pallas_call(
        scatter_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, P), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NPAD, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD, P), jnp.float32),
    )(idx_j, g)


try:
    r = kernel_gather(table)
    jax.block_until_ready(r)
    # verify
    exp = jnp.take(table, idx_j.reshape(T, K), axis=0)
    print("A gather correct:", bool(jnp.allclose(r, exp)))
    timeit("A in-kernel row gather", kernel_gather, table)
except Exception as e:
    print("A failed:", repr(e)[:500])

try:
    r = kernel_scatter(g_rows)
    jax.block_until_ready(r)
    exp = jnp.zeros((NPAD, P)).at[idx_j.reshape(-1)].add(g_rows.reshape(-1, P))
    print("B scatter correct:", bool(jnp.allclose(r, exp, atol=1e-3)))
    timeit("B in-kernel row accumulate", kernel_scatter, g_rows)
except Exception as e:
    print("B failed:", repr(e)[:500])
