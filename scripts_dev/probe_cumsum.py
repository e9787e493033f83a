"""Probe: cumulative-sum-along-sublanes strategies inside a Pallas TPU kernel.

(CHUNK=128 gaussians on sublanes, npix=1024 pixels on lanes); need exclusive
cumsum along axis 0. Candidates: jnp.cumsum, manual log-shift via pltpu.roll,
MXU matmul with triangular mask (default / HIGHEST precision).
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

CHUNK, NPIX, T = 128, 1024, 512
ITERS = 4
REPS = 8  # inner repetitions per grid step to dominate overheads

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(T, CHUNK, NPIX)).astype(np.float32) * 0.01)


def run(kernel_body, name):
    def kernel(x_ref, o_ref):
        acc = jnp.zeros((CHUNK, NPIX), jnp.float32)
        v = x_ref[0]
        for _ in range(REPS):
            acc = acc + kernel_body(v + acc * 1e-9)
        o_ref[0] = acc

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, CHUNK, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, CHUNK, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, CHUNK, NPIX), jnp.float32),
        )(x)

    try:
        r = f(x)
        jax.block_until_ready(r)
        # correctness vs numpy exclusive cumsum
        want = np.cumsum(np.asarray(x[0]), axis=0) - np.asarray(x[0])
        got = np.asarray(r[0]) / REPS
        ok = np.allclose(got, want, atol=1e-3 * REPS)
        t0 = time.time()
        for _ in range(ITERS):
            jax.block_until_ready(f(x))
        dt = (time.time() - t0) / ITERS / REPS
        print(f"{name:30s} {dt*1e3:8.3f} ms/pass  correct={ok}")
    except Exception as e:
        print(f"{name:30s} FAILED: {repr(e)[:300]}")


def cumsum_jnp(v):
    return jnp.cumsum(v, axis=0) - v  # exclusive


def cumsum_roll(v):
    # log-shift exclusive scan along sublanes
    acc = v
    shift = 1
    while shift < CHUNK:
        rolled = pltpu.roll(acc, shift, 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPIX), 0)
        acc = jnp.where(rows >= shift, acc + rolled, acc)
        shift *= 2
    return acc - v


MASK = None

def cumsum_mm(v, precision):
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    M = (r < c).astype(v.dtype)
    return jax.lax.dot_general(
        M, v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


run(cumsum_jnp, "jnp.cumsum axis=0")
run(cumsum_roll, "manual roll log-shift")
run(functools.partial(cumsum_mm, precision=None), "matmul default")
run(functools.partial(cumsum_mm, precision=jax.lax.Precision.HIGHEST), "matmul HIGHEST")
