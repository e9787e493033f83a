"""Probe sort strategies for tile binning.

Current: lexicographic lax.sort((tile i32, depth f32, id i32), num_keys=2) on
N*M entries. Candidates:
  A. current 2-key 3-array sort
  B. depth-presort gaussians (N) once, then stable 1-key tile sort (2 arrays)
  C. packed single key: tile * 2^20 | depth-rank (needs presort too) -> 1-key
     sort of (i32 key, i32 payload) — identical info to B but key carries rank.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

N, M = 100_000, 4
S = N * M
ITERS = 8
rng = np.random.default_rng(0)

tiles = jnp.asarray(rng.integers(0, 1024, size=(S,)).astype(np.int32))
depths = jnp.asarray(rng.uniform(0.1, 10.0, size=(S,)).astype(np.float32))
ids = jnp.asarray(np.arange(S, dtype=np.int32))
gdepths = jnp.asarray(rng.uniform(0.1, 10.0, size=(N,)).astype(np.float32))


def timeit(name, fn, x):
    @jax.jit
    def loop(x):
        def body(c, _):
            r = fn(c)
            return c + 0.0 * jnp.mean(jnp.asarray(r[0], jnp.float32)), 0.0
        return jax.lax.scan(body, x, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(x)); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(x)); dt = (time.time() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:8.2f} ms/iter  (compile {comp:.0f}s)")
    return dt


timeit("A 2-key 3-array sort (S)", lambda d: jax.lax.sort((tiles, d, ids), num_keys=2), depths)
timeit("B1 gaussian depth presort (N, 2 arr)", lambda d: jax.lax.sort((d, ids[:N]), num_keys=1), gdepths)
timeit("B2 stable 1-key tile sort (2 arr)",
       lambda t: jax.lax.sort((t, ids), num_keys=1, is_stable=True), tiles)
timeit("B2' nonstable 1-key packed sort (2 arr)",
       lambda t: jax.lax.sort((t, ids), num_keys=1, is_stable=False), tiles)
# C. packed key: tile*2^20 + rank (rank fits 20 bits for N*M < 1M)
packed = tiles * (1 << 20) + (ids & ((1 << 20) - 1))
timeit("C packed 1-key sort (2 arr)",
       lambda p: jax.lax.sort((p, ids), num_keys=1, is_stable=False), packed)
# D. sort key only, no payload (lower bound)
timeit("D 1-key sort alone", lambda p: (jax.lax.sort(p),), packed)
