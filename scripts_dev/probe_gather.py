"""Probe alternative gather/sort formulations on TPU."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N, T, K = 100_000, 4096, 512
ITERS = 8
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(N, 16)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, size=(T, K)), jnp.int32)
soa = [jnp.asarray(rng.normal(size=(N,)), jnp.float32) for _ in range(12)]


def bench(fn, name, *args):
    @jax.jit
    def loop(a0):
        def body(carry, _):
            v = fn(carry, *args[1:])
            if jnp.issubdtype(carry.dtype, jnp.floating):
                carry = carry + 1e-18 * v.astype(carry.dtype)
            else:
                carry = carry + (v * 0).astype(carry.dtype)
            return carry, v
        return jax.lax.scan(body, a0, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(args[0])); c = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(args[0])); dt = (time.time() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.2f} ms/iter (compile {c:.0f}s)", flush=True)


# A: current approach — 12 separate takes + stack to (T, 12, K)
def gather_soa(x):
    rows = [jnp.take(s + x[0] * 0, idx, axis=0) for s in soa]
    return jnp.sum(jnp.stack(rows, axis=1))

# B: one row-gather from packed table -> (T, K, 16)
def gather_rows(tab):
    return jnp.sum(jnp.take(tab, idx, axis=0))

# C: row-gather + transpose to (T, 16, K)
def gather_rows_T(tab):
    g = jnp.take(tab, idx, axis=0)
    return jnp.sum(jnp.transpose(g, (0, 2, 1)))

# D: scatter-add (the backward of B)
def scatter_rows(tab):
    g = jnp.take(tab, idx, axis=0)
    out = jnp.zeros_like(tab)
    out = out.at[idx.reshape(-1)].add(g.reshape(-1, 16))
    return jnp.sum(out)


# E: sort comparisons
M = N * 16  # 1.6M entries (max_tiles_per_gaussian=16)
tiles = jnp.asarray(rng.integers(0, T, size=(M,)), jnp.int32)
depths = jnp.asarray(rng.normal(size=(M,)), jnp.float32)
vals = jnp.arange(M, dtype=jnp.int32)

def sort_two_key(t):
    s = jax.lax.sort((t, depths, vals), num_keys=2)
    return jnp.sum(s[2])

def sort_one_key(t):
    key = t * (1 << 19) + (vals % (1 << 19))
    s = jax.lax.sort_key_val(key, vals)
    return jnp.sum(s[1])

M2 = N * 64  # current 6.4M
tiles2 = jnp.asarray(rng.integers(0, T, size=(M2,)), jnp.int32)
depths2 = jnp.asarray(rng.normal(size=(M2,)), jnp.float32)
vals2 = jnp.arange(M2, dtype=jnp.int32)

def sort_two_key_64(t):
    s = jax.lax.sort((t, depths2, vals2), num_keys=2)
    return jnp.sum(s[2])

def sort_one_key_64(t):
    key = t * (1 << 19) + (vals2 % (1 << 19))
    s = jax.lax.sort_key_val(key, vals2)
    return jnp.sum(s[1])

def argsort_depth(d):
    return jnp.sum(jnp.argsort(d[:N]))


bench(gather_soa, "A soa 12x take+stack", soa[0])
bench(gather_rows, "B row gather (T,K,16)", table)
bench(gather_rows_T, "C row gather + transpose", table)
bench(scatter_rows, "D scatter-add rows", table)
bench(sort_two_key, "E 2-key sort 1.6M", tiles)
bench(sort_one_key, "F 1-key sort 1.6M", tiles)
bench(sort_two_key_64, "G 2-key sort 6.4M", tiles2)
bench(sort_one_key_64, "H 1-key sort 6.4M", tiles2)
bench(argsort_depth, "I argsort 100k f32", depths2)
