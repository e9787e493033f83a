"""Probe: which backward-scatter formulation is fastest on TPU?

Shapes from bench config: T=1024 tiles (32px at 1024^2), K=512 slots, N=100k
gaussians, M=4 expansion slots per gaussian, 16 params.
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

T, K, N, M, P = 1024, 512, 100_000, 4, 16
ITERS = 8
rng = np.random.default_rng(0)

# Random but realistic index structure: each tile's slots point at distinct
# gaussian entries; entry e = i*M + k unique per (tile, slot).
n_entries = N * M
n_live = min(n_entries, int(T * K * 0.76))
flat = np.full((T * K,), n_entries, np.int64)
flat[: n_live] = rng.permutation(n_entries)[:n_live]
rng.shuffle(flat)
entry_ids = flat.reshape(T, K).astype(np.int32)
gauss_ids = np.where(entry_ids < n_entries, entry_ids // M, N).astype(np.int32)

entry_idx = jnp.asarray(entry_ids)
gauss_idx = jnp.asarray(gauss_ids)
d_gathered = jnp.asarray(rng.normal(size=(T, K, P)).astype(np.float32))


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


# A. current: scatter-ADD into (N+1, P) at gauss ids
def scatter_add(dg):
    flat = dg.reshape(T * K, P)
    return jnp.zeros((N + 1, P), jnp.float32).at[gauss_idx.reshape(-1)].add(
        flat, mode="drop")

timeit("A scatter-add (N,P)", scatter_add, d_gathered)

# B. unique scatter-SET into (N*M+1, P) at entry ids, then dense sum over M
def scatter_set_sum(dg):
    flat = dg.reshape(T * K, P)
    d_exp = jnp.zeros((n_entries + 1, P), jnp.float32).at[entry_idx.reshape(-1)].set(
        flat, mode="drop", unique_indices=True)
    return d_exp[:n_entries].reshape(N, M, P).sum(axis=1)

timeit("B unique scatter-set + sum", scatter_set_sum, d_gathered)

# C. same but scatter indices sorted hint off/on doesn't apply (not sorted).
# D. gather-based: inverse table (N, M) -> (t*K + j) precomputed (one-time cost
#    NOT counted here; separate question). Then backward = pure gather.
inv = np.full((n_entries + 1,), T * K, np.int64)
flat_e = entry_ids.reshape(-1)
inv[flat_e] = np.arange(T * K)
inv_idx = jnp.asarray(inv[:n_entries].reshape(N, M).astype(np.int32))

def gather_inverse(dg):
    flat = jnp.concatenate([dg.reshape(T * K, P), jnp.zeros((1, P))], axis=0)
    d_exp = jnp.take(flat, inv_idx, axis=0)  # (N, M, P)
    return d_exp.sum(axis=1)

timeit("D gather by inverse map + sum", gather_inverse, d_gathered)

# E. the forward gather for scale reference: (T,K) rows from (N+1, P)
table = jnp.asarray(rng.normal(size=(N + 1, P)).astype(np.float32))
def fwd_gather(tb):
    return jnp.take(tb, jnp.minimum(gauss_idx, N), axis=0)
timeit("E fwd gather (T,K,P)", fwd_gather, table)

# F. building the inverse map on-line via scatter-set of int32 (1 col)
def build_inv(dummy):
    pos = jax.lax.broadcasted_iota(jnp.int32, (T * K, 1), 0)
    invm = jnp.full((n_entries + 1, 1), T * K, jnp.int32).at[
        entry_idx.reshape(-1)].set(pos, mode="drop", unique_indices=True)
    return invm[:n_entries].reshape(N, M)
timeit("F build inv map (i32 scatter)", build_inv, d_gathered)

# G. verify B == A numerically
a = scatter_add(d_gathered)[:N]
b = scatter_set_sum(d_gathered)
print("B allclose A:", bool(jnp.allclose(a, b, atol=1e-5)))
d = gather_inverse(d_gathered)
print("D allclose A:", bool(jnp.allclose(a, d, atol=1e-5)))
