"""Sweep tile_size / max_per_tile for the packed Pallas kernels on TPU.

Hypothesis: per-grid-step overhead dominates, so fewer+bigger tiles win until
VMEM pressure bites.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, tiling
from splat_tpu.ops.pallas import pack_param_table, rasterize_fwd_packed, rasterize_bwd_packed, CHUNK
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

N, RES, S = 100_000, 1024, 5
ITERS = 8

rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(size=(N, 3)) * np.array([0.7, 0.6, 1.2]) + np.array([0, 0, 4.0]), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)) * 0.6) * 0.010, jnp.float32)
q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
quats = jnp.asarray(q, jnp.float32)
colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(N,)), jnp.float32)
fx = RES * 0.9
lv = jnp.array([0.4, -0.2, 0.1]); av = jnp.array([0.05, 0.1, -0.02])
eps = jnp.linspace(-0.5, 0.5, S) * 0.06

p0 = jax.jit(lambda m: projection.project_gaussians(
    m, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2, RES, RES,
    lin_vel=lv, ang_vel=av))(means)


def timeit(fn, x):
    @jax.jit
    def loop(x):
        def body(c, _):
            r = fn(c)
            return c + 0.0 * jnp.mean(r), jnp.mean(r)
        return jax.lax.scan(body, x, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(x)); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(x)); dt = (time.time() - t0) / ITERS
    return dt * 1e3, comp


for tile, mpt, mtpg, cw in [(16, 256, 16, 256), (16, 512, 16, 256), (16, 512, 16, 512), (32, 512, 8, 256), (32, 512, 8, 512), (16, 256, 16, 128)]:
    try:
        tw, th = tiling.num_tiles(RES, RES, tile)
        lists = tiling.build_tile_lists(
            p0.means2d, p0.extents, p0.depths, p0.valid, RES, RES, tile, mpt, mtpg)
        table = pack_param_table(p0, colors, opac)
        idx = jnp.where(lists.indices >= 0, lists.indices, N)
        pad_k = (-idx.shape[1]) % CHUNK
        if pad_k:
            idx = jnp.pad(idx, ((0, 0), (0, pad_k)), constant_values=N)
        packed = jnp.transpose(jnp.take(table, idx, axis=0), (0, 2, 1))
        ov = int(jnp.asarray(lists.overflow))
        fwd = lambda pk: jnp.sum(rasterize_fwd_packed(pk, lists.counts, jnp.float32(0.03), tile, tw, RES, 0.0, eps, chunk_width=cw))
        f_ms, f_c = timeit(fwd, packed)
        out0 = rasterize_fwd_packed(packed, lists.counts, jnp.float32(0.03), tile, tw, RES, 0.0, eps, chunk_width=cw)
        go = jnp.ones_like(out0)
        bwd = lambda pk: jnp.sum(rasterize_bwd_packed(pk, lists.counts, jnp.float32(0.03), out0, go, tile, tw, RES, 0.0, eps, chunk_width=cw))
        b_ms, b_c = timeit(bwd, packed)
        print(f"tile={tile:3d} mpt={mpt:4d} cw={cw:3d} tiles={tw*th:5d} overflow={ov:7d}  "
              f"fwd(S=5)={f_ms:7.2f} ms  bwd(S=5)={b_ms:7.2f} ms  (compile {f_c:.0f}/{b_c:.0f}s)")
    except Exception as e:
        print(f"tile={tile} mpt={mpt} cw={cw} FAILED: {repr(e)[:200]}")
