"""Isolate pallas fwd/bwd kernel cost: fixed-per-tile vs per-sample scaling.

Times rasterize_fwd_packed / rasterize_bwd_packed directly on realistic packed
inputs (built once from the bench scene's actual tiling), at S in {1, 2, 5}.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, tiling
from splat_tpu.ops.pallas import (
    pack_param_table, rasterize_bwd_packed, rasterize_fwd_packed,
)
from splat_tpu.ops.pallas.rasterize_kernels import CHUNK
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

N, RES, TILE, MPT, MTPG = 100_000, 1024, 16, 256, 8
ITERS = 16
rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(size=(N, 3)) * np.array([0.7, 0.6, 1.2]) + np.array([0, 0, 4.0]), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)) * 0.6) * 0.010, jnp.float32)
q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
quats = jnp.asarray(q, jnp.float32)
colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(N,)), jnp.float32)
fx = RES * 0.9
lv = jnp.array([0.4, -0.2, 0.1]); av = jnp.array([0.05, 0.1, -0.02])
tw, th = tiling.num_tiles(RES, RES, TILE)

proj = projection.project_gaussians(
    means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2,
    RES, RES, lin_vel=lv, ang_vel=av)
rs = jnp.float32(0.03)
t_max = 0.03 + 0.5 * 0.03
pad = jnp.max(jnp.abs(proj.pix_vels), axis=-1) * t_max
lists = tiling.build_tile_lists(proj.means2d, proj.extents, proj.depths,
                                proj.valid, RES, RES, TILE, MPT, MTPG,
                                radius_pad=pad)
table = pack_param_table(proj, colors, opac)
idx = jnp.where(lists.indices >= 0, lists.indices, N)
import os as _os
_gmajor = _os.environ.get("SPLAT_TPU_LAYOUT", "row").lower() == "gmajor"
gathered = jnp.take(table, idx, axis=0)                          # (T,K,16)
packed = gathered if _gmajor else jnp.transpose(gathered, (0, 2, 1))
packed = jax.block_until_ready(packed)
counts = jax.block_until_ready(lists.counts)
cnt = np.asarray(counts)
print(f"tiles={cnt.shape[0]} count mean={cnt.mean():.0f} p50={np.percentile(cnt,50):.0f} "
      f"p90={np.percentile(cnt,90):.0f} max={cnt.max()} sum={cnt.sum()}")


def timeit(name, fn, x=None):
    @jax.jit
    def loop(x):
        def body(c, _):
            r = fn(c)
            return c + 0.0 * jnp.mean(r), 0.0
        return jax.lax.scan(body, x, None, length=ITERS)
    if x is None:
        x = packed
    t0 = time.time(); jax.block_until_ready(loop(x)); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(x)); dt = (time.time() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)")
    return dt


for S in (1, 5):
    eps = jnp.linspace(-0.5, 0.5, S) * 0.06 if S > 1 else jnp.zeros((1,))

    def fwd(p, eps=eps):
        return rasterize_fwd_packed(p, counts, rs, TILE, tw, RES, 0.0, eps)

    out = jax.block_until_ready(fwd(packed))
    g = jnp.ones_like(out)

    def bwd(p, eps=eps, out=out, g=g):
        return rasterize_bwd_packed(p, counts, rs, out, g, TILE, tw, RES, 0.0, eps)

    timeit(f"pallas fwd S={S}", fwd)
    timeit(f"pallas bwd S={S}", bwd)
