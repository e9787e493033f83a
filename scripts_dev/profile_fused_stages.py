"""Stage deltas for the fused bench pipeline (tile16/mpt256/mtpg8, S=5)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize, tiling
from splat_tpu.ops.pallas import pack_param_table, rasterize_fwd_packed, CHUNK
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

N, RES, TILE, MPT, MTPG, S = 100_000, 1024, 16, 256, 8, 5
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
tw, th = tiling.num_tiles(RES, RES, TILE)


def proj_fn(m):
    return projection.project_gaussians(
        m, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2, RES, RES,
        lin_vel=lv, ang_vel=av)


def timeit(name, fn, x):
    @jax.jit
    def loop(x):
        def body(c, _):
            r = fn(c)
            return c + 0.0 * jnp.mean(r), 0.0
        return jax.lax.scan(body, x, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(x)); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(x)); dt = (time.time() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)")
    return dt


def upto_lists(m):
    p = proj_fn(m)
    rs = jnp.float32(0.03)
    t_max = jnp.max(jnp.abs(eps)) + 0.5 * rs
    pad = jnp.max(jnp.abs(p.pix_vels), axis=-1) * t_max
    lists = tiling.build_tile_lists(p.means2d, p.extents, p.depths, p.valid,
                                    RES, RES, TILE, MPT, MTPG, radius_pad=pad)
    return jnp.sum(lists.indices) + jnp.sum(lists.counts)


def upto_packed(m):
    p = proj_fn(m)
    rs = jnp.float32(0.03)
    t_max = jnp.max(jnp.abs(eps)) + 0.5 * rs
    pad = jnp.max(jnp.abs(p.pix_vels), axis=-1) * t_max
    lists = tiling.build_tile_lists(p.means2d, p.extents, p.depths, p.valid,
                                    RES, RES, TILE, MPT, MTPG, radius_pad=pad)
    table = pack_param_table(p, colors, opac)
    idx = jnp.where(lists.indices >= 0, lists.indices, N)
    packed = jnp.transpose(jnp.take(table, idx, axis=0), (0, 2, 1))
    return jnp.sum(packed)


def fwd_only(m):
    p = proj_fn(m)
    out = rasterize.rasterize_fused(p, colors, opac, RES, RES, jnp.zeros(3),
        eps=eps, rolling_shutter_time=0.03, tile_size=TILE, max_per_tile=MPT,
        max_tiles_per_gaussian=MTPG, impl="pallas")
    return jnp.mean(out.rgb ** 2)


def fwd_bwd(m):
    return jax.grad(lambda mm: fwd_only(mm) )(m).sum()[None]


def proj_all(m):
    p = proj_fn(m)
    return (jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.depths)
            + jnp.sum(p.compensations) + jnp.sum(p.pix_vels) + jnp.sum(p.extents))


def proj_vjp(m):
    return jax.grad(proj_all)(m).sum()[None]


def packed_vjp(m):
    return jax.grad(upto_packed)(m).sum()[None]


timeit("proj fwd", lambda m: jnp.sum(proj_fn(m).means2d), means)
timeit("proj fwd+vjp", proj_vjp, means)
timeit("+ tile lists", upto_lists, means)
timeit("+ gather+pack", upto_packed, means)
timeit("+ gather+pack fwd+vjp", packed_vjp, means)
timeit("full fused fwd", fwd_only, means)
timeit("full fused fwd+bwd", fwd_bwd, means)
