"""Fine-grained backward-path timing: pallas bwd kernel, gather VJP (scatter),
projection VJP — each isolated, in-graph iterated."""
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

N, RES, TILE, MPT, MTPG = 100_000, 1024, 16, 256, 16
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
tw, th = tiling.num_tiles(RES, RES, TILE)


def proj_fn(means):
    return projection.project_gaussians(
        means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2, RES, RES,
        lin_vel=lv, ang_vel=av)


# Precompute static inputs for isolated stages.
p0 = jax.jit(proj_fn)(means)
lists0 = tiling.build_tile_lists(p0.means2d, p0.extents, p0.depths, p0.valid, RES, RES, TILE, MPT, MTPG)
table0 = pack_param_table(p0, colors, opac)
idx0 = jnp.where(lists0.indices >= 0, lists0.indices, N)
pad_k = (-idx0.shape[1]) % CHUNK
if pad_k:
    idx0 = jnp.pad(idx0, ((0, 0), (0, pad_k)), constant_values=N)
packed0 = jnp.transpose(jnp.take(table0, idx0, axis=0), (0, 2, 1))
fwd_out0 = rasterize_fwd_packed(packed0, lists0.counts, jnp.float32(0.03), TILE, tw, RES)
g_out0 = jnp.ones_like(fwd_out0)
jax.block_until_ready((packed0, fwd_out0))


def timeit(name, fn, x):
    @jax.jit
    def loop(x):
        def body(c, _):
            r = fn(c)
            # data dependence to defeat CSE: fold a tiny function of r back in
            return c + 0.0 * jnp.mean(r) , jnp.mean(r)
        return jax.lax.scan(body, x, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(x)); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(x)); dt = (time.time() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:8.2f} ms/iter  (compile {comp:.0f}s)")
    return dt


# 1. pallas bwd kernel alone
timeit("pallas bwd kernel", lambda pk: jnp.sum(
    rasterize_bwd_packed(pk, lists0.counts, jnp.float32(0.03), fwd_out0, g_out0, TILE, tw, RES)), packed0)

# 2. gather VJP alone: d_table from d_packed (the scatter-add)
def gather_pack(table):
    g = jnp.take(table, idx0, axis=0)
    return jnp.transpose(g, (0, 2, 1))

_, vjp_gather = jax.vjp(gather_pack, table0)
d_packed0 = jnp.ones_like(packed0)
timeit("gather VJP (scatter)", lambda dp: jnp.sum(vjp_gather(dp)[0]), d_packed0)

# 3. projection VJP alone
def proj_loss(m):
    p = proj_fn(m)
    return jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.pix_vels) + jnp.sum(p.compensations)
timeit("projection fwd+bwd", lambda m: jax.grad(proj_loss)(m).sum()[None], means)

# 4. pack_param_table VJP (stack etc.)
def packfn(c):
    return pack_param_table(p0, c, opac)
_, vjp_pack = jax.vjp(packfn, colors)
timeit("pack VJP", lambda dt_: jnp.sum(vjp_pack(dt_)[0]), jnp.ones_like(table0))

# 5. fwd kernel alone for reference
timeit("pallas fwd kernel", lambda pk: jnp.sum(
    rasterize_fwd_packed(pk, lists0.counts, jnp.float32(0.03), TILE, tw, RES)), packed0)
