"""Stage-by-stage timing of the rasterize pipeline on TPU (in-graph loops)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize, tiling
from splat_tpu.ops.pallas import pack_param_table, rasterize_fwd_packed, CHUNK

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


def proj_fn(means):
    return projection.project_gaussians(
        means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2, RES, RES,
        lin_vel=lv, ang_vel=av)


def stage_proj(means):
    p = proj_fn(means)
    return jnp.sum(p.means2d) + jnp.sum(p.conics)


def stage_lists(means):
    p = proj_fn(means)
    lists = tiling.build_tile_lists(p.means2d, p.extents, p.depths, p.valid, RES, RES, TILE, MPT, MTPG)
    return jnp.sum(lists.indices) + jnp.sum(lists.counts)


def _pack(p, lists):
    table = pack_param_table(p, colors, opac)
    n = p.means2d.shape[0]
    idx = jnp.where(lists.indices >= 0, lists.indices, n)
    gathered = jnp.take(table, idx, axis=0)
    return jnp.transpose(gathered, (0, 2, 1))


def stage_gather(means):
    p = proj_fn(means)
    lists = tiling.build_tile_lists(p.means2d, p.extents, p.depths, p.valid, RES, RES, TILE, MPT, MTPG)
    return jnp.sum(_pack(p, lists))


def stage_fwd(means):
    p = proj_fn(means)
    lists = tiling.build_tile_lists(p.means2d, p.extents, p.depths, p.valid, RES, RES, TILE, MPT, MTPG)
    packed = _pack(p, lists)
    tw, _ = tiling.num_tiles(RES, RES, TILE)
    out = rasterize_fwd_packed(packed, lists.counts, jnp.float32(0.03), TILE, tw, RES)
    return jnp.sum(out)


def stage_full(means):
    p = proj_fn(means)
    out = rasterize.rasterize(p, colors, opac, RES, RES, jnp.zeros(3),
                              rolling_shutter_time=0.03, tile_size=TILE,
                              max_per_tile=MPT, max_tiles_per_gaussian=MTPG, impl="pallas")
    return jnp.mean(out.rgb**2) + jnp.mean(out.alpha)


def stage_full_grad(means):
    return jax.grad(stage_full)(means).sum()


def bench(fn, name):
    @jax.jit
    def loop(m):
        def body(carry, _):
            v = fn(carry)
            return carry + 1e-18 * v, v
        return jax.lax.scan(body, m, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(means)); c = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(means)); dt = (time.time() - t0) / ITERS
    print(f"{name:14s} {dt*1e3:8.2f} ms/iter   (compile {c:.0f}s)", flush=True)
    return dt


t_proj = bench(stage_proj, "projection")
t_lists = bench(stage_lists, "tile_lists")
t_gather = bench(stage_gather, "gather+pack")
t_fwd = bench(stage_fwd, "pallas fwd")
t_full = bench(stage_full, "full fwd")
t_grad = bench(stage_full_grad, "full fwd+bwd")
print(f"deltas: sort/bin={t_lists-t_proj:.3f}s gather={t_gather-t_lists:.3f}s kernel={t_fwd-t_gather:.3f}s bwd={t_grad-t_full:.3f}s")
