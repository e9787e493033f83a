"""Perf experiments: tile size, capacities, backward sub-stages."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize, tiling

N, RES = 100_000, 1024
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


def bench(fn, name):
    @jax.jit
    def loop(m):
        def body(c, _):
            v = fn(c)
            return c + 1e-18 * v, v
        return jax.lax.scan(body, m, None, length=ITERS)
    t0 = time.time(); jax.block_until_ready(loop(means)); comp = time.time() - t0
    t0 = time.time(); jax.block_until_ready(loop(means)); dt = (time.time() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:8.2f} ms/iter (compile {comp:.0f}s)", flush=True)
    return dt


def full(tile, mpt, mtpg, impl="pallas"):
    def f(means):
        p = proj_fn(means)
        out = rasterize.rasterize(p, colors, opac, RES, RES, jnp.zeros(3),
                                  rolling_shutter_time=0.03, tile_size=tile,
                                  max_per_tile=mpt, max_tiles_per_gaussian=mtpg,
                                  impl=impl)
        return jnp.mean(out.rgb**2) + jnp.mean(out.alpha)
    return f


def grad_of(f):
    return lambda m: jax.grad(f)(m).sum()


# stats for tile 32
p = proj_fn(means)
for tile, mtpg in ((16, 16), (32, 8)):
    lists = tiling.build_tile_lists(p.means2d, p.extents, p.depths, p.valid, RES, RES, tile, 1024, mtpg)
    c = np.asarray(lists.counts)
    print(f"tile{tile}: counts mean {c.mean():.0f} max {c.max()} p99 {np.percentile(c,99):.0f} overflow {int(lists.overflow)}", flush=True)

bench(full(16, 256, 16), "fwd tile16 K256")
bench(grad_of(full(16, 256, 16)), "fwd+bwd tile16 K256")
bench(full(32, 512, 8), "fwd tile32 K512")
bench(grad_of(full(32, 512, 8)), "fwd+bwd tile32 K512")


# backward sub-stage: stop-grad at the packed params (isolates everything
# downstream of the kernel fwd from the kernel bwd + scatter)
def fwd_only_bwd(tile, mpt, mtpg):
    from splat_tpu.ops.pallas import pack_param_table, _composite_packed, CHUNK

    def f(means):
        pjt = proj_fn(means)
        lists = tiling.build_tile_lists(pjt.means2d, pjt.extents, pjt.depths, pjt.valid,
                                        RES, RES, tile, mpt, mtpg)
        table = pack_param_table(pjt, colors, opac)
        idx = jnp.where(lists.indices >= 0, lists.indices, N)
        packed = jnp.transpose(jnp.take(table, idx, axis=0), (0, 2, 1))
        packed = jax.lax.stop_gradient(packed)  # cut: no kernel bwd, no scatter
        tw, _ = tiling.num_tiles(RES, RES, tile)
        out = _composite_packed(packed, lists.counts, jnp.float32(0.03), jnp.float32(0.0), tile, tw, RES)
        return jnp.sum(out * out) * 1e-6 + jnp.sum(means * 1e-12)
    return lambda m: jax.grad(f)(m).sum()

bench(fwd_only_bwd(16, 256, 16), "bwd with packed stop-grad (no scatter)")
