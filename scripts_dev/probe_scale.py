"""Throughput scaling vs gaussian count and resolution (fused S=5 hot loop)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize, tiling
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

S = 5


def run(n, res, tile, mpt, mtpg, iters=6):
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(size=(n, 3)) * np.array([0.7, 0.6, 1.2]) + np.array([0, 0, 4.0]), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.6) * 0.010 * (100_000 / n) ** 0.5, jnp.float32)
    q = rng.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    quats = jnp.asarray(q, jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)), jnp.float32)
    fx = res * 0.9
    lv = jnp.array([0.4, -0.2, 0.1]); av = jnp.array([0.05, 0.1, -0.02])
    eps = jnp.linspace(-0.5, 0.5, S) * 0.06

    def proj_fn(m):
        return projection.project_gaussians(
            m, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, res / 2, res / 2,
            res, res, lin_vel=lv, ang_vel=av)

    # binning stats first
    p = proj_fn(means)
    pad = jnp.max(jnp.abs(p.pix_vels), axis=-1) * 0.045
    op_eff = opac * p.compensations * p.valid.astype(jnp.float32)
    lists = tiling.build_tile_lists(p.means2d, p.extents, p.depths, p.valid,
                                    res, res, tile, mpt, mtpg, radius_pad=pad,
                                    conics=p.conics, opacities=op_eff)
    cnt = np.asarray(lists.counts)
    print(f"  binning: counts mean={cnt.mean():.0f} p99={np.percentile(cnt,99):.0f} "
          f"max={cnt.max()} overflow={int(lists.overflow)} clipped={int(lists.clipped)}")

    def loss(m):
        p = proj_fn(m)
        out = rasterize.rasterize_fused(
            p, colors, opac, res, res, jnp.zeros(3), eps=eps,
            rolling_shutter_time=0.03, tile_size=tile, max_per_tile=mpt,
            max_tiles_per_gaussian=mtpg, impl="pallas")
        return jnp.mean(out.rgb.mean(axis=0) ** 2) + jnp.mean(out.alpha)

    @jax.jit
    def bench(m):
        def body(c, _):
            l, g = jax.value_and_grad(loss)(c)
            return c + 1e-12 * g, l
        return jax.lax.scan(body, m, None, length=iters)

    t0 = time.time(); r = bench(means); jax.block_until_ready(r); comp = time.time() - t0
    t0 = time.time(); r = bench(means); jax.block_until_ready(r); dt = (time.time() - t0) / iters
    mrays = res * res * S / dt / 1e6
    print(f"  {dt*1e3:7.1f} ms/step  {mrays:7.1f} Mrays/s  (compile {comp:.0f}s)")


for n, res, tile, mpt, mtpg in [
    (100_000, 1024, 16, 256, 8),
    (400_000, 1024, 16, 256, 8),
    (1_000_000, 1024, 16, 256, 8),
    (1_000_000, 1024, 16, 384, 8),
]:
    print(f"N={n} res={res} tile={tile} mpt={mpt} mtpg={mtpg}")
    run(n, res, tile, mpt, mtpg)
