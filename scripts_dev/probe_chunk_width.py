"""Probe: rasterize chunk width 128 vs 256.

Hypothesis: doubling the chunk halves the while_loop trip count and doubles
the matmul tile width (128 -> 256 lanes), amortizing per-iteration overhead
(bounds math, T-reduction, predication) over more work. Risk: VMEM pressure
from the wider (npix, chunk) intermediates, and wasted work on tiles whose
count is far below the chunk multiple.

Usage: python scripts_dev/probe_chunk_width.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, tiling
from splat_tpu.ops.pallas import pack_param_table
from splat_tpu.ops.pallas.rasterize_kernels import (
    rasterize_bwd_packed, rasterize_fwd_packed,
)
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()


def main():
    N, RES, TILE, MPT, MTPG, S = 100_000, 1024, 16, 256, 8, 5
    ITERS = 16
    rng = np.random.default_rng(0)
    means = jnp.asarray(
        rng.normal(size=(N, 3)) * np.array([0.7, 0.6, 1.2]) + np.array([0, 0, 4.0]),
        jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)) * 0.6) * 0.010, jnp.float32)
    q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    quats = jnp.asarray(q, jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(N,)), jnp.float32)
    fx = RES * 0.9
    lv = jnp.array([0.4, -0.2, 0.1]); av = jnp.array([0.05, 0.1, -0.02])
    eps = jnp.linspace(-0.5, 0.5, S) * 0.06
    tw, th = tiling.num_tiles(RES, RES, TILE)

    proj = projection.project_gaussians(
        means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES / 2, RES / 2,
        RES, RES, lin_vel=lv, ang_vel=av)
    rs = jnp.float32(0.03)
    pad = jnp.max(jnp.abs(proj.pix_vels), axis=-1) * (0.03 + 0.5 * 0.03)
    lists = tiling.build_tile_lists(proj.means2d, proj.extents, proj.depths,
                                    proj.valid, RES, RES, TILE, MPT, MTPG,
                                    radius_pad=pad)
    table = pack_param_table(proj, colors, opac)
    idx = jnp.where(lists.indices >= 0, lists.indices, N)
    packed = jnp.transpose(jnp.take(table, idx, axis=0), (0, 2, 1))
    packed = jax.block_until_ready(packed)
    counts = lists.counts

    out = rasterize_fwd_packed(packed, counts, rs, TILE, tw, RES, eps=eps)
    g = jnp.asarray(np.random.default_rng(1).normal(size=out.shape), jnp.float32) * 0.1
    out, g = jax.block_until_ready((out, g))
    ref_out = np.asarray(out)
    ref_grad = np.asarray(rasterize_bwd_packed(
        packed, counts, rs, out, g, TILE, tw, RES, eps=eps))

    def timeit(name, fn, *args):
        @jax.jit
        def loop(p, *rest):
            def body(c, _):
                d = fn(c, *rest)
                leaf = jax.tree_util.tree_leaves(d)[0]
                return c + 0.0 * jnp.mean(leaf), 0.0
            return jax.lax.scan(body, p, None, length=ITERS)[0]
        jax.block_until_ready(loop(packed, *args))
        t0 = time.time()
        jax.block_until_ready(loop(packed, *args))
        dt = (time.time() - t0) / ITERS * 1e3
        print(f"{name:44s} {dt:8.3f} ms", flush=True)

    for cw in (128, 256):
        got = rasterize_fwd_packed(packed, counts, rs, TILE, tw, RES, eps=eps,
                                   chunk_width=cw)
        err = float(np.max(np.abs(np.asarray(got) - ref_out)))
        timeit(f"fwd chunk={cw} (abserr {err:.2e})",
               lambda p, cw=cw: rasterize_fwd_packed(
                   p, counts, rs, TILE, tw, RES, eps=eps, chunk_width=cw))
    for cw in (128, 256):
        got = rasterize_bwd_packed(packed, counts, rs, out, g, TILE, tw, RES,
                                   eps=eps, chunk_width=cw)
        rel = float(np.max(np.abs(np.asarray(got) - ref_grad))
                    / (np.max(np.abs(ref_grad)) + 1e-30))
        timeit(f"bwd chunk={cw} (relerr {rel:.2e})",
               lambda p, cw=cw: rasterize_bwd_packed(
                   p, counts, rs, out, g, TILE, tw, RES, eps=eps, chunk_width=cw))


if __name__ == "__main__":
    main()
