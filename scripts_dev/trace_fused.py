"""Capture a device trace of the fused fwd+bwd hot loop (bench shape)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize
from splat_tpu.utils.env import enable_compilation_cache
from splat_tpu.utils.profiling import jax_trace

enable_compilation_cache()

import os
_t = os.environ.get("TILE", "16")
TILE = tuple(int(x) for x in _t.split("x")) if "x" in _t else int(_t)
MPT = int(os.environ.get("MPT", 256))
MTPG = int(os.environ.get("MTPG", 8))
N, RES, S = 100_000, 1024, int(os.environ.get("S", 5))
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


def loss_fn(m):
    proj = projection.project_gaussians(
        m, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2,
        RES, RES, lin_vel=lv, ang_vel=av)
    out = rasterize.rasterize_fused(
        proj, colors, opac, RES, RES, jnp.zeros(3), eps=eps,
        rolling_shutter_time=0.03, tile_size=TILE, max_per_tile=MPT,
        max_tiles_per_gaussian=MTPG, impl="pallas", reduce="mean")
    return jnp.mean(out.rgb ** 2) + jnp.mean(out.alpha)


@jax.jit
def step(m):
    def body(c, _):
        g = jax.grad(loss_fn)(c)
        return c + 0.0 * g, 0.0
    return jax.lax.scan(body, m, None, length=ITERS)[0]


jax.block_until_ready(step(means))
out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_fused"
with jax_trace(out_dir):
    t0 = time.time()
    jax.block_until_ready(step(means))
    dt = (time.time() - t0) / ITERS
print(f"step: {dt*1e3:.2f} ms -> trace in {out_dir}")
