"""Fused-exposure fwd+bwd throughput on TPU (training hot-loop shape)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import os
TILE = int(os.environ.get("TILE", 32))
MPT = int(os.environ.get("MPT", 512))
MTPG = int(os.environ.get("MTPG", 8))
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


def loss_fn(means, colors, opac):
    proj = projection.project_gaussians(
        means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2,
        RES, RES, lin_vel=lv, ang_vel=av)
    out = rasterize.rasterize_fused(
        proj, colors, opac, RES, RES, jnp.zeros(3), eps=eps,
        rolling_shutter_time=0.03, tile_size=TILE, max_per_tile=MPT,
        max_tiles_per_gaussian=MTPG, impl="pallas")
    rgb = out.rgb.mean(axis=0)
    return jnp.mean(rgb ** 2) + jnp.mean(out.alpha)


@jax.jit
def bench(means):
    def body(m, _):
        loss, g = jax.value_and_grad(loss_fn)(m, colors, opac)
        return m + 1e-12 * g, loss
    return jax.lax.scan(body, means, None, length=ITERS)


t0 = time.time(); jax.block_until_ready(bench(means)); comp = time.time() - t0
t0 = time.time(); jax.block_until_ready(bench(means)); dt = (time.time() - t0) / ITERS
rays = RES * RES * S
print(f"fused S={S}: {dt*1e3:.2f} ms/step  -> {rays/dt/1e6:.1f} Mrays/s  (compile {comp:.0f}s)")
