"""Benchmark: tile-rasterizer forward+backward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mrays/s/chip for the full differentiable rasterize pipeline
(projection -> tile binning/sort -> Pallas compositing fwd -> analytic bwd ->
parameter scatter), rays = output pixels, at 1024x1024 with 100k Gaussians and
rolling shutter enabled — the hot loop of SURVEY.md §3.1 (the reference calls
this `blur_samples` x 20k times per training run).

Timing methodology: the remote-tunnel dispatch latency on this box dwarfs
kernel time, so the step is iterated inside ONE jitted lax.scan (each
iteration's input depends on the previous output — no CSE) and wall time is
divided by the iteration count.

vs_baseline: ratio against an RTX-class gsplat fwd+bwd estimate of 200 Mrays/s
(gsplat 0.1.11 on RTX 3090 renders ~2 Mpix in ~10 ms fwd+bwd at this scene
scale; the reference repo itself pins no numbers — BASELINE.md).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

BASELINE_MRAYS = 200.0

N_GAUSS = 100_000
RES = 1024
TILE = 32
MAX_PER_TILE = 512
ITERS = 8


def make_scene(n, img_w, img_h, seed=0):
    rng = np.random.default_rng(seed)
    fx = fy = img_w * 0.9
    means = rng.normal(size=(n, 3)) * np.array([0.7, 0.6, 1.2]) + np.array([0, 0, 4.0])
    scales = np.exp(rng.normal(size=(n, 3)) * 0.6) * 0.010
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    return (
        jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32), jnp.asarray(colors), jnp.asarray(opac),
    )


def main():
    means, scales, quats, colors, opac = make_scene(N_GAUSS, RES, RES)
    fx = RES * 0.9
    lin_vel = jnp.array([0.4, -0.2, 0.1])
    ang_vel = jnp.array([0.05, 0.1, -0.02])

    def step(means):
        def loss_fn(means, colors, opac):
            proj = projection.project_gaussians(
                means, scales, quats, jnp.eye(3), jnp.zeros(3),
                fx, fx, RES / 2, RES / 2, RES, RES,
                lin_vel=lin_vel, ang_vel=ang_vel,
            )
            out = rasterize.rasterize(
                proj, colors, opac, RES, RES, jnp.zeros(3),
                rolling_shutter_time=0.03, tile_size=TILE,
                max_per_tile=MAX_PER_TILE, max_tiles_per_gaussian=8,
                impl="pallas",
            )
            return jnp.mean(out.rgb ** 2) + jnp.mean(out.alpha)

        loss, grads = jax.value_and_grad(loss_fn)(means, colors, opac)
        return loss, grads

    @jax.jit
    def bench(means):
        def body(carry, _):
            m = carry
            loss, g = step(m)
            # feed gradients back so iterations are data-dependent (no CSE)
            return m + 1e-12 * g, loss

        final, losses = jax.lax.scan(body, means, None, length=ITERS)
        return final, losses

    # compile
    t0 = time.time()
    jax.block_until_ready(bench(means))
    compile_s = time.time() - t0
    # timed
    t0 = time.time()
    jax.block_until_ready(bench(means))
    dt = (time.time() - t0) / ITERS

    rays = RES * RES
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_throughput",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                "detail": {
                    "n_gaussians": N_GAUSS,
                    "resolution": RES,
                    "tile_size": TILE,
                    "max_per_tile": MAX_PER_TILE,
                    "step_ms": round(dt * 1e3, 3),
                    "compile_s": round(compile_s, 1),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
