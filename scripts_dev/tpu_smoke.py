"""TPU smoke test: run the Pallas rasterizer on the real chip, validate vs the
jnp path, and time forward / forward+backward at a realistic size.

Usage:  python scripts_dev/tpu_smoke.py [--small]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, rasterize


def make_scene(n, img_w, img_h, seed=0):
    rng = np.random.default_rng(seed)
    fx = fy = img_w * 0.9
    means = rng.normal(size=(n, 3)) * np.array([0.7, 0.6, 1.2]) + np.array([0, 0, 4.0])
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4) * (2.2 / np.sqrt(n) * 8)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    proj = projection.project_gaussians(
        jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32), jnp.eye(3), jnp.zeros(3),
        fx, fy, img_w / 2, img_h / 2, img_w, img_h,
        lin_vel=jnp.array([0.4, -0.2, 0.1]), ang_vel=jnp.array([0.05, 0.1, -0.02]),
    )
    return proj, jnp.asarray(colors), jnp.asarray(opac)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--res", type=int, default=0)
    ap.add_argument("--impls", type=str, default="pallas,jnp")
    args = ap.parse_args()
    impls = args.impls.split(",")
    n = args.n or (5000 if args.small else 100_000)
    res = args.res or (128 if args.small else 512)
    img_w = img_h = res
    print(f"backend={jax.default_backend()} n={n} res={res}")

    proj, colors, opac = make_scene(n, img_w, img_h)
    bg = jnp.zeros(3)
    kw = dict(tile_size=16, max_per_tile=512, max_tiles_per_gaussian=64,
              rolling_shutter_time=0.03)

    def run(impl):
        return rasterize.rasterize(proj, colors, opac, img_w, img_h, bg, impl=impl, **kw)

    outs = {}
    for impl in impls:
        t0 = time.time()
        outs[impl] = jax.block_until_ready(run(impl))
        print(f"{impl} fwd compile+run: {time.time()-t0:.1f}s", flush=True)
    if len(outs) == 2:
        err = float(jnp.abs(outs["pallas"].rgb - outs["jnp"].rgb).max())
        print(f"max |pallas-jnp| rgb: {err:.2e}", flush=True)

    # timing
    for impl in impls:
        ts = []
        for _ in range(10):
            t0 = time.time()
            jax.block_until_ready(run(impl))
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        rays = img_w * img_h
        print(f"{impl} fwd: {dt*1e3:.2f} ms  ({rays/dt/1e6:.1f} Mpix/s)", flush=True)

    # fwd+bwd
    def loss(impl, colors, opac, means2d):
        p = proj._replace(means2d=means2d)
        out = rasterize.rasterize(p, colors, opac, img_w, img_h, bg, impl=impl, **kw)
        return jnp.mean(out.rgb ** 2) + jnp.mean(out.alpha)

    gouts = {}
    for impl in impls:
        g = jax.jit(jax.grad(lambda c, o, m: loss(impl, c, o, m), argnums=(0, 1, 2)))
        t0 = time.time()
        gouts[impl] = jax.block_until_ready(g(colors, opac, proj.means2d))
        print(f"{impl} fwd+bwd compile+run: {time.time()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(10):
            t0 = time.time()
            jax.block_until_ready(g(colors, opac, proj.means2d))
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        print(f"{impl} fwd+bwd: {dt*1e3:.2f} ms  ({img_w*img_h/dt/1e6:.1f} Mpix/s)", flush=True)

    if len(gouts) == 2:
        for nm, a, b in zip(("colors", "opac", "means2d"), gouts["pallas"], gouts["jnp"]):
            print(f"grad {nm} max err: {float(jnp.abs(a-b).max()):.2e}")


if __name__ == "__main__":
    main()
