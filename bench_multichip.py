#!/usr/bin/env python
"""Multi-chip benchmark: the SHARDED training hot loop on a jax.sharding.Mesh.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "detail"}.

What it measures: `parallel.sharding.make_sharded_train_scan` — the full
sharded train step (fused-exposure rasterize fwd+bwd through shard_map,
gradient psum/reduce-scatter, Adam update, densification-stat accumulation)
iterated inside one lax.scan dispatch, on the mesh given by --mesh. This is
the same hot loop the sharded Trainer runs (engine/trainer.py mesh path),
i.e. the multi-chip version of bench.py's single-chip loop (SURVEY.md §3.1:
the reference's hot loop is train.py:22 x 20k steps).

Scaling efficiency: unless --no-compare, the SAME workload also runs on a
1-device mesh of the same platform and the line reports
    efficiency = t_1 / (n_devices * t_N)
(BASELINE.md target: >= 0.8 at 2 hosts).

This box has ONE real TPU chip behind the axon tunnel, so multi-device
invocations here fall back to a virtual CPU mesh (--devices N, same
mechanics the driver's dryrun_multichip validates) — the printed CPU numbers
exercise the path but are NOT TPU performance. The day real multi-chip TPU
hardware is attached, the documented invocation (BASELINE.md) produces the
real scaling number with no code changes:

    python bench_multichip.py --mesh blur=1,tile=2[,gauss=2] \
        --img 1024 --n-gauss 100000 --iters 8
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_MRAYS = 200.0  # same RTX-class per-invocation estimate as bench.py


def parse_mesh(spec: str) -> dict:
    axes = {"blur": 1, "tile": 1, "gauss": 1, "data": 1}
    for part in filter(None, spec.split(",")):
        k, v = part.split("=")
        if k not in axes:
            raise SystemExit(f"unknown mesh axis {k!r} (want blur/tile/gauss/data)")
        axes[k] = int(v)
    return axes


def ensure_devices(n: int):
    import jax

    if jax.device_count() < n:
        # virtual CPU fallback (same mechanics as __graft_entry__.dryrun_multichip)
        import jax.extend as jex

        jex.backend.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
        assert jax.device_count() >= n, (
            f"need {n} devices, have {jax.device_count()}"
        )


def build_workload(img: int, n_gauss: int, blur_samples: int, tile_size: int,
                   max_per_tile: int, data_batch: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from splat_tpu.cameras import optimizers as cam_opt
    from splat_tpu.cameras.cameras import Cameras
    from splat_tpu.models import splatfacto as sf

    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(n_gauss, 3)) * np.array([0.7, 0.6, 1.2])
           + np.array([0, 0, 4.0])).astype(np.float32)
    rgb = rng.integers(0, 255, size=(n_gauss, 3)).astype(np.uint8)
    cfg = sf.SplatfactoConfig(
        blur_samples=blur_samples, sh_degree=1, tile_size=tile_size,
        max_per_tile=max_per_tile, max_tiles_per_gaussian=16,
        chunk=32, background_color="black", gamma=2.2,
        camera_optimizer=cam_opt.CameraOptConfig(mode="SO3xR3"),
        camera_velocity_optimizer=cam_opt.VelocityOptConfig(enabled=True),
    )
    params = sf.init_model(pts, rgb, 2, 1, cfg, capacity=n_gauss)
    d = data_batch
    R = jnp.tile(jnp.eye(3)[None], (d, 1, 1))
    p = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (d, 1))
    f = jnp.full((d,), img * 0.9)
    c = jnp.full((d,), img / 2.0)
    cam = Cameras(
        R, p, f, f, c, c, img, img,
        lin_vel=jnp.tile(jnp.array([[0.4, -0.2, 0.1]]), (d, 1)),
        ang_vel=jnp.tile(jnp.array([[0.05, 0.1, -0.02]]), (d, 1)),
        exposure_time=jnp.full((d,), 0.06),
        rolling_shutter_time=jnp.full((d,), 0.03),
        cam_idx=jnp.zeros((d,), jnp.int32),
    )
    gt = jnp.asarray(rng.uniform(size=(d, img, img, 3)), jnp.float32)
    return params, cfg, cam, gt


def run_mesh(axes: dict, img: int, n_gauss: int, blur_samples: int,
             tile_size: int, max_per_tile: int, iters: int):
    """Returns (step_seconds, mesh_shape_dict)."""
    import jax
    import jax.numpy as jnp

    from splat_tpu.engine import trainer as tr
    from splat_tpu.models import strategy as strat_mod
    from splat_tpu.parallel import sharding

    d = axes["data"]
    params, cfg, cam, gt = build_workload(
        img, n_gauss, blur_samples, tile_size, max_per_tile, d
    )
    # resolve_mesh always carries a 'data' axis (size >= 1) — the trainer's
    # own mesh construction, so the camera/gt batching below matches it.
    mesh = sharding.resolve_mesh(
        sharding.MeshConfig(enabled=True, data=axes["data"],
                            gauss=axes["gauss"], blur=axes["blur"],
                            tile=axes["tile"]),
        cfg, img_h=img,
    )
    optimizer = tr.build_optimizer(params, tr.TrainerConfig())
    opt_state = optimizer.init(params)
    strat = strat_mod.init_strategy_state(params.gaussians.alive.shape[0], 0)
    params, opt_state, strat = sharding.place_train_state(
        mesh, params, opt_state, strat
    )
    scan = sharding.make_sharded_train_scan(cfg, mesh, optimizer, donate=False)

    # batch via Cameras indexing (the trainer's own batching: leaves (B, d, ...))
    cams_b = cam[np.zeros((iters, d), np.intp)]
    gts_b = jnp.broadcast_to(gt, (iters,) + gt.shape)
    steps_b = jnp.arange(iters)
    keys_b = jax.random.split(jax.random.PRNGKey(0), iters)

    args = (params, opt_state, strat, cams_b, gts_b, steps_b, keys_b)
    t0 = time.time()
    out = scan(*args)
    jax.block_until_ready(out[3])
    compile_s = time.time() - t0
    t0 = time.time()
    out = scan(*args)
    jax.block_until_ready(out[3])
    dt = (time.time() - t0) / iters
    losses = np.asarray(out[3])
    assert np.isfinite(losses).all(), f"non-finite losses {losses}"
    return dt, compile_s, dict(mesh.shape)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mesh", default="blur=1,tile=2",
                    help="axis sizes, e.g. blur=1,tile=2,gauss=2[,data=2]")
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--n-gauss", type=int, default=4096)
    ap.add_argument("--blur-samples", type=int, default=5)
    ap.add_argument("--tile-size", type=int, default=16)
    ap.add_argument("--max-per-tile", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--devices", type=int, default=0,
                    help="force an N-device (virtual CPU if needed) mesh")
    ap.add_argument("--no-compare", action="store_true",
                    help="skip the 1-device reference run (no efficiency)")
    args = ap.parse_args(argv)

    axes = parse_mesh(args.mesh)
    n_devices = int(np.prod(list(axes.values())))
    ensure_devices(max(n_devices, args.devices))
    import jax

    from splat_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    assert args.img % (args.tile_size * max(axes["tile"], 1)) == 0, (
        "img must be a multiple of tile_size * tile-axis (tile strips are "
        "row-aligned)")
    assert args.n_gauss % max(axes["gauss"], 1) == 0

    dt_n, compile_n, mesh_shape = run_mesh(
        axes, args.img, args.n_gauss, args.blur_samples, args.tile_size,
        args.max_per_tile, args.iters
    )
    eff = None
    dt_1 = None
    if n_devices > 1 and not args.no_compare:
        dt_1, _, _ = run_mesh(
            {"blur": 1, "tile": 1, "gauss": 1, "data": 1}, args.img,
            args.n_gauss, args.blur_samples, args.tile_size,
            args.max_per_tile, args.iters
        )
        eff = dt_1 / (n_devices * dt_n)

    rays = args.img * args.img * args.blur_samples * axes["data"]
    mrays = rays / dt_n / 1e6
    print(json.dumps({
        "metric": "sharded_train_step_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "detail": {
            "mesh": mesh_shape,
            "n_devices": n_devices,
            "step_ms": round(dt_n * 1e3, 3),
            "single_device_step_ms": (None if dt_1 is None
                                      else round(dt_1 * 1e3, 3)),
            "scaling_efficiency": None if eff is None else round(eff, 3),
            "img": args.img, "n_gaussians": args.n_gauss,
            "blur_samples": args.blur_samples,
            "compile_s": round(compile_n, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
