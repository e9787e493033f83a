"""Benchmark: differentiable rasterize throughput of the TRAINING hot loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mrays/s/chip for the full fused-exposure fwd+bwd pipeline —
projection (with pixel velocities) -> tile binning/sort -> per-tile parameter
gather -> Pallas compositing of S=5 motion-blur sub-frames (rolling shutter
on) -> analytic backward -> parameter scatter. This is the hot loop of
SURVEY.md §3.1: the reference rasterizes blur_samples sub-frames per step x
20k steps (200k full-frame rasterizations per run). rays = output pixels x
blur sub-frames, matching what the reference's CUDA rasterizer would launch
for the same step.

The fused-exposure design (ops/pallas) renders all S sub-frames from ONE
projection/binning via the method's own first-order screen-space velocity
warp, so the sort/gather/grad-scatter cost is amortized across the exposure —
the reference pays it per sub-frame.

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

import os

N_GAUSS = 100_000
RES = 1024
BLUR_SAMPLES = 5
TILE = 16
# Per-tile capacity. 256 is the training DEFAULT config; on this bench scene
# 23% of tiles exceed it (deepest entries truncated) and the trainer's
# adaptive policy would GROW the capacity (engine/trainer.py
# _maybe_adapt_tile_capacity) — set SPLAT_TPU_BENCH_MPT to the adapted value
# to bench the configuration training actually reaches (VERDICT r4 weak #2);
# both numbers are reported in BASELINE.md.
MAX_PER_TILE = int(os.environ.get("SPLAT_TPU_BENCH_MPT", "256"))
# Footprint cap aligned with the TRAINING default (splatfacto.py
# max_tiles_per_gaussian=16) so the headline number is traceable to a
# training configuration (VERDICT r3 weak #6); override for A/B.
MAX_TILES_PER_GAUSSIAN = int(os.environ.get("SPLAT_TPU_BENCH_MTG", "16"))
# fused (default): ONE projection/binning per frame, all S sub-frames
#   rendered by the screen-velocity warp — this design's hot loop.
# exact: re-project/re-bin/re-gather per sub-frame at its SE(3)-advanced
#   pose, like the reference's CUDA loop (reference train.py:22; SURVEY.md
#   §3.1) — measures the workload-level cost the fusion amortizes away.
MODE = os.environ.get("SPLAT_TPU_BENCH_MODE", "fused")
assert MODE in ("fused", "exact"), (
    f"SPLAT_TPU_BENCH_MODE={MODE!r}: expected 'fused' or 'exact' "
    "(a typo would silently benchmark the fused path under a wrong label)"
)
# Sorted-entry-stream capacity (ops.tiling max_total_entries): bounds the
# per-row-costed gathers to the sorted prefix instead of the N*MTG padded
# stream. "auto" (default) probes the landed entry count and picks the next
# power of two with >=25% headroom — the same adaptive policy the trainer
# uses, so the bench runs the training configuration. 0 = off.
# The bench asserts entry_overflow == 0 at the chosen cap before timing.
_mte_env = os.environ.get("SPLAT_TPU_BENCH_MTE", "auto")
MAX_TOTAL_ENTRIES = -1 if _mte_env == "auto" else int(_mte_env)
ITERS = 8


def make_scene(n, img_w, img_h, seed=0):
    rng = np.random.default_rng(seed)
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
    exposure = 0.06
    eps = jnp.linspace(-0.5, 0.5, BLUR_SAMPLES) * exposure

    global MAX_TOTAL_ENTRIES
    if MAX_TOTAL_ENTRIES:
        # capacity probe/sanity: the cap must not drop real entries
        from splat_tpu.ops import tiling as _tiling

        proj0 = projection.project_gaussians(
            means, scales, quats, jnp.eye(3), jnp.zeros(3),
            fx, fx, RES / 2, RES / 2, RES, RES,
            lin_vel=lin_vel, ang_vel=ang_vel,
        )
        op_eff0 = opac * proj0.compensations * proj0.valid.astype(jnp.float32)
        lists0 = _tiling.build_tile_lists(
            proj0.means2d, proj0.extents, proj0.depths, proj0.valid, RES, RES,
            TILE, MAX_PER_TILE, MAX_TILES_PER_GAUSSIAN,
            radius_pad=jnp.abs(proj0.pix_vels)
            * (jnp.max(jnp.abs(eps)) + 0.015),
            conics=proj0.conics, opacities=op_eff0,
            materialize_indices=False,
            max_total_entries=max(MAX_TOTAL_ENTRIES, 0),
        )
        if MAX_TOTAL_ENTRIES < 0:  # auto: landed entries + >=25% headroom
            landed = int(lists0.counts.sum())
            cap = 1 << 17
            while landed > 0.8 * cap:
                cap *= 2
            MAX_TOTAL_ENTRIES = min(cap, N_GAUSS * MAX_TILES_PER_GAUSSIAN)
            # Re-verify the picked cap against the actual stream: the clamp
            # to N*MTG can undercut the >=25%-headroom claim, and the probe
            # above ran uncapped (round-4 advisor finding).
            lists0 = _tiling.build_tile_lists(
                proj0.means2d, proj0.extents, proj0.depths, proj0.valid,
                RES, RES, TILE, MAX_PER_TILE, MAX_TILES_PER_GAUSSIAN,
                radius_pad=jnp.abs(proj0.pix_vels)
                * (jnp.max(jnp.abs(eps)) + 0.015),
                conics=proj0.conics, opacities=op_eff0,
                materialize_indices=False,
                max_total_entries=MAX_TOTAL_ENTRIES,
            )
        ovf = int(lists0.entry_overflow)
        assert ovf == 0, (
            f"MAX_TOTAL_ENTRIES={MAX_TOTAL_ENTRIES} drops {ovf} entries"
        )

    def loss_fn_fused(means, colors, opac):
        proj = projection.project_gaussians(
            means, scales, quats, jnp.eye(3), jnp.zeros(3),
            fx, fx, RES / 2, RES / 2, RES, RES,
            lin_vel=lin_vel, ang_vel=ang_vel,
        )
        out = rasterize.rasterize_fused(
            proj, colors, opac, RES, RES, jnp.zeros(3), eps=eps,
            rolling_shutter_time=0.03, tile_size=TILE,
            max_per_tile=MAX_PER_TILE,
            max_tiles_per_gaussian=MAX_TILES_PER_GAUSSIAN,
            impl="pallas",
            max_total_entries=MAX_TOTAL_ENTRIES,
            reduce="mean",  # linear-space blur average (Appendix B.4)
        )
        return jnp.mean(out.rgb ** 2) + jnp.mean(out.alpha)

    def loss_fn_exact(means, colors, opac):
        # the reference's per-sub-frame hot loop: S x (project + sort/bin +
        # gather + composite + grad-scatter), then the linear-space average
        from splat_tpu.ops import se3

        acc_rgb = jnp.zeros((RES, RES, 3))
        acc_alpha = jnp.zeros((RES, RES))
        for s in range(BLUR_SAMPLES):
            Rt, pt = se3.se3_advance_c2w(
                jnp.eye(3), jnp.zeros(3), lin_vel, ang_vel, eps[s]
            )
            R_cw = Rt.T
            t_cw = -R_cw @ pt
            proj = projection.project_gaussians(
                means, scales, quats, R_cw, t_cw,
                fx, fx, RES / 2, RES / 2, RES, RES,
                lin_vel=lin_vel, ang_vel=ang_vel,
            )
            out = rasterize.rasterize(
                proj, colors, opac, RES, RES, jnp.zeros(3),
                rolling_shutter_time=0.03, tile_size=TILE,
                max_per_tile=MAX_PER_TILE,
                max_tiles_per_gaussian=MAX_TILES_PER_GAUSSIAN,
                impl="pallas",
                max_total_entries=MAX_TOTAL_ENTRIES,
            )
            acc_rgb = acc_rgb + out.rgb / BLUR_SAMPLES
            acc_alpha = acc_alpha + out.alpha / BLUR_SAMPLES
        return jnp.mean(acc_rgb ** 2) + jnp.mean(acc_alpha)

    loss_fn = loss_fn_exact if MODE == "exact" else loss_fn_fused

    @jax.jit
    def bench(means):
        def body(m, _):
            # feed gradients back so iterations are data-dependent (no CSE)
            loss, g = jax.value_and_grad(loss_fn)(m, colors, opac)
            return m + 1e-12 * g, loss

        return jax.lax.scan(body, means, None, length=ITERS)

    # compile
    t0 = time.time()
    jax.block_until_ready(bench(means))
    compile_s = time.time() - t0
    # timed
    t0 = time.time()
    jax.block_until_ready(bench(means))
    dt = (time.time() - t0) / ITERS

    rays = RES * RES * BLUR_SAMPLES
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
                    "blur_samples": BLUR_SAMPLES,
                    "tile_size": TILE,
                    "max_per_tile": MAX_PER_TILE,
                    "max_tiles_per_gaussian": MAX_TILES_PER_GAUSSIAN,
                    "mode": MODE,
                    "step_ms": round(dt * 1e3, 3),
                    "compile_s": round(compile_s, 1),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
