"""Probe: backward moment-matmul precision (HIGHEST vs HIGH vs DEFAULT).

The backward epilogue's three pixel-basis moment matmuls run at
Precision.HIGHEST (6-pass f32 MXU emulation). Block-pass accounting says they
cost ~36 MXU block passes per chunk vs ~40 for ALL five per-sample matmuls
combined — if the kernel is MXU-issue-bound, dropping to HIGH (3-pass, ~f32
fidelity) or DEFAULT (bf16) should cut several ms. Measures time + relerr of
d_params vs the HIGHEST reference on the bench scene.

Usage: SPLAT_TPU_MOM_PRECISION=... is read at import; this probe instead
monkeypatches the module-level knob between compiles.
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
from splat_tpu.ops.pallas import rasterize_kernels as rk
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

N, RES, TILE, MPT, MTPG, S = 100_000, 1024, 16, 256, 8, 5
ITERS = 16
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
tw, th = tiling.num_tiles(RES, RES, TILE)

proj = projection.project_gaussians(
    means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES/2, RES/2,
    RES, RES, lin_vel=lv, ang_vel=av)
rs = jnp.float32(0.03)
pad = jnp.max(jnp.abs(proj.pix_vels), axis=-1) * (0.03 + 0.5 * 0.03)
lists = tiling.build_tile_lists(proj.means2d, proj.extents, proj.depths,
                                proj.valid, RES, RES, TILE, MPT, MTPG,
                                radius_pad=pad,
                                conics=proj.conics,
                                opacities=opac * proj.compensations)
counts = np.asarray(lists.counts)
chunks = np.ceil(counts / 128).clip(min=0)
print(f"entries L={counts.sum()}  tiles={counts.size}  mean count={counts.mean():.1f}  "
      f"p50={np.percentile(counts,50):.0f} p90={np.percentile(counts,90):.0f} "
      f"max={counts.max()}  total chunks={int(chunks.sum())}  TK={counts.size*MPT}",
      flush=True)

table = pack_param_table(proj, colors, opac)
idx = jnp.where(lists.indices >= 0, lists.indices, N)
packed = jnp.transpose(jnp.take(table, idx, axis=0), (0, 2, 1))
packed = jax.block_until_ready(packed)
cnts = lists.counts

out = rk.rasterize_fwd_packed(packed, cnts, rs, TILE, tw, RES, eps=eps)
g = jnp.asarray(np.random.default_rng(1).normal(size=out.shape), jnp.float32) * 0.1
out, g = jax.block_until_ready((out, g))


def run(prec_name):
    rk._MOM_PRECISION = getattr(jax.lax.Precision, prec_name)
    fn = rk.rasterize_bwd_packed.__wrapped__  # bypass jit cache keyed on old knob
    jitted = jax.jit(fn, static_argnames=("tile_size", "tiles_x", "img_h", "chunk_width"))

    def call(p, o, gg):
        return jitted(p, cnts, rs, o, gg, TILE, tw, RES, eps=eps)

    val = jax.block_until_ready(call(packed, out, g))

    @jax.jit
    def loop(p, o, gg):
        def body(c, _):
            d = call(c, o, gg)
            return c + 0.0 * d, 0.0
        return jax.lax.scan(body, p, None, length=ITERS)[0]

    jax.block_until_ready(loop(packed, out, g))
    t0 = time.time()
    jax.block_until_ready(loop(packed, out, g))
    dt = (time.time() - t0) / ITERS * 1e3
    return val, dt


# restore the module knob afterwards so an in-process import of this probe
# leaves rk in its import-time state (last probed value would otherwise stick)
_orig_mom_precision = rk._MOM_PRECISION
try:
    ref, dt_ref = run("HIGHEST")
    print(f"HIGHEST  {dt_ref:8.3f} ms  (reference)", flush=True)
    scale = jnp.max(jnp.abs(ref), axis=(0, 2), keepdims=True) + 1e-30
    for prec in ("HIGH", "DEFAULT"):
        val, dt = run(prec)
        relerr = float(jnp.max(jnp.abs(val - ref) / scale))
        print(f"{prec:8s} {dt:8.3f} ms  max row-relerr {relerr:.2e}", flush=True)
finally:
    rk._MOM_PRECISION = _orig_mom_precision
