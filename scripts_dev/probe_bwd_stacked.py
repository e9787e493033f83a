"""Probe: fully-stacked backward kernel (samples along sublanes).

Hypothesis: the per-sample unroll in `_bwd_one_tile` pays 5x the matmul issue
count (cumexc, v, prefix, g_cd per sample). Stacking the sublane axis to
(S*npix, chunk) collapses each group to ONE matmul per chunk, and the moment
epilogue absorbs the sample reduction by tiling the pixel basis. The earlier
stacked attempt spilled VMEM; this version keeps the stacked live set minimal
(alpha dies into s_log/w; masks folded) and is compared at tps in {1, 2, 4, 8}.

Usage: python scripts_dev/probe_bwd_stacked.py
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_tpu.ops import projection, tiling
from splat_tpu.ops.pallas import pack_param_table
from splat_tpu.ops.pallas import rasterize_kernels as rk
from splat_tpu.ops.pallas.rasterize_kernels import (
    CHUNK, NOUT, NPARAM, _LOG_MAX_ALPHA, _chunk_basis, _pixel_coords,
    _scalar_vec, _stacked_alpha, _tile_wh, rasterize_bwd_packed,
    rasterize_fwd_packed,
)
from splat_tpu.ops.reference import T_EPS
from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()


def _bwd_one_tile_stacked(
    counts_ref, scalars_ref, params_ref, fwd_out_ref, g_out_ref, d_params_ref,
    t, blk, *, tile_size, tiles_x, img_h, n_samples, chunk=CHUNK,
):
    count = counts_ref[t]
    rs_time = scalars_ref[0]
    row_offset = scalars_ref[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    sp = n_samples * npix
    tx = (t % tiles_x) * tw_px
    ty = (t // tiles_x) * th_px
    k_max = params_ref.shape[2]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, k_max // chunk)

    d_params_ref[blk] = jnp.zeros_like(d_params_ref[blk])

    px, py, t_pix = _pixel_coords(tile_size, tx, ty, img_h, rs_time, row_offset, 0.0)
    t_stack3 = jnp.stack([scalars_ref[2 + s] + t_pix for s in range(n_samples)])
    t_flat = t_stack3.reshape(sp, 1)

    # Stacked cotangents (4, S*npix) and per-pixel total contribution (S*npix, 1)
    dC4_stack = jnp.concatenate(
        [g_out_ref[blk, s][0:4] for s in range(n_samples)], axis=1)
    a_rows = []
    for s in range(n_samples):
        fwd = fwd_out_ref[blk, s]
        g = g_out_ref[blk, s]
        a_rows.append(
            (jnp.sum(fwd[0:4] * g[0:4], axis=0, keepdims=True) + fwd[4:5] * g[4:5]).T)
    A_total = jnp.concatenate(a_rows, axis=0)      # (S*npix, 1)

    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    Minc = (r <= c).astype(jnp.float32)

    # Tiled pixel basis (S*npix, 6): moment matmuls absorb the sample sum.
    phi6_1 = jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=1)
    phi6 = jnp.concatenate([phi6_1] * n_samples, axis=0)   # (S*npix, 6)

    def cond(carry):
        i, _, Ts = carry
        return (i < n_chunks) & (jnp.max(Ts) > T_EPS)

    def body(carry):
        i, prefix, Ts = carry                       # (S*npix, 1) each
        base = i * chunk
        sub, _, _, A, B, C, lo_hi = _chunk_basis(
            params_ref, blk, px, py, tx, ty, base, count, chunk)
        mx_l, my_l = sub[0:1] - tx, sub[1:2] - ty
        ca, cb, cc = sub[2:3], sub[3:4], sub[4:5]
        cols4 = jnp.concatenate([sub[5:8], sub[9:10]], axis=0)
        op = sub[8:9]
        pvx, pvy = sub[10:11], sub[11:12]
        inv_op = pl.reciprocal(jnp.maximum(op, 1e-12), approx=False)

        alpha, lo, mask = _stacked_alpha(A, B, C, lo_hi, t_stack3, chunk)
        t_exc = Ts * jnp.exp(rk._CUM_EXC(alpha))     # (S*npix, chunk)
        t_inc = t_exc * (1.0 - alpha)
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)

        v = jax.lax.dot_general(
            dC4_stack, cols4, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (S*npix, chunk)
        contrib = w * v
        prefix_inc = prefix + jax.lax.dot_general(
            contrib, Minc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        S_suf = A_total - prefix_inc

        live = active & mask & (lo < _LOG_MAX_ALPHA)
        ratio = alpha * pl.reciprocal(1.0 - alpha, approx=False)
        d_sigma = jnp.where(live, ratio * S_suf - contrib, 0.0)
        td = t_flat * d_sigma

        g_cd = jax.lax.dot_general(
            dC4_stack, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (4, chunk)

        def mom(Pk, nb):
            return jax.lax.dot_general(
                phi6[:, :nb], Pk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        M0 = mom(d_sigma, 6)
        M1 = mom(td, 3)
        M2 = mom(t_flat * td, 1)
        m2 = M2[0:1]
        X0 = M0[1:2] - mx_l * M0[0:1]
        Y0 = M0[2:3] - my_l * M0[0:1]
        X1 = M1[1:2] - mx_l * M1[0:1]
        Y1 = M1[2:3] - my_l * M1[0:1]
        XX0 = M0[3:4] - 2.0 * mx_l * M0[1:2] + mx_l * mx_l * M0[0:1]
        YY0 = M0[5:6] - 2.0 * my_l * M0[2:3] + my_l * my_l * M0[0:1]
        XY0 = M0[4:5] - mx_l * M0[2:3] - my_l * M0[1:2] + mx_l * my_l * M0[0:1]
        SU1 = X0 - pvx * M1[0:1]
        SU2 = Y0 - pvy * M1[0:1]
        SV1 = X1 - pvx * m2
        SV2 = Y1 - pvy * m2
        g_mx = -(ca * SU1 + cb * SU2)
        g_my = -(cc * SU2 + cb * SU1)
        g_pvx = -(ca * SV1 + cb * SV2)
        g_pvy = -(cc * SV2 + cb * SV1)
        g_ca = 0.5 * (XX0 - 2.0 * pvx * X1 + pvx * pvx * m2)
        g_cc = 0.5 * (YY0 - 2.0 * pvy * Y1 + pvy * pvy * m2)
        g_cb = XY0 - pvx * Y1 - pvy * X1 + pvx * pvy * m2
        g_op = -M0[0:1] * inv_op

        grads = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_cd[0:3], g_op, g_cd[3:4], g_pvx,
             g_pvy, jnp.zeros((NPARAM - 12, chunk), jnp.float32)],
            axis=0,
        )
        d_params_ref[blk, :, pl.ds(base, chunk)] += grads
        new_T = jnp.min(jnp.where(active, t_inc, Ts), axis=1, keepdims=True)
        return i + 1, prefix_inc[:, -1:], new_T

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((sp, 1), jnp.float32),
        jnp.ones((sp, 1), jnp.float32),
    )
    jax.lax.while_loop(cond, body, init)


def _bwd_kernel_stacked(counts_ref, scalars_ref, params_ref, fwd_out_ref,
                        g_out_ref, d_params_ref, *, tile_size, tiles_x, img_h,
                        n_samples, tiles_per_step, chunk=CHUNK):
    for blk in range(tiles_per_step):
        _bwd_one_tile_stacked(
            counts_ref, scalars_ref, params_ref, fwd_out_ref, g_out_ref,
            d_params_ref, pl.program_id(0) * tiles_per_step + blk, blk,
            tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
            n_samples=n_samples, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("tile_size", "tiles_x", "img_h", "tps"))
def bwd_stacked(params_packed, counts, rs_time, fwd_out, g_out, tile_size,
                tiles_x, img_h, eps, tps):
    n_tiles, _, k = params_packed.shape
    n_samples = fwd_out.shape[1]
    tw_px, th_px = _tile_wh(tile_size)
    npix = tw_px * th_px
    kernel = functools.partial(
        _bwd_kernel_stacked, tile_size=tile_size, tiles_x=tiles_x, img_h=img_h,
        n_samples=n_samples, tiles_per_step=tps, chunk=CHUNK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tps,),
        in_specs=[
            pl.BlockSpec((tps, NPARAM, k), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, n_samples, NOUT, npix), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tps, NPARAM, k), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, NPARAM, k), jnp.float32),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles * n_samples * k * npix * 60),
            bytes_accessed=int(2 * params_packed.size * 4 + 2 * n_tiles * n_samples * NOUT * npix * 4),
            transcendentals=int(n_tiles * n_samples * k * npix * 2),
        ),
    )(counts, _scalar_vec(rs_time, 0.0, eps), params_packed, fwd_out, g_out)


def main():
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
                                    radius_pad=pad)
    table = pack_param_table(proj, colors, opac)
    idx = jnp.where(lists.indices >= 0, lists.indices, N)
    packed = jnp.transpose(jnp.take(table, idx, axis=0), (0, 2, 1))
    packed = jax.block_until_ready(packed)
    counts = lists.counts
    n_tiles = packed.shape[0]

    out = rasterize_fwd_packed(packed, counts, rs, TILE, tw, RES, eps=eps)
    g = jnp.asarray(np.random.default_rng(1).normal(size=out.shape), jnp.float32) * 0.1
    out, g = jax.block_until_ready((out, g))

    ref = rasterize_bwd_packed(packed, counts, rs, out, g, TILE, tw, RES, eps=eps)
    ref = jax.block_until_ready(ref)

    def timeit(name, fn):
        @jax.jit
        def loop(p, out, g):
            def body(c, _):
                d = fn(c, out, g)
                return c + 0.0 * d, 0.0
            return jax.lax.scan(body, p, None, length=ITERS)[0]
        jax.block_until_ready(loop(packed, out, g))
        t0 = time.time()
        jax.block_until_ready(loop(packed, out, g))
        dt = (time.time() - t0) / ITERS * 1e3
        print(f"{name:40s} {dt:8.3f} ms", flush=True)
        return dt

    timeit("bwd current (per-sample)", lambda p, o, gg: rasterize_bwd_packed(
        p, counts, rs, o, gg, TILE, tw, RES, eps=eps))
    for tps in (8, 4, 2, 1):
        if n_tiles % tps:
            continue
        got = bwd_stacked(packed, counts, rs, out, g, TILE, tw, RES, eps, tps)
        err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
        timeit(f"bwd stacked tps={tps} (relerr {err:.2e})",
               lambda p, o, gg, tps=tps: bwd_stacked(
                   p, counts, rs, o, gg, TILE, tw, RES, eps, tps))


if __name__ == "__main__":
    main()
