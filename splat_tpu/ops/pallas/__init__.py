"""Pallas TPU kernel package + the custom-VJP wrapper used by ops.rasterize.

`rasterize_tiles_pallas` is the drop-in replacement for
`ops.rasterize.composite_tiles_jnp`: same inputs (TileGather), same outputs
(per-tile rgb / depth / transmittance), but the per-tile compositing runs in
the hand-written Pallas kernels of `rasterize_kernels` with an analytic
backward pass (SURVEY.md §2c #5/#6). The parameter gather stays outside the
custom_vjp so its cotangent is the deterministic segment-sum scatter handled
by XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tiling
from ..rasterize import TileGather
from .rasterize_kernels import (
    CHUNK,
    NPARAM,
    rasterize_bwd_packed,
    rasterize_fwd_packed,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite_packed(params_packed, counts, rs_time, tile_size, tiles_x, img_h):
    return rasterize_fwd_packed(
        params_packed, counts, rs_time, tile_size, tiles_x, img_h
    )


def _composite_fwd(params_packed, counts, rs_time, tile_size, tiles_x, img_h):
    out = rasterize_fwd_packed(
        params_packed, counts, rs_time, tile_size, tiles_x, img_h
    )
    return out, (params_packed, counts, rs_time, out)


def _composite_bwd(tile_size, tiles_x, img_h, res, g_out):
    params_packed, counts, rs_time, fwd_out = res
    d_params = rasterize_bwd_packed(
        params_packed, counts, rs_time, fwd_out, g_out, tile_size, tiles_x, img_h
    )
    d_counts = np.zeros(counts.shape, jax.dtypes.float0)  # int arg: float0 zero
    return d_params, d_counts, jnp.zeros_like(rs_time)


_composite_packed.defvjp(_composite_fwd, _composite_bwd)


def pack_tile_params(g: TileGather) -> jax.Array:
    """TileGather (struct-of-arrays) -> packed (T, 16, K) kernel layout."""
    rows = [
        g.means2d[..., 0], g.means2d[..., 1],
        g.conics[..., 0], g.conics[..., 1], g.conics[..., 2],
        g.colors[..., 0], g.colors[..., 1], g.colors[..., 2],
        g.opacities, g.depths,
        g.pix_vels[..., 0], g.pix_vels[..., 1],
    ]
    packed = jnp.stack(rows, axis=1)  # (T, 12, K)
    t, c, k = packed.shape
    pad_c = NPARAM - c
    pad_k = (-k) % CHUNK
    return jnp.pad(packed, ((0, 0), (0, pad_c), (0, pad_k)))


def rasterize_tiles_pallas(
    g: TileGather,
    img_w: int,
    img_h: int,
    tile_size: int,
    rs_time: jax.Array,
    chunk: int = CHUNK,  # kernel always uses CHUNK; arg kept for API parity
):
    del chunk
    tw, th = tiling.num_tiles(img_w, img_h, tile_size)
    packed = pack_tile_params(g)
    out = _composite_packed(
        packed, g.counts, jnp.asarray(rs_time, jnp.float32), tile_size, tw, img_h
    )  # (T, 8, npix)
    n_tiles = out.shape[0]
    s = tile_size
    rgb_t = jnp.transpose(out[:, 0:3, :], (0, 2, 1)).reshape(n_tiles, s, s, 3)
    dep_t = out[:, 3, :].reshape(n_tiles, s, s)
    T_t = out[:, 4, :].reshape(n_tiles, s, s)
    return rgb_t, dep_t, T_t
