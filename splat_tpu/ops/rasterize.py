"""Tile-based rasterization: the TPU hot path.

Equivalent of the reference's per-pixel alpha-compositing CUDA kernels
(SURVEY.md §2c #5/#6: gsplat `rasterize_forward` / `rasterize_backward_kernel`),
re-designed for TPU:

  * tiles play the role of the CUDA thread-block grid; per-tile Gaussian lists
    come from `ops.tiling` (sort + gather instead of atomics);
  * within a tile, compositing uses the chunked scan of `ops.reference` — the
    sequential depth loop is reformulated as cumulative products over chunks,
    turning per-pixel scalar loops into dense VPU work and an (npix x K) @ (K x 4)
    MXU matmul for the color/depth accumulation;
  * the backward pass is plain autodiff through the scan + the parameter gather
    (`jnp.take`) on the jnp path; the pallas path instead maps per-slot
    gradients back to gaussians by GATHER via the binning sort's slot<->entry
    bijection (ops/pallas) — either way no atomics, replacing CUDA's atomic
    adds (SURVEY.md §5: no race-prone constructs by design).

Two implementations share this orchestration: `impl="jnp"` (vmapped scan; runs
anywhere, is the shardable baseline) and `impl="pallas"` (hand-written kernels in
`ops.pallas`, fwd + custom VJP).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians
from .reference import ALPHA_THRESH, MAX_ALPHA, T_EPS, RenderOutput
from . import tiling


class TileGather(NamedTuple):
    """Per-tile dense Gaussian parameters (struct-of-arrays)."""

    means2d: jax.Array   # (T, K, 2)
    conics: jax.Array    # (T, K, 3)
    colors: jax.Array    # (T, K, 3)
    opacities: jax.Array  # (T, K) effective opacity (compensation folded in)
    depths: jax.Array    # (T, K)
    pix_vels: jax.Array  # (T, K, 2)
    counts: jax.Array    # (T,)


def gather_tile_params(
    lists: tiling.TileLists,
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
) -> TileGather:
    idx = jnp.maximum(lists.indices, 0)
    mask = lists.indices >= 0
    op_eff = opacities * proj.compensations * proj.valid.astype(colors.dtype)
    take = lambda a: jnp.take(a, idx, axis=0)
    return TileGather(
        means2d=take(proj.means2d),
        conics=take(proj.conics),
        colors=take(colors),
        opacities=jnp.where(mask, take(op_eff), 0.0),
        depths=take(proj.depths),
        pix_vels=take(proj.pix_vels),
        counts=lists.counts,
    )


def _composite_one_tile(
    g: TileGather,
    origin_x: jax.Array,
    origin_y: jax.Array,
    tile_size: int,
    img_h: int,
    rs_time: jax.Array,
    chunk: int,
    row_offset: jax.Array | int = 0,
    t_eps: jax.Array | float = 0.0,
):
    """Composite a single tile; g fields are (K, ...) for this tile.

    row_offset: global row of this image region's first row (nonzero when the
    image is row-strip sharded across devices — rolling shutter needs GLOBAL
    scanline times while means2d stay strip-local). img_h is the FULL height.

    Returns (rgb (th,tw,3), depth_acc (th,tw), T (th,tw)).
    """
    dtype = g.colors.dtype
    k_total = g.means2d.shape[0]
    assert k_total % chunk == 0
    sw, sh = tiling.tile_wh(tile_size)

    px = origin_x + (jnp.arange(sw, dtype=dtype) + 0.5)[None, :]  # (1,tw)
    py = origin_y + (jnp.arange(sh, dtype=dtype) + 0.5)[:, None]  # (th,1)
    # Per-pixel sampling time: blur sub-frame offset + global rolling-shutter
    # scanline time (SURVEY.md Appendix B.1).
    t_row = t_eps + rs_time * ((py + row_offset) / img_h - 0.5)  # (S,1)

    j = jnp.arange(k_total, dtype=jnp.int32)
    in_count = j < g.counts

    def chunk_step(carry, xs):
        rgb, depth_acc, T = carry
        m2d, con, col, op, dep, pv, valid = xs

        dx = px[None] - (m2d[:, 0, None, None] + pv[:, 0, None, None] * t_row[None])
        dy = py[None] - (m2d[:, 1, None, None] + pv[:, 1, None, None] * t_row[None])
        sigma = (
            0.5 * (con[:, 0, None, None] * dx * dx + con[:, 2, None, None] * dy * dy)
            + con[:, 1, None, None] * dx * dy
        )
        alpha = jnp.minimum(MAX_ALPHA, op[:, None, None] * jnp.exp(-sigma))
        alpha = jnp.where(
            (sigma >= 0) & (alpha >= ALPHA_THRESH) & valid[:, None, None], alpha, 0.0
        )  # (K,S,S)

        one_m = 1.0 - alpha
        t_inc = T[None] * jnp.cumprod(one_m, axis=0)
        t_exc = jnp.concatenate([T[None], t_inc[:-1]], axis=0)
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)

        rgb = rgb + jnp.einsum("kxy,kc->xyc", w, col)
        depth_acc = depth_acc + jnp.einsum("kxy,k->xy", w, dep)
        T = jnp.min(jnp.where(active, t_inc, T[None]), axis=0)
        return (rgb, depth_acc, T), None

    init = (
        jnp.zeros((sh, sw, 3), dtype=dtype),
        jnp.zeros((sh, sw), dtype=dtype),
        jnp.ones((sh, sw), dtype=dtype),
    )
    reshape = lambda a: a.reshape((k_total // chunk, chunk) + a.shape[1:])
    xs = (
        reshape(g.means2d), reshape(g.conics), reshape(g.colors),
        reshape(g.opacities), reshape(g.depths), reshape(g.pix_vels),
        reshape(in_count),
    )
    (rgb, depth_acc, T), _ = jax.lax.scan(chunk_step, init, xs)
    return rgb, depth_acc, T


def composite_tiles_jnp(
    g: TileGather,
    img_w: int,
    img_h: int,
    tile_size: int,
    rs_time: jax.Array,
    chunk: int = 32,
    rs_full_height: int | None = None,
    rs_row_offset: jax.Array | int = 0,
    t_eps: jax.Array | float = 0.0,
):
    """vmapped per-tile compositing. Returns per-tile (rgb, depth_acc, T)."""
    tw, th = tiling.num_tiles(img_w, img_h, tile_size)
    sw, sh = tiling.tile_wh(tile_size)
    tx = (jnp.arange(tw * th, dtype=jnp.int32) % tw).astype(g.colors.dtype) * sw
    ty = (jnp.arange(tw * th, dtype=jnp.int32) // tw).astype(g.colors.dtype) * sh
    return jax.vmap(
        functools.partial(
            _composite_one_tile,
            tile_size=tile_size,
            img_h=rs_full_height or img_h,
            rs_time=rs_time,
            chunk=chunk,
            row_offset=rs_row_offset,
            t_eps=t_eps,
        )
    )(g, tx, ty)


def assemble_image(tiles: jax.Array, img_w: int, img_h: int, tile_size) -> jax.Array:
    """(num_tiles, th, tw, C?) row-major tile grid -> (H, W, C?) image (cropped)."""
    tw, th = tiling.num_tiles(img_w, img_h, tile_size)
    sw, sh = tiling.tile_wh(tile_size)
    chan = tiles.shape[3:]
    img = tiles.reshape((th, tw, sh, sw) + chan)
    img = jnp.swapaxes(img, 1, 2).reshape((th * sh, tw * sw) + chan)
    return img[:img_h, :img_w]


@functools.partial(
    jax.jit,
    static_argnames=(
        "img_w", "img_h", "tile_size", "max_per_tile", "max_tiles_per_gaussian",
        "chunk", "impl", "rs_full_height", "max_total_entries",
    ),
)
def rasterize(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    img_w: int,
    img_h: int,
    background: jax.Array,
    rolling_shutter_time: jax.Array | float = 0.0,
    tile_size: int = 16,
    max_per_tile: int = 512,
    max_tiles_per_gaussian: int = 64,
    chunk: int = 32,
    impl: str = "jnp",
    rs_full_height: int | None = None,
    rs_row_offset: jax.Array | int = 0,
    max_total_entries: int = 0,
) -> RenderOutput:
    """Full tile rasterization of one (sub-)frame from projected Gaussians.

    rs_full_height / rs_row_offset: set when rendering a row strip of a larger
    image (spatial sharding): means2d are strip-local but rolling-shutter
    scanline times are computed against the FULL image height.
    """
    rs = jnp.asarray(rolling_shutter_time, dtype=colors.dtype)
    # Rolling-shutter screen motion: pad the binning radius by the max |shift|.
    # per-axis (N, 2) pad: the RS shift is directed along pix_vel
    radius_pad = jnp.abs(proj.pix_vels) * jnp.abs(rs) * 0.5

    op_eff = opacities * proj.compensations * proj.valid.astype(colors.dtype)
    lists = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid,
        img_w, img_h, tile_size, max_per_tile, max_tiles_per_gaussian,
        radius_pad=radius_pad, conics=proj.conics, opacities=op_eff,
        materialize_indices=(impl != "pallas"),
        row0_px=rs_row_offset, full_img_h=rs_full_height,
        max_total_entries=max_total_entries,
    )

    if impl == "jnp":
        g = gather_tile_params(lists, proj, colors, opacities)
        rgb_t, dep_t, T_t = composite_tiles_jnp(
            g, img_w, img_h, tile_size, rs, chunk,
            rs_full_height=rs_full_height, rs_row_offset=rs_row_offset,
        )
    elif impl == "pallas":
        from .pallas import rasterize_tiles_pallas

        rgb_t, dep_t, T_t = rasterize_tiles_pallas(
            lists, proj, colors, opacities, img_w, img_h, tile_size, rs,
            max_per_tile,
            rs_full_height=rs_full_height, rs_row_offset=rs_row_offset,
        )
        # Single-sample render: drop the kernel's (S=1) sample axis.
        rgb_t, dep_t, T_t = rgb_t[:, 0], dep_t[:, 0], T_t[:, 0]
    else:
        raise ValueError(f"unknown rasterize impl: {impl}")

    rgb = assemble_image(rgb_t, img_w, img_h, tile_size)
    depth_acc = assemble_image(dep_t, img_w, img_h, tile_size)
    T = assemble_image(T_t, img_w, img_h, tile_size)

    alpha = 1.0 - T
    rgb = rgb + T[..., None] * background
    depth = depth_acc / jnp.maximum(alpha, 1e-10)
    return RenderOutput(rgb=rgb, alpha=alpha, depth=depth, transmittance=T)


@functools.partial(
    jax.jit,
    static_argnames=(
        "img_w", "img_h", "tile_size", "max_per_tile", "max_tiles_per_gaussian",
        "chunk", "impl", "rs_full_height", "reduce", "mid_index",
        "max_total_entries",
    ),
)
def rasterize_fused(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    img_w: int,
    img_h: int,
    background: jax.Array,
    eps: jax.Array,                       # (S,) blur sub-frame times (seconds)
    rolling_shutter_time: jax.Array | float = 0.0,
    tile_size: int = 16,
    max_per_tile: int = 512,
    max_tiles_per_gaussian: int = 64,
    chunk: int = 32,
    impl: str = "jnp",
    rs_full_height: int | None = None,
    rs_row_offset: jax.Array | int = 0,
    reduce: str | None = None,
    mid_index: int | None = None,
    max_total_entries: int = 0,
) -> RenderOutput:
    """Fused-exposure rasterization: all S blur sub-frames from ONE binning.

    The reference re-projects and re-bins per blur sample (SURVEY.md §3.1, the
    200k-rasterizations hot loop); here the Gaussians are projected once at
    mid-exposure and each sub-frame is rendered by shifting means along the
    screen-space velocity, mu + pix_vel * (eps_s + t_rs*(py/H-1/2)) — the same
    first-order warp the method itself uses for rolling shutter (Appendix
    B.3), applied across the exposure. Sort/gather/scatter-grad run once per
    frame; only the compositing kernels scale with S.

    Returns a RenderOutput with a leading (S,) sample axis; the caller
    averages linear-space rgb over samples (Appendix B.4).

    reduce="mean": return the blur average directly — rgb/alpha/transmittance
    are means over S (NO leading sample axis) and depth is the mid-exposure
    sample's (index mid_index, default S//2). Training only ever consumes
    these, and reducing before the tile->image relayout lets the pallas path
    assemble ONE image instead of 3*S (the relayouts measured ~8 ms/step at
    S=5, 1024²).
    """
    rs = jnp.asarray(rolling_shutter_time, dtype=colors.dtype)
    # Binning pad: max |screen shift| over the exposure window + readout.
    t_max = jnp.max(jnp.abs(eps)) + 0.5 * jnp.abs(rs)
    radius_pad = jnp.abs(proj.pix_vels) * t_max  # per-axis motion box

    op_eff = opacities * proj.compensations * proj.valid.astype(colors.dtype)
    lists = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid,
        img_w, img_h, tile_size, max_per_tile, max_tiles_per_gaussian,
        radius_pad=radius_pad, conics=proj.conics, opacities=op_eff,
        materialize_indices=(impl != "pallas"),
        row0_px=rs_row_offset, full_img_h=rs_full_height,
        max_total_entries=max_total_entries,
    )

    if impl == "jnp":
        g = gather_tile_params(lists, proj, colors, opacities)
        rgb_t, dep_t, T_t = jax.vmap(
            lambda e: composite_tiles_jnp(
                g, img_w, img_h, tile_size, rs, chunk,
                rs_full_height=rs_full_height, rs_row_offset=rs_row_offset,
                t_eps=e,
            ),
            out_axes=1,
        )(eps)                                        # (T, S, s, s, ...)
    elif impl == "pallas":
        from .pallas import rasterize_tiles_pallas

        if reduce == "mean":
            rgb_t, T_t_m, dep_t_m = rasterize_tiles_pallas(
                lists, proj, colors, opacities, img_w, img_h, tile_size, rs,
                max_per_tile,
                rs_full_height=rs_full_height, rs_row_offset=rs_row_offset,
                eps=eps, reduce_mean=True, mid_index=mid_index,
                background=jnp.broadcast_to(
                    jnp.asarray(background, colors.dtype), (3,)),
            )
            # separate assemblies so XLA DCEs the ones the caller ignores
            # (the training loss only reads rgb)
            rgb = assemble_image(rgb_t, img_w, img_h, tile_size)
            T_mean = assemble_image(T_t_m, img_w, img_h, tile_size)
            depth = assemble_image(dep_t_m, img_w, img_h, tile_size)
            return RenderOutput(
                rgb=rgb, alpha=1.0 - T_mean, depth=depth, transmittance=T_mean
            )
        rgb_t, dep_t, T_t = rasterize_tiles_pallas(
            lists, proj, colors, opacities, img_w, img_h, tile_size, rs,
            max_per_tile,
            rs_full_height=rs_full_height, rs_row_offset=rs_row_offset,
            eps=eps,
        )
    else:
        raise ValueError(f"unknown rasterize impl: {impl}")

    assemble = jax.vmap(
        functools.partial(
            assemble_image, img_w=img_w, img_h=img_h, tile_size=tile_size
        )
    )
    rgb = assemble(jnp.moveaxis(rgb_t, 1, 0))          # (S, H, W, 3)
    depth_acc = assemble(jnp.moveaxis(dep_t, 1, 0))
    T = assemble(jnp.moveaxis(T_t, 1, 0))

    alpha = 1.0 - T
    rgb = rgb + T[..., None] * background
    depth = depth_acc / jnp.maximum(alpha, 1e-10)
    out_s = RenderOutput(rgb=rgb, alpha=alpha, depth=depth, transmittance=T)
    if reduce is None:
        return out_s
    if reduce != "mean":
        raise ValueError(f"unknown reduce: {reduce}")
    mid = eps.shape[0] // 2 if mid_index is None else mid_index
    return RenderOutput(
        rgb=out_s.rgb.mean(axis=0),
        alpha=out_s.alpha.mean(axis=0),
        depth=out_s.depth[mid],
        transmittance=out_s.transmittance.mean(axis=0),
    )
