"""Pure-jnp reference renderer — the numerical oracle for the Pallas kernels.

Role: same as gsplat's `gsplat/_torch_impl.py` in the reference stack (SURVEY.md
§2c #10): a slow-but-simple renderer whose forward images AND gradients the fast
tile/Pallas paths must match (allclose). Also the CPU-runnable path for tiny
scenes.

Compositing model (SURVEY.md Appendix B.6, gsplat semantics):
    alpha_i = min(0.999, o_i * exp(-sigma_i)),  sigma = 0.5(a dx^2 + c dy^2) + b dx dy
    skip if alpha < 1/255; front-to-back: C = sum_i T_i alpha_i c_i, T_{i+1} = T_i(1-alpha_i)
    per-pixel early stop at T < 1e-4; background added with remaining T.

Rolling shutter (Appendix B.3): the Gaussian's 2D mean is advanced by its screen
velocity times the scanline's residual readout time before evaluating the conic:
    mu_eff(py) = mu + pix_vel * t_read * (py/H - 1/2).

Implementation note — chunked scan: instead of a per-Gaussian sequential loop we
process depth-sorted Gaussians in chunks of K. Within a chunk, the running
transmittances T_i are reconstructed with an exclusive cumulative product, and the
per-pixel early-stop rule "skip once T <= 1e-4" is applied by masking on those
reconstructed T_i. Because alphas only ever shrink T, masking on the *unfrozen*
cumulative product selects exactly the same set of contributing Gaussians as the
sequential skip rule, and the frozen post-chunk T equals the inclusive product at
the last active position — so this is bit-equivalent in exact arithmetic to the
CUDA-style sequential loop, while mapping onto dense VPU/MXU work.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians
from . import tiling as _tiling

ALPHA_THRESH = 1.0 / 255.0
MAX_ALPHA = 0.999
T_EPS = 1e-4


class RenderOutput(NamedTuple):
    rgb: jax.Array          # (H, W, 3) linear-space color
    alpha: jax.Array        # (H, W) accumulated opacity (1 - T_final)
    depth: jax.Array        # (H, W) alpha-weighted expected depth
    transmittance: jax.Array  # (H, W) final T


def _pad_to_multiple(x: jax.Array, k: int, axis: int = 0, value: float = 0.0) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % k
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def render_reference(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    img_w: int,
    img_h: int,
    background: jax.Array,
    rolling_shutter_time: jax.Array | float = 0.0,
    chunk: int = 64,
    tile_size: int | None = None,
    max_tiles_per_gaussian: int | None = None,
) -> RenderOutput:
    """Render N depth-sorted Gaussians over the full image (no tiling).

    colors: (N, 3) linear-space per-Gaussian color (SH already evaluated);
    opacities: (N,) post-sigmoid opacity (compensation applied here);
    background: (3,) composited with remaining transmittance.

    tile_size: if given, emulate the tile rasterizer's visibility rule exactly —
    a Gaussian only contributes to pixels whose tile lies inside its (clamped)
    footprint rect. Lets allclose tests against the tile/Pallas path be tight.
    """
    n = proj.means2d.shape[0]
    dtype = colors.dtype

    # Effective opacity: antialias compensation folded in; invalid => 0.
    op_eff = opacities * proj.compensations * proj.valid.astype(dtype)
    op_eff = jnp.where(proj.radii > 0, op_eff, 0.0)

    # Optional tile-visibility rects (emulating the tile rasterizer's binning).
    if tile_size is not None:
        span = None
        if max_tiles_per_gaussian is not None:
            sw_, sh_ = _tiling.tile_wh(tile_size)
            span_x = max(int((max_tiles_per_gaussian * sh_ / sw_) ** 0.5), 1)
            span_y = max(min(int(span_x * sw_ / sh_),
                             max_tiles_per_gaussian // span_x), 1)
            span = (span_x, span_y)
        rs_abs = jnp.abs(jnp.asarray(rolling_shutter_time, dtype=dtype))
        radius_pad = jnp.abs(proj.pix_vels) * rs_abs * 0.5  # per-axis box
        rects, _ = _tiling.gaussian_tile_rects(
            proj.means2d, proj.extents, proj.valid, img_w, img_h, tile_size,
            radius_pad=radius_pad, max_span=span,
        )
        rect_arr = jnp.stack([rects.x0, rects.y0, rects.x1, rects.y1], axis=-1)
    else:
        rect_arr = jnp.zeros((n, 4), dtype=jnp.int32)

    # Global front-to-back depth order (invalid pushed to the back).
    sort_depth = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(sort_depth)

    rect_s = _pad_to_multiple(rect_arr[order], chunk)
    means2d = _pad_to_multiple(proj.means2d[order], chunk)
    conics = _pad_to_multiple(proj.conics[order], chunk)
    cols = _pad_to_multiple(colors[order], chunk)
    ops = _pad_to_multiple(op_eff[order], chunk)
    depths = _pad_to_multiple(proj.depths[order], chunk)
    pvels = _pad_to_multiple(proj.pix_vels[order], chunk)
    n_pad = means2d.shape[0]

    # Pixel-center grid and per-row residual rolling-shutter time.
    px = (jnp.arange(img_w, dtype=dtype) + 0.5)[None, :]  # (1, W)
    py = (jnp.arange(img_h, dtype=dtype) + 0.5)[:, None]  # (H, 1)
    t_row = rolling_shutter_time * (py / img_h - 0.5)      # (H, 1)

    if tile_size is not None:
        sw, sh = _tiling.tile_wh(tile_size)
        pix_tx = jnp.floor(px / sw).astype(jnp.int32)  # (1, W)
        pix_ty = jnp.floor(py / sh).astype(jnp.int32)  # (H, 1)

    def chunk_step(carry, xs):
        rgb, depth_acc, T = carry
        m2d, con, col, op, dep, pv, rct = xs  # (K, ...)

        # Effective means per scanline: mu + pix_vel * t_row  -> (K, H, W) deltas.
        dx = px[None] - (m2d[:, 0, None, None] + pv[:, 0, None, None] * t_row[None])
        dy = py[None] - (m2d[:, 1, None, None] + pv[:, 1, None, None] * t_row[None])
        sigma = (
            0.5 * (con[:, 0, None, None] * dx * dx + con[:, 2, None, None] * dy * dy)
            + con[:, 1, None, None] * dx * dy
        )
        alpha = jnp.minimum(MAX_ALPHA, op[:, None, None] * jnp.exp(-sigma))
        alpha = jnp.where((sigma >= 0) & (alpha >= ALPHA_THRESH), alpha, 0.0)  # (K,H,W)
        if tile_size is not None:
            in_rect = (
                (pix_tx[None] >= rct[:, 0, None, None])
                & (pix_tx[None] < rct[:, 2, None, None])
                & (pix_ty[None] >= rct[:, 1, None, None])
                & (pix_ty[None] < rct[:, 3, None, None])
            )
            alpha = jnp.where(in_rect, alpha, 0.0)

        one_m = 1.0 - alpha
        t_inc = T[None] * jnp.cumprod(one_m, axis=0)          # inclusive running T
        t_exc = jnp.concatenate([T[None], t_inc[:-1]], axis=0)  # exclusive running T
        active = t_exc > T_EPS
        w = jnp.where(active, t_exc * alpha, 0.0)             # (K, H, W)

        rgb = rgb + jnp.einsum("khw,kc->hwc", w, col)
        depth_acc = depth_acc + jnp.einsum("khw,k->hw", w, dep)
        # Frozen transmittance: inclusive product at the last active position.
        T = jnp.min(jnp.where(active, t_inc, T[None]), axis=0)
        return (rgb, depth_acc, T), None

    init = (
        jnp.zeros((img_h, img_w, 3), dtype=dtype),
        jnp.zeros((img_h, img_w), dtype=dtype),
        jnp.ones((img_h, img_w), dtype=dtype),
    )
    xs = tuple(
        x.reshape((n_pad // chunk, chunk) + x.shape[1:])
        for x in (means2d, conics, cols, ops, depths, pvels, rect_s)
    )
    (rgb, depth_acc, T), _ = jax.lax.scan(chunk_step, init, xs)

    alpha = 1.0 - T
    rgb = rgb + T[..., None] * background
    depth = depth_acc / jnp.maximum(alpha, 1e-10)
    return RenderOutput(rgb=rgb, alpha=alpha, depth=depth, transmittance=T)
