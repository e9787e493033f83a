"""Tile intersection, depth sorting and binning — XLA-native.

TPU re-design of the reference's intersect/sort/bin stage (SURVEY.md §2c #3/#4:
gsplat `map_gaussian_to_intersects`, `get_tile_bin_edges`, cub radix sort). The
CUDA version builds variable-length per-tile lists with prefix sums and atomic
counters; under XLA we need static shapes, so the design is:

  1. each Gaussian's screen footprint -> a clamped rect of tiles, expanded into at
     most MAX_TILES_PER_GAUSSIAN (tile_id, depth, gauss_idx) entries (static pad);
  2. one lexicographic `lax.sort` over (tile_id, depth) — the TPU analogue of the
     packed int64 radix sort (`tile_id << 32 | depth_bits`);
  3. per-tile ranges via searchsorted over the sorted tile ids (bin edges), and a
     dense gather of up to `max_per_tile` Gaussian indices per tile.

The resulting dense (num_tiles, max_per_tile) index table is what the rasterizer
consumes; gradients flow through the subsequent parameter gather (jnp.take), whose
VJP is a deterministic segment-sum scatter — no atomics (SURVEY.md §5 race note).

Static capacity knobs (recompile when changed):
  * max_tiles_per_gaussian: footprint cap; oversize footprints are clamped around
    the Gaussian's center tile (tracked via `clipped` output for monitoring).
  * max_per_tile: per-tile list capacity; overflow drops the *deepest* entries
    (they are the most occluded); `overflow` output reports the worst tile.
"""
from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE_SENTINEL = jnp.int32(2**30)

# Round-5 lever (b) A/B knob: invert the binning permutation with a
# unique-indices scatter over the capped stream instead of a second
# full-stream lexicographic sort. Bit-identical output (see
# test_tiling_inverse_paths_agree). Measured A/B on v5e (bench.py, round 5):
# scatter 72.1 ms step vs sort 70.6 — parity within the ~5% tunnel variance;
# the projected 2-3 ms sort-shrink win did NOT materialize (XLA's 1M-row
# scatter costs about what the capped-stream sort pair did). Default stays
# ON for the bounded memory shape (the scatter runs over l_cap rows, not
# the full N*MTG stream), not for speed.
_INV_SCATTER = _os.environ.get("SPLAT_TPU_INV_SCATTER", "1") != "0"


def _sigma_min_on_rect(lx, hx, ly, hy, ca, cb, cc):
    """Min of sigma(d) = ca/2 dx^2 + cb dx dy + cc/2 dy^2 over the box
    [lx,hx]x[ly,hy] (coords relative to the Gaussian mean).

    The unconstrained minimum is 0 at the origin; when the origin is outside
    the box the constrained minimum lies on the boundary, so evaluate the four
    edges (1-D quadratics with closed-form clamped minimizers)."""
    def sig(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)
    vals = []
    for d in (lx, hx):                       # vertical edges: dx = d
        dy = jnp.clip(-(cb / cc_s) * d, ly, hy)
        vals.append(sig(d, dy))
    for e in (ly, hy):                       # horizontal edges: dy = e
        dx = jnp.clip(-(cb / ca_s) * e, lx, hx)
        vals.append(sig(dx, e))
    edge_min = jnp.minimum(jnp.minimum(vals[0], vals[1]),
                           jnp.minimum(vals[2], vals[3]))
    inside = (lx <= 0) & (0 <= hx) & (ly <= 0) & (0 <= hy)
    return jnp.where(inside, 0.0, edge_min)


class TileRects(NamedTuple):
    x0: jax.Array  # (N,) inclusive tile coords
    y0: jax.Array
    x1: jax.Array  # (N,) exclusive
    y1: jax.Array


class TileLists(NamedTuple):
    indices: jax.Array   # (num_tiles, max_per_tile) int32 gaussian ids, -1 = empty
    counts: jax.Array    # (num_tiles,) int32 number of valid entries
    overflow: jax.Array  # () int32: total entries dropped by max_per_tile
    clipped: jax.Array   # () int32: gaussians whose footprint rect was clamped
    entry_slots: jax.Array  # (N * M,) int32: flat slot t*K + j each candidate
                            # entry landed in, or T*K (dummy) if dropped. Row
                            # e = i*M + k is entry k of gaussian i. This is the
                            # slot<->entry bijection that lets the parameter-
                            # gather VJP run as a GATHER in entry order + dense
                            # (N, M) reduce instead of a T*K-row scatter-add
                            # (measured 4.3 ms vs 14.1 ms at 1M slots).
    sorted_ids: jax.Array   # (L_cap,) int32 gaussian id per sorted position
                            # (L_cap = max_total_entries or N*M)
    starts: jax.Array       # (num_tiles,) int32 first sorted position per tile
    entry_overflow: jax.Array  # () int32: real entries dropped by the
                               # max_total_entries sorted-stream capacity


def tile_wh(tile_size) -> tuple[int, int]:
    """Normalize a tile spec to (tile_w, tile_h).

    Tiles may be rectangular: 16x8 gives npix = 128 (exactly one TPU lane
    tile) and shrinks the per-Gaussian compositing footprint — pairwise work
    scales as (tile_w + 2r)(tile_h + 2r), so splitting the short axis
    vertically also aligns with the rolling-shutter scanline time gradient."""
    if isinstance(tile_size, (tuple, list)):
        tw, th = tile_size
        return int(tw), int(th)
    return int(tile_size), int(tile_size)


def num_tiles(img_w: int, img_h: int, tile_size) -> tuple[int, int]:
    sw, sh = tile_wh(tile_size)
    return -(-img_w // sw), -(-img_h // sh)


def gaussian_tile_rects(
    means2d: jax.Array,
    extents: jax.Array,
    valid: jax.Array,
    img_w: int,
    img_h: int,
    tile_size: int,
    radius_pad: jax.Array | None = None,
    max_span: int | None = None,
    row0_px: jax.Array | float = 0.0,
    full_img_h: int | None = None,
) -> tuple[TileRects, jax.Array]:
    """Tile-coordinate rects [x0,x1) x [y0,y1) per Gaussian.

    extents: (N, 2) per-axis half-extents of the splat footprint (the exact
    3-sigma ellipse AABB from projection — tighter than a circumscribed
    radius for anisotropic splats), or (N,) scalar radii.
    radius_pad: optional extra pixel radius (e.g. rolling-shutter screen motion
    |pix_vel| * t_max) so moving Gaussians stay inside their binned tiles.
    max_span: clamp rect width/height to this many tiles, centered on the mean
    (keeps the expansion budget static). Returns (rects, was_clipped).

    row0_px / full_img_h: set when `means2d` is in ROW-STRIP coordinates of a
    taller image (tile-sharded rendering, parallel.sharding). The footprint
    rect AND the max_span clamp window are computed in GLOBAL tile
    coordinates and only then intersected with the strip — otherwise an
    oversize footprint's clamp window re-centers inside the strip and the
    strip-rendered image diverges from the single-device render (a boundary-
    crossing footprint can even lose its strip rows entirely). Strips must be
    tile-aligned (row0_px a multiple of tile_h; sharding asserts this).
    """
    tw, th = num_tiles(img_w, img_h, tile_size)
    sw, sh = tile_wh(tile_size)
    _, th_g = num_tiles(img_w, img_h if full_img_h is None else full_img_h,
                        tile_size)
    r0 = (jnp.asarray(row0_px, jnp.float32) / sh).astype(jnp.int32)
    if extents.ndim == 1:
        extents = jnp.stack([extents, extents], axis=-1)
    # radius_pad: scalar-per-gaussian (N,) or ANISOTROPIC per-axis (N, 2).
    # Screen motion is a directed shift (mu travels along +-pix_vel * t), so
    # a per-axis pad box [|vx| t, |vy| t] is exactly as conservative as the
    # isotropic max-component pad but much tighter for directed motion —
    # fewer candidate tiles, less sort/gather/composite work.
    if radius_pad is None:
        px = py = 0.0
    elif radius_pad.ndim == 2:
        px, py = radius_pad[:, 0], radius_pad[:, 1]
    else:
        px = py = radius_pad
    rx = extents[:, 0] + px
    ry = extents[:, 1] + py
    gy = means2d[:, 1] + row0_px          # global pixel rows
    x0 = jnp.floor((means2d[:, 0] - rx) / sw).astype(jnp.int32)
    y0 = jnp.floor((gy - ry) / sh).astype(jnp.int32)
    x1 = jnp.floor((means2d[:, 0] + rx) / sw).astype(jnp.int32) + 1
    y1 = jnp.floor((gy + ry) / sh).astype(jnp.int32) + 1
    x0 = jnp.clip(x0, 0, tw)
    y0 = jnp.clip(y0, 0, th_g)            # global-image clip
    x1 = jnp.clip(x1, 0, tw)
    y1 = jnp.clip(y1, 0, th_g)

    clipped = jnp.zeros_like(x0, dtype=bool)
    if max_span is not None:
        span_x, span_y = (max_span if isinstance(max_span, tuple)
                          else (max_span, max_span))
        cx = jnp.clip(jnp.floor(means2d[:, 0] / sw).astype(jnp.int32), 0, tw - 1)
        cy = jnp.clip(jnp.floor(gy / sh).astype(jnp.int32), 0, th_g - 1)
        wide_x = (x1 - x0) > span_x
        wide_y = (y1 - y0) > span_y
        clipped = wide_x | wide_y
        nx0 = jnp.clip(cx - span_x // 2, 0, tw)
        ny0 = jnp.clip(cy - span_y // 2, 0, th_g)
        x0 = jnp.where(wide_x, nx0, x0)
        x1 = jnp.where(wide_x, jnp.minimum(nx0 + span_x, tw), x1)
        y0 = jnp.where(wide_y, ny0, y0)
        y1 = jnp.where(wide_y, jnp.minimum(ny0 + span_y, th_g), y1)

    # global tile rows -> strip rows
    y0 = jnp.clip(y0 - r0, 0, th)
    y1 = jnp.clip(y1 - r0, 0, th)

    keep = valid & (jnp.max(extents, axis=-1) > 0)
    x1 = jnp.where(keep, x1, x0)  # empty rect for culled gaussians
    y1 = jnp.where(keep, y1, y0)
    return TileRects(x0, y0, x1, y1), clipped & keep


def _expand_tile_entries(
    means2d, extents, depths, valid, img_w, img_h, tile_size,
    max_tiles_per_gaussian, radius_pad, conics, opacities, alpha_thresh,
    row0_px=0.0, full_img_h=None,
):
    """Candidate (gaussian, tile) entries: footprint rects expanded to at most
    M entries per gaussian, with the exact conic-vs-rect alpha cull applied.
    Returns (tile_ids (N, M) int32 with TILE_SENTINEL for dead entries,
    was_clipped (N,) bool). Shared by build_tile_lists and tile_population."""
    tw, th = num_tiles(img_w, img_h, tile_size)
    sw, sh = tile_wh(tile_size)
    span_x = max(int((max_tiles_per_gaussian * sh / sw) ** 0.5), 1)
    span_y = max(min(int(span_x * sw / sh), max_tiles_per_gaussian // span_x), 1)

    rects, was_clipped = gaussian_tile_rects(
        jax.lax.stop_gradient(means2d),
        jax.lax.stop_gradient(extents),
        valid, img_w, img_h, tile_size,
        radius_pad=None if radius_pad is None else jax.lax.stop_gradient(radius_pad),
        max_span=(span_x, span_y),
        row0_px=jax.lax.stop_gradient(jnp.asarray(row0_px)),
        full_img_h=full_img_h,
    )
    w_rect = rects.x1 - rects.x0  # (N,)
    h_rect = rects.y1 - rects.y0
    n_touch = w_rect * h_rect

    # Expand: entry k of gaussian i covers tile (x0 + k % w, y0 + k // w).
    k = jnp.arange(span_x * span_y, dtype=jnp.int32)[None, :]     # (1, M)
    ex = rects.x0[:, None] + k % jnp.maximum(w_rect[:, None], 1)
    ey = rects.y0[:, None] + k // jnp.maximum(w_rect[:, None], 1)
    entry_valid = k < n_touch[:, None]

    if conics is not None and opacities is not None:
        # Exact per-entry cull: peak alpha of the conic over this tile's rect
        # (inflated by the motion pad) below the compositing floor -> drop.
        m2d = jax.lax.stop_gradient(means2d)
        con = jax.lax.stop_gradient(conics)
        op = jax.lax.stop_gradient(opacities)
        if radius_pad is None:
            pad_ex = pad_ey = jnp.zeros((means2d.shape[0], 1), m2d.dtype)
        elif radius_pad.ndim == 2:
            rp = jax.lax.stop_gradient(radius_pad)
            pad_ex, pad_ey = rp[:, 0:1], rp[:, 1:2]
        else:
            pad_ex = pad_ey = jax.lax.stop_gradient(radius_pad)[:, None]
        lx = ex.astype(m2d.dtype) * sw - m2d[:, 0:1] - pad_ex
        hx = lx + sw + 2 * pad_ex
        ly = ey.astype(m2d.dtype) * sh - m2d[:, 1:2] - pad_ey
        hy = ly + sh + 2 * pad_ey
        sig_min = _sigma_min_on_rect(
            lx, hx, ly, hy, con[:, 0:1], con[:, 1:2], con[:, 2:3]
        )                                                          # (N, M)
        # alpha_max = op * exp(-sig_min) >= thresh  <=>  sig_min <= ln(op/thresh)
        # +1e-4 slack: sig_min is computed in fp; never cull a pixel whose
        # center alpha would round to exactly the floor
        sig_budget = jnp.log(jnp.maximum(op, 1e-12) / alpha_thresh)[:, None]
        entry_valid = entry_valid & (sig_min <= sig_budget + 1e-4)

    tile_ids = jnp.where(entry_valid, ey * tw + ex, TILE_SENTINEL)  # (N, M)
    return tile_ids, was_clipped


@functools.partial(
    jax.jit,
    static_argnames=("img_w", "img_h", "tile_size", "max_tiles_per_gaussian",
                     "full_img_h"),
)
def tile_population(
    means2d: jax.Array,
    extents: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    img_w: int,
    img_h: int,
    tile_size: int = 16,
    max_tiles_per_gaussian: int = 64,
    radius_pad: jax.Array | None = None,
    conics: jax.Array | None = None,
    opacities: jax.Array | None = None,
    alpha_thresh: float = 1.0 / 255.0,
    row0_px: jax.Array | float = 0.0,
    full_img_h: int | None = None,
) -> jax.Array:
    """UNCLAMPED per-tile entry counts (num_tiles,) — the adaptive-capacity
    probe. Same footprint + conic-cull logic as build_tile_lists (so the
    counts are exactly what the binning would produce) but no sort and no
    per-tile cap: a bincount over tile ids. The trainer compares these against
    the configured max_per_tile to decide when to grow the capacity
    (recompile), instead of silently dropping the deepest entries forever."""
    tw, th = num_tiles(img_w, img_h, tile_size)
    tile_ids, _ = _expand_tile_entries(
        means2d, extents, depths, valid, img_w, img_h, tile_size,
        max_tiles_per_gaussian, radius_pad, conics, opacities, alpha_thresh,
        row0_px=row0_px, full_img_h=full_img_h,
    )
    flat = jnp.clip(tile_ids.reshape(-1), 0, tw * th)  # sentinel -> extra bin
    counts = jnp.zeros((tw * th + 1,), jnp.int32).at[flat].add(1)
    return counts[:-1]


@functools.partial(
    jax.jit,
    static_argnames=("full_img_h", "max_total_entries", "img_w", "img_h",
                     "tile_size", "max_per_tile",
                     "max_tiles_per_gaussian", "materialize_indices"),
)
def build_tile_lists(
    means2d: jax.Array,
    extents: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    img_w: int,
    img_h: int,
    tile_size: int = 16,
    max_per_tile: int = 512,
    max_tiles_per_gaussian: int = 64,
    radius_pad: jax.Array | None = None,
    conics: jax.Array | None = None,
    opacities: jax.Array | None = None,
    alpha_thresh: float = 1.0 / 255.0,
    materialize_indices: bool = True,
    row0_px: jax.Array | float = 0.0,
    full_img_h: int | None = None,
    max_total_entries: int = 0,
) -> TileLists:
    """Build dense per-tile, depth-sorted Gaussian index lists.

    conics/opacities (effective, i.e. compensation folded in): when given,
    candidate (gaussian, tile) entries are EXACTLY culled by the peak alpha of
    the conic over the tile rect (inflated by radius_pad for screen motion) —
    entries whose best pixel cannot reach the compositing alpha floor are
    dropped before the sort. This is lossless (the rasterizer would mask every
    pixel anyway) and prunes the AABB footprint's corner/edge tiles for
    anisotropic splats — less sort, gather, scatter and kernel work.
    """
    n = means2d.shape[0]
    tw, th = num_tiles(img_w, img_h, tile_size)
    n_tiles = tw * th
    tile_ids, was_clipped = _expand_tile_entries(
        means2d, extents, depths, valid, img_w, img_h, tile_size,
        max_tiles_per_gaussian, radius_pad, conics, opacities, alpha_thresh,
        row0_px=row0_px, full_img_h=full_img_h,
    )

    depths_sg = jax.lax.stop_gradient(depths)
    depth_keys = jnp.broadcast_to(depths_sg[:, None], tile_ids.shape)
    gauss_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], tile_ids.shape
    )

    flat_tiles = tile_ids.reshape(-1)
    flat_depths = depth_keys.reshape(-1)
    flat_ids = gauss_ids.reshape(-1)
    n_entries = flat_tiles.shape[0]
    entry_ids = jnp.arange(n_entries, dtype=jnp.int32)

    sorted_tiles, _, sorted_ids, sorted_entry = jax.lax.sort(
        (flat_tiles, flat_depths, flat_ids, entry_ids), num_keys=2
    )

    # Sorted-stream capacity: every downstream PER-ROW-costed op (the L-row
    # parameter gather in ops/pallas, the dense id-table gather) runs over the
    # sorted prefix of length l_cap instead of the full N*M padded stream —
    # on the bench scene only ~18% of the padded entries are real (the conic
    # cull marks the rest TILE_SENTINEL, which sorts to the tail), so a
    # modest static cap removes most of the gather work (BASELINE.md: XLA
    # gathers cost ~2.6 ns/ROW regardless of width). Real entries beyond
    # l_cap are dropped (counted in entry_overflow; note the drop bias is by
    # SORT KEY, i.e. whole high-tile-id segments — size the cap with
    # headroom / let the trainer grow it, like max_per_tile).
    l_cap = n_entries if max_total_entries <= 0 else min(max_total_entries, n_entries)
    n_real = jnp.sum((sorted_tiles < TILE_SENTINEL).astype(jnp.int32))
    entry_overflow = jnp.maximum(n_real - l_cap, 0)
    sorted_tiles_c = sorted_tiles[:l_cap]
    sorted_ids_c = sorted_ids[:l_cap]

    # Bin edges: one searchsorted per tile boundary.
    tile_range = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    edges = jnp.searchsorted(sorted_tiles_c, tile_range, side="left").astype(jnp.int32)
    starts, ends = edges[:-1], edges[1:]
    counts_full = ends - starts
    counts = jnp.minimum(counts_full, max_per_tile)

    if materialize_indices:
        # Dense (T, K) id table for the jnp/oracle paths. The per-tile ranges
        # are CONTIGUOUS in the sorted array; the pallas path skips this
        # (traced at 7.5 ms for 1M slots) and slices parameters directly from
        # sorted order via `sorted_ids`/`starts`.
        j = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
        ids_padded = jnp.pad(sorted_ids_c, (0, max_per_tile))
        idx = jnp.take(ids_padded, starts[:, None] + j, axis=0)
        idx = jnp.where(j < counts[:, None], idx, -1)
    else:
        idx = None

    # slot<->entry bijection for the gather-form parameter VJP: sorted position
    # p holds entry sorted_entry[p] and lands in slot (tile, p - starts[tile])
    # when it survived the per-tile cap; invert via a rank sort on entry id.
    pos = jnp.arange(n_entries, dtype=jnp.int32)
    t_of_pos = jnp.clip(sorted_tiles, 0, n_tiles - 1)
    # Rank within the tile's run: pos minus the run's first position, found by
    # a cummax over run-boundary marks (an L-row take(starts, t_of_pos) gather
    # traced at 2.7 ms; the scan is ~10x cheaper).
    is_start = jnp.concatenate([
        jnp.ones((1,), bool), sorted_tiles[1:] != sorted_tiles[:-1]
    ])
    seg_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    j_of_pos = pos - seg_start
    slot_valid = (
        (sorted_tiles < TILE_SENTINEL) & (j_of_pos < max_per_tile)
        & (pos < l_cap)
    )
    dummy = jnp.int32(n_tiles * max_per_tile)
    slot_of_pos = jnp.where(
        slot_valid, t_of_pos * max_per_tile + j_of_pos, dummy
    )
    if _INV_SCATTER:
        # Permutation INVERSE via a unique-indices scatter instead of a
        # second full-stream lexicographic sort (round-5 lever (b),
        # BASELINE.md): sorted_entry is a permutation, so the scatter has no
        # duplicates and XLA skips the sort-based dedup its generic
        # scatter-add path pays for. Only the first l_cap positions can hold
        # a live slot (slot_valid includes pos < l_cap), so the scatter runs
        # over the CAPPED stream; entries beyond it keep the dummy init.
        slot_of_entry = jnp.full((n_entries,), dummy, jnp.int32).at[
            sorted_entry[:l_cap]
        ].set(slot_of_pos[:l_cap], unique_indices=True,
              mode="promise_in_bounds")
    else:
        _, slot_of_entry = jax.lax.sort((sorted_entry, slot_of_pos), num_keys=1)

    return TileLists(
        indices=idx,
        counts=counts,
        overflow=jnp.sum(counts_full - counts),
        clipped=jnp.sum(was_clipped.astype(jnp.int32)),
        entry_slots=slot_of_entry,
        sorted_ids=sorted_ids_c,
        starts=starts,
        entry_overflow=entry_overflow,
    )
