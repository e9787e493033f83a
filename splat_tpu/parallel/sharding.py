"""Multi-chip sharding of the render / train step.

The reference is strictly single-GPU (SURVEY.md §2d); distribution here is a
new first-class layer designed for TPU meshes (BASELINE.json north star):

  mesh axes:
    'gauss' — ZeRO-style parameter sharding for large scenes: Gaussian params
             (and their Adam state) live sharded along the capacity axis; each
             device projects/SH-evaluates only its shard, then the packed
             16-float-per-gaussian RASTERIZATION table is all-gathered over
             the axis (for 10M gaussians that is 640 MB over ICI, ~0.4 ms —
             vs 7+ GB of params+optimizer state that never leave the shard).
             The gradient transpose of the all-gather is a reduce-scatter, so
             parameter grads land pre-sharded. Requires blur_mode="fused"
             (one projection per frame).
    'blur' — the blur-sample axis: the S sub-frame renders of one exposure are
             independent until the final average (embarrassingly parallel);
    'tile' — spatial axis: the image is sharded into row strips; each device
             bins and composites only its own strip's tiles (the multi-chip
             analogue of the CUDA tile grid).

  With gauss=1 (small scenes) parameters are replicated; their gradients are
  all-reduced by the psum that jax.shard_map's autodiff inserts for replicated
  inputs — overlapped with the backward pass by XLA. Velocity/pose params are
  always replicated (tiny).

Semantics notes:
  * rolling shutter uses GLOBAL scanline times (rs_row_offset plumbing in
    ops.rasterize), so strip-sharded rendering is bit-consistent with
    single-device rendering;
  * SSIM is EXACT vs the single-device loss: each strip ppermutes the 10 rows
    below its boundary from the next shard(s), evaluates the 11x11 windows
    that START in its own rows, and the masked window sums are psum-combined
    (per-window SSIM is a local computation, so the global mean is exactly
    reproduced).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..cameras import optimizers as cam_opt
from ..cameras.cameras import Cameras
from ..models import splatfacto as sf
from ..ops import projection, rasterize, se3


def make_mesh(n_blur: int, n_tile: int, devices=None, n_gauss: int = 1) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    need = n_blur * n_tile * n_gauss
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    if n_gauss > 1:
        devs = np.asarray(devices[:need]).reshape(n_gauss, n_blur, n_tile)
        return Mesh(devs, ("gauss", "blur", "tile"))
    devs = np.asarray(devices[:need]).reshape(n_blur, n_tile)
    return Mesh(devs, ("blur", "tile"))


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (one process per host, TPU pod slices).

    No-op when already initialized or single-process. On Cloud TPU the
    arguments are auto-detected from the metadata server.

    The already-initialized check must NOT query jax.process_count(): that
    initializes the local backend, after which distributed init can no longer
    take effect (it would then silently run single-process)."""
    try:
        # private API (stable across recent jax, but guarded): the only
        # already-initialized probe that does not touch the local backend
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # distributed runtime already up
    except ImportError:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if coordinator_address is not None or num_processes is not None:
            raise  # explicit multi-process args: a failure is real
        # Auto-detect mode: only swallow the failure when NO multi-process
        # indicators exist in the environment. On a Cloud-TPU pod slice the
        # env/metadata server IS the configuration — a failed initialize()
        # there means each host would silently train as an independent
        # single-process run, the exact degradation the docstring warns
        # against (round-4 advisor finding).
        import os

        indicators = [k for k in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
            "TPU_ACCELERATOR_TYPE", "CLOUD_TPU_TASK_ID",
        ) if os.environ.get(k)]
        if indicators:
            raise RuntimeError(
                "jax.distributed.initialize() failed while multi-process "
                f"environment indicators are set ({', '.join(indicators)}); "
                "refusing to continue as a silent single-process run"
            ) from e
        # plain single-host call with nothing to auto-detect — keep the
        # documented no-op contract


def make_multihost_mesh(
    n_blur: int = 1,
    n_tile: int = 1,
    n_gauss: int = 1,
    n_data: int | None = None,
) -> Mesh:
    """Global mesh across hosts: 'data' (camera batch) spans hosts over DCN —
    it communicates only once per step (the parameter-gradient psum) — while
    gauss/blur/tile ride ICI within each host's slice (their collectives move
    per-frame tensors: table all-gathers and rgb/loss psums).

    n_data defaults to whatever device count remains after the ICI axes.
    """
    from jax.experimental import mesh_utils

    n_dev = jax.device_count()
    ici = n_gauss * n_blur * n_tile
    assert n_dev % ici == 0, f"{n_dev} devices not divisible by ici axes {ici}"
    if n_data is None:
        n_data = n_dev // ici
    assert n_data * ici == n_dev, (n_data, ici, n_dev)
    if jax.process_count() > 1:
        # create_hybrid_device_mesh: mesh_shape must multiply to the devices
        # PER SLICE and dcn_mesh_shape to the slice count — so the data axis
        # factors into (within-slice leftover) x (slices), concatenated into
        # one axis by the elementwise shape product.
        n_slices = jax.process_count()
        per_slice = n_dev // n_slices
        assert ici <= per_slice and per_slice % ici == 0, (
            f"ici axes ({ici}) must fit within one slice ({per_slice} devices)"
        )
        data_local = per_slice // ici
        assert n_data == data_local * n_slices, (
            f"n_data={n_data} must equal (devices_per_slice/ici) x slices "
            f"= {data_local} x {n_slices}"
        )
        # DCN granule: TPU slices when the backend reports slice_index
        # (multi-slice pods), otherwise processes (one host = one granule —
        # also what the 2-process CPU dryrun exercises,
        # scripts_dev/dryrun_multihost.py).
        slice_ids = {getattr(d, "slice_index", None) for d in jax.devices()}
        by_process = len(slice_ids - {None}) <= 1
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data_local, n_gauss, n_blur, n_tile),
            dcn_mesh_shape=(n_slices, 1, 1, 1),
            process_is_granule=by_process,
        )
    else:
        devs = mesh_utils.create_device_mesh((n_data, n_gauss, n_blur, n_tile))
    return Mesh(devs, ("data", "gauss", "blur", "tile"))


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """CLI-facing mesh spec (reference has no analogue — SURVEY.md §2d: the
    distribution layer is new). Wired as `--mesh.*` flags on cli/fit.py.

    Axis sizes; 0 = auto. `enabled=False` (default) trains single-device.
    With `enabled=True` and all axes auto, every visible device is used:
    blur gets the largest divisor of blur_samples that fits, the rest of the
    devices go to tile strips (subject to the image-height divisibility
    constraint), leftovers to gauss."""

    enabled: bool = False
    data: int = 1
    gauss: int = 1
    blur: int = 0
    tile: int = 0


def _divisors_desc(n: int) -> list[int]:
    return [d for d in range(n, 0, -1) if n % d == 0]


def resolve_mesh(
    mc: MeshConfig,
    config: "sf.SplatfactoConfig",
    img_h: int,
    n_devices: int | None = None,
) -> Mesh:
    """Build the training mesh from a MeshConfig (auto-filling 0 axes).

    The returned mesh ALWAYS has a 'data' axis (size >= 1); the trainer batches
    `data` cameras per step. Constraints honored by auto-fill: blur divides
    blur_samples; tile divides the image height into tile-aligned strips of
    >= 10 rows (the SSIM halo needs at most one extra neighbour hop otherwise —
    allowed, but avoided by auto)."""
    from ..ops.tiling import tile_wh

    n_dev = n_devices if n_devices is not None else jax.device_count()
    data = mc.data or 1
    gauss = mc.gauss or 1
    assert n_dev % (data * gauss) == 0, (
        f"{n_dev} devices not divisible by data*gauss = {data * gauss}"
    )
    rem = n_dev // (data * gauss)
    s = max(config.blur_samples, 1)
    tile_h = tile_wh(config.tile_size)[1]
    blur, tile = mc.blur, mc.tile
    if blur == 0 and tile == 0:
        # prefer tile strips (scales any scene), fall back to blur
        for t in _divisors_desc(rem):
            strip = img_h // t
            if img_h % t == 0 and strip % tile_h == 0 and (rem // t) <= s and s % (rem // t) == 0:
                tile, blur = t, rem // t
                break
        else:
            tile, blur = 1, max(d for d in _divisors_desc(rem) if s % d == 0)
    elif blur == 0:
        assert rem % tile == 0, (rem, tile)
        blur = max(d for d in _divisors_desc(rem // tile) if s % d == 0)
    elif tile == 0:
        assert rem % blur == 0, (rem, blur)
        tile = rem // blur
    assert s % blur == 0, f"blur_samples={s} not divisible by blur axis {blur}"
    assert img_h % tile == 0 and (img_h // tile) % tile_h == 0, (
        f"image height {img_h} must split into {tile} tile-aligned strips"
    )
    used = data * gauss * blur * tile
    assert used <= n_dev, (used, n_dev)
    if used == n_dev:
        return make_multihost_mesh(n_blur=blur, n_tile=tile, n_gauss=gauss, n_data=data)
    # constraints left devices idle (e.g. blur_samples coprime with the
    # device count): single-process fallback over a device subset
    assert jax.process_count() == 1, (
        f"multi-host meshes must use all devices (axes use {used} of {n_dev})"
    )
    import numpy as np

    devs = np.asarray(jax.devices()[:used]).reshape(data, gauss, blur, tile)
    return Mesh(devs, ("data", "gauss", "blur", "tile"))


def param_specs(mesh: Mesh) -> "sf.ModelParams":
    """PartitionSpec pytree for ModelParams on this mesh.

    Gaussian leaves shard their leading (capacity) axis over 'gauss' when the
    mesh has one; camera/velocity/background params are always replicated."""
    gauss = P("gauss") if "gauss" in mesh.shape else P()
    g = sf.GaussianParams(
        means=gauss, scales_log=gauss, quats=gauss, opacities_logit=gauss,
        features_dc=gauss, features_rest=gauss, alive=gauss,
    )
    # P() entries act as pytree prefixes for the dict-valued optimizer leaves.
    return sf.ModelParams(
        gaussians=g, background_logit=P(), camera_opt=P(), velocity_opt=P(),
        eval_camera_opt=P(), eval_velocity_opt=P(),
    )


def _render_strip_linear(
    params: sf.ModelParams,
    camera: Cameras,
    config: sf.SplatfactoConfig,
    sh_degree_active,
    background: jax.Array,
    strip_h: int,
    row0,
    eps_local: jax.Array,
    means2d_probe: jax.Array | None = None,
    gauss_axis: str | None = None,
    gauss_shards: int = 1,
    is_eval: bool = False,
):
    """Linear-space rgb sum over the local blur sub-frames for one row strip.

    Returns (rgb_sum (strip_h, W, 3), n_local_samples). Mirrors
    sf.render_camera's math with strip-local intrinsics. is_eval routes the
    eval-camera pose/velocity parameter tables (reference
    `--optimize-eval-cameras`, the caller stop-gradients the scene)."""
    g = params.gaussians
    cam_par = (params.eval_camera_opt, params.eval_velocity_opt) if is_eval else (
        params.camera_opt, params.velocity_opt)
    camera = cam_opt.apply_camera_opt(camera, cam_par[0], config.camera_optimizer)
    vel_cfg = config.camera_velocity_optimizer
    if is_eval and not config.optimize_eval_velocities:
        vel_cfg = dataclasses.replace(vel_cfg, enabled=False)
    camera = cam_opt.apply_velocity_opt(camera, cam_par[1], vel_cfg)

    scales = jnp.exp(g.scales_log)
    opac = jax.nn.sigmoid(g.opacities_logit) * jax.lax.stop_gradient(g.alive)
    coeffs = jnp.concatenate([g.features_dc[:, None, :], g.features_rest], axis=1)

    R0, p0 = camera.R_c2w[0], camera.p_c2w[0]
    v, om = camera.lin_vel[0], camera.ang_vel[0]
    rs_time = jnp.where(
        config.rolling_shutter_compensation, camera.rolling_shutter_time[0], 0.0
    )
    fx, fy = camera.fx[0], camera.fy[0]
    cx = camera.cx[0]
    cy_local = camera.cy[0] - row0          # strip-local principal point
    w, full_h = camera.width, camera.height

    def subframe_inputs(t_s):
        Rt, pt = se3.se3_advance_c2w(R0, p0, v, om, t_s)
        R_cw = Rt.T
        t_cw = -jnp.matmul(R_cw, pt, precision=jax.lax.Precision.HIGHEST)
        proj = projection.project_gaussians(
            g.means, scales, g.quats, R_cw, t_cw, fx, fy, cx, cy_local,
            w, strip_h, lin_vel=v, ang_vel=om,
            lim_img_h=full_h,   # full-image frustum clamp: bit-identical cov2d
        )
        if means2d_probe is not None:
            proj = proj._replace(means2d=proj.means2d + means2d_probe)
        if config.rasterize_mode == "classic":
            proj = proj._replace(compensations=jnp.ones_like(proj.compensations))
        dirs = g.means - pt
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        colors = sf.sh_eval_switch(sh_degree_active, config.sh_degree, dirs, coeffs)
        return proj, colors

    raster_kw = dict(
        rolling_shutter_time=rs_time,
        tile_size=config.tile_size,
        max_per_tile=config.max_per_tile,
        max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        max_total_entries=config.max_total_entries,
        chunk=config.chunk,
        impl=sf.resolve_impl(config.impl),
        rs_full_height=full_h,
        rs_row_offset=row0,
    )

    def render_subframe(t_s):
        proj, colors = subframe_inputs(t_s)
        return rasterize.rasterize(
            proj, colors, opac, w, strip_h, background, **raster_kw
        ).rgb

    fused_path = (config.blur_mode == "fused" and config.blur_samples > 1)
    if fused_path or gauss_axis is not None:
        # Fused exposure (models.splatfacto blur_mode="fused"): one projection
        # and binning at mid-exposure per device; the kernels render this
        # device's eps subset via the screen-space velocity warp. Applies even
        # when this shard holds a single sample (n_blur == S), so semantics
        # match the single-device fused path exactly (same warp, mid pose).
        # Gaussian-sharded meshes always take this path: each device projects
        # its parameter shard, then the packed rasterization table is
        # all-gathered (its autodiff transpose reduce-scatters the grads back
        # to the shards).
        # Anchor policy: blur_anchors in {0, 1} anchors at mid-exposure
        # (bit-identical to the single-device A=1 path); any other value
        # anchors each blur shard at ITS OWN group's mean time — the sharded
        # realization of A=n_blur anchors (per-group exact pose, warp only
        # within the group; see models.resolve_blur_anchors).
        if config.blur_anchors in (0, 1):
            t_anchor = jnp.zeros(())
        else:
            t_anchor = eps_local.mean()
        proj, colors = subframe_inputs(t_anchor)
        local_opac = opac
        if gauss_axis is not None and config.gauss_shard_mode == "slab":
            # Depth-slab COMPUTE sharding: each device bins/composites only
            # its depth-quantile slab (all_to_all of the packed table), then
            # the per-slab images merge with the associative over-operator —
            # compositing work scales 1/n_gauss instead of being replicated.
            proj, colors, local_opac, _overflow = _depth_slab_exchange(
                proj, colors, opac, gauss_axis, gauss_shards,
                slack=config.slab_slack,
            )
            out = rasterize.rasterize_fused(
                proj, colors, local_opac, w, strip_h,
                jnp.zeros_like(background),
                eps=eps_local - t_anchor, **raster_kw
            )
            rgb, T = _combine_depth_slabs(out.rgb, out.transmittance, gauss_axis)
            rgb = rgb + T[..., None] * background
            return rgb.sum(axis=0), eps_local.shape[0]
        if gauss_axis is not None:
            proj, colors, local_opac = _all_gather_projected(
                proj, colors, opac, gauss_axis
            )
        out = rasterize.rasterize_fused(
            proj, colors, local_opac, w, strip_h, background,
            eps=eps_local - t_anchor, reduce="mean", **raster_kw
        )
        # local sum over this shard's samples = local mean * n_local (the
        # caller psums the sums and divides by the global S)
        return out.rgb * eps_local.shape[0], eps_local.shape[0]
    if eps_local.shape[0] == 1:
        return render_subframe(eps_local[0]), 1
    # exact mode — lax.map compiles the sub-frame body once (see models note)
    rgbs = jax.lax.map(render_subframe, eps_local)   # (S_local, strip_h, W, 3)
    return rgbs.sum(axis=0), eps_local.shape[0]


def _depth_slab_exchange(
    proj: "projection.ProjectedGaussians",
    colors: jax.Array,
    opacities: jax.Array,
    axis: str,
    n_shards: int,
    slack: float = 2.0,
):
    """Re-shard the packed rasterization table by DEPTH SLAB (all_to_all).

    Compute sharding for scenes where even the gathered table is too large or
    the compositing work itself must scale: device k ends up holding the k-th
    global depth-quantile slab of gaussians and composites ONLY those over the
    (full or strip) image; slabs then merge with the associative front-to-back
    over-operator (see the caller). Because any depth-monotone partition
    splits the global (tile, depth) sort into contiguous runs, the combined
    image is EXACT vs the single-device composite (same order, same math).

    Mechanics: global 256-bin depth histogram (one psum) -> per-bin slab ids
    (quantile load balance at bin granularity) -> local stable sort by slab ->
    fixed-capacity (n_shards, C, NPARAM+2) buckets -> lax.all_to_all. Overflowed
    rows (beyond C = slack * N_loc / n_shards) are dropped and counted; the
    transpose of the exchange routes slab-gradient rows straight back to the
    owning shard.
    """
    from ..ops.pallas import pack_param_table

    table = pack_param_table(proj, colors, opacities)[:-1]   # (N_loc, NPARAM)
    npar = table.shape[1]
    rows = jnp.concatenate([table, proj.extents], axis=1)    # (N_loc, NPARAM+2)
    n_loc, n_col = rows.shape
    d = n_shards
    depth = jax.lax.stop_gradient(table[:, 9])
    live = jax.lax.stop_gradient(table[:, 8]) > 0
    big = jnp.float32(3.0e38)
    dmin = jax.lax.pmin(jnp.min(jnp.where(live, depth, big)), axis)
    dmax = jax.lax.pmax(jnp.max(jnp.where(live, depth, -big)), axis)

    nbins = 256
    scale = (nbins - 1) / jnp.maximum(dmax - dmin, 1e-9)
    b = jnp.clip(((depth - dmin) * scale).astype(jnp.int32), 0, nbins - 1)
    hist = jnp.zeros((nbins,), jnp.int32).at[
        jnp.where(live, b, nbins)
    ].add(1, mode="drop")
    hist = jax.lax.psum(hist, axis)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)[:-1]])
    total = jnp.maximum(jnp.sum(hist), 1)
    bin_slab = jnp.clip(prefix * d // total, 0, d - 1)       # (nbins,) monotone
    slab = jnp.where(live, jnp.take(bin_slab, b), d)         # dead -> dropped

    order = jnp.argsort(slab, stable=True)
    slab_sorted = jnp.take(slab, order)
    rows_sorted = jnp.take(rows, order, axis=0)
    edges = jnp.searchsorted(
        slab_sorted, jnp.arange(d + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    cnt = edges[1:] - edges[:-1]

    c_send = min(n_loc, max(8, int(-(-slack * n_loc // (8 * d)) * 8)))
    j = jnp.arange(c_send, dtype=jnp.int32)[None, :]
    idx = edges[:-1, None] + j
    valid = j < jnp.minimum(cnt, c_send)[:, None]
    rows_pad = jnp.concatenate(
        [rows_sorted, jnp.zeros((c_send, n_col), rows.dtype)], axis=0
    )
    send = jnp.where(valid[..., None], jnp.take(rows_pad, idx, axis=0), 0.0)
    overflow = jax.lax.psum(jnp.sum(jnp.maximum(cnt - c_send, 0)), axis)

    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    rows_recv = recv.reshape(d * c_send, n_col)              # this device's slab

    op_eff = rows_recv[:, 8]
    synth = projection.ProjectedGaussians(
        means2d=rows_recv[:, 0:2],
        depths=rows_recv[:, 9],
        conics=rows_recv[:, 2:5],
        radii=jnp.max(rows_recv[:, npar:npar + 2], axis=-1),
        compensations=jnp.ones_like(op_eff),
        pix_vels=rows_recv[:, 10:12],
        valid=op_eff > 0,                                    # pad rows culled
        extents=rows_recv[:, npar:npar + 2],
    )
    return synth, rows_recv[:, 5:8], op_eff, overflow


def _combine_depth_slabs(rgb_local, T_local, axis):
    """Merge per-slab premultiplied composites with the associative over-op.

    rgb_local (S, h, w, 3) WITHOUT background; T_local (S, h, w). Device order
    along `axis` == slab depth order, so
      rgb = sum_k (prod_{j<k} T_j) rgb_k,  T = prod_k T_k
    reproduces the unsharded front-to-back composite exactly."""
    rgbs = jax.lax.all_gather(rgb_local, axis)               # (D, S, h, w, 3)
    Ts = jax.lax.all_gather(T_local, axis)                   # (D, S, h, w)
    T_exc = jnp.concatenate(
        [jnp.ones_like(Ts[:1]), jnp.cumprod(Ts[:-1], axis=0)], axis=0
    )
    rgb = jnp.sum(T_exc[..., None] * rgbs, axis=0)           # (S, h, w, 3)
    T = jnp.prod(Ts, axis=0)
    return rgb, T


def _all_gather_projected(
    proj: "projection.ProjectedGaussians",
    colors: jax.Array,
    opacities: jax.Array,
    axis: str,
) -> tuple["projection.ProjectedGaussians", jax.Array, jax.Array]:
    """Gather each shard's packed rasterization table into the full cloud.

    Only the 16 floats the rasterizer consumes cross the interconnect (means2d,
    conic, rgb, effective opacity, depth, pixel velocity) plus the 2-float tile
    footprint — parameters and optimizer state stay sharded (ZeRO-style). The
    transpose of the all-gather is a reduce-scatter of the table cotangent.
    """
    from ..ops.pallas import pack_param_table

    table = pack_param_table(proj, colors, opacities)[:-1]   # (N_loc, 16)
    table_g = jax.lax.all_gather(table, axis, tiled=True)    # (N, 16)
    ext_g = jax.lax.all_gather(proj.extents, axis, tiled=True)  # (N, 2)

    op_eff = table_g[:, 8]
    synth = projection.ProjectedGaussians(
        means2d=table_g[:, 0:2],
        depths=table_g[:, 9],
        conics=table_g[:, 2:5],
        radii=jnp.max(ext_g, axis=-1),
        compensations=jnp.ones_like(op_eff),   # already folded into op_eff
        pix_vels=table_g[:, 10:12],
        valid=jnp.ones_like(op_eff, dtype=bool),  # culled -> extents 0, op 0
        extents=ext_g,
    )
    return synth, table_g[:, 5:8], op_eff


def _halo_rows_below(x: jax.Array, axis: str, n_rows: int, n_shards: int) -> jax.Array:
    """The n_rows of the image directly below this device's row strip.

    ppermute from the next shard(s) along `axis` (multi-hop when the strip is
    shorter than n_rows); the last strip receives zeros — its windows that
    would use them are masked out by the caller."""
    strip_h = x.shape[0]
    hops = -(-n_rows // strip_h)
    parts = []
    for hop in range(1, hops + 1):
        src = x if strip_h < n_rows else x[:n_rows]
        perm = [(i, i - hop) for i in range(hop, n_shards)]
        parts.append(jax.lax.ppermute(src, axis, perm))
    return jnp.concatenate(parts, axis=0)[:n_rows]


def _exact_strip_ssim(
    pred: jax.Array, gt: jax.Array, row0, full_h: int, n_tile: int,
    window_size: int = 11,
) -> jax.Array:
    """Globally exact SSIM over row strips (one value, replicated over 'tile').

    Each strip evaluates the 11x11 windows STARTING in its own rows (halo rows
    from below via ppermute), masks window rows that extend past the image,
    and the window sums psum into the exact full-image mean."""
    from ..ops.ssim import ssim_map

    pad = window_size - 1
    if n_tile > 1:
        pred = jnp.concatenate(
            [pred, _halo_rows_below(pred, "tile", pad, n_tile)], axis=0
        )
        gt = jnp.concatenate([gt, _halo_rows_below(gt, "tile", pad, n_tile)], axis=0)
    smap = ssim_map(pred, gt, window_size)           # (rows_local, W-pad, C)
    rows = smap.shape[0]
    valid = (row0 + jnp.arange(rows)) < (full_h - pad)  # window start fits
    total = jnp.sum(smap * valid[:, None, None])
    count = jnp.sum(valid) * smap.shape[1] * smap.shape[2]
    if n_tile > 1:
        total = jax.lax.psum(total, "tile")
        count = jax.lax.psum(count, "tile")
    return total / count


def make_sharded_loss(
    config: sf.SplatfactoConfig,
    mesh: Mesh,
    with_probe: bool = False,
    is_eval: bool = False,
):
    """Build loss(params, camera, gt, probe, step, key) sharded over the mesh.

    gt arrives row-sharded over 'tile' (and batched over 'data' when present);
    params replicated (or 'gauss'-sharded). `step` is traced — the SH-degree
    warm-up schedule (Appendix C) applies exactly as on one device. `key`
    feeds the random-background mode. Returns a replicated scalar; jax.grad
    through it all-reduces parameter gradients.
    """
    n_blur = mesh.shape["blur"]
    n_tile = mesh.shape["tile"]
    gauss_axis = "gauss" if "gauss" in mesh.shape else None
    data_axis = "data" if "data" in mesh.shape else None
    if gauss_axis is not None and config.blur_mode != "fused" and config.blur_samples > 1:
        raise ValueError(
            "gauss-sharded meshes require blur_mode='fused' (one projection "
            "per frame; exact per-sub-frame reprojection would re-gather the "
            "table per sample)"
        )
    s_total = max(config.blur_samples, 1)
    assert s_total % n_blur == 0, (
        f"blur_samples={s_total} must divide mesh blur axis {n_blur}"
    )
    s_local = s_total // n_blur

    def local_loss(params, camera, gt_strip, probe, step, key):
        if data_axis is not None:
            # camera arrives as this device's slice of the camera batch
            # (B_local=1); gt_strip as (1, strip_h, W, 3).
            gt_strip = gt_strip[0]
        full_h = camera.height
        assert full_h % n_tile == 0, "image height must divide tile axis"
        strip_h = full_h // n_tile
        from ..ops.tiling import tile_wh
        assert strip_h % tile_wh(config.tile_size)[1] == 0, (
            "strip height must be a multiple of the tile height"
        )
        row0 = jax.lax.axis_index("tile") * strip_h
        blur_idx = jax.lax.axis_index("blur")

        exposure = camera.exposure_time[0]
        if config.blur_samples > 0:
            eps_all = sf.blur_sample_times(exposure, config)
        else:
            eps_all = jnp.zeros((1,))
        eps_local = jax.lax.dynamic_slice(eps_all, (blur_idx * s_local,), (s_local,))

        bg = sf.background_color(params, config, key)
        sh_deg = sf.active_sh_degree(config, step)   # traced warm-up schedule
        rgb_sum, _ = _render_strip_linear(
            params, camera, config, sh_deg, bg, strip_h, row0, eps_local,
            means2d_probe=probe if with_probe else None,
            gauss_axis=gauss_axis,
            gauss_shards=mesh.shape.get("gauss", 1),
            is_eval=is_eval,
        )
        # mean over ALL sub-frames: psum over the blur axis
        rgb_mean = jax.lax.psum(rgb_sum, "blur") / s_total
        pred = sf.gamma_encode(rgb_mean, config)
        pred = sf.apply_black_level(pred, config)
        gt = sf.apply_black_level(gt_strip, config)

        # L1 over strips of equal size: mean of strip means == global mean
        l1 = jax.lax.pmean(jnp.abs(pred - gt).mean(), "tile")
        ssim_v = _exact_strip_ssim(pred, gt, row0, full_h, n_tile)
        loss = (1 - config.ssim_lambda) * l1 + config.ssim_lambda * (1 - ssim_v)
        # blur axis already reduced into rgb_mean; average the identical
        # replicas so the value stays replicated for out_specs=P()
        loss = jax.lax.pmean(loss, "blur")
        if data_axis is not None:
            # camera-batch data parallelism: mean of per-camera losses; its
            # grad transpose all-reduces parameter grads once per step (the
            # only DCN-crossing collective on multi-host meshes).
            loss = jax.lax.pmean(loss, data_axis)

        if config.use_scale_regularization:
            g = params.gaussians
            s = jnp.exp(g.scales_log)
            ratio = s.max(axis=-1) / jnp.maximum(s.min(axis=-1), 1e-12)
            excess = jnp.maximum(ratio, config.max_gauss_ratio) - config.max_gauss_ratio
            alive = jax.lax.stop_gradient(g.alive)
            num = (excess * alive).sum()
            den = alive.sum()
            if gauss_axis is not None:
                # gaussian leaves are shards: reduce the regularizer globally
                num = jax.lax.psum(num, gauss_axis)
                den = jax.lax.psum(den, gauss_axis)
            loss = loss + config.scale_reg_weight * (num / jnp.maximum(den, 1.0))
        loss = loss + cam_opt.camera_opt_penalty(params.camera_opt, config.camera_optimizer)
        return loss

    p_spec = param_specs(mesh)
    probe_spec = P(gauss_axis) if gauss_axis is not None else P()
    cam_spec = P(data_axis) if data_axis is not None else P()
    gt_spec = (P(data_axis, "tile", None, None) if data_axis is not None
               else P("tile", None, None))
    return jax.shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(p_spec, cam_spec, gt_spec, probe_spec, P(), P()),
        out_specs=P(),
        check_vma=False,
    )


def _sharded_step_body(config: sf.SplatfactoConfig, mesh: Mesh, optimizer):
    """Shared body of the sharded train step / scan: render+loss (shard_map),
    grads, optimizer update, densification-strategy accumulation — the mesh
    version of trainer._train_step_body."""
    import optax

    from ..models import strategy as st

    loss_fn = make_sharded_loss(config, mesh, with_probe=True)

    def step_body(params, opt_state, strat_state, camera, gt, step, key):
        probe = jnp.zeros_like(params.gaussians.means[:, :2])
        loss_val, (g_params, g_probe) = jax.value_and_grad(
            lambda p, pr: loss_fn(p, camera, gt, pr, step, key), argnums=(0, 1)
        )(params, probe)
        updates, opt_state = optimizer.update(g_params, opt_state, params)
        params = optax.apply_updates(params, updates)
        visible = jnp.linalg.norm(g_probe, axis=-1) > 0
        strat_state = st.accumulate_grads(
            strat_state, g_probe, visible, camera.width, camera.height
        )
        aux = {"n_visible": visible.sum()}
        return params, opt_state, strat_state, loss_val, aux

    return step_body


def make_sharded_train_step(
    config: sf.SplatfactoConfig, mesh: Mesh, optimizer, donate: bool = True
):
    """Jitted multi-chip train step — same signature as trainer.make_train_step
    so the Trainer drives either interchangeably: (params, opt_state,
    strat_state, camera, gt, step, key) -> (params, opt_state, strat_state,
    loss, aux). With a 'data' axis of size B, camera is a B-batch and gt is
    (B, H, W, 3)."""
    body = _sharded_step_body(config, mesh, optimizer)
    return jax.jit(body, donate_argnums=(0, 1, 2) if donate else ())


def make_sharded_train_scan(
    config: sf.SplatfactoConfig, mesh: Mesh, optimizer, donate: bool = True
):
    """lax.scan over B consecutive sharded steps (one dispatch per block) —
    the mesh version of trainer.make_train_scan; numerically identical step
    sequence. Scanned xs carry a leading block axis: cameras (B, D, ...),
    gts (B, D, H, W, 3), steps/keys (B, ...)."""
    body = _sharded_step_body(config, mesh, optimizer)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def train_scan(params, opt_state, strat_state, cameras, gts, steps, keys):
        def scan_body(carry, xs):
            params, opt_state, strat_state = carry
            cam, gt, step, key = xs
            params, opt_state, strat_state, loss, aux = body(
                params, opt_state, strat_state, cam, gt, step, key
            )
            return (params, opt_state, strat_state), (loss, aux["n_visible"])

        (params, opt_state, strat_state), (losses, n_vis) = jax.lax.scan(
            scan_body, (params, opt_state, strat_state), (cameras, gts, steps, keys)
        )
        return params, opt_state, strat_state, losses, n_vis

    return train_scan


def make_sharded_eval_opt_step(
    config: sf.SplatfactoConfig, mesh: Mesh, eval_optimizer
):
    """Optimize eval-camera pose/velocity params on the mesh WITHOUT touching
    the scene (reference `--optimize-eval-cameras`): the scene renders through
    the sharded loss with stop_gradient on everything but the eval tables."""
    import optax

    loss_fn = make_sharded_loss(config, mesh, with_probe=False, is_eval=True)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def eval_opt_step(params, eval_opt_state, camera, gt, step, key):
        probe = jnp.zeros_like(params.gaussians.means[:, :2])

        def loss(eval_cam, eval_vel):
            frozen = jax.tree.map(jax.lax.stop_gradient, params)
            p = frozen._replace(eval_camera_opt=eval_cam, eval_velocity_opt=eval_vel)
            return loss_fn(p, camera, gt, probe, step, key)

        gc, gv = jax.grad(loss, argnums=(0, 1))(
            params.eval_camera_opt, params.eval_velocity_opt
        )
        updates, eval_opt_state = eval_optimizer.update(
            {"cam": gc, "vel": gv}, eval_opt_state,
            {"cam": params.eval_camera_opt, "vel": params.eval_velocity_opt},
        )
        new = optax.apply_updates(
            {"cam": params.eval_camera_opt, "vel": params.eval_velocity_opt}, updates
        )
        params = params._replace(
            eval_camera_opt=new["cam"], eval_velocity_opt=new["vel"]
        )
        return params, eval_opt_state

    return eval_opt_step


def train_state_shardings(mesh: Mesh, params, opt_state, strat_state):
    """NamedShardings for (params, opt_state, strat_state) on this mesh.

    Gaussian-capacity leaves (leading dim == capacity) shard over 'gauss'
    (this includes the Adam moment pytrees inside opt_state); everything else
    replicates. Used both to place initial state and to re-place after the
    host-side refine/grow events."""
    from jax.sharding import NamedSharding

    capacity = params.gaussians.alive.shape[0]
    has_gauss = "gauss" in mesh.shape and mesh.shape["gauss"] > 1
    rep = NamedSharding(mesh, P())
    gshard = NamedSharding(mesh, P("gauss")) if has_gauss else rep

    def leaf_sharding(leaf):
        if (
            has_gauss
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] == capacity
        ):
            return NamedSharding(mesh, P(*("gauss",) + (None,) * (leaf.ndim - 1)))
        return rep

    return (
        jax.tree.map(leaf_sharding, params),
        jax.tree.map(leaf_sharding, opt_state),
        jax.tree.map(leaf_sharding, strat_state),
    )


def place_train_state(mesh: Mesh, params, opt_state, strat_state):
    """device_put the training state onto its mesh shardings (initial
    placement and re-placement after refine / capacity growth)."""
    sh = train_state_shardings(mesh, params, opt_state, strat_state)
    return (
        jax.device_put(params, sh[0]),
        jax.device_put(opt_state, sh[1]),
        jax.device_put(strat_state, sh[2]),
    )
