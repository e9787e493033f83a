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
  * SSIM is computed per strip (valid 11x11 windows only): windows straddling
    strip boundaries are dropped from the mean — a documented approximation of
    the single-device loss, vanishing as strip height >> 11.
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
from ..ops.ssim import ssim as ssim_fn


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
    arguments are auto-detected from the metadata server."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-host


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
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data_local, n_gauss, n_blur, n_tile),
            dcn_mesh_shape=(n_slices, 1, 1, 1),
        )
    else:
        devs = mesh_utils.create_device_mesh((n_data, n_gauss, n_blur, n_tile))
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
):
    """Linear-space rgb sum over the local blur sub-frames for one row strip.

    Returns (rgb_sum (strip_h, W, 3), n_local_samples). Mirrors
    sf.render_camera's math with strip-local intrinsics.
    """
    g = params.gaussians
    camera = cam_opt.apply_camera_opt(camera, params.camera_opt, config.camera_optimizer)
    camera = cam_opt.apply_velocity_opt(
        camera, params.velocity_opt, config.camera_velocity_optimizer
    )

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


def make_sharded_loss(config: sf.SplatfactoConfig, mesh: Mesh, with_probe: bool = False):
    """Build loss(params, camera, gt) sharded over the ('blur','tile') mesh.

    gt arrives row-sharded over 'tile'; params/camera replicated. Returns a
    replicated scalar; jax.grad through it all-reduces parameter gradients.
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

    def local_loss(params, camera, gt_strip, probe):
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

        bg = sf.background_color(params, config)
        sh_deg = config.sh_degree  # static max; schedule masking via probe path
        rgb_sum, _ = _render_strip_linear(
            params, camera, config, sh_deg, bg, strip_h, row0, eps_local,
            means2d_probe=probe if with_probe else None,
            gauss_axis=gauss_axis,
            gauss_shards=mesh.shape.get("gauss", 1),
        )
        # mean over ALL sub-frames: psum over the blur axis
        rgb_mean = jax.lax.psum(rgb_sum, "blur") / s_total
        pred = sf.gamma_encode(rgb_mean, config)
        pred = sf.apply_black_level(pred, config)
        gt = sf.apply_black_level(gt_strip, config)

        l1 = jnp.abs(pred - gt).mean()
        ssim_v = ssim_fn(pred, gt)
        strip_loss = (1 - config.ssim_lambda) * l1 + config.ssim_lambda * (1 - ssim_v)
        loss = jax.lax.psum(strip_loss, "tile") / n_tile
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
        in_specs=(p_spec, cam_spec, gt_spec, probe_spec),
        out_specs=P(),
        check_vma=False,
    )


def make_sharded_train_step(
    config: sf.SplatfactoConfig, mesh: Mesh, optimizer
):
    """Jitted multi-chip train step: sharded render+loss, replicated update."""
    loss_fn = make_sharded_loss(config, mesh, with_probe=True)

    @jax.jit
    def train_step(params, opt_state, camera, gt, step):
        import optax

        probe = jnp.zeros_like(params.gaussians.means[:, :2])
        loss_val, (g_params, g_probe) = jax.value_and_grad(
            lambda p, pr: loss_fn(p, camera, gt, pr), argnums=(0, 1)
        )(params, probe)
        updates, opt_state = optimizer.update(g_params, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val, g_probe

    return train_step
