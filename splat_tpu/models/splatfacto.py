"""SplatfactoModel equivalent — the 3dgs-deblur method core, TPU-native.

Re-designs the reference fork's `models/splatfacto.py` (SURVEY.md §2b row
splatfacto, §3.1 hot loop, Appendix B) as a functional JAX model:

  * Gaussian parameters live in FIXED-CAPACITY padded arrays with an `alive`
    mask (XLA static shapes; SURVEY.md §7 hard part 1) — densify/cull are
    functional updates in `strategy.py`.
  * `render_camera` implements the method: camera-optimizer pose correction,
    velocity prior + learnable delta, `blur_samples` sub-frame poses over the
    exposure window (SE(3) advance, Appendix B.2), per-sub-frame projection
    with screen velocities, tile rasterization with per-scanline rolling
    shutter (Appendix B.3), linear-space averaging and gamma encoding with a
    black-level floor (Appendix B.4).
  * The blur-sample loop is vmapped — sub-frames are data-parallel until the
    final average (SURVEY.md §2d: the "second embarrassingly parallel axis").

Reference flag surface covered (train.py:14-70): blur-samples,
rolling-shutter-compensation, gamma, min-rgb-level, background-color auto,
camera-optimizer.mode, camera-velocity-optimizer.{enabled,zero-initial-velocities},
rasterize-mode antialiased, sh-degree, use-scale-regularization.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import optimizers as cam_opt
from ..cameras.cameras import Cameras
from ..ops import projection, rasterize, reference, se3, sh, tiling
from ..ops.reference import RenderOutput


@dataclasses.dataclass(frozen=True)
class SplatfactoConfig:
    # --- method flags (reference train.py:14-70) ---
    blur_samples: int = 5                      # 0 = motion-blur compensation off
    # fused: project/bin ONCE at mid-exposure, render all sub-frames in the
    #   rasterizer by the first-order screen-space velocity warp (same warp the
    #   method uses for rolling shutter, Appendix B.3) — the TPU-native fast
    #   path (sort/gather/grad-scatter amortized over the exposure).
    # exact: re-project at each sub-frame pose like the reference (train.py:22).
    blur_mode: str = "fused"
    # number of anchor poses for fused mode: sub-frames are grouped around A
    # exact poses and warped only within a group — linearization error scales
    # with (exposure/A)^2 at A x (binning pipeline) cost. 0 = auto: the
    # trainer picks A from the dataset's worst rotation-per-exposure (see
    # resolve_blur_anchors; calibrated: <=3 deg of rotation per anchor group
    # tracks exact reprojection, 6+ deg costs dBs).
    blur_anchors: int = 0
    rolling_shutter_compensation: bool = True
    gamma: float = 2.2                         # 1.0 when MB compensation off
    min_rgb_level: float = 10.0                # black-level floor, 0..255 scale
    background_color: str = "auto"             # auto (learnable) | black | white | random
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    rasterize_mode: str = "antialiased"        # antialiased | classic
    use_scale_regularization: bool = True
    max_gauss_ratio: float = 10.0
    camera_optimizer: cam_opt.CameraOptConfig = cam_opt.CameraOptConfig()
    camera_velocity_optimizer: cam_opt.VelocityOptConfig = cam_opt.VelocityOptConfig()
    optimize_eval_cameras: bool = False
    optimize_eval_velocities: bool = True
    # --- losses ---
    ssim_lambda: float = 0.2
    scale_reg_weight: float = 0.1
    # --- progressive resolution (splatfacto num-downscales, Appendix C:
    # train at 1/2^k resolution, stepping up every resolution_schedule steps;
    # reference uses 2 for real scenes, 0 for synthetic, train.py:14) ---
    num_downscales: int = 0
    resolution_schedule: int = 3000
    # --- densification schedule (Appendix C) ---
    warmup_length: int = 500
    refine_every: int = 100
    stop_split_at: int = 15000
    densify_grad_thresh: float = 0.0008
    densify_size_thresh: float = 0.01
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    reset_alpha_every: int = 30                # x refine_every steps
    n_split_samples: int = 2
    # --- rasterizer knobs (TPU-tuned; see PARITY.md perf notes) ---
    # int (square) or (w, h): 16x8 gives npix = 128 = one TPU lane tile and a
    # smaller per-gaussian footprint (pairwise work ~ (tw+2r)(th+2r))
    tile_size: int | tuple[int, int] = 16
    max_per_tile: int = 256                    # per-tile depth-list capacity
    max_tiles_per_gaussian: int = 16           # footprint cap (span^2 tiles)
    # sorted-entry-stream capacity (0 = off, i.e. N*max_tiles_per_gaussian):
    # downstream row gathers run over this sorted prefix instead of the full
    # padded stream (most of which is conic-culled sentinels). Real entries
    # beyond the cap are dropped (lists.entry_overflow); the trainer grows it
    # like max_per_tile when the probe shows pressure.
    max_total_entries: int = 0
    chunk: int = 32
    # auto -> pallas kernels on TPU, jnp tile path elsewhere (pallas interpret
    # mode on CPU is far slower than the vmapped jnp path)
    impl: str = "auto"                         # auto | jnp | pallas
    # --- 'gauss' mesh-axis strategy (parallel.sharding) ---
    # gather: ZeRO-style — params stay sharded, the 16-float rasterization
    #         table is all-gathered; every device composites the full cloud.
    # slab:   depth-slab compute sharding — the table is all_to_all-exchanged
    #         into per-device depth-quantile slabs; each device composites
    #         only its slab and the per-slab images merge with the
    #         associative over-operator (exact; compositing scales 1/n).
    gauss_shard_mode: str = "gather"           # gather | slab
    slab_slack: float = 2.0                    # slab bucket capacity headroom
    # --- capacity ---
    initial_capacity: int = 0                  # 0 = auto from seed points


class GaussianParams(NamedTuple):
    """Fixed-capacity Gaussian cloud (leading dim = capacity)."""

    means: jax.Array          # (C, 3)
    scales_log: jax.Array     # (C, 3) log-scale
    quats: jax.Array          # (C, 4)
    opacities_logit: jax.Array  # (C,)
    features_dc: jax.Array    # (C, 3) SH degree-0 coefficients
    features_rest: jax.Array  # (C, B-1, 3) higher SH coefficients
    alive: jax.Array          # (C,) float32 0/1 mask (float so jax.grad accepts
                              # the pytree; the optimizer label freezes it)


class ModelParams(NamedTuple):
    gaussians: GaussianParams
    background_logit: jax.Array      # (3,) used when background_color == "auto"
    camera_opt: dict[str, jax.Array]       # train-camera pose deltas
    velocity_opt: dict[str, jax.Array]     # train-camera velocity deltas
    eval_camera_opt: dict[str, jax.Array]  # eval-camera pose deltas
    eval_velocity_opt: dict[str, jax.Array]


def init_model(
    points_xyz: np.ndarray | None,
    points_rgb: np.ndarray | None,
    num_train_cameras: int,
    num_eval_cameras: int,
    config: SplatfactoConfig,
    capacity: int | None = None,
    seed: int = 0,
    scene_scale: float = 1.0,
) -> ModelParams:
    """Seed Gaussians from the sparse point cloud (reference Appendix C)."""
    rng = np.random.default_rng(seed)
    if points_xyz is None or len(points_xyz) == 0:
        points_xyz = rng.uniform(-1.0, 1.0, size=(5000, 3)).astype(np.float32) * scene_scale
        points_rgb = None
    n = points_xyz.shape[0]
    if capacity is None:
        capacity = config.initial_capacity or max(1 << int(np.ceil(np.log2(max(n * 4, 512)))), 512)

    # Initial scale: mean distance to 3 nearest neighbours (splatfacto heuristic).
    sub = points_xyz[rng.choice(n, size=min(n, 2048), replace=False)]
    d2 = ((points_xyz[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    d2.sort(axis=1)
    k = min(4, d2.shape[1])
    nn_dist = np.sqrt(np.maximum(d2[:, 1:k].mean(axis=1), 1e-12))
    nn_dist = np.maximum(nn_dist, 1e-5)
    # Robustness for sparse seed clouds: isolated points would get huge initial
    # splats that wash out the image and drive every opacity to zero — cap at
    # 2x the median neighbour distance (no-op for dense SfM clouds).
    nn_dist = np.minimum(nn_dist, 2.0 * np.median(nn_dist))

    means = np.zeros((capacity, 3), np.float32)
    means[:n] = points_xyz
    scales_log = np.full((capacity, 3), -8.0, np.float32)
    scales_log[:n] = np.log(nn_dist)[:, None]
    quats = np.zeros((capacity, 4), np.float32)
    q = rng.normal(size=(capacity, 4))
    quats[:] = q / np.linalg.norm(q, axis=-1, keepdims=True)
    opac = np.full((capacity,), _logit(0.1), np.float32)
    n_bases = sh.num_sh_bases(config.sh_degree)
    fdc = np.zeros((capacity, 3), np.float32)
    if points_rgb is not None:
        # invert the +0.5 SH-DC shift: dc = (rgb - 0.5) / C0
        fdc[:n] = (points_rgb.astype(np.float32) / 255.0 - 0.5) / 0.28209479177387814
    else:
        fdc[:n] = rng.uniform(-0.5, 0.5, size=(n, 3))
    frest = np.zeros((capacity, n_bases - 1, 3), np.float32)
    alive = np.zeros((capacity,), np.float32)
    alive[:n] = 1.0

    gauss = GaussianParams(
        means=jnp.asarray(means),
        scales_log=jnp.asarray(scales_log),
        quats=jnp.asarray(quats),
        opacities_logit=jnp.asarray(opac),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.asarray(frest),
        alive=jnp.asarray(alive),
    )
    return ModelParams(
        gaussians=gauss,
        background_logit=jnp.zeros((3,), jnp.float32),
        camera_opt=cam_opt.init_camera_opt_params(num_train_cameras, config.camera_optimizer),
        velocity_opt=cam_opt.init_velocity_opt_params(
            num_train_cameras, config.camera_velocity_optimizer
        ),
        eval_camera_opt=cam_opt.init_camera_opt_params(
            num_eval_cameras, config.camera_optimizer
        ) if config.optimize_eval_cameras else {},
        eval_velocity_opt=cam_opt.init_velocity_opt_params(
            num_eval_cameras, config.camera_velocity_optimizer
        ) if config.optimize_eval_cameras else {},
    )


def _logit(p: float) -> float:
    return float(np.log(p / (1 - p)))


def active_sh_degree(config: SplatfactoConfig, step: jax.Array | int) -> jax.Array:
    return jnp.minimum(jnp.asarray(step) // config.sh_degree_interval, config.sh_degree)


def background_color(
    params: ModelParams, config: SplatfactoConfig, key: jax.Array | None = None
) -> jax.Array:
    if config.background_color == "auto":
        return jax.nn.sigmoid(params.background_logit)
    if config.background_color == "white":
        return jnp.ones(3)
    if config.background_color == "random":
        assert key is not None
        return jax.random.uniform(key, (3,))
    return jnp.zeros(3)


def resolve_blur_anchors(config: SplatfactoConfig, cameras: Cameras) -> int:
    """Auto anchor count for fused blur (config.blur_anchors == 0).

    The screen-space velocity warp linearizes the sub-frame pose change; its
    dominant error is rotational. Pick the smallest A whose per-anchor-group
    rotation stays under ~3 deg — calibrated on a synthetic extreme-blur scene
    (12.6 deg/exposure; exact reprojection = 16.8 dB PSNR): 6.3 deg/group
    -> -2.8 dB, 4.2 deg -> -0.9 dB, 2.5 deg -> -0.5 dB. Typical smartphone
    exposures (1-30 ms) rotate < 1 deg, so A resolves to 1 (full fused
    speed) exactly where the fast path is safe."""
    if config.blur_anchors > 0:
        return config.blur_anchors
    if config.blur_mode != "fused" or config.blur_samples <= 1:
        return 1
    omega = np.linalg.norm(np.asarray(cameras.ang_vel), axis=-1)   # (N,)
    window = np.abs(np.asarray(cameras.exposure_time)) + np.abs(
        np.asarray(cameras.rolling_shutter_time)
    )
    max_rot = float(np.max(omega * window)) if omega.size else 0.0
    a = int(np.ceil(max_rot / np.deg2rad(3.0)))
    return int(np.clip(a, 1, config.blur_samples))


def resolve_impl(impl: str) -> str:
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "jnp"
    return impl


def blur_sample_times(camera_exposure: jax.Array, config: SplatfactoConfig) -> jax.Array:
    """epsilon_s: `blur_samples` points spanning [-T_exp/2, +T_exp/2] (App. B.1)."""
    s = max(config.blur_samples, 1)
    if s == 1:
        return jnp.zeros((1,))
    frac = jnp.linspace(-0.5, 0.5, s)
    return frac * camera_exposure


def render_camera(
    params: ModelParams,
    camera: Cameras,
    config: SplatfactoConfig,
    sh_degree_active: int,
    background: jax.Array,
    is_eval_camera: bool = False,
    means2d_probe: jax.Array | None = None,
) -> RenderOutput:
    """Render one camera (leading dim 1) with the full method.

    means2d_probe: optional (C, 2) zeros added to every sub-frame's projected
    means — its cotangent is the accumulated screen-space positional gradient
    the densification strategy consumes (replaces CUDA's xys.grad hook).
    """
    g = params.gaussians
    cam_params = (params.eval_camera_opt, params.eval_velocity_opt) if is_eval_camera else (
        params.camera_opt, params.velocity_opt)
    camera = cam_opt.apply_camera_opt(camera, cam_params[0], config.camera_optimizer)
    vel_cfg = config.camera_velocity_optimizer
    if is_eval_camera and not config.optimize_eval_velocities:
        vel_cfg = dataclasses.replace(vel_cfg, enabled=False)
    camera = cam_opt.apply_velocity_opt(camera, cam_params[1], vel_cfg)

    # Per-gaussian raw quantities. stop_gradient on the alive mask: it is a
    # structural flag, not a differentiable quantity.
    scales = jnp.exp(g.scales_log)
    opac = jax.nn.sigmoid(g.opacities_logit) * jax.lax.stop_gradient(g.alive)
    coeffs = jnp.concatenate([g.features_dc[:, None, :], g.features_rest], axis=1)

    R0, p0 = camera.R_c2w[0], camera.p_c2w[0]
    v = camera.lin_vel[0]
    om = camera.ang_vel[0]
    exposure = camera.exposure_time[0]
    rs_time = jnp.where(
        config.rolling_shutter_compensation, camera.rolling_shutter_time[0], 0.0
    )
    use_motion = config.blur_samples > 0 or config.rolling_shutter_compensation
    if not use_motion:
        v = jnp.zeros(3)
        om = jnp.zeros(3)

    eps = blur_sample_times(exposure, config) if config.blur_samples > 0 else jnp.zeros((1,))

    fx, fy = camera.fx[0], camera.fy[0]
    cx, cy = camera.cx[0], camera.cy[0]
    w, h = camera.width, camera.height

    def subframe_inputs(t_s):
        """Projection + view-dependent colors for the pose at exposure time t_s."""
        Rt, pt = se3.se3_advance_c2w(R0, p0, v, om, t_s)
        R_cw = Rt.T
        t_cw = -jnp.matmul(R_cw, pt, precision=jax.lax.Precision.HIGHEST)
        proj = projection.project_gaussians(
            g.means, scales, g.quats, R_cw, t_cw, fx, fy, cx, cy, w, h,
            lin_vel=v if use_motion else None,
            ang_vel=om if use_motion else None,
        )
        if means2d_probe is not None:
            proj = proj._replace(means2d=proj.means2d + means2d_probe)
        if config.rasterize_mode == "classic":
            proj = proj._replace(compensations=jnp.ones_like(proj.compensations))
        # View-dependent color from the sub-frame camera position.
        dirs = g.means - pt
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        colors = sh_eval_switch(sh_degree_active, config.sh_degree, dirs, coeffs)
        return proj, colors

    def render_subframe(t_s):
        proj, colors = subframe_inputs(t_s)
        return rasterize.rasterize(
            proj, colors, opac, w, h, background,
            rolling_shutter_time=rs_time,
            tile_size=config.tile_size,
            max_per_tile=config.max_per_tile,
            max_tiles_per_gaussian=config.max_tiles_per_gaussian,
            chunk=config.chunk,
            impl=resolve_impl(config.impl),
            max_total_entries=config.max_total_entries,
        )

    if eps.shape[0] == 1:
        outs = jax.tree.map(lambda x: x[None], render_subframe(eps[0]))
    elif config.blur_mode == "fused":
        # TPU fast path: project/bin at A anchor poses spread over the
        # exposure; each anchor's rasterizer call renders its group of
        # sub-frames via the screen-space velocity warp with the per-tile
        # parameter block resident in VMEM. Warp linearization error scales
        # with (exposure/A)^2: A=1 is the cheapest (one binning per frame),
        # A=blur_samples degenerates to exact per-sub-frame reprojection.
        n_s = eps.shape[0]
        n_a = max(min(config.blur_anchors, n_s), 1)
        # contiguous groups of near-equal (static) sizes; any A in [1, S] works
        sizes = [n_s // n_a + (1 if a < n_s % n_a else 0) for a in range(n_a)]
        offsets = [sum(sizes[:a]) for a in range(n_a)]
        mid_global = n_s // 2
        per_anchor, mid_anchor = [], 0
        for a in range(n_a):
            eps_g = jax.lax.dynamic_slice(eps, (offsets[a],), (sizes[a],))
            t_a = eps_g.mean()
            proj, colors = subframe_inputs(t_a)
            in_group = offsets[a] <= mid_global < offsets[a] + sizes[a]
            if in_group:
                mid_anchor = a
            # reduce="mean": the blur average + mid-exposure depth come back
            # directly (the per-sample images are never needed), letting the
            # pallas path skip S-1 tile->image relayouts.
            per_anchor.append(rasterize.rasterize_fused(
                proj, colors, opac, w, h, background,
                eps=eps_g - t_a,
                rolling_shutter_time=rs_time,
                tile_size=config.tile_size,
                max_per_tile=config.max_per_tile,
                max_tiles_per_gaussian=config.max_tiles_per_gaussian,
                chunk=config.chunk,
                impl=resolve_impl(config.impl),
                max_total_entries=config.max_total_entries,
                reduce="mean",
                mid_index=(mid_global - offsets[a]) if in_group else None,
            ))
        # global blur average = group-size-weighted mean of the group means
        rgb = sum(sz * o.rgb for sz, o in zip(sizes, per_anchor)) / n_s
        alpha = sum(sz * o.alpha for sz, o in zip(sizes, per_anchor)) / n_s
        T = sum(sz * o.transmittance for sz, o in zip(sizes, per_anchor)) / n_s
        depth = per_anchor[mid_anchor].depth  # mid-exposure depth
        return RenderOutput(rgb=rgb, alpha=alpha, depth=depth, transmittance=T)
    else:
        # Exact per-sub-frame reprojection (reference semantics). lax.map
        # compiles the sub-frame body ONCE (vmap would inline S copies of the
        # projection/sort/rasterize graph — measured ~5x compile time for
        # blur_samples=5 with no runtime win: each sub-frame is already
        # chip-filling work).
        outs = jax.lax.map(render_subframe, eps)
    rgb = outs.rgb.mean(axis=0)
    alpha = outs.alpha.mean(axis=0)
    depth = outs.depth[outs.depth.shape[0] // 2]  # mid-exposure depth
    T = outs.transmittance.mean(axis=0)
    return RenderOutput(rgb=rgb, alpha=alpha, depth=depth, transmittance=T)


def binning_counts(
    params: ModelParams, camera: Cameras, config: SplatfactoConfig
) -> jax.Array:
    """UNCLAMPED per-tile depth-list populations at the mid-exposure pose —
    the adaptive tile-capacity probe (ops.tiling.tile_population). Mirrors
    render_camera's binning exactly (camera/velocity optimizers applied, same
    motion radius_pad and conic cull) so `counts > config.max_per_tile` is
    precisely the overflow the next train step's rasterizer would drop. The
    trainer runs this at refine boundaries and grows max_per_tile (recompile,
    like capacity growth) when overflow persists — gsplat's per-tile lists are
    unbounded (SURVEY.md §2c #3), so a static cap must adapt to match."""
    g = params.gaussians
    camera = cam_opt.apply_camera_opt(camera, params.camera_opt, config.camera_optimizer)
    camera = cam_opt.apply_velocity_opt(
        camera, params.velocity_opt, config.camera_velocity_optimizer
    )
    scales = jnp.exp(g.scales_log)
    opac = jax.nn.sigmoid(g.opacities_logit) * g.alive
    R0, p0 = camera.R_c2w[0], camera.p_c2w[0]
    v, om = camera.lin_vel[0], camera.ang_vel[0]
    rs = jnp.where(
        config.rolling_shutter_compensation, camera.rolling_shutter_time[0], 0.0
    )
    use_motion = config.blur_samples > 0 or config.rolling_shutter_compensation
    eps = (blur_sample_times(camera.exposure_time[0], config)
           if config.blur_samples > 0 else jnp.zeros((1,)))
    R_cw = R0.T
    t_cw = -jnp.matmul(R_cw, p0, precision=jax.lax.Precision.HIGHEST)
    proj = projection.project_gaussians(
        g.means, scales, g.quats, R_cw, t_cw,
        camera.fx[0], camera.fy[0], camera.cx[0], camera.cy[0],
        camera.width, camera.height,
        lin_vel=v if use_motion else None,
        ang_vel=om if use_motion else None,
    )
    comp = (jnp.ones_like(proj.compensations)
            if config.rasterize_mode == "classic" else proj.compensations)
    t_max = jnp.max(jnp.abs(eps)) + 0.5 * jnp.abs(rs)
    radius_pad = jnp.abs(proj.pix_vels) * t_max  # per-axis motion box
    op_eff = opac * comp * proj.valid.astype(opac.dtype)
    return tiling.tile_population(
        proj.means2d, proj.extents, proj.depths, proj.valid,
        camera.width, camera.height, config.tile_size,
        config.max_tiles_per_gaussian,
        radius_pad=radius_pad, conics=proj.conics, opacities=op_eff,
    )


def sh_eval_switch(
    degree_active: jax.Array | int, max_degree: int, dirs: jax.Array, coeffs: jax.Array
) -> jax.Array:
    """SH eval with a *traced* active degree: evaluate the full basis and mask
    the inactive bands (static shapes; the masked FLOPs are negligible)."""
    basis = sh.eval_sh_basis(max_degree, dirs)  # (N, B)
    bands = jnp.asarray(
        [int(np.floor(np.sqrt(i))) for i in range(basis.shape[-1])], dtype=jnp.int32
    )
    mask = bands <= jnp.asarray(degree_active)
    out = jnp.einsum("nk,nkc->nc", basis * mask[None, :], coeffs,
                     precision=jax.lax.Precision.HIGHEST)  # bf16 default would
    # round view-dependent colors by ~0.4% on TPU (cf. the SSIM precision bug)
    return jnp.maximum(out + 0.5, 0.0)


def gamma_encode(linear_rgb: jax.Array, config: SplatfactoConfig) -> jax.Array:
    """C_out = clip(mean_linear)^(1/gamma) (Appendix B.4); gamma==1 is identity."""
    if config.gamma == 1.0:
        return linear_rgb
    return jnp.clip(linear_rgb, 1e-6, 1.0) ** (1.0 / config.gamma)


def apply_black_level(img: jax.Array, config: SplatfactoConfig) -> jax.Array:
    """min-rgb-level floor: renders/GT are compared above the black level
    (Appendix B.4 — exact fork placement is internal; we floor both sides)."""
    m = config.min_rgb_level / 255.0
    if m <= 0:
        return img
    return jnp.maximum(img, m)


def compute_losses(
    pred_rgb: jax.Array,
    gt_rgb: jax.Array,
    params: ModelParams,
    config: SplatfactoConfig,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """(1-l)*L1 + l*(1-SSIM) + scale regularization + camera-opt penalty."""
    from ..ops.ssim import ssim as ssim_fn

    pred = apply_black_level(pred_rgb, config)
    gt = apply_black_level(gt_rgb, config)
    l1 = jnp.abs(pred - gt).mean()
    ssim_val = ssim_fn(pred, gt)
    loss = (1.0 - config.ssim_lambda) * l1 + config.ssim_lambda * (1.0 - ssim_val)

    aux = {"l1": l1, "ssim": ssim_val}
    if config.use_scale_regularization:
        g = params.gaussians
        s = jnp.exp(g.scales_log)
        ratio = s.max(axis=-1) / jnp.maximum(s.min(axis=-1), 1e-12)
        excess = jnp.maximum(ratio, config.max_gauss_ratio) - config.max_gauss_ratio
        alive = jax.lax.stop_gradient(g.alive)
        n_alive = jnp.maximum(alive.sum(), 1.0)
        scale_reg = config.scale_reg_weight * ((excess * alive).sum() / n_alive)
        loss = loss + scale_reg
        aux["scale_reg"] = scale_reg
    pen = cam_opt.camera_opt_penalty(params.camera_opt, config.camera_optimizer)
    loss = loss + pen
    aux["camera_opt_penalty"] = pen
    aux["loss"] = loss
    return loss, aux
