"""Training loop — the lean TPU-native replacement for nerfstudio's Trainer.

Covers SURVEY.md §3.1's hot loop without the nerfstudio framework: per-step
(camera, full image) sampling, jitted fused render+loss+grads+optimizer update,
densify/cull on schedule (functional, static capacity, growth-by-doubling with
recompile at refine boundaries only), per-group Adam with splatfacto 1.1.0
learning rates (Appendix C), optional eval-camera pose/velocity optimization
that never backprops into the scene (reference `--optimize-eval-cameras`,
README.md:197), orbax checkpoints + a config manifest mirroring the reference's
output-directory contract (SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cameras.cameras import Cameras
from ..data import dataparser as dp
from ..data import dataset as ds
from ..models import splatfacto as sf
from ..models import strategy as st
from ..ops.ssim import psnr as psnr_fn
from ..ops.ssim import ssim as ssim_fn


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_steps: int = 20000             # reference train.py:129-132 (3000 draft)
    seed: int = 42
    # per-group LRs (splatfacto 1.1.0, Appendix C)
    lr_means: float = 1.6e-4
    lr_means_final: float = 1.6e-6
    lr_features_dc: float = 2.5e-3
    lr_features_rest: float = 1.25e-4
    lr_opacities: float = 5e-2
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_background: float = 5e-3
    lr_camera_opt: float = 6e-4
    lr_camera_opt_final: float = 6e-5
    lr_velocity_opt: float = 1e-3
    lr_velocity_opt_final: float = 1e-4
    # schedule
    eval_opt_every: int = 5            # eval-camera opt step cadence
    grow_threshold: float = 0.9        # grow capacity when alive fraction exceeds
    max_capacity: int = 1 << 21
    checkpoint_every: int = 5000
    log_every: int = 100
    # host<->device sync cadence: block on results only every k steps so step
    # dispatch pipelines (a per-step sync costs a full host round-trip — ~50 ms
    # over this box's TPU tunnel; step_ms percentiles aggregate whole windows)
    sync_every: int = 10
    # >1: run this many consecutive steps per device dispatch via lax.scan
    # (make_train_scan) — amortizes host dispatch latency; numerically
    # identical step sequence. Blocks shrink to 1 around refine/eval-opt/
    # resolution boundaries.
    scan_steps: int = 1
    # buffer donation in the train step; fit.py disables it for --vis viewer
    # (a concurrent reader must not see donated-away params)
    donate_buffers: bool = True
    # Adaptive per-tile depth-list capacity: at refine boundaries, probe the
    # UNCLAMPED per-tile populations (sf.binning_counts) on the last trained
    # camera; when the dropped-entry fraction exceeds tile_overflow_tol on two
    # consecutive probes, double model.max_per_tile (recompile — same cost
    # class as capacity growth) up to max_tile_capacity. gsplat's per-tile
    # lists are unbounded (SURVEY §2c #3); a static cap must adapt to match.
    adapt_tile_capacity: bool = True
    tile_overflow_tol: float = 0.002   # fraction of total entries dropped
    max_tile_capacity: int = 2048


def param_labels(params: sf.ModelParams) -> Any:
    g_labels = sf.GaussianParams(
        means="means", scales_log="scales", quats="quats",
        opacities_logit="opacities", features_dc="features_dc",
        features_rest="features_rest", alive="frozen",
    )
    lbl = lambda d, name: {k: name for k in d}
    return sf.ModelParams(
        gaussians=g_labels,
        background_logit="background",
        camera_opt=lbl(params.camera_opt, "camera_opt"),
        velocity_opt=lbl(params.velocity_opt, "velocity_opt"),
        eval_camera_opt=lbl(params.eval_camera_opt, "eval_camera_opt"),
        eval_velocity_opt=lbl(params.eval_velocity_opt, "eval_velocity_opt"),
    )


def build_optimizer(params: sf.ModelParams, tc: TrainerConfig) -> optax.GradientTransformation:
    exp = lambda init, final: optax.exponential_decay(
        init, transition_steps=tc.max_steps, decay_rate=final / init
    )
    adam = lambda lr: optax.adam(lr, eps=1e-15)
    txs = {
        "means": optax.adam(exp(tc.lr_means, tc.lr_means_final), eps=1e-15),
        "features_dc": adam(tc.lr_features_dc),
        "features_rest": adam(tc.lr_features_rest),
        "opacities": adam(tc.lr_opacities),
        "scales": adam(tc.lr_scales),
        "quats": adam(tc.lr_quats),
        "background": adam(tc.lr_background),
        "camera_opt": optax.adam(exp(tc.lr_camera_opt, tc.lr_camera_opt_final), eps=1e-15),
        "velocity_opt": optax.adam(
            exp(tc.lr_velocity_opt, tc.lr_velocity_opt_final), eps=1e-15
        ),
        "eval_camera_opt": optax.adam(exp(tc.lr_camera_opt, tc.lr_camera_opt_final), eps=1e-15),
        "eval_velocity_opt": optax.adam(
            exp(tc.lr_velocity_opt, tc.lr_velocity_opt_final), eps=1e-15
        ),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(txs, param_labels(params))


def _train_step_body(config, optimizer, params, opt_state, strat_state,
                     camera, gt, step, key):
    """One training step: render -> loss -> grads -> update -> densify stats."""
    sh_deg = sf.active_sh_degree(config, step)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])

    def loss_fn(p, probe):
        # background from the DIFFERENTIATED params — computing it outside
        # would silently freeze the learnable background (auto mode)
        bg = sf.background_color(p, config, key)
        out = sf.render_camera(
            p, camera, config, sh_deg, bg, means2d_probe=probe
        )
        pred = sf.gamma_encode(out.rgb, config)
        loss, aux = sf.compute_losses(pred, gt, p, config)
        return loss, aux

    (loss, aux), (grads, probe_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, probe)

    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    visible = jnp.linalg.norm(probe_grad, axis=-1) > 0
    strat_state = st.accumulate_grads(
        strat_state, probe_grad, visible, camera.width, camera.height
    )
    aux = dict(aux)
    aux["n_visible"] = visible.sum()
    return params, opt_state, strat_state, loss, aux


def make_train_step(
    config: sf.SplatfactoConfig, optimizer: optax.GradientTransformation,
    donate: bool = True,
):
    """Jitted: render -> loss -> grads -> optimizer update -> grad accumulation.

    donate=False keeps input buffers alive (needed when another thread reads
    trainer.params concurrently, e.g. the live viewer — donated buffers are
    invalidated the moment the next step is dispatched)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def train_step(params, opt_state, strat_state, camera, gt, step, key):
        return _train_step_body(
            config, optimizer, params, opt_state, strat_state, camera, gt,
            step, key,
        )

    return train_step


def make_train_scan(
    config: sf.SplatfactoConfig, optimizer: optax.GradientTransformation,
    donate: bool = True,
):
    """Jitted MULTI-STEP driver: a lax.scan over B consecutive train steps.

    One dispatch per block instead of per step — host dispatch latency (tens
    of ms on remote-tunnel setups, ~0.1 ms even locally) and per-step Python
    overhead amortize across the block, and XLA overlaps the next step's
    host-independent work with the previous one. Steps inside a block are
    numerically IDENTICAL to the one-at-a-time path (same per-step cameras,
    keys and schedule steps, threaded through scan xs).

    cameras arrives as a stacked Cameras pytree (leading axis B), gts as
    (B, H, W, 3), steps/keys as (B, ...). Returns stacked per-step losses and
    n_visible plus the final states.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def train_scan(params, opt_state, strat_state, cameras, gts, steps, keys):
        def body(carry, xs):
            params, opt_state, strat_state = carry
            cam, gt, step, key = xs
            params, opt_state, strat_state, loss, aux = _train_step_body(
                config, optimizer, params, opt_state, strat_state, cam, gt,
                step, key,
            )
            return (params, opt_state, strat_state), (loss, aux["n_visible"])

        (params, opt_state, strat_state), (losses, n_vis) = jax.lax.scan(
            body, (params, opt_state, strat_state), (cameras, gts, steps, keys)
        )
        return params, opt_state, strat_state, losses, n_vis

    return train_scan


def make_eval_opt_step(
    config: sf.SplatfactoConfig, eval_optimizer: optax.GradientTransformation
):
    """Optimize eval-camera pose/velocity params WITHOUT touching the scene
    (stop_gradient on everything else) — reference `--optimize-eval-cameras`."""

    @functools.partial(jax.jit, donate_argnums=(1,))
    def eval_opt_step(params, eval_opt_state, camera, gt, step, key):
        bg = sf.background_color(params, config, key)
        sh_deg = sf.active_sh_degree(config, step)

        def loss_fn(eval_cam, eval_vel):
            frozen = jax.tree.map(jax.lax.stop_gradient, params)
            p = frozen._replace(eval_camera_opt=eval_cam, eval_velocity_opt=eval_vel)
            out = sf.render_camera(p, camera, config, sh_deg, bg, is_eval_camera=True)
            pred = sf.gamma_encode(out.rgb, config)
            loss, _ = sf.compute_losses(pred, gt, p, config)
            return loss

        grads = jax.grad(loss_fn, argnums=(0, 1))(
            params.eval_camera_opt, params.eval_velocity_opt
        )
        gc, gv = grads
        updates, eval_opt_state = eval_optimizer.update(
            {"cam": gc, "vel": gv}, eval_opt_state,
            {"cam": params.eval_camera_opt, "vel": params.eval_velocity_opt},
        )
        new = optax.apply_updates(
            {"cam": params.eval_camera_opt, "vel": params.eval_velocity_opt}, updates
        )
        params = params._replace(eval_camera_opt=new["cam"], eval_velocity_opt=new["vel"])
        return params, eval_opt_state

    return eval_opt_step


def grow_opt_state(opt_state, old_capacity: int, new_capacity: int):
    """Pad per-Gaussian optimizer-state leaves (Adam moments) to the new
    capacity with zeros — preserving existing moments AND schedule counts
    (re-initializing the whole state would reset the LR decay)."""
    pad = new_capacity - old_capacity

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == old_capacity:
            widths = [(0, pad)] + [(0, 0)] * (leaf.ndim - 1)
            return jnp.pad(leaf, widths)
        return leaf

    return jax.tree.map(fix, opt_state)


def zero_gaussian_opt_slots(opt_state, changed: jax.Array, capacity: int):
    """Zero Adam moments at refreshed gaussian slots (splatfacto resets opt
    state for dup/split params). Applies to every opt-state leaf whose leading
    dim equals the gaussian capacity."""

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            mask = changed.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(fix, opt_state)


@dataclasses.dataclass
class Trainer:
    scene: dp.ParsedScene
    model_config: sf.SplatfactoConfig
    trainer_config: TrainerConfig = TrainerConfig()
    output_dir: Path | None = None
    # jax.sharding.Mesh with axes (data, gauss, blur, tile) — or None for the
    # single-device path. Built by parallel.sharding.resolve_mesh from the
    # CLI's --mesh.* flags (reference is single-GPU, SURVEY.md §2d; the mesh
    # runs ITS per-run loop, train.py:111-201, across chips).
    mesh: Any = None

    def __post_init__(self):
        from ..utils.env import enable_compilation_cache

        enable_compilation_cache()
        self.train_images, self.eval_images = ds.load_scene_images(self.scene)
        cfg, tc = self.model_config, self.trainer_config
        self.params = sf.init_model(
            self.scene.points_xyz, self.scene.points_rgb,
            len(self.scene.train_cameras), len(self.scene.eval_cameras),
            cfg, seed=tc.seed,
        )
        # Route per-camera params by position within the split (cam_idx must be
        # local to the split's parameter tables).
        self.train_cams = self._localize(self.scene.train_cameras)
        self.eval_cams = self._localize(self.scene.eval_cameras)

        if cfg.blur_anchors == 0:
            cfg = dataclasses.replace(
                cfg, blur_anchors=sf.resolve_blur_anchors(cfg, self.train_cams)
            )
            self.model_config = cfg

        self.optimizer = build_optimizer(self.params, tc)
        self.opt_state = self.optimizer.init(self.params)
        self.strat_state = st.init_strategy_state(
            self.params.gaussians.alive.shape[0], tc.seed
        )
        if self.mesh is not None:
            from ..parallel import sharding as sh_mod

            self._sharding = sh_mod
            self.data_batch = self.mesh.shape.get("data", 1)
            n_gauss = self.mesh.shape.get("gauss", 1)
            cap = self.params.gaussians.alive.shape[0]
            assert cap % max(n_gauss, 1) == 0, (
                f"gaussian capacity {cap} must divide the gauss axis {n_gauss}"
            )
            self.params, self.opt_state, self.strat_state = sh_mod.place_train_state(
                self.mesh, self.params, self.opt_state, self.strat_state
            )
        else:
            self._sharding = None
            self.data_batch = 1
        if cfg.optimize_eval_cameras and self.params.eval_camera_opt:
            self.eval_optimizer = optax.adam(tc.lr_camera_opt, eps=1e-15)
            self.eval_opt_state = self.eval_optimizer.init(
                {"cam": self.params.eval_camera_opt, "vel": self.params.eval_velocity_opt}
            )
        else:
            self.eval_opt_state = None
        self._build_step_fns()
        self.key = jax.random.PRNGKey(tc.seed)
        self.step = 0
        self._last_reset_step = -(10**9)
        self.history: list[dict] = []
        from ..utils.profiling import StepTimer

        self.timer = StepTimer()
        # per-signature dispatch durations: sig -> list of (seconds, steps).
        # First call of a signature includes trace+compile; the excess over
        # the steady-state median is the compile-cost estimate that
        # compile_overhead_seconds() reports (VERDICT r2: the benchmark
        # `time` column must separate compile from training wall clock —
        # reference wall_clock_time_seconds is training-only, train.py:192-196)
        self._dispatch_stats: dict = {}

    def _record_dispatch(self, sig, seconds: float, steps: int):
        self._dispatch_stats.setdefault(sig, []).append((seconds, steps))

    def compile_overhead_seconds(self) -> float:
        """Estimated seconds spent compiling step programs (train scan/step,
        refine): per dispatch signature, the first call's excess over the
        median of its later calls; single-call signatures fall back to the
        steady per-step rate of the best-sampled signature of the same kind."""
        per_step_rate = {}
        for sig, calls in self._dispatch_stats.items():
            if len(calls) >= 2:
                rest = float(np.median([s for s, _ in calls[1:]]))
                steps = calls[1][1]
                if steps > 0 and rest > 0:
                    kind = sig[0]
                    n = sum(len(c) for k, c in self._dispatch_stats.items()
                            if k[0] == kind)
                    per_step_rate.setdefault(kind, (0, 0.0))
                    if n >= per_step_rate[kind][0]:
                        per_step_rate[kind] = (n, rest / steps)
        total = 0.0
        for sig, calls in self._dispatch_stats.items():
            if len(calls) >= 2:
                rest = float(np.median([s for s, _ in calls[1:]]))
                total += max(0.0, calls[0][0] - rest)
            else:
                kind, (t0, steps) = sig[0], calls[0]
                rate = per_step_rate.get(kind, (0, None))[1]
                if rate is not None and steps > 0:
                    total += max(0.0, t0 - steps * rate)
        return total

    def _build_step_fns(self):
        """(Re)build every jitted function that closes over model_config —
        called at init and again whenever the config changes mid-run (adaptive
        tile capacity). Optimizer/strategy STATE is untouched: only the traced
        programs are refreshed."""
        # monotone rebuild counter keys dispatch stats: id(fn) can be reused
        # by CPython after a rebuild frees the old closure, which would merge
        # two distinct compiled programs' stats (skewing the compile split)
        self._rebuild_count = getattr(self, "_rebuild_count", -1) + 1
        cfg, tc = self.model_config, self.trainer_config
        if self.mesh is not None:
            sh_mod = self._sharding
            self.train_step = sh_mod.make_sharded_train_step(
                cfg, self.mesh, self.optimizer, donate=tc.donate_buffers
            )
            self.train_scan = (
                sh_mod.make_sharded_train_scan(
                    cfg, self.mesh, self.optimizer, donate=tc.donate_buffers
                )
                if tc.scan_steps > 1 else None
            )
        else:
            self.train_step = make_train_step(cfg, self.optimizer, donate=tc.donate_buffers)
            self.train_scan = (
                make_train_scan(cfg, self.optimizer, donate=tc.donate_buffers)
                if tc.scan_steps > 1 else None
            )
        self.refine = st.make_refine(cfg)
        self.reset_opacity = st.make_reset_opacity(cfg)
        if self.eval_opt_state is not None:
            if self.mesh is not None:
                self.eval_opt_step = self._sharding.make_sharded_eval_opt_step(
                    cfg, self.mesh, self.eval_optimizer
                )
            else:
                self.eval_opt_step = make_eval_opt_step(cfg, self.eval_optimizer)
        self._eval_render_fn = None

    # ------------------------------------------- adaptive tile capacity
    def _binning_probe_fn(self):
        """Jitted unclamped per-tile population probe. The closure captures
        model_config but is intentionally NOT rebuilt on max_per_tile bumps:
        binning_counts does not depend on max_per_tile, so the cached trace
        stays valid across them."""
        if getattr(self, "_binning_probe", None) is None:
            cfg = self.model_config

            @jax.jit
            def probe(params, camera):
                return sf.binning_counts(params, camera, cfg)

            self._binning_probe = probe
        return self._binning_probe

    def _maybe_adapt_tile_capacity(self) -> bool:
        """Grow max_per_tile (x2, recompile) when the probe shows the binning
        persistently dropping more than tile_overflow_tol of its entries —
        the dense-scene saturation mode of BASELINE.md's scaling study."""
        tc, cfg = self.trainer_config, self.model_config
        cam = getattr(self, "_probe_cam", None)
        if not tc.adapt_tile_capacity or cam is None:
            return False
        counts = np.asarray(self._binning_probe_fn()(self.params, cam))
        total = max(int(counts.sum()), 1)
        over = int(np.maximum(counts - cfg.max_per_tile, 0).sum())
        # surfaced in training logs/history: a silently binding cap is the
        # failure mode this probe exists to prevent
        self._tile_overflow_frac = over / total

        # sorted-entry-stream capacity (max_total_entries): grow BEFORE it
        # saturates — unlike max_per_tile overflow (drops the deepest,
        # most-occluded entries) the stream cap drops whole high-tile-id
        # segments, so it must never actually bind. Grow at 80% pressure.
        # Runs BEFORE the max_per_tile ceiling early-return below: the stream
        # cap is independent of per-tile capacity and must keep adapting even
        # once max_per_tile is pinned at its ceiling.
        grew_stream = False
        if cfg.max_total_entries > 0:
            landed = int(np.minimum(counts, cfg.max_per_tile).sum())
            self._entry_stream_pressure = landed / cfg.max_total_entries
            if landed > 0.8 * cfg.max_total_entries:
                new_cap = cfg.max_total_entries
                while landed > 0.8 * new_cap:
                    new_cap *= 2
                cfg = dataclasses.replace(cfg, max_total_entries=new_cap)
                self.model_config = cfg
                grew_stream = True

        if cfg.max_per_tile >= tc.max_tile_capacity:
            if grew_stream:
                self._build_step_fns()
            return grew_stream

        if over <= tc.tile_overflow_tol * total:
            self._overflow_streak = 0
            if grew_stream:
                self._build_step_fns()
            return grew_stream
        self._overflow_streak = getattr(self, "_overflow_streak", 0) + 1
        if self._overflow_streak < 2:
            if grew_stream:
                self._build_step_fns()
            return grew_stream
        need = int(counts.max())
        new_k = cfg.max_per_tile
        while new_k < need and new_k < tc.max_tile_capacity:
            new_k *= 2
        new_k = min(new_k, tc.max_tile_capacity)
        if new_k == cfg.max_per_tile:
            if grew_stream:
                self._build_step_fns()
            return grew_stream
        self.model_config = dataclasses.replace(cfg, max_per_tile=new_k)
        self._overflow_streak = 0
        self._build_step_fns()
        return True

    @staticmethod
    def _localize(cams: Cameras) -> Cameras:
        leaves, aux = cams.tree_flatten()
        d = dict(zip(Cameras._leaf_names, leaves))
        d["cam_idx"] = jnp.arange(len(cams), dtype=jnp.int32)
        return Cameras(width=aux[0], height=aux[1], **d)

    # ---------------------------------------------- progressive resolution
    def _resolution_level(self) -> int:
        cfg = self.model_config
        if cfg.num_downscales <= 0:
            return 0
        return max(0, cfg.num_downscales - self.step // cfg.resolution_schedule)

    # keep the training image stack DEVICE-resident up to this many bytes:
    # per-block host->device GT upload over this box's TPU tunnel measured
    # ~tens of ms/step at 512px; an on-device stack turns the per-step GT
    # fetch into a device-side gather (indices are the only upload)
    _DEVICE_IMAGE_BYTES = 4 << 30

    def _level_data(self, level: int):
        """(cameras, images) for resolution level (downscale 2^level), cached.
        Images come back as a device-resident jnp array when the stack fits
        the budget (numpy fallback above it)."""
        if level == 0:
            if not hasattr(self, "_train_imgs_dev"):
                imgs = self.train_images.images
                self._train_imgs_dev = (
                    jnp.asarray(imgs) if imgs.nbytes <= self._DEVICE_IMAGE_BYTES
                    else imgs
                )
            return self.train_cams, self._train_imgs_dev
        if not hasattr(self, "_pyramid"):
            self._pyramid = {}
        if level not in self._pyramid:
            d = 1 << level
            imgs = self.train_images.images
            h = imgs.shape[1] // d * d
            w = imgs.shape[2] // d * d
            small = imgs[:, :h, :w].reshape(
                imgs.shape[0], h // d, d, w // d, d, 3
            ).mean(axis=(2, 4))
            cams = self.train_cams
            leaves, aux = cams.tree_flatten()
            dd = dict(zip(Cameras._leaf_names, leaves))
            for k in ("fx", "fy", "cx", "cy"):
                dd[k] = dd[k] / d
            small_cams = Cameras(width=aux[0] // d, height=aux[1] // d, **dd)
            if small.nbytes <= self._DEVICE_IMAGE_BYTES:
                small = jnp.asarray(small)
            self._pyramid[level] = (small_cams, small)
        return self._pyramid[level]

    def _maybe_grow(self):
        g = self.params.gaussians
        cap = g.alive.shape[0]
        frac = float(g.alive.sum()) / cap
        tc = self.trainer_config
        if frac > tc.grow_threshold and cap < tc.max_capacity:
            new_cap = min(cap * 2, tc.max_capacity)
            self.params = self.params._replace(gaussians=st.grow_capacity(g, new_cap))
            # pad (not re-init): keeps Adam moments and LR-schedule counts.
            # Strategy state is padded too — its accumulators are zero here
            # anyway (refine just consumed them), but a re-init would also
            # rewind the split-sampling PRNG key to the initial seed at every
            # growth, correlating split directions across the run.
            self.opt_state = grow_opt_state(self.opt_state, cap, new_cap)
            self.strat_state = st.grow_strategy_state(self.strat_state, new_cap)
            return True
        return False

    def _scan_block_size(self, remaining: int) -> int:
        """Largest step count runnable as ONE lax.scan dispatch from here:
        capped by scan_steps and the next host-side event (refine, eval-cam
        optimization, progressive-resolution change)."""
        cfg, tc = self.model_config, self.trainer_config
        s = self.step
        b = min(tc.scan_steps, remaining)
        b = min(b, cfg.refine_every - (s % cfg.refine_every))
        if self.eval_opt_state is not None and len(self.eval_cams) > 0:
            d = (-s) % tc.eval_opt_every
            b = min(b, d if d > 0 else 1)
        if cfg.num_downscales > 0:
            b = min(b, cfg.resolution_schedule - (s % cfg.resolution_schedule))
        return max(1, b)

    def _next_camera_index(self, n_train: int) -> int:
        """Shuffled epoch order; consumes the SAME key sequence on both the
        per-step and the scan paths so they train identically."""
        i = self.step % n_train
        if i == 0 or self._order is None:
            self.key, k = jax.random.split(self.key)
            self._order = np.asarray(jax.random.permutation(k, n_train))
        return int(self._order[i])

    def _next_camera_indices(self, n_train: int, count: int) -> list[int]:
        """Batch sampling for the mesh 'data' axis: `count` consecutive draws
        from the shuffled epoch order (cursor advances per CAMERA, not per
        step, so resumes and the scan driver stay sequence-consistent)."""
        out = []
        for _ in range(count):
            i = self._cam_cursor % n_train
            if i == 0 or self._order is None:
                self.key, k = jax.random.split(self.key)
                self._order = np.asarray(jax.random.permutation(k, n_train))
            out.append(int(self._order[i]))
            self._cam_cursor += 1
        return out

    def run(self, max_steps: int | None = None, progress_cb: Callable | None = None):
        cfg, tc = self.model_config, self.trainer_config
        n_train = len(self.train_cams)
        steps = max_steps if max_steps is not None else tc.max_steps
        # Preserve the sampling stream across run() chunks and checkpoint
        # resume: re-drawing the epoch permutation at every chunk start would
        # make chunked/resumed training diverge from an uninterrupted run.
        self._order = getattr(self, "_order", None)
        if not hasattr(self, "_cam_cursor"):
            self._cam_cursor = self.step * self.data_batch
        t0 = time.time()
        it = 0
        while it < steps:
            level = self._resolution_level()
            level_cams, level_imgs = self._level_data(level)
            block = self._scan_block_size(steps - it)
            if self.train_scan is not None and block == tc.scan_steps > 1:
                # multi-step dispatch: scan over the next `block` steps
                keys = []
                if self.mesh is None:
                    idxs = []
                    for b in range(block):
                        # replicate the single-step sampling exactly
                        i = (self.step + b) % n_train
                        if i == 0 or self._order is None:
                            self.key, k = jax.random.split(self.key)
                            self._order = np.asarray(jax.random.permutation(k, n_train))
                        idxs.append(int(self._order[i]))
                        self.key, k = jax.random.split(self.key)
                        keys.append(k)
                    arr = np.asarray(idxs)
                    cams_b = level_cams[arr[:, None]]    # leaves (B, 1, ...)
                    gts_b = jnp.asarray(level_imgs[arr])
                else:
                    # mesh path: per step, d camera draws then the step key —
                    # the same stream the per-step sharded driver consumes
                    rows = []
                    for b in range(block):
                        rows.append(self._next_camera_indices(n_train, self.data_batch))
                        self.key, k = jax.random.split(self.key)
                        keys.append(k)
                    arr = np.asarray(rows)               # (B, d)
                    cams_b = level_cams[arr]             # leaves (B, d, ...)
                    gts_b = jnp.asarray(level_imgs[arr])  # (B, d, H, W, 3)
                steps_b = jnp.arange(self.step, self.step + block)
                keys_b = jnp.stack(keys)
                # last step's camera(s) for the tile-capacity probe — index
                # level_cams fresh (cams_b[-1] would nest the leading dim)
                if self.mesh is None:
                    self._probe_cam = level_cams[idxs[-1]]
                else:
                    self._probe_cam = level_cams[np.asarray(rows[-1])]
                self.timer.start()
                (self.params, self.opt_state, self.strat_state, losses, _nv) = (
                    self.train_scan(
                        self.params, self.opt_state, self.strat_state,
                        cams_b, gts_b, steps_b, keys_b,
                    )
                )
                jax.block_until_ready(losses)
                self.timer.stop()
                # spread the block wall time over its steps for the summary
                bt = self.timer.times.pop()
                cap = self.params.gaussians.alive.shape[0]
                self._record_dispatch(
                    ("scan", self._rebuild_count, level, block, cap), bt, block
                )
                self.timer.times.extend([bt / block] * block)
                loss = losses[-1]
                for b in range(block - 1):
                    if (self.step + b + 1) % tc.log_every == 0:
                        self.history.append({
                            "step": self.step + b + 1,
                            "loss": float(losses[b]),
                            "n_alive": int(self.params.gaussians.alive.sum()),
                            "wall_s": time.time() - t0,
                            **self.timer.summary(last_n=tc.log_every),
                        })
                self.step += block - 1   # final increment below, shared path
                it += block - 1
            else:
                if self.mesh is None:
                    ci = self._next_camera_index(n_train)
                    cam = level_cams[ci]
                    gt = jnp.asarray(level_imgs[ci])
                else:
                    arr = np.asarray(
                        self._next_camera_indices(n_train, self.data_batch)
                    )
                    cam = level_cams[arr]                # leaves (d, ...)
                    gt = jnp.asarray(level_imgs[arr])    # (d, H, W, 3)
                self._probe_cam = cam
                self.key, k = jax.random.split(self.key)
                self.timer.start()
                (self.params, self.opt_state, self.strat_state, loss, aux) = self.train_step(
                    self.params, self.opt_state, self.strat_state, cam, gt,
                    jnp.asarray(self.step), k,
                )
                if (
                    (self.step + 1) % tc.sync_every == 0
                    or it + 1 == steps  # end of this run() chunk, not global step
                    or (self.step + 1) % cfg.refine_every == 0
                ):
                    jax.block_until_ready(loss)
                self.timer.stop()
                self._record_dispatch(
                    ("step", self._rebuild_count, level,
                     self.params.gaussians.alive.shape[0]),
                    self.timer.times[-1], 1,
                )

            # eval-camera optimization (scene frozen)
            if (
                self.eval_opt_state is not None
                and self.step % tc.eval_opt_every == 0
                and len(self.eval_cams) > 0
            ):
                n_eval = len(self.eval_cams)
                d = self.data_batch
                ei = ((self.step // tc.eval_opt_every) * d) % n_eval
                if self.mesh is None:
                    ecam = self.eval_cams[ei]
                    egt = jnp.asarray(self.eval_images.images[ei])
                else:
                    eis = np.asarray([(ei + j) % n_eval for j in range(d)])
                    ecam = self.eval_cams[eis]
                    egt = jnp.asarray(self.eval_images.images[eis])
                self.key, k = jax.random.split(self.key)
                self.params, self.eval_opt_state = self.eval_opt_step(
                    self.params, self.eval_opt_state, ecam, egt, jnp.asarray(self.step), k
                )

            self.step += 1

            # refinement schedule. Refine PAUSES after each opacity reset
            # (until every train view has been revisited, splatfacto 1.1.0's
            # `step % reset_interval > num_train_data + refine_every` guard)
            # so freshly-reset opacities are not judged before re-settling.
            reset_pause = len(self.train_cams) + cfg.refine_every
            if (
                self.step % cfg.refine_every == 0
                and cfg.warmup_length <= self.step
                and self.step - self._last_reset_step > reset_pause
            ):
                self.params = self.params._replace(
                    gaussians=self._refine_gaussians()
                )
                if self._maybe_grow():
                    pass  # opt/strategy state padded to the new capacity
                    # (Adam moments and the split-PRNG key are carried over
                    # via grow_opt_state/grow_strategy_state, not re-init)
                self._maybe_adapt_tile_capacity()
                n_ref = self.step // cfg.refine_every
                # Never reset opacities without a recovery window: a reset
                # needs ~one full revisit of the train views (the same window
                # the post-reset refine pause uses) before the model is
                # evaluable again. With the splatfacto schedule (reset every
                # 30 refines = 3000 steps) a 3000-step draft run would
                # otherwise reset on its FINAL step and be evaluated with
                # every opacity clamped at 2x the cull threshold — measured
                # ~17.5 dB eval ceiling regardless of scene or variant.
                can_recover = self.step + reset_pause <= tc.max_steps
                if cfg.reset_alpha_every > 0 and n_ref % cfg.reset_alpha_every == 0 and self.step < cfg.stop_split_at and can_recover:
                    self.params = self.params._replace(
                        gaussians=self.reset_opacity(self.params.gaussians)
                    )
                    self._last_reset_step = self.step
                if self.mesh is not None:
                    # refine's global argsort/cumsum (and capacity growth) run
                    # on the global view; re-pin the state to its mesh
                    # shardings so the next step's shard_map gets clean inputs
                    (self.params, self.opt_state, self.strat_state) = (
                        self._sharding.place_train_state(
                            self.mesh, self.params, self.opt_state, self.strat_state
                        )
                    )

            if self.step % tc.log_every == 0 or self.step == steps:
                rec = {
                    "step": self.step,
                    "loss": float(loss),
                    "n_alive": int(self.params.gaussians.alive.sum()),
                    "wall_s": time.time() - t0,
                    **self.timer.summary(last_n=tc.log_every),
                }
                if getattr(self, "_tile_overflow_frac", None) is not None:
                    rec["tile_overflow_frac"] = round(self._tile_overflow_frac, 6)
                if getattr(self, "_entry_stream_pressure", None) is not None:
                    rec["entry_stream_pressure"] = round(
                        self._entry_stream_pressure, 4
                    )
                self.history.append(rec)
                if progress_cb:
                    progress_cb(rec)
            it += 1
        return self.history

    def _refine_gaussians(self):
        t0 = time.perf_counter()
        g, s, changed, _info = self.refine(
            self.params.gaussians, self.strat_state, jnp.asarray(self.step)
        )
        jax.block_until_ready(s)
        self._record_dispatch(
            ("refine", self._rebuild_count, g.alive.shape[0]),
            time.perf_counter() - t0, 0,
        )
        self.strat_state = s
        self.opt_state = zero_gaussian_opt_slots(
            self.opt_state, changed, g.alive.shape[0]
        )
        return g

    # ------------------------------------------------------------------ eval
    def _eval_render_jit(self):
        """Jitted eval render (one trace; sh degree is a traced arg). Without
        this, op-by-op dispatch on a remote backend makes eval minutes/image."""
        if getattr(self, "_eval_render_fn", None) is None:
            cfg = self.model_config

            @jax.jit
            def render(params, cam, sh_deg):
                bg = sf.background_color(params, cfg)
                out = sf.render_camera(
                    params, cam, cfg, sh_deg, bg, is_eval_camera=True
                )
                # clip for metrics: gamma=1 renders are unbounded above and
                # would corrupt SSIM statistics (ns-eval compares display rgb)
                return jnp.clip(sf.gamma_encode(out.rgb, cfg), 0.0, 1.0)

            self._eval_render_fn = render
        return self._eval_render_fn

    def render_eval(self, idx: int) -> np.ndarray:
        cfg = self.model_config
        cam = self.eval_cams[idx]
        sh_deg = sf.active_sh_degree(cfg, jnp.asarray(self.step))
        return np.asarray(self._eval_render_jit()(self.params, cam, sh_deg))

    def evaluate(self) -> dict:
        cfg = self.model_config
        metrics = {"psnr": [], "ssim": []}
        for i in range(len(self.eval_cams)):
            pred = jnp.asarray(self.render_eval(i))
            gt = jnp.asarray(self.eval_images.images[i])
            metrics["psnr"].append(float(psnr_fn(pred, gt)))
            metrics["ssim"].append(float(ssim_fn(pred, gt)))
        out = {k: float(np.mean(v)) for k, v in metrics.items() if v}
        lpips = compute_lpips_suite(
            [self.render_eval(i) for i in range(len(self.eval_cams))],
            [self.eval_images.images[i] for i in range(len(self.eval_cams))],
        )
        if lpips is not None:
            out["lpips"] = lpips
        return out

    # ------------------------------------------------------------ checkpoint
    def _sampling_state(self) -> dict:
        """Camera-sampling stream state: the PRNG key plus the current epoch
        permutation and cursor. Saved so a resumed run consumes the SAME
        camera/key sequence as an uninterrupted one."""
        n = len(self.train_cams)
        order = getattr(self, "_order", None)
        return {
            "key": self.key,
            "cam_order": jnp.asarray(
                order if order is not None else np.full(n, -1), jnp.int32
            ),
            "cam_cursor": jnp.asarray(
                getattr(self, "_cam_cursor", self.step * self.data_batch)
            ),
            "last_reset_step": jnp.asarray(
                self._last_reset_step if self._last_reset_step > -(10**9) else -1,
                jnp.int32,
            ),
        }

    def save_checkpoint(self, path: str | Path):
        """Full training state: params AND optimizer (Adam moments + schedule
        counts), densification-strategy accumulators, and the camera-sampling
        stream — so save -> load -> train continues the training trajectory
        (SURVEY.md §5 checkpoint/resume; the reference's nerfstudio
        checkpoints optimizers with the model)."""
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        ckptr = ocp.StandardCheckpointer()
        state = {
            "gaussians": self.params.gaussians._asdict(),
            "background_logit": self.params.background_logit,
            "camera_opt": self.params.camera_opt,
            "velocity_opt": self.params.velocity_opt,
            "eval_camera_opt": self.params.eval_camera_opt,
            "eval_velocity_opt": self.params.eval_velocity_opt,
            "step": jnp.asarray(self.step),
            "opt_state": self.opt_state,
            "strat_state": self.strat_state._asdict(),
            "sampling": self._sampling_state(),
        }
        if self.eval_opt_state is not None:
            state["eval_opt_state"] = self.eval_opt_state
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str | Path):
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        ckptr = ocp.StandardCheckpointer()
        # Adapt to the stored Gaussian capacity (densification may have grown
        # it past this trainer's initial capacity). Also detect which optional
        # state groups the checkpoint carries (round-3 checkpoints hold
        # params+step only; current ones add optimizer/strategy/sampling).
        stored_keys: set[str] = set()
        meta_tree = None
        try:
            meta = ckptr.metadata(path)
            meta_tree = meta.item_metadata.tree
            stored_keys = set(meta_tree.keys())
            stored_cap = meta_tree["gaussians"]["means"].shape[0]
        except Exception:
            stored_cap = self.params.gaussians.alive.shape[0]
        cap = self.params.gaussians.alive.shape[0]
        if stored_cap != cap:
            if stored_cap > cap:
                self.params = self.params._replace(
                    gaussians=st.grow_capacity(self.params.gaussians, stored_cap)
                )
            else:
                g = self.params.gaussians
                self.params = self.params._replace(
                    gaussians=sf.GaussianParams(
                        *(leaf[:stored_cap] for leaf in g)
                    )
                )
            self.opt_state = self.optimizer.init(self.params)
            self.strat_state = st.init_strategy_state(
                stored_cap, self.trainer_config.seed
            )
        template = {
            "gaussians": self.params.gaussians._asdict(),
            "background_logit": self.params.background_logit,
            "camera_opt": self.params.camera_opt,
            "velocity_opt": self.params.velocity_opt,
            "eval_camera_opt": self.params.eval_camera_opt,
            "eval_velocity_opt": self.params.eval_velocity_opt,
            "step": jnp.asarray(self.step),
        }
        if "opt_state" in stored_keys:
            template["opt_state"] = self.opt_state
        if "strat_state" in stored_keys:
            template["strat_state"] = self.strat_state._asdict()
        if "sampling" in stored_keys:
            template["sampling"] = self._sampling_state()
        if "eval_opt_state" in stored_keys and self.eval_opt_state is not None:
            template["eval_opt_state"] = self.eval_opt_state
        # A checkpoint saved under a different feature set (e.g. eval-camera
        # optimization enabled, loaded with it disabled) differs from this
        # trainer's state both at the top level (an extra eval_opt_state
        # group) and INSIDE groups (eval leaves in the Adam moments), and
        # orbax's strict StandardRestore rejects any mismatch outright
        # (round-4 advisor finding). For every group whose leaf-path
        # structure differs from the stored one, restore into a throwaway
        # zeros template synthesized from the checkpoint's own metadata and
        # keep this trainer's current value instead — a structurally
        # different optimizer/camera state cannot be applied anyway.
        def _leaf_paths(tree) -> set[tuple]:
            # normalize path entries to bare names/indices: the metadata
            # tree is a plain dict nest (DictKey everywhere) while the live
            # template contains optax classes (GetAttrKey/SequenceKey), so
            # keystr() strings are not comparable across the two
            def norm(entry):
                for attr in ("key", "name", "idx"):
                    if hasattr(entry, attr):
                        return str(getattr(entry, attr))
                return str(entry)

            kps, _ = jax.tree_util.tree_flatten_with_path(tree)
            return {tuple(norm(e) for e in kp) for kp, _ in kps}

        discarded: set[str] = set()
        if meta_tree is not None:
            for k in stored_keys - set(template):
                template[k] = jax.tree_util.tree_map(
                    lambda e: jnp.zeros(e.shape, e.dtype), meta_tree[k]
                )
                discarded.add(k)
            for k in list(template):
                # never silently skip the model itself — a structural
                # mismatch there must fail loudly in restore below
                if k in ("gaussians", "background_logit", "step"):
                    continue
                if k in meta_tree and k not in discarded and _leaf_paths(
                    meta_tree[k]
                ) != _leaf_paths(template[k]):
                    template[k] = jax.tree_util.tree_map(
                        lambda e: jnp.zeros(e.shape, e.dtype), meta_tree[k]
                    )
                    discarded.add(k)
            if discarded:
                print(
                    "load_checkpoint: feature-set mismatch — keeping current "
                    f"state for group(s) {sorted(discarded)} (stored "
                    "structure differs from this trainer's config)",
                    flush=True,
                )
        state = ckptr.restore(path, template)
        for k in discarded:
            state.pop(k, None)
        cur = self.params
        self.params = self.params._replace(
            gaussians=sf.GaussianParams(**state["gaussians"]),
            background_logit=state["background_logit"],
            camera_opt=state.get("camera_opt", cur.camera_opt),
            velocity_opt=state.get("velocity_opt", cur.velocity_opt),
            eval_camera_opt=state.get("eval_camera_opt", cur.eval_camera_opt),
            eval_velocity_opt=state.get(
                "eval_velocity_opt", cur.eval_velocity_opt
            ),
        )
        self.step = int(state["step"])
        if "opt_state" in state:
            self.opt_state = state["opt_state"]
        if "strat_state" in state:
            self.strat_state = st.StrategyState(**state["strat_state"])
        if "eval_opt_state" in state and self.eval_opt_state is not None:
            self.eval_opt_state = state["eval_opt_state"]
        if "sampling" in state:
            s = state["sampling"]
            self.key = s["key"]
            order = np.asarray(s["cam_order"])
            self._order = None if (order < 0).any() else order
            self._cam_cursor = int(s["cam_cursor"])
            lrs = int(s["last_reset_step"])
            self._last_reset_step = lrs if lrs >= 0 else -(10**9)
        if self.mesh is not None:
            self.params, self.opt_state, self.strat_state = (
                self._sharding.place_train_state(
                    self.mesh, self.params, self.opt_state, self.strat_state
                )
            )
        # Legacy (params-only) checkpoints: reconstruct the most recent
        # opacity-reset step from the schedule so a resumed run keeps the
        # post-reset refine pause, and re-derive the camera-sampling cursor
        # from the restored step — a trainer instance that already trained
        # would otherwise keep its stale _order/_cam_cursor and diverge from
        # a fresh-trainer resume (round-4 advisor finding). Full checkpoints
        # restore the exact stream above.
        if "sampling" not in state:
            self._order = None
            self._cam_cursor = self.step * self.data_batch
            cfg = self.model_config
            interval = cfg.refine_every * max(cfg.reset_alpha_every, 1)
            if cfg.reset_alpha_every > 0 and self.step >= interval:
                self._last_reset_step = (self.step // interval) * interval


def compute_lpips_suite(preds, gts) -> float | None:
    """LPIPS if pretrained backbone weights are available locally; else None.

    The reference reports lpips via torchmetrics' pretrained VGG/AlexNet
    (SURVEY.md §7 hard part 4); this environment has no network access and no
    cached weights, so lpips degrades gracefully to null in metrics.json.
    """
    try:
        from ..ops.lpips import lpips_batch

        return lpips_batch(preds, gts)
    except Exception:
        return None
