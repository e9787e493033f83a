"""Adaptive per-tile depth-list capacity.

gsplat's per-tile intersect lists are unbounded (SURVEY.md §2c #3); the TPU
build's static max_per_tile drops the DEEPEST entries when a tile saturates.
These tests pin (a) that the drop is a real, measurable quality loss on a
dense scene, and (b) that the trainer's adaptive growth
(Trainer._maybe_adapt_tile_capacity, driven by the unclamped
sf.binning_counts probe) detects and heals it, landing within epsilon of the
unbounded oracle while the fixed path measurably loses.
"""
import dataclasses
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from splat_tpu.data import dataparser, synthetic
from splat_tpu.engine import trainer as tr
from splat_tpu.models import splatfacto as sf
from splat_tpu.ops.ssim import psnr as psnr_fn


@pytest.fixture(scope="module")
def dense_scene(tmp_path_factory):
    """A scene whose central tiles hold ~4x more gaussians than max_per_tile=32."""
    out = tmp_path_factory.mktemp("dense_scene")
    synthetic.generate_scene(
        out, n_gaussians=500, n_frames=9, img_size=32, exposure=0.06,
        n_blur_samples=3, seed=7, eval_interval=8, gamma=2.2,
    )
    cfg = dataparser.DataParserConfig(
        eval_mode="interval", eval_interval=8,
        orientation_method="none", center_method="none", auto_scale_poses=False,
    )
    return dataparser.parse_scene(out, cfg)


def _cfg(**kw):
    base = dict(
        blur_samples=3, sh_degree=1, sh_degree_interval=50,
        tile_size=8, max_per_tile=32, max_tiles_per_gaussian=16, chunk=16,
        warmup_length=0, refine_every=8, reset_alpha_every=1000,
        background_color="black", gamma=2.2,
        # freeze the population: this test is about tile capacity, not refine
        densify_grad_thresh=1e9, cull_alpha_thresh=0.005, impl="jnp",
    )
    base.update(kw)
    return sf.SplatfactoConfig(**base)


def _render(params, cam, cfg):
    bg = sf.background_color(params, cfg)
    out = sf.render_camera(params, cam, cfg, cfg.sh_degree, bg)
    return jnp.clip(sf.gamma_encode(out.rgb, cfg), 0.0, 1.0)


def test_fixed_capacity_measurably_loses(dense_scene):
    t = tr.Trainer(
        dense_scene, _cfg(),
        tr.TrainerConfig(max_steps=1, adapt_tile_capacity=False, seed=0),
    )
    cam = t.train_cams[0]
    counts = np.asarray(sf.binning_counts(t.params, cam, _cfg()))
    assert counts.max() > 2 * 32, counts.max()   # genuinely saturated
    oracle = _render(t.params, cam, _cfg(max_per_tile=1024))
    fixed = _render(t.params, cam, _cfg(max_per_tile=32))
    p_fixed = float(psnr_fn(fixed, oracle))
    # dropping the deepest entries of a 4x-oversubscribed tile list costs
    # tens of dB (measured ~20 dB vs oracle)
    assert p_fixed < 35, p_fixed


def test_trainer_adapts_and_matches_oracle(dense_scene):
    mc = _cfg()
    tc = tr.TrainerConfig(
        max_steps=24, adapt_tile_capacity=True, tile_overflow_tol=0.002,
        max_tile_capacity=512, seed=0, log_every=100,
    )
    t = tr.Trainer(dense_scene, mc, tc)
    t.run(24)   # refine boundaries at 8/16/24; overflow streak of 2 -> bump
    k = t.model_config.max_per_tile
    assert k > 32, f"adaptive capacity did not grow (still {k})"

    cam = t.train_cams[0]
    counts = np.asarray(sf.binning_counts(t.params, cam, t.model_config))
    assert int(counts.max()) <= k, (counts.max(), k)  # healed: nothing dropped
    oracle = _render(t.params, cam, dataclasses.replace(mc, max_per_tile=1024))
    adapted = _render(t.params, cam, t.model_config)
    fixed = _render(t.params, cam, mc)
    p_adapted = float(psnr_fn(adapted, oracle))
    p_fixed = float(psnr_fn(fixed, oracle))
    assert p_adapted > 60, p_adapted              # within epsilon of oracle
    assert p_adapted > p_fixed + 20, (p_adapted, p_fixed)


def test_probe_matches_build_tile_lists(dense_scene):
    """tile_population must agree exactly with build_tile_lists' clamped
    counts + overflow (same footprint + conic-cull logic)."""
    import jax

    from splat_tpu.ops import tiling

    t = tr.Trainer(
        dense_scene, _cfg(),
        tr.TrainerConfig(max_steps=1, adapt_tile_capacity=False, seed=0),
    )
    cam = t.train_cams[0]
    counts_full = np.asarray(sf.binning_counts(t.params, cam, _cfg()))
    # reproduce the clamped binning at K=32 via the render path's own inputs
    g = t.params.gaussians
    from splat_tpu.cameras import optimizers as cam_opt
    cfg = _cfg()
    cam2 = cam_opt.apply_camera_opt(cam, t.params.camera_opt, cfg.camera_optimizer)
    cam2 = cam_opt.apply_velocity_opt(cam2, t.params.velocity_opt,
                                      cfg.camera_velocity_optimizer)
    from splat_tpu.ops import projection
    R0, p0 = cam2.R_c2w[0], cam2.p_c2w[0]
    proj = projection.project_gaussians(
        g.means, jnp.exp(g.scales_log), g.quats, R0.T, -R0.T @ p0,
        cam2.fx[0], cam2.fy[0], cam2.cx[0], cam2.cy[0], cam2.width, cam2.height,
        lin_vel=cam2.lin_vel[0], ang_vel=cam2.ang_vel[0],
    )
    eps = sf.blur_sample_times(cam2.exposure_time[0], cfg)
    t_max = jnp.max(jnp.abs(eps))   # rs compensation off in _cfg
    pad = jnp.abs(proj.pix_vels) * t_max  # per-axis box, mirrors sf.binning_counts
    opac = jax.nn.sigmoid(g.opacities_logit) * g.alive
    op_eff = opac * proj.compensations * proj.valid
    lists = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid,
        cam2.width, cam2.height, cfg.tile_size, 32, cfg.max_tiles_per_gaussian,
        radius_pad=pad, conics=proj.conics, opacities=op_eff,
    )
    np.testing.assert_array_equal(
        np.minimum(counts_full, 32), np.asarray(lists.counts)
    )
    assert int(np.maximum(counts_full - 32, 0).sum()) == int(lists.overflow)


def test_adaptive_probe_on_scan_driver(dense_scene):
    """The probe camera must be well-formed on the lax.scan multi-step driver
    too (regression: cams_b[-1] nested the leading dim and broke the probe's
    projection with a (3,3,3) rotation)."""
    mc = _cfg()
    tc = tr.TrainerConfig(
        max_steps=24, adapt_tile_capacity=True, tile_overflow_tol=0.002,
        max_tile_capacity=512, seed=0, log_every=100, scan_steps=4,
    )
    t = tr.Trainer(dense_scene, mc, tc)
    t.run(24)
    assert t.model_config.max_per_tile > 32


def test_stream_capacity_grows_before_binding(dense_scene):
    """max_total_entries growth: a deliberately tiny sorted-stream capacity
    must be grown by the refine-boundary probe BEFORE it can bind (80%
    pressure rule), with the step functions rebuilt at the new cap."""
    import dataclasses

    from splat_tpu.engine import trainer as tr
    from splat_tpu.models import splatfacto as sf

    cfg = sf.SplatfactoConfig(
        blur_samples=2, sh_degree=1, tile_size=8, max_per_tile=64,
        max_tiles_per_gaussian=16, chunk=16, warmup_length=2,
        refine_every=5, reset_alpha_every=1000,
        max_total_entries=64,   # tiny: real entry count far exceeds this
    )
    t = tr.Trainer(dense_scene, cfg, tr.TrainerConfig(max_steps=12, seed=0))
    t.run(12)
    grown = t.model_config.max_total_entries
    assert grown > 64, f"stream capacity did not grow (still {grown})"
    # the probe's landed-entry count must now fit under 80% of the cap
    import numpy as np

    counts = np.asarray(t._binning_probe_fn()(t.params, t._probe_cam))
    landed = int(np.minimum(counts, t.model_config.max_per_tile).sum())
    assert landed <= 0.8 * grown


def test_stream_capacity_grows_even_at_tile_ceiling(dense_scene):
    """ADVICE r3 (medium): the stream-capacity check must run BEFORE the
    max_per_tile-ceiling early return — with per-tile capacity pinned at its
    ceiling, the sorted-entry cap must still grow rather than silently
    dropping whole high-tile-id segments."""
    from splat_tpu.engine import trainer as tr
    from splat_tpu.models import splatfacto as sf

    cfg = sf.SplatfactoConfig(
        blur_samples=2, sh_degree=1, tile_size=8, max_per_tile=64,
        max_tiles_per_gaussian=16, chunk=16, warmup_length=2,
        refine_every=5, reset_alpha_every=1000,
        max_total_entries=64,
    )
    # max_per_tile already AT the ceiling: the old code early-returned here
    tc = tr.TrainerConfig(max_steps=12, seed=0, max_tile_capacity=64)
    t = tr.Trainer(dense_scene, cfg, tc)
    t.run(12)
    assert t.model_config.max_per_tile == 64  # ceiling respected
    grown = t.model_config.max_total_entries
    assert grown > 64, f"stream capacity did not grow at the ceiling ({grown})"
    # overflow pressure is surfaced for observability
    assert getattr(t, "_tile_overflow_frac", None) is not None
