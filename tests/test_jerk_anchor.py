"""Jerk-scene validation of the fused-anchor auto-resolution (VERDICT r3 #7).

The jerk trajectory reverses angular velocity WITHIN an exposure — the class
where the first-order constant-(v, omega) model (SURVEY.md Appendix B.2,
shared by the reference's per-sub-frame loop and the fused warp) is weakest.
The contract under test: blur_anchors=0 (auto) must pick a group count whose
quality stays within 0.5 dB of blur_mode="exact" per-sub-frame reprojection
on this scene class — i.e. the FUSION never adds meaningful error on top of
the (shared) constant-velocity approximation.
"""
import dataclasses
import tempfile
from pathlib import Path

import numpy as np
import pytest

from splat_tpu.cameras import optimizers as cam_opt
from splat_tpu.data import dataparser, synthetic
from splat_tpu.engine import trainer as tr
from splat_tpu.models import splatfacto as sf


@pytest.fixture(scope="module")
def jerk_scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("jerk_scene")
    # amp 0.03 @ period 0.22 s, exposure 0.12 s: full velocity reversal
    # inside the exposure; worst per-exposure rotation ~5-8 deg so the auto
    # resolution must engage grouping (anchors in (1, S)) rather than
    # degenerate to exact
    synthetic.generate_scene(
        out, n_gaussians=80, n_frames=17, img_size=48, exposure=0.12,
        rolling_shutter=0.0, n_blur_samples=13, seed=11, eval_interval=8,
        gamma=2.2, trajectory="jerk", shake_amp=0.03, shake_period=0.22,
    )
    cfg = dataparser.DataParserConfig(
        eval_mode="interval", eval_interval=8,
        orientation_method="none", center_method="none", auto_scale_poses=False,
    )
    return dataparser.parse_scene(out, cfg)


def _cfg(**kw):
    base = dict(
        blur_samples=5, sh_degree=1, sh_degree_interval=50,
        tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16, chunk=16,
        warmup_length=40, refine_every=60, reset_alpha_every=1000,
        background_color="black", gamma=2.2,
        densify_grad_thresh=0.003, cull_alpha_thresh=0.05,
    )
    base.update(kw)
    return sf.SplatfactoConfig(**base)


def test_jerk_velocity_reverses_within_exposure(jerk_scene):
    """Scene sanity: the trajectory's angular velocity must actually change
    sign inside one exposure window (what makes this scene 'jerk')."""
    pose_fn = synthetic.make_trajectory("jerk", 0.03, 0.22)
    t_mid = 0.9  # an arbitrary mid-trajectory frame time
    _, w0 = synthetic.trajectory_velocities_gl(pose_fn, t_mid - 0.06)
    _, w1 = synthetic.trajectory_velocities_gl(pose_fn, t_mid + 0.06)
    assert np.any(np.sign(w0) != np.sign(w1)), (w0, w1)


def test_auto_anchor_resolution_engages_grouping(jerk_scene):
    cfg = _cfg(blur_anchors=0)
    cams = jerk_scene.train_cameras
    a = sf.resolve_blur_anchors(cfg, cams)
    # must engage grouping (the jerk rotation is too fast for A=1) without
    # degenerating to exact (which would mask a broken calibration)
    assert 2 <= a <= cfg.blur_samples, a


def test_fused_auto_tracks_exact_on_jerk(jerk_scene):
    """Train fused-auto vs exact; eval PSNR within 0.5 dB (VERDICT r3 #7)."""
    results = {}
    for name, kw in (
        ("exact", dict(blur_mode="exact")),
        ("fused_auto", dict(blur_mode="fused", blur_anchors=0)),
    ):
        mc = _cfg(**kw)
        t = tr.Trainer(jerk_scene, mc, tr.TrainerConfig(max_steps=250, seed=0))
        t.run(250)
        results[name] = t.evaluate()["psnr"]
    assert results["fused_auto"] >= results["exact"] - 0.5, results
