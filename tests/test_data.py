import json

import jax.numpy as jnp
import numpy as np
import pytest

from splat_tpu.cameras.cameras import Cameras
from splat_tpu.cameras import optimizers as cam_opt
from splat_tpu.data import dataparser, dataset, ply, synthetic


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("scene")
    synthetic.generate_scene(
        out, n_gaussians=40, n_frames=9, img_size=32, exposure=0.1,
        n_blur_samples=3, seed=1, eval_interval=8,
    )
    return out


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(17, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, size=(17, 3)).astype(np.uint8)
    ply.write_ply(tmp_path / "a.ply", xyz, rgb)
    out = ply.read_ply(tmp_path / "a.ply")
    np.testing.assert_array_equal(out["xyz"], xyz)
    np.testing.assert_array_equal(out["rgb"], rgb)


def test_gl_cv_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    from splat_tpu.ops import se3

    R_gl = se3.quat_to_rotmat(jnp.asarray(q, jnp.float32))
    p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    bottom = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (5, 1, 1))
    c2w_gl = jnp.concatenate([jnp.concatenate([R_gl, p[..., None]], axis=-1), bottom], axis=1)
    R_cv, p2 = Cameras.gl_to_cv_c2w(c2w_gl)
    back = Cameras.cv_to_gl_c2w(R_cv, p2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(c2w_gl), atol=1e-6)
    # R_cv must be a proper rotation
    eye = jnp.einsum("nij,nkj->nik", R_cv, R_cv)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (5, 1, 1)), atol=1e-6)


def test_parse_scene_contract(scene_dir):
    cfg = dataparser.DataParserConfig(eval_mode="interval", eval_interval=8,
                                      orientation_method="none", center_method="none",
                                      auto_scale_poses=False)
    scene = dataparser.parse_scene(scene_dir, cfg)
    # 9 frames, every 8th eval -> frames 0, 8 are eval
    assert list(scene.eval_indices) == [0, 8]
    assert len(scene.train_paths) == 7
    assert scene.train_cameras.width == 32
    # eval frames have zero velocity (reference invariant)
    np.testing.assert_allclose(np.asarray(scene.eval_cameras.lin_vel), 0.0, atol=1e-12)
    # train frames have nonzero velocity
    assert float(jnp.abs(scene.train_cameras.lin_vel).sum()) > 0
    # exposure propagated
    assert float(scene.train_cameras.exposure_time[0]) == pytest.approx(0.1)
    # seed cloud loaded
    assert scene.points_xyz is not None and scene.points_xyz.shape[1] == 3


def test_parse_scene_autoscale_rescales_linear_velocity(scene_dir):
    cfg_raw = dataparser.DataParserConfig(orientation_method="none", center_method="none",
                                          auto_scale_poses=False)
    cfg_scaled = dataparser.DataParserConfig(orientation_method="none", center_method="poses",
                                             auto_scale_poses=True)
    raw = dataparser.parse_scene(scene_dir, cfg_raw)
    scaled = dataparser.parse_scene(scene_dir, cfg_scaled)
    s = scaled.scale
    assert s != 1.0
    np.testing.assert_allclose(
        np.asarray(scaled.train_cameras.lin_vel),
        np.asarray(raw.train_cameras.lin_vel) * s,
        rtol=1e-5, atol=1e-7,
    )
    # angular velocities unchanged
    np.testing.assert_allclose(
        np.asarray(scaled.train_cameras.ang_vel),
        np.asarray(raw.train_cameras.ang_vel),
        rtol=1e-5, atol=1e-7,
    )


def test_orientation_override_wins(scene_dir):
    # json says orientation_override=none; config asks for 'up'; json wins.
    cfg = dataparser.DataParserConfig(orientation_method="up", center_method="none",
                                      auto_scale_poses=False)
    scene = dataparser.parse_scene(scene_dir, cfg)
    np.testing.assert_allclose(scene.transform[:, :3], np.eye(3), atol=1e-12)


def test_eval_mode_filename(tmp_path, scene_dir):
    meta = json.loads((scene_dir / "transforms.json").read_text())
    for i, f in enumerate(meta["frames"]):
        pfx = "eval_" if i in (2, 5) else "train_"
        f["file_path"] = f"images/{pfx}{i:05d}.png"
    d = tmp_path / "scn"
    d.mkdir()
    (d / "transforms.json").write_text(json.dumps(meta))
    scene = dataparser.parse_scene(
        d, dataparser.DataParserConfig(eval_mode="filename"))
    assert list(scene.eval_indices) == [2, 5]


def test_image_cache(scene_dir):
    cfg = dataparser.DataParserConfig(orientation_method="none", center_method="none",
                                      auto_scale_poses=False)
    scene = dataparser.parse_scene(scene_dir, cfg)
    train, eval_ = dataset.load_scene_images(scene)
    assert train.images.shape == (7, 32, 32, 3)
    assert eval_.images.shape == (2, 32, 32, 3)
    assert train.images.dtype == np.float32
    assert 0.0 <= train.images.min() and train.images.max() <= 1.0
    assert train.images.max() > 0.05  # actually rendered something


def test_camera_optimizer_routing():
    n = 6
    R = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    p = jnp.zeros((n, 3))
    cams = Cameras(R, p, *(jnp.ones(n),) * 4, 16, 16)
    cfg = cam_opt.CameraOptConfig(mode="SO3xR3")
    params = cam_opt.init_camera_opt_params(n, cfg)
    params["dp"] = params["dp"].at[3].set(jnp.array([1.0, 2.0, 3.0]))
    sub = cams[jnp.array([3, 4])]
    out = cam_opt.apply_camera_opt(sub, params, cfg)
    np.testing.assert_allclose(np.asarray(out.p_c2w[0]), [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.p_c2w[1]), 0.0, atol=1e-6)


def test_velocity_optimizer_zero_init_semantics():
    n = 4
    R = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    cams = Cameras(R, jnp.zeros((n, 3)), *(jnp.ones(n),) * 4, 16, 16,
                   lin_vel=jnp.ones((n, 3)))
    params = {"dv": jnp.full((n, 3), 0.5), "dom": jnp.zeros((n, 3))}
    add = cam_opt.apply_velocity_opt(
        cams, params, cam_opt.VelocityOptConfig(enabled=True))
    np.testing.assert_allclose(np.asarray(add.lin_vel), 1.5, atol=1e-6)
    absolute = cam_opt.apply_velocity_opt(
        cams, params, cam_opt.VelocityOptConfig(enabled=True, zero_initial_velocities=True))
    np.testing.assert_allclose(np.asarray(absolute.lin_vel), 0.5, atol=1e-6)


def test_intermittent_shake_envelope_and_blur_score():
    """Round-5 stand-in protocol fix: with a raised-cosine shake envelope of
    period P, the measured screen-blur score must dip to a near-zero minimum
    at t = k*P (the envelope zeroes both amplitude AND slope there) and rise
    well above it mid-window — the property the blur-score eval split
    (sharpest-of-N per window) depends on."""
    env_p = 2.8
    pose_fn = synthetic.make_trajectory(
        "shake", shake_amp=0.16, envelope_period=env_p
    )
    fx = fy = 52.8
    cx = cy = 24.0
    exposure = 0.06
    at_min = [synthetic.screen_blur_px(pose_fn, k * env_p, exposure,
                                       fx, fy, cx, cy) for k in range(1, 4)]
    mid = [synthetic.screen_blur_px(pose_fn, (k + 0.5) * env_p, exposure,
                                    fx, fy, cx, cy) for k in range(1, 4)]
    # minima: residual orbit blur only (self-canceling look-at, <0.5 px);
    # mid-window: full shake, several x larger
    assert max(at_min) < 0.5, at_min
    assert min(mid) > 2.0 * max(at_min), (at_min, mid)
    # zero exposure scores exactly zero (eval-frame convention)
    assert synthetic.screen_blur_px(pose_fn, env_p, 0.0, fx, fy, cx, cy) == 0.0


def test_jerk_default_period_reverses_within_exposure():
    """make_trajectory('jerk') without an explicit period must use the short
    jerk default (0.22 s), under which the angular velocity reverses
    direction within a 0.12 s exposure — the trajectory's defining property
    (round-4 advisor finding: it silently inherited the 1.3 s shake
    default)."""
    pose_fn = synthetic.make_trajectory("jerk", shake_amp=0.05)
    t0 = 1.0
    ws = []
    for dt in np.linspace(-0.06, 0.06, 9):
        _, w = synthetic.trajectory_velocities_gl(pose_fn, t0 + dt)
        ws.append(np.asarray(w))
    ws = np.stack(ws)
    # shake component rides on the orbit's constant angular rate; look for a
    # sign flip in the DEVIATION from the window mean on at least one axis
    dev = ws - ws.mean(axis=0)
    flips = [np.min(dev[:, i]) < -1e-3 and np.max(dev[:, i]) > 1e-3
             for i in range(3)]
    assert any(flips), dev
