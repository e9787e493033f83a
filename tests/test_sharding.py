"""Sharded (multi-device) vs single-device consistency on the 8-CPU fake mesh.

SURVEY.md §4: multi-chip tests compare sharded vs single-device outputs on a
fake mesh via xla_force_host_platform_device_count — the TPU-world analogue of
a fake backend.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from splat_tpu.cameras.cameras import Cameras
from splat_tpu.models import splatfacto as sf
from splat_tpu.parallel import sharding
from splat_tpu.engine import trainer as tr


def model_config(**kw):
    base = dict(
        blur_samples=4, sh_degree=1, tile_size=8, max_per_tile=64,
        max_tiles_per_gaussian=16, chunk=8, background_color="black",
        gamma=2.2, use_scale_regularization=True,
    )
    base.update(kw)
    return sf.SplatfactoConfig(**base)


def make_setup(img=32, n=60, seed=0):
    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(n, 3)) * 0.5).astype(np.float32)
    rgb = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    cfg = model_config()
    params = sf.init_model(pts, rgb, 2, 1, cfg)
    R = jnp.tile(jnp.eye(3)[None], (1, 1, 1))
    p = jnp.tile(jnp.array([[0.0, 0.0, -4.0]]), (1, 1))
    f = jnp.full((1,), img * 1.2)
    c = jnp.full((1,), img / 2.0)
    cam = Cameras(R, p, f, f, c, c, img, img,
                  lin_vel=jnp.array([[0.4, 0.1, 0.0]]),
                  ang_vel=jnp.array([[0.0, 0.1, 0.05]]),
                  exposure_time=jnp.full((1,), 0.2),
                  rolling_shutter_time=jnp.full((1,), 0.03),
                  cam_idx=jnp.zeros((1,), jnp.int32))
    gt = jnp.asarray(rng.uniform(size=(img, img, 3)), jnp.float32)
    return params, cfg, cam, gt


def single_device_loss(params, cfg, cam, gt):
    bg = sf.background_color(params, cfg)
    out = sf.render_camera(params, cam, cfg, cfg.sh_degree, bg)
    pred = sf.gamma_encode(out.rgb, cfg)
    loss, _ = sf.compute_losses(pred, gt, params, cfg)
    return loss


@pytest.mark.parametrize("n_blur,n_tile", [(1, 1), (2, 2), (2, 4), (4, 2)])
def test_sharded_loss_matches_single_device(n_blur, n_tile):
    params, cfg, cam, gt = make_setup()
    mesh = sharding.make_mesh(n_blur, n_tile)
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=False)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    sharded = float(jax.jit(loss_fn)(params, cam, gt, probe))
    single = float(single_device_loss(params, cfg, cam, gt))
    if n_tile == 1:
        # no strip boundaries: SSIM identical -> tight match
        np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
    else:
        # strip-wise SSIM drops boundary windows; L1 term is exact
        np.testing.assert_allclose(sharded, single, rtol=0.05, atol=0.01)


def test_sharded_gradients_replicated_and_finite():
    params, cfg, cam, gt = make_setup()
    mesh = sharding.make_mesh(2, 4)
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=True)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    g, gp = jax.jit(
        jax.grad(lambda p, pr: loss_fn(p, cam, gt, pr), argnums=(0, 1))
    )(params, probe)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert float(jnp.abs(g.gaussians.means).sum()) > 0
    assert float(jnp.abs(gp).sum()) > 0  # densification probe grads flow


def test_sharded_grads_match_single_device_l1_only():
    # With SSIM off the sharded loss is EXACTLY the single-device loss -> grads
    # must match to fp tolerance (validates psum/replication wiring).
    params, cfg, cam, gt = make_setup()
    cfg = dataclasses.replace(cfg, ssim_lambda=0.0)
    mesh = sharding.make_mesh(2, 2)
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=False)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    g_sh = jax.jit(jax.grad(lambda p: loss_fn(p, cam, gt, probe)))(params)
    g_si = jax.jit(jax.grad(lambda p: single_device_loss(p, cfg, cam, gt)))(params)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_si)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)


def test_sharded_train_step_runs():
    params, cfg, cam, gt = make_setup()
    mesh = sharding.make_mesh(2, 4)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step_fn = sharding.make_sharded_train_step(cfg, mesh, opt)
    p2, opt_state, loss, gp = step_fn(params, opt_state, cam, gt, jnp.asarray(0))
    assert np.isfinite(float(loss))
    # params actually moved
    assert float(jnp.abs(p2.gaussians.means - params.gaussians.means).sum()) > 0


@pytest.mark.parametrize("n_gauss,n_blur,n_tile", [(2, 2, 2), (4, 1, 2), (8, 1, 1)])
def test_gauss_sharded_loss_matches_single_device(n_gauss, n_blur, n_tile):
    """ZeRO-style gaussian sharding: per-shard projection + table all-gather
    must reproduce the single-device fused loss exactly (capacity 64 divides
    every gauss axis)."""
    params, cfg, cam, gt = make_setup(n=60)  # capacity pads to 64
    assert params.gaussians.means.shape[0] % n_gauss == 0
    mesh = sharding.make_mesh(n_blur, n_tile, n_gauss=n_gauss)
    assert "gauss" in mesh.shape
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=False)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    sharded = float(jax.jit(loss_fn)(params, cam, gt, probe))
    single = float(single_device_loss(params, cfg, cam, gt))
    if n_tile == 1:
        np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_allclose(sharded, single, rtol=0.05, atol=0.01)


def test_gauss_sharded_grads_match_single_device():
    params, cfg, cam, gt = make_setup(n=60)
    cfg = dataclasses.replace(cfg, ssim_lambda=0.0)
    mesh = sharding.make_mesh(1, 2, n_gauss=4)
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=True)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    g_sh, gp = jax.jit(
        jax.grad(lambda p, pr: loss_fn(p, cam, gt, pr), argnums=(0, 1))
    )(params, probe)
    g_si = jax.jit(jax.grad(lambda p: single_device_loss(p, cfg, cam, gt)))(params)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_si)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)
    assert float(jnp.abs(gp).sum()) > 0  # probe grads flow through the gather


@pytest.mark.parametrize("n_gauss,n_blur,n_tile", [(2, 2, 1), (4, 1, 2), (8, 1, 1)])
def test_depth_slab_sharded_loss_matches_single_device(n_gauss, n_blur, n_tile):
    """Depth-slab compute sharding: the all_to_all quantile exchange + the
    associative over-combine must reproduce the single-device fused composite
    (any depth-monotone partition preserves the global sort order)."""
    params, cfg, cam, gt = make_setup(n=60)
    cfg = dataclasses.replace(cfg, gauss_shard_mode="slab")
    mesh = sharding.make_mesh(n_blur, n_tile, n_gauss=n_gauss)
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=False)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    sharded = float(jax.jit(loss_fn)(params, cam, gt, probe))
    single = float(single_device_loss(params, cfg, cam, gt))
    if n_tile == 1:
        np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_allclose(sharded, single, rtol=0.05, atol=0.01)


def test_depth_slab_sharded_grads_match_single_device():
    params, cfg, cam, gt = make_setup(n=60)
    cfg = dataclasses.replace(cfg, ssim_lambda=0.0, gauss_shard_mode="slab")
    mesh = sharding.make_mesh(1, 1, n_gauss=4)
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=False)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    g_sh = jax.jit(
        jax.grad(lambda p: loss_fn(p, cam, gt, probe))
    )(params)
    g_si = jax.jit(jax.grad(lambda p: single_device_loss(p, cfg, cam, gt)))(params)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_si)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)


def test_depth_slab_overflow_drops_are_counted_not_fatal():
    """With slack < 1 the buckets overflow; the loss must still evaluate
    (dropped rows, not a crash) and differ from the exact value."""
    params, cfg, cam, gt = make_setup(n=60)
    cfg = dataclasses.replace(cfg, gauss_shard_mode="slab", slab_slack=0.2)
    mesh = sharding.make_mesh(1, 1, n_gauss=8)
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=False)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    val = float(jax.jit(loss_fn)(params, cam, gt, probe))
    assert np.isfinite(val)


def test_data_axis_camera_batch_matches_mean_of_singles():
    """'data' axis (multi-host DCN axis): a batch of B cameras trains in one
    step; the loss is the mean of per-camera losses."""
    params, cfg, cam1, gt1 = make_setup(seed=0)
    _, _, _, gt2 = make_setup(seed=7)
    # second camera: different pose/velocity and cam_idx
    cam2 = Cameras(
        cam1.R_c2w, cam1.p_c2w + jnp.array([[0.1, -0.05, 0.2]]),
        cam1.fx, cam1.fy, cam1.cx, cam1.cy, cam1.width, cam1.height,
        lin_vel=jnp.array([[0.1, 0.3, 0.0]]), ang_vel=jnp.array([[0.05, 0.0, 0.1]]),
        exposure_time=cam1.exposure_time, rolling_shutter_time=cam1.rolling_shutter_time,
        cam_idx=jnp.ones((1,), jnp.int32))
    batch_cam = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), cam1, cam2)
    batch_gt = jnp.stack([gt1, gt2], axis=0)

    mesh = sharding.make_multihost_mesh(n_blur=2, n_tile=2, n_gauss=1, n_data=2)
    assert mesh.shape["data"] == 2
    loss_fn = sharding.make_sharded_loss(cfg, mesh, with_probe=False)
    probe = jnp.zeros_like(params.gaussians.means[:, :2])
    batched = float(jax.jit(loss_fn)(params, batch_cam, batch_gt, probe))

    mesh1 = sharding.make_mesh(2, 2)
    loss1_fn = sharding.make_sharded_loss(cfg, mesh1, with_probe=False)
    a = float(jax.jit(loss1_fn)(params, cam1, gt1, probe))
    b = float(jax.jit(loss1_fn)(params, cam2, gt2, probe))
    np.testing.assert_allclose(batched, (a + b) / 2, rtol=2e-5, atol=1e-6)
