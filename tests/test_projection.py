import jax
import pytest
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, se3, sh


def make_camera():
    fx = fy = 100.0
    cx, cy = 32.0, 32.0
    return fx, fy, cx, cy, 64, 64


def test_center_gaussian_projects_to_principal_point():
    fx, fy, cx, cy, w, h = make_camera()
    means = jnp.array([[0.0, 0.0, 5.0]])
    scales = jnp.array([[0.1, 0.1, 0.1]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    proj = projection.project_gaussians(
        means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, w, h
    )
    np.testing.assert_allclose(np.asarray(proj.means2d), [[cx, cy]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj.depths), [5.0], atol=1e-6)
    assert bool(proj.valid[0])
    assert float(proj.radii[0]) > 0


def test_isotropic_gaussian_cov2d_analytic():
    # Isotropic gaussian at center: cov2d = (fx * s / z)^2 * I (+0.3 dilation).
    fx, fy, cx, cy, w, h = make_camera()
    s, z = 0.2, 4.0
    proj = projection.project_gaussians(
        jnp.array([[0.0, 0.0, z]]),
        jnp.array([[s, s, s]]),
        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, w, h,
    )
    var = (fx * s / z) ** 2 + projection.COV2D_DILATION
    conic = np.asarray(proj.conics[0])
    np.testing.assert_allclose(conic, [1.0 / var, 0.0, 1.0 / var], rtol=1e-5, atol=1e-7)
    comp_expected = ((fx * s / z) ** 2) / var  # sqrt(det ratio) for isotropic
    np.testing.assert_allclose(float(proj.compensations[0]), comp_expected, rtol=1e-5)
    np.testing.assert_allclose(
        float(proj.radii[0]), np.ceil(3.0 * np.sqrt(var)), rtol=1e-6
    )


def test_behind_camera_culled():
    fx, fy, cx, cy, w, h = make_camera()
    proj = projection.project_gaussians(
        jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 5.0]]),
        jnp.full((2, 3), 0.1),
        jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1)),
        jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, w, h,
    )
    assert not bool(proj.valid[0])
    assert float(proj.radii[0]) == 0.0
    assert bool(proj.valid[1])


def test_pixel_velocity_pure_translation():
    # Camera translating along +x: a static point appears to move along -x in
    # camera frame; pixel velocity = -fx * vx / z.
    fx, fy, cx, cy, w, h = make_camera()
    z = 5.0
    v = jnp.array([0.3, 0.0, 0.0])
    proj = projection.project_gaussians(
        jnp.array([[0.0, 0.0, z]]),
        jnp.array([[0.1, 0.1, 0.1]]),
        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, w, h,
        lin_vel=v, ang_vel=jnp.zeros(3),
    )
    np.testing.assert_allclose(
        np.asarray(proj.pix_vels[0]), [-fx * 0.3 / z, 0.0], atol=1e-5
    )


def test_pixel_velocity_finite_difference():
    # Pixel velocity should match d(mean2d)/dt of re-projecting with the pose
    # advanced by the camera velocities.
    fx, fy, cx, cy, w, h = make_camera()
    rng = np.random.default_rng(3)
    means = jnp.asarray(rng.normal(size=(8, 3)) * 0.5 + np.array([0, 0, 5.0]))
    scales = jnp.full((8, 3), 0.1)
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (8, 1))
    v = jnp.array([0.2, -0.1, 0.05])
    om = jnp.array([0.1, 0.2, -0.05])

    # c2w = identity; advance and recompute w2c.
    R0 = jnp.eye(3)
    p0 = jnp.zeros(3)

    def mean2d_at(t):
        Rt, pt = se3.se3_advance_c2w(R0, p0, v, om, jnp.asarray(t))
        R_cw = Rt.T
        t_cw = -R_cw @ pt
        pr = projection.project_gaussians(
            means, scales, quats, R_cw, t_cw, fx, fy, cx, cy, w, h
        )
        return np.asarray(pr.means2d)

    # dt large enough that the f32 rounding of mean2d (~1e-5 px on ~30 px values)
    # stays well below the pose displacement; central diff truncation is O(dt^2).
    dt = 2e-3
    fd = (mean2d_at(dt) - mean2d_at(-dt)) / (2 * dt)
    proj = projection.project_gaussians(
        means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, w, h,
        lin_vel=v, ang_vel=om,
    )
    np.testing.assert_allclose(np.asarray(proj.pix_vels), fd, rtol=5e-3, atol=5e-2)


def test_projection_differentiable():
    fx, fy, cx, cy, w, h = make_camera()

    def f(means):
        pr = projection.project_gaussians(
            means, jnp.full((4, 3), 0.1),
            jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (4, 1)),
            jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, w, h,
        )
        return jnp.sum(pr.means2d) + jnp.sum(pr.conics)

    g = jax.grad(f)(jnp.array([[0.0, 0.0, 5.0]] * 4))
    assert np.all(np.isfinite(np.asarray(g)))


def test_sh_degree0_constant():
    coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb = sh.sh_to_rgb(3, dirs, coeffs)
    np.testing.assert_allclose(np.asarray(rgb), 0.28209479 + 0.5, atol=1e-5)


def test_sh_basis_orthonormal_mc():
    # Monte-Carlo check: int Y_i Y_j dOmega ~ delta_ij (loose tolerance).
    rng = np.random.default_rng(1)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    B = np.asarray(sh.eval_sh_basis(2, jnp.asarray(d)))
    gram = 4 * np.pi * (B.T @ B) / d.shape[0]
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_extents_tighter_than_radius_for_anisotropic():
    # A very elongated gaussian: the AABB extents must be much tighter than
    # the circumscribed radius on the minor axis, and both >= the 3-sigma
    # ellipse support.
    fx, fy, cx, cy, w, h = make_camera()
    proj = projection.project_gaussians(
        jnp.array([[0.0, 0.0, 4.0]]),
        jnp.array([[0.5, 0.01, 0.01]]),  # needle along x
        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, w, h,
    )
    ex = np.asarray(proj.extents[0])
    r = float(proj.radii[0])
    assert ex[0] == pytest.approx(r, rel=0.05)   # major axis ~ radius
    assert ex[1] < r * 0.2                        # minor axis much tighter
    var_y = (fx * 0.01 / 4.0) ** 2 + projection.COV2D_DILATION
    assert ex[1] >= 3.0 * np.sqrt(var_y) - 1.0    # still covers 3 sigma
