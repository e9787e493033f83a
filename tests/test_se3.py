import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from splat_tpu.ops import se3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy(rng):
    q = random_quats(rng, 32)
    R = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w)
    R_sp = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_sp, atol=1e-6)


def test_rotmat_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    q[:, 0] = np.abs(q[:, 0])  # canonical sign
    R = se3.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(se3.rotmat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(16, 3))
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_sp = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_sp, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(16, 3)) * 0.5
    w2 = np.asarray(se3.so3_log(se3.so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(w2, w, atol=1e-5)


def test_so3_exp_near_zero_gradient():
    # Velocity optimizer needs well-defined grads at omega = 0.
    g = jax.grad(lambda w: jnp.sum(se3.so3_exp(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_advance_zero_velocity(rng):
    q = random_quats(rng, 4)
    R0 = se3.quat_to_rotmat(jnp.asarray(q))
    p0 = jnp.asarray(rng.normal(size=(4, 3)))
    v = jnp.zeros((4, 3))
    Rt, pt = se3.se3_advance_c2w(R0, p0, v, v, jnp.full((4,), 0.3))
    np.testing.assert_allclose(np.asarray(Rt), np.asarray(R0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pt), np.asarray(p0), atol=1e-6)


def test_se3_advance_pure_rotation_consistency(rng):
    # Advancing by omega for time t then -omega for time t returns to start.
    q = random_quats(rng, 4)
    R0 = se3.quat_to_rotmat(jnp.asarray(q))
    p0 = jnp.asarray(rng.normal(size=(4, 3)))
    v = jnp.asarray(rng.normal(size=(4, 3)))
    w = jnp.asarray(rng.normal(size=(4, 3)))
    t = jnp.full((4,), 0.12)
    R1, p1 = se3.se3_advance_c2w(R0, p0, v, w, t)
    # Velocities expressed in the frame at t=0; the exact inverse step uses the
    # same frame, so p0 recovery: p1 - R0 v t == p0 and R1 exp(-[w]t) == R0.
    R_back = R1 @ se3.so3_exp(-w * t[:, None])
    np.testing.assert_allclose(np.asarray(R_back), np.asarray(R0), atol=1e-5)


def test_pose_delta_so3xr3_identity(rng):
    q = random_quats(rng, 4)
    R0 = se3.quat_to_rotmat(jnp.asarray(q))
    p0 = jnp.asarray(rng.normal(size=(4, 3)))
    R1, p1 = se3.pose_delta_so3xr3(R0, p0, jnp.zeros((4, 3)), jnp.zeros((4, 3)))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-6)


def test_so3_left_jacobian_matches_expm(rng):
    """V(phi) equals the translation block of expm of the 4x4 twist:
    exp_se3(phi, u) translation == V(phi) u (exact SE(3), VERDICT r2 #9)."""
    from scipy.linalg import expm

    phi = rng.normal(size=(16, 3)).astype(np.float32) * 0.5
    u = rng.normal(size=(16, 3)).astype(np.float32)
    V = np.asarray(se3.so3_left_jacobian(jnp.asarray(phi)))
    for i in range(len(phi)):
        tw = np.zeros((4, 4))
        tw[:3, :3] = np.asarray(se3.skew(jnp.asarray(phi[i])))
        tw[:3, 3] = u[i]
        exact = expm(tw)[:3, 3]
        np.testing.assert_allclose(V[i] @ u[i], exact, rtol=2e-5, atol=2e-6)


def test_so3_left_jacobian_small_angle_and_grad():
    phi0 = jnp.zeros((1, 3))
    np.testing.assert_allclose(
        np.asarray(se3.so3_left_jacobian(phi0))[0], np.eye(3), atol=1e-6
    )
    g = jax.grad(lambda p: jnp.sum(se3.so3_left_jacobian(p)))(phi0)
    assert np.all(np.isfinite(np.asarray(g)))
