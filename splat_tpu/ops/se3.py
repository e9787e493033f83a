"""Quaternion / SO(3) / SE(3) primitives.

All rotations use unit quaternions in (w, x, y, z) order. Camera-to-world ("c2w")
matrices follow the reference data contract (SURVEY.md §6b): OpenGL convention on
disk (camera looks along -z), converted to OpenCV (+z forward) by the camera layer.

The SE(3) pose-advance math implements the reference method's first-order motion
model (SURVEY.md Appendix B.2; reference: 3dgs-deblur fork of splatfacto, evidenced
by process_synthetic_inputs.py:157-165 velocity derivation):

    R(t) = R0 @ exp([omega]_x * t)          p(t) = p0 + R0 @ (v * t)

with (v, omega) the *camera-frame* linear/angular velocities in scene-units/s and
rad/s, and (R0, p0) the camera-to-world pose at the frame's reference time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 3x3 pose math must stay true f32 on TPU (default matmul precision is bf16).
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternion(s) to unit norm. q: (..., 4) in (w, x, y, z)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion(s) (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the one keyed to the largest diagonal-based magnitude (numerically
    stable, and jit/vmap friendly — no data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_k^2 >= 0.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign (w >= 0).
    return jnp.where(q[..., :1] < 0, -q, q)


def skew(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix [w]_x."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    m = jnp.stack([zero, -wz, wy, wz, zero, -wx, -wy, wx, zero], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_exp(w: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues' formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Taylor-safe near theta=0 so it is differentiable everywhere (the velocity
    optimizer drives gradients through this at omega ~ 0).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + eps * eps)
    # sin(t)/t and (1-cos(t))/t^2 with series fallback near 0.
    small = theta2 < eps
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, eps * eps))
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * _mm(K, K)


def so3_left_jacobian(w: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Exact SO(3) left Jacobian V(w) (..., 3) -> (..., 3, 3):

        V = I + (1-cos t)/t^2 [w]x + (t - sin t)/t^3 [w]x^2

    This is the translation coupling of the SE(3) exponential
    (exp_se3(w, u) has translation V(w) u). Taylor-safe near t=0 so the
    SE3 camera-optimizer mode is differentiable at its zero init."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < eps
    # double-where: evaluate the exact branch at a SAFE theta so its backward
    # is finite at theta=0 (where alone still differentiates the unsafe branch)
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta_safe - jnp.sin(theta_safe)) / (theta2_safe * theta_safe))
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * _mm(K, K)


def so3_log(R: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # vee of the antisymmetric part
    v = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    scale = jnp.where(theta < eps, 0.5 + theta * theta / 12.0, theta / jnp.maximum(2.0 * sin_t, eps))
    return v * scale[..., None]


def se3_advance_c2w(
    R0: jax.Array, p0: jax.Array, v: jax.Array, omega: jax.Array, t: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Advance a camera-to-world pose by camera-frame velocities over time t.

    R0: (..., 3, 3) c2w rotation; p0: (..., 3) camera position in world;
    v/omega: (..., 3) camera-frame linear (units/s) & angular (rad/s) velocity;
    t: scalar or broadcastable time offset in seconds.

    Returns (R(t), p(t)) per SURVEY.md Appendix B.2.
    """
    t = jnp.asarray(t)
    Rt = _mm(R0, so3_exp(omega * t[..., None]))
    pt = p0 + jnp.einsum(
        "...ij,...j->...i", R0, v * t[..., None], precision=jax.lax.Precision.HIGHEST
    )
    return Rt, pt


def pose_delta_so3xr3(
    R: jax.Array, p: jax.Array, phi: jax.Array, dp: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Apply a learnable SO3xR3 pose correction (camera-optimizer mode `SO3xR3`,
    SURVEY.md Appendix B.7): R' = exp([phi]_x) @ R, p' = p + dp."""
    return _mm(so3_exp(phi), R), p + dp
