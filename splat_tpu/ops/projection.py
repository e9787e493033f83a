"""Perspective EWA projection of 3D Gaussians, with screen-space pixel velocities.

TPU-native equivalent of the reference's projection kernels (SURVEY.md §2c #1/#2:
gsplat `csrc/forward.cu::project_gaussians_forward_kernel` and its backward). The
math follows gsplat 0.1.11 semantics (SURVEY.md Appendix B.5) plus the 3dgs-deblur
fork's per-Gaussian screen-space velocity output (Appendix B.3) used for rolling
shutter and intra-frame motion warping.

Design note: this is pure elementwise per-Gaussian math — on TPU the idiomatic
"kernel" is vectorized jnp that XLA fuses into a handful of VPU loops, and its VJP
comes for free from autodiff (replacing the hand-written CUDA backward). The hot
sequential work (compositing) lives in `ops/rasterize*` / `ops/pallas/` instead.

Conventions:
  * world-to-camera `R_cw (3,3)`, `t_cw (3,)` in **OpenCV** frame: +z forward,
    +x right, +y down. (The camera layer converts from the on-disk OpenGL c2w,
    SURVEY.md §6b.) Projection: u = fx*x/z + cx, v = fy*y/z + cy.
  * quats are (w,x,y,z); scales are linear (already exp'ed by the caller).
  * velocities (v, omega) are camera-frame (scene-units/s, rad/s).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .se3 import quat_normalize, quat_to_rotmat

# gsplat constants (Appendix B.5): low-pass dilation of the 2D covariance, and the
# antialiased opacity compensation that corrects for it.
COV2D_DILATION = 0.3
DEFAULT_CLIP_THRESH = 0.01


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities consumed by the rasterizer."""

    means2d: jax.Array       # (N, 2) pixel-space centers
    depths: jax.Array        # (N,) camera z (OpenCV, >0 in front)
    conics: jax.Array        # (N, 3) inverse 2D covariance upper triangle (a, b, c)
    radii: jax.Array         # (N,) 3-sigma pixel radius (0 => culled)
    compensations: jax.Array  # (N,) antialiasing opacity factor rho
    pix_vels: jax.Array      # (N, 2) screen-space velocity px/s (fork extension)
    valid: jax.Array         # (N,) bool: in front of camera and non-degenerate
    extents: jax.Array       # (N, 2) 3-sigma axis-aligned half-extents
                             # (3 sqrt(Sigma_xx), 3 sqrt(Sigma_yy)) — tighter
                             # tile footprint than the circumscribed radius
                             # for anisotropic splats


def scale_quat_to_cov3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Sigma_3 = R(q) diag(s)^2 R(q)^T. scales (N,3), quats (N,4) -> (N,3,3).

    Quats are normalized here (gsplat kernel semantics — raw optimizer
    parameters may drift off the unit sphere)."""
    R = quat_to_rotmat(quat_normalize(quats))
    M = R * scales[..., None, :]  # R @ diag(s)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=jax.lax.Precision.HIGHEST)


def project_gaussians(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    R_cw: jax.Array,
    t_cw: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    img_w: int,
    img_h: int,
    lin_vel: jax.Array | None = None,
    ang_vel: jax.Array | None = None,
    clip_thresh: float = DEFAULT_CLIP_THRESH,
    lim_img_h: int | None = None,
) -> ProjectedGaussians:
    """Project N Gaussians into one camera; optionally emit pixel velocities.

    lin_vel/ang_vel: camera-frame velocities (3,) of the *camera*; a static world
    point then moves at Xdot_cam = -omega x X_cam - v in the camera frame, and its
    pixel velocity is the projection Jacobian applied to Xdot (Appendix B.3).

    lim_img_h: height to use for the EWA frustum clamp (defaults to img_h).
    Row-strip sharded rendering passes the FULL image height here so the
    Jacobian linearization point — and thus every projected covariance — is
    bit-identical to the single-device render (the clamp is centered on the
    optical axis and depends only on the image height, not on cy).
    """
    dtype = means3d.dtype
    hi = jax.lax.Precision.HIGHEST  # geometry must stay true f32 on the MXU
    # World -> camera.
    p_cam = jnp.matmul(means3d, R_cw.T, precision=hi) + t_cw  # (N, 3)
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    in_front = z > clip_thresh
    zs = jnp.where(in_front, z, 1.0)  # safe z for divisions

    # 3D covariance, rotated into the camera frame: W Sigma3 W^T.
    cov3d_w = scale_quat_to_cov3d(scales, quats)
    cov3d_c = jnp.einsum("ij,njk,lk->nil", R_cw, cov3d_w, R_cw, precision=hi)

    # EWA Jacobian with gsplat's frustum clamping of x/z, y/z (1.15x fov guard
    # keeps the linearization sane for gaussians far outside the frustum).
    lim_x = 1.3 * (0.5 * img_w / fx)
    lim_y = 1.3 * (0.5 * (img_h if lim_img_h is None else lim_img_h) / fy)
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)

    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]  (2x3 per gaussian)
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # cov2d = J cov3d_c J^T, expanded to avoid materializing (N,2,3) matmuls.
    c00, c01, c02 = cov3d_c[..., 0, 0], cov3d_c[..., 0, 1], cov3d_c[..., 0, 2]
    c11, c12, c22 = cov3d_c[..., 1, 1], cov3d_c[..., 1, 2], cov3d_c[..., 2, 2]
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = a * c - b * b
    a_d = a + COV2D_DILATION
    c_d = c + COV2D_DILATION
    det = a_d * c_d - b * b
    det_ok = det > 1e-12
    det_safe = jnp.where(det_ok, det, 1.0)

    # Antialiased opacity compensation rho = sqrt(det_orig / det_dilated).
    compensations = jnp.sqrt(jnp.maximum(det_orig, 0.0) / det_safe)

    inv_det = 1.0 / det_safe
    conics = jnp.stack([c_d * inv_det, -b * inv_det, a_d * inv_det], axis=-1)

    # 3-sigma radius from the major eigenvalue of the dilated covariance.
    mid = 0.5 * (a_d + c_d)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    # Exact AABB of the 3-sigma ellipse: half-extents 3 sqrt(diag(cov2d)).
    extents = jnp.ceil(
        3.0 * jnp.sqrt(jnp.maximum(jnp.stack([a_d, c_d], axis=-1), 0.0))
    )

    means2d = jnp.stack([fx * x * inv_z + cx, fy * y * inv_z + cy], axis=-1)

    valid = in_front & det_ok
    radii = jnp.where(valid, radii, 0.0)
    extents = jnp.where(valid[..., None], extents, 0.0)

    # Screen-space pixel velocity (fork ★): Xdot = -omega x X_cam - v; udot = J Xdot.
    if lin_vel is None:
        pix_vels = jnp.zeros((means3d.shape[0], 2), dtype=dtype)
    else:
        xdot = -jnp.cross(jnp.broadcast_to(ang_vel, p_cam.shape), p_cam) - lin_vel
        pvx = j00 * xdot[..., 0] + j02 * xdot[..., 2]
        pvy = j11 * xdot[..., 1] + j12 * xdot[..., 2]
        pix_vels = jnp.stack([pvx, pvy], axis=-1)
        pix_vels = jnp.where(valid[..., None], pix_vels, 0.0)

    return ProjectedGaussians(
        means2d=means2d,
        depths=z,
        conics=conics,
        radii=radii,
        compensations=jnp.where(valid, compensations, 0.0),
        pix_vels=pix_vels,
        valid=valid,
        extents=extents,
    )
