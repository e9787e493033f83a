"""Learnable camera pose and velocity corrections.

Equivalents of nerfstudio's `CameraOptimizer` (modes off | SO3xR3 | SE3) and the
3dgs-deblur fork's `CameraVelocityOptimizer` (SURVEY.md §2b; flag evidence
reference train.py:40,66-71 and README.md:196-197).

Both are plain parameter pytrees (extra leaves of the training state) applied
functionally — the TPU-native analogue of nerfstudio's nn.Parameter tables.

Semantics (SURVEY.md Appendix B.7):
  * SO3xR3: R' = exp([phi]_x) R,  p' = p + dp            (per camera)
  * SE3:    (R', p') = exp_se3(xi) ∘ (R, p)              (per camera)
  * velocity: v' = prior + dv, omega' = prior_omega + dom; with
    `zero_initial_velocities` the prior is dropped and (dv, dom) are the
    absolute velocities (reference flag `...zero-initial-velocities=True`).
  * `optimize_eval_cameras`: eval-camera params receive gradients while the
    scene does not (handled by the model via stop_gradient on splats for eval
    steps, SURVEY.md §7 step 4).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import se3
from .cameras import Cameras

MODES = ("off", "SO3xR3", "SE3")


@dataclasses.dataclass(frozen=True)
class CameraOptConfig:
    mode: str = "off"            # off | SO3xR3 | SE3
    trans_l2_penalty: float = 1e-2
    rot_l2_penalty: float = 1e-3


@dataclasses.dataclass(frozen=True)
class VelocityOptConfig:
    enabled: bool = False
    zero_initial_velocities: bool = False
    lin_l2_penalty: float = 0.0
    ang_l2_penalty: float = 0.0
    # Symmetry-breaking noise for zero-init: at exactly v=0 with symmetric blur
    # sample times, dL/dv = sum_s t_s * J = 0 — a saddle the deterministic
    # optimizer can never leave. Tiny noise makes the sub-frames distinct so the
    # true velocity signal appears. (Torch escapes via nondeterminism.)
    init_noise: float = 1e-4


def init_camera_opt_params(num_cameras: int, cfg: CameraOptConfig, dtype=jnp.float32):
    if cfg.mode == "off":
        return {}
    if cfg.mode not in MODES:
        raise ValueError(f"unknown camera optimizer mode {cfg.mode!r}")
    return {
        "phi": jnp.zeros((num_cameras, 3), dtype=dtype),
        "dp": jnp.zeros((num_cameras, 3), dtype=dtype),
    }


def init_velocity_opt_params(
    num_cameras: int, cfg: VelocityOptConfig, dtype=jnp.float32, seed: int = 0
):
    if not cfg.enabled:
        return {}
    if cfg.zero_initial_velocities and cfg.init_noise > 0:
        import numpy as _np

        rng = _np.random.default_rng(seed)
        return {
            "dv": jnp.asarray(rng.normal(size=(num_cameras, 3)) * cfg.init_noise, dtype=dtype),
            "dom": jnp.asarray(rng.normal(size=(num_cameras, 3)) * cfg.init_noise, dtype=dtype),
        }
    return {
        "dv": jnp.zeros((num_cameras, 3), dtype=dtype),
        "dom": jnp.zeros((num_cameras, 3), dtype=dtype),
    }


def apply_camera_opt(
    cameras: Cameras, params: dict[str, jax.Array], cfg: CameraOptConfig
) -> Cameras:
    """Apply per-camera pose corrections, routed by cam_idx."""
    if cfg.mode == "off" or not params:
        return cameras
    phi = jnp.take(params["phi"], cameras.cam_idx, axis=0)
    dp = jnp.take(params["dp"], cameras.cam_idx, axis=0)
    if cfg.mode == "SO3xR3":
        R, p = se3.pose_delta_so3xr3(cameras.R_c2w, cameras.p_c2w, phi, dp)
    elif cfg.mode == "SE3":
        # Full SE(3) exponential: rotation exp([phi]x), translation V(phi) dp
        # with the EXACT left Jacobian V (Taylor-safe at phi=0) — matches the
        # reference's exact SE3 mode (nerfstudio camera_optimizers exp_map_SE3).
        Rd = se3.so3_exp(phi)
        V = se3.so3_left_jacobian(phi)
        R = jnp.matmul(Rd, cameras.R_c2w, precision=jax.lax.Precision.HIGHEST)
        p = cameras.p_c2w + jnp.einsum("...ij,...j->...i", V, dp)
    else:
        raise ValueError(cfg.mode)
    leaves, aux = cameras.tree_flatten()
    new = dict(zip(Cameras._leaf_names, leaves))
    new["R_c2w"], new["p_c2w"] = R, p
    return Cameras(width=aux[0], height=aux[1], **new)


def apply_velocity_opt(
    cameras: Cameras, params: dict[str, jax.Array], cfg: VelocityOptConfig
) -> Cameras:
    """Apply per-camera velocity corrections (or absolute learned velocities)."""
    if not cfg.enabled or not params:
        return cameras
    dv = jnp.take(params["dv"], cameras.cam_idx, axis=0)
    dom = jnp.take(params["dom"], cameras.cam_idx, axis=0)
    if cfg.zero_initial_velocities:
        lin, ang = dv, dom
    else:
        lin, ang = cameras.lin_vel + dv, cameras.ang_vel + dom
    leaves, aux = cameras.tree_flatten()
    new = dict(zip(Cameras._leaf_names, leaves))
    new["lin_vel"], new["ang_vel"] = lin, ang
    return Cameras(width=aux[0], height=aux[1], **new)


def camera_opt_penalty(params: dict[str, jax.Array], cfg: CameraOptConfig) -> jax.Array:
    if cfg.mode == "off" or not params:
        return jnp.zeros(())
    return (
        cfg.trans_l2_penalty * jnp.sum(params["dp"] ** 2)
        + cfg.rot_l2_penalty * jnp.sum(params["phi"] ** 2)
    )
