"""Camera batch pytree and coordinate conventions.

Equivalent of nerfstudio's `cameras/cameras.py` Cameras tensorclass (SURVEY.md
§2b), extended with the fork's per-frame velocity / exposure / readout metadata
that the 3dgs-deblur method needs (reference data contract, SURVEY.md §6b).

Conventions:
  * On disk (transforms.json) `transform_matrix` is OpenGL camera-to-world:
    camera looks along -z, +y up (`process_synthetic_inputs.py:230-238`).
  * Internally we store **OpenCV** camera-to-world (+z forward, +y down): all
    projection math then keeps z > 0 in front. `gl_to_cv` flips the y/z axes.
  * Velocities are camera-frame (scene-units/s, rad/s) and are the SAME in
    OpenGL and OpenCV frames up to the axis flip — we store them in OpenCV
    camera frame (vy, vz negated relative to the file).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# diag(1, -1, -1): flips y and z — OpenGL <-> OpenCV camera axes.
_FLIP_YZ = jnp.diag(jnp.array([1.0, -1.0, -1.0]))


@jax.tree_util.register_pytree_node_class
class Cameras:
    """A batch of N cameras (all arrays have leading dim N).

    Fields:
      R_c2w (N,3,3), p_c2w (N,3): OpenCV camera-to-world pose.
      fx, fy, cx, cy (N,): intrinsics in pixels.
      width, height: static python ints (uniform across the batch).
      lin_vel, ang_vel (N,3): OpenCV camera-frame velocities.
      exposure_time, rolling_shutter_time (N,): seconds.
      cam_idx (N,): index routing into per-camera optimizer params.
    """

    def __init__(self, R_c2w, p_c2w, fx, fy, cx, cy, width, height,
                 lin_vel=None, ang_vel=None, exposure_time=None,
                 rolling_shutter_time=None, cam_idx=None):
        n = R_c2w.shape[0]
        dtype = R_c2w.dtype
        z3 = jnp.zeros((n, 3), dtype=dtype)
        z1 = jnp.zeros((n,), dtype=dtype)
        self.R_c2w = R_c2w
        self.p_c2w = p_c2w
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.width = int(width)
        self.height = int(height)
        self.lin_vel = z3 if lin_vel is None else lin_vel
        self.ang_vel = z3 if ang_vel is None else ang_vel
        self.exposure_time = z1 if exposure_time is None else exposure_time
        self.rolling_shutter_time = z1 if rolling_shutter_time is None else rolling_shutter_time
        self.cam_idx = jnp.arange(n, dtype=jnp.int32) if cam_idx is None else cam_idx

    # -- pytree protocol ---------------------------------------------------
    _leaf_names = ("R_c2w", "p_c2w", "fx", "fy", "cx", "cy", "lin_vel",
                   "ang_vel", "exposure_time", "rolling_shutter_time", "cam_idx")

    def tree_flatten(self):
        return (
            tuple(getattr(self, k) for k in self._leaf_names),
            (self.width, self.height),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        width, height = aux
        kw = dict(zip(cls._leaf_names, leaves))
        return cls(width=width, height=height, **kw)

    # -- helpers -----------------------------------------------------------
    def __len__(self):
        return self.R_c2w.shape[0]

    def __getitem__(self, i) -> "Cameras":
        """Index/slice the camera batch; scalar index keeps a leading dim of 1."""
        if isinstance(i, int):
            i = slice(i, i + 1) if i != -1 else slice(-1, None)
        leaves, aux = self.tree_flatten()
        return self.tree_unflatten(aux, tuple(leaf[i] for leaf in leaves))

    def w2c(self) -> tuple[jax.Array, jax.Array]:
        """World-to-camera (R_cw, t_cw): X_cam = R_cw X_world + t_cw."""
        R_cw = jnp.swapaxes(self.R_c2w, -1, -2)
        t_cw = -jnp.einsum("...ij,...j->...i", R_cw, self.p_c2w,
                           precision=jax.lax.Precision.HIGHEST)
        return R_cw, t_cw

    @staticmethod
    def gl_to_cv_c2w(c2w_gl: jax.Array) -> jax.Array:
        """OpenGL c2w (..., 4, 4) or (...,3,4) -> OpenCV (R, p). Columns y,z negate."""
        R = c2w_gl[..., :3, :3] @ _FLIP_YZ.astype(c2w_gl.dtype)
        p = c2w_gl[..., :3, 3]
        return R, p

    @staticmethod
    def cv_to_gl_c2w(R_cv: jax.Array, p: jax.Array) -> jax.Array:
        """OpenCV (R, p) -> OpenGL 4x4 c2w."""
        R_gl = R_cv @ _FLIP_YZ.astype(R_cv.dtype)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R_cv.dtype),
            R_cv.shape[:-2] + (1, 4),
        )
        top = jnp.concatenate([R_gl, p[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def vel_gl_to_cv(v_gl: jax.Array) -> jax.Array:
        """Camera-frame velocity from the file's OpenGL axes to OpenCV axes."""
        return v_gl * jnp.array([1.0, -1.0, -1.0], dtype=v_gl.dtype)
