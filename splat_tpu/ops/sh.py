"""Real spherical-harmonics color evaluation (degrees 0..3).

Equivalent of the reference rasterizer's SH component (SURVEY.md §2c #7: gsplat
`csrc/sh.cuh` + `gsplat/sh.py::spherical_harmonics`). On TPU this is pure
elementwise VPU work that XLA fuses into the projection computation, so a plain
jnp implementation *is* the idiomatic kernel — no Pallas needed.

Coefficients are the standard hard-coded real-SH constants used by the 3DGS
lineage; colors are stored as SH coefficients with the DC term handled via
`color = clip(sh_eval + 0.5, 0)` splatfacto-style.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Hard constants of the real spherical harmonics basis.
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)

MAX_SH_DEGREE = 3


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_basis(degree: int, dirs: jax.Array) -> jax.Array:
    """Evaluate SH basis functions for unit directions.

    dirs: (..., 3) unit vectors. Returns (..., (degree+1)**2).
    `degree` is static (python int) — the basis size sets the array shape.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, _C0, dtype=dirs.dtype)]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def spherical_harmonics(degree: int, dirs: jax.Array, coeffs: jax.Array) -> jax.Array:
    """SH color eval: dirs (..., 3) unit; coeffs (..., K, 3) with K >= (degree+1)^2.

    Only the first (degree+1)^2 bases contribute (progressive SH-degree schedule:
    higher-order coefficients are simply not evaluated yet). Returns (..., 3) raw
    SH output (caller adds +0.5 and clamps).
    """
    basis = eval_sh_basis(degree, dirs)  # (..., B)
    B = basis.shape[-1]
    return jnp.einsum("...k,...kc->...c", basis, coeffs[..., :B, :],
                      precision=jax.lax.Precision.HIGHEST)


def sh_to_rgb(degree: int, dirs: jax.Array, coeffs: jax.Array) -> jax.Array:
    """Splatfacto-style color: clip(SH(dirs) + 0.5, min=0)."""
    return jnp.maximum(spherical_harmonics(degree, dirs, coeffs) + 0.5, 0.0)
