"""SSIM (structural similarity) in pure jnp.

Used by the splatfacto loss ((1-l)L1 + l(1-SSIM), SURVEY.md Appendix B.8) and
by eval metrics. Standard Wang et al. formulation: 11x11 Gaussian window,
sigma=1.5, K1=0.01, K2=0.03 — matching torchmetrics' defaults so PSNR/SSIM
numbers are comparable with the reference's ns-eval output (SURVEY.md §2b).

Separable depthwise convolution (two 1-D convs) — maps to cheap VPU/MXU work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(
    img0: jax.Array,
    img1: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair (uniform window weighting)."""
    return ssim_map(img0, img1, window_size, sigma, k1, k2, data_range).mean()


def ssim_map(
    img0: jax.Array,
    img1: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jax.Array:
    """Per-window SSIM map, shape (H-w+1, W-w+1, C) — valid windows only.

    Each window value depends only on its own rows, so row-strip shards can
    evaluate their windows locally and combine via masked sums (the exact
    multi-chip SSIM in parallel.sharding)."""
    assert img0.ndim == 3, "expected (H, W, C)"
    half = window_size // 2
    x = jnp.arange(window_size, dtype=img0.dtype) - half
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    w = w / w.sum()

    def blur(img):  # separable gaussian filter, valid padding
        # (H, W, C): filter rows then cols via conv on each axis.
        # precision HIGHEST: on TPU the default lowers the convolution to
        # bf16 MXU passes, and the ~1e-3 rounding in blur(x^2) overwhelms the
        # true window variance (blur(x^2) - mu^2 cancels to ~1e-6), driving
        # the SSIM denominator through zero — observed SSIM of 26 on real
        # renders. CPU runs were exact, so only TPU was affected.
        img_t = jnp.moveaxis(img, -1, 0)  # (C, H, W)
        def conv1d(a, axis):
            a = jnp.moveaxis(a, axis, -1)
            pad_shape = a.shape[:-1]
            a2 = a.reshape(-1, a.shape[-1])
            out = jax.vmap(
                lambda row: jnp.convolve(
                    row, w, mode="valid", precision=jax.lax.Precision.HIGHEST
                )
            )(a2)
            out = out.reshape(pad_shape + (out.shape[-1],))
            return jnp.moveaxis(out, -1, axis)
        out = conv1d(conv1d(img_t, 1), 2)
        return jnp.moveaxis(out, 0, -1)

    mu0, mu1 = blur(img0), blur(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    # clamp tiny negative fp-noise variances so the stabilized denominator
    # stays >= c1*c2 (true variances are nonnegative)
    s00 = jnp.maximum(blur(img0 * img0) - mu00, 0.0)
    s11 = jnp.maximum(blur(img1 * img1) - mu11, 0.0)
    s01 = blur(img0 * img1) - mu01

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return num / den


def psnr(img0: jax.Array, img1: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((img0 - img1) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
