"""Pallas kernels vs the jnp tile path (interpret mode on CPU).

The real-TPU execution of the same kernels is exercised by bench.py and the
TPU smoke script; these tests pin the numerics (forward AND backward) against
the autodiff'd jnp compositing path, which itself is pinned to the sequential
oracle in test_rasterize.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_tpu.ops import projection, rasterize


def make_scene(n=120, seed=0, img_w=32, img_h=24, vel=True):
    rng = np.random.default_rng(seed)
    fx = fy = 40.0
    cx, cy = img_w / 2.0, img_h / 2.0
    means = rng.normal(size=(n, 3)) * np.array([0.45, 0.4, 0.8]) + np.array([0, 0, 4.0])
    scales = np.exp(rng.normal(size=(n, 3)) * 0.35) * 0.12
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0.0, 1.0, size=(n, 3))
    opac = rng.uniform(0.3, 0.95, size=(n,))
    kw = {}
    if vel:
        kw = dict(lin_vel=jnp.array([0.5, -0.3, 0.2]), ang_vel=jnp.array([0.1, 0.15, -0.1]))
    proj = projection.project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, img_w, img_h, **kw
    )
    return proj, jnp.asarray(colors), jnp.asarray(opac), img_w, img_h


@pytest.mark.parametrize("max_per_tile,rs", [(128, 0.0), (256, 0.04)])
def test_pallas_forward_matches_jnp(max_per_tile, rs):
    proj, colors, opac, w, h = make_scene(seed=1)
    bg = jnp.array([0.3, 0.1, 0.2])
    kw = dict(tile_size=8, max_per_tile=max_per_tile, max_tiles_per_gaussian=16,
              rolling_shutter_time=rs)
    out_j = rasterize.rasterize(proj, colors, opac, w, h, bg, impl="jnp", chunk=16, **kw)
    out_p = rasterize.rasterize(proj, colors, opac, w, h, bg, impl="pallas", **kw)
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_j.rgb), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.alpha), np.asarray(out_j.alpha), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_p.depth), np.asarray(out_j.depth), atol=1e-3
    )


def test_pallas_gradients_match_jnp():
    proj, colors, opac, w, h = make_scene(n=80, seed=2, img_w=24, img_h=16)
    bg = jnp.array([0.5, 0.5, 0.5])
    tgt = jnp.zeros((h, w, 3))
    kw = dict(tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16)

    def loss(impl, colors, opac, means2d, conics, pix_vels):
        p = proj._replace(means2d=means2d, conics=conics, pix_vels=pix_vels)
        out = rasterize.rasterize(
            p, colors, opac, w, h, bg, impl=impl, chunk=16,
            rolling_shutter_time=0.05, **kw
        )
        return jnp.mean((out.rgb - tgt) ** 2) + 0.1 * jnp.mean(out.alpha) + 0.05 * jnp.mean(out.depth * out.alpha)

    args = (colors, opac, proj.means2d, proj.conics, proj.pix_vels)
    g_j = jax.grad(lambda *a: loss("jnp", *a), argnums=tuple(range(5)))(*args)
    g_p = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(5)))(*args)
    names = ["colors", "opac", "means2d", "conics", "pix_vels"]
    for nm, gj, gp in zip(names, g_j, g_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gj), atol=2e-4, rtol=1e-3,
            err_msg=f"grad mismatch: {nm}",
        )
        assert float(jnp.abs(gj).sum()) > 0, f"zero reference grad for {nm}"


def test_pallas_empty_and_overflow_tiles():
    # tiles with zero gaussians and tiles hitting the capacity cap both work
    n = 200
    rng = np.random.default_rng(3)
    means = np.concatenate(
        [np.zeros((n - 1, 3)) + [0, 0, 3.0], [[5.0, 5.0, 4.0]]]
    )  # all stacked on one tile + one far away
    proj = projection.project_gaussians(
        jnp.asarray(means, jnp.float32),
        jnp.full((n, 3), 0.05),
        jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        jnp.eye(3), jnp.zeros(3), 30.0, 30.0, 16.0, 12.0, 32, 24,
    )
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    opac = jnp.full((n,), 0.4)
    bg = jnp.zeros(3)
    kw = dict(tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16)
    out_j = rasterize.rasterize(proj, colors, opac, 32, 24, bg, impl="jnp", chunk=16, **kw)
    out_p = rasterize.rasterize(proj, colors, opac, 32, 24, bg, impl="pallas", **kw)
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_j.rgb), atol=1e-4)


def test_fused_jnp_matches_per_sample_shift():
    """Fused-exposure semantics: sample s == single render with means shifted
    by pix_vel * eps_s (plus the usual rolling-shutter term)."""
    proj, colors, opac, w, h = make_scene(seed=4)
    bg = jnp.array([0.2, 0.3, 0.4])
    eps = jnp.array([-0.04, 0.0, 0.05])
    kw = dict(tile_size=8, max_per_tile=256, max_tiles_per_gaussian=64,
              rolling_shutter_time=0.03)
    fused = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl="jnp", chunk=16, **kw
    )
    assert fused.rgb.shape == (3, h, w, 3)
    for i in range(eps.shape[0]):
        shifted = proj._replace(means2d=proj.means2d + proj.pix_vels * eps[i])
        out = rasterize.rasterize(
            shifted, colors, opac, w, h, bg, impl="jnp", chunk=16, **kw
        )
        np.testing.assert_allclose(
            np.asarray(fused.rgb[i]), np.asarray(out.rgb), atol=1e-4,
            err_msg=f"sample {i}",
        )


def test_fused_pallas_matches_fused_jnp():
    proj, colors, opac, w, h = make_scene(seed=5)
    bg = jnp.array([0.1, 0.2, 0.3])
    eps = jnp.array([-0.03, -0.01, 0.01, 0.03])
    kw = dict(tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16,
              rolling_shutter_time=0.04)
    out_j = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl="jnp", chunk=16, **kw
    )
    out_p = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl="pallas", **kw
    )
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_j.rgb), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.alpha), np.asarray(out_j.alpha), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.depth), np.asarray(out_j.depth), atol=1e-3)


def test_fused_pallas_gradients_match_jnp():
    proj, colors, opac, w, h = make_scene(n=80, seed=6, img_w=24, img_h=16)
    bg = jnp.array([0.5, 0.5, 0.5])
    tgt = jnp.zeros((h, w, 3))
    eps = jnp.array([-0.05, 0.0, 0.05])
    kw = dict(tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16)

    def loss(impl, colors, opac, means2d, conics, pix_vels):
        p = proj._replace(means2d=means2d, conics=conics, pix_vels=pix_vels)
        out = rasterize.rasterize_fused(
            p, colors, opac, w, h, bg, eps=eps, impl=impl, chunk=16,
            rolling_shutter_time=0.05, **kw
        )
        rgb = out.rgb.mean(axis=0)  # linear-space blur average
        return (jnp.mean((rgb - tgt) ** 2) + 0.1 * jnp.mean(out.alpha)
                + 0.05 * jnp.mean(out.depth * out.alpha))

    args = (colors, opac, proj.means2d, proj.conics, proj.pix_vels)
    g_j = jax.grad(lambda *a: loss("jnp", *a), argnums=tuple(range(5)))(*args)
    g_p = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(5)))(*args)
    names = ["colors", "opac", "means2d", "conics", "pix_vels"]
    for nm, gj, gp in zip(names, g_j, g_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gj), atol=2e-4, rtol=1e-3,
            err_msg=f"fused grad mismatch: {nm}",
        )
        assert float(jnp.abs(gj).sum()) > 0, f"zero reference grad for {nm}"


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_fused_reduce_mean_matches_manual(impl):
    """reduce='mean' (tile-space reduction before image assembly) must equal
    manually averaging the per-sample outputs, for values AND gradients."""
    proj, colors, opac, w, h = make_scene(seed=7)
    bg = jnp.array([0.15, 0.25, 0.35])
    eps = jnp.array([-0.04, -0.01, 0.02, 0.05, 0.06])
    kw = dict(tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16,
              rolling_shutter_time=0.03, chunk=16)

    full = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl=impl, **kw
    )
    red = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl=impl, reduce="mean", **kw
    )
    np.testing.assert_allclose(
        np.asarray(red.rgb), np.asarray(full.rgb.mean(axis=0)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(red.alpha), np.asarray(full.alpha.mean(axis=0)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(red.transmittance),
        np.asarray(full.transmittance.mean(axis=0)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(red.depth), np.asarray(full.depth[eps.shape[0] // 2]),
        atol=1e-5)

    def loss(reduce, means2d):
        p = proj._replace(means2d=means2d)
        out = rasterize.rasterize_fused(
            p, colors, opac, w, h, bg, eps=eps, impl=impl, reduce=reduce, **kw
        )
        rgb = out.rgb if reduce else out.rgb.mean(axis=0)
        return jnp.mean(rgb ** 2)

    g_full = jax.grad(lambda m: loss(None, m))(proj.means2d)
    g_red = jax.grad(lambda m: loss("mean", m))(proj.means2d)
    np.testing.assert_allclose(np.asarray(g_red), np.asarray(g_full),
                               atol=1e-5, rtol=1e-4)


def test_rect_tiles_pallas_matches_jnp():
    """16x8 tiles (npix = 128, the TPU-preferred geometry): pallas forward and
    gradients must match the jnp path, which must match square-tile output."""
    proj, colors, opac, w, h = make_scene(seed=8, img_w=32, img_h=32)
    bg = jnp.array([0.2, 0.1, 0.3])
    eps = jnp.array([-0.03, 0.0, 0.04])
    kw = dict(max_per_tile=128, max_tiles_per_gaussian=32,
              rolling_shutter_time=0.04, chunk=16)

    out_sq = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl="jnp", tile_size=8, **kw
    )
    out_j = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl="jnp", tile_size=(16, 8), **kw
    )
    out_p = rasterize.rasterize_fused(
        proj, colors, opac, w, h, bg, eps=eps, impl="pallas", tile_size=(16, 8), **kw
    )
    np.testing.assert_allclose(np.asarray(out_j.rgb), np.asarray(out_sq.rgb), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_j.rgb), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.alpha), np.asarray(out_j.alpha), atol=1e-4)

    def loss(impl, means2d):
        p = proj._replace(means2d=means2d)
        out = rasterize.rasterize_fused(
            p, colors, opac, w, h, bg, eps=eps, impl=impl, tile_size=(16, 8),
            reduce="mean", **kw
        )
        return jnp.mean(out.rgb ** 2)

    g_j = jax.grad(lambda m: loss("jnp", m))(proj.means2d)
    g_p = jax.grad(lambda m: loss("pallas", m))(proj.means2d)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), atol=2e-4, rtol=1e-3)


_LAYOUT_WORKER = r"""
import os, sys
layout = sys.argv[1]
os.environ["SPLAT_TPU_LAYOUT"] = layout
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[2])
import jax.numpy as jnp
import numpy as np
from splat_tpu.ops import projection, rasterize
from splat_tpu.ops import pallas as pk
assert pk._LAYOUT == layout, pk._LAYOUT

rng = np.random.default_rng(3)
n, img_w, img_h = 100, 32, 24
fx = fy = 40.0
means = rng.normal(size=(n, 3)) * np.array([0.45, 0.4, 0.8]) + np.array([0, 0, 4.0])
scales = np.exp(rng.normal(size=(n, 3)) * 0.35) * 0.12
quats = rng.normal(size=(n, 4)); quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
colors = jnp.asarray(rng.uniform(0.0, 1.0, size=(n, 3)))
opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)))
proj = projection.project_gaussians(
    jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
    jnp.eye(3), jnp.zeros(3), fx, fy, img_w / 2, img_h / 2, img_w, img_h,
    lin_vel=jnp.array([0.5, -0.3, 0.2]), ang_vel=jnp.array([0.1, 0.15, -0.1]))
bg = jnp.array([0.15, 0.25, 0.35])
eps = jnp.array([-0.04, 0.0, 0.05])
kw = dict(tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16,
          rolling_shutter_time=0.03)

def run(impl):
    def loss_and_img(means2d, cols, op):
        p = proj._replace(means2d=means2d)
        out = rasterize.rasterize_fused(p, cols, op, img_w, img_h, bg, eps=eps,
                                        impl=impl, chunk=16, **kw)
        return jnp.mean(out.rgb ** 2), out.rgb
    (l, img), g = jax.value_and_grad(loss_and_img, argnums=(0, 1, 2),
                                     has_aux=True)(proj.means2d, colors, opac)
    return img, g

img_p, g_p = run("pallas")
img_j, g_j = run("jnp")
np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j), atol=1e-4)
for a, b in zip(g_p, g_j):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)
    assert float(jnp.abs(jnp.asarray(b)).sum()) > 0
print("LAYOUT_OK", layout)
"""


@pytest.mark.parametrize("layout", ["row", "gmajor", "mixed"])
def test_layouts_fused_forward_and_grads_match_jnp(layout):
    """Every kernel layout (row / gmajor / mixed) stays exact vs the jnp
    oracle for fused values AND gradients. SPLAT_TPU_LAYOUT is read at import
    time, so each layout runs in a subprocess (ADVICE r2: the gmajor backward
    was reachable only via env var and covered by no test)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "-c", _LAYOUT_WORKER, layout, str(repo)],
        capture_output=True, text=True, timeout=900,
        env={k: v for k, v in __import__("os").environ.items()
             if k != "SPLAT_TPU_LAYOUT"},
    )
    assert r.returncode == 0, f"layout {layout}:\n{r.stdout}\n{r.stderr}"
    assert f"LAYOUT_OK {layout}" in r.stdout


def test_seg_dma_gather_matches_xla_gather():
    """SPLAT_TPU_SEG_DMA=1 (in-kernel DMA per-tile parameter fetch,
    ops/pallas/seg_copy.py) must reproduce the XLA-gather path exactly —
    raw copy AND the full fused pipeline (values + grads). Env is read at
    import time -> subprocess."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    code = f"""
import os, sys
os.environ["SPLAT_TPU_SEG_DMA"] = "1"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {str(repo)!r})
import jax.numpy as jnp
import numpy as np
from splat_tpu.ops.pallas.seg_copy import seg_copy
rng = np.random.default_rng(0)
L, P, T, K = 1000, 16, 12, 128
sp = jnp.asarray(rng.normal(size=(L + K, P)).astype(np.float32))
starts = jnp.asarray(np.sort(rng.integers(0, L, size=T)).astype(np.int32))
got = seg_copy(sp, starts, K, T)
want = jnp.take(sp, starts[:, None] + jnp.arange(K)[None, :], axis=0)
np.testing.assert_allclose(np.asarray(got), np.asarray(want))

from splat_tpu.ops import projection, rasterize
n, w, h = 100, 32, 24
means = rng.normal(size=(n,3)) * np.array([.45,.4,.8]) + np.array([0,0,4.])
scales = np.exp(rng.normal(size=(n,3))*.35)*.12
q = rng.normal(size=(n,4)); q /= np.linalg.norm(q,axis=-1,keepdims=True)
colors = jnp.asarray(rng.uniform(size=(n,3)).astype(np.float32))
opac = jnp.asarray(rng.uniform(.3,.95,size=(n,)).astype(np.float32))
proj = projection.project_gaussians(jnp.asarray(means,jnp.float32),
    jnp.asarray(scales,jnp.float32), jnp.asarray(q,jnp.float32),
    jnp.eye(3), jnp.zeros(3), 40., 40., 16., 12., w, h,
    lin_vel=jnp.array([.5,-.3,.2]), ang_vel=jnp.array([.1,.15,-.1]))
kw = dict(tile_size=8, max_per_tile=128, max_tiles_per_gaussian=16,
          rolling_shutter_time=.03)
eps = jnp.array([-.04, 0., .05])
def f(impl, m):
    p = proj._replace(means2d=m)
    out = rasterize.rasterize_fused(p, colors, opac, w, h,
        jnp.array([.1,.2,.3]), eps=eps, impl=impl, chunk=16, **kw)
    return jnp.mean(out.rgb**2), out.rgb
(_, img_p), g_p = jax.value_and_grad(f, argnums=1, has_aux=True)("pallas", proj.means2d)
(_, img_j), g_j = jax.value_and_grad(f, argnums=1, has_aux=True)("jnp", proj.means2d)
np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j), atol=1e-4)
np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), atol=2e-4, rtol=1e-3)
print("SEG_DMA_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900,
        env={k: v for k, v in __import__("os").environ.items()
             if k != "SPLAT_TPU_SEG_DMA"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SEG_DMA_OK" in r.stdout
