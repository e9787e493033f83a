import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, reference


def make_scene(n=50, seed=0, img=32, vel=False):
    rng = np.random.default_rng(seed)
    fx = fy = 40.0
    cx = cy = img / 2.0
    means = rng.normal(size=(n, 3)) * np.array([0.6, 0.6, 1.0]) + np.array([0, 0, 4.0])
    scales = np.exp(rng.normal(size=(n, 3)) * 0.3) * 0.12
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0.0, 1.0, size=(n, 3))
    opac = rng.uniform(0.3, 0.95, size=(n,))
    kw = {}
    if vel:
        kw = dict(lin_vel=jnp.array([0.3, -0.2, 0.1]), ang_vel=jnp.array([0.05, 0.1, -0.02]))
    proj = projection.project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy, img, img, **kw
    )
    return proj, jnp.asarray(colors), jnp.asarray(opac), img


def sequential_oracle(proj, colors, opacities, img, bg, rs_time=0.0):
    """Literal per-Gaussian sequential compositing loop in numpy (the CUDA rule)."""
    m2d = np.asarray(proj.means2d)
    con = np.asarray(proj.conics)
    dep = np.asarray(proj.depths)
    comp = np.asarray(proj.compensations)
    valid = np.asarray(proj.valid)
    radii = np.asarray(proj.radii)
    pv = np.asarray(proj.pix_vels)
    cols = np.asarray(colors)
    ops = np.asarray(opacities) * comp * valid * (radii > 0)

    order = np.argsort(np.where(valid, dep, np.inf))
    H = W = img
    rgb = np.zeros((H, W, 3))
    T = np.ones((H, W))
    for i in order:
        for yi in range(H):
            t_row = rs_time * ((yi + 0.5) / H - 0.5)
            for xi in range(W):
                if T[yi, xi] <= 1e-4:
                    continue
                dx = (xi + 0.5) - (m2d[i, 0] + pv[i, 0] * t_row)
                dy = (yi + 0.5) - (m2d[i, 1] + pv[i, 1] * t_row)
                sigma = 0.5 * (con[i, 0] * dx * dx + con[i, 2] * dy * dy) + con[i, 1] * dx * dy
                if sigma < 0:
                    continue
                a = min(0.999, ops[i] * np.exp(-sigma))
                if a < 1.0 / 255.0:
                    continue
                rgb[yi, xi] += T[yi, xi] * a * cols[i]
                T[yi, xi] *= 1.0 - a
    rgb += T[..., None] * np.asarray(bg)
    return rgb, T


def test_single_gaussian_analytic():
    img = 32
    fx = fy = 40.0
    proj = projection.project_gaussians(
        jnp.array([[0.0, 0.0, 4.0]]), jnp.array([[0.3, 0.3, 0.3]]),
        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        jnp.eye(3), jnp.zeros(3), fx, fy, img / 2, img / 2, img, img,
    )
    out = reference.render_reference(
        proj, jnp.array([[1.0, 0.5, 0.25]]), jnp.array([0.8]), img, img,
        jnp.zeros(3),
    )
    # Center pixel: alpha = comp * 0.8 * exp(-0.5 * d^2/var), d ~ 0 at center.
    var = (fx * 0.3 / 4.0) ** 2 + projection.COV2D_DILATION
    comp = float(proj.compensations[0])
    # mean2d = (16, 16); nearest pixel center (15.5+0.5)=16 exactly at y=x=16? centers at i+0.5
    dx = dy = 16.0 - 15.5  # pixel (15,15) center is 15.5 -> delta 0.5 from 16.0
    a = comp * 0.8 * np.exp(-0.5 * (dx * dx + dy * dy) / var)
    got = float(out.alpha[15, 15])
    np.testing.assert_allclose(got, a, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb[15, 15]), a * np.array([1.0, 0.5, 0.25]), rtol=1e-5)
    np.testing.assert_allclose(float(out.depth[15, 15]), 4.0, rtol=1e-5)


def test_chunked_matches_sequential_loop():
    proj, colors, opac, img = make_scene(n=40, seed=1, img=16)
    bg = jnp.array([0.1, 0.2, 0.3])
    out = reference.render_reference(proj, colors, opac, img, img, bg, chunk=7)
    rgb_seq, T_seq = sequential_oracle(proj, colors, opac, img, bg)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_seq, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.transmittance), T_seq, atol=1e-5)


def test_chunked_matches_sequential_with_rolling_shutter():
    proj, colors, opac, img = make_scene(n=30, seed=2, img=16, vel=True)
    bg = jnp.array([0.0, 0.0, 0.0])
    rs = 0.03
    out = reference.render_reference(proj, colors, opac, img, img, bg, rolling_shutter_time=rs, chunk=8)
    rgb_seq, T_seq = sequential_oracle(proj, colors, opac, img, bg, rs_time=rs)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_seq, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.transmittance), T_seq, atol=1e-5)


def test_chunk_size_invariance():
    proj, colors, opac, img = make_scene(n=33, seed=3, img=24)
    bg = jnp.array([0.5, 0.5, 0.5])
    o1 = reference.render_reference(proj, colors, opac, img, img, bg, chunk=4)
    o2 = reference.render_reference(proj, colors, opac, img, img, bg, chunk=33)
    np.testing.assert_allclose(np.asarray(o1.rgb), np.asarray(o2.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1.alpha), np.asarray(o2.alpha), atol=1e-5)


def test_renderer_differentiable():
    proj_args = make_scene(n=20, seed=4, img=16)
    proj, colors, opac, img = proj_args

    def loss(colors, opac):
        out = reference.render_reference(proj, colors, opac, img, img, jnp.zeros(3))
        return jnp.sum(out.rgb ** 2)

    g_c, g_o = jax.grad(loss, argnums=(0, 1))(colors, opac)
    assert np.all(np.isfinite(np.asarray(g_c)))
    assert np.all(np.isfinite(np.asarray(g_o)))
    assert float(jnp.abs(g_c).sum()) > 0
