import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_tpu.ops import projection, rasterize, reference, tiling


def make_scene(n=80, seed=0, img_w=48, img_h=40, vel=False):
    rng = np.random.default_rng(seed)
    fx = fy = 50.0
    cx, cy = img_w / 2.0, img_h / 2.0
    means = rng.normal(size=(n, 3)) * np.array([0.5, 0.45, 0.9]) + np.array([0, 0, 4.0])
    scales = np.exp(rng.normal(size=(n, 3)) * 0.35) * 0.1
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


@pytest.mark.parametrize("tile_size", [8, 16])
def test_tile_rasterize_matches_oracle(tile_size):
    proj, colors, opac, w, h = make_scene(seed=1)
    bg = jnp.array([0.2, 0.1, 0.4])
    out = rasterize.rasterize(
        proj, colors, opac, w, h, bg, tile_size=tile_size, max_per_tile=128, chunk=16
    )
    ref = reference.render_reference(
        proj, colors, opac, w, h, bg, tile_size=tile_size, max_tiles_per_gaussian=64
    )
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out.transmittance), np.asarray(ref.transmittance), atol=2e-5
    )


def test_tile_rasterize_rolling_shutter_matches_oracle():
    proj, colors, opac, w, h = make_scene(seed=2, vel=True)
    bg = jnp.zeros(3)
    rs = 0.04
    out = rasterize.rasterize(
        proj, colors, opac, w, h, bg, rolling_shutter_time=rs,
        tile_size=8, max_per_tile=128, chunk=16,
    )
    ref = reference.render_reference(
        proj, colors, opac, w, h, bg, rolling_shutter_time=rs,
        tile_size=8, max_tiles_per_gaussian=64,
    )
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb), atol=2e-5)


def test_tile_rasterize_gradients_match_oracle():
    proj, colors, opac, w, h = make_scene(n=40, seed=3, img_w=32, img_h=32)
    bg = jnp.array([0.5, 0.5, 0.5])
    tgt = jnp.zeros((h, w, 3))

    def loss_tile(colors, opac, means2d):
        p = proj._replace(means2d=means2d)
        out = rasterize.rasterize(
            p, colors, opac, w, h, bg, tile_size=8, max_per_tile=64, chunk=8
        )
        return jnp.mean((out.rgb - tgt) ** 2)

    def loss_ref(colors, opac, means2d):
        p = proj._replace(means2d=means2d)
        out = reference.render_reference(
            p, colors, opac, w, h, bg, tile_size=8, max_tiles_per_gaussian=64
        )
        return jnp.mean((out.rgb - tgt) ** 2)

    g_tile = jax.grad(loss_tile, argnums=(0, 1, 2))(colors, opac, proj.means2d)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(colors, opac, proj.means2d)
    for gt, gr in zip(g_tile, g_ref):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr), atol=1e-5, rtol=1e-3)
    assert float(jnp.abs(g_tile[2]).sum()) > 0  # screen-space grads flow (densify signal)


def test_assemble_image_roundtrip():
    # Tiles laid out row-major reassemble into the original image.
    h, w, s = 20, 28, 8
    tw, th = tiling.num_tiles(w, h, s)
    img = jnp.arange((th * s) * (tw * s) * 3, dtype=jnp.float32).reshape(th * s, tw * s, 3)
    tiles = img.reshape(th, s, tw, s, 3).swapaxes(1, 2).reshape(th * tw, s, s, 3)
    out = rasterize.assemble_image(tiles, w, h, s)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img[:h, :w]))


def test_overflow_reported():
    # 60 gaussians all on one tile with tiny capacity -> overflow > 0.
    n = 60
    proj = projection.project_gaussians(
        jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (n, 1)) + jnp.linspace(0, 0.01, n)[:, None],
        jnp.full((n, 3), 0.05),
        jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (n, 1)),
        jnp.eye(3), jnp.zeros(3), 50.0, 50.0, 16.0, 16.0, 32, 32,
    )
    lists = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, 32, 32,
        tile_size=16, max_per_tile=16, max_tiles_per_gaussian=16,
    )
    assert int(lists.overflow) > 0
    assert int(lists.counts.max()) == 16


def test_tiling_inverse_paths_agree():
    """The scatter-based permutation inverse (SPLAT_TPU_INV_SCATTER, the
    round-5 sort-shrink lever) must produce BIT-IDENTICAL entry_slots to the
    rank-sort path, including under a sorted-stream cap (entries past the cap
    keep the dummy slot)."""
    proj, colors, opac, w, h = make_scene(seed=11)
    kw = dict(tile_size=8, max_per_tile=32, max_tiles_per_gaussian=16)
    for mte in (0, 256):
        import splat_tpu.ops.tiling as tiling_mod

        orig = tiling_mod._INV_SCATTER
        try:
            outs = {}
            for flag in (False, True):
                tiling_mod._INV_SCATTER = flag
                outs[flag] = tiling_mod.build_tile_lists.__wrapped__(
                    proj.means2d, proj.extents, proj.depths, proj.valid, w, h,
                    max_total_entries=mte, **kw
                )
        finally:
            tiling_mod._INV_SCATTER = orig
        np.testing.assert_array_equal(
            np.asarray(outs[False].entry_slots),
            np.asarray(outs[True].entry_slots),
            err_msg=f"mte={mte}",
        )
        np.testing.assert_array_equal(
            np.asarray(outs[False].sorted_ids), np.asarray(outs[True].sorted_ids)
        )


def test_tile_lists_depth_sorted():
    proj, colors, opac, w, h = make_scene(seed=5)
    lists = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, w, h,
        tile_size=8, max_per_tile=128, max_tiles_per_gaussian=64,
    )
    idx = np.asarray(lists.indices)
    cnt = np.asarray(lists.counts)
    dep = np.asarray(proj.depths)
    for t in range(idx.shape[0]):
        d = dep[idx[t, : cnt[t]]]
        assert np.all(np.diff(d) >= 0), f"tile {t} not depth sorted"


def test_entry_slots_bijection():
    """entry_slots (the gather-form VJP's routing table) must be a bijection
    between surviving candidate entries and occupied (tile, rank) slots:
    every slot j < counts[t] is claimed by EXACTLY one entry, and that
    entry's gaussian id matches indices[t, j]."""
    proj, colors, opac, w, h = make_scene(seed=7)
    K = 64
    lists = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, w, h,
        tile_size=8, max_per_tile=K, max_tiles_per_gaussian=16,
    )
    slots = np.asarray(lists.entry_slots)
    idx = np.asarray(lists.indices)
    cnt = np.asarray(lists.counts)
    n_tiles = idx.shape[0]
    n = proj.means2d.shape[0]
    m = slots.shape[0] // n
    dummy = n_tiles * K

    real = slots[slots < dummy]
    # bijection: no two entries share a slot
    assert len(np.unique(real)) == len(real)
    # exactly the occupied slots are claimed
    expected = {t * K + j for t in range(n_tiles) for j in range(cnt[t])}
    assert set(real.tolist()) == expected
    # each claiming entry's gaussian id matches the dense id table
    for e in np.flatnonzero(slots < dummy):
        t, j = divmod(int(slots[e]), K)
        assert idx[t, j] == e // m, (t, j, idx[t, j], e)


def test_exact_conic_cull_is_lossless():
    """Peak-alpha tile culling must not change the rendered image, only
    shrink the per-tile lists."""
    import numpy as np
    from splat_tpu.ops import projection, rasterize, tiling

    rng = np.random.default_rng(11)
    n, w, h = 150, 40, 32
    means = rng.normal(size=(n, 3)) * np.array([0.5, 0.4, 0.8]) + np.array([0, 0, 4.0])
    # very anisotropic splats: AABB footprints over-cover heavily
    scales = np.exp(rng.normal(size=(n, 3)) * 0.3) * np.array([0.4, 0.02, 0.02])
    q = rng.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    proj = projection.project_gaussians(
        jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
        jnp.asarray(q, jnp.float32), jnp.eye(3), jnp.zeros(3),
        45.0, 45.0, w / 2, h / 2, w, h,
        lin_vel=jnp.array([0.3, -0.1, 0.1]), ang_vel=jnp.array([0.05, 0.1, 0.0]),
    )
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, size=(n,)), jnp.float32)
    op_eff = opac * proj.compensations * proj.valid.astype(jnp.float32)
    kw = dict(img_w=w, img_h=h, tile_size=8, max_per_tile=128,
              max_tiles_per_gaussian=36)
    base = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, **kw)
    culled = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid,
        conics=proj.conics, opacities=op_eff, **kw)
    assert int(culled.counts.sum()) < int(base.counts.sum()), (
        int(culled.counts.sum()), int(base.counts.sum()))

    out = rasterize.rasterize(
        proj, colors, opac, w, h, jnp.zeros(3), rolling_shutter_time=0.03,
        tile_size=8, max_per_tile=128, max_tiles_per_gaussian=36, chunk=16,
        impl="jnp")
    # reference path without culling: rasterize with conic culling force-off
    g = rasterize.gather_tile_params(base, proj, colors, opac)
    rgb_t, dep_t, T_t = rasterize.composite_tiles_jnp(
        g, w, h, 8, jnp.asarray(0.03), 16)
    rgb_ref = rasterize.assemble_image(rgb_t, w, h, 8)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb_ref), atol=1e-5)


def test_max_total_entries_parity_and_overflow():
    """Sorted-entry-stream capacity (max_total_entries): with a cap that
    covers every real entry the tile lists (and a full pallas fused render +
    grads) are IDENTICAL to the uncapped build; a tight cap drops entries and
    reports them in entry_overflow instead of failing."""
    proj, colors, opac, w, h = make_scene(seed=9)
    kw = dict(tile_size=8, max_per_tile=64, max_tiles_per_gaussian=16)
    base = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, w, h, **kw
    )
    n_real = int(base.counts.sum()) + int(base.overflow)
    cap = ((n_real + 127) // 128 + 1) * 128
    capped = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, w, h,
        max_total_entries=cap, **kw
    )
    assert int(capped.entry_overflow) == 0
    np.testing.assert_array_equal(np.asarray(base.counts), np.asarray(capped.counts))
    np.testing.assert_array_equal(np.asarray(base.indices), np.asarray(capped.indices))
    np.testing.assert_array_equal(
        np.asarray(base.entry_slots), np.asarray(capped.entry_slots)
    )
    np.testing.assert_array_equal(
        np.asarray(base.sorted_ids)[:cap], np.asarray(capped.sorted_ids)
    )

    # full render parity through the pallas wrapper (gathers run over the
    # capped stream), values AND grads
    bg = jnp.array([0.2, 0.3, 0.1])
    eps = jnp.array([-0.03, 0.0, 0.04])

    def loss(mte, means2d):
        p = proj._replace(means2d=means2d)
        out = rasterize.rasterize_fused(
            p, colors, opac, w, h, bg, eps=eps, impl="pallas",
            max_total_entries=mte, **kw
        )
        return jnp.mean(out.rgb ** 2), out.rgb

    (l0, img0), g0 = jax.value_and_grad(lambda m: loss(0, m), has_aux=True)(proj.means2d)
    (l1, img1), g1 = jax.value_and_grad(lambda m: loss(cap, m), has_aux=True)(proj.means2d)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)

    # tight cap: entries drop, overflow reported, nothing crashes
    tight = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, w, h,
        max_total_entries=128, **kw
    )
    assert int(tight.entry_overflow) == max(n_real - 128, 0)
    assert int(tight.counts.sum()) <= 128
