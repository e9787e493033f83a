"""Capacity growth must preserve optimizer moments and schedule counts."""
import jax
import jax.numpy as jnp
import numpy as np

from splat_tpu.engine import trainer as tr
from splat_tpu.models import splatfacto as sf


def test_grow_opt_state_preserves_moments_and_counts():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cfg = sf.SplatfactoConfig(sh_degree=1)
    params = sf.init_model(pts, None, 2, 1, cfg, capacity=64)
    tc = tr.TrainerConfig()
    opt = tr.build_optimizer(params, tc)
    state = opt.init(params)

    # take a few steps so moments & counts are nonzero
    for i in range(3):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, state = opt.update(grads, state, params)
        params = __import__("optax").apply_updates(params, updates)

    def counts(s):
        return [int(l) for l in jax.tree.leaves(s) if hasattr(l, "ndim") and l.ndim == 0
                and l.dtype in (jnp.int32, jnp.int64)]

    def cap_leaves(s, cap):
        return [l for l in jax.tree.leaves(s)
                if hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == cap]

    old_moments = cap_leaves(state, 64)
    assert any(float(jnp.abs(l).sum()) > 0 for l in old_moments)

    grown = tr.grow_opt_state(state, 64, 128)
    # counts unchanged
    assert counts(grown) == counts(state)
    # moments preserved in the first 64 slots, zero beyond
    new_moments = cap_leaves(grown, 128)
    assert len(new_moments) == len(old_moments)
    for old, new in zip(old_moments, new_moments):
        np.testing.assert_array_equal(np.asarray(new[:64]), np.asarray(old))
        np.testing.assert_array_equal(np.asarray(new[64:]), 0)
    # grown state still usable with grown params
    params2 = params._replace(
        gaussians=__import__("splat_tpu.models.strategy", fromlist=["grow_capacity"]).grow_capacity(
            params.gaussians, 128
        )
    )
    grads2 = jax.tree.map(jnp.ones_like, params2)
    updates2, _ = opt.update(grads2, grown, params2)
    assert jax.tree.leaves(updates2)[0].shape[0] == 128
