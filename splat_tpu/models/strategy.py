"""Densification / split / cull strategy under XLA static shapes.

The reference's schedule (SURVEY.md Appendix C, splatfacto 1.1.0 defaults):
warmup 500; every `refine_every` (100) steps densify (clone small / split
large Gaussians whose accumulated screen-space gradient exceeds a threshold)
and cull (low opacity / oversized); stop splitting at ~15k; reset opacities
every `reset_alpha_every` refinements.

CUDA implementations concatenate/compact tensors; under XLA the Gaussian
arrays are FIXED capacity with an `alive` mask (SURVEY.md §7 hard part 1).
New Gaussians are written into dead slots with a deterministic rank-matching
scatter (argsort over the alive mask) — no dynamic shapes, no host sync.
Capacity growth (doubling + recompile) is the trainer's job via `grow_capacity`.

Screen-gradient signal: the model adds a zero-valued `means2d_probe` to every
sub-frame's projected means; the probe's gradient (pixel units) is normalized
by max(W,H)/2 to match splatfacto's NDC-scaled `densify_grad_thresh`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from .splatfacto import GaussianParams, SplatfactoConfig, _logit


class StrategyState(NamedTuple):
    grad_accum: jax.Array   # (C,) accumulated ndc-scale screen-grad norms
    grad_count: jax.Array   # (C,) number of steps the gaussian was visible
    key: jax.Array          # PRNG key for split sampling


def init_strategy_state(capacity: int, seed: int = 0) -> StrategyState:
    return StrategyState(
        grad_accum=jnp.zeros((capacity,)),
        grad_count=jnp.zeros((capacity,), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def grow_strategy_state(state: StrategyState, new_capacity: int) -> StrategyState:
    """Pad the strategy state to a grown capacity (carry, don't re-init).

    The accumulators are typically zero at growth time (growth runs right
    after a refine, which consumed them), but a re-init would ALSO rewind the
    split-sampling PRNG key to the initial seed at every growth, correlating
    split directions across the run."""
    cap = state.grad_accum.shape[0]
    if new_capacity <= cap:
        return state
    pad = new_capacity - cap
    return StrategyState(
        grad_accum=jnp.pad(state.grad_accum, (0, pad)),
        grad_count=jnp.pad(state.grad_count, (0, pad)),
        key=state.key,
    )


def accumulate_grads(
    state: StrategyState,
    means2d_grad: jax.Array,   # (C, 2) pixel-space cotangent of the probe
    visible: jax.Array,        # (C,) bool — gaussian contributed this step
    img_w: int,
    img_h: int,
) -> StrategyState:
    norm = jnp.linalg.norm(means2d_grad, axis=-1) * (max(img_w, img_h) * 0.5)
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(visible, norm, 0.0),
        grad_count=state.grad_count + visible.astype(jnp.int32),
    )


def _rank_match_scatter(
    params: GaussianParams, new_vals: GaussianParams, want_new: jax.Array
) -> tuple[GaussianParams, jax.Array]:
    """Write new_vals[i] (for each i with want_new[i]) into a dead slot.

    Deterministic: the r-th wanted candidate goes to the r-th dead slot. If
    there are more candidates than dead slots, the excess (lowest-rank) are
    dropped — capacity pressure is reported by the trainer via alive fraction.
    Returns (params, filled_slot_mask).
    """
    capacity = params.alive.shape[0]
    alive_b = params.alive > 0.5
    dead_slots = jnp.argsort(alive_b)               # dead (False) first, stable
    n_dead = capacity - alive_b.sum()

    cand_rank = jnp.cumsum(want_new.astype(jnp.int32)) - 1   # rank among wanted
    ok = want_new & (cand_rank < n_dead)
    # target slot for each candidate (garbage for ~ok, masked in scatter)
    target = dead_slots[jnp.clip(cand_rank, 0, capacity - 1)]
    safe_target = jnp.where(ok, target, capacity)   # OOB drops the write

    def scatter(dst, src):
        # dst (C, ...), src (C, ...): dst[target[i]] = src[i] where ok[i]
        return dst.at[safe_target].set(src, mode="drop")

    out = GaussianParams(
        means=scatter(params.means, new_vals.means),
        scales_log=scatter(params.scales_log, new_vals.scales_log),
        quats=scatter(params.quats, new_vals.quats),
        opacities_logit=scatter(params.opacities_logit, new_vals.opacities_logit),
        features_dc=scatter(params.features_dc, new_vals.features_dc),
        features_rest=scatter(params.features_rest, new_vals.features_rest),
        alive=scatter(params.alive, jnp.ones_like(params.alive)),
    )
    filled = (
        jnp.zeros((capacity,), bool).at[safe_target].set(True, mode="drop")
    )
    return out, filled


def make_refine(config: SplatfactoConfig):
    """Build a jitted refine(params, state, step) for this config."""

    def _refine(params: GaussianParams, state: StrategyState, step: jax.Array):
        key, k_split = jax.random.split(state.key)
        scales = jnp.exp(params.scales_log)
        opac = jax.nn.sigmoid(params.opacities_logit)
        alive_b = params.alive > 0.5

        # ---- cull ----
        cull = alive_b & (opac < config.cull_alpha_thresh)
        after_warmup = step > config.warmup_length
        cull = cull | (
            alive_b
            & after_warmup
            & (scales.max(axis=-1) > config.cull_scale_thresh)
        )
        alive_b = alive_b & ~cull

        # ---- densify candidates ----
        avg_grad = state.grad_accum / jnp.maximum(state.grad_count, 1)
        do_densify = (step >= config.warmup_length) & (step < config.stop_split_at)
        high = alive_b & (avg_grad > config.densify_grad_thresh) & do_densify
        big = scales.max(axis=-1) > config.densify_size_thresh
        split_mask = high & big
        clone_mask = high & ~big

        # Trim candidates to the available dead slots UP FRONT so a split
        # whose second half cannot be placed does not get its original
        # modified (capacity pressure then just defers the densify).
        want = split_mask | clone_mask
        n_dead = params.alive.shape[0] - alive_b.sum()
        cand_rank = jnp.cumsum(want.astype(jnp.int32)) - 1
        placeable = want & (cand_rank < n_dead)
        split_mask = split_mask & placeable
        clone_mask = clone_mask & placeable

        # ---- build new gaussians (one new slot per candidate) ----
        # split: sample a new position from the gaussian; shrink both copies.
        R = se3.quat_to_rotmat(se3.quat_normalize(params.quats))
        eps = jax.random.normal(k_split, params.means.shape)
        offset = jnp.einsum("nij,nj->ni", R, eps * scales)
        shrink = jnp.log(1.6)
        new_means = jnp.where(split_mask[:, None], params.means + offset, params.means)
        new_scales = jnp.where(
            split_mask[:, None], params.scales_log - shrink, params.scales_log
        )
        new_vals = GaussianParams(
            means=new_means,
            scales_log=new_scales,
            quats=params.quats,
            opacities_logit=params.opacities_logit,
            features_dc=params.features_dc,
            features_rest=params.features_rest,
            alive=jnp.ones_like(params.alive),
        )

        # split also modifies the ORIGINAL in place (second sample + shrink)
        eps2 = jax.random.normal(jax.random.fold_in(k_split, 1), params.means.shape)
        offset2 = jnp.einsum("nij,nj->ni", R, eps2 * scales)
        params = params._replace(
            means=jnp.where(split_mask[:, None], params.means + offset2, params.means),
            scales_log=jnp.where(
                split_mask[:, None], params.scales_log - shrink, params.scales_log
            ),
            alive=alive_b.astype(params.alive.dtype),
        )

        params, filled = _rank_match_scatter(params, new_vals, split_mask | clone_mask)

        # Slots whose parameters are brand new (filled, split originals, culled)
        # — the trainer zeroes their Adam moments (splatfacto resets opt state
        # for dup/split params).
        changed = filled | split_mask | cull

        info = {
            "n_culled": cull.sum(),
            "n_split": split_mask.sum(),
            "n_cloned": clone_mask.sum(),
            "n_alive": (params.alive > 0.5).sum(),
        }
        new_state = StrategyState(
            grad_accum=jnp.zeros_like(state.grad_accum),
            grad_count=jnp.zeros_like(state.grad_count),
            key=key,
        )
        return params, new_state, changed, info

    return jax.jit(_refine)


def make_reset_opacity(config: SplatfactoConfig):
    """Opacity reset (every reset_alpha_every refinements): clamp opacities to
    2x the cull threshold (splatfacto 1.1.0 reset value) — low enough that
    transient blobs must re-earn opacity, high enough that nothing is
    mass-culled at the next refine. The trainer additionally pauses
    densify/cull for num_train_images + refine_every steps after a reset."""
    reset_val = _logit(min(config.cull_alpha_thresh * 2.0, 0.99))

    @jax.jit
    def _reset(params: GaussianParams) -> GaussianParams:
        return params._replace(
            opacities_logit=jnp.minimum(params.opacities_logit, reset_val)
        )

    return _reset


def grow_capacity(params: GaussianParams, new_capacity: int) -> GaussianParams:
    """Double the padded capacity (host-side; triggers recompile downstream)."""
    cap = params.alive.shape[0]
    if new_capacity <= cap:
        return params
    pad = new_capacity - cap

    def pad_arr(a, fill=0.0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    return GaussianParams(
        means=pad_arr(params.means),
        scales_log=pad_arr(params.scales_log, -8.0),
        quats=pad_arr(params.quats).at[cap:, 0].set(1.0),
        opacities_logit=pad_arr(params.opacities_logit, -10.0),
        features_dc=pad_arr(params.features_dc),
        features_rest=pad_arr(params.features_rest),
        alive=pad_arr(params.alive, 0.0),
    )
