"""Adaptive density control with static shapes.

Re-designs the reference ``GaussianDensifier``
(reference: core/gaussian/gaussian_densifier.py:201-387) for XLA: clone /
split / prune are masked scatter writes into the fixed-capacity buffers of
``GaussianState`` instead of tensor resizes + in-place Adam-state surgery
(reference: gaussian_densifier.py:120-182). Optimizer moments are zeroed per
written slot via ``reset_opt_slots``.

Semantics parity:
* stats: accumulate per-step ||dL/dmu_screen|| and max screen radius
  (update_densification_stats, reference:201-209)
* clone: avg grad > threshold and scale <= percent_dense * spatial_scale —
  duplicate in place (reference:230-255)
* split: avg grad > threshold and scale > percent_dense * spatial_scale —
  two children sampled from the gaussian, scales / 1.6 (reference:257-302)
* prune: opacity < min_opacity, or screen/world size too large
  (reference:211-228, 304-325)
* opacity reset: clamp opacity logits to <= reset value (reference:327-335)
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .model import GaussianParams, GaussianState, opacities, scales


class DensifyConfig(NamedTuple):
    grad_threshold: float = 100.0       # SDS-scale default (configs/__init__.py:164)
    percent_dense: float = 0.01
    spatial_scale: float = 1.0
    min_opacity: float = 0.005
    max_screen_size: Optional[float] = None   # prune if max radii exceeds
    max_world_size: Optional[float] = None    # prune if world scale exceeds
    split_scale_shrink: float = 1.6
    enable_clone: bool = True
    enable_split: bool = True
    enable_prune: bool = True
    opacity_reset_value: float = 0.01
    # grad-prune mode (reference: enable_grad_prune,
    # gaussian_densifier.py:360-376): suspend clone/split, prune points
    # whose accumulated screen-grad exceeds grad_threshold; the caller
    # (trainer._maybe_densify) applies the reference's auto-disable window
    # (first third of the densify interval, densifier.py:370-373)
    grad_prune: bool = False


def update_stats(
    state: GaussianState,
    means2d_grad: jnp.ndarray,   # (C, 2) dL/d(screen mean)
    radii: jnp.ndarray,          # (C,) screen radii from the rasterizer
) -> GaussianState:
    """Accumulate densification statistics for visible gaussians
    (reference: gaussian_densifier.py:201-209; visibility = radii > 0)."""
    vis = (radii > 0) & state.alive
    gnorm = jnp.linalg.norm(means2d_grad, axis=-1)
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(vis, gnorm, 0.0),
        grad_denom=state.grad_denom + vis.astype(jnp.float32),
        max_radii=jnp.maximum(state.max_radii, jnp.where(vis, radii, 0.0)),
    )


def allocate_slots(need: jnp.ndarray, alive: jnp.ndarray):
    """Assign each needing entry a dead slot index.

    Args:
        need: (C,) bool — entries requesting one new slot each
        alive: (C,) bool — slot occupancy after pruning

    Returns (dest (C,) int32 — allocated slot per need, C where denied;
             granted (C,) bool).
    """
    C = need.shape[0]
    free = ~alive
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    need_rank = jnp.cumsum(need.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    slot_of_rank = jnp.full((C,), C, jnp.int32)
    slot_of_rank = slot_of_rank.at[
        jnp.where(free, free_rank, C)
    ].set(jnp.arange(C, dtype=jnp.int32), mode="drop")
    granted = need & (need_rank < n_free)
    dest = jnp.where(granted, slot_of_rank[jnp.clip(need_rank, 0, C - 1)], C)
    return dest, granted


def _sample_split_offsets(key, params: GaussianParams) -> jnp.ndarray:
    """Normal samples in the gaussian's own frame (reference:270-281)."""
    from ..utils.transforms import quat_rotate, quat_normalize

    s = scales(params)
    eps = jax.random.normal(key, s.shape) * s
    return quat_rotate(quat_normalize(params.quats), eps)


def densify_step(
    state: GaussianState,
    cfg: DensifyConfig,
    key: jax.Array,
    densify_mask: Optional[jnp.ndarray] = None,
    extra_attrs: Optional[dict] = None,
) -> Tuple[GaussianState, jnp.ndarray]:
    """One clone/split/prune pass. Returns (new_state, written_slots_mask):
    ``written_slots_mask`` marks slots whose parameters were (re)written and
    whose optimizer moments must be reset.

    ``densify_mask`` restricts densification to a subset (the avatar limits
    it to unconstrained gaussians, reference: core/system/scene.py:170-186).

    ``extra_attrs``: dict of per-slot (C, ...) arrays riding along with the
    gaussians (e.g. the vanilla avatar's LBS weights) — children copy their
    parent's value; returns (new_state, written, extras) instead.
    """
    p = state.params
    C = state.capacity
    avg_grad = state.grad_accum / jnp.maximum(state.grad_denom, 1.0)
    s = scales(p)
    max_s = jnp.max(s, axis=-1)
    op = opacities(p)

    eligible = state.alive
    if densify_mask is not None:
        eligible = eligible & densify_mask

    limit = cfg.percent_dense * cfg.spatial_scale
    hot = eligible & (avg_grad > cfg.grad_threshold) & (state.grad_denom > 0)
    if cfg.grad_prune:
        # grad-prune mode: no growth, high-gradient points are pruned
        # (reference: gaussian_densifier.py:360-376)
        clone_mask = split_mask = jnp.zeros(C, bool)
    else:
        clone_mask = hot & (max_s <= limit) if cfg.enable_clone \
            else jnp.zeros(C, bool)
        split_mask = hot & (max_s > limit) if cfg.enable_split \
            else jnp.zeros(C, bool)

    prune_mask = eligible & (op < cfg.min_opacity)
    if cfg.max_screen_size is not None:
        prune_mask = prune_mask | (eligible & (state.max_radii > cfg.max_screen_size))
    if cfg.max_world_size is not None:
        prune_mask = prune_mask | (eligible & (max_s > cfg.max_world_size))
    if cfg.grad_prune:
        prune_mask = prune_mask | hot
    if not cfg.enable_prune:
        prune_mask = jnp.zeros(C, bool)
    # a split parent is consumed (its slot is overwritten by child 1)
    prune_mask = prune_mask & ~split_mask

    alive_after = state.alive & ~prune_mask

    # candidates: one new slot per clone, one per split (child 2).
    need = clone_mask | split_mask
    dest, granted = allocate_slots(need, alive_after)

    # ---- build source values --------------------------------------------
    k1, k2 = jax.random.split(key)
    off1 = _sample_split_offsets(k1, p)
    off2 = _sample_split_offsets(k2, p)
    split_scales = jnp.log(jnp.maximum(s / cfg.split_scale_shrink, 1e-10))

    # child written into the *new* slot: clone copy, or split child 2
    new_means = jnp.where(split_mask[:, None], p.means + off2, p.means)
    new_logs = jnp.where(split_mask[:, None], split_scales, p.log_scales)

    def scatter(dst_arr, src_arr):
        return dst_arr.at[dest].set(src_arr, mode="drop")

    params = GaussianParams(
        means=scatter(p.means, new_means),
        sh_dc=scatter(p.sh_dc, p.sh_dc),
        sh_rest=scatter(p.sh_rest, p.sh_rest),
        opacity_logit=scatter(p.opacity_logit, p.opacity_logit),
        log_scales=scatter(p.log_scales, new_logs),
        quats=scatter(p.quats, p.quats),
    )
    # split parent slot becomes child 1: offset position, shrunk scale
    sp = split_mask & granted
    params = params._replace(
        means=jnp.where(sp[:, None], p.means + off1, params.means),
        log_scales=jnp.where(sp[:, None], split_scales, params.log_scales),
    )

    alive_new = alive_after.at[dest].set(True, mode="drop")

    written = jnp.zeros((C,), bool).at[dest].set(True, mode="drop")
    written = written | sp | prune_mask

    z = jnp.zeros((C,), jnp.float32)
    new_state = GaussianState(
        params=params,
        alive=alive_new,
        grad_accum=z, grad_denom=z, max_radii=z,
    )
    if extra_attrs is not None:
        extras = {k: scatter(jnp.asarray(v), jnp.asarray(v))
                  for k, v in extra_attrs.items()}
        return new_state, written, extras
    return new_state, written


def reset_opacity(state: GaussianState, value: float = 0.01) -> GaussianState:
    """Clamp opacities to <= value (reference: gaussian_densifier.py:327-335)."""
    logit = jnp.log(value / (1.0 - value))
    p = state.params
    return state._replace(
        params=p._replace(
            opacity_logit=jnp.minimum(p.opacity_logit, logit)
        )
    )


def reset_opt_slots(opt_state, written: jnp.ndarray):
    """Zero first/second Adam moments for rewritten slots. Works on any optax
    state pytree whose moment arrays lead with the capacity dim — the
    static-shape replacement for the reference's cat_tensors_to_optimizer /
    prune_optimizer (reference: gaussian_densifier.py:120-182)."""
    C = written.shape[0]

    def zero(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == C:
            mask = written.reshape((C,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, 0.0, leaf)
        return leaf

    return jax.tree_util.tree_map(zero, opt_state)
