"""Data-parallel SDS training over a device mesh.

The reference is single-GPU with batch_size=1 (configs/__init__.py:455,520).
The TPU build's scaling axis (SURVEY.md §7.10): shard the *view batch* over
``Mesh(('data',))`` — each chip renders its own camera/pose draw and runs
the frozen guidance on it; model state is replicated and per-view gradients
are mean-reduced by XLA collectives over ICI. SDS averages gradients over
views by construction, so B-view DP training is mathematically B independent
reference steps averaged — a strictly stronger training signal per step.

Implementation: ``jax.jit`` with explicit ``in_shardings`` (replicated state,
batch-sharded views). XLA inserts the psum for the grads; no hand-written
collectives needed.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..gaussian.densify import reset_opt_slots
from ..guidance.sds import GuidanceParams, ScoreDistillation
from ..ops import rasterize as R
from ..system.avatar import AvatarModel, animate, update_avatar_stats
from ..training.gs_trainer import AvatarTrainState, _render_with_dummy
from .mesh import DATA_AXIS, make_mesh


def make_avatar_sds_step_dp(
    model: AvatarModel,
    guidance: ScoreDistillation,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    image_height: int,
    image_width: int,
    tile_size: int = 16,
    capacity: int = 512,
    chunk: int = 64,
    max_tiles_per_gaussian: int = 8,
    lambda_guidance: float = 1.0,
    axis_name: str = DATA_AXIS,
    per_view_poses: bool = False,
    neg_embeds=None,
    pgc=None,
):
    """Batched avatar SDS step: one view per mesh slot.

    Call with per-view batches (leading dim B = mesh size): extrinsic
    (B, 4, 4), intrinsics (B, 3, 3), tanfov (B,), background (B, H, W, 3),
    text/uncond (B, L, D), t (B,), keys (B, 2) uint32, cond (B, h, w, 3).
    With ``per_view_poses`` the SMPLXParams batch dim is the view dim too —
    each chip renders its own pose draw (B independent reference steps
    averaged, the stronger per-step signal); otherwise one pose is
    replicated across views like the reference's batch.
    """
    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis_name))

    def step(tstate: AvatarTrainState, gparams: GuidanceParams,
             observed_inputs, extrinsic, intrinsics, tanfov, background,
             text_embeds, uncond_embeds, t, keys, cond_image,
             guidance_scale, progress):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points

        def one_view_loss(params, dummy, obs, extr, intr, tf, bg, txt, unc,
                          t1, key, cond):
            if per_view_poses:  # vmap stripped the (B,) view dim; smplx
                obs = jax.tree_util.tree_map(  # forward wants (1, ...)
                    lambda x: x[None], obs)
            image, out = _render_with_dummy(
                model, state, params, obs, dummy,
                extr, intr, tf, bg, H, W, raster, pgc=pgc)
            use_cond = guidance.controlnet is not None \
                and gparams.controlnet is not None
            sds = guidance(
                gparams, image[None], txt[None], unc[None], t1[None],
                key, cond_image=cond[None] if use_cond else None,
                neg_embeds=neg_embeds,
                guidance_scale=guidance_scale, progress=progress)
            return lambda_guidance * sds["loss"], out.radii

        obs_axis = 0 if per_view_poses else None

        def loss_fn(params, dummy):
            losses, radii = jax.vmap(
                one_view_loss,
                in_axes=(None, None, obs_axis, 0, 0, 0, 0, 0, 0, 0, 0, 0),
            )(params, dummy, observed_inputs, extrinsic, intrinsics, tanfov,
              background, text_embeds, uncond_embeds, t, keys, cond_image)
            return jnp.mean(losses), jnp.max(radii, axis=0)

        dummy = jnp.zeros((C + M, 2), jnp.float32)
        (loss, radii), (grads, dgrad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, dummy)
        updates, opt_state = tx.update(grads, tstate.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_avatar = update_avatar_stats(
            state._replace(params=params), dgrad[:C], radii[:C])
        return (AvatarTrainState(new_avatar, opt_state, tstate.step + 1),
                {"loss": loss})

    cond_shard = shd  # cond_image may be None at call sites with controlnet off
    obs_shard = shd if per_view_poses else rep
    jitted = jax.jit(
        step,
        in_shardings=(rep, rep, obs_shard, shd, shd, shd, shd, shd, shd,
                      shd, shd, cond_shard, rep, rep),
        out_shardings=(rep, rep),
    )

    def call(tstate, gparams, observed_inputs, extrinsic, intrinsics,
             tanfov, background, text_embeds, uncond_embeds, t, keys,
             cond_image=None, guidance_scale=None, progress=None):
        if cond_image is None:
            B = extrinsic.shape[0]
            # placeholder (opacity-0 conditions are never consumed when the
            # guidance has no controlnet); keeps sharding signature static
            cond_image = jnp.zeros((B, 1, 1, 3))
        # annealed per-step CFG scale + csd/ism progress as replicated
        # device scalars (reference: get_guidance_scale, basic.py:404-418)
        gs = jnp.asarray(
            guidance.guidance_scale if guidance_scale is None
            else guidance_scale, jnp.float32)
        pr = jnp.asarray(0.0 if progress is None else progress, jnp.float32)
        return jitted(tstate, gparams, observed_inputs, extrinsic,
                      intrinsics, tanfov, background, text_embeds,
                      uncond_embeds, t, keys, cond_image, gs, pr)

    return call
