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
from ..data.camera import get_rays
from ..system.avatar import AvatarModel, animate, update_avatar_stats
from ..training.gs_trainer import AvatarTrainState, _render_with_dummy
from ..training.losses import (
    sigma_margin_loss,
    sparsity_loss,
    volume_sparsity_loss,
)
from ..training.nerf_trainer import NeRFTrainState, _render_image
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
    bg_net=None,
    bg_tx=None,
    gparams_shardings=None,
    placement=None,
    static_gaussians=None,
):
    """Batched avatar SDS step: one view per mesh slot.

    Call with per-view batches (leading dim B = mesh size): extrinsic
    (B, 4, 4), intrinsics (B, 3, 3), tanfov (B,), background (B, H, W, 3),
    text/uncond (B, L, D), t (B,), keys (B, 2) uint32, cond (B, h, w, 3).
    With ``per_view_poses`` the SMPLXParams batch dim is the view dim too —
    each chip renders its own pose draw (B independent reference steps
    averaged, the stronger per-step signal); otherwise one pose is
    replicated across views like the reference's batch.

    With ``bg_net``/``bg_tx`` (VERDICT r2 #6: trainable MLP background
    under DP) each view composites the bg MLP evaluated on ITS rays; bg
    params are replicated, their view-mean grads ride the same psum, and
    the call takes ``bg_state=(params, opt)`` + ``c2w`` (B, 4, 4) and
    returns ``(tstate', bg_state', metrics)``.
    """
    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis_name))
    # tensor-parallel guidance weights on a (data, model) mesh (parallel/tp.py)
    gshard = rep if gparams_shardings is None else gparams_shardings
    with_bg = bg_net is not None

    def step(tstate: AvatarTrainState, gparams: GuidanceParams,
             observed_inputs, extrinsic, intrinsics, tanfov, background,
             text_embeds, uncond_embeds, t, keys, cond_image,
             guidance_scale, progress, bg_params, c2w):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points

        def one_view_loss(params, dummy, bgp, obs, extr, intr, tf, bg,
                          c2w1, txt, unc, t1, key, cond):
            if per_view_poses:  # vmap stripped the (B,) view dim; smplx
                obs = jax.tree_util.tree_map(  # forward wants (1, ...)
                    lambda x: x[None], obs)
            if with_bg:
                from ..data.camera import get_rays

                _, rays_d = get_rays(c2w1[None], intr[None], H, W)
                bg = bg_net.apply(bgp, rays_d[0]).reshape(H, W, 3)
            image, out = _render_with_dummy(
                model, state, params, obs, dummy,
                extr, intr, tf, bg, H, W, raster, pgc=pgc,
                placement=placement, static_gaussians=static_gaussians)
            use_cond = guidance.controlnet is not None \
                and gparams.controlnet is not None
            sds = guidance(
                gparams, image[None], txt[None], unc[None], t1[None],
                key, cond_image=cond[None] if use_cond else None,
                neg_embeds=neg_embeds,
                guidance_scale=guidance_scale, progress=progress)
            return lambda_guidance * sds["loss"], out.radii

        obs_axis = 0 if per_view_poses else None

        def loss_fn(params, dummy, bgp):
            losses, radii = jax.vmap(
                one_view_loss,
                in_axes=(None, None, None, obs_axis,
                         0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
            )(params, dummy, bgp, observed_inputs, extrinsic, intrinsics,
              tanfov, background, c2w, text_embeds, uncond_embeds, t, keys,
              cond_image)
            return jnp.mean(losses), jnp.max(radii, axis=0)

        dummy = jnp.zeros((C + M, 2), jnp.float32)
        (loss, radii), (grads, dgrad, bg_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, dummy, bg_params)
        updates, opt_state = tx.update(grads, tstate.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_avatar = update_avatar_stats(
            state._replace(params=params), dgrad[:C], radii[:C])
        return (AvatarTrainState(new_avatar, opt_state, tstate.step + 1),
                {"loss": loss}, bg_grads)

    cond_shard = shd  # cond_image may be None at call sites with controlnet off
    obs_shard = shd if per_view_poses else rep
    jitted = jax.jit(
        step,
        in_shardings=(rep, gshard, obs_shard, shd, shd, shd, shd, shd, shd,
                      shd, shd, cond_shard, rep, rep, rep, shd),
        out_shardings=(rep, rep, rep),
    )
    if with_bg:
        @jax.jit
        def bg_apply(bg_state, bg_grads):
            bg_params, bg_opt = bg_state
            bg_up, bg_opt = bg_tx.update(bg_grads, bg_opt, bg_params)
            return (optax.apply_updates(bg_params, bg_up), bg_opt)

    def call(tstate, gparams, observed_inputs, extrinsic, intrinsics,
             tanfov, background, text_embeds, uncond_embeds, t, keys,
             cond_image=None, guidance_scale=None, progress=None,
             bg_state=None, c2w=None):
        B = extrinsic.shape[0]
        if cond_image is None:
            # placeholder (opacity-0 conditions are never consumed when the
            # guidance has no controlnet); keeps sharding signature static
            cond_image = jnp.zeros((B, 1, 1, 3))
        # annealed per-step CFG scale + csd/ism progress as replicated
        # device scalars (reference: get_guidance_scale, basic.py:404-418)
        gs = jnp.asarray(
            guidance.guidance_scale if guidance_scale is None
            else guidance_scale, jnp.float32)
        pr = jnp.asarray(0.0 if progress is None else progress, jnp.float32)
        if with_bg:
            assert bg_state is not None and c2w is not None, \
                "trainable-background DP step needs bg_state and c2w"
            bgp = bg_state[0]
        else:
            bgp = jnp.zeros(())  # unused placeholder, keeps signature static
            c2w = jnp.zeros((B, 4, 4)) if c2w is None else c2w
        tstate2, metrics, bg_grads = jitted(
            tstate, gparams, observed_inputs, extrinsic, intrinsics, tanfov,
            background, text_embeds, uncond_embeds, t, keys, cond_image,
            gs, pr, bgp, c2w)
        if with_bg:
            return tstate2, bg_apply(bg_state, bg_grads), metrics
        return tstate2, metrics

    return call


def make_nerf_sds_step_dp(
    model,
    guidance: ScoreDistillation,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    image_height: int,
    image_width: int,
    nerf_cfg,
    num_steps: int = 96,
    lambda_guidance: float = 1.0,
    lambda_sigma: float = 1.0,
    sigma_peak: float = 15.0,
    sigma_loss_type: str = "margin",
    max_iteration: int = 10000,
    bg_mode: str = "color",
    ray_chunk: int = 0,
    neg_embeds=None,
    pgc=None,
    tp_lr_weights=None,
    axis_name: str = DATA_AXIS,
    gparams_shardings=None,
):
    """Data-parallel stage-1 NeRF SDS: one camera view per mesh slot.

    The stage-1 scaling story (VERDICT r2 #1): the reference spends 2/3 of
    its budget in NeRF SDS (train_w_expr.sh:27-50, 10k+5k iters) on a
    single GPU; here B independent view draws shard over ``Mesh(('data',))``
    with replicated NeRF params + occupancy grid, XLA mean-reduces the
    per-view gradients over ICI. SDS averages view gradients by
    construction, so the B-view step equals B reference steps averaged —
    v5e-8 sees ~8x views/second of stage-1 signal.

    Per-view batch leading dims (B = mesh size): cam_c2w (B, 4, 4),
    cam_intr (B, 3, 3), bg_color (B, C), text/uncond (B, L, D), t (B,),
    keys (B, 2) uint32, cond_image (B, h, w, 3). ``sigma_pts`` (mesh-surface
    density guidance, trainer.py:718-824) is pose-space and replicated; it
    enters each view's loss identically so the view-mean keeps its weight.
    """
    H, W = image_height, image_width
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis_name))
    gshard = rep if gparams_shardings is None else gparams_shardings
    compact = getattr(nerf_cfg, "compact_steps", 0)
    min_near = getattr(nerf_cfg, "min_near", 0.05)
    upsample = getattr(nerf_cfg, "upsample_steps", 0)
    detach_bg = getattr(nerf_cfg, "detach_bg_weights_sum", False)

    def step(state: NeRFTrainState, grid, gparams: GuidanceParams,
             cam_c2w, cam_intr, bg_color, text_embeds, uncond_embeds, t,
             keys, cond_image, guidance_scale, progress, sigma_pts,
             use_sigma: bool):

        def one_view_loss(params, c2w, intr, bg, txt, unc, t1, key, cond):
            k_render, k_sds, k_vs = jax.random.split(
                jax.random.wrap_key_data(key) if key.dtype == jnp.uint32
                else key, 3)
            img, ren_depth, wsum = _render_image(
                model, params, grid, c2w, intr, H, W, k_render, num_steps,
                bg, bg_mode=bg_mode, ray_chunk=ray_chunk,
                min_near=min_near, upsample_steps=upsample,
                compact_steps=compact, detach_bg_ws=detach_bg)
            if pgc is not None and img.shape[-1] == 3:
                if getattr(pgc, "wants_mask", False):
                    img = pgc(img, jax.lax.stop_gradient(wsum)[..., None])
                else:
                    img = pgc(img)
            use_cond = guidance.controlnet is not None \
                and gparams.controlnet is not None
            sds = guidance(gparams, img[None], txt[None], unc[None],
                           t1[None], k_sds,
                           cond_image=cond[None] if use_cond else None,
                           neg_embeds=neg_embeds,
                           guidance_scale=guidance_scale, progress=progress)
            loss = lambda_guidance * sds["loss"]
            loss = loss + sparsity_loss(wsum.reshape(-1), nerf_cfg,
                                        state.step, max_iteration)
            vs_weight = nerf_cfg.triplane_volume_sparsity \
                if getattr(nerf_cfg, "backbone", "") == "triplane" else 0.0
            if vs_weight > 0.0:
                # triplane ghost-intersection stabilizer — mirrors the
                # single-chip step exactly (same key order) so the DP
                # step keeps its numeric-equivalence guarantee
                rays_o, rays_d = get_rays(c2w[None], intr[None], H, W)
                surf = rays_o[0] + rays_d[0] \
                    * jax.lax.stop_gradient(ren_depth).reshape(-1, 1)
                loss = loss + vs_weight * volume_sparsity_loss(
                    model, params, k_vs, surface_points=surf,
                    surface_valid=jax.lax.stop_gradient(wsum).reshape(-1)
                    > 0.5)
            return loss

        def loss_fn(params):
            losses = jax.vmap(
                one_view_loss,
                in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0),
            )(params, cam_c2w, cam_intr, bg_color, text_embeds,
              uncond_embeds, t, keys, cond_image)
            loss = jnp.mean(losses)
            metrics = {"sds_loss": loss}
            if use_sigma and sigma_pts is not None:
                sg = sigma_margin_loss(model, params, sigma_pts,
                                       peak=sigma_peak,
                                       loss_type=sigma_loss_type)
                loss = loss + lambda_sigma * sg
                metrics["sigma_loss"] = sg
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if tp_lr_weights is not None:
            # 'ddpm' lr_policy: grads are the view mean, so scale by the
            # mean per-timestep weight (time_prior.py:394-431)
            w = jnp.mean(tp_lr_weights[
                jnp.clip(t, 0, tp_lr_weights.shape[0] - 1)])
            updates = jax.tree_util.tree_map(lambda u: u * w, updates)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return NeRFTrainState(params, opt_state, state.step + 1), metrics

    jitted = jax.jit(
        step,
        static_argnames=("use_sigma",),
        in_shardings=(rep, rep, gshard, shd, shd, shd, shd, shd, shd, shd,
                      shd, rep, rep, rep),
        out_shardings=(rep, rep),
    )

    def call(state, grid, gparams, cam_c2w, cam_intr, bg_color,
             text_embeds, uncond_embeds, t, keys, cond_image=None,
             guidance_scale=None, progress=None, sigma_pts=None,
             use_sigma: bool = False):
        B = cam_c2w.shape[0]
        if cond_image is None:
            cond_image = jnp.zeros((B, 1, 1, 3))
        # per-view PRNG keys as raw (B, 2) uint32 so they shard like data
        if hasattr(keys, "dtype") and keys.dtype == jnp.uint32 \
                and keys.ndim == 2:
            key_data = keys
        else:
            key_data = jax.random.key_data(keys)
        gs = jnp.asarray(
            guidance.guidance_scale if guidance_scale is None
            else guidance_scale, jnp.float32)
        pr = jnp.asarray(0.0 if progress is None else progress, jnp.float32)
        return jitted(state, grid, gparams, cam_c2w, cam_intr, bg_color,
                      text_embeds, uncond_embeds, t, key_data, cond_image,
                      gs, pr, sigma_pts, use_sigma)

    return call


def make_vanilla_sds_step_dp(
    model,
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
    gparams_shardings=None,
    placement=None,
    static_gaussians=None,
):
    """Data-parallel SDS step for gs_type='vanilla' (VERDICT r2 #6: lift
    the batch_size==1 restriction). Mirrors ``make_avatar_sds_step_dp``:
    replicated GaussianParams, one view per mesh slot, view-mean grads."""
    from ..gaussian.densify import update_stats
    from ..system.vanilla import animate_vanilla
    from ..training.gs_trainer import VanillaTrainState

    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis_name))
    gshard = rep if gparams_shardings is None else gparams_shardings

    def step(tstate, gparams: GuidanceParams, observed_inputs,
             extrinsic, intrinsics, tanfov, background,
             text_embeds, uncond_embeds, t, keys, cond_image,
             guidance_scale, progress):
        vstate = tstate.avatar
        C = vstate.capacity

        def one_view_loss(params, dummy, obs, extr, intr, tf, bg, txt, unc,
                          t1, key, cond):
            if per_view_poses:
                obs = jax.tree_util.tree_map(lambda x: x[None], obs)
            st = vstate._replace(
                gaussians=vstate.gaussians._replace(params=params))
            gs = animate_vanilla(model, st, obs)
            if placement is not None:
                from ..system.avatar import place_gaussians
                gs = place_gaussians(gs, *placement)
            dm = dummy
            if static_gaussians is not None:
                from ..system.avatar import merge_gaussians
                gs = merge_gaussians(gs, static_gaussians)
                dm = jnp.concatenate(
                    [dummy, jnp.zeros(
                        (static_gaussians.positions.shape[0], 2),
                        dummy.dtype)])
            cov3d = R.covariance3d(gs.quats, gs.scales)
            g2d = R.project_gaussians(
                gs.positions, cov3d, gs.opacities, gs.colors, extr, intr,
                H, W, tanfov=tf, alive=gs.alive)
            g2d = g2d._replace(means2d=g2d.means2d + dm)
            out = R.rasterize_projected(g2d, H, W, **raster)
            image = out.image + (1.0 - out.alpha)[..., None] * bg
            if pgc is not None and image.shape[-1] == 3:
                image = pgc(image)
            use_cond = guidance.controlnet is not None \
                and gparams.controlnet is not None
            sds = guidance(gparams, image[None], txt[None], unc[None],
                           t1[None], key,
                           cond_image=cond[None] if use_cond else None,
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

        dummy = jnp.zeros((C, 2), jnp.float32)
        (loss, radii), (grads, dgrad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            vstate.gaussians.params, dummy)
        updates, opt_state = tx.update(grads, tstate.opt_state,
                                       vstate.gaussians.params)
        params = optax.apply_updates(vstate.gaussians.params, updates)
        gstate = update_stats(
            vstate.gaussians._replace(params=params), dgrad[:C], radii[:C])
        return (VanillaTrainState(vstate._replace(gaussians=gstate),
                                  opt_state, tstate.step + 1),
                {"loss": loss})

    obs_shard = shd if per_view_poses else rep
    jitted = jax.jit(
        step,
        in_shardings=(rep, gshard, obs_shard, shd, shd, shd, shd, shd, shd,
                      shd, shd, shd, rep, rep),
        out_shardings=(rep, rep),
    )

    def call(tstate, gparams, observed_inputs, extrinsic, intrinsics,
             tanfov, background, text_embeds, uncond_embeds, t, keys,
             cond_image=None, guidance_scale=None, progress=None):
        if cond_image is None:
            B = extrinsic.shape[0]
            cond_image = jnp.zeros((B, 1, 1, 3))
        gs = jnp.asarray(
            guidance.guidance_scale if guidance_scale is None
            else guidance_scale, jnp.float32)
        pr = jnp.asarray(0.0 if progress is None else progress, jnp.float32)
        return jitted(tstate, gparams, observed_inputs, extrinsic,
                      intrinsics, tanfov, background, text_embeds,
                      uncond_embeds, t, keys, cond_image, gs, pr)

    return call
