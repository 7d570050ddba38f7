"""Stage-2 trainers: animatable-avatar SDS and NeRF->3DGS distillation.

(reference: core/trainer.py — ``train``/``train_forward`` 826-1017 with
stage='gs' drive Scene.forward through the rasterizer and the diffusion
guidance, accumulate densification stats from screen-space mean gradients,
and step the six avatar optimizers; ``pretrain_nerf2gs`` 1281-1386 distills
frozen stage-1 NeRF renders into the avatar with L1+DSSIM.)

Screen-space mean gradients (the densifier's signal,
gaussian_densifier.py:206) are obtained with a zero "dummy" offset added to
the projected means inside the loss: its gradient IS dL/d(means2d), without
retaining intermediate buffers — the JAX replacement for the reference's
``retain_grad`` on screenspace_points (gaussian_renderer.py:141-148).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..gaussian.densify import DensifyConfig, reset_opt_slots
from ..guidance.sds import GuidanceParams, ScoreDistillation
from ..human.smplx_model import SMPLXParams
from ..ops import rasterize as R
from ..system.avatar import (
    AvatarModel,
    AvatarState,
    animate,
    densify_avatar,
    merge_gaussians,
    update_avatar_stats,
)
from .losses import image_reconstruction_loss


class AvatarTrainState(NamedTuple):
    avatar: AvatarState
    opt_state: Any
    step: jnp.ndarray


def init_avatar_train_state(state: AvatarState,
                            tx: optax.GradientTransformation,
                            ) -> AvatarTrainState:
    return AvatarTrainState(avatar=state, opt_state=tx.init(state.params),
                            step=jnp.zeros((), jnp.int32))


def _render_with_dummy(model: AvatarModel, state: AvatarState, params,
                       observed_inputs, dummy, extrinsic, intrinsics, tanfov,
                       background, H, W, raster, pgc=None, placement=None,
                       static_gaussians=None):
    """Animate + project (+dummy on means2d) + rasterize + composite.

    ``pgc``: optional custom_vjp image hook — RGB pixel-gradient clipping
    (reference: register_hook on inputs, basic.py:795-817).
    ``placement``: optional (avatar_scale, avatar_transl) scene placement
    (reference: scene.py:81-93).
    ``static_gaussians``: frozen GaussiansOut appended before rasterization
    — the PLY gaussian background (reference: --render.use_gs_background,
    scene.py:123-132); appended AFTER the avatar so densification stats
    keep slicing [:C]."""
    gs = animate(model, state._replace(params=params), observed_inputs)
    if placement is not None:
        from ..system.avatar import place_gaussians
        gs = place_gaussians(gs, *placement)
    if static_gaussians is not None:
        gs = merge_gaussians(gs, static_gaussians)
        dummy = jnp.concatenate(
            [dummy, jnp.zeros((static_gaussians.positions.shape[0], 2),
                              dummy.dtype)])
    cov3d = R.covariance3d(gs.quats, gs.scales)
    g2d = R.project_gaussians(
        gs.positions, cov3d, gs.opacities, gs.colors, extrinsic, intrinsics,
        H, W, tanfov=tanfov, alive=gs.alive)
    g2d = g2d._replace(means2d=g2d.means2d + dummy)
    out = R.rasterize_projected(g2d, H, W, **raster)
    image = out.image + (1.0 - out.alpha)[..., None] * background
    if pgc is not None and image.shape[-1] == 3:
        image = pgc(image)
    return image, out


def make_avatar_sds_step(
    model: AvatarModel,
    guidance: ScoreDistillation,
    tx: optax.GradientTransformation,
    image_height: int,
    image_width: int,
    tile_size: int = 16,
    capacity: int = 512,
    chunk: int = 64,
    max_tiles_per_gaussian: int = 16,
    lambda_guidance: float = 1.0,
    neg_embeds=None,
    pgc=None,
    placement=None,
    static_gaussians=None,
):
    """One avatar SDS step. Returns (state', metrics).

    ``neg_embeds``: the negative-prompt embedding for the csd/nfsd 3-way
    CFG (reference: prepare_text_embeddings with ('null','text','neg'),
    basic.py:557-563) — constant, so it bakes into the jitted program."""
    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)
    n_total = None  # resolved at trace time from the merged output

    @jax.jit
    def step(tstate: AvatarTrainState, gparams: GuidanceParams,
             observed_inputs: SMPLXParams,
             extrinsic, intrinsics, tanfov, background,
             text_embeds, uncond_embeds, t, key,
             cond_image=None, guidance_scale=None, progress=None):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points

        def loss_fn(params, dummy):
            image, out = _render_with_dummy(
                model, state, params, observed_inputs, dummy,
                extrinsic, intrinsics, tanfov, background, H, W, raster,
                pgc=pgc, placement=placement,
                static_gaussians=static_gaussians)
            sds = guidance(gparams, image[None], text_embeds, uncond_embeds,
                           t, key, cond_image=cond_image,
                           neg_embeds=neg_embeds,
                           guidance_scale=guidance_scale, progress=progress)
            loss = lambda_guidance * sds["loss"]
            return loss, (out.radii, {"sds_loss": sds["loss"],
                                      "tile_overflow": out.overflow})

        dummy = jnp.zeros((C + M, 2), jnp.float32)
        (loss, (radii, metrics)), (grads, dgrad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, dummy)

        updates, opt_state = tx.update(grads, tstate.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_avatar = update_avatar_stats(
            state._replace(params=params), dgrad[:C], radii[:C])
        metrics["loss"] = loss
        return AvatarTrainState(new_avatar, opt_state, tstate.step + 1), metrics

    return step


def make_nerf2gs_step(
    model: AvatarModel,
    tx: optax.GradientTransformation,
    image_height: int,
    image_width: int,
    tile_size: int = 16,
    capacity: int = 512,
    chunk: int = 64,
    lambda_dssim: float = 0.2,
):
    """Distill frozen NeRF target renders into the avatar
    (reference: pretrain_nerf2gs, trainer.py:1281-1386: L1+DSSIM on the
    foreground, target alpha masks the background)."""
    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk)

    @jax.jit
    def step(tstate: AvatarTrainState, observed_inputs,
             extrinsic, intrinsics, tanfov, background,
             target_image, target_alpha):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points

        def loss_fn(params, dummy):
            image, out = _render_with_dummy(
                model, state, params, observed_inputs, dummy,
                extrinsic, intrinsics, tanfov, background, H, W, raster)
            m = target_alpha[..., None]
            loss = image_reconstruction_loss(image * m, target_image * m,
                                             lambda_dssim)
            return loss, out.radii

        dummy = jnp.zeros((C + M, 2), jnp.float32)
        (loss, radii), (grads, dgrad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, dummy)
        updates, opt_state = tx.update(grads, tstate.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_avatar = update_avatar_stats(
            state._replace(params=params), dgrad[:C], radii[:C])
        return (AvatarTrainState(new_avatar, opt_state, tstate.step + 1),
                {"loss": loss})

    return step


def densify(tstate: AvatarTrainState, cfg: DensifyConfig, key: jax.Array,
            model: Optional[AvatarModel] = None) -> AvatarTrainState:
    """Clone/split/prune + per-slot optimizer-moment reset
    (reference: Scene.densify -> GaussianDensifier.__call__ +
    Adam-state surgery, gaussian_densifier.py:120-182, 338-387).

    Pass ``model`` to enable the min-opacity prune on the MLP-decoded
    opacities (reference: prune_opacity_threshold,
    gaussian_densifier.py:211-228)."""
    from ..system.avatar import decode_opacities

    op = decode_opacities(model, tstate.avatar) if model is not None else None
    new_avatar, written = densify_avatar(tstate.avatar, cfg, key,
                                         opacities=op)
    opt_state = reset_opt_slots(tstate.opt_state, written)
    return AvatarTrainState(new_avatar, opt_state, tstate.step)


class VanillaTrainState(NamedTuple):
    """Train state for gs_type='vanilla' (reference: VanillaAvatar,
    avatar.py:334-407 — plain learnable 3DGS rigged by LBS)."""

    avatar: Any            # system.vanilla.VanillaAvatarState
    opt_state: Any
    step: jnp.ndarray


def make_vanilla_sds_step(
    model,                 # system.vanilla.VanillaAvatarModel
    guidance: ScoreDistillation,
    tx: optax.GradientTransformation,
    image_height: int,
    image_width: int,
    tile_size: int = 16,
    capacity: int = 512,
    chunk: int = 64,
    max_tiles_per_gaussian: int = 16,
    lambda_guidance: float = 1.0,
    neg_embeds=None,
    pgc=None,
    placement=None,
    static_gaussians=None,
):
    """One SDS step on the vanilla LBS avatar: its GaussianParams (means,
    SH features, opacity, scales, quats) are the learnables; LBS weights
    stay fixed from init (reference: VanillaAvatar.get_optimizer via
    GaussianModel, avatar.py:334-407)."""
    from ..system.vanilla import animate_vanilla

    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)

    @jax.jit
    def step(tstate: VanillaTrainState, gparams: GuidanceParams,
             observed_inputs, extrinsic, intrinsics, tanfov, background,
             text_embeds, uncond_embeds, t, key, campos=None,
             cond_image=None, guidance_scale=None, progress=None):
        vstate = tstate.avatar
        C = vstate.capacity

        def loss_fn(params, dummy):
            st = vstate._replace(
                gaussians=vstate.gaussians._replace(params=params))
            gs = animate_vanilla(model, st, observed_inputs, campos=campos)
            if placement is not None:
                from ..system.avatar import place_gaussians
                gs = place_gaussians(gs, *placement)
            dm = dummy
            if static_gaussians is not None:
                gs = merge_gaussians(gs, static_gaussians)
                dm = jnp.concatenate(
                    [dummy, jnp.zeros(
                        (static_gaussians.positions.shape[0], 2),
                        dummy.dtype)])
            cov3d = R.covariance3d(gs.quats, gs.scales)
            g2d = R.project_gaussians(
                gs.positions, cov3d, gs.opacities, gs.colors, extrinsic,
                intrinsics, H, W, tanfov=tanfov, alive=gs.alive)
            g2d = g2d._replace(means2d=g2d.means2d + dm)
            out = R.rasterize_projected(g2d, H, W, **raster)
            image = out.image + (1.0 - out.alpha)[..., None] * background
            if pgc is not None and image.shape[-1] == 3:
                image = pgc(image)
            sds = guidance(gparams, image[None], text_embeds, uncond_embeds,
                           t, key, cond_image=cond_image,
                           neg_embeds=neg_embeds,
                           guidance_scale=guidance_scale, progress=progress)
            loss = lambda_guidance * sds["loss"]
            return loss, out.radii

        dummy = jnp.zeros((C, 2), jnp.float32)
        (loss, radii), (grads, dgrad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            vstate.gaussians.params, dummy)
        updates, opt_state = tx.update(grads, tstate.opt_state,
                                       vstate.gaussians.params)
        params = optax.apply_updates(vstate.gaussians.params, updates)
        from ..gaussian.densify import update_stats

        gstate = update_stats(
            vstate.gaussians._replace(params=params), dgrad[:C], radii[:C])
        return (VanillaTrainState(vstate._replace(gaussians=gstate),
                                  opt_state, tstate.step + 1),
                {"loss": loss})

    return step


def densify_vanilla(tstate: VanillaTrainState, cfg: DensifyConfig,
                    key: jax.Array) -> VanillaTrainState:
    """Clone/split/prune on the vanilla avatar's gaussians; children copy
    the parent's LBS weights (reference: GaussianDensifier on VanillaAvatar
    + the LBS rig, gaussian_densifier.py:120-182)."""
    from ..gaussian.densify import densify_step

    vstate = tstate.avatar
    gstate, written, extras = densify_step(
        vstate.gaussians, cfg, key,
        extra_attrs={"lbs": vstate.lbs_weights})
    opt_state = reset_opt_slots(tstate.opt_state, written)
    return VanillaTrainState(
        vstate._replace(gaussians=gstate, lbs_weights=extras["lbs"]),
        opt_state, tstate.step)


def make_vanilla_render(model, image_height: int, image_width: int,
                        tile_size: int = 16, capacity: int = 512,
                        chunk: int = 64, max_tiles_per_gaussian: int = 16,
                        extra_models: tuple = (), placement=None,
                        static_gaussians=None):
    """Jit'd eval render for gs_type='vanilla' — same call signature as
    ``make_avatar_render`` so the Trainer's eval path is type-agnostic."""
    from ..system.vanilla import animate_vanilla

    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)

    @jax.jit
    def render(vstate, observed_inputs, extrinsic, intrinsics, tanfov,
               background, extra_states: tuple = ()):
        gs = animate_vanilla(model, vstate, observed_inputs)
        if placement is not None:
            from ..system.avatar import place_gaussians
            gs = place_gaussians(gs, *placement)
        if static_gaussians is not None:
            gs = merge_gaussians(gs, static_gaussians)
        cov3d = R.covariance3d(gs.quats, gs.scales)
        g2d = R.project_gaussians(
            gs.positions, cov3d, gs.opacities, gs.colors, extrinsic,
            intrinsics, H, W, tanfov=tanfov, alive=gs.alive)
        out = R.rasterize_projected(g2d, H, W, pallas_mode="eval", **raster)
        image = out.image + (1.0 - out.alpha)[..., None] * background
        return image, out.alpha, out.depth

    return render


def reset_vanilla_opacity(tstate: VanillaTrainState, value: float = 0.01,
                          ) -> VanillaTrainState:
    """Periodic opacity reset — applicable to the vanilla avatar because
    opacity IS a parameter here (reference: reset_opacity cadence,
    gaussian_densifier.py:304-335)."""
    from ..gaussian.densify import reset_opacity

    g = reset_opacity(tstate.avatar.gaussians, value)
    return VanillaTrainState(tstate.avatar._replace(gaussians=g),
                             tstate.opt_state, tstate.step)


def make_avatar_render(model: AvatarModel, image_height: int,
                       image_width: int, tile_size: int = 16,
                       capacity: int = 512, chunk: int = 64,
                       max_tiles_per_gaussian: int = 16,
                       extra_models: tuple = (), placement=None,
                       static_gaussians=None):
    """Jit'd eval/inference render (reference: evaluate + Scene.forward).

    ``extra_models`` enables scene composition: additional avatars loaded
    from second checkpoints render together (reference: ckpt_extra +
    load_extra_avatar_from_state_dict, scene.py:213-222); pass their states
    as the ``extra_states`` tuple. Multi-person poses: observed_inputs with
    batch dim B>1 assigns person i to avatar i (scene.py:104-121).
    ``placement``: optional (avatar_scale, avatar_transl), per-avatar
    indexed (reference: scene.py:81-93)."""
    from ..system.avatar import merge_gaussians, place_gaussians

    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)

    def _person(observed_inputs, i):
        return jax.tree_util.tree_map(lambda x: x[i: i + 1], observed_inputs)

    def _place(gs, i):
        return gs if placement is None else place_gaussians(
            gs, *placement, index=i)

    @jax.jit
    def render(state: AvatarState, observed_inputs,
               extrinsic, intrinsics, tanfov, background,
               extra_states: tuple = ()):
        B = observed_inputs.body_pose.shape[0]
        gs = _place(animate(
            model, state,
            _person(observed_inputs, 0) if B > 1 else observed_inputs), 0)
        if extra_states:
            parts = [
                _place(animate(
                    m, s, _person(observed_inputs, min(i + 1, B - 1))
                    if B > 1 else observed_inputs), i + 1)
                for i, (m, s) in enumerate(zip(extra_models, extra_states))
            ]
            gs = merge_gaussians(gs, *parts)
        if static_gaussians is not None:
            gs = merge_gaussians(gs, static_gaussians)
        cov3d = R.covariance3d(gs.quats, gs.scales)
        g2d = R.project_gaussians(
            gs.positions, cov3d, gs.opacities, gs.colors, extrinsic,
            intrinsics, H, W, tanfov=tanfov, alive=gs.alive)
        out = R.rasterize_projected(g2d, H, W, pallas_mode="eval", **raster)
        image = out.image + (1.0 - out.alpha)[..., None] * background
        return image, out.alpha, out.depth

    return render


def make_avatar_render_frames(model: AvatarModel, image_height: int,
                              image_width: int, tile_size: int = 16,
                              capacity: int = 512, chunk: int = 64,
                              max_tiles_per_gaussian: int = 16,
                              mesh=None, placement=None):
    """Frame-batched animation rendering: ONE dispatch renders F frames
    (``lax.map`` over stacked poses+cameras inside one jit). On the
    remote-TPU runtime each dispatch pays a host round trip comparable to
    the 1024^2 frame itself, so motion-sequence eval/video rendering should
    batch frames (PERF.md "batched frames" lever; no reference counterpart
    — the reference renders one frame per Python iteration,
    core/trainer.py:1019-1112).

    With ``mesh`` (a ``Mesh(('data',))``), frames are additionally sharded
    over the devices via ``shard_map`` — avatar state replicated, each chip
    running its F/D frame slice — for near-linear multi-chip animation /
    video serving throughput (F must be a multiple of the mesh size; the
    trainer pads its last chunk)."""
    from ..system.avatar import animate as _animate

    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)

    def _one(state, args):
        obs, extr, intr, tf, bg = args
        if obs.body_pose.shape[0] > 1:
            # multi-person pose bundle: render person 0, like
            # make_avatar_render's _person(observed_inputs, 0)
            obs = jax.tree_util.tree_map(lambda x: x[:1], obs)
        gs = _animate(model, state, obs)
        if placement is not None:
            from ..system.avatar import place_gaussians
            gs = place_gaussians(gs, *placement)
        cov3d = R.covariance3d(gs.quats, gs.scales)
        g2d = R.project_gaussians(
            gs.positions, cov3d, gs.opacities, gs.colors, extr, intr,
            H, W, tanfov=tf, alive=gs.alive)
        out = R.rasterize_projected(g2d, H, W, pallas_mode="eval",
                                    **raster)
        img = out.image + (1.0 - out.alpha)[..., None] * bg
        return img, out.alpha, out.depth

    def _frames_body(state, observed_frames, extrinsic, intrinsics,
                     tanfov, bg):
        return jax.lax.map(functools.partial(_one, state),
                           (observed_frames, extrinsic, intrinsics,
                            tanfov, bg))

    if mesh is not None:
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        D = mesh.shape[DATA_AXIS]
        kw = dict(mesh=mesh,
                  in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                            P(DATA_AXIS), P(DATA_AXIS)),
                  out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)))
        # the rasterizer's scan mixes device-unvarying carries with
        # device-varying gathers — skip the vma/rep check (no collectives
        # in this body at all: frames are embarrassingly parallel)
        try:
            body = shard_map(_frames_body, check_vma=False, **kw)
        except TypeError:
            try:
                body = shard_map(_frames_body, check_rep=False, **kw)
            except TypeError:
                body = shard_map(_frames_body, **kw)

        @jax.jit
        def render_frames_dp(state: AvatarState, observed_frames,
                             extrinsic, intrinsics, tanfov, background):
            F = extrinsic.shape[0]
            assert F % D == 0, (
                f"frame batch {F} must be a multiple of the mesh size {D}")
            bg = background
            if bg.ndim == 3:
                bg = jnp.broadcast_to(bg, (F,) + bg.shape)
            return body(state, observed_frames, extrinsic, intrinsics,
                        tanfov, bg)

        return render_frames_dp

    @jax.jit
    def render_frames(state: AvatarState, observed_frames,
                      extrinsic, intrinsics, tanfov, background):
        """observed_frames: SMPLXParams stacked (F, 1, ...); extrinsic
        (F, 4, 4); intrinsics (F, 3, 3); tanfov (F,); background
        (H, W, 3) shared or (F, H, W, 3). Returns (F, H, W, 3) images +
        (F, H, W) alpha/depth."""
        F = extrinsic.shape[0]
        bg = background
        if bg.ndim == 3:
            bg = jnp.broadcast_to(bg, (F,) + bg.shape)
        return _frames_body(state, observed_frames, extrinsic, intrinsics,
                            tanfov, bg)

    return render_frames


def make_avatar_sds_step_split(
    model: AvatarModel,
    guidance: ScoreDistillation,
    tx: optax.GradientTransformation,
    image_height: int,
    image_width: int,
    tile_size: int = 16,
    capacity: int = 512,
    chunk: int = 64,
    max_tiles_per_gaussian: int = 8,
    lambda_guidance: float = 1.0,
    bg_net=None,
    bg_tx: Optional[optax.GradientTransformation] = None,
    neg_embeds=None,
    pgc=None,
    placement=None,
    static_gaussians=None,
):
    """Avatar SDS step as THREE small jitted programs instead of one giant
    graph: (A) render -> VAE-encode forward, (B) frozen UNet eps ->
    latent gradient (no autodiff — the reference runs the UNet under
    no_grad for the same reason, basic.py:581), (C) re-render with the
    latent gradient injected (SpecifyGradient) and differentiate.

    Functionally identical to ``make_avatar_sds_step`` (the render forward
    is recomputed once in C, ~15% overhead) but each XLA program stays small
    — giant fused graphs can exceed compiler limits, and A/B/C pipeline
    better on the device queue.

    With ``bg_net``/``bg_tx`` (a BackgroundMLPNet + its optimizer) the
    background is the trainable ray-direction MLP updated jointly with the
    avatar (reference: MLPBackground trained with Adan alongside the model,
    background.py:55-89 + trainer.py:594-598); the step then takes
    ``bg_state=(params, opt_state)`` and ``c2w`` and returns
    ``(tstate', bg_state', metrics)``.
    """
    H, W = image_height, image_width
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)

    def _image(params, state, observed_inputs, dummy, extrinsic, intrinsics,
               tanfov, background):
        image, out = _render_with_dummy(
            model, state, params, observed_inputs, dummy,
            extrinsic, intrinsics, tanfov, background, H, W, raster,
            pgc=pgc, placement=placement,
            static_gaussians=static_gaussians)
        return image, out

    def _bg_image(bg_params, c2w, intrinsics):
        from ..data.camera import get_rays

        _, rays_d = get_rays(c2w[None], intrinsics[None], H, W)
        return bg_net.apply(bg_params, rays_d[0]).reshape(H, W, 3)

    @jax.jit
    def render_encode(tstate, gparams, observed_inputs, extrinsic,
                      intrinsics, tanfov, background, dt_probe):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points
        dummy = jnp.zeros((C + M, 2), jnp.float32)
        image, _ = _image(state.params, state, observed_inputs, dummy,
                          extrinsic, intrinsics, tanfov, background)
        return guidance.encode_images(
            gparams, image[None].astype(dt_probe.dtype))

    @jax.jit
    def render_encode_bg(tstate, bg_params, gparams, observed_inputs,
                         extrinsic, intrinsics, tanfov, c2w, dt_probe):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points
        dummy = jnp.zeros((C + M, 2), jnp.float32)
        bgimg = _bg_image(bg_params, c2w, intrinsics)
        image, _ = _image(state.params, state, observed_inputs, dummy,
                          extrinsic, intrinsics, tanfov, bgimg)
        return guidance.encode_images(
            gparams, image[None].astype(dt_probe.dtype))

    @jax.jit
    def apply_grads_bg(tstate, bg_state, gparams, observed_inputs,
                       extrinsic, intrinsics, tanfov, c2w, glat, dt_probe):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points
        bg_params, bg_opt = bg_state

        def loss_fn(params, dummy, bgp):
            bgimg = _bg_image(bgp, c2w, intrinsics)
            image, out = _image(params, state, observed_inputs, dummy,
                                extrinsic, intrinsics, tanfov, bgimg)
            latents = guidance.encode_images(
                gparams, image[None].astype(dt_probe.dtype))
            loss = lambda_guidance * jnp.sum(
                latents.astype(jnp.float32) * glat) / latents.shape[0]
            return loss, (out.radii, out.overflow)

        dummy = jnp.zeros((C + M, 2), jnp.float32)
        (loss, (radii, overflow)), (grads, dgrad, bg_grads) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, dummy, bg_params)
        updates, opt_state = tx.update(grads, tstate.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        bg_up, bg_opt = bg_tx.update(bg_grads, bg_opt, bg_params)
        bg_params = optax.apply_updates(bg_params, bg_up)
        new_avatar = update_avatar_stats(
            state._replace(params=params), dgrad[:C], radii[:C])
        return (AvatarTrainState(new_avatar, opt_state, tstate.step + 1),
                (bg_params, bg_opt),
                {"loss": loss, "tile_overflow": overflow})

    @jax.jit
    def latent_grad(gparams, latents, text_embeds, uncond_embeds, t, key,
                    cond_image, guidance_scale, progress=None):
        return guidance.latent_gradients(
            gparams, latents, text_embeds, uncond_embeds, t, key,
            cond_image=cond_image, neg_embeds=neg_embeds,
            guidance_scale=guidance_scale, progress=progress)

    @jax.jit
    def apply_grads(tstate, gparams, observed_inputs, extrinsic, intrinsics,
                    tanfov, background, glat, dt_probe):
        state = tstate.avatar
        C = state.capacity
        M = model.n_mesh_points

        def loss_fn(params, dummy):
            image, out = _image(params, state, observed_inputs, dummy,
                                extrinsic, intrinsics, tanfov, background)
            latents = guidance.encode_images(
                gparams, image[None].astype(dt_probe.dtype))
            loss = lambda_guidance * jnp.sum(
                latents.astype(jnp.float32) * glat) / latents.shape[0]
            return loss, (out.radii, out.overflow)

        dummy = jnp.zeros((C + M, 2), jnp.float32)
        (loss, (radii, overflow)), (grads, dgrad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, dummy)
        updates, opt_state = tx.update(grads, tstate.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_avatar = update_avatar_stats(
            state._replace(params=params), dgrad[:C], radii[:C])
        return (AvatarTrainState(new_avatar, opt_state, tstate.step + 1),
                {"loss": loss, "tile_overflow": overflow})

    def step(tstate, gparams, observed_inputs, extrinsic, intrinsics,
             tanfov, background, text_embeds, uncond_embeds, t, key,
             cond_image=None, guidance_scale=None, progress=None,
             bg_state=None, c2w=None):
        # the annealed per-step CFG scale (and csd/ism progress) enter the
        # jitted program as device scalars, so schedule changes don't
        # retrace (reference: get_guidance_scale, basic.py:404-418)
        gs = jnp.asarray(
            guidance.guidance_scale if guidance_scale is None
            else guidance_scale, jnp.float32)
        dt_probe = jnp.zeros((), text_embeds.dtype)
        if bg_net is not None:
            assert bg_state is not None and c2w is not None, \
                "trainable-background step needs bg_state and c2w"
            latents = render_encode_bg(
                tstate, bg_state[0], gparams, observed_inputs, extrinsic,
                intrinsics, tanfov, c2w, dt_probe)
            glat = latent_grad(gparams, latents, text_embeds, uncond_embeds,
                               t, key, cond_image, gs, progress)
            return apply_grads_bg(
                tstate, bg_state, gparams, observed_inputs, extrinsic,
                intrinsics, tanfov, c2w, glat, dt_probe)
        latents = render_encode(tstate, gparams, observed_inputs, extrinsic,
                                intrinsics, tanfov, background, dt_probe)
        glat = latent_grad(gparams, latents, text_embeds, uncond_embeds,
                           t, key, cond_image, gs, progress)
        return apply_grads(tstate, gparams, observed_inputs, extrinsic,
                           intrinsics, tanfov, background, glat, dt_probe)

    return step
