"""Stage-1 trainers: NeRF pretrain (depth/mask MSE) and NeRF SDS.

(reference: core/trainer.py — ``pretrain`` 1152-1240 fits the Instant-NGP
NeRF to SMPL-X depth/mask renders; ``train``/``train_forward`` 826-1017 with
stage='nerf' runs SDS through the frozen diffusion guidance with sparsity and
mesh-surface sigma losses 975-1006.)

Everything inside ``*_step`` is jit-compiled once; the host loop only draws
cameras/poses/timesteps and pipes arrays in.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.camera import get_rays
from ..guidance.sds import GuidanceParams, ScoreDistillation
from ..nerf.network import NeRFModel, NeRFParams
from ..nerf.renderer import (
    OccupancyGrid,
    render_rays,
    update_occupancy,
)
from .losses import (SigmaGuidancePoints, sigma_margin_loss, sparsity_loss,
                     volume_sparsity_loss)


class NeRFTrainState(NamedTuple):
    params: NeRFParams
    opt_state: Any
    step: jnp.ndarray  # () int32


def init_train_state(model: NeRFModel, tx: optax.GradientTransformation,
                     key: jax.Array,
                     params: Optional[NeRFParams] = None) -> NeRFTrainState:
    params = params if params is not None else model.init(key)
    return NeRFTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))


def _render_image(model, params, grid, cam_c2w, cam_intr, H, W, key,
                  num_steps, bg_color, shading="albedo", bg_mode="color",
                  upsample_steps=0, ray_chunk=0, min_near=0.05,
                  compact_steps=0, detach_bg_ws=False):
    """Render a full (H, W, C) image by marching all pixels in one batch.

    ``bg_mode='nerf'`` composites the learned ray-direction background MLP
    instead of the constant color (reference: bg net path,
    nerf_model.py:247-256 + nerf_renderer.py:404-472).

    ``ray_chunk``: march rays in rematerialized chunks — at training
    resolutions H·W·num_steps sample buffers otherwise dominate HBM under
    autodiff (the CUDA reference compacts rays instead; here
    ``jax.checkpoint`` over chunks trades recompute for memory, the
    standard TPU remat pattern)."""
    rays_o, rays_d = get_rays(cam_c2w[None], cam_intr[None], H, W)
    ro, rd = rays_o[0], rays_d[0]
    if ray_chunk and ro.shape[0] > ray_chunk:
        n = ro.shape[0]
        pad = (-n) % ray_chunk
        if pad:
            ro = jnp.concatenate([ro, jnp.zeros((pad, 3))])
            rd = jnp.concatenate([rd, jnp.ones((pad, 3))])

        @jax.checkpoint
        def render_chunk(args):
            o, d = args
            return render_rays(model, params, grid, o, d, key=key,
                               num_steps=num_steps,
                               upsample_steps=upsample_steps,
                               min_near=min_near,
                               compact_steps=compact_steps,
                               perturb=True, shading=shading)

        outs = jax.lax.map(render_chunk,
                           (ro.reshape(-1, ray_chunk, 3),
                            rd.reshape(-1, ray_chunk, 3)))
        out = jax.tree_util.tree_map(
            lambda x: None if x is None
            else x.reshape((-1,) + x.shape[2:])[:n], outs)
    else:
        out = render_rays(model, params, grid, ro, rd, key=key,
                          num_steps=num_steps,
                          upsample_steps=upsample_steps,
                          min_near=min_near,
                          compact_steps=compact_steps,
                          perturb=True, shading=shading)
    if bg_mode == "nerf" and model.bg_mlp is not None:
        bg = model.background(params, rays_d[0])
    else:
        bg = bg_color
    wsum = out.weights_sum
    if detach_bg_ws:
        # --nerf.detach_bg_weights_sum (reference: nerf_renderer.py:467)
        wsum = jax.lax.stop_gradient(wsum)
    img = out.image + (1.0 - wsum)[:, None] * bg
    return (img.reshape(H, W, -1), out.depth.reshape(H, W),
            out.weights_sum.reshape(H, W))


def make_pretrain_step(
    model: NeRFModel,
    tx: optax.GradientTransformation,
    image_height: int,
    image_width: int,
    num_steps: int = 96,
    lambda_mask: float = 1.0,
    lambda_depth: float = 1.0,
    compact_steps: int = 0,
):
    """Depth/mask MSE against SMPL-X 'depth_raw' renders
    (reference: pretrain_forward, trainer.py:1242-1279: loss =
    MSE(weights_sum, mask) + MSE(depth, smpl depth) on mask)."""

    # triplane-only stabilizer (grids keep exact reference parity); see
    # losses.volume_sparsity_loss for the ghost-intersection rationale
    vs_weight = model.cfg.triplane_volume_sparsity \
        if model.cfg.backbone == "triplane" else 0.0

    @jax.jit
    def step(state: NeRFTrainState, grid: OccupancyGrid,
             cam_c2w, cam_intr, gt_depth, gt_mask, key):
        k_render, k_vs = jax.random.split(key)

        if vs_weight > 0.0:
            # GT surface points (backprojected depth) seed the stabilizer's
            # shadow samples — the loci where triplane ghosts can exist
            rays_o, rays_d = get_rays(cam_c2w[None], cam_intr[None],
                                      image_height, image_width)
            surf = rays_o[0] + rays_d[0] * gt_depth.reshape(-1, 1)
            surf_valid = gt_mask.reshape(-1)

        def loss_fn(params):
            _, depth, wsum = _render_image(
                model, params, grid, cam_c2w, cam_intr,
                image_height, image_width, k_render, num_steps,
                jnp.zeros(model.color_channels),
                compact_steps=compact_steps)
            m = gt_mask.astype(jnp.float32)
            mask_loss = jnp.mean((wsum - m) ** 2)
            depth_loss = jnp.sum(m * (depth - gt_depth) ** 2) \
                / jnp.maximum(jnp.sum(m), 1.0)
            loss = lambda_mask * mask_loss + lambda_depth * depth_loss
            if vs_weight > 0.0:
                loss = loss + vs_weight * volume_sparsity_loss(
                    model, params, k_vs, surface_points=surf,
                    surface_valid=surf_valid)
            return loss, {"mask_loss": mask_loss, "depth_loss": depth_loss}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return NeRFTrainState(params, opt_state, state.step + 1), metrics

    return step


def make_nerf_sds_step(
    model: NeRFModel,
    guidance: ScoreDistillation,
    tx: optax.GradientTransformation,
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
    donate_state: bool = False,
):
    """One SDS step on the NeRF (reference: train_forward,
    trainer.py:933-1017 with stage='nerf'): render -> guidance loss ->
    sparsity + sigma-margin regularizers -> adam update.

    ``tp_lr_weights``: (T,) per-timestep lr weights — the 'ddpm' lr_policy
    (reference: TimePrioritizedLR, time_prior.py:394-431) applied to the
    updates at this step's sampled t.

    ``donate_state``: donate the train-state buffers to the step so XLA
    reuses their HBM for the outputs (params + adam slots are ~200 MB at
    the 2^19 reference table size) — the caller must not read the old
    state afterwards."""

    @functools.partial(jax.jit, static_argnames=("use_sigma",),
                       donate_argnums=(0,) if donate_state else ())
    def step(state: NeRFTrainState, grid: OccupancyGrid,
             gparams: GuidanceParams,
             cam_c2w, cam_intr, bg_color,
             text_embeds, uncond_embeds, t, key,
             cond_image=None, guidance_scale=None, progress=None,
             sigma_pts: Optional[SigmaGuidancePoints] = None,
             use_sigma: bool = False):
        k_render, k_sds, k_vs = jax.random.split(key, 3)

        def loss_fn(params):
            img, ren_depth, wsum = _render_image(
                model, params, grid, cam_c2w, cam_intr,
                image_height, image_width, k_render, num_steps, bg_color,
                bg_mode=bg_mode, ray_chunk=ray_chunk,
                min_near=getattr(nerf_cfg, "min_near", 0.05),
                upsample_steps=getattr(nerf_cfg, "upsample_steps", 0),
                compact_steps=getattr(nerf_cfg, "compact_steps", 0),
                detach_bg_ws=getattr(nerf_cfg, "detach_bg_weights_sum",
                                     False))
            if pgc is not None and img.shape[-1] == 3:
                if getattr(pgc, "wants_mask", False):
                    # --guide.grad_rgb_clip_mask_guidance: the render's
                    # weights_sum masks the pixel-grad statistics
                    # (reference: trainer.py:959-962)
                    img = pgc(img, jax.lax.stop_gradient(wsum)[..., None])
                else:
                    img = pgc(img)
            sds = guidance(gparams, img[None], text_embeds, uncond_embeds,
                           t, k_sds, cond_image=cond_image,
                           neg_embeds=neg_embeds,
                           guidance_scale=guidance_scale, progress=progress)
            loss = lambda_guidance * sds["loss"]
            metrics = {"sds_loss": sds["loss"]}
            sp = sparsity_loss(wsum.reshape(-1), nerf_cfg, state.step,
                               max_iteration)
            loss = loss + sp
            metrics["sparsity_loss"] = sp
            vs_weight = nerf_cfg.triplane_volume_sparsity \
                if getattr(nerf_cfg, "backbone", "") == "triplane" else 0.0
            if vs_weight > 0.0:
                # triplane ghost-intersection stabilizer (grids: parity);
                # the RENDERED depth is the current surface estimate whose
                # axis shadows seed the targeted samples
                rays_o, rays_d = get_rays(cam_c2w[None], cam_intr[None],
                                          image_height, image_width)
                surf = rays_o[0] + rays_d[0] \
                    * jax.lax.stop_gradient(ren_depth).reshape(-1, 1)
                loss = loss + vs_weight * volume_sparsity_loss(
                    model, params, k_vs, surface_points=surf,
                    surface_valid=jax.lax.stop_gradient(wsum).reshape(-1)
                    > 0.5)
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
            w = tp_lr_weights[jnp.clip(t[0], 0, tp_lr_weights.shape[0] - 1)]
            updates = jax.tree_util.tree_map(lambda u: u * w, updates)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return NeRFTrainState(params, opt_state, state.step + 1), metrics

    return step


def maybe_update_occupancy(
    state: NeRFTrainState,
    grid: OccupancyGrid,
    model: NeRFModel,
    key: jax.Array,
    interval: int = 16,
    density_thresh: float = 10.0,
) -> OccupancyGrid:
    """Host-side cadence for the EMA occupancy refresh
    (reference: trainer.py:843-845, every update_extra_interval steps)."""
    if int(state.step) % interval == 0:
        return update_occupancy(grid, model, state.params, key,
                                density_thresh=density_thresh)
    return grid


def make_eval_render(model: NeRFModel, image_height: int, image_width: int,
                     num_steps: int = 128):
    """Jit'd full-frame eval render (reference: evaluate, trainer.py:1019)."""

    @jax.jit
    def render(params: NeRFParams, grid: OccupancyGrid, cam_c2w, cam_intr,
               bg_color):
        rays_o, rays_d = get_rays(cam_c2w[None], cam_intr[None],
                                  image_height, image_width)
        out = render_rays(model, params, grid, rays_o[0], rays_d[0],
                          num_steps=num_steps, perturb=False)
        img = out.image + (1.0 - out.weights_sum)[:, None] * bg_color
        H, W = image_height, image_width
        return (img.reshape(H, W, -1), out.depth.reshape(H, W),
                out.weights_sum.reshape(H, W))

    return render
