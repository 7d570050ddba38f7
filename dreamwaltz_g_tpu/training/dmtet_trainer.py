"""DMTet finetune trainer: SDS on the marching-tets surface.

(reference: _DMTetRenderer.run_dmtet + init_tet,
core/nerf/nerf_renderer.py:475-646 — learnable SDF + vertex deform on a tet
grid, seeded from the stage-1 density field, rendered for SDS supervision;
param groups sdf/deform at the network lr, nerf_model.py:320-321.)

TPU design: the reference rasterizes the extracted mesh with nvdiffrast and
interpolates vertex attributes per pixel; here the surface renders as one
flat splat per triangle through the differentiable 3DGS rasterizer
(nerf/dmtet.py render_dmtet_splats), so SDF/deform/NeRF-albedo gradients all
flow through one jit program with static shapes. The mesh regularizers
(normal consistency across each tet's triangle pair, Laplacian over the
tet-edge graph) ARE added to the loss — the reference computes analogous
terms in run_dmtet but its trainer never consumes them.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..guidance.sds import GuidanceParams, ScoreDistillation
from ..nerf.dmtet import (
    DMTetModel,
    DMTetParams,
    render_dmtet_splats,
    shade_soup,
    soup_normal_consistency,
    tet_laplacian_loss,
    unique_tet_edges,
)
from ..nerf.network import NeRFModel, NeRFParams


class DMTetTrainState(NamedTuple):
    params: NeRFParams      # the stage-1 field (albedo decode; keeps training)
    dmtet: DMTetParams      # learnable SDF + deform
    opt_state: Any          # (nerf_opt_state, dmtet_opt_state)
    step: jnp.ndarray       # () int32


def init_dmtet(
    nerf: NeRFModel,
    params: NeRFParams,
    resolution: int,
    density_thresh: float = 10.0,
    bound: Optional[float] = None,
    band_dilate: int = 3,
) -> Tuple[DMTetModel, DMTetParams, jnp.ndarray]:
    """Build + seed the tet grid from the stage-1 field (reference:
    init_tet, nerf_renderer.py:602-646: fit the grid scale to the occupied
    region, then ``sdf += (sigma - thresh).clamp(-1, 1)``), pruned to a
    static band of tets around the isosurface.

    Returns (model, dmtet_params, unique_edges)."""
    model = DMTetModel.create(resolution=resolution,
                              bound=bound or nerf.bound)
    model, dparams = model.init_from_nerf(nerf, params,
                                          density_thresh=density_thresh,
                                          fit_scale=True)
    model = model.prune_to_surface_band(dparams, dilate=band_dilate)
    edges = jnp.asarray(unique_tet_edges(model.tets))
    return model, dparams, edges


def init_train_state(
    params: NeRFParams,
    dparams: DMTetParams,
    tx_nerf: optax.GradientTransformation,
    tx_dmtet: optax.GradientTransformation,
) -> DMTetTrainState:
    return DMTetTrainState(
        params=params, dmtet=dparams,
        opt_state=(tx_nerf.init(params), tx_dmtet.init(dparams)),
        step=jnp.zeros((), jnp.int32))


def build_dmtet_optimizer(cfg, max_steps: int,
                          ) -> optax.GradientTransformation:
    """sdf + deform at the network lr (reference: get_params appends the
    sdf/deform groups at ``lr``, nerf_model.py:320-321)."""
    from .optim import nerf_lr_schedule

    sched = nerf_lr_schedule(cfg.lr_policy, cfg.lr, max_steps)
    return optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15)


def _query_albedo(nerf: NeRFModel, params: NeRFParams, pts: jnp.ndarray,
                  chunk: int = 65536) -> jnp.ndarray:
    """Chunked NeRF albedo decode at the triangle centroids (reference:
    run_dmtet queries self.density(xyzs)['albedo'], nerf_renderer.py:553)."""
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3))])

    @jax.checkpoint
    def dec(p):
        return nerf.density(params, p)[1]

    alb = jax.lax.map(dec, pts.reshape(-1, chunk, 3))
    return alb.reshape(-1, alb.shape[-1])[:n]


def make_dmtet_sds_step(
    nerf: NeRFModel,
    dmtet_model: DMTetModel,
    tet_edges: jnp.ndarray,
    guidance: ScoreDistillation,
    tx_nerf: optax.GradientTransformation,
    tx_dmtet: optax.GradientTransformation,
    image_height: int,
    image_width: int,
    nerf_cfg,
    lambda_guidance: float = 1.0,
    ambient_ratio: float = 1.0,
    neg_embeds=None,
    pgc=None,
    tile_size: int = 32,
    capacity: int = 1024,
    chunk: int = 128,
    max_tiles_per_gaussian: int = 8,
):
    """One DMTet SDS step (reference: train_forward with the dmtet renderer,
    trainer.py:933-1017 + run_dmtet): extract surface -> albedo decode ->
    shade -> splat-render -> SDS -> mesh regularizers -> adam.

    ``lock_geo`` (reference: nerf_renderer.py:481) freezes sdf/deform —
    their updates are zeroed, only the field trains."""
    H, W = image_height, image_width
    lock_geo = bool(getattr(nerf_cfg, "lock_geo", False))
    lam_nc = float(getattr(nerf_cfg, "lambda_mesh_normal", 0.5))
    lam_lap = float(getattr(nerf_cfg, "lambda_mesh_laplacian", 0.5))

    @functools.partial(jax.jit, static_argnames=("shading",))
    def step(state: DMTetTrainState, gparams: GuidanceParams,
             extrinsic, intrinsics, campos, bg_color,
             text_embeds, uncond_embeds, t, key,
             cond_image=None, guidance_scale=None, progress=None,
             shading: str = "albedo"):
        k_light, k_sds = jax.random.split(key)
        # random light around the camera so faces never go dark
        # (reference: run_dmtet light_d, nerf_renderer.py:507-510)
        light = campos + jax.random.normal(k_light, (3,))
        light = light / jnp.maximum(jnp.linalg.norm(light), 1e-8)

        def loss_fn(trainables):
            params, dparams = trainables
            if lock_geo:
                dparams = jax.lax.stop_gradient(dparams)
            soup = dmtet_model.extract(dparams)
            centroids = jnp.mean(soup.vertices, axis=1)
            albedo = _query_albedo(nerf, params, centroids)[..., :3]
            colors = shade_soup(soup, albedo, shading, light,
                                ambient_ratio=ambient_ratio)
            out = render_dmtet_splats(
                soup, colors, extrinsic, intrinsics, H, W,
                tile_size=tile_size, capacity=capacity, chunk=chunk,
                max_tiles_per_gaussian=max_tiles_per_gaussian)
            img = out.image + (1.0 - out.alpha)[..., None] * bg_color
            if pgc is not None and img.shape[-1] == 3:
                img = pgc(img)
            sds = guidance(gparams, img[None], text_embeds, uncond_embeds,
                           t, k_sds, cond_image=cond_image,
                           neg_embeds=neg_embeds,
                           guidance_scale=guidance_scale, progress=progress)
            loss = lambda_guidance * sds["loss"]
            metrics = {"sds_loss": sds["loss"]}
            if lam_nc > 0:
                nc = soup_normal_consistency(soup)
                loss = loss + lam_nc * nc
                metrics["mesh_normal_loss"] = nc
            if lam_lap > 0:
                dv = dmtet_model.verts + jnp.tanh(dparams.deform) \
                    * dmtet_model.deform_scale
                lap = tet_laplacian_loss(dv, tet_edges)
                loss = loss + lam_lap * lap
                metrics["mesh_laplacian_loss"] = lap
            return loss, metrics

        (loss, metrics), (g_nerf, g_dmtet) = jax.value_and_grad(
            loss_fn, has_aux=True)((state.params, state.dmtet))
        opt_n, opt_d = state.opt_state
        upd_n, opt_n = tx_nerf.update(g_nerf, opt_n, state.params)
        params = optax.apply_updates(state.params, upd_n)
        if lock_geo:
            dparams = state.dmtet
        else:
            upd_d, opt_d = tx_dmtet.update(g_dmtet, opt_d, state.dmtet)
            dparams = optax.apply_updates(state.dmtet, upd_d)
        metrics["loss"] = loss
        return DMTetTrainState(params, dparams, (opt_n, opt_d),
                               state.step + 1), metrics

    return step


def make_dmtet_eval_render(
    nerf: NeRFModel,
    dmtet_model: DMTetModel,
    image_height: int,
    image_width: int,
    tile_size: int = 32,
    capacity: int = 1024,
    chunk: int = 128,
):
    """Jit'd full-frame albedo render of the extracted surface (the eval
    analog of run_dmtet with shading='albedo'). Signature matches the NeRF
    eval render except the leading arg is the whole DMTetTrainState."""
    H, W = image_height, image_width

    @jax.jit
    def render(state: DMTetTrainState, cam_c2w, cam_intr, bg_color):
        extrinsic = jnp.linalg.inv(cam_c2w)
        soup = dmtet_model.extract(state.dmtet)
        centroids = jnp.mean(soup.vertices, axis=1)
        albedo = _query_albedo(nerf, state.params, centroids)[..., :3]
        out = render_dmtet_splats(
            soup, albedo, extrinsic, cam_intr, H, W, tile_size=tile_size,
            capacity=capacity, chunk=chunk)
        img = out.image + (1.0 - out.alpha)[..., None] * bg_color
        return img, out.depth, out.alpha

    return render
