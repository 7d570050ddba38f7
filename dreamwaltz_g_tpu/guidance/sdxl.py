"""SDXL score distillation.

(reference: ScoreDistillationXL, core/guidance/stable_diffusion.py:120-175 —
adds the pooled text embedding and the 6 add_time_ids
(orig_size, crop, target_size) to every UNet call; ControlNet-SDXL variant
with guess mode, core/guidance/controlnet.py:117-197.)

Subclasses the SD ScoreDistillation: only the eps-prediction changes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from .sds import GuidanceParams, ScoreDistillation


def make_add_time_ids(batch: int, orig_size=(1024, 1024), crop=(0, 0),
                      target_size=(1024, 1024)) -> jnp.ndarray:
    """(B, 6) SDXL micro-conditioning ids (reference:
    stable_diffusion.py:146-160 _get_add_time_ids)."""
    ids = jnp.asarray([*orig_size, *crop, *target_size], jnp.float32)
    return jnp.broadcast_to(ids, (batch, 6))


@dataclass
class ScoreDistillationXL(ScoreDistillation):
    """SDXL guidance: pooled embeds ride along with the context.

    ``pooled_text`` / ``pooled_uncond`` are set per prompt (the dual-CLIP
    pooled projection); latents are 128² for 1024² renders.
    """

    pooled_text: Optional[jnp.ndarray] = None     # (1, Dp)
    pooled_uncond: Optional[jnp.ndarray] = None   # (1, Dp)
    latent_size: int = 128
    guess_mode: bool = False

    def _eps(self, params: GuidanceParams, latents, t, context,
             cond_image=None, pooled=None):
        B = latents.shape[0]
        if pooled is None:
            pooled = jnp.broadcast_to(self.pooled_text, (B,) +
                                      self.pooled_text.shape[1:])
        tids = make_add_time_ids(B)
        if self.controlnet is not None and cond_image is not None \
                and params.controlnet is not None:
            down_res, mid_res = self.controlnet.apply(
                params.controlnet, latents, t, context, cond_image,
                self.controlnet_scale, pooled_embeds=pooled,
                add_time_ids=tids, guess_mode=self.guess_mode)
            return self.unet.apply(params.unet, latents, t, context,
                                   down_residuals=down_res,
                                   mid_residual=mid_res,
                                   pooled_embeds=pooled, add_time_ids=tids)
        return self.unet.apply(params.unet, latents, t, context,
                               pooled_embeds=pooled, add_time_ids=tids)

    def _cfg_eps(self, params, latents_noisy, t, ctx_text, ctx_uncond,
                 cond_image, guidance_scale):
        """CFG with per-branch pooled embeds (reference:
        stable_diffusion.py:162-175)."""
        B = latents_noisy.shape[0]
        lat2 = jnp.concatenate([latents_noisy, latents_noisy], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        ctx2 = jnp.concatenate([ctx_uncond, ctx_text], axis=0)
        cond2 = None if cond_image is None else jnp.concatenate(
            [cond_image, cond_image], axis=0)
        pu = jnp.broadcast_to(self.pooled_uncond,
                              (B,) + self.pooled_uncond.shape[1:])
        pt = jnp.broadcast_to(self.pooled_text,
                              (B,) + self.pooled_text.shape[1:])
        pooled2 = jnp.concatenate([pu, pt], axis=0)
        eps = self._eps(params, lat2, t2, ctx2, cond2, pooled=pooled2)
        eps_uncond, eps_text = eps[:B], eps[B:]
        return eps_uncond + guidance_scale * (eps_text - eps_uncond), \
            eps_uncond, eps_text
