"""ControlNet in Flax.

Counterpart of the reference's diffusers ControlNet usage
(reference: core/guidance/basic.py:157-190 build_controlnet,
controlnet.py:83-114 _predict — run ControlNet, then the UNet with additive
residuals). Architecture: a copy of the UNet encoder + mid block, a small
conv stack embedding the (512x512x3) condition image to latent resolution,
and zero-initialized 1x1 convs on every skip output.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import TimestepEmbedding, timestep_embedding
from .unet import CrossAttnDownBlock, UNetConfig, UNetMidBlock


class ControlNetConditioningEmbedding(nn.Module):
    """Condition image (B, H*8, W*8, 3) -> (B, H, W, ch0)."""

    out_channels: int
    block_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.block_channels[0], (3, 3), padding=1, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_channels) - 1):
            h = nn.Conv(self.block_channels[i], (3, 3), padding=1,
                        name=f"blocks_{2 * i}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.block_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, name=f"blocks_{2 * i + 1}")(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="conv_out")(h)


class ControlNet(nn.Module):
    cfg: UNetConfig = UNetConfig()
    cond_block_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,       # (B, h, w, 4) noisy latents
        timesteps: jnp.ndarray,    # (B,)
        context: jnp.ndarray,      # (B, L, D) text embeddings
        cond_image: jnp.ndarray,   # (B, 8h, 8w, 3) condition in [0, 1]
        conditioning_scale: float = 1.0,
        pooled_embeds: jnp.ndarray = None,  # (B, Dp) SDXL 'text_time'
        add_time_ids: jnp.ndarray = None,   # (B, 6) SDXL
        guess_mode: bool = False,
    ):
        """``guess_mode``: residual scales ramp logspace(-1, 0) shallow ->
        deep (the diffusers/SDXL guess-mode semantics the reference flips on
        for its SDXL ControlNet, core/guidance/controlnet.py:117-197)."""
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, ch0,
                                  downscale_freq_shift=cfg.freq_shift)
        temb = TimestepEmbedding(ch0 * 4, name="time_embedding")(temb)
        if cfg.addition_embed:
            assert pooled_embeds is not None and add_time_ids is not None
            B = sample.shape[0]
            ids = add_time_ids.reshape(-1)
            id_emb = timestep_embedding(ids, cfg.addition_time_embed_dim,
                                        downscale_freq_shift=cfg.freq_shift)
            id_emb = id_emb.reshape(B, -1)
            aug = jnp.concatenate([pooled_embeds, id_emb], axis=-1)
            temb = temb + TimestepEmbedding(ch0 * 4, name="add_embedding")(aug)

        x = nn.Conv(ch0, (3, 3), padding=1, name="conv_in")(sample)
        x = x + ControlNetConditioningEmbedding(
            ch0, self.cond_block_channels,
            name="controlnet_cond_embedding")(cond_image)

        skips = [x]
        for bi, out_ch in enumerate(cfg.block_out_channels):
            last = bi == len(cfg.block_out_channels) - 1
            x, s = CrossAttnDownBlock(
                cfg, out_ch, with_attn=cfg.attn_down[bi],
                add_downsample=not last, block_index=bi,
                name=f"down_blocks_{bi}",
            )(x, temb, context)
            skips.extend(s)

        x = UNetMidBlock(cfg, cfg.block_out_channels[-1], name="mid_block")(
            x, temb, context)

        n_out = len(skips) + 1
        if guess_mode:
            scales = jnp.logspace(-1.0, 0.0, n_out) * conditioning_scale
        else:
            scales = jnp.full((n_out,), conditioning_scale)

        down_res: List[jnp.ndarray] = []
        for i, s in enumerate(skips):
            r = nn.Conv(s.shape[-1], (1, 1),
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name=f"controlnet_down_blocks_{i}")(s)
            down_res.append(r * scales[i])
        mid_res = nn.Conv(x.shape[-1], (1, 1),
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="controlnet_mid_block")(x) * scales[-1]
        return down_res, mid_res
