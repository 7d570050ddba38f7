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
    ):
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, ch0,
                                  downscale_freq_shift=cfg.freq_shift)
        temb = TimestepEmbedding(ch0 * 4, name="time_embedding")(temb)

        x = nn.Conv(ch0, (3, 3), padding=1, name="conv_in")(sample)
        x = x + ControlNetConditioningEmbedding(
            ch0, self.cond_block_channels,
            name="controlnet_cond_embedding")(cond_image)

        skips = [x]
        for bi, out_ch in enumerate(cfg.block_out_channels):
            last = bi == len(cfg.block_out_channels) - 1
            x, s = CrossAttnDownBlock(
                cfg, out_ch, with_attn=cfg.attn_down[bi],
                add_downsample=not last, name=f"down_blocks_{bi}",
            )(x, temb, context)
            skips.extend(s)

        x = UNetMidBlock(cfg, cfg.block_out_channels[-1], name="mid_block")(
            x, temb, context)

        down_res: List[jnp.ndarray] = []
        for i, s in enumerate(skips):
            r = nn.Conv(s.shape[-1], (1, 1),
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name=f"controlnet_down_blocks_{i}")(s)
            down_res.append(r * conditioning_scale)
        mid_res = nn.Conv(x.shape[-1], (1, 1),
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="controlnet_mid_block")(x) * conditioning_scale
        return down_res, mid_res
