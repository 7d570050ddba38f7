"""Stable Diffusion UNet (UNet2DConditionModel) in Flax.

Native JAX re-implementation of the SD1.5 denoiser the reference drives
through diffusers (reference: core/guidance/basic.py:116-154,
stable_diffusion.py:52-57). Supports ControlNet residual injection
(down/mid additive residuals, reference: controlnet.py:83-114).

Config is parameterized so tests run a tiny UNet; ``sd15_unet_config()``
matches the released SD1.5 weights for conversion.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


class UNetConfig(NamedTuple):
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8        # heads = channels // (channels//heads)…
    # SD1.5 uses 8 heads at every resolution (head_dim = C / 8)
    num_heads: int = 8
    transformer_depth: int = 1         # int, or per-block tuple (SDXL)
    # which down blocks carry cross-attention (SD1.5: first three)
    attn_down: Tuple[bool, ...] = (True, True, True, False)
    freq_shift: float = 0.0
    # SDXL extensions (reference model cards: basic.py:36-49 SDXL variants)
    head_dim: Optional[int] = None     # fixed per-head dim (SDXL: 64)
    addition_embed: bool = False       # 'text_time' added conditioning
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280    # pooled text-embed width

    def block_heads(self, out_ch: int) -> int:
        if self.head_dim is not None:
            return max(out_ch // self.head_dim, 1)
        return self.num_heads

    def block_depth(self, block_index: int) -> int:
        if isinstance(self.transformer_depth, tuple):
            return self.transformer_depth[block_index]
        return self.transformer_depth


def sd15_unet_config() -> UNetConfig:
    return UNetConfig()


def sd21_unet_config() -> UNetConfig:
    """SD2.x UNet (stabilityai/stable-diffusion-2[-1][-base]; reference
    model cards sd20/sd20b/sd21/sd21b, basic.py:34-37): OpenCLIP ViT-H
    context (1024) and a fixed 64-wide head (5/10/20/20 heads per level).
    The 768-v checkpoints (sd20/sd21) are v-prediction models — pair with
    ``ScoreDistillation(prediction_type='v_prediction', latent_size=96)``
    (the reference feeds their v outputs straight into eps-space SDS,
    basic.py:443-467 — a silent error this build corrects)."""
    return UNetConfig(
        cross_attention_dim=1024,
        head_dim=64,
    )


def sdxl_unet_config() -> UNetConfig:
    """SDXL-base UNet (stabilityai/stable-diffusion-xl-base-1.0)."""
    return UNetConfig(
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        cross_attention_dim=2048,
        transformer_depth=(1, 2, 10),
        attn_down=(False, True, True),
        head_dim=64,
        addition_embed=True,
    )


def tiny_unet_config() -> UNetConfig:
    return UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                      cross_attention_dim=32, num_heads=2,
                      attn_down=(True, False))


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    with_attn: bool
    add_downsample: bool
    block_index: int = 0

    @nn.compact
    def __call__(self, x, temb, context):
        skips = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(self.out_channels, name=f"resnets_{i}")(x, temb)
            if self.with_attn:
                heads = self.cfg.block_heads(self.out_channels)
                x = Transformer2D(
                    heads, self.out_channels // heads,
                    self.cfg.block_depth(self.block_index),
                    name=f"attentions_{i}",
                )(x, context)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class UNetMidBlock(nn.Module):
    cfg: UNetConfig
    channels: int

    @nn.compact
    def __call__(self, x, temb, context):
        heads = self.cfg.block_heads(self.channels)
        x = ResnetBlock2D(self.channels, name="resnets_0")(x, temb)
        x = Transformer2D(
            heads, self.channels // heads,
            self.cfg.block_depth(-1), name="attentions_0")(x, context)
        x = ResnetBlock2D(self.channels, name="resnets_1")(x, temb)
        return x


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    with_attn: bool
    add_upsample: bool
    block_index: int = 0

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, name=f"resnets_{i}")(x, temb)
            if self.with_attn:
                heads = self.cfg.block_heads(self.out_channels)
                x = Transformer2D(
                    heads, self.out_channels // heads,
                    self.cfg.block_depth(self.block_index),
                    name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class UNet2DCondition(nn.Module):
    """Inputs NHWC latents (B, H, W, 4), timesteps (B,), context (B, 77, D).

    ``down_residuals``/``mid_residual`` inject ControlNet residuals.
    """

    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray,
        down_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_residual: Optional[jnp.ndarray] = None,
        pooled_embeds: Optional[jnp.ndarray] = None,   # (B, Dp) SDXL
        add_time_ids: Optional[jnp.ndarray] = None,    # (B, 6) SDXL
    ) -> jnp.ndarray:
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, ch0,
                                  downscale_freq_shift=cfg.freq_shift)
        temb = TimestepEmbedding(ch0 * 4, name="time_embedding")(temb)
        if cfg.addition_embed:
            # SDXL 'text_time': fourier-embed the 6 size/crop ids, concat the
            # pooled text embedding, one more TimestepEmbedding into temb
            assert pooled_embeds is not None and add_time_ids is not None
            B = sample.shape[0]
            ids = add_time_ids.reshape(-1)
            id_emb = timestep_embedding(ids, cfg.addition_time_embed_dim,
                                        downscale_freq_shift=cfg.freq_shift)
            id_emb = id_emb.reshape(B, -1)
            aug = jnp.concatenate([pooled_embeds, id_emb], axis=-1)
            temb = temb + TimestepEmbedding(ch0 * 4, name="add_embedding")(aug)

        x = nn.Conv(ch0, (3, 3), padding=1, name="conv_in")(sample)
        skips = [x]
        for bi, out_ch in enumerate(cfg.block_out_channels):
            last = bi == len(cfg.block_out_channels) - 1
            x, s = CrossAttnDownBlock(
                cfg, out_ch, with_attn=cfg.attn_down[bi],
                add_downsample=not last, block_index=bi,
                name=f"down_blocks_{bi}",
            )(x, temb, context)
            skips.extend(s)

        if down_residuals is not None:
            assert len(down_residuals) == len(skips), (
                f"controlnet residual count {len(down_residuals)} != {len(skips)}")
            skips = [s + r for s, r in zip(skips, down_residuals)]

        x = UNetMidBlock(cfg, cfg.block_out_channels[-1], name="mid_block")(
            x, temb, context)
        if mid_residual is not None:
            x = x + mid_residual

        for bi in reversed(range(len(cfg.block_out_channels))):
            out_ch = cfg.block_out_channels[bi]
            x = CrossAttnUpBlock(
                cfg, out_ch, with_attn=cfg.attn_down[bi],
                add_upsample=bi != 0, block_index=bi,
                name=f"up_blocks_{len(cfg.block_out_channels) - 1 - bi}",
            )(x, skips, temb, context)

        x = nn.GroupNorm(num_groups=32 if x.shape[-1] >= 32 else x.shape[-1],
                         epsilon=1e-5, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out")(x)
