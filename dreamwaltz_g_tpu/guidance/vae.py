"""AutoencoderKL (the SD VAE) in Flax.

Counterpart of the reference's VAE wrappers
(reference: core/guidance/vae.py:34-133 — encode_images/decode_latents with
the 0.18215 scaling factor). Encoder outputs the mean of the latent
distribution (SDS uses the mode; sampling optional via ``sample=True``).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import AttnBlockVAE, Downsample2D, ResnetBlock2D, Upsample2D


class VAEConfig(NamedTuple):
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215


def sd_vae_config() -> VAEConfig:
    return VAEConfig()


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(block_out_channels=(32, 64), layers_per_block=1)


class _ResnetNoTime(nn.Module):
    """VAE resnet: like ResnetBlock2D but without time conditioning."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), epsilon=1e-6,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = _ResnetNoTime(ch, name=f"down_blocks_{bi}_resnets_{li}")(h)
            if bi != len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, name=f"down_blocks_{bi}_downsamplers_0")(h)
        ch = cfg.block_out_channels[-1]
        h = _ResnetNoTime(ch, name="mid_block_resnets_0")(h)
        h = AttnBlockVAE(name="mid_block_attentions_0")(h)
        h = _ResnetNoTime(ch, name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        moments = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                          name="conv_out")(h)
        moments = nn.Conv(2 * cfg.latent_channels, (1, 1),
                          name="quant_conv")(moments)
        return moments  # (B, h, w, 2*latent): mean | logvar


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        z = nn.Conv(cfg.latent_channels, (1, 1), name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(z)
        h = _ResnetNoTime(ch, name="mid_block_resnets_0")(h)
        h = AttnBlockVAE(name="mid_block_attentions_0")(h)
        h = _ResnetNoTime(ch, name="mid_block_resnets_1")(h)
        for ui, ch in enumerate(reversed(cfg.block_out_channels)):
            for li in range(cfg.layers_per_block + 1):
                h = _ResnetNoTime(ch, name=f"up_blocks_{ui}_resnets_{li}")(h)
            if ui != len(cfg.block_out_channels) - 1:
                h = Upsample2D(ch, name=f"up_blocks_{ui}_upsamplers_0")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL:
    """Encode/decode wrappers with the SD scaling factor
    (reference: vae.py encode_images x0.18215, decode_latents /0.18215)."""

    def __init__(self, cfg: VAEConfig = VAEConfig()):
        self.cfg = cfg
        self.encoder = VAEEncoder(cfg)
        self.decoder = VAEDecoder(cfg)

    def init(self, key, image_size: int = 64):
        k1, k2 = jax.random.split(key)
        enc = self.encoder.init(k1, jnp.zeros((1, image_size, image_size,
                                               self.cfg.in_channels)))
        f = 2 ** (len(self.cfg.block_out_channels) - 1)
        dec = self.decoder.init(
            k2, jnp.zeros((1, image_size // f, image_size // f,
                           self.cfg.latent_channels)))
        return {"encoder": enc, "decoder": dec}

    def encode(self, params, images: jnp.ndarray, key=None) -> jnp.ndarray:
        """images in [0, 1] NHWC -> scaled latents (mode unless key given)."""
        x = images * 2.0 - 1.0
        moments = self.encoder.apply(params["encoder"], x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(key, mean.shape)
        return mean * self.cfg.scaling_factor

    def decode(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        """scaled latents -> images in [0, 1]."""
        x = self.decoder.apply(params["decoder"], latents / self.cfg.scaling_factor)
        return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
