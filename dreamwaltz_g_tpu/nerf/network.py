"""Instant-NGP NeRF networks.

Counterpart of the reference's NeRF models
(reference: core/nerf/nerf_model.py:214-574): grid encoder + sigma MLP
(32 -> 64 -> 4: sigma + 3 albedo, or 4-channel latent), density activations,
density priors, and a frequency-encoded background MLP. Built with flax.linen
so parameters are plain pytrees for optax/orbax.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import NeRFConfig
from .encoder import (
    GridEncoderConfig,
    GridEncoderParams,
    frequency_encode,
    freq_output_dim,
    grid_encode,
    init_grid_encoder,
)


@jax.custom_vjp
def trunc_exp(x):
    """exp with clamped-input backward (reference: nerf_utils.py:180-194)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def density_activation(kind: str, x: jnp.ndarray) -> jnp.ndarray:
    """(reference: nerf_model.py:235-245)"""
    if kind == "exp":
        return trunc_exp(x)
    if kind == "softplus":
        return jax.nn.softplus(x)
    raise ValueError(f"unknown density activation {kind!r}")


def density_prior(kind: str, positions: jnp.ndarray, bound: float) -> jnp.ndarray:
    """Density blob added to the raw sigma (reference: nerf_model.py:36-53)."""
    if kind == "none":
        return jnp.zeros(positions.shape[:-1])
    d2 = jnp.sum(positions ** 2, axis=-1)
    if kind == "gaussian":
        return 5.0 * jnp.exp(-d2 / (2 * (0.2 * bound) ** 2))
    if kind == "sqrt":
        return 10.0 * (1.0 - jnp.sqrt(jnp.sqrt(d2)) / (0.4 * bound))
    raise ValueError(f"unknown density prior {kind!r}")


class SigmaMLP(nn.Module):
    """Encoder-features -> (sigma, albedo...) head
    (reference: nerf_model.py:214-266, MLP 32 -> 64 -> 1+C)."""

    hidden: int = 64
    num_layers: int = 3
    out_channels: int = 4  # 1 sigma + 3 albedo (or 1 + 4 latent)

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_channels,
                        name=f"dense_{self.num_layers - 1}")(x)


class BackgroundMLP(nn.Module):
    """Ray-direction frequency MLP background
    (reference: nerf_model.py:247-256, bg net on freq-encoded dirs)."""

    hidden: int = 64
    num_layers: int = 2
    out_channels: int = 3
    degree: int = 6

    @nn.compact
    def __call__(self, dirs):
        x = frequency_encode(dirs, degree=self.degree)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_channels,
                        name=f"dense_{self.num_layers - 1}")(x)


class NeRFParams(NamedTuple):
    encoder: GridEncoderParams
    sigma_mlp: dict
    bg_mlp: Optional[dict]


class NeRFModel(NamedTuple):
    """Static model definition + methods operating on NeRFParams."""

    cfg: NeRFConfig
    enc_cfg: GridEncoderConfig
    sigma_mlp: SigmaMLP
    bg_mlp: Optional[BackgroundMLP]

    @property
    def bound(self) -> float:
        return self.cfg.bound

    @property
    def color_channels(self) -> int:
        return 4 if self.cfg.nerf_type == "latent" else 3

    def init(self, key) -> NeRFParams:
        k1, k2, k3 = jax.random.split(key, 3)
        enc = init_grid_encoder(self.enc_cfg, k1)
        sig = self.sigma_mlp.init(k2, jnp.zeros((1, self.enc_cfg.output_dim)))
        bg = self.bg_mlp.init(k3, jnp.zeros((1, 3))) if self.bg_mlp else None
        return NeRFParams(encoder=enc, sigma_mlp=sig, bg_mlp=bg)

    def encode(self, params: NeRFParams, positions: jnp.ndarray) -> jnp.ndarray:
        return grid_encode(params.encoder, self.enc_cfg, positions, self.bound)

    def density(self, params: NeRFParams, positions: jnp.ndarray):
        """(reference: common_forward, nerf_model.py:280-295).
        Returns (sigma (...,), albedo (..., C))."""
        h = self.encode(params, positions)
        out = self.sigma_mlp.apply(params.sigma_mlp, h)
        raw = out[..., 0] + density_prior(self.cfg.density_prior, positions,
                                          self.bound)
        sigma = density_activation(self.cfg.density_activation, raw)
        albedo = jax.nn.sigmoid(out[..., 1:])
        return sigma, albedo

    def background(self, params: NeRFParams, dirs: jnp.ndarray) -> jnp.ndarray:
        assert self.bg_mlp is not None
        return jax.nn.sigmoid(self.bg_mlp.apply(params.bg_mlp, dirs))


def build_nerf(cfg: NeRFConfig, with_background: bool = True) -> NeRFModel:
    """(reference: build_NeRFNetwork, nerf_model.py:565-574)"""
    enc_cfg = GridEncoderConfig(
        num_levels=cfg.num_levels,
        level_dim=cfg.level_dim,
        base_resolution=cfg.base_resolution,
        desired_resolution=int(cfg.desired_resolution * cfg.bound),
        log2_hashmap_size=cfg.log2_hashmap_size,
        gridtype="tiled" if cfg.backbone == "tiledgrid" else "hash",
    )
    out_ch = 1 + (4 if cfg.nerf_type == "latent" else 3)
    return NeRFModel(
        cfg=cfg,
        enc_cfg=enc_cfg,
        sigma_mlp=SigmaMLP(hidden=64, num_layers=3, out_channels=out_ch),
        bg_mlp=BackgroundMLP() if with_background else None,
    )
