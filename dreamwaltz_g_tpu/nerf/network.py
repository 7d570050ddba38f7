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
    enc_cfg_from_nerf,
    GridEncoderConfig,
    GridEncoderParams,
    TriplaneConfig,
    encode_any,
    frequency_encode,
    freq_output_dim,
    grid_encode,
    init_encoder_any,
    init_grid_encoder,
    init_triplane,
    triplane_encode,
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


def density_activation(kind: str, x: jnp.ndarray,
                       sigma_scale: Optional[jnp.ndarray] = None,
                       ) -> jnp.ndarray:
    """(reference: nerf_model.py:235-245; 'scaling' multiplies by a
    learnable exp(sigma_scale) then softplus-shifts, nerf_model.py:240-245)"""
    if kind == "exp":
        return trunc_exp(x)
    if kind == "softplus":
        return jax.nn.softplus(x)
    if kind == "scaling":
        s = jnp.zeros(()) if sigma_scale is None else sigma_scale
        return jax.nn.softplus(x * jnp.exp(s) - 1.0)
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
    # structure variants (reference: build_NeRFNetwork, nerf_model.py:565-574)
    albedo_mlp: Optional[dict] = None            # dual_mlp / dual_enc
    encoder_sigma: Optional[GridEncoderParams] = None  # dual_enc
    sigma_scale: Optional[jnp.ndarray] = None    # 'scaling' activation


class NeRFModel(NamedTuple):
    """Static model definition + methods operating on NeRFParams."""

    cfg: NeRFConfig
    enc_cfg: GridEncoderConfig
    sigma_mlp: SigmaMLP
    bg_mlp: Optional[BackgroundMLP]
    albedo_mlp: Optional[SigmaMLP] = None  # dual_mlp/dual_enc color head

    @property
    def bound(self) -> float:
        return self.cfg.bound

    @property
    def structure(self) -> str:
        return getattr(self.cfg, "structure", "shared_mlp")

    @property
    def color_channels(self) -> int:
        return 4 if self.cfg.nerf_type == "latent" else 3

    def init(self, key) -> NeRFParams:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        enc = init_encoder_any(self.enc_cfg, k1)
        probe = jnp.zeros((1, self.enc_cfg.output_dim))
        sig = self.sigma_mlp.init(k2, probe)
        bg = self.bg_mlp.init(k3, jnp.zeros((1, 3))) if self.bg_mlp else None
        alb = self.albedo_mlp.init(k4, probe) if self.albedo_mlp else None
        enc_s = init_encoder_any(self.enc_cfg, k5) \
            if self.structure == "dual_enc" else None
        ss = jnp.zeros(()) \
            if self.cfg.density_activation == "scaling" else None
        return NeRFParams(encoder=enc, sigma_mlp=sig, bg_mlp=bg,
                          albedo_mlp=alb, encoder_sigma=enc_s,
                          sigma_scale=ss)

    def encode(self, params: NeRFParams, positions: jnp.ndarray) -> jnp.ndarray:
        return encode_any(params.encoder, self.enc_cfg, positions,
                           self.bound)

    def density(self, params: NeRFParams, positions: jnp.ndarray):
        """(reference: common_forward — shared nerf_model.py:280-295,
        dual_mlp 387-402, dual_enc 505-521).
        Returns (sigma (...,), albedo (..., C))."""
        h = self.encode(params, positions)
        if self.albedo_mlp is None:  # shared_mlp: one head emits both
            out = self.sigma_mlp.apply(params.sigma_mlp, h)
            raw, alb = out[..., 0], out[..., 1:]
        elif self.structure == "dual_enc":
            h_sig = encode_any(params.encoder_sigma, self.enc_cfg,
                                positions, self.bound)
            raw = self.sigma_mlp.apply(params.sigma_mlp, h_sig)[..., 0]
            alb = self.albedo_mlp.apply(params.albedo_mlp, h)
        else:  # dual_mlp: shared encoding, separate heads
            raw = self.sigma_mlp.apply(params.sigma_mlp, h)[..., 0]
            alb = self.albedo_mlp.apply(params.albedo_mlp, h)
        raw = raw + density_prior(self.cfg.density_prior, positions,
                                  self.bound)
        sigma = density_activation(self.cfg.density_activation, raw,
                                   params.sigma_scale)
        albedo = jax.nn.sigmoid(alb)
        return sigma, albedo

    def background(self, params: NeRFParams, dirs: jnp.ndarray) -> jnp.ndarray:
        assert self.bg_mlp is not None
        return jax.nn.sigmoid(self.bg_mlp.apply(params.bg_mlp, dirs))


def build_nerf(cfg: NeRFConfig, with_background: bool = True) -> NeRFModel:
    """(reference: build_NeRFNetwork, nerf_model.py:565-574 — structure
    selects shared_mlp / dual_mlp / dual_enc; 'triplane' is a TPU-first
    backbone addition with no reference counterpart, see TriplaneConfig)"""
    enc_cfg = enc_cfg_from_nerf(cfg)
    C = 4 if cfg.nerf_type == "latent" else 3
    structure = getattr(cfg, "structure", "shared_mlp")
    if structure == "shared_mlp":
        sigma_mlp = SigmaMLP(hidden=64, num_layers=3, out_channels=1 + C)
        albedo_mlp = None
    elif structure in ("dual_mlp", "dual_enc"):
        sigma_mlp = SigmaMLP(hidden=64, num_layers=3, out_channels=1)
        albedo_mlp = SigmaMLP(hidden=64, num_layers=3, out_channels=C)
    else:
        raise ValueError(f"unknown nerf structure {structure!r}")
    return NeRFModel(
        cfg=cfg,
        enc_cfg=enc_cfg,
        sigma_mlp=sigma_mlp,
        bg_mlp=BackgroundMLP() if with_background else None,
        albedo_mlp=albedo_mlp,
    )
