"""Shared building blocks for the Flax Stable Diffusion stack.

Fresh Flax implementations of the standard SD1.5 architecture pieces
(resnet blocks, spatial transformer with self/cross attention, up/down
sampling, sinusoidal time embeddings). The reference consumes these models
through HuggingFace diffusers (reference: core/guidance/basic.py:116-210);
here they are native JAX modules whose parameter tree mirrors the diffusers
naming so checkpoint conversion is mechanical (guidance/convert.py).

All convs are NHWC (TPU-native layout); weights convert from torch NCHW.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal embeddings, diffusers get_timestep_embedding semantics."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin], -1) if flip_sin_to_cos \
        else jnp.concatenate([sin, cos], -1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, name="linear_2")(emb)
        return emb


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                         epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        t = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(self.groups, self.out_channels),
                         epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


# Flash-attention policy for the long self-attention layers.
#   "auto": use the fused Pallas TPU kernel when running on TPU
#   "on"/"off": force (tests force "on" under the Mosaic interpreter).
# At 64² latents the einsum path materializes (B, H, 4096, 4096) f32
# attention matrices in HBM — ~20 GB of traffic per CFG UNet forward across
# the five 4096-token layers; the flash kernel keeps the running softmax in
# VMEM and never writes the matrix. Cross-attention (Nk = 77 text tokens)
# and short layers stay on the einsum path (they are compute-trivial, and
# the kernel needs seq % 128 == 0).
FLASH_ATTENTION = "auto"
FLASH_MIN_SEQ = 1024
_FLASH_PROBED_OK: bool | None = None  # lazy real-hardware compile probe

# Mesh-aware dispatch for DP/TP training: GSPMD has no partitioning rule for
# the Pallas flash custom call, so a jit over a >1-device mesh would either
# refuse to lower it or replicate it (all-gathering q/k/v). Instead the
# trainer publishes its mesh here and the kernel call is wrapped in
# shard_map — batch rows split over the data axis, heads over the model
# axis. Attention is independent over batch and heads, so the wrapped
# region needs no collectives and the kernel runs on each device's shard.
# Value: (mesh, batch_axis_name_or_None, head_axis_name_or_None).
FLASH_SHARD: Optional[tuple] = None


def _flash_enabled(n_q: int, n_k: int, head_dim: int) -> bool:
    if FLASH_ATTENTION == "off":
        return False
    if n_q < FLASH_MIN_SEQ or n_q % 128 or n_k != n_q:
        return False  # short or cross attention: einsum is fine
    if head_dim > 128 and head_dim % 128:
        return False  # kernel constraint (SD1.5's 160-dim layers are short)
    if FLASH_ATTENTION == "on":
        return True
    try:
        return jax.devices()[0].platform == "tpu" and _flash_probe()
    except Exception:
        return False


# the shape classes flash actually runs at in this framework; Mosaic
# failures are SHAPE-dependent, so the probe must cover each class — a
# single-shape probe could pass and a different layer's compile still
# kill the run
_FLASH_PROBE_SHAPES = (
    (2, 4096, 8, 40),    # UNet top self-attention @64² latents (CFG pair)
    (2, 1024, 8, 80),    # UNet level-2 self-attention
)
_FLASH_PROBE_GRAD_SHAPE = (1, 4096, 1, 512)  # VAE mid-block attention:
# SDS gradients flow through vae.encode, so its dq/dkv BACKWARD kernels
# compile too — probe with jax.grad, not just the forward


def _flash_probe() -> bool:
    """One-time smoke compile of the kernel on the real device, over the
    representative shape set incl. the differentiated VAE-attention shape.

    A Mosaic compile failure on some new shape/toolchain must degrade to
    the einsum path, not kill a bench/training run. Runs eagerly (fine
    even during an outer trace — inputs are concrete) and caches the
    outcome; the persistent compile cache makes repeat probes cheap.
    """
    global _FLASH_PROBED_OK
    if _FLASH_PROBED_OK is None:
        try:
            for shape in _FLASH_PROBE_SHAPES:
                z = jnp.zeros(shape, jnp.bfloat16)
                jax.block_until_ready(flash_self_attention(z, z, z))
            zg = jnp.zeros(_FLASH_PROBE_GRAD_SHAPE, jnp.bfloat16)
            g = jax.grad(lambda q, k, v: jnp.sum(
                flash_self_attention(q, k, v).astype(jnp.float32)),
                argnums=(0, 1, 2))(zg, zg, zg)
            jax.block_until_ready(g)
            _FLASH_PROBED_OK = True
        except Exception as e:  # pragma: no cover - hardware-dependent
            import logging
            logging.getLogger(__name__).warning(
                "flash-attention kernel unavailable (%s); using einsum "
                "attention", e)
            _FLASH_PROBED_OK = False
    return _FLASH_PROBED_OK


def _flash_kernel(q, k, v):
    """Single-device fused attention over (B, N, H, D) via the Pallas kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    n = q.shape[1]
    # largest kernel block dividing the sequence (the kernel requires
    # seq % block == 0 and block % 128 == 0; _flash_enabled guarantees
    # n % 128 == 0)
    b = next(s for s in (512, 256, 128) if n % s == 0)
    sizes = BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        sm_scale=1.0 / float(q.shape[-1]) ** 0.5, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3)


def flash_self_attention(q, k, v):
    """Fused attention over (B, N, H, D) tensors via the Pallas TPU kernel.

    When ``FLASH_SHARD`` publishes a device mesh (DP/TP training), the kernel
    is wrapped in ``shard_map`` with batch split over the data axis and heads
    over the model axis, so it stays alive inside GSPMD-sharded programs. An
    axis that doesn't divide its dimension falls back to replicated for that
    dimension (still correct; that spec matches what GSPMD could do)."""
    if FLASH_SHARD is None:
        return _flash_kernel(q, k, v)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh, baxis, haxis = FLASH_SHARD
    B, _, H, _ = q.shape
    bname = baxis if (baxis in mesh.shape and mesh.shape[baxis] > 1
                      and B % mesh.shape[baxis] == 0) else None
    hname = haxis if (haxis is not None and haxis in mesh.shape
                      and mesh.shape[haxis] > 1
                      and H % mesh.shape[haxis] == 0) else None
    spec = P(bname, None, hname, None)
    fn = shard_map(_flash_kernel, mesh=mesh,
                   in_specs=(spec, spec, spec), out_specs=spec,
                   check_vma=False)
    return fn(q, k, v)


class Attention(nn.Module):
    """Multi-head attention; cross-attention when ``context`` is given."""

    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, self.heads, self.head_dim)
        k = k.reshape(B, Nk, self.heads, self.head_dim)
        v = v.reshape(B, Nk, self.heads, self.head_dim)
        if _flash_enabled(Nq, Nk, self.head_dim):
            out = flash_self_attention(q, k, v).reshape(B, Nq, inner)
        else:
            # jax fused attention; big matmuls land on the MXU
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(self.head_dim)
            attn = jax.nn.softmax(
                attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Nq, inner)
        return nn.Dense(inner, name="to_out_0")(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, name="net_0_proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g)
        return nn.Dense(self.dim, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + Attention(self.heads, self.head_dim, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Attention(self.heads, self.head_dim, name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        x = x + FeedForwardGEGLU(self.dim, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """norm -> 1x1 in -> transformer block(s) -> 1x1 out, residual."""

    heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        res = x
        h = nn.GroupNorm(num_groups=min(self.groups, C), epsilon=1e-6,
                         name="norm")(x)
        h = nn.Conv(C, (1, 1), name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(C, self.heads, self.head_dim,
                                      name=f"transformer_blocks_{i}")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), name="proj_out")(h)
        return h + res


class Downsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       name="conv")(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


class AttnBlockVAE(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q")(h)
        k = nn.Dense(C, name="to_k")(h)
        v = nn.Dense(C, name="to_v")(h)
        if _flash_enabled(H * W, H * W, C):
            h = flash_self_attention(
                q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])[:, :, 0]
        else:
            attn = jax.nn.softmax(
                jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(C), axis=-1)
            h = jnp.einsum("bqk,bkc->bqc", attn, v)
        h = nn.Dense(C, name="to_out_0")(h)
        return x + h.reshape(B, H, W, C)
