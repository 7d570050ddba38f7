"""CLIP R-Precision: the paper's quantitative eval protocol.

(reference: utils/r_precision.py:7-69 — given N rendered avatars and their N
prompts, embed both with CLIP and count how often the matching prompt is the
top-1 retrieval; utils/clip.py CLIPTextEncoder.)

Includes a Flax CLIP vision tower (ViT) whose weights convert from the
released openai/clip checkpoints; the text side reuses
guidance/clip_text.CLIPTextModel with a projection head. Without converted
weights the metric still runs (random-init) for pipeline tests.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..guidance.clip_text import (
    CLIPTextConfig,
    CLIPLayer,
    CLIPTextModel,
)

# openai CLIP pixel normalization
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionConfig(NamedTuple):
    image_size: int = 224
    patch_size: int = 32         # ViT-B/32; 16 for B/16, 14 for L/14
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    projection_dim: int = 512
    activation: str = "quick_gelu"

    @property
    def text_like(self) -> CLIPTextConfig:
        """Reuse the text encoder's transformer layer stack."""
        return CLIPTextConfig(hidden_size=self.hidden_size,
                              num_layers=self.num_layers,
                              num_heads=self.num_heads,
                              activation=self.activation)


def tiny_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            num_layers=2, num_heads=2, projection_dim=16)


class CLIPVisionModel(nn.Module):
    """ViT image tower -> projected embedding (B, projection_dim)."""

    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (B, H, W, 3) CLIP-normalized."""
        c = self.cfg
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    name="patch_embedding")(pixels)
        B = x.shape[0]
        x = x.reshape(B, -1, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.hidden_size)), x], axis=1)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_pos, c.hidden_size))
        x = x + pos[None, : x.shape[1]]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layernorm")(x)
        mask = jnp.zeros((1, 1, x.shape[1], x.shape[1]))  # no causal mask
        tl = c.text_like
        for i in range(c.num_layers):
            x = CLIPLayer(tl, name=f"layers_{i}")(x, mask)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False,
                        name="visual_projection")(pooled)


class CLIPTextTower(nn.Module):
    """Text encoder + eot pooling + projection (retrieval side)."""

    cfg: CLIPTextConfig = CLIPTextConfig()
    projection_dim: int = 512

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        hidden = CLIPTextModel(self.cfg, name="text_model")(input_ids)
        # eot token = argmax id (the eot has the largest id in CLIP's vocab)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = hidden[jnp.arange(hidden.shape[0]), eot]
        return nn.Dense(self.projection_dim, use_bias=False,
                        name="text_projection")(pooled)


def preprocess_images(images: np.ndarray, size: int = 224) -> jnp.ndarray:
    """(B, H, W, 3) float [0,1] -> CLIP-normalized (B, size, size, 3)."""
    x = jnp.asarray(images, jnp.float32)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, 3), "bilinear")
    return (x - CLIP_MEAN) / CLIP_STD


class RPrecision:
    """(reference: R_Precision, utils/r_precision.py:7-69)"""

    def __init__(self, vision: CLIPVisionModel, text: CLIPTextTower,
                 vision_params, text_params, tokenizer=None):
        self.vision = vision
        self.text = text
        self.vision_params = vision_params
        self.text_params = text_params
        self.tokenizer = tokenizer
        self._embed_img = jax.jit(
            lambda p, x: self.vision.apply(p, x))
        self._embed_txt = jax.jit(
            lambda p, ids: self.text.apply(p, ids))

    def image_features(self, images: np.ndarray) -> jnp.ndarray:
        x = preprocess_images(images, self.vision.cfg.image_size)
        f = self._embed_img(self.vision_params, x)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def text_features(self, texts_or_ids) -> jnp.ndarray:
        if self.tokenizer is not None and isinstance(texts_or_ids[0], str):
            ids = jnp.asarray(self.tokenizer(list(texts_or_ids)))
        else:
            ids = jnp.asarray(texts_or_ids)
        f = self._embed_txt(self.text_params, ids)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def retrieve(self, images: np.ndarray, texts_or_ids, top_k: int = 1,
                 ) -> float:
        """Fraction of images whose own prompt ranks in the top-k
        (reference: R_Precision.retrieve)."""
        fi = self.image_features(images)
        ft = self.text_features(texts_or_ids)
        sim = fi @ ft.T                          # (B, B)
        rank = jnp.argsort(-sim, axis=-1)[:, :top_k]
        hit = jnp.any(rank == jnp.arange(sim.shape[0])[:, None], axis=-1)
        return float(jnp.mean(hit.astype(jnp.float32)))


def make_tiny_r_precision(key: jax.Array) -> RPrecision:
    """Random-init tiny towers for pipeline tests."""
    from ..guidance.clip_text import tiny_text_config

    vc = tiny_vision_config()
    tc = tiny_text_config()
    vision = CLIPVisionModel(vc)
    text = CLIPTextTower(tc, projection_dim=vc.projection_dim)
    k1, k2 = jax.random.split(key)
    vp = vision.init(k1, jnp.zeros((1, vc.image_size, vc.image_size, 3)))
    tp = text.init(k2, jnp.zeros((1, tc.max_length), jnp.int32))
    return RPrecision(vision, text, vp, tp)
