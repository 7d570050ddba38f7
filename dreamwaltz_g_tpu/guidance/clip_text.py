"""CLIP text encoder (ViT-L/14 text tower) + BPE tokenizer.

Replaces the reference's transformers CLIPTextModel/CLIPTokenizer usage
(reference: core/guidance/stable_diffusion.py:31-50 get_text_embeds).

The tokenizer loads the standard CLIP vocab/merges files when available
(``CLIPTokenizer(vocab_path, merges_path)``); ``HashTokenizer`` provides a
deterministic offline fallback so the pipeline runs without assets (ids are
stable hashes — fine for tests and for random-weight models, NOT for real
SD checkpoints).
"""
from __future__ import annotations

import gzip
import html
import json
import re
from functools import lru_cache
from typing import List, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class CLIPTextConfig(NamedTuple):
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # SD1.5 CLIP uses quick_gelu
    activation: str = "quick_gelu"
    # >0: learn a text_projection head for the pooled output (SDXL's second
    # encoder, OpenCLIP bigG)
    projection_dim: int = 0


def tiny_text_config() -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=256, hidden_size=32, num_layers=2,
                          num_heads=2, max_length=16)


def clip_h_config() -> CLIPTextConfig:
    """OpenCLIP ViT-H text tower — SD2.x's text encoder
    (stabilityai/stable-diffusion-2* text_encoder: 1024-dim, 23 layers —
    diffusers ships it pre-truncated to the penultimate layer — gelu)."""
    return CLIPTextConfig(hidden_size=1024, num_layers=23, num_heads=16,
                          activation="gelu")


def clip_bigg_config() -> CLIPTextConfig:
    """OpenCLIP ViT-bigG text tower — SDXL's text_encoder_2
    (laion/CLIP-ViT-bigG-14; gelu, 1280-dim projection)."""
    return CLIPTextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                          activation="gelu", projection_dim=1280)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(c.hidden_size, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, name="v_proj")(x)
        B, N, _ = x.shape
        q = q.reshape(B, N, c.num_heads, hd)
        k = k.reshape(B, N, c.num_heads, hd)
        v = v.reshape(B, N, c.num_heads, hd)
        a = jnp.einsum("bqhd,bkhd->bhqk", q, k) + mask
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, N, c.hidden_size)
        return nn.Dense(c.hidden_size, name="out_proj")(o)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        act = _quick_gelu if self.cfg.activation == "quick_gelu" else nn.gelu
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(self.cfg.hidden_size * 4, name="mlp_fc1")(h)
        h = act(h)
        h = nn.Dense(self.cfg.hidden_size, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, mode: str = "final"):
        """(B, L) int32 -> hidden states.

        mode 'final': (B, L, D) final-LN hidden states (SD1.5 context).
        mode 'penultimate': (B, L, D) second-to-last layer output — SDXL
          feeds hidden_states[-2] as context (stable_diffusion.py:120-175).
        mode 'penultimate_pooled': (penultimate, pooled (B, Dp)) where
          pooled is the EOS-token feature of the final-LN states through
          ``text_projection`` (SDXL's text_encoder_2 pooled embeds).
        """
        c = self.cfg
        B, L = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01), (c.max_length, c.hidden_size))
        x = tok + pos[None, :L]
        # causal mask
        mask = jnp.full((L, L), -jnp.inf)
        mask = jnp.triu(mask, k=1)[None, None]
        penult = x
        for i in range(c.num_layers):
            if i == c.num_layers - 1:
                penult = x  # hidden_states[-2] in HF terms
            x = CLIPLayer(c, name=f"layers_{i}")(x, mask)
        out = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        if mode == "final":
            return out
        if mode == "penultimate":
            return penult
        if mode == "penultimate_pooled":
            # CLIP pooling: feature at the EOS token (the argmax token id)
            eos = jnp.argmax(input_ids, axis=-1)
            pooled = out[jnp.arange(B), eos]
            if c.projection_dim:
                pooled = nn.Dense(c.projection_dim, use_bias=False,
                                  name="text_projection")(pooled)
            return penult, pooled
        raise ValueError(f"unknown CLIP output mode {mode!r}")


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

@lru_cache()
def _bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class CLIPTokenizer:
    """Byte-pair-encoding tokenizer, CLIP flavor (lowercase, </w> word ends).

    Needs the standard ``vocab.json`` + ``merges.txt`` files (or the gzipped
    ``bpe_simple_vocab_16e6.txt.gz``)."""

    def __init__(self, vocab_path: str, merges_path: Optional[str] = None,
                 max_length: int = 77):
        self.max_length = max_length
        self.byte_encoder = _bytes_to_unicode()
        if vocab_path.endswith(".gz"):
            merges = gzip.open(vocab_path).read().decode("utf-8").split("\n")
            merges = merges[1: 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges]
            vocab = list(self.byte_encoder.values())
            vocab = vocab + [v + "</w>" for v in vocab]
            for m in merges:
                vocab.append("".join(m))
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = dict(zip(vocab, range(len(vocab))))
        else:
            self.encoder = json.load(open(vocab_path))
            merges = open(merges_path, encoding="utf-8").read().split("\n")
            merges = [tuple(m.split()) for m in merges[1:] if m and len(m.split()) == 2]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
            if False else
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
            re.IGNORECASE)
        self.bos = self.encoder["<|startoftext|>"]
        self.eos = self.encoder["<|endoftext|>"]
        # padding id AFTER the terminating EOS: SD1.x tokenizers pad with
        # EOS, SD2.x (OpenCLIP-H text tower) pads with "!" (id 0) — the
        # loader sets this per model family (convert.py MODEL_FAMILIES)
        self.pad_id = self.eos
        # Textual-Inversion placeholder tokens (matched verbatim, pre-BPE)
        self.added: dict = {}

    def add_token(self, token: str) -> int:
        """Register a placeholder token (reference: tokenizer.add_tokens in
        load_concept, basic.py:303-310). Returns its new id — the row index
        to append to the text tower's embedding table."""
        token = token.strip().lower()
        if token in self.added or token in self.encoder:
            raise ValueError(f"token {token!r} already in the tokenizer")
        idx = len(self.encoder) + len(self.added)
        self.added[token] = idx
        return idx

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new.append(first + second)
                    i += 2
                else:
                    new.append(word[i])
                    i += 1
            word = tuple(new)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text).strip().lower()
        if self.added:
            # split on placeholder tokens first — they bypass BPE entirely
            pat = "(" + "|".join(re.escape(t) for t in self.added) + ")"
            ids = []
            for seg in re.split(pat, text):
                if seg in self.added:
                    ids.append(self.added[seg])
                elif seg:
                    ids.extend(self._encode_bpe(seg))
            return ids
        return self._encode_bpe(text)

    def _encode_bpe(self, text: str) -> List[int]:
        ids = []
        for tok in re.findall(self.pat, text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def __call__(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.max_length), self.pad_id, np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos] + self.encode(t)[: self.max_length - 2] + [self.eos]
            out[i, : len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic offline fallback: stable per-word hash ids."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos, self.eos = 49406 % vocab_size, 49407 % vocab_size

    def __call__(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.max_length), self.eos, np.int32)
        for i, t in enumerate(texts):
            import zlib

            words = re.findall(r"\w+|[^\s\w]", t.lower())
            ids = [self.bos] + [
                (zlib.crc32(w.encode()) % (self.vocab_size - 3)) + 1
                for w in words[: self.max_length - 2]
            ] + [self.eos]
            out[i, : len(ids)] = ids
        return out
