"""Convert released torch checkpoints (diffusers / transformers naming) into
the Flax parameter trees of this package.

The reference consumes HF models directly (reference: core/guidance/
basic.py:29-89 MODEL_CARDS / CONTROLNET_CARDS); we load the same released
weights offline: point ``convert_unet/vae/clip/controlnet`` at a flat
``{name: np.ndarray}`` state dict (load with torch or safetensors) and they
return params for `UNet2DCondition` / `AutoencoderKL` / `CLIPTextModel` /
`ControlNet`.

Strategy: initialize the Flax module to get the target tree, then fill every
leaf by deterministic name translation. Missing/unused keys raise — silent
partial loads are how wrong avatars happen.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _torch_name(path, scope: str) -> str:
    """Flax param path -> torch state_dict key."""
    *mods, leaf = path
    name = ".".join(mods)
    # flax module names use _ where diffusers uses .N
    for token in ("down_blocks", "up_blocks", "resnets", "attentions",
                  "transformer_blocks", "downsamplers", "upsamplers",
                  "layers", "blocks", "controlnet_down_blocks", "net"):
        name = name.replace(f"{token}_", f"{token}.")
    name = name.replace("to_out_0", "to_out.0")
    name = name.replace("net.0_proj", "net.0.proj")
    name = name.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
    name = name.replace("mid_block.resnets", "mid_block.resnets")
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "embedding": "weight"}
    return f"{name}.{leaf_map[leaf]}" if name else leaf_map[leaf]


def _convert_leaf(torch_arr: np.ndarray, target_shape, leaf: str) -> np.ndarray:
    a = np.asarray(torch_arr, np.float32)
    if leaf == "kernel":
        if a.ndim == 4:      # conv: OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2:    # linear: (out, in) -> (in, out)
            a = a.T
    if a.shape != tuple(target_shape):
        raise ValueError(f"shape mismatch: got {a.shape}, want {target_shape}")
    return a


def fill_params(target_tree, torch_sd: Dict[str, np.ndarray],
                key_prefix: str = "", rename=None, strict: bool = True):
    """Fill a Flax param tree from a torch state dict."""
    flat = _flatten(target_tree)
    used = set()
    out = {}
    missing = []
    for path, leaf_val in flat.items():
        tname = _torch_name(path, key_prefix)
        if rename is not None:
            tname = rename(tname)
        full = key_prefix + tname
        if full not in torch_sd:
            missing.append(full)
            out[path] = leaf_val
            continue
        out[path] = jnp.asarray(
            _convert_leaf(torch_sd[full], leaf_val.shape, path[-1]))
        used.add(full)
    if strict and missing:
        raise KeyError(f"missing {len(missing)} torch keys, e.g. {missing[:5]}")
    return _unflatten(out), missing, set(torch_sd) - used


def convert_unet(unet_module, torch_sd, sample_shape=(1, 64, 64, 4),
                 context_shape=(1, 77, 768), strict: bool = True):
    import jax

    params = unet_module.init(
        jax.random.PRNGKey(0), jnp.zeros(sample_shape), jnp.zeros((1,)),
        jnp.zeros(context_shape))
    filled, missing, unused = fill_params(params["params"], torch_sd,
                                          strict=strict)
    return {"params": filled}, missing, unused


def convert_controlnet(cn_module, torch_sd, sample_shape=(1, 64, 64, 4),
                       context_shape=(1, 77, 768),
                       cond_shape=(1, 512, 512, 3), strict: bool = True):
    import jax

    params = cn_module.init(
        jax.random.PRNGKey(0), jnp.zeros(sample_shape), jnp.zeros((1,)),
        jnp.zeros(context_shape), jnp.zeros(cond_shape))

    def rename(n):
        # diffusers: controlnet_cond_embedding.blocks.N / conv_in / conv_out
        return n

    filled, missing, unused = fill_params(params["params"], torch_sd,
                                          rename=rename, strict=strict)
    return {"params": filled}, missing, unused


def convert_vae(vae, torch_sd, image_size: int = 512, strict: bool = True):
    """torch keys are 'encoder.*', 'decoder.*', 'quant_conv.*',
    'post_quant_conv.*'; our tree keeps quant convs inside encoder/decoder."""
    import jax

    params = vae.init(jax.random.PRNGKey(0), image_size)

    def rename_enc(n):
        if n.startswith("quant_conv"):
            return n  # top-level in torch
        return "encoder." + n

    def rename_dec(n):
        if n.startswith("post_quant_conv"):
            return n
        return "decoder." + n

    # older VAE checkpoints name attention q/k/v/proj_attn
    def canon(sd):
        out = dict(sd)
        for k in list(sd):
            k2 = (k.replace(".query.", ".to_q.").replace(".key.", ".to_k.")
                  .replace(".value.", ".to_v.").replace(".proj_attn.", ".to_out.0.")
                  .replace(".q.", ".to_q.").replace(".k.", ".to_k.")
                  .replace(".v.", ".to_v.").replace(".proj_out.", ".to_out.0."))
            if k2 != k:
                out[k2] = sd[k]
        return out

    sd = canon(torch_sd)

    def tname_vae(n):
        # our flat names 'down_blocks_0_resnets_1' -> 'down_blocks.0.resnets.1'
        # plus mid_block_* -> mid_block.*
        n = n.replace("mid_block_resnets_", "mid_block.resnets.")
        n = n.replace("mid_block_attentions_", "mid_block.attentions.")
        return n

    enc, m1, _ = fill_params(params["encoder"]["params"], sd,
                             rename=lambda n: rename_enc(tname_vae(n)),
                             strict=strict)
    dec, m2, _ = fill_params(params["decoder"]["params"], sd,
                             rename=lambda n: rename_dec(tname_vae(n)),
                             strict=strict)
    return {"encoder": {"params": enc}, "decoder": {"params": dec}}, m1 + m2


def convert_clip_text(clip_module, torch_sd, strict: bool = True):
    import jax

    params = clip_module.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 77), jnp.int32))

    def rename(n):
        if n == "token_embedding.weight":
            return "text_model.embeddings.token_embedding.weight"
        if n == "position_embedding":
            return "text_model.embeddings.position_embedding.weight"
        if n.startswith("final_layer_norm"):
            return "text_model." + n
        return "text_model.encoder." + n

    flat = _flatten(params["params"])
    out = {}
    missing = []
    for path, leaf_val in flat.items():
        if path == ("position_embedding",):
            tname = rename("position_embedding")
        else:
            tname = rename(_torch_name(path, ""))
        if tname not in torch_sd:
            missing.append(tname)
            out[path] = leaf_val
            continue
        leaf = path[-1] if path[-1] in ("kernel", "scale", "bias", "embedding") \
            else "other"
        out[path] = jnp.asarray(_convert_leaf(
            torch_sd[tname], leaf_val.shape,
            leaf if leaf != "other" else "bias"))
    if strict and missing:
        raise KeyError(f"missing {len(missing)} clip keys, e.g. {missing[:5]}")
    return {"params": _unflatten(out)}, missing
