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
            if len(target_shape) == 4 and tuple(target_shape[:2]) == (1, 1):
                # SD2.x/SDXL use_linear_projection: torch nn.Linear
                # proj_in/proj_out land in our 1x1 conv (identical math —
                # a 1x1 conv over NHWC IS a per-pixel linear)
                a = a.reshape(1, 1, *a.shape)
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

    kw = {}
    if unet_module.cfg.addition_embed:  # SDXL 'text_time' conditioning
        kw = dict(
            pooled_embeds=jnp.zeros((1, unet_module.cfg.addition_pooled_dim)),
            add_time_ids=jnp.zeros((1, 6)))
    params = unet_module.init(
        jax.random.PRNGKey(0), jnp.zeros(sample_shape), jnp.zeros((1,)),
        jnp.zeros(context_shape), **kw)
    filled, missing, unused = fill_params(params["params"], torch_sd,
                                          strict=strict)
    return {"params": filled}, missing, unused


def convert_controlnet(cn_module, torch_sd, sample_shape=(1, 64, 64, 4),
                       context_shape=(1, 77, 768),
                       cond_shape=(1, 512, 512, 3), strict: bool = True):
    import jax

    kw = {}
    if cn_module.cfg.addition_embed:  # SDXL ControlNet 'text_time'
        kw = dict(
            pooled_embeds=jnp.zeros((1, cn_module.cfg.addition_pooled_dim)),
            add_time_ids=jnp.zeros((1, 6)))
    params = cn_module.init(
        jax.random.PRNGKey(0), jnp.zeros(sample_shape), jnp.zeros((1,)),
        jnp.zeros(context_shape), jnp.zeros(cond_shape), **kw)

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


def convert_clip_text(clip_module, torch_sd, strict: bool = True,
                      mode: str = "final"):
    """``mode='penultimate_pooled'`` additionally maps ``text_projection``
    (SDXL's text_encoder_2, stable_diffusion.py:120-175)."""
    import jax

    L = clip_module.cfg.max_length
    params = clip_module.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, L), jnp.int32), mode=mode)

    def rename(n):
        if n == "token_embedding.weight":
            return "text_model.embeddings.token_embedding.weight"
        if n == "position_embedding":
            return "text_model.embeddings.position_embedding.weight"
        if n.startswith("final_layer_norm"):
            return "text_model." + n
        if n.startswith("text_projection"):
            return "text_projection.weight"
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


# ---------------------------------------------------------------------------
# On-disk format: one msgpack per component under a weights dir
# ---------------------------------------------------------------------------

def _normalize_lora_sd(lora_sd: Dict[str, np.ndarray]):
    """LoRA state dict -> {kohya_module_name: (down, up, alpha)}.

    Accepts kohya-ss naming (``lora_unet_<mod>_.lora_down/lora_up.weight``
    + ``.alpha``) and diffusers-peft naming
    (``unet.<mod.with.dots>.lora_A/lora_B.weight``). Text-encoder entries
    (``lora_te*`` / ``text_encoder.*``) and other towers are returned
    separately-skipped so callers can report them."""
    mods: Dict[str, dict] = {}
    skipped = []
    for k, v in lora_sd.items():
        name = None
        slot = None
        if k.startswith("lora_unet_"):
            body = k[len("lora_unet_"):]
            if body.endswith(".lora_down.weight"):
                name, slot = body[:-len(".lora_down.weight")], "down"
            elif body.endswith(".lora_up.weight"):
                name, slot = body[:-len(".lora_up.weight")], "up"
            elif body.endswith(".alpha"):
                name, slot = body[:-len(".alpha")], "alpha"
        elif k.startswith("unet."):
            body = k[len("unet."):]
            for suf, sl in ((".lora_A.weight", "down"),
                            (".lora_B.weight", "up"),
                            (".lora_A.default.weight", "down"),
                            (".lora_B.default.weight", "up"),
                            (".lora.down.weight", "down"),
                            (".lora.up.weight", "up"),
                            (".alpha", "alpha")):
                if body.endswith(suf):
                    name = body[:-len(suf)].replace(".", "_")
                    # old diffusers attn-processor naming
                    name = name.replace("_processor", "")
                    name = name.replace("to_q_lora", "to_q") \
                        .replace("to_k_lora", "to_k") \
                        .replace("to_v_lora", "to_v") \
                        .replace("to_out_lora", "to_out_0")
                    slot = sl
                    break
        if name is None:
            skipped.append(k)
            continue
        mods.setdefault(name, {})[slot] = np.asarray(v, np.float32)
    out = {}
    n_alpha_defaulted = 0
    for name, d in mods.items():
        if "down" not in d or "up" not in d:
            skipped.append(name)
            continue
        down, up = d["down"], d["up"]
        # kohya conv LoRAs carry 4D (r, in, kh, kw); only 1x1 is a plain
        # matmul we can merge into our 1x1 convs
        if down.ndim == 4:
            if down.shape[2:] != (1, 1) or up.shape[2:] != (1, 1):
                skipped.append(name)
                continue
            down, up = down[:, :, 0, 0], up[:, :, 0, 0]
        r = down.shape[0]
        if "alpha" not in d:
            n_alpha_defaulted += 1
        alpha = float(d.get("alpha", r))
        out[name] = (down, up, alpha)
    if n_alpha_defaulted:
        # peft/diffusers safetensors carry no .alpha entries — lora_alpha
        # lives in adapter_config.json, which a flat state dict can't see.
        # alpha=r (factor 1.0) is the common default, but an adapter
        # trained with lora_alpha != r merges at the wrong strength;
        # compensate with --guide.lora_scale.
        import logging

        logging.getLogger(__name__).warning(
            "LoRA: %d modules carry no alpha entry — defaulting alpha=r "
            "(factor 1.0). If the adapter's config says lora_alpha != r, "
            "set --guide.lora_scale = lora_alpha/r.", n_alpha_defaulted)
    return out, skipped


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a flat torch/safetensors state dict into numpy (shared by the
    HF conversion entries and the LoRA loader)."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def merge_lora_into_params(params, lora_sd: Dict[str, np.ndarray],
                           scale: float = 1.0, prefix: str = ""):
    """Merge a LoRA adapter into converted Flax params, offline:
    ``W += scale * (alpha/r) * up @ down``.

    The reference loads adapters into the live diffusers pipeline
    (``load_lora``, basic.py:264,280-284 + the vendored lora_diffusion
    package); merging into the frozen base weights instead costs zero at
    train time — the UNet never updates, so base+delta is exact, and XLA
    sees one ordinary matmul per layer.

    Returns ``(merged_params, n_merged, unmatched_module_names)``.
    """
    mods, skipped = _normalize_lora_sd(lora_sd)
    flat = _flatten(params)
    n_merged = 0
    matched = set()
    out = {}
    for path, leaf in flat.items():
        out[path] = leaf
        if path[-1] != "kernel":
            continue
        name = "_".join(p for p in path[:-1] if p != "params")
        if name not in mods:
            continue
        down, up, alpha = mods[name]
        r = down.shape[0]
        delta = (up @ down) * (alpha / r) * scale     # (out, in)
        w = np.asarray(leaf, np.float32)
        if w.ndim == 2:                                # dense: (in, out)
            w = w + delta.T
        elif w.ndim == 4 and w.shape[:2] == (1, 1):    # 1x1 conv
            w = w + delta.T.reshape(w.shape)
        else:
            skipped.append(name)
            continue
        out[path] = jnp.asarray(w, dtype=leaf.dtype if hasattr(
            leaf, "dtype") else jnp.float32)
        matched.add(name)
        n_merged += 1
    leftover = sorted((set(mods) - matched) | set(skipped))
    return _unflatten(out), n_merged, leftover


def save_params(path, params) -> None:
    """flax-serialized msgpack (unet.msgpack / vae.msgpack / ...)."""
    import os

    from flax import serialization

    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path, template):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# model-card families (reference: MODEL_CARDS, basic.py:29-43). Each card
# maps to (unet config name, text tower, latent grid, prediction type);
# the HumanNorm cards are SD1.5-architecture finetunes. The 768-v cards
# (sd20/sd21) are v-prediction models — the loader wires
# prediction_type='v_prediction' so SDS runs in eps space (the reference
# feeds their raw v outputs into eps-space SDS; see sds.py:_eps).
MODEL_FAMILIES = {
    "sd14": dict(arch="sd15", text="clip_l", latent=64, pred="epsilon"),
    "sd15": dict(arch="sd15", text="clip_l", latent=64, pred="epsilon"),
    "normal-adapted": dict(arch="sd15", text="clip_l", latent=64,
                           pred="epsilon"),
    "depth-adapted": dict(arch="sd15", text="clip_l", latent=64,
                          pred="epsilon"),
    "sd20b": dict(arch="sd21", text="clip_h", latent=64, pred="epsilon"),
    "sd21b": dict(arch="sd21", text="clip_h", latent=64, pred="epsilon"),
    "sd20": dict(arch="sd21", text="clip_h", latent=96,
                 pred="v_prediction"),
    "sd21": dict(arch="sd21", text="clip_h", latent=96,
                 pred="v_prediction"),
}


def _family(model: str) -> dict:
    fam = MODEL_FAMILIES.get(model)
    if fam is None:
        raise KeyError(f"unknown model card {model!r}; known: "
                       f"{sorted(MODEL_FAMILIES)} + sdxl10 (XL loader)")
    return fam


def _family_modules(fam: dict):
    """(unet_module, clip_module, ctx_dim) for a model family."""
    from .clip_text import (
        CLIPTextConfig,
        CLIPTextModel,
        clip_h_config,
    )
    from .unet import UNet2DCondition, sd15_unet_config, sd21_unet_config

    ucfg = sd21_unet_config() if fam["arch"] == "sd21" \
        else sd15_unet_config()
    ccfg = clip_h_config() if fam["text"] == "clip_h" else CLIPTextConfig()
    return UNet2DCondition(ucfg), CLIPTextModel(ccfg), \
        ucfg.cross_attention_dim


def load_concept_embedding(path: str):
    """Load a Textual-Inversion concept file -> (token, (D,) np array)
    (reference: load_concept, basic.py:285-316 — downloads
    sd-concepts-library/<name>/learned_embeds.bin; offline file here).
    Accepts torch ``learned_embeds.bin`` ({token: (D,) tensor}), a
    safetensors file, or an .npz with one named array."""
    import numpy as np

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        d = dict(load_file(path))
    elif path.endswith(".npz"):
        z = np.load(path)
        d = {k: z[k] for k in z.files}
    else:
        import torch

        d = {k: v.detach().cpu().numpy() for k, v in torch.load(
            path, map_location="cpu", weights_only=True).items()}
    token = next(iter(d))
    emb = np.asarray(d[token], np.float32)
    if emb.ndim == 2:
        if emb.shape[0] != 1:
            raise ValueError(
                f"multi-vector concepts ({emb.shape[0]} vectors) are not "
                "supported — the reference's sd-concepts are single-vector")
        emb = emb[0]
    return token, emb


def merge_concept(clip_p, tokenizer, path: str):
    """Register the concept token and append its embedding row to the text
    tower's token table (reference: load_concept, basic.py:303-316)."""
    token, emb = load_concept_embedding(path)
    tok_id = tokenizer.add_token(token)
    table = clip_p["params"]["token_embedding"]["embedding"]
    if tok_id != table.shape[0]:
        raise ValueError(
            f"concept token id {tok_id} != table size {table.shape[0]}")
    if emb.shape[0] != table.shape[1]:
        raise ValueError(
            f"concept dim {emb.shape[0]} != text width {table.shape[1]}")
    new = jnp.concatenate(
        [table, jnp.asarray(emb, table.dtype)[None]], axis=0)
    out = dict(clip_p)
    out["params"] = dict(clip_p["params"])
    out["params"]["token_embedding"] = {"embedding": new}
    return out, token


def load_converted_guidance(
    weights_dir: str,
    use_controlnet: bool = True,
    loss_type: str = "sds",
    weight_type: str = "sjc",
    guidance_scale: float = 50.0,
    controlnet_scale: float = 1.0,
    guidance_rescale: float = 0.0,
    denoise_timesteps: int = 50,
    model: str = "sd15",
    lora_name: str = None,
    lora_scale: float = 1.0,
    concept_name: str = None,
):
    """Build the SD guidance stack from a converted-weights directory:
    ``unet.msgpack``, ``vae.msgpack``, ``clip.msgpack``, optional
    ``controlnet_{pose,depth,...}.msgpack``, plus the CLIP tokenizer
    ``vocab.json``/``merges.txt``. ``model`` picks the non-XL model card
    (MODEL_FAMILIES — SD1.x / SD2.x / HumanNorm; reference MODEL_CARDS,
    basic.py:29-43); the 768-v cards load with v-prediction + 96² latents.

    Returns (ScoreDistillation, GuidanceParams, text_embed_fn) where
    ``text_embed_fn(list[str]) -> (N, 77, D)`` runs the frozen text
    encoder (reference: get_text_embeds, stable_diffusion.py:31-50).
    """
    import os.path as osp

    import jax

    from .clip_text import CLIPTokenizer
    from .controlnet import ControlNet
    from .sds import GuidanceParams, ScoreDistillation
    from .vae import AutoencoderKL, sd_vae_config

    fam = _family(model)
    unet, clip, _ctx_dim = _family_modules(fam)
    ucfg = unet.cfg
    latent_size = fam["latent"]
    vae = AutoencoderKL(sd_vae_config())
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, latent_size, latent_size, 4))
    ctx = jnp.zeros((1, 77, ucfg.cross_attention_dim))
    unet_p = load_params(
        osp.join(weights_dir, "unet.msgpack"),
        unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx))
    if lora_name:
        # offline LoRA merge (reference: guide.lora_name + load_lora,
        # basic.py:264,280-284 with CIVITAI_LORA_ROOT)
        lpath = lora_name if osp.isfile(lora_name) else \
            osp.join(weights_dir, "lora", lora_name)
        lsd = load_torch_state_dict(lpath)
        unet_p, n_merged, leftover = merge_lora_into_params(
            unet_p, lsd, scale=lora_scale)
        import logging

        logging.getLogger(__name__).info(
            "merged LoRA %s into the UNet: %d layers (%d entries not "
            "mergeable, e.g. text-encoder/conv3x3)", lora_name, n_merged,
            len(leftover))
    vae_p = load_params(osp.join(weights_dir, "vae.msgpack"),
                        vae.init(key, image_size=512))

    cond_px = latent_size * 8
    cn, cn_p = None, None
    if use_controlnet:
        cn = ControlNet(ucfg)
        for cand in ("controlnet_pose.msgpack", "controlnet.msgpack"):
            p = osp.join(weights_dir, cand)
            if osp.isfile(p):
                cn_p = load_params(
                    p, cn.init(key, lat, jnp.zeros((1,), jnp.int32), ctx,
                               jnp.zeros((1, cond_px, cond_px, 3))))
                break
        if cn_p is None:
            cn = None

    clip_p = load_params(
        osp.join(weights_dir, "clip.msgpack"),
        clip.init(key, jnp.zeros((1, 77), jnp.int32)))
    tokenizer = CLIPTokenizer(osp.join(weights_dir, "vocab.json"),
                              osp.join(weights_dir, "merges.txt"))
    if fam["text"] == "clip_h":
        # SD2.x pads with "!" (id 0), not EOS — the stabilityai tokenizer
        # configs set pad_token="!"; EOS-padding would feed the causal
        # OpenCLIP-H tower off-distribution context at every pad position
        tokenizer.pad_id = 0
    if concept_name:
        # offline Textual-Inversion merge (reference: guide.concept_name +
        # load_concept, basic.py:266,285-316)
        cpath = concept_name
        if not osp.isfile(cpath):
            cpath = osp.join(weights_dir, "concepts", concept_name,
                             "learned_embeds.bin")
        clip_p, token = merge_concept(clip_p, tokenizer, cpath)
        import logging

        logging.getLogger(__name__).info(
            "merged Textual-Inversion concept %s (token %r) into the text "
            "tower", concept_name, token)

    encode = jax.jit(lambda ids: clip.apply(clip_p, ids))

    def text_embed_fn(texts):
        ids = tokenizer(list(texts))
        return encode(jnp.asarray(ids))

    sd = ScoreDistillation(
        unet=unet, vae=vae, controlnet=cn,
        loss_type=loss_type, weight_type=weight_type,
        guidance_scale=guidance_scale, controlnet_scale=controlnet_scale,
        guidance_rescale=guidance_rescale,
        denoise_timesteps=denoise_timesteps,
        latent_size=latent_size, prediction_type=fam["pred"])
    return sd, GuidanceParams(unet=unet_p, vae=vae_p, controlnet=cn_p), \
        text_embed_fn


def convert_from_hf_cache(hf_root: str, out_dir: str,
                          conditions=("pose",), model: str = "sd15") -> None:
    """Offline conversion entry: read diffusers/transformers torch weights
    (safetensors or .bin) for an SD model card + ControlNet and write the
    msgpack bundle ``load_converted_guidance`` consumes. ``model`` selects
    the family (MODEL_FAMILIES: SD1.x / SD2.x / HumanNorm finetunes;
    reference model cards: basic.py:29-89)."""
    import os.path as osp

    from .controlnet import ControlNet

    from .vae import AutoencoderKL, sd_vae_config

    load_sd = load_torch_state_dict

    fam = _family(model)
    unet, clip, ctx_dim = _family_modules(fam)
    ucfg = unet.cfg
    ls = fam["latent"]
    unet_p, _ = convert_unet(unet,
                             load_sd(osp.join(hf_root, "unet.safetensors")),
                             sample_shape=(1, ls, ls, 4),
                             context_shape=(1, 77, ctx_dim))
    save_params(osp.join(out_dir, "unet.msgpack"), unet_p)
    vae_p, _ = convert_vae(AutoencoderKL(sd_vae_config()),
                           load_sd(osp.join(hf_root, "vae.safetensors")))
    save_params(osp.join(out_dir, "vae.msgpack"), vae_p)
    clip_p, _ = convert_clip_text(
        clip, load_sd(osp.join(hf_root, "text_encoder.safetensors")))
    save_params(osp.join(out_dir, "clip.msgpack"), clip_p)
    for cond in conditions:
        path = osp.join(hf_root, f"controlnet_{cond}.safetensors")
        if osp.isfile(path):
            cn_p, _, _ = convert_controlnet(
                ControlNet(ucfg), load_sd(path),
                sample_shape=(1, ls, ls, 4),
                context_shape=(1, 77, ctx_dim),
                cond_shape=(1, ls * 8, ls * 8, 3))
            save_params(osp.join(out_dir, f"controlnet_{cond}.msgpack"), cn_p)


def convert_sdxl_from_hf_cache(hf_root: str, out_dir: str) -> None:
    """Offline SDXL-base conversion: diffusers torch weights -> the msgpack
    bundle ``load_converted_guidance_xl`` consumes (reference model card
    'sdxl10' -> stabilityai/stable-diffusion-xl-base-1.0, basic.py:36-49).

    Expects ``unet_xl.safetensors`` (or .bin), ``vae.safetensors``,
    ``text_encoder.safetensors`` (CLIP-L) and ``text_encoder_2.safetensors``
    (OpenCLIP bigG) under ``hf_root``.
    """
    import os.path as osp

    from .clip_text import CLIPTextConfig, CLIPTextModel, clip_bigg_config
    from .unet import UNet2DCondition, sdxl_unet_config
    from .vae import AutoencoderKL, sd_vae_config

    load_sd = load_torch_state_dict

    def find(*names):
        for n in names:
            for ext in (".safetensors", ".bin"):
                p = osp.join(hf_root, n + ext)
                if osp.isfile(p):
                    return p
        raise FileNotFoundError(f"none of {names} under {hf_root}")

    ucfg = sdxl_unet_config()
    unet_p, _, _ = convert_unet(
        UNet2DCondition(ucfg), load_sd(find("unet_xl", "unet")),
        sample_shape=(1, 128, 128, 4),
        context_shape=(1, 77, ucfg.cross_attention_dim))
    save_params(osp.join(out_dir, "unet_xl.msgpack"), unet_p)
    vae_p, _ = convert_vae(AutoencoderKL(sd_vae_config()),
                           load_sd(find("vae")), image_size=1024)
    save_params(osp.join(out_dir, "vae.msgpack"), vae_p)
    clip_p, _ = convert_clip_text(
        CLIPTextModel(CLIPTextConfig()), load_sd(find("text_encoder")))
    save_params(osp.join(out_dir, "clip.msgpack"), clip_p)
    clip2_p, _ = convert_clip_text(
        CLIPTextModel(clip_bigg_config()), load_sd(find("text_encoder_2")),
        mode="penultimate_pooled")
    save_params(osp.join(out_dir, "clip2.msgpack"), clip2_p)
    from .controlnet import ControlNet

    for cond in ("pose", "depth", "canny"):
        for ext in (".safetensors", ".bin"):
            path = osp.join(hf_root, f"controlnet_{cond}_xl{ext}")
            if osp.isfile(path):
                cn_p, _, _ = convert_controlnet(
                    ControlNet(ucfg), load_sd(path),
                    sample_shape=(1, 128, 128, 4),
                    context_shape=(1, 77, ucfg.cross_attention_dim),
                    cond_shape=(1, 1024, 1024, 3))
                save_params(
                    osp.join(out_dir, f"controlnet_{cond}_xl.msgpack"), cn_p)
                break


def load_converted_guidance_xl(
    weights_dir: str,
    loss_type: str = "sds",
    weight_type: str = "sjc",
    guidance_scale: float = 50.0,
    guidance_rescale: float = 0.0,
    denoise_timesteps: int = 50,
    use_controlnet: bool = False,
    controlnet_scale: float = 1.0,
    guess_mode: bool = False,
    lora_name: str = None,
    lora_scale: float = 1.0,
):
    """Build the SDXL guidance stack from a converted-weights directory:
    ``unet_xl.msgpack``, ``vae.msgpack``, ``clip.msgpack`` (CLIP-L) +
    ``clip2.msgpack`` (bigG), plus the tokenizer files.

    Returns (ScoreDistillationXL, GuidanceParams, text_embed_fn) where
    ``text_embed_fn(list[str]) -> (embeds (N, 77, 2048), pooled (N, 1280))``
    — the concatenated penultimate states of both encoders and encoder-2's
    projected pooled output (reference: ScoreDistillationXL.get_text_embeds,
    stable_diffusion.py:120-175)."""
    import os.path as osp

    import jax

    from .clip_text import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPTokenizer,
        clip_bigg_config,
    )
    from .sds import GuidanceParams
    from .sdxl import ScoreDistillationXL
    from .unet import UNet2DCondition, sdxl_unet_config
    from .vae import AutoencoderKL, sd_vae_config

    ucfg = sdxl_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(sd_vae_config())
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 128, 128, 4))
    ctx = jnp.zeros((1, 77, ucfg.cross_attention_dim))
    unet_p = load_params(
        osp.join(weights_dir, "unet_xl.msgpack"),
        unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx,
                  pooled_embeds=jnp.zeros((1, ucfg.addition_pooled_dim)),
                  add_time_ids=jnp.zeros((1, 6))))
    if lora_name:
        # same offline merge as the SD1.x/2.x loader (merge_lora_into_params
        # is loader-agnostic — it matches by flax param path)
        lpath = lora_name if osp.isfile(lora_name) else \
            osp.join(weights_dir, "lora", lora_name)
        lsd = load_torch_state_dict(lpath)
        unet_p, n_merged, leftover = merge_lora_into_params(
            unet_p, lsd, scale=lora_scale)
        import logging

        logging.getLogger(__name__).info(
            "merged LoRA %s into the SDXL UNet: %d layers (%d entries not "
            "mergeable)", lora_name, n_merged, len(leftover))
    vae_p = load_params(osp.join(weights_dir, "vae.msgpack"),
                        vae.init(key, image_size=1024))
    cn, cn_p = None, None
    if use_controlnet:
        from .controlnet import ControlNet

        import glob as _glob

        matches = sorted(_glob.glob(
            osp.join(weights_dir, "controlnet_*_xl.msgpack")))
        if matches:
            cn = ControlNet(ucfg)
            cn_p = load_params(
                matches[0],
                cn.init(key, lat, jnp.zeros((1,), jnp.int32), ctx,
                        jnp.zeros((1, 1024, 1024, 3)),
                        pooled_embeds=jnp.zeros(
                            (1, ucfg.addition_pooled_dim)),
                        add_time_ids=jnp.zeros((1, 6))))

    ids_probe = jnp.zeros((1, 77), jnp.int32)
    clip1 = CLIPTextModel(CLIPTextConfig())
    clip1_p = load_params(osp.join(weights_dir, "clip.msgpack"),
                          clip1.init(key, ids_probe))
    clip2 = CLIPTextModel(clip_bigg_config())
    clip2_p = load_params(
        osp.join(weights_dir, "clip2.msgpack"),
        clip2.init(key, ids_probe, mode="penultimate_pooled"))
    tokenizer = CLIPTokenizer(osp.join(weights_dir, "vocab.json"),
                              osp.join(weights_dir, "merges.txt"))

    enc1 = jax.jit(lambda ids: clip1.apply(clip1_p, ids, mode="penultimate"))
    enc2 = jax.jit(
        lambda ids: clip2.apply(clip2_p, ids, mode="penultimate_pooled"))

    def text_embed_fn(texts):
        ids = jnp.asarray(tokenizer(list(texts)))
        h1 = enc1(ids)
        h2, pooled = enc2(ids)
        return jnp.concatenate([h1, h2], axis=-1), pooled

    sd = ScoreDistillationXL(
        unet=unet, vae=vae, controlnet=cn,
        loss_type=loss_type, weight_type=weight_type,
        guidance_scale=guidance_scale, guidance_rescale=guidance_rescale,
        denoise_timesteps=denoise_timesteps, latent_size=128,
        controlnet_scale=controlnet_scale, guess_mode=guess_mode)
    return sd, GuidanceParams(unet=unet_p, vae=vae_p, controlnet=cn_p), \
        text_embed_fn


def convert_clip_vision(vision_module, torch_sd, strict: bool = True):
    """openai/clip ViT vision tower + visual projection -> our
    utils/r_precision.CLIPVisionModel params (HF CLIPVisionModel naming)."""
    import jax

    cfg = vision_module.cfg
    params = vision_module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))

    def rename(n):
        vm = "vision_model."
        if n == "patch_embedding.kernel":
            return vm + "embeddings.patch_embedding.weight"
        if n == "class_embedding":
            return vm + "embeddings.class_embedding"
        if n == "position_embedding":
            return vm + "embeddings.position_embedding.weight"
        if n.startswith("pre_layernorm"):
            return vm + n.replace("pre_layernorm", "pre_layrnorm")
        if n.startswith("post_layernorm"):
            return vm + n
        if n.startswith("visual_projection"):
            return "visual_projection.weight"
        return vm + "encoder." + n

    flat = _flatten(params["params"])
    out = {}
    missing = []
    for path, leaf_val in flat.items():
        name = ".".join(path)
        if path[-1] == "kernel":
            tname = rename(".".join(path[:-1]) + ".kernel"
                           if path[0] == "patch_embedding" else
                           _torch_name(path, ""))
            if path[0] == "visual_projection":
                tname = "visual_projection.weight"
        elif path == ("class_embedding",) or path == ("position_embedding",):
            tname = rename(name)
        else:
            tname = rename(_torch_name(path, ""))
        if tname not in torch_sd:
            missing.append(tname)
            out[path] = leaf_val
            continue
        arr = np.asarray(torch_sd[tname])
        if path[0] == "patch_embedding" and path[-1] == "kernel":
            # torch conv OIHW -> flax HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif path[-1] == "kernel":
            arr = arr.T
        out[path] = jnp.asarray(arr.reshape(leaf_val.shape))
    if strict and missing:
        raise KeyError(f"missing {len(missing)} clip-vision keys, "
                       f"e.g. {missing[:5]}")
    return {"params": _unflatten(out)}, missing
