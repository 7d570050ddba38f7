"""SD2.x model-family support: fixed-width heads, OpenCLIP-H text tower,
v-prediction conversion (reference model cards sd20/sd20b/sd21/sd21b,
basic.py:34-37 — the reference has NO v-prediction handling; here the 768-v
cards convert v -> eps at the UNet call so all SDS math stays in eps space).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.guidance import sds as S
from dreamwaltz_g_tpu.guidance.unet import (
    UNet2DCondition,
    UNetConfig,
    sd21_unet_config,
    tiny_unet_config,
)
from dreamwaltz_g_tpu.guidance.vae import AutoencoderKL, tiny_vae_config


def test_sd21_config_heads():
    """SD2.x uses a fixed 64-wide head: 5/10/20/20 heads over the levels
    (vs SD1.5's constant 8 heads)."""
    cfg = sd21_unet_config()
    assert cfg.cross_attention_dim == 1024
    assert [cfg.block_heads(c) for c in cfg.block_out_channels] == \
        [5, 10, 20, 20]
    from dreamwaltz_g_tpu.guidance.unet import sd15_unet_config
    c15 = sd15_unet_config()
    assert [c15.block_heads(c) for c in c15.block_out_channels] == [8] * 4


def test_sd2_style_tiny_unet_forward():
    """A scaled-down fixed-head-width config runs: per-level head counts
    derive from channels/head_dim like the real SD2.x UNet."""
    cfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                     cross_attention_dim=48, head_dim=16,
                     attn_down=(True, False))
    assert [cfg.block_heads(c) for c in cfg.block_out_channels] == [2, 4]
    unet = UNet2DCondition(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 16, 48))
    p = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx)
    out = unet.apply(p, x, jnp.asarray([100.0]), ctx)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_v_prediction_conversion_identity():
    """prediction_type='v_prediction' must return
    sqrt(ac)*v + sqrt(1-ac)*x_t where v is the raw module output."""
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (2, 16, ucfg.cross_attention_dim)) * 0.1
    p = unet.init(jax.random.PRNGKey(2), lat, jnp.zeros((2,)), ctx)
    params = S.GuidanceParams(unet=p, vae=None)

    t = jnp.asarray([100, 700], jnp.int32)
    sd_eps = S.ScoreDistillation(unet=unet, vae=vae, latent_size=8)
    sd_v = S.ScoreDistillation(unet=unet, vae=vae, latent_size=8,
                               prediction_type="v_prediction")
    raw = sd_eps._eps(params, lat, t, ctx)
    got = sd_v._eps(params, lat, t, ctx)
    ac = sd_v.schedule.alphas_cumprod[t].reshape(2, 1, 1, 1)
    want = jnp.sqrt(ac) * raw + jnp.sqrt(1.0 - ac) * lat
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_v_prediction_sds_step_runs():
    """Full SDS call under v-prediction: finite loss/grads, different from
    the epsilon-mode gradients (the conversion is not a no-op)."""
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, 16, ucfg.cross_attention_dim)) * 0.1
    up = unet.init(key, lat, jnp.zeros((1,)), ctx)
    vp = vae.init(jax.random.PRNGKey(2), image_size=16)
    params = S.GuidanceParams(unet=up, vae=vp)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3))
    t = jnp.asarray([400], jnp.int32)

    outs = {}
    for pt in ("epsilon", "v_prediction"):
        sd = S.ScoreDistillation(unet=unet, vae=vae, latent_size=8,
                                 prediction_type=pt)
        out = sd(params, imgs, ctx, ctx, t, jax.random.PRNGKey(4))
        assert np.isfinite(float(out["loss"])), pt
        assert np.isfinite(np.asarray(out["gradients"])).all(), pt
        outs[pt] = np.asarray(out["gradients"])
    assert np.abs(outs["epsilon"] - outs["v_prediction"]).max() > 1e-7


def test_model_families_loader_wiring():
    """MODEL_FAMILIES covers every non-XL reference card and
    _family_modules produces the matching towers."""
    from dreamwaltz_g_tpu.guidance.convert import (
        MODEL_FAMILIES,
        _family,
        _family_modules,
    )

    for card in ("sd14", "sd15", "sd20b", "sd20", "sd21b", "sd21",
                 "normal-adapted", "depth-adapted"):
        assert card in MODEL_FAMILIES
    with pytest.raises(KeyError):
        _family("sd99")

    unet, clip, ctx = _family_modules(MODEL_FAMILIES["sd21"])
    assert ctx == 1024
    assert clip.cfg.hidden_size == 1024 and clip.cfg.num_layers == 23
    assert unet.cfg.head_dim == 64
    assert MODEL_FAMILIES["sd21"]["pred"] == "v_prediction"
    assert MODEL_FAMILIES["sd21"]["latent"] == 96
    assert MODEL_FAMILIES["sd21b"]["pred"] == "epsilon"

    unet15, clip15, ctx15 = _family_modules(MODEL_FAMILIES["depth-adapted"])
    assert ctx15 == 768 and clip15.cfg.num_layers == 12


def test_convert_leaf_linear_to_1x1_conv():
    """use_linear_projection weights (torch nn.Linear) land in our 1x1
    convs — the reshape is exact."""
    from dreamwaltz_g_tpu.guidance.convert import _convert_leaf

    w = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
    out = _convert_leaf(w, (1, 1, 4, 6), "kernel")
    assert out.shape == (1, 1, 4, 6)
    np.testing.assert_allclose(out[0, 0], w.T)


def test_lora_merge_kohya_and_peft():
    """Offline LoRA merge: a kohya-ss (and diffusers-peft) adapter merged
    into the tiny UNet changes exactly the targeted kernels by
    scale*(alpha/r)*up@down, and the merged forward equals applying the
    low-rank delta by hand."""
    from dreamwaltz_g_tpu.guidance.convert import (
        _flatten,
        merge_lora_into_params,
    )

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 16, ucfg.cross_attention_dim))
    p = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx)

    # find a real attn q-projection path in the tiny tree
    flat = _flatten(p)
    qpaths = [path for path in flat
              if path[-1] == "kernel" and "to_q" in path[-2]
              and "attn1" in path[-3]]
    assert qpaths
    path = qpaths[0]
    name = "_".join(s for s in path[:-1] if s != "params")
    w = np.asarray(flat[path])
    din, dout = w.shape
    rng = np.random.default_rng(1)
    r, alpha, scale = 2, 4.0, 0.5
    down = rng.normal(size=(r, din)).astype(np.float32)
    up = rng.normal(size=(dout, r)).astype(np.float32)

    kohya = {f"lora_unet_{name}.lora_down.weight": down,
             f"lora_unet_{name}.lora_up.weight": up,
             f"lora_unet_{name}.alpha": np.asarray(alpha, np.float32),
             "lora_te_text_model_encoder_layers_0_mlp_fc1.lora_down.weight":
                 rng.normal(size=(2, 8)).astype(np.float32)}
    merged, n, leftover = merge_lora_into_params(p, kohya, scale=scale)
    assert n == 1
    want = w + ((up @ down) * (alpha / r) * scale).T
    got = np.asarray(_flatten(merged)[path])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    # peft naming merges identically (alpha defaults to r -> factor 1);
    # rebuild the dotted diffusers path: module indices become .N.
    import re
    dotted = re.sub(r"_(\d+)(_|$)", r".\1.", name).replace("_", ".") \
        .replace("..", ".").rstrip(".")
    peft = {f"unet.{dotted}.lora_A.weight": down,
            f"unet.{dotted}.lora_B.weight": up}
    merged2, n2, _ = merge_lora_into_params(p, peft, scale=1.0)
    assert n2 == 1
    want2 = w + (up @ down).T
    got2 = np.asarray(_flatten(merged2)[path])
    np.testing.assert_allclose(got2, want2, rtol=1e-6, atol=1e-7)

    # the merged UNet actually produces different outputs
    out0 = unet.apply(p, x, jnp.asarray([100.0]), jnp.ones_like(ctx))
    out1 = unet.apply(merged, x, jnp.asarray([100.0]), jnp.ones_like(ctx))
    assert np.abs(np.asarray(out0 - out1)).max() > 1e-7


def test_sd2_pad_token_is_bang(tmp_path):
    """SD2.x tokenizers pad with '!' (id 0), SD1.x with EOS — EOS-padding
    the causal OpenCLIP-H tower feeds it off-distribution context at every
    pad position (reference: the stabilityai tokenizer configs)."""
    import json

    import numpy as np

    from dreamwaltz_g_tpu.guidance.clip_text import (CLIPTokenizer,
                                                     _bytes_to_unicode)

    chars = list(_bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(tmp_path / "vocab.json"),
                        str(tmp_path / "merges.txt"))

    # SD1.x default: pad == EOS
    ids = tok("hi")
    assert ids[0, -1] == tok.eos

    # SD2.x: the loader flips pad_id to 0 for clip_h families
    tok.pad_id = 0
    ids = tok("hi")
    assert ids[0, -1] == 0
    # the terminating EOS survives right after the content tokens
    content_len = 1 + len(tok.encode("hi")) + 1
    assert ids[0, content_len - 1] == tok.eos
    assert (ids[0, content_len:] == 0).all()

    import inspect

    from dreamwaltz_g_tpu.guidance import convert

    src = inspect.getsource(convert.load_converted_guidance)
    assert "pad_id = 0" in src and "clip_h" in src
