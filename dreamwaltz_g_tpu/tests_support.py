"""Tiny synthetic fixtures shared by tests and smoke runs.

The SURVEY test strategy (SURVEY.md §4) calls for end-to-end smoke tests with
mock guidance and synthetic bodies so the full train loop runs on CPU without
the licensed SMPL-X npz or converted SD weights. These builders are also used
by the CLI's ``--log.debug`` mode.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .guidance.controlnet import ControlNet
from .guidance.sds import GuidanceParams, ScoreDistillation
from .guidance.unet import UNet2DCondition, tiny_unet_config
from .guidance.vae import AutoencoderKL, tiny_vae_config
from .human.deform import DeformNetwork
from .human.smplx_model import (
    SMPLXParams,
    default_params,
    make_synthetic_model,
)
from .nerf.encoder import GridEncoderConfig
from .nerf.network import SigmaMLP
from .system import avatar as A


class TinyAvatarSetup(NamedTuple):
    model: "A.AvatarModel"
    state: "A.AvatarState"
    cloud: jnp.ndarray
    observed: SMPLXParams


def tiny_avatar_setup(capacity: int = 128, n_points: int = 64,
                      num_vertices: int = 120, num_joints: int = 6,
                      seed: int = 0, with_mesh_part: bool = True,
                      enc_cfg=None,
                      ) -> TinyAvatarSetup:
    """A small articulated avatar around the synthetic stick body.

    ``enc_cfg``: override the NeRF-field encoder config — a
    GridEncoderConfig or TriplaneConfig (backbone dispatch, avatar
    color/opacity decode runs through nerf.encoder.encode_any)."""
    smpl = make_synthetic_model(num_vertices=num_vertices,
                                num_joints=num_joints, num_betas=3,
                                num_expr=2, seed=seed)
    canonical = default_params(smpl, 1)

    if enc_cfg is None:
        enc_cfg = GridEncoderConfig(num_levels=4, level_dim=2,
                                    base_resolution=4,
                                    desired_resolution=32,
                                    log2_hashmap_size=8)
    mesh_parts = {}
    if with_mesh_part:
        faces = smpl.faces
        v = np.asarray(smpl.v_template)
        top = np.argsort(-v[faces].mean(1)[:, 1])[:10]
        part_vids = np.unique(faces[top].reshape(-1))
        mesh_parts["face"] = A.make_mesh_binding_static(
            faces, part_vids, top, n_per_triangle=3)

    model = A.AvatarModel(
        smpl=smpl,
        canonical_inputs=canonical,
        enc_cfg=enc_cfg,
        nerf_bound=2.0,
        color_mlp=SigmaMLP(hidden=32, num_layers=2, out_channels=4),
        sq_net=DeformNetwork(depth=2, width=32,
                             xyz_input_ch=enc_cfg.output_dim),
        mesh_parts=mesh_parts,
    )
    rng = np.random.default_rng(seed)
    cloud = jnp.asarray(rng.normal(size=(n_points, 3)) * 0.15
                        + np.asarray([0, 0.7, 0]), jnp.float32)
    state = A.init_avatar_state(model, cloud, jax.random.PRNGKey(seed),
                                capacity=capacity,
                                prune_dists_close_to_mesh=None)
    observed = default_params(smpl, 1)
    return TinyAvatarSetup(model=model, state=state, cloud=cloud,
                           observed=observed)


def tiny_guidance(key: jax.Array, with_controlnet: bool = False,
                  latent_size: int = 8,
                  ) -> Tuple[ScoreDistillation, GuidanceParams]:
    """Randomly-initialized tiny SD stack — a 'random-noise UNet stub'
    guidance for CPU smoke tests (SURVEY.md §4 point d)."""
    k1, k2, k3 = jax.random.split(key, 3)
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    D = ucfg.cross_attention_dim
    lat = jnp.zeros((1, latent_size, latent_size, 4))
    ctx = jnp.zeros((1, 4, D))
    unet_p = unet.init(k1, lat, jnp.zeros((1,), jnp.int32), ctx)
    image_size = latent_size * 2 ** (len(vae.cfg.block_out_channels) - 1)
    vae_p = vae.init(k2, image_size=image_size)
    cn = None
    cn_p = None
    if with_controlnet:
        # cond embedding downsamples by 2^(len(cond_block_channels)-1);
        # tiny vae factor is 2, so use two cond blocks (real SD uses four)
        cn = ControlNet(ucfg, cond_block_channels=(16, 32))
        cn_p = cn.init(k3, lat, jnp.zeros((1,), jnp.int32), ctx,
                       jnp.zeros((1, image_size, image_size, 3)))
    sd = ScoreDistillation(unet=unet, vae=vae, controlnet=cn,
                           latent_size=latent_size, guidance_scale=7.5)
    return sd, GuidanceParams(unet=unet_p, vae=vae_p, controlnet=cn_p)


def tiny_guidance_xl(key: jax.Array, latent_size: int = 8):
    """Randomly-initialized tiny SDXL-style stack (addition embeds +
    pooled text) with a tiny dual text encoder — the debug stand-in for
    converted SDXL weights (reference model card 'sdxl10', basic.py:36-49).

    Returns (ScoreDistillationXL, GuidanceParams, text_embed_fn)."""
    from .guidance.clip_text import CLIPTextModel, HashTokenizer, \
        tiny_text_config
    from .guidance.sdxl import ScoreDistillationXL
    from .guidance.unet import UNetConfig

    k1, k2, k3, k4 = jax.random.split(key, 4)
    tcfg1 = tiny_text_config()
    tcfg2 = tiny_text_config()._replace(projection_dim=24, hidden_size=24)
    D = tcfg1.hidden_size + tcfg2.hidden_size
    ucfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                      cross_attention_dim=D, num_heads=2,
                      attn_down=(True, False), addition_embed=True,
                      addition_pooled_dim=tcfg2.projection_dim,
                      addition_time_embed_dim=8)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    lat = jnp.zeros((1, latent_size, latent_size, 4))
    ctx = jnp.zeros((1, 4, D))
    unet_p = unet.init(k1, lat, jnp.zeros((1,), jnp.int32), ctx,
                       pooled_embeds=jnp.zeros((1, tcfg2.projection_dim)),
                       add_time_ids=jnp.zeros((1, 6)))
    image_size = latent_size * 2 ** (len(vae.cfg.block_out_channels) - 1)
    vae_p = vae.init(k2, image_size=image_size)

    clip1 = CLIPTextModel(tcfg1)
    clip1_p = clip1.init(k3, jnp.zeros((1, tcfg1.max_length), jnp.int32))
    clip2 = CLIPTextModel(tcfg2)
    clip2_p = clip2.init(k4, jnp.zeros((1, tcfg2.max_length), jnp.int32),
                         mode="penultimate_pooled")
    tok = HashTokenizer(vocab_size=tcfg1.vocab_size,
                        max_length=tcfg1.max_length)

    def text_embed_fn(texts):
        ids = jnp.asarray(tok(list(texts)))
        h1 = clip1.apply(clip1_p, ids, mode="penultimate")
        h2, pooled = clip2.apply(clip2_p, ids, mode="penultimate_pooled")
        return jnp.concatenate([h1, h2], axis=-1), pooled

    sd = ScoreDistillationXL(unet=unet, vae=vae, latent_size=latent_size,
                             guidance_scale=7.5)
    return sd, GuidanceParams(unet=unet_p, vae=vae_p), text_embed_fn
