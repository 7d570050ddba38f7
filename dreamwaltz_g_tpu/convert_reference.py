"""Convert reference DreamWaltz-G torch checkpoints into this package's
state pytrees, so avatars trained with the reference can be animated here
(SURVEY.md §7.4 v0 milestone).

Reference checkpoint layout (reference: core/trainer.py:238-257
save_checkpoint — ``{'train_step', 'checkpoints', 'model': scene
state_dict, ...}``; scene keys are ``avatar.<param>`` /
``background.<param>``, organize_state_dict at core/system/scene.py:188-195):

* ``avatar._positions / _scales / _quaternions / _lbs_weights``
  (DreamWaltzG learnables, avatar.py:1210-1245)
* ``avatar.nerf_encoder.embeddings`` — flat (sum_T, F) hash tables
  (gridencoder/grid.py layout; converts via encoder.tables_from_flat)
* ``avatar.nerf_opacity_and_color_net.net.{i}.weight/bias`` — the sigma MLP
  (nerf_model.py:12-32 MLP)
* ``avatar.deform_model.layers.{i}.weight/bias`` + heads
  ``gaussian_warp/gaussian_rotation/gaussian_scaling``
  (deform_model.py:61-146)
* ``avatar.mesh_binding_gaussians.<part>._bary_coords/_vertex_coords/_scales``
  (avatar.py:920-1095)
* ``avatar._betas`` — learnable extra betas (avatar.py:1225)

Stage-1 NeRF checkpoints (``model`` = _NeRFNetwork state dict):
``encoder.embeddings``, ``sigma_net.net.{i}.*``, ``bg_net.net.{i}.*``.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .nerf.encoder import GridEncoderConfig, tables_from_flat
from .nerf.network import NeRFParams


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth and return the flat model state dict as numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in sd.items()}


def _strip(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _mlp_params(sd: Dict[str, np.ndarray], prefix: str, num_layers: int,
                ) -> dict:
    """torch MLP(.net.{i}.weight/bias) -> flax SigmaMLP dense_{i} params."""
    out = {}
    for i in range(num_layers):
        w = sd[f"{prefix}net.{i}.weight"]
        layer = {"kernel": jnp.asarray(w.T)}
        if f"{prefix}net.{i}.bias" in sd:
            layer["bias"] = jnp.asarray(sd[f"{prefix}net.{i}.bias"])
        out[f"dense_{i}"] = layer
    return {"params": out}


def convert_nerf_checkpoint(
    sd: Dict[str, np.ndarray],
    enc_cfg: GridEncoderConfig,
    num_layers: int = 3,
    with_background: bool = True,
    bg_layers: int = 2,
) -> NeRFParams:
    """Stage-1 NeRF state dict -> NeRFParams."""
    encoder = tables_from_flat(enc_cfg, sd["encoder.embeddings"])
    sigma = _mlp_params(sd, "sigma_net.", num_layers)
    bg = None
    if with_background and "bg_net.net.0.weight" in sd:
        bg = _mlp_params(sd, "bg_net.", bg_layers)
    return NeRFParams(encoder=encoder, sigma_mlp=sigma, bg_mlp=bg)


def _deform_params(sd: Dict[str, np.ndarray], depth: int) -> dict:
    """torch DeformNetwork (layers.{i} + three heads,
    deform_model.py:84-100) -> flax human/deform.DeformNetwork params."""
    def wb(name):
        return {"kernel": jnp.asarray(sd[f"{name}.weight"].T),
                "bias": jnp.asarray(sd[f"{name}.bias"])}

    out = {f"dense_{i}": wb(f"layers.{i}") for i in range(depth)
           if f"layers.{i}.weight" in sd}
    out["head_offset"] = wb("gaussian_warp")
    out["head_quat"] = wb("gaussian_rotation")
    out["head_scale"] = wb("gaussian_scaling")
    return {"params": out}


def convert_avatar_checkpoint(
    sd: Dict[str, np.ndarray],
    model,            # system.avatar.AvatarModel
    capacity: Optional[int] = None,
):
    """Scene/avatar state dict -> (AvatarParams-compatible dict, alive).

    Returns an ``AvatarState`` sized to ``capacity`` (default: the
    checkpoint's live count padded +25% for densification headroom).
    """
    from .system.avatar import (
        AvatarParams,
        AvatarState,
        MeshBindingParams,
        init_mesh_binding_params,
    )

    av = _strip(sd, "avatar.")
    pos = av["_positions"]
    N = pos.shape[0]
    C = capacity or int(N * 1.25)
    assert C >= N

    def pad(a, fill=0.0):
        a = np.asarray(a, np.float32)
        if C == N:
            return jnp.asarray(a)
        return jnp.asarray(np.concatenate(
            [a, np.full((C - N,) + a.shape[1:], fill, np.float32)], axis=0))

    encoder = tables_from_flat(model.enc_cfg, av["nerf_encoder.embeddings"])
    color_mlp = _mlp_params(av, "nerf_opacity_and_color_net.",
                            model.color_mlp.num_layers)
    deform = _strip(av, "deform_model.")
    sq_net = _deform_params(deform, model.sq_net.depth) if deform \
        else model.sq_net.init(
            __import__("jax").random.PRNGKey(0),
            jnp.zeros((1, model.enc_cfg.output_dim)), jnp.zeros((1, 63)))

    mesh = {}
    for name, static in model.mesh_parts.items():
        part = _strip(av, f"mesh_binding_gaussians.{name}.")
        if "_bary_coords" in part:
            mesh[name] = MeshBindingParams(
                bary_coords=jnp.asarray(part["_bary_coords"], jnp.float32),
                vertex_coords=jnp.asarray(part["_vertex_coords"], jnp.float32)
                if "_vertex_coords" in part
                else model.smpl.v_template[jnp.asarray(static.vertex_indices)],
                scales=jnp.asarray(part["_scales"], jnp.float32)
                if "_scales" in part
                else jnp.ones((static.points_to_triangles.shape[0], 3)),
            )
        else:
            mesh[name] = init_mesh_binding_params(static, model.smpl.v_template)

    n_betas = model.smpl.num_betas
    extra_betas = jnp.zeros((n_betas,))
    if "_betas" in av:
        b = np.asarray(av["_betas"], np.float32).reshape(-1)[:n_betas]
        extra_betas = jnp.asarray(np.pad(b, (0, n_betas - b.shape[0])))

    quats = av.get("_quaternions")
    if quats is None:
        quats = np.zeros((N, 4), np.float32)
        quats[:, 0] = 1.0
    params = AvatarParams(
        positions=pad(pos),
        log_scales=pad(av["_scales"], fill=-10.0),
        quats=pad(quats),
        lbs_weights=pad(av["_lbs_weights"]),
        encoder=encoder,
        color_mlp=color_mlp,
        sq_net=sq_net,
        mesh=mesh,
        extra_betas=extra_betas,
        smpl_learn={},
    )
    alive = jnp.asarray(np.arange(C) < N)
    z = jnp.zeros((C,), jnp.float32)
    return AvatarState(params=params, alive=alive, grad_accum=z,
                       grad_denom=z, max_radii=z)


def convert_gaussian_checkpoint(sd: Dict[str, np.ndarray],
                                capacity: Optional[int] = None):
    """Plain 3DGS GaussianModel state dict -> gaussian.model.GaussianState
    (reference: gaussian_model.py:12-94 — vanilla avatar / background)."""
    from .gaussian.model import GaussianParams, GaussianState

    pos = np.asarray(sd["_positions"], np.float32)
    N = pos.shape[0]
    C = capacity or N

    def pad(a, fill=0.0):
        a = np.asarray(a, np.float32)
        if C == N:
            return jnp.asarray(a)
        return jnp.asarray(np.concatenate(
            [a, np.full((C - N,) + a.shape[1:], fill, np.float32)]))

    dc = np.asarray(sd["_sh_features_dc"], np.float32).reshape(N, 1, 3)
    rest = np.asarray(sd["_sh_features_rest"], np.float32).reshape(N, -1, 3)
    params = GaussianParams(
        means=pad(pos),
        sh_dc=pad(dc),
        sh_rest=pad(rest),
        opacity_logit=pad(np.asarray(sd["_opacities"]).reshape(N, 1),
                          fill=-10.0),
        log_scales=pad(sd["_scales"], fill=-10.0),
        quats=pad(sd["_quaternions"]),
    )
    z = jnp.zeros((C,), jnp.float32)
    return GaussianState(params=params, alive=jnp.asarray(np.arange(C) < N),
                         grad_accum=z, grad_denom=z, max_radii=z)
