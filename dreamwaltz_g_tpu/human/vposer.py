"""VPoser v2 body-pose prior: the decoder, in Flax.

(reference: core/human/smpl_utils.py:11-15 loads the human_body_prior VPoser
checkpoint; core/human/smpl_model.py:138-145 samples body poses from its
latent prior for 'vposer' / random-pose training.)

Only the decoder is needed (sampling): z (B, 32) -> 6D rotations per joint
-> axis-angle (B, 63). Weights convert from the released V02_05 snapshot
(``vposer_from_torch``); without a checkpoint, ``sample`` still provides a
scaled-normal fallback matching human/poses.sample_random_pose.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NUM_JOINTS = 21
LATENT_DIM = 32


def rot6d_to_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D rotation representation -> (..., 3, 3)
    (Zhou et al.; the reference's ContinousRotReprDecoder)."""
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    b2 = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    tr = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1 + 1e-7,
                  1 - 1e-7)
    angle = jnp.arccos(tr)
    axis = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-8)
    return axis * angle[..., None]


class VPoserDecoder(nn.Module):
    """V02_05 decoder: 32 -> 512 -> 512 -> 21*6 (6D rot)."""

    hidden: int = 512

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="dense_0")(z)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(self.hidden, name="dense_1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(NUM_JOINTS * 6, name="dense_out")(x)
        R = rot6d_to_matrix(x.reshape(-1, NUM_JOINTS, 6))
        return matrix_to_axis_angle(R).reshape(-1, NUM_JOINTS * 3)


class VPoser:
    def __init__(self, params: Optional[dict] = None):
        self.decoder = VPoserDecoder()
        if params is None:
            params = self.decoder.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, LATENT_DIM)))
        self.params = params
        self._decode = jax.jit(lambda p, z: self.decoder.apply(p, z))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self._decode(self.params, z)

    def sample(self, key: jax.Array, batch_size: int = 1) -> jnp.ndarray:
        """(B, 63) body pose from the latent prior (reference:
        sample_body_pose, smpl_model.py:138-145)."""
        z = jax.random.normal(key, (batch_size, LATENT_DIM))
        return self.decode(z)

    def sample_body_fn(self):
        """Adapter for SMPLPrompt(sample_body_fn=...)."""
        return lambda key, batch_size: self.sample(key, batch_size)


def vposer_from_torch(state_dict) -> VPoser:
    """Convert the released VPoser V02_05 torch state dict (decoder keys
    ``decoder_net.{1,3,5}.{weight,bias}`` per human_body_prior)."""
    def wb(i):
        w = np.asarray(state_dict[f"decoder_net.{i}.weight"])
        b = np.asarray(state_dict[f"decoder_net.{i}.bias"])
        return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}

    params = {"params": {"dense_0": wb(1), "dense_1": wb(3),
                         "dense_out": wb(5)}}
    return VPoser(params)


def load_vposer(path: Optional[str] = None) -> Optional[VPoser]:
    """Load from a .npz (pre-converted) or torch .ckpt; None when absent."""
    import os.path as osp

    if path is None or not osp.exists(path):
        return None
    if path.endswith(".npz"):
        with np.load(path) as data:
            sd = {k: data[k] for k in data.files}
        return vposer_from_torch(sd)
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.replace("vp_model.", ""): v.numpy() for k, v in sd.items()
          if "decoder" in k}
    return vposer_from_torch(sd)
