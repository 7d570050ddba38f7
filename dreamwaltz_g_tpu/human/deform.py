"""Pose-conditioned non-rigid deformation network.

Counterpart of the reference ``DeformNetwork``
(reference: core/deformation/deform_model.py:61-146): an MLP over
(position-features ⊕ body_pose[63]) emitting per-gaussian non-rigid
(Δoffset, Δscale, Δquaternion). The reference's two input modes are kept:
hash-encoder features (xyz_input_ch=32) or frequency-encoded raw positions.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nerf.encoder import frequency_encode


class DeformNetwork(nn.Module):
    """MLP (D layers, width W) with three output heads.

    If ``xyz_input_ch`` is None, raw (N, 3) positions are frequency-encoded
    (multires 10) like the reference's default path (deform_model.py:75-84).
    """

    depth: int = 4
    width: int = 64
    xyz_input_ch: Optional[int] = 32
    pose_ch: int = 63
    freq_degree: int = 10
    residual: bool = False

    @nn.compact
    def __call__(self, xyz_feats: jnp.ndarray, body_pose: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        n = xyz_feats.shape[0]
        if self.xyz_input_ch is None:
            xyz_feats = frequency_encode(xyz_feats, degree=self.freq_degree)
        pose = jnp.broadcast_to(body_pose.reshape(1, -1), (n, self.pose_ch))
        h = jnp.concatenate([xyz_feats, pose], axis=-1)
        inp = h
        for i in range(self.depth):
            h = nn.Dense(self.width, name=f"dense_{i}")(h)
            h = nn.relu(h)
            if self.residual and i == self.depth // 2:
                h = jnp.concatenate([h, inp], axis=-1)
        offsets = nn.Dense(3, name="head_offset",
                           kernel_init=nn.initializers.normal(1e-4))(h)
        scales = nn.Dense(3, name="head_scale",
                          kernel_init=nn.initializers.normal(1e-4))(h)
        quats = nn.Dense(4, name="head_quat",
                         kernel_init=nn.initializers.normal(1e-4))(h)
        return offsets, scales, quats
