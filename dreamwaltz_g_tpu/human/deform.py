"""Pose-conditioned non-rigid deformation network.

Counterpart of the reference ``DeformNetwork``
(reference: core/deformation/deform_model.py:61-146): an MLP over
(position-features ⊕ body_pose[63]) emitting per-gaussian non-rigid
(Δoffset, Δscale, Δquaternion). The reference's two input modes are kept:
hash-encoder features (xyz_input_ch=32) or frequency-encoded raw positions.
Forward is golden-tested against the torch module with converted weights
(tests/test_reference_parity.py), including the leaky-ReLU activation,
skip-concat layout, and the optional 6-DoF screw-axis output
(``is_6dof``, reference: deform_model.py:94-133 + rigid_utils.exp_se3 —
present-but-unused by the reference's shipped configs).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nerf.encoder import frequency_encode


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) -> (N, 3, 3) cross-product matrices
    (reference: rigid_utils.py skew, Modern Robotics eqn 3.30)."""
    z = jnp.zeros_like(w[:, 0])
    rows = jnp.stack([z, -w[:, 2], w[:, 1],
                      w[:, 2], z, -w[:, 0],
                      -w[:, 1], w[:, 0], z], axis=-1)
    return rows.reshape(-1, 3, 3)


def exp_so3(w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, (N, 3) axis + (N, 1) angle -> (N, 3, 3)
    (reference: rigid_utils.py exp_so3)."""
    W = skew(w)
    W2 = W @ W
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    return jnp.eye(3)[None] + s * W + (1.0 - c) * W2


def exp_se3(S: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Screw-axis exponential, (N, 6) + (N, 1) -> (N, 4, 4) homogeneous
    transforms (reference: rigid_utils.py exp_se3, Modern Robotics eqn
    3.88)."""
    w, v = S[:, :3], S[:, 3:]
    W = skew(w)
    W2 = W @ W
    R = exp_so3(w, theta)
    th = theta.reshape(-1, 1, 1)
    G = (th * jnp.eye(3)[None] + (1.0 - jnp.cos(th)) * W
         + (th - jnp.sin(th)) * W2)
    p = G @ v[..., None]
    top = jnp.concatenate([R, p], axis=-1)                  # (N, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]]), (S.shape[0], 1, 4))
    return jnp.concatenate([top, bottom], axis=1)


class DeformNetwork(nn.Module):
    """MLP (D layers, width W) with three output heads.

    If ``xyz_input_ch`` is None, raw (N, 3) positions are frequency-encoded
    (multires 10) like the reference's default path (deform_model.py:75-84).
    With ``is_6dof`` the offset head becomes screw-axis (w, v) branches whose
    exp_se3 yields per-point (4, 4) transforms instead of (3,) offsets.
    """

    depth: int = 4
    width: int = 64
    xyz_input_ch: Optional[int] = 32
    pose_ch: int = 63
    freq_degree: int = 10
    residual: bool = False
    is_6dof: bool = False

    @nn.compact
    def __call__(self, xyz_feats: jnp.ndarray, body_pose: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        n = xyz_feats.shape[0]
        if self.xyz_input_ch is None:
            xyz_feats = frequency_encode(xyz_feats, degree=self.freq_degree)
        pose = jnp.broadcast_to(body_pose.reshape(1, -1), (n, self.pose_ch))
        inp = jnp.concatenate([xyz_feats, pose], axis=-1)
        h = inp
        for i in range(self.depth):
            h = nn.Dense(self.width, name=f"dense_{i}")(h)
            # torch F.leaky_relu default slope (deform_model.py:119)
            h = nn.leaky_relu(h, negative_slope=0.01)
            if self.residual and i == self.depth // 2:
                # reference skip layout: [x_emb, p_emb, h]
                # (deform_model.py:121-122) — input features first so a
                # plain kernel transpose converts torch weights
                h = jnp.concatenate([inp, h], axis=-1)
        if self.is_6dof:
            w = nn.Dense(3, name="branch_w",
                         kernel_init=nn.initializers.normal(1e-4))(h)
            v = nn.Dense(3, name="branch_v",
                         kernel_init=nn.initializers.normal(1e-4))(h)
            theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
            # the reference adds the epsilon AFTER normalizing
            # (deform_model.py:126-128) — preserved verbatim for parity
            w = w / theta + 1e-5
            v = v / theta + 1e-5
            offsets = exp_se3(jnp.concatenate([w, v], axis=-1), theta)
        else:
            offsets = nn.Dense(3, name="head_offset",
                               kernel_init=nn.initializers.normal(1e-4))(h)
        scales = nn.Dense(3, name="head_scale",
                          kernel_init=nn.initializers.normal(1e-4))(h)
        quats = nn.Dense(4, name="head_quat",
                         kernel_init=nn.initializers.normal(1e-4))(h)
        return offsets, scales, quats
