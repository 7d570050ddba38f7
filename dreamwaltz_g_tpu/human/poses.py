"""Canonical pose library and random pose sampling.

(reference: core/human/smpl_model.py:138-298 — canonical T/A/Y poses with
the '-adjust' hip variants, 'canonical-R' randomized rest pose,
canonical-mixup, and random body/hand/expression sampling.)

SMPL-X body joint indices used (0-based within the 21 body joints):
0=left_hip, 1=right_hip, 15=left_shoulder, 16=right_shoulder.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .smplx_model import NUM_BODY_JOINTS, SMPLXModelData, SMPLXParams, default_params

L_HIP, R_HIP = 0, 1
L_SHOULDER, R_SHOULDER = 15, 16


def canonical_body_pose(pose_type: str, key: Optional[jax.Array] = None,
                        batch_size: int = 1) -> jnp.ndarray:
    """(B, 63) axis-angle body pose (reference: smpl_model.py:168-209)."""
    pose = np.zeros((batch_size, NUM_BODY_JOINTS, 3), np.float32)

    def set_hips(angle):
        pose[:, L_HIP, 2] = +angle
        pose[:, R_HIP, 2] = -angle

    def set_shoulders(angle):
        pose[:, L_SHOULDER, 2] = +angle
        pose[:, R_SHOULDER, 2] = -angle

    q = np.pi / 4
    adj = np.pi / 30
    if pose_type == "canonical-T":
        set_hips(q)
    elif pose_type == "canonical-T-adjust":
        set_hips(adj)
    elif pose_type == "canonical-Y":
        set_shoulders(q)
        set_hips(q)
    elif pose_type == "canonical-Y-adjust":
        set_shoulders(q)
        set_hips(adj)
    elif pose_type == "canonical-A":
        set_shoulders(-q)
        set_hips(q)
    elif pose_type in ("canonical-A-adjust", "canonical"):
        set_shoulders(-q)
        set_hips(adj)
    elif pose_type == "canonical-R":
        assert key is not None, "canonical-R needs a PRNG key"
        k1, k2 = jax.random.split(key)
        sh = jax.random.uniform(k1, (), minval=-q, maxval=q)
        hip = jax.random.uniform(k2, (), minval=adj, maxval=q)
        p = jnp.asarray(pose)
        p = p.at[:, L_SHOULDER, 2].set(-sh).at[:, R_SHOULDER, 2].set(+sh)
        p = p.at[:, L_HIP, 2].set(+hip).at[:, R_HIP, 2].set(-hip)
        return p.reshape(batch_size, -1)
    else:
        raise ValueError(f"unknown canonical pose {pose_type!r}")
    return jnp.asarray(pose.reshape(batch_size, -1))


def sample_random_pose(
    model: SMPLXModelData,
    key: jax.Array,
    parts: tuple = ("body", "hand", "expr"),
    batch_size: int = 1,
    body_scale: float = 0.3,
    hand_scale: float = 0.3,
    expr_scale: float = 1.5,
    base_body: Optional[jnp.ndarray] = None,
) -> SMPLXParams:
    """Random pose sampling for SDS training
    (reference: smpl_model.py:138-166, 229-252; the reference samples body
    pose via VPoser — here a scaled-normal prior doubles as the fallback when
    no VPoser checkpoint is present; plug a VPoser decoder in via
    human/vposer.py for the learned prior)."""
    kb, kh1, kh2, ke = jax.random.split(key, 4)
    p = default_params(model, batch_size)
    if "body" in parts:
        body = body_scale * jax.random.normal(kb, (batch_size, NUM_BODY_JOINTS * 3))
        if base_body is not None:
            body = body + base_body
        p = p._replace(body_pose=body)
    if "hand" in parts:
        p = p._replace(
            left_hand_pose=hand_scale * jax.random.normal(kh1, (batch_size, 45)),
            right_hand_pose=hand_scale * jax.random.normal(kh2, (batch_size, 45)),
        )
    if "expr" in parts:
        p = p._replace(
            expression=expr_scale * jax.random.normal(ke, (batch_size, model.num_expr)),
        )
    return p


def canonical_params(
    model: SMPLXModelData,
    pose_type: str = "canonical-A-adjust",
    batch_size: int = 1,
    key: Optional[jax.Array] = None,
    centralize_pelvis: bool = True,
    flat_hand: bool = True,
) -> SMPLXParams:
    """Full canonical SMPLXParams incl. pelvis centering and hand-mean
    cancellation (reference: get_smpl_inputs, smpl_model.py:211-298)."""
    p = default_params(model, batch_size)
    p = p._replace(body_pose=canonical_body_pose(pose_type, key, batch_size))
    if flat_hand and model.pose_mean.shape[0] >= 90:
        # cancel the model's pose_mean on the hands so canonical hands are flat
        lh = -model.pose_mean[-90:-45].reshape(1, 45)
        rh = -model.pose_mean[-45:].reshape(1, 45)
        p = p._replace(
            left_hand_pose=jnp.broadcast_to(lh, (batch_size, 45)),
            right_hand_pose=jnp.broadcast_to(rh, (batch_size, 45)),
        )
    if centralize_pelvis:
        pelvis = jnp.einsum("v,vc->c", model.J_regressor[0], model.v_template)
        p = p._replace(transl=jnp.broadcast_to(-pelvis[None], (batch_size, 3)))
    return p
