"""General Linear Blend Skinning (GLBS).

Decomposes the SMPL-X LBS pipeline into named RigidTransforms so *arbitrary
3D points* (Gaussians) can be skinned by joint weights rather than vertex
attachment (reference: core/human/inverse_lbs.py:517-784, get_full_transform
652-717). Transform names and composition semantics match the reference:

* ``V_shape_offset``  — per-vertex translation by shape/expression offsets
* ``V_pose_offset``   — per-vertex translation by pose-corrective offsets
* ``V_pose_rigid``    — per-vertex SE(3) = W·A (LBS-blended joint transforms)
* ``J_shape_offset``  — per-joint translation (J_shaped − J_template)
* ``J_pose_rigid``    — per-joint SE(3) = A
* ``G_transl_offset`` — global translation

``transform_V = V_pose_rigid ∘ V_pose_offset ∘ V_shape_offset`` (applied to
the template vertices reproduces the SMPL-X forward), and
``transform_J = J_pose_rigid ∘ J_shape_offset`` (applied to template joints
reproduces posed joints).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp

from ..utils.transforms import RigidTransform, axis_angle_to_matrix
from .smplx_model import (
    SMPLXModelData,
    SMPLXParams,
    blend_shapes,
    full_pose_from_params,
    rigid_kinematics,
    vertices2joints,
)


class GLBSTransforms(NamedTuple):
    transform_J: RigidTransform              # per-joint: template-joint -> observed
    transform_V: RigidTransform              # per-vertex: template-vertex -> observed
    V_shape_offset: RigidTransform
    V_pose_offset: RigidTransform
    V_pose_rigid: RigidTransform
    J_shape_offset: RigidTransform
    J_pose_rigid: RigidTransform
    G_transl_offset: RigidTransform

    def as_dict(self) -> Dict[str, RigidTransform]:
        return self._asdict()


def joint_template(model: SMPLXModelData) -> jnp.ndarray:
    """(J, 3) rest joints of the unshaped template
    (reference: inverse_lbs.py:547-548)."""
    return jnp.einsum("jv,vc->jc", model.J_regressor, model.v_template)


#: SMPL-X template arrays that may be swapped for learnable copies via the
#: ``overrides`` argument of :func:`glbs_transforms` — the
#: ``--render.deform_learn_{v_template,shapedirs,posedirs,expr_dirs,
#: lbs_weights,J_regressor}`` knobs (reference: LinearBlendSkinning /
#: GeneralLinearBlendSkinning learnable nn.Parameters,
#: inverse_lbs.py:286-305).
LEARNABLE_TEMPLATE_KEYS = (
    "v_template", "shapedirs", "posedirs", "expr_dirs",
    "lbs_weights", "J_regressor",
)


def glbs_transforms(
    model: SMPLXModelData,
    params: SMPLXParams,
    full_pose: Optional[jnp.ndarray] = None,
    extra_betas: Optional[jnp.ndarray] = None,
    overrides: Optional[Dict[str, jnp.ndarray]] = None,
) -> GLBSTransforms:
    """Compute the named transform decomposition for one parameter batch.

    All outputs have leading batch dim B folded into the per-joint /
    per-vertex batch (the reference computes per-batch then squeezes; we keep
    B=1 semantics and return (J, ...) / (V, ...) transforms when B == 1).

    ``overrides`` maps a subset of :data:`LEARNABLE_TEMPLATE_KEYS` to
    learnable replacement arrays so gradients flow into the SMPL-X template
    itself (reference: ``deform_learn_*`` → requires_grad nn.Parameters,
    inverse_lbs.py:286-305; NOTE the reference never actually steps them —
    its only optimizer hookup is commented out, avatar.py:325-327 — while
    here ``build_avatar_optimizer`` wires the documented intent of
    ``LinearBlendSkinning.get_optimizer``, inverse_lbs.py:504-514).
    """
    ov = overrides or {}

    def arr(name):
        return ov.get(name, getattr(model, name))

    if full_pose is None:
        full_pose = full_pose_from_params(model, params)
    B = full_pose.shape[0]

    betas = params.betas
    if extra_betas is not None:
        betas = betas + extra_betas
    shape_components = jnp.concatenate([betas, params.expression], axis=-1)
    dirs = jnp.concatenate([arr("shapedirs"), arr("expr_dirs")], axis=-1)
    shape_offsets = blend_shapes(shape_components, dirs)          # (B, V, 3)
    v_shaped = arr("v_template")[None] + shape_offsets

    J_rest = vertices2joints(arr("J_regressor"), v_shaped)        # (B, J, 3)
    J_tmpl = jnp.einsum("jv,vc->jc", arr("J_regressor"), arr("v_template")) \
        if ov else joint_template(model)

    rot_mats = axis_angle_to_matrix(full_pose.reshape(B, -1, 3))
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ arr("posedirs")).reshape(B, -1, 3)

    _, A = rigid_kinematics(rot_mats, J_rest, model.parents)       # (B, J, 4, 4)
    T = jnp.einsum("vj,bjkl->bvkl", arr("lbs_weights"), A)         # (B, V, 4, 4)

    def _sq(x):
        return x[0] if B == 1 else x

    V_shape_offset = RigidTransform.from_trans(_sq(shape_offsets))
    V_pose_offset = RigidTransform.from_trans(_sq(pose_offsets))
    V_pose_rigid = RigidTransform.from_se3(_sq(T))
    J_shape_offset = RigidTransform.from_trans(_sq(J_rest - J_tmpl[None]))
    J_pose_rigid = RigidTransform.from_se3(_sq(A))

    # Global translation: scalar-batched transform ((3,) when B == 1), which
    # broadcasts against the (V,)/(J,)-batched transforms in compose.
    G_transl_offset = RigidTransform.from_trans(_sq(params.transl))

    transform_V = V_shape_offset.compose(V_pose_offset, V_pose_rigid, G_transl_offset)
    transform_J = J_shape_offset.compose(J_pose_rigid, G_transl_offset)

    return GLBSTransforms(
        transform_J=transform_J,
        transform_V=transform_V,
        V_shape_offset=V_shape_offset,
        V_pose_offset=V_pose_offset,
        V_pose_rigid=V_pose_rigid,
        J_shape_offset=J_shape_offset,
        J_pose_rigid=J_pose_rigid,
        G_transl_offset=G_transl_offset,
    )


def skin_points_by_joint_weights(
    transforms: GLBSTransforms,
    points: jnp.ndarray,
    joint_weights: jnp.ndarray,
    transl: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Skin arbitrary (N, 3) points with (N, J) joint weights: the GLBS core
    (reference: avatar.py uses J_pose_rigid weighted per-point).

    Equivalent to ``(W·A) @ p + transl``.
    """
    out = transforms.J_pose_rigid.transform_points(points, weights=joint_weights)
    if transl is not None:
        out = out + transl
    return out
