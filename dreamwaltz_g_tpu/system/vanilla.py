"""VanillaAvatar: plain learnable 3DGS rigged by LBS.

(reference: VanillaAvatar, core/system/avatar.py:334-407 — gs_type='vanilla':
a GaussianModel whose positions live in zero-pose space and are forward-LBS'd
into the observed pose; colors come from its own SH features instead of a
NeRF field.)

Built on gaussian.model.GaussianState plus per-point LBS weights; animation
reuses human/glbs like the hybrid avatar.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gaussian.model import (
    GaussianState,
    init_state,
    opacities,
    rotations,
    scales,
    view_colors,
)
from ..human.glbs import glbs_transforms
from ..human.smplx_model import SMPLXModelData, SMPLXParams, smplx_forward
from ..ops.mesh import find_nearest_triangles
from .avatar import GaussiansOut, forward_lbs, initialize_lbs_weights, inverse_lbs


class VanillaAvatarModel(NamedTuple):
    smpl: SMPLXModelData
    canonical_inputs: SMPLXParams
    sh_degree: int = 3
    max_scale: Optional[float] = None
    flip_rotation_axis: bool = True


class VanillaAvatarState(NamedTuple):
    gaussians: GaussianState
    lbs_weights: jnp.ndarray  # (C, J)

    @property
    def capacity(self) -> int:
        return self.gaussians.capacity


def init_vanilla_avatar(
    model: VanillaAvatarModel,
    point_cloud: jnp.ndarray,
    colors: Optional[jnp.ndarray] = None,
    capacity: Optional[int] = None,
    sh_levels: int = 4,
    init_scale: float = 0.001,
    init_opacity: float = 0.99,
    lbs_weight_smooth: bool = False,
    lbs_weight_smooth_K: int = 30,
    lbs_weight_smooth_N: int = 5000,
) -> VanillaAvatarState:
    """Attach LBS weights by nearest triangle and inverse-LBS the cloud into
    zero-pose space (the same init geometry as the hybrid avatar,
    reference: avatar.py:360-407)."""
    smpl_out = smplx_forward(model.smpl, model.canonical_inputs)
    verts = smpl_out.vertices[0]
    faces = jnp.asarray(model.smpl.faces)
    nearest = find_nearest_triangles(point_cloud, verts, faces)
    lbs_w = initialize_lbs_weights(model.smpl, nearest, point_cloud,
                                   smooth=lbs_weight_smooth,
                                   smooth_K=lbs_weight_smooth_K,
                                   smooth_N=lbs_weight_smooth_N)
    canonical_tr = glbs_transforms(model.smpl, model.canonical_inputs)
    zero_pose = inverse_lbs(canonical_tr, point_cloud, lbs_w)

    # init_scale: scalar, or per-point (N, 3) linear scales (the
    # gaussian_scale_init='radius' SuGaR path, reference avatar.py:196-221)
    scale_arr = init_scale if hasattr(init_scale, "ndim") \
        else jnp.full((point_cloud.shape[0], 3), init_scale)
    gs = init_state(zero_pose, colors, capacity=capacity, sh_levels=sh_levels,
                    init_opacity=init_opacity, init_scale=scale_arr)
    C = gs.capacity
    N = point_cloud.shape[0]
    if C > N:
        lbs_w = jnp.concatenate(
            [lbs_w, jnp.zeros((C - N, lbs_w.shape[1]))], axis=0)
    return VanillaAvatarState(gaussians=gs, lbs_weights=lbs_w)


def animate_vanilla(
    model: VanillaAvatarModel,
    state: VanillaAvatarState,
    observed_inputs: Optional[SMPLXParams] = None,
    campos: Optional[jnp.ndarray] = None,
) -> GaussiansOut:
    """(reference: VanillaAvatar.forward, avatar.py:380-407)"""
    if observed_inputs is None:
        observed_inputs = model.canonical_inputs
    observed_tr = glbs_transforms(model.smpl, observed_inputs)

    p = state.gaussians.params
    positions, quats = forward_lbs(
        observed_tr, p.means, state.lbs_weights, rotations(p),
        flip_rotation_axis=model.flip_rotation_axis)
    if campos is not None:
        colors = view_colors(p, campos, model.sh_degree)
    else:
        from ..gaussian.model import dc_colors

        colors = dc_colors(p)
    C = state.capacity
    return GaussiansOut(
        positions=positions,
        colors=colors,
        opacities=opacities(p),
        scales=scales(p, model.max_scale),
        quats=quats,
        alive=state.gaussians.alive,
        densify_mask=jnp.ones(C, bool),
    )
