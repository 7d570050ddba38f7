"""Scene: avatar(s) + background -> rendered images.

(reference: core/system/scene.py:96-244 — Scene.forward renders the composed
gaussians through the rasterizer and alpha-composites the background;
build_scene picks the background implementation.)
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from ..data.camera import CameraBatch
from ..human.smplx_model import SMPLXParams
from ..ops import rasterize as R
from .avatar import (AvatarModel, AvatarState, GaussiansOut, animate,
                     merge_gaussians, place_gaussians)


class SceneRender(NamedTuple):
    image: jnp.ndarray       # (H, W, 3) with background composited
    alpha: jnp.ndarray       # (H, W)
    depth: jnp.ndarray       # (H, W)
    radii: jnp.ndarray       # (Ntot,) for densification stats
    foreground: jnp.ndarray  # (H, W, 3) pre-composite


def render_gaussians(
    gaussians: GaussiansOut,
    cam: CameraBatch,
    background: jnp.ndarray,
    view_index: int = 0,
    tile_size: int = 16,
    capacity: int = 512,
    chunk: int = 64,
    max_tiles_per_gaussian: int = 16,
) -> SceneRender:
    """Rasterize merged gaussians for one camera and composite the
    background (reference: scene.py:147-167 + gaussian_renderer.py:130-224)."""
    H, W = cam.image_height, cam.image_width
    cov3d = R.covariance3d(gaussians.quats, gaussians.scales)
    g2d = R.project_gaussians(
        gaussians.positions, cov3d, gaussians.opacities, gaussians.colors,
        cam.extrinsic[view_index], cam.intrinsics[view_index], H, W,
        tanfov=cam.tanfov[view_index], alive=gaussians.alive,
    )
    out = R.rasterize_projected(
        g2d, H, W, tile_size=tile_size, capacity=capacity, chunk=chunk,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
    )
    image = out.image + (1.0 - out.alpha)[..., None] * background
    return SceneRender(image=image, alpha=out.alpha, depth=out.depth,
                       radii=out.radii, foreground=out.image)


class Scene(NamedTuple):
    """A composed scene: one or more avatars + a background callable.

    ``background(cam, frame_idx) -> (H, W, 3)`` (PureColor/MLP/Video — see
    system/background.py). Extra avatars support the reference's
    ckpt_extra scene composition (reference: scene.py:213-222).
    """

    model: AvatarModel
    extra_models: tuple = ()
    # scene-level per-avatar placement: scalar/(A,) scale, (3,)/(A,3) transl
    # (reference: --render.avatar_scale/avatar_transl, scene.py:65-93)
    avatar_scale: Optional[jnp.ndarray] = None
    avatar_transl: Optional[jnp.ndarray] = None

    def forward(
        self,
        state: AvatarState,
        cam: CameraBatch,
        background: jnp.ndarray,
        observed_inputs: Optional[SMPLXParams] = None,
        extra_states: tuple = (),
        view_index: int = 0,
        **raster_kwargs,
    ) -> SceneRender:
        def place(gs, i):
            return place_gaussians(gs, self.avatar_scale,
                                   self.avatar_transl, index=i)

        gs = place(animate(self.model, state, observed_inputs), 0)
        if extra_states:
            extra = [
                place(animate(m, s, observed_inputs), i + 1)
                for i, (m, s) in enumerate(
                    zip(self.extra_models, extra_states))
            ]
            gs = merge_gaussians(gs, *extra)
        return render_gaussians(gs, cam, background, view_index, **raster_kwargs)
