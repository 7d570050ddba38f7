"""Avatars, scene composition, backgrounds."""
from .avatar import (  # noqa: F401
    AvatarModel,
    AvatarParams,
    AvatarState,
    GaussiansOut,
    animate,
    init_avatar_state,
    merge_gaussians,
)
from .scene import Scene, SceneRender, render_gaussians  # noqa: F401
