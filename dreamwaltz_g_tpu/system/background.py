"""Scene backgrounds: pure color, learned MLP, and video frames.

(reference: core/system/background.py:14-160 — PureColorBackground,
MLPBackground on frequency-encoded ray directions, VideoBackground frame
provider for reenactment.)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.camera import CameraBatch, get_rays
from ..nerf.encoder import frequency_encode

COLOR_PRESETS = {
    "black": (0.0, 0.0, 0.0),
    "white": (1.0, 1.0, 1.0),
    "gray": (0.5, 0.5, 0.5),
}


class PureColorBackground(NamedTuple):
    """(reference: background.py:14-52)"""

    color: jnp.ndarray  # (3,)

    @staticmethod
    def make(color="black") -> "PureColorBackground":
        if isinstance(color, str):
            color = COLOR_PRESETS[color]
        return PureColorBackground(jnp.asarray(color, jnp.float32))

    def __call__(self, cam: CameraBatch, frame_idx: Optional[int] = None) -> jnp.ndarray:
        H, W = cam.image_height, cam.image_width
        return jnp.broadcast_to(self.color, (H, W, 3))


class BackgroundMLPNet(nn.Module):
    """Ray-direction frequency MLP (reference: background.py:55-89)."""

    hidden: int = 32
    num_layers: int = 2
    degree: int = 4

    @nn.compact
    def __call__(self, dirs):
        x = frequency_encode(dirs, degree=self.degree)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden, name=f"dense_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(3, name=f"dense_{self.num_layers - 1}")(x)
        return jax.nn.sigmoid(x)


class MLPBackground:
    """Stateful wrapper pairing the net definition with camera ray setup."""

    def __init__(self, net: Optional[BackgroundMLPNet] = None):
        self.net = net or BackgroundMLPNet()

    def init(self, key):
        return self.net.init(key, jnp.zeros((1, 3)))

    def __call__(self, params, cam: CameraBatch, frame_idx=None) -> jnp.ndarray:
        H, W = cam.image_height, cam.image_width
        _, rays_d = get_rays(cam.c2w[:1], cam.intrinsics[:1], H, W)
        return self.net.apply(params, rays_d[0]).reshape(H, W, 3)


class VideoBackground:
    """Preloaded frame stack indexed per eval frame — the reenactment
    compositing path (reference: background.py:92-160)."""

    def __init__(self, frames: np.ndarray):
        """frames: (T, H, W, 3) float32 in [0, 1]"""
        self.frames = jnp.asarray(frames)

    def __call__(self, cam: CameraBatch, frame_idx: int = 0) -> jnp.ndarray:
        f = self.frames[frame_idx % self.frames.shape[0]]
        assert f.shape[0] == cam.image_height and f.shape[1] == cam.image_width, (
            "video background resolution mismatch")
        return f


def load_gaussian_background(path: str):
    """PLY-initialized 3DGS background scene merged into every render
    (reference: --render.use_gs_background, scene.py:123-132, 233-235:
    GaussianModel.load_ply_and_initialize + DC-only SH colors precomputed
    before the avatar merge). Returns a frozen ``GaussiansOut``.

    The reference evaluates SH with sh_levels=1 (scene.py:127: degree 0 —
    direction-independent), so colors are a constant precompute here.
    """
    from ..ops.sh import C0
    from ..system.avatar import GaussiansOut
    from ..utils.point_cloud import load_gaussian_ply

    d = load_gaussian_ply(path)
    n = d["positions"].shape[0]
    colors = jnp.clip(jnp.asarray(d["sh_dc"]) * C0 + 0.5, 0.0, 1.0)
    return GaussiansOut(
        positions=jnp.asarray(d["positions"]),
        colors=colors,
        opacities=jax.nn.sigmoid(jnp.asarray(d["opacity_logit"])),
        scales=jnp.exp(jnp.asarray(d["log_scales"])),
        quats=jnp.asarray(d["quats"])
        / jnp.maximum(jnp.linalg.norm(jnp.asarray(d["quats"]), axis=-1,
                                      keepdims=True), 1e-8),
        alive=jnp.ones((n,), bool),
        densify_mask=jnp.zeros((n,), bool),
    )
