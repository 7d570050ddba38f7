"""3D Gaussian parameter state with static-capacity padded buffers.

Counterpart of the reference ``GaussianModel``
(reference: core/gaussian/gaussian_model.py:12-171) redesigned for XLA:
instead of resizing tensors during densification (and surgically rewriting
Adam state, reference: gaussian_densifier.py:120-182), the parameter arrays
are allocated once at ``capacity`` and carry an ``alive`` mask. Clone/split/
prune become masked writes into preallocated slots — shapes stay static so
every train step hits the same compiled executable.

Activations match the reference: sigmoid opacity, exp scales, normalized
quaternions, SH color with separate dc/rest (gaussian_model.py:24-56).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.sh import eval_sh, rgb_to_sh, sh_to_rgb
from ..utils.transforms import quat_normalize


class GaussianParams(NamedTuple):
    """Learnable parameters (raw / pre-activation), padded to capacity."""

    means: jnp.ndarray        # (C, 3)
    sh_dc: jnp.ndarray        # (C, 1, 3)
    sh_rest: jnp.ndarray      # (C, (L²-1), 3)
    opacity_logit: jnp.ndarray  # (C, 1)
    log_scales: jnp.ndarray   # (C, 3)
    quats: jnp.ndarray        # (C, 4) unnormalized


class GaussianState(NamedTuple):
    """Parameters + alive mask + densification statistics."""

    params: GaussianParams
    alive: jnp.ndarray        # (C,) bool
    # densification stats (reference: gaussian_densifier.py:201-209)
    grad_accum: jnp.ndarray   # (C,) accumulated ||dL/dmeans2d||
    grad_denom: jnp.ndarray   # (C,) number of accumulation steps seen
    max_radii: jnp.ndarray    # (C,) max screen-space radius observed

    @property
    def capacity(self) -> int:
        return self.params.means.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)


def init_state(
    positions: jnp.ndarray,
    colors: Optional[jnp.ndarray] = None,
    capacity: Optional[int] = None,
    sh_levels: int = 4,
    init_opacity: float = 0.99,
    init_scale: Optional[jnp.ndarray] = None,
    default_scale: float = 0.001,
) -> GaussianState:
    """Initialize from N points (e.g. a NeRF point cloud export), padding the
    buffers to ``capacity`` (reference init paths: core/system/avatar.py:65-161)."""
    N = positions.shape[0]
    C = capacity or N
    assert C >= N, "capacity must be >= number of seed points"
    n_rest = sh_levels * sh_levels - 1

    def pad(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((C - N,) + a.shape[1:], fill, a.dtype)], axis=0
        ) if C > N else a

    if colors is None:
        colors = jnp.full((N, 3), 0.5)
    if init_scale is None:
        init_scale = jnp.full((N, 3), default_scale)
    elif init_scale.ndim == 1:
        init_scale = jnp.broadcast_to(init_scale[:, None], (N, 3))

    logit = float(jnp.log(init_opacity / (1.0 - init_opacity)))
    params = GaussianParams(
        means=pad(positions.astype(jnp.float32)),
        sh_dc=pad(rgb_to_sh(colors.astype(jnp.float32))[:, None, :]),
        sh_rest=jnp.zeros((C, n_rest, 3), jnp.float32),
        opacity_logit=pad(jnp.full((N, 1), logit, jnp.float32), fill=-10.0),
        log_scales=pad(jnp.log(init_scale.astype(jnp.float32)), fill=-10.0),
        quats=jnp.zeros((C, 4), jnp.float32).at[:, 0].set(1.0),
    )
    alive = jnp.arange(C) < N
    z = jnp.zeros((C,), jnp.float32)
    return GaussianState(params=params, alive=alive, grad_accum=z,
                         grad_denom=z, max_radii=z)


# -- activations -------------------------------------------------------------

def opacities(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity_logit[:, 0])


def scales(p: GaussianParams, max_scale: Optional[float] = None) -> jnp.ndarray:
    s = jnp.exp(p.log_scales)
    if max_scale is not None:
        s = jnp.minimum(s, max_scale)
    return s


def rotations(p: GaussianParams) -> jnp.ndarray:
    return quat_normalize(p.quats)


def sh_coeffs(p: GaussianParams) -> jnp.ndarray:
    """(C, n_sh, 3) full SH coefficient stack."""
    return jnp.concatenate([p.sh_dc, p.sh_rest], axis=1)


def view_colors(p: GaussianParams, campos: jnp.ndarray, sh_degree: int) -> jnp.ndarray:
    """Evaluate SH toward the camera (reference: gaussian_renderer.py:72-105).
    Returns (C, 3) clamped to >= 0."""
    dirs = p.means - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    sh = jnp.swapaxes(sh_coeffs(p), 1, 2)  # (C, 3, n_sh)
    rgb = eval_sh(sh_degree, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)


def dc_colors(p: GaussianParams) -> jnp.ndarray:
    return jnp.clip(sh_to_rgb(p.sh_dc[:, 0, :]), 0.0, 1.0)
