"""Gaussian-cloud-sharded rasterization over the device mesh.

SURVEY §7.10's second scaling lever (no reference counterpart — the
reference is single-GPU): for clouds too large for one chip's HBM/compute
(multi-avatar scenes, post-densification millions of splats), shard the
gaussians over ``Mesh(('data',))``:

* each chip animates/projects its N/D gaussian shard (projection is the
  per-gaussian FLOPs: covariance, EWA, culling),
* the projected 2D splats (~11 floats each) ride one ``all_gather`` over
  ICI — a few MB even at millions of gaussians,
* each chip then bins + blends its OWN row-block of the image against the
  full projected set (pixel-parallel blending: per-chip blend cost is
  H/D · W), and the row blocks concatenate back along the sharded axis.

Built on ``shard_map`` so the collectives are explicit and XLA schedules
the gather against the projection tail.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import rasterize as R
from .mesh import DATA_AXIS


def _pad_axis0(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


def make_sharded_render(
    mesh: Mesh,
    image_height: int,
    image_width: int,
    tile_size: int = 16,
    capacity: int = 512,
    chunk: int = 64,
    max_tiles_per_gaussian: int = 16,
    axis_name: str = DATA_AXIS,
):
    """Returns ``render(positions, quats, scales, opacities, colors, alive,
    extrinsic, intrinsics, tanfov, background) -> (image, alpha, depth)``
    with gaussians sharded on axis 0 and image rows sharded per chip."""
    D = mesh.shape[axis_name]
    H, W = image_height, image_width
    # per-chip row block, padded to a tile multiple so binning stays exact
    Hd = -(-H // D)
    Hd = -(-Hd // tile_size) * tile_size
    H_pad = Hd * D
    raster = dict(tile_size=tile_size, capacity=capacity, chunk=chunk,
                  max_tiles_per_gaussian=max_tiles_per_gaussian)

    def shard_fn(positions, quats, scales, opacities, colors, alive,
                 extrinsic, intrinsics, tanfov, background):
        # ---- per-shard projection (N/D gaussians on this chip) ----------
        cov3d = R.covariance3d(quats, scales)
        g2d = R.project_gaussians(
            positions, cov3d, opacities, colors, extrinsic, intrinsics,
            H_pad, W, tanfov=tanfov, alive=alive)
        # ---- gather the projected splats (small) over ICI ---------------
        g2d = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis_name, tiled=True), g2d)
        # ---- blend this chip's row block against the full set ------------
        row0 = jax.lax.axis_index(axis_name) * Hd
        shift = jnp.stack([jnp.zeros((), jnp.float32),
                           row0.astype(jnp.float32)])
        g2d = g2d._replace(means2d=g2d.means2d - shift)
        # drop splats that don't overlap this chip's row block: projection
        # culled against H_pad, so without this every other chip's splats
        # would clamp into the border tile rows and burn per-tile capacity
        # in depth order, evicting genuine splats (ADVICE r2 #2)
        y = g2d.means2d[:, 1]
        ov = (y + g2d.radius > 0) & (y - g2d.radius < Hd)
        g2d = g2d._replace(mask=g2d.mask & ov,
                           radius=jnp.where(ov, g2d.radius, 0.0))
        out = R.rasterize_projected(g2d, Hd, W, pallas_mode="eval", **raster)
        img = out.image + (1.0 - out.alpha)[..., None] \
            * jax.lax.dynamic_slice_in_dim(background, row0, Hd, 0)
        return img, out.alpha, out.depth

    kw = dict(
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(), P(), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
    )
    # the rasterizer's scan carries start unvarying (zeros) while the body
    # mixes in device-varying gathers — disable the vma/rep consistency
    # check (the collectives are explicit and correct by construction)
    try:
        sharded = shard_map(shard_fn, check_vma=False, **kw)
    except TypeError:
        try:
            sharded = shard_map(shard_fn, check_rep=False, **kw)
        except TypeError:
            sharded = shard_map(shard_fn, **kw)

    @jax.jit
    def render(positions, quats, scales, opacities, colors, alive,
               extrinsic, intrinsics, tanfov, background
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        N = positions.shape[0]
        Np = -(-N // D) * D
        args = [_pad_axis0(x, Np) for x in
                (positions, quats, scales, opacities, colors)]
        alive_p = _pad_axis0(alive, Np) if alive is not None \
            else jnp.arange(Np) < N
        alive_p = alive_p & (jnp.arange(Np) < N)
        bg = background
        if bg.shape[0] != H_pad:
            bg = jnp.concatenate(
                [bg, jnp.zeros((H_pad - bg.shape[0],) + bg.shape[1:],
                               bg.dtype)])
        img, alpha, depth = sharded(*args, alive_p, extrinsic, intrinsics,
                                    tanfov, bg)
        return img[:H], alpha[:H], depth[:H]

    return render
