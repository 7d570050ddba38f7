"""DMTet: learnable SDF + vertex deformation on a tetrahedral grid.

(reference: _DMTetRenderer, core/nerf/nerf_renderer.py:475-646 +
core/nerf/isosurface/dmtet.py — an optional mesh-based finetune stage; the
reference ships it but no released script uses it. Here the marching-tets
core (nerf/isosurface.py) is differentiable through the edge interpolation,
so SDF/deform gradients flow from any loss on the extracted surface; the
normal-consistency and Laplacian regularizers come from training/losses.)

The reference rasterizes the mesh with nvdiffrast for RGB supervision; the
TPU analog renders the extracted surface as flat splats through the 3DGS
rasterizer (one gaussian per triangle, oriented by the face frame) — fully
differentiable end-to-end without a separate mesh rasterizer.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rasterize as R
from ..utils.transforms import matrix_to_quat, safe_normalize
from .isosurface import TriangleSoup, make_tet_grid, marching_tets
from .network import NeRFModel, NeRFParams


class DMTetParams(NamedTuple):
    sdf: jnp.ndarray      # (V,) learnable signed values
    deform: jnp.ndarray   # (V, 3) learnable vertex offsets


class DMTetModel(NamedTuple):
    verts: jnp.ndarray    # (V, 3) static tet-grid vertices
    tets: jnp.ndarray     # (Tt, 4)
    bound: float
    deform_scale: float   # max offset = deform_scale * grid spacing

    @staticmethod
    def create(resolution: int = 64, bound: float = 1.0,
               deform_scale: float = 0.45) -> "DMTetModel":
        v, t = make_tet_grid(resolution, bound)
        return DMTetModel(verts=jnp.asarray(v), tets=jnp.asarray(t),
                          bound=bound,
                          deform_scale=deform_scale * 2 * bound / resolution)

    def init_from_nerf(self, nerf: NeRFModel, params: NeRFParams,
                       density_thresh: float = 10.0,
                       chunk: int = 128 ** 2) -> DMTetParams:
        """Seed the SDF from the stage-1 density field
        (reference: init_tet, nerf_renderer.py:497-520)."""
        pts = self.verts
        n = pts.shape[0]
        pad = (-n) % chunk
        if pad:
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3))])
        sigma = jax.lax.map(lambda p: nerf.density(params, p)[0],
                            pts.reshape(-1, chunk, 3)).reshape(-1)[:n]
        return DMTetParams(sdf=sigma - density_thresh,
                           deform=jnp.zeros_like(self.verts))

    def init_sphere(self, radius: float = 0.5) -> DMTetParams:
        sdf = radius - jnp.linalg.norm(self.verts, axis=-1)
        return DMTetParams(sdf=sdf, deform=jnp.zeros_like(self.verts))

    def extract(self, params: DMTetParams) -> TriangleSoup:
        verts = self.verts + jnp.tanh(params.deform) * self.deform_scale
        return marching_tets(verts, params.sdf, self.tets)


def render_dmtet_splats(
    soup: TriangleSoup,
    colors: jnp.ndarray,         # (M, 3) per-triangle colors
    extrinsic: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_height: int,
    image_width: int,
    opacity: float = 0.95,
    **raster_kwargs,
) -> R.RasterOutput:
    """Render the marching-tets surface as one flat gaussian per triangle:
    centered at the centroid, oriented by the face frame, scaled to the
    triangle extents (thin along the normal)."""
    tris = soup.vertices                                     # (M, 3, 3)
    M = tris.shape[0]
    centroid = jnp.mean(tris, axis=1)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = jnp.cross(e1, e2)
    area2 = jnp.linalg.norm(n, axis=-1)
    n_hat = safe_normalize(n)
    x_hat = safe_normalize(e1)
    y_hat = jnp.cross(n_hat, x_hat)
    Rm = jnp.stack([x_hat, y_hat, n_hat], axis=-1)
    quats = matrix_to_quat(Rm)
    s1 = jnp.linalg.norm(e1, axis=-1) * 0.5
    s2 = jnp.abs(jnp.sum(e2 * y_hat, axis=-1)) * 0.5
    scales = jnp.stack([jnp.maximum(s1, 1e-6), jnp.maximum(s2, 1e-6),
                        jnp.full((M,), 1e-5)], axis=-1)
    opac = jnp.where(soup.valid & (area2 > 1e-12), opacity, 0.0)
    return R.rasterize(
        centroid, quats, scales, opac, colors, extrinsic, intrinsics,
        image_height, image_width, alive=soup.valid, **raster_kwargs)
