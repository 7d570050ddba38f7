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

    def _query_sigma(self, nerf: NeRFModel, params: NeRFParams,
                     verts: jnp.ndarray, chunk: int) -> jnp.ndarray:
        n = verts.shape[0]
        pad = (-n) % chunk
        pts = jnp.concatenate([verts, jnp.zeros((pad, 3))]) if pad else verts
        return jax.lax.map(lambda p: nerf.density(params, p)[0],
                           pts.reshape(-1, chunk, 3)).reshape(-1)[:n]

    def init_from_nerf(self, nerf: NeRFModel, params: NeRFParams,
                       density_thresh: float = 10.0,
                       chunk: int = 128 ** 2,
                       fit_scale: bool = False,
                       ) -> "Tuple[DMTetModel, DMTetParams]":
        """Seed the SDF from the stage-1 density field, clamped to [-1, 1]
        as the reference does (init_tet, nerf_renderer.py:497-646:
        ``self.sdf.data += (sigma - density_thresh).clamp(-1, 1)``).

        ``fit_scale``: rescale the grid to hug the occupied region first
        (reference: ``tet_scale = valid_verts.abs().amax() + 1e-1``) and
        reseed at the new vertex positions. Returns (model, params) — the
        model changes when fit_scale moves the vertices."""
        model = self
        sigma = self._query_sigma(nerf, params, model.verts, chunk)
        if fit_scale:
            occupied = sigma > density_thresh
            extent = jnp.max(jnp.where(occupied[:, None],
                                       jnp.abs(model.verts), 0.0))
            scale = (extent + 1e-1) / model.bound
            scale = jnp.where(jnp.any(occupied), scale, 1.0)
            model = model._replace(verts=model.verts * scale,
                                   deform_scale=float(model.deform_scale)
                                   * float(scale))
            sigma = self._query_sigma(nerf, params, model.verts, chunk)
        dparams = DMTetParams(
            sdf=jnp.clip(sigma - density_thresh, -1.0, 1.0),
            deform=jnp.zeros_like(model.verts))
        return model, dparams

    def prune_to_surface_band(self, dparams: DMTetParams,
                              dilate: int = 3) -> "DMTetModel":
        """Keep only tets within ``dilate`` cells of the seeded isosurface
        (host-side, once at init). The reference loads precomputed sparse
        tet files covering [-1,1]³ (load_tets, isosurface/dmtet.py); the
        TPU analog keeps shapes static by pruning the dense grid to a band
        around the surface — SDS gradients only reach sign-crossing tets,
        and the deform budget (±0.45 cells) keeps the moving surface well
        inside a few-cell band."""
        sdf = np.asarray(dparams.sdf)
        tets = np.asarray(self.tets)
        ts = sdf[tets]
        cut = (ts > 0).any(1) & (ts <= 0).any(1)        # (Tt,)
        # dilate through shared vertices: a vertex of a cut tet marks all
        # its tets for the next ring
        keep = cut.copy()
        for _ in range(max(dilate, 0)):
            vmark = np.zeros(sdf.shape[0], bool)
            vmark[tets[keep].reshape(-1)] = True
            keep = keep | vmark[tets].any(1)
        if not keep.any():
            keep = np.ones_like(keep)  # degenerate seed: keep everything
        return self._replace(tets=jnp.asarray(tets[keep]))

    def init_sphere(self, radius: float = 0.5) -> DMTetParams:
        sdf = radius - jnp.linalg.norm(self.verts, axis=-1)
        return DMTetParams(sdf=sdf, deform=jnp.zeros_like(self.verts))

    def extract(self, params: DMTetParams) -> TriangleSoup:
        verts = self.verts + jnp.tanh(params.deform) * self.deform_scale
        return marching_tets(verts, params.sdf, self.tets)


def soup_face_normals(soup: TriangleSoup) -> jnp.ndarray:
    """(M, 3) unit face normals of the extracted triangles (0 where invalid)."""
    tris = soup.vertices
    n = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    n = safe_normalize(n)
    return jnp.where(soup.valid[:, None], n, 0.0)


def shade_soup(soup: TriangleSoup, albedo: jnp.ndarray, shading: str,
               light_d: jnp.ndarray, ambient_ratio: float = 1.0,
               ) -> jnp.ndarray:
    """Per-triangle shading (reference: run_dmtet's shading switch,
    nerf_renderer.py:563-578 — albedo / lambertian / textureless / normal;
    the reference shades per-pixel with interpolated vertex normals, the
    splat renderer shades per-triangle with the face normal)."""
    if shading == "albedo":
        return albedo
    n = soup_face_normals(soup)
    if shading == "normal":
        return (n + 1.0) * 0.5
    lam = ambient_ratio + (1.0 - ambient_ratio) * jnp.clip(
        jnp.sum(n * light_d[None, :], axis=-1), 0.0, None)
    if shading == "textureless":
        return jnp.broadcast_to(lam[:, None], albedo.shape)
    return albedo * lam[:, None]  # lambertian


def soup_normal_consistency(soup: TriangleSoup) -> jnp.ndarray:
    """1 - cos between the two triangles each tet emits (valid quad cases).

    The reference computes normal_consistency over the extracted
    shared-vertex mesh's edge-adjacent faces (run_dmtet,
    nerf_renderer.py:593-595 + mesh_loss.py:38) — and then never adds it to
    the training loss (no consumer of results['loss_normal'] exists in its
    trainer). The static-shape analog regularizes the in-tet pair, which is
    exactly the quad diagonal where marching tets creates the sharpest
    creases."""
    n = soup_face_normals(soup).reshape(-1, 2, 3)
    valid = soup.valid.reshape(-1, 2)
    both = valid[:, 0] & valid[:, 1]
    cos = jnp.sum(n[:, 0] * n[:, 1], axis=-1)
    return jnp.sum(jnp.where(both, 1.0 - cos, 0.0)) \
        / jnp.maximum(jnp.sum(both), 1.0)


def unique_tet_edges(tets) -> np.ndarray:
    """(E, 2) unique undirected edges of the tet grid (host-side, once;
    reference: all_edges_sorted + unique, nerf_renderer.py:496-500)."""
    t = np.asarray(tets)
    e = t[:, [0, 1, 0, 2, 0, 3, 1, 2, 1, 3, 2, 3]].reshape(-1, 2)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def tet_laplacian_loss(verts: jnp.ndarray, edges: jnp.ndarray,
                       ) -> jnp.ndarray:
    """Uniform-Laplacian smoothness over the tet-grid edge graph — the
    static-shape analog of the reference's laplacian_smooth_loss on the
    extracted mesh (run_dmtet, nerf_renderer.py:596-597 + mesh_loss.py:77;
    also never consumed by the reference trainer). Pulls each vertex
    toward the mean of its grid neighbors, i.e. smooths the deformation
    field that carries the surface."""
    V = verts.shape[0]
    deg = jnp.zeros((V,)).at[edges.reshape(-1)].add(1.0)
    nbr = jnp.zeros((V, 3))
    nbr = nbr.at[edges[:, 0]].add(verts[edges[:, 1]])
    nbr = nbr.at[edges[:, 1]].add(verts[edges[:, 0]])
    lap = verts - nbr / jnp.maximum(deg[:, None], 1.0)
    return jnp.mean(jnp.sum(jnp.where(deg[:, None] > 0, lap, 0.0) ** 2,
                            axis=-1))


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
