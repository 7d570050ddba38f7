"""Isosurface extraction: marching tetrahedra + DMTet-style mesh layer.

Covers two reference components with one TPU-friendly implementation:
* NeRF -> mesh export (reference: core/nerf/to_mesh.py:12-339, which uses
  mcubes + pymeshlab — unavailable here; marching *tetrahedra* gives
  equivalent watertight isosurfaces with tiny case tables),
* the DMTet renderer's marching-tets core (reference:
  core/nerf/isosurface/dmtet.py — learnable SDF + vertex deformation on a
  tet grid, differentiable through the edge interpolation).

Static shapes: every tet emits exactly 2 triangle slots (degenerate
zero-area triangles where the surface doesn't cut), so the whole pipeline
jits. Host-side ``compact_mesh`` drops degenerates and welds vertices.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 6-tet decomposition of a cube (corner ids 0..7, bit k = axis k offset)
_CUBE_TETS = np.asarray([
    [0, 5, 1, 3],
    [0, 5, 3, 6],
    [0, 3, 2, 6],
    [0, 5, 6, 4],
    [5, 3, 6, 7],
    [0, 2, 6, 4],  # note: consistent winding fixed by normal orientation
], np.int32)

# tet edges (pairs of local vertex ids)
_TET_EDGES = np.asarray(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# DMTet triangle table: per 16-bit case, two triangles of edge ids (-1 pad)
_TRI_TABLE = np.asarray([
    [-1, -1, -1, -1, -1, -1],
    [1, 0, 2, -1, -1, -1],
    [4, 0, 3, -1, -1, -1],
    [1, 4, 2, 1, 3, 4],
    [3, 1, 5, -1, -1, -1],
    [2, 3, 0, 2, 5, 3],
    [1, 4, 0, 1, 5, 4],
    [4, 2, 5, -1, -1, -1],
    [4, 5, 2, -1, -1, -1],
    [4, 1, 0, 4, 5, 1],
    [3, 2, 0, 3, 5, 2],
    [1, 3, 5, -1, -1, -1],
    [4, 1, 2, 4, 3, 1],
    [3, 0, 4, -1, -1, -1],
    [2, 0, 1, -1, -1, -1],
    [-1, -1, -1, -1, -1, -1],
], np.int32)


class TriangleSoup(NamedTuple):
    vertices: jnp.ndarray  # (M, 3, 3) per-triangle corners (degenerate = 0s)
    valid: jnp.ndarray     # (M,) bool


def marching_tets(
    verts: jnp.ndarray,  # (V, 3) tet-grid vertex positions
    sdf: jnp.ndarray,    # (V,) signed values (>0 inside)
    tets: jnp.ndarray,   # (Tt, 4) vertex ids
) -> TriangleSoup:
    """Differentiable marching tetrahedra (DMTet core, reference:
    isosurface/dmtet.py). Emits a fixed 2 triangles per tet."""
    tv = verts[tets]                      # (Tt, 4, 3)
    ts = sdf[tets]                        # (Tt, 4)
    occ = (ts > 0).astype(jnp.int32)
    case = (occ[:, 0] + occ[:, 1] * 2 + occ[:, 2] * 4 + occ[:, 3] * 8)

    e = jnp.asarray(_TET_EDGES)
    sa = ts[:, e[:, 0]]                   # (Tt, 6)
    sb = ts[:, e[:, 1]]
    va = tv[:, e[:, 0]]                   # (Tt, 6, 3)
    vb = tv[:, e[:, 1]]
    denom = sa - sb
    t = jnp.where(jnp.abs(denom) > 1e-10, sa / jnp.where(
        jnp.abs(denom) > 1e-10, denom, 1.0), 0.5)
    t = jnp.clip(t, 0.0, 1.0)
    edge_pts = va + (vb - va) * t[..., None]   # (Tt, 6, 3)

    table = jnp.asarray(_TRI_TABLE)[case]      # (Tt, 6)
    tri_edges = table.reshape(-1, 2, 3)        # (Tt, 2, 3) edge ids
    valid = tri_edges[..., 0] >= 0             # (Tt, 2)
    safe = jnp.maximum(tri_edges, 0)
    tris = jnp.take_along_axis(
        edge_pts[:, None].repeat(2, 1), safe[..., None].repeat(3, -1),
        axis=2)                                 # (Tt, 2, 3, 3)
    tris = jnp.where(valid[..., None, None], tris, 0.0)
    return TriangleSoup(vertices=tris.reshape(-1, 3, 3),
                        valid=valid.reshape(-1))


def make_tet_grid(resolution: int, bound: float = 1.0,
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Regular tet grid over [-bound, bound]^3: (verts (G³, 3), tets)."""
    G = resolution
    xs = np.linspace(-bound, bound, G, dtype=np.float32)
    zz, yy, xx = np.meshgrid(xs, xs, xs, indexing="ij")
    verts = np.stack([xx, yy, zz], -1).reshape(-1, 3)

    idx = np.arange(G ** 3).reshape(G, G, G)
    c = np.empty((G - 1, G - 1, G - 1, 8), np.int64)
    for k in range(8):
        dz, dy, dx = (k >> 2) & 1, (k >> 1) & 1, k & 1
        c[..., k] = idx[dz: G - 1 + dz, dy: G - 1 + dy, dx: G - 1 + dx]
    cubes = c.reshape(-1, 8)
    tets = cubes[:, _CUBE_TETS.reshape(-1)].reshape(-1, 4)
    return verts, tets.astype(np.int32)


def compact_mesh(soup: TriangleSoup, weld_decimals: int = 5,
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: drop degenerate slots and weld duplicate vertices.
    Returns (vertices (V, 3), faces (F, 3))."""
    tris = np.asarray(soup.vertices)[np.asarray(soup.valid)]
    if tris.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    flat = tris.reshape(-1, 3)
    key = np.round(flat, weld_decimals)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    faces = inverse.reshape(-1, 3)
    # deduplicate degenerate faces (repeated vertex ids)
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    return uniq.astype(np.float32), faces[ok]


def export_mesh(
    model, params,
    resolution: int = 128,
    density_thresh: float = 10.0,
    bound: Optional[float] = None,
    chunk: int = 128 ** 2,
):
    """NeRF -> (vertices, faces, vertex_colors) via marching tets
    (reference: export_mesh, to_mesh.py:12-339 — without the xatlas UV bake;
    colors are per-vertex albedo queries instead of a texture atlas)."""
    bound = bound or model.bound
    verts_np, tets_np = make_tet_grid(resolution, bound)
    verts = jnp.asarray(verts_np)

    @jax.jit
    def sigma_of(pts):
        n = pts.shape[0]
        pad = (-n) % chunk
        if pad:
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3))])
        s = jax.lax.map(lambda p: model.density(params, p)[0],
                        pts.reshape(-1, chunk, 3))
        return s.reshape(-1)[:n]

    sdf = sigma_of(verts) - density_thresh
    soup = marching_tets(verts, sdf, jnp.asarray(tets_np))
    v, f = compact_mesh(soup)
    if v.shape[0] == 0:
        return v, f, np.zeros((0, 3), np.float32)

    @jax.jit
    def color_of(pts):
        n = pts.shape[0]
        pad = (-n) % chunk
        if pad:
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3))])
        c = jax.lax.map(lambda p: model.density(params, p)[1],
                        pts.reshape(-1, chunk, 3))
        return c.reshape(-1, c.shape[-1])[:n]

    colors = np.asarray(color_of(jnp.asarray(v)))[:, :3]
    return v, f, colors


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
             colors: Optional[np.ndarray] = None) -> str:
    """Minimal OBJ writer with per-vertex colors (xyzrgb extension)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        for i, v in enumerate(vertices):
            if colors is not None:
                c = colors[i]
                fh.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
    return path
