"""Point-mesh geometry ops: KNN, nearest-triangle queries, surface sampling.

TPU-native replacements for the reference's external native deps
(SURVEY.md §2.9 #8, #11): pytorch3d ``knn_points``
(reference: core/system/avatar.py:24-34), igl ``point_mesh_squared_distance``
(avatar.py:782), and trimesh surface sampling. All are setup-time ops
(avatar init / LBS-weight computation), implemented as chunked brute-force
jnp — dense (chunk x F) distance tiles map well onto the VPU/MXU and need no
BVH.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def knn(query: jnp.ndarray, points: jnp.ndarray, k: int,
        chunk: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query point.

    Args:
        query: (M, 3), points: (N, 3)
    Returns: (dists (M, k) squared, idx (M, k)) sorted ascending.
    """
    M = query.shape[0]
    pad = (-M) % chunk
    q = jnp.concatenate([query, jnp.zeros((pad, 3), query.dtype)]) if pad else query

    def one(qc):
        d2 = jnp.sum((qc[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d, i = jax.lax.map(one, q.reshape(-1, chunk, 3))
    d = d.reshape(-1, k)[:M]
    i = i.reshape(-1, k)[:M]
    return d, i


def _point_triangle_sq_dist(p: jnp.ndarray, a, b, c):
    """Squared distance + barycentric coords of the closest point on triangle
    (a, b, c) for points p. Vectorized Ericson/Eberly region test.

    Shapes: p (..., 3); a/b/c broadcastable (..., 3).
    Returns (d2 (...,), bary (..., 3)).
    """
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-20
    # interior barycentric
    denom = jnp.maximum(va + vb + vc, eps)
    v_in = vb / denom
    w_in = vc / denom

    # edge/vertex regions
    v_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, eps), 0.0, 1.0)       # on AB
    w_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, eps), 0.0, 1.0)       # on AC
    w_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps), 0.0, 1.0)

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (~in_vert_a) & (~in_vert_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (~in_vert_a) & (~in_vert_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (~in_vert_b) & (~in_vert_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    interior = ~(in_vert_a | in_vert_b | in_vert_c
                 | in_edge_ab | in_edge_ac | in_edge_bc)

    v = jnp.where(in_vert_a, 0.0,
        jnp.where(in_vert_b, 1.0,
        jnp.where(in_vert_c, 0.0,
        jnp.where(in_edge_ab, v_ab,
        jnp.where(in_edge_ac, 0.0,
        jnp.where(in_edge_bc, 1.0 - w_bc, v_in))))))
    w = jnp.where(in_vert_a, 0.0,
        jnp.where(in_vert_b, 0.0,
        jnp.where(in_vert_c, 1.0,
        jnp.where(in_edge_ab, 0.0,
        jnp.where(in_edge_ac, w_ac,
        jnp.where(in_edge_bc, w_bc, w_in))))))

    closest = a + v[..., None] * ab + w[..., None] * ac
    dist2 = jnp.sum((p - closest) ** 2, -1)
    bary = jnp.stack([1.0 - v - w, v, w], axis=-1)
    return dist2, bary


class NearestTriangles(NamedTuple):
    """Per-point nearest-triangle attachment (the reference's
    nearest_triangles_buffer, avatar.py:1188-1208)."""

    triangle_indices: jnp.ndarray   # (N,) int32
    sq_dists: jnp.ndarray           # (N,)
    barycentric: jnp.ndarray        # (N, 3)
    vertex_indices: jnp.ndarray     # (N,) argmin-barycentric vertex id of
    #                                 that triangle (reference avatar.py:798)


def find_nearest_triangles(
    points: jnp.ndarray,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    point_chunk: int = 2048,
) -> NearestTriangles:
    """Chunked brute-force nearest triangle + barycentric coordinates
    (replaces igl.point_mesh_squared_distance, reference: avatar.py:779-800)."""
    tri = vertices[faces]  # (F, 3, 3)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    N = points.shape[0]
    pad = (-N) % point_chunk
    p = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)]) if pad else points

    def one(pc):
        d2, bary = _point_triangle_sq_dist(pc[:, None, :], a[None], b[None], c[None])
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(pc.shape[0])
        return d2[rows, best], best.astype(jnp.int32), bary[rows, best]

    d2s, idxs, barys = jax.lax.map(one, p.reshape(-1, point_chunk, 3))
    d2s = d2s.reshape(-1)[:N]
    idxs = idxs.reshape(-1)[:N]
    barys = barys.reshape(-1, 3)[:N]
    # the reference picks the vertex with the MINIMUM barycentric weight
    # (torch.argmin, avatar.py:797-798) — surprising (the farthest corner of
    # the nearest triangle) but load-bearing for parity: these indices gather
    # the V_shape/V_pose offset translations when --render.use_vertex_*
    # composition terms are enabled (avatar.py:1412-1422, 1435-1444)
    nearest = jnp.argmin(barys, axis=-1)
    vertex_indices = jnp.take(faces, idxs, axis=0)[jnp.arange(N), nearest]
    return NearestTriangles(
        triangle_indices=idxs, sq_dists=d2s, barycentric=barys,
        vertex_indices=vertex_indices.astype(jnp.int32),
    )


def interpolate_vertex_attributes(
    nearest: NearestTriangles, faces: jnp.ndarray, attributes: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric interpolation of per-vertex attributes (V, D) at the
    attachment points -> (N, D). Used for LBS weight transfer
    (reference: LBSUtils.initialize_lbs_weights, avatar.py:862-911)."""
    tri_attr = attributes[faces[nearest.triangle_indices]]  # (N, 3, D)
    return jnp.einsum("nk,nkd->nd", nearest.barycentric, tri_attr)


def sample_mesh_surface(
    key: jax.Array, vertices: jnp.ndarray, faces: jnp.ndarray, n: int,
    return_bary: bool = False,
):
    """Area-weighted uniform surface samples.
    Returns (points (n, 3), face_idx (n,)) — plus the (n, 3) barycentric
    weights when ``return_bary``. (replaces trimesh.sample,
    reference: avatar.py:92-103 mesh_surface init)."""
    tri = vertices[faces]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    k1, k2 = jax.random.split(key)
    fidx = jax.random.categorical(
        k1, jnp.log(jnp.maximum(area, 1e-20))[None], shape=(1, n))[0]
    u = jax.random.uniform(k2, (n, 2))
    su = jnp.sqrt(u[:, 0:1])
    bary = jnp.concatenate([1 - su, su * (1 - u[:, 1:2]), su * u[:, 1:2]], -1)
    pts = jnp.einsum("nk,nkd->nd", bary, tri[fidx])
    if return_bary:
        return pts, fidx, bary
    return pts, fidx


def vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex unit normals: mean of the unit normals of the adjacent
    faces (trimesh ``vertex_normals`` semantics, which the reference's
    sigma guidance interpolates barycentrically,
    reference: core/trainer.py:744-752)."""
    tri = vertices[faces]
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    vn = jnp.zeros_like(vertices)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True),
                            1e-12)


def triangle_frames(vertices: jnp.ndarray, faces: jnp.ndarray):
    """Per-triangle orthonormal frame (normal + in-plane axes) and edge
    lengths — the mesh-binding gaussian scale/orientation basis
    (reference: MeshBindingGaussianModel.get_scales_and_quaternions,
    avatar.py:1027-1079).

    Returns (R (F, 3, 3) columns = (e1_hat, e2_perp_hat, normal), sizes (F, 3)).
    """
    tri = vertices[faces]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = jnp.cross(e1, e2)
    n_hat = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    x_hat = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-12)
    y_hat = jnp.cross(n_hat, x_hat)
    R = jnp.stack([x_hat, y_hat, n_hat], axis=-1)
    s1 = jnp.linalg.norm(e1, axis=-1)
    s2 = jnp.abs(jnp.sum(e2 * y_hat, axis=-1))
    sizes = jnp.stack([s1, s2, 0.5 * (s1 + s2)], axis=-1)
    return R, sizes
