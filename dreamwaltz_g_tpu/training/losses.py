"""Training losses: sparsity, mesh-surface density guidance, reconstruction.

(reference: core/nerf/nerf_loss.py:10-58 sparsity; core/trainer.py:718-824
calc_sigma_loss mesh-surface density supervision; core/gaussian/
gaussian_loss.py:7-60, 96-223 L1+DSSIM reconstruction and KNN offset/scale
regularizers.)
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nerf.network import NeRFModel, NeRFParams
from ..ops.mesh import knn, sample_mesh_surface


# ---------------------------------------------------------------------------
# Sparsity (reference: nerf_loss.py:17-58)
# ---------------------------------------------------------------------------

def opacity_loss(pred_ws):
    return jnp.sqrt(jnp.mean(pred_ws ** 2 + 0.01))


def entropy_loss(pred_ws, eps: float = 1e-6):
    a = jnp.clip(pred_ws, eps, 1 - eps)
    return jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))


def emptiness_loss(pred_ws, weight: float = 10000.0, scale: float = 10.0):
    return weight * jnp.mean(jnp.log(1 + scale * pred_ws))


def sparsity_loss(pred_ws, cfg, current_step: Optional[int] = None,
                  max_iteration: Optional[int] = None):
    """Weighted sum with a late-stage multiplier
    (reference: SparsityLoss, nerf_loss.py:30-58)."""
    loss = 0.0
    if cfg.lambda_opacity > 0:
        loss += cfg.lambda_opacity * opacity_loss(pred_ws)
    if cfg.lambda_entropy > 0:
        loss += cfg.lambda_entropy * entropy_loss(pred_ws)
    if cfg.lambda_emptiness > 0:
        loss += cfg.lambda_emptiness * emptiness_loss(pred_ws)
    if current_step is not None and max_iteration:
        # current_step may be traced (the jitted step passes state.step):
        # jnp.where keeps the late-stage multiplier jit-compatible
        # (reference: SparsityLoss applies x sparsity_multiplier once
        # train_step/max_iteration >= sparsity_step, nerf_loss.py:44-52)
        mult = jnp.where(
            current_step / max_iteration >= cfg.sparsity_step,
            cfg.sparsity_multiplier, 1.0)
        loss = loss * mult
    return loss


def orientation_loss(weights, normals, dirs):
    """(reference: nerf_loss.py:10-13)"""
    loss = jax.lax.stop_gradient(weights) * jnp.clip(
        jnp.sum(normals * dirs, -1), 0.0, None) ** 2
    return jnp.mean(loss)


def volume_sparsity_loss(model: NeRFModel, params: NeRFParams,
                         key: jax.Array, n_points: int = 4096,
                         surface_points: Optional[jnp.ndarray] = None,
                         surface_valid: Optional[jnp.ndarray] = None):
    """Cauchy density prior at uniform + *surface-shadow* points
    (Plenoxels-eq.-5-style base term; no reference counterpart).

    TPU-first triplane stabilizer: the factorized field creates 'ghost
    intersection' density at never-observed 3D points whose three PLANE
    projections are each observed (the features there are nonzero because
    other points trained them, so table weight decay cannot remove the
    ghosts). Ray-based sparsity (:func:`sparsity_loss`) only touches
    sampled rays, and uniform volume samples almost never land in the
    tiny ghost cells (measured in the round-5 backbone-quality run: the
    surviving ghosts are axis-aligned spikes like (x_body, y=-1.9,
    z_body), σ≈10-25, whose cells uniform sampling hits ~0.2x/step). So
    when ``surface_points`` (backprojected depth, any current surface
    estimate) are given, HALF the budget samples their axis-aligned
    shadows — each surface point with ONE coordinate resampled uniformly
    — which is exactly the locus where a triplane ghost can exist, by
    construction. The log1p(2σ²) Cauchy form saturates on the strong
    (σ≫100) supervised body density, so shadow points that land inside
    the body are effectively free, while weak ghosts get steady pressure.
    """
    b = model.bound
    if surface_points is None:
        pts = jax.random.uniform(key, (n_points, 3), minval=-b, maxval=b)
    else:
        k_u, k_pick, k_axis, k_coord = jax.random.split(key, 4)
        n_sh = n_points // 2
        unif = jax.random.uniform(k_u, (n_points - n_sh, 3),
                                  minval=-b, maxval=b)
        pick = jax.random.randint(k_pick, (n_sh,), 0,
                                  surface_points.shape[0])
        surf = jax.lax.stop_gradient(surface_points)[pick]
        onehot = jax.nn.one_hot(
            jax.random.randint(k_axis, (n_sh,), 0, 3), 3)
        coord = jax.random.uniform(k_coord, (n_sh, 1), minval=-b, maxval=b)
        shadow = surf * (1.0 - onehot) + coord * onehot
        if surface_valid is not None:
            # rays that missed the surface fall back to uniform samples
            fb = jax.random.uniform(k_pick, (n_sh, 3), minval=-b, maxval=b)
            shadow = jnp.where(surface_valid[pick][:, None], shadow, fb)
        pts = jnp.concatenate([unif, jnp.clip(shadow, -b, b)], axis=0)
    sigma, _ = model.density(params, pts)
    return jnp.mean(jnp.log1p(2.0 * sigma ** 2))


# ---------------------------------------------------------------------------
# Mesh-surface density guidance (reference: trainer.py:718-824)
# ---------------------------------------------------------------------------

class SigmaGuidancePoints(NamedTuple):
    """Precomputed sample sets for the margin loss (host/setup-time)."""

    surface: jnp.ndarray   # (Ns, 3) on-surface points (density -> +peak)
    offset: jnp.ndarray    # (No, 3) off-surface points (density -> -peak)


def make_sigma_guidance_points(
    key: jax.Array,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    num_points: int = 5000,
    noise_range: float = 0.05,
    surface_thickness: float = 0.005,
) -> SigmaGuidancePoints:
    """Sample on-surface points and normal-offset points farther than
    ``surface_thickness`` from the mesh (reference: calc_sigma_loss,
    trainer.py:736-772 — off-surface keeps static shape here; too-close
    offsets are re-projected onto the surface set instead of dropped)."""
    from ..ops.mesh import vertex_normals

    k1, k2 = jax.random.split(key)
    pts, fidx, bary = sample_mesh_surface(k1, vertices, faces, num_points,
                                          return_bary=True)

    # barycentric-interpolated vertex normals, as the reference does
    # (trimesh points_to_barycentric + vertex_normals, trainer.py:744-752)
    vn = vertex_normals(vertices, faces)[faces[fidx]]      # (N, 3, 3)
    n = jnp.einsum("nk,nkd->nd", bary, vn)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    noise = (jax.random.uniform(k2, (num_points, 1)) - 0.5) * noise_range
    noisy = pts + noise * n

    far_enough = jnp.abs(noise[:, 0]) > surface_thickness
    offset = jnp.where(far_enough[:, None], noisy, pts + n * noise_range)
    return SigmaGuidancePoints(surface=pts, offset=offset)


def sigma_margin_loss(
    model: NeRFModel,
    params: NeRFParams,
    pts: SigmaGuidancePoints,
    peak: float = 15.0,
    loss_type: str = "margin",
    delta: float = 0.2,
):
    """Push raw density to +peak on the surface and below -peak off it
    (reference: trainer.py:774-798 'margin'; 'mse' and 'opacity_mse'
    variants included)."""
    # raw (pre-activation) sigma: re-derive from the encoder + MLP head
    h_s = model.encode(params, pts.surface)
    h_o = model.encode(params, pts.offset)
    raw_s = model.sigma_mlp.apply(params.sigma_mlp, h_s)[..., 0]
    raw_o = model.sigma_mlp.apply(params.sigma_mlp, h_o)[..., 0]
    if loss_type == "margin":
        neg = jax.nn.relu(raw_o + peak)
        pos = jax.nn.relu(peak - raw_s)
        return jnp.mean(neg ** 2) + jnp.mean(pos ** 2)
    if loss_type == "mse":
        return jnp.mean((raw_s - peak) ** 2) + jnp.mean((raw_o + peak) ** 2)
    if loss_type == "opacity_mse":
        op_s = 1.0 - jnp.exp(-delta * jax.nn.softplus(raw_s))
        op_o = 1.0 - jnp.exp(-delta * jax.nn.softplus(raw_o))
        return jnp.mean((op_s - 1.0) ** 2) + jnp.mean(op_o ** 2)
    raise ValueError(f"unknown sigma loss {loss_type!r}")


# ---------------------------------------------------------------------------
# Image reconstruction (reference: gaussian_loss.py:7-60, 215-223)
# ---------------------------------------------------------------------------

def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Separable-window SSIM on (H, W, C) images in [0, 1] (the 3DGS
    formulation, reference: gaussian_loss.py ssim)."""
    k = _gaussian_kernel(window_size)

    def blur(x):
        # separable conv via 2 depthwise passes (HWC)
        x = jnp.moveaxis(x, -1, 0)  # (C, H, W)
        pad = window_size // 2
        # zero padding for exact parity with the reference's
        # F.conv2d(padding=window_size//2) (gaussian_loss.py:40-48);
        # golden-tested in tests/test_reference_parity.py
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
        x1 = jax.vmap(lambda c: jax.vmap(
            lambda row: jnp.convolve(row, k, mode="valid"))(c))(xp)
        x1 = jnp.swapaxes(x1, 1, 2)
        x2 = jax.vmap(lambda c: jax.vmap(
            lambda row: jnp.convolve(row, k, mode="valid"))(c))(x1)
        return jnp.moveaxis(jnp.swapaxes(x2, 1, 2), 0, -1)

    # blur operates over padded rows; crop symmetric
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) \
        / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


def image_reconstruction_loss(image, gt_image, lambda_dssim: float = 0.2):
    """0.8 L1 + 0.2 DSSIM (reference: ImageReconstructionLoss,
    gaussian_loss.py:215-223)."""
    l1 = jnp.mean(jnp.abs(image - gt_image))
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim(image, gt_image))


# ---------------------------------------------------------------------------
# KNN offset / scale regularizers (reference: gaussian_loss.py:96-212)
# ---------------------------------------------------------------------------

class KnnRegularizer(NamedTuple):
    """Static KNN structure over anchor vertices; penalizes offsets that
    project past half the neighbor distance and scales exceeding it."""

    knn_vectors: jnp.ndarray  # (N, K, 3) anchor -> neighbor
    knn_norms: jnp.ndarray    # (N, K)

    @staticmethod
    def build(vertices: jnp.ndarray, k: int = 5) -> "KnnRegularizer":
        _, idx = knn(vertices, vertices, k + 1)
        idx = idx[:, 1:]  # drop self
        vec = vertices[idx] - vertices[:, None, :]
        return KnnRegularizer(
            knn_vectors=vec,
            knn_norms=jnp.maximum(jnp.linalg.norm(vec, axis=-1), 1e-8))

    def offset_loss(self, offsets: jnp.ndarray) -> jnp.ndarray:
        """(reference: compute_offset_regularization_loss)"""
        proj = jnp.einsum("nkc,nkc->nk", offsets[:, None, :].repeat(
            self.knn_vectors.shape[1], 1), self.knn_vectors) / self.knn_norms
        err = jnp.clip(proj / self.knn_norms - 0.5, 0.0, None)
        return jnp.sum(jnp.mean(err, axis=-1))

    def scale_loss(self, scales: jnp.ndarray) -> jnp.ndarray:
        """(reference: compute_scale_regularization_loss)"""
        s = jnp.max(scales, axis=-1)[:, None]
        err = jnp.clip(s / self.knn_norms - 1.0, 0.0, None)
        return jnp.sum(jnp.mean(err, axis=-1))


# ---------------------------------------------------------------------------
# Mesh regularizers (reference: core/optim/loss/mesh_loss.py — DMTet finetune)
# ---------------------------------------------------------------------------

def normal_consistency_loss(vertices: jnp.ndarray, faces: jnp.ndarray,
                            face_adjacency: jnp.ndarray) -> jnp.ndarray:
    """1 - cos between adjacent face normals. ``face_adjacency`` (A, 2)
    pairs of face ids sharing an edge (static topology)."""
    tri = vertices[faces]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n0 = n[face_adjacency[:, 0]]
    n1 = n[face_adjacency[:, 1]]
    return jnp.mean(1.0 - jnp.sum(n0 * n1, axis=-1))


def laplacian_smoothing_loss(vertices: jnp.ndarray, faces: jnp.ndarray,
                             ) -> jnp.ndarray:
    """Uniform-Laplacian magnitude: ||v - mean(neighbors)||²."""
    V = vertices.shape[0]
    deg = jnp.zeros((V,)).at[faces.reshape(-1)].add(2.0)
    nbr = jnp.zeros((V, 3))
    for a, b in ((0, 1), (1, 2), (2, 0)):
        nbr = nbr.at[faces[:, a]].add(vertices[faces[:, b]])
        nbr = nbr.at[faces[:, b]].add(vertices[faces[:, a]])
    mean_nbr = nbr / jnp.maximum(deg[:, None], 1.0)
    lap = jnp.where(deg[:, None] > 0, vertices - mean_nbr, 0.0)
    return jnp.mean(jnp.sum(lap ** 2, axis=-1))


def face_adjacency_from_faces(faces: np.ndarray) -> np.ndarray:
    """Host-side: (A, 2) adjacent-face pairs sharing an edge."""
    import collections

    edge_map = collections.defaultdict(list)
    f = np.asarray(faces)
    for fi in range(f.shape[0]):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = tuple(sorted((int(f[fi, a]), int(f[fi, b]))))
            edge_map[key].append(fi)
    pairs = [tuple(v[:2]) for v in edge_map.values() if len(v) >= 2]
    if not pairs:
        return np.zeros((0, 2), np.int64)
    return np.asarray(pairs, np.int64)
