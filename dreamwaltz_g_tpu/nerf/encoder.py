"""Multi-resolution hash/tiled grid encoder (Instant-NGP).

TPU-native replacement for the reference's CUDA grid encoder
(reference: core/nerf/gridencoder/src/gridencoder.cu:67-185, grid.py:29-188).
The CUDA kernel's gathers become XLA `take`s — 8 corners x L levels per
point; the backward (scatter-add into tables) falls out of autodiff.

Index semantics match the CUDA kernel bit-for-bit so converted reference
checkpoints evaluate identically:
* per-level resolution: ``ceil(base * pls**level)`` with
  ``pls = 2**(log2(desired/base)/(L-1))`` (grid.py:122-127),
* table length: ``min(2**log2_hashmap_size, (res+1)**3)`` rounded up to a
  multiple of 8 (grid.py:125-128),
* sample position: ``x01 * (base*pls**level - 1) + 0.5`` (align_corners=False,
  gridencoder.cu:137-148),
* linear index strides (1, res+1, (res+1)^2) accumulated only while the
  stride fits the table, then ``% table`` for 'tiled' or the xor-prime
  fast_hash for 'hash' overflow (gridencoder.cu:67-91),
* out-of-range inputs contribute zero features (gridencoder.cu:111-134).

Storage is one (L, T_max, F) padded stack (uniform shapes for XLA); the
flat-offset layout of reference checkpoints converts via
``tables_from_flat`` / ``tables_to_flat``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial-hash primes (gridencoder.cu fast_hash)
_PRIMES = (1, 2654435761, 805459861)


# Backward-path design note (A/B-measured on v5e, 200k pts,
# scripts/probe_gather_ab.py): the per-level/per-plane
# ``jnp.take(tables[level])`` formulation is kept — a single gather over
# the flattened (L*T_max, F) stack measured 2223 ms fwd+bwd vs 1205
# per-level at 16L/2^19 (and 57 vs 44 ms for the triplane): XLA's
# smaller per-table scatter-adds beat one mega-scatter with a larger
# index space. A sort+cumsum "scatter-free" backward was also built and
# measured strictly slower (searchsorted over 2^19 rows ~76 ms/level);
# both alternatives were removed. The backward scatter is architectural
# on TPU (random HBM writes); the supported escape is the factorized
# triplane backbone below (44 ms fwd+bwd at the same point count).


class GridEncoderConfig(NamedTuple):
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    desired_resolution: int = 2048
    log2_hashmap_size: int = 19
    gridtype: str = "tiled"   # {'tiled', 'hash'}
    # gather dtype: 'bf16' halves the bytes of the hot (N, 8, F) table
    # gathers (~10% step time, PERF.md gather probe); master params stay
    # f32 (grads upcast through the pre-gather cast)
    compute_dtype: str = "f32"  # {'f32', 'bf16'}

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def per_level_scale(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp2(np.log2(self.desired_resolution / self.base_resolution)
                    / (self.num_levels - 1))
        )

    def level_scale(self, level: int) -> float:
        """CUDA kernel's ``scale`` (gridencoder.cu:138)."""
        return self.base_resolution * self.per_level_scale ** level - 1.0

    def level_resolution(self, level: int) -> int:
        return int(np.ceil(self.base_resolution * self.per_level_scale ** level))

    def level_table_size(self, level: int) -> int:
        r = self.level_resolution(level)
        n = min(2 ** self.log2_hashmap_size, (r + 1) ** 3)
        return int(np.ceil(n / 8) * 8)

    @property
    def max_table_size(self) -> int:
        return max(self.level_table_size(l) for l in range(self.num_levels))

    @property
    def total_params(self) -> int:
        return sum(self.level_table_size(l) for l in range(self.num_levels)) \
            * self.level_dim


class GridEncoderParams(NamedTuple):
    tables: jnp.ndarray  # (L, T_max, F)


def init_grid_encoder(cfg: GridEncoderConfig, key, scale: float = 1e-4) -> GridEncoderParams:
    tables = jax.random.uniform(
        key, (cfg.num_levels, cfg.max_table_size, cfg.level_dim), jnp.float32,
        minval=-scale, maxval=scale,
    )
    return GridEncoderParams(tables=tables)


def tables_from_flat(cfg: GridEncoderConfig, flat: np.ndarray) -> GridEncoderParams:
    """Convert a reference checkpoint's flat (sum_T, F) embedding array
    (grid.py offsets layout) into the padded (L, T_max, F) stack."""
    if not isinstance(cfg, GridEncoderConfig):
        raise ValueError(
            "reference checkpoints store hash-grid embedding tables "
            "(gridencoder/grid.py layout); the current field backbone is "
            f"{type(cfg).__name__}. Load them with --nerf.backbone "
            "tiledgrid (the reference-parity field layout).")
    out = np.zeros((cfg.num_levels, cfg.max_table_size, cfg.level_dim), np.float32)
    off = 0
    for l in range(cfg.num_levels):
        n = cfg.level_table_size(l)
        out[l, :n] = flat[off: off + n]
        off += n
    return GridEncoderParams(tables=jnp.asarray(out))


def tables_to_flat(cfg: GridEncoderConfig, params: GridEncoderParams) -> np.ndarray:
    chunks = [
        np.asarray(params.tables[l, : cfg.level_table_size(l)])
        for l in range(cfg.num_levels)
    ]
    return np.concatenate(chunks, axis=0)


def _level_indices(
    coords01: jnp.ndarray, level_scale: float, resolution: int, table_size: int,
    gridtype: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corner table indices + trilinear weights for one level.

    coords01: (N, 3) in [0, 1]. Returns ((N, 8) int32, (N, 8) float).
    """
    pos = coords01 * level_scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)

    offs = jnp.asarray(
        [[(i >> d) & 1 for d in range(3)] for i in range(8)], jnp.int32
    )  # (8, 3) — bit d of corner id flags dim d (CUDA corner enumeration)
    corner = pos_grid[:, None, :] + offs[None]  # (N, 8, 3)

    stride_mult = resolution + 1  # align_corners=False
    c = corner.astype(jnp.uint32)
    # linear index accumulated only while stride <= table_size (cu:71-76)
    index = jnp.zeros(corner.shape[:2], jnp.uint32)
    stride = 1
    for d in range(3):
        if stride <= table_size:
            index = index + c[..., d] * np.uint32(stride)
        stride *= stride_mult
    if gridtype == "hash" and stride > table_size:
        index = (c[..., 0] * np.uint32(_PRIMES[0])
                 ^ c[..., 1] * np.uint32(_PRIMES[1])
                 ^ c[..., 2] * np.uint32(_PRIMES[2]))
    index = index % np.uint32(table_size)

    w = jnp.where(offs[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
    weights = w[..., 0] * w[..., 1] * w[..., 2]
    return index.astype(jnp.int32), weights


def grid_encode(
    params: GridEncoderParams,
    cfg: GridEncoderConfig,
    positions: jnp.ndarray,
    bound: float = 1.0,
) -> jnp.ndarray:
    """Encode (..., 3) world positions in [-bound, bound] -> (..., L*F).

    Out-of-bound points yield zero features (parity with cu:111-134). The
    level loop is unrolled at trace time; XLA batches the gathers.
    """
    shape = positions.shape[:-1]
    x = positions.reshape(-1, 3)
    coords01 = (x / bound + 1.0) * 0.5
    in_bounds = jnp.all((coords01 >= 0.0) & (coords01 <= 1.0), axis=-1)
    coords01 = jnp.clip(coords01, 0.0, 1.0)

    tables = params.tables
    if cfg.compute_dtype == "bf16":
        tables = tables.astype(jnp.bfloat16)
    feats = []
    for level in range(cfg.num_levels):
        idx, w = _level_indices(
            coords01, cfg.level_scale(level), cfg.level_resolution(level),
            cfg.level_table_size(level), cfg.gridtype,
        )
        emb = jnp.take(tables[level], idx, axis=0)  # (N, 8, F)
        feats.append(jnp.sum(emb * w[..., None], axis=1))
    out = jnp.concatenate(feats, axis=-1)
    out = jnp.where(in_bounds[:, None], out, 0.0)
    return out.reshape(shape + (cfg.output_dim,))


class TriplaneConfig(NamedTuple):
    """Axis-aligned factorized plane encoding (EG3D/TensoRF-style).

    TPU-first alternative to the hash grid (``--nerf.backbone triplane``):
    the hash encoder costs 8 corners x L levels = 128 gathered table rows
    per sample and is gather-rate-bound on TPU (PERF.md: ~340M rows/s
    ceiling); three bilinear plane lookups cost 12 rows per sample with
    16x wider rows — a ~10x cut in the stage-1 bottleneck. Not a port:
    the reference has no counterpart (its CUDA hash gathers are cheap on
    GPU, core/nerf/gridencoder/src/gridencoder.cu)."""

    resolution: int = 256
    feature_dim: int = 32
    reduce: str = "sum"       # {'sum', 'concat'}
    compute_dtype: str = "f32"

    @property
    def output_dim(self) -> int:
        return self.feature_dim * (3 if self.reduce == "concat" else 1)


class TriplaneParams(NamedTuple):
    planes: jnp.ndarray  # (3, R, R, F) — XY, XZ, YZ


def init_triplane(cfg: TriplaneConfig, key, scale: float = 0.1) -> TriplaneParams:
    planes = scale * jax.random.normal(
        key, (3, cfg.resolution, cfg.resolution, cfg.feature_dim),
        jnp.float32)
    return TriplaneParams(planes=planes)


def triplane_encode(
    params: TriplaneParams,
    cfg: TriplaneConfig,
    positions: jnp.ndarray,
    bound: float = 1.0,
) -> jnp.ndarray:
    """Encode (..., 3) world positions in [-bound, bound] -> (..., D).

    Each point bilinearly samples the XY/XZ/YZ feature planes; features
    are summed (or concatenated). Out-of-bound points yield zero features
    (same contract as ``grid_encode``)."""
    shape = positions.shape[:-1]
    x = positions.reshape(-1, 3)
    coords01 = (x / bound + 1.0) * 0.5
    in_bounds = jnp.all((coords01 >= 0.0) & (coords01 <= 1.0), axis=-1)
    coords01 = jnp.clip(coords01, 0.0, 1.0)

    R = cfg.resolution
    planes = params.planes
    if cfg.compute_dtype == "bf16":
        planes = planes.astype(jnp.bfloat16)
    pairs = ((0, 1), (0, 2), (1, 2))  # XY, XZ, YZ
    feats = []
    for p, (a, b) in enumerate(pairs):
        uv = coords01[:, (a, b)] * (R - 1)
        uv0 = jnp.floor(uv)
        frac = uv - uv0
        i0 = uv0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, R - 1)
        flat = planes[p].reshape(R * R, cfg.feature_dim)
        f00 = jnp.take(flat, i0[:, 0] * R + i0[:, 1], axis=0)
        f01 = jnp.take(flat, i0[:, 0] * R + i1[:, 1], axis=0)
        f10 = jnp.take(flat, i1[:, 0] * R + i0[:, 1], axis=0)
        f11 = jnp.take(flat, i1[:, 0] * R + i1[:, 1], axis=0)
        wu, wv = frac[:, :1], frac[:, 1:2]
        feats.append((1 - wu) * ((1 - wv) * f00 + wv * f01)
                     + wu * ((1 - wv) * f10 + wv * f11))
    out = sum(feats) if cfg.reduce == "sum" else jnp.concatenate(feats, -1)
    out = jnp.where(in_bounds[:, None], out, 0.0)
    return out.astype(jnp.float32).reshape(shape + (cfg.output_dim,))


def encode_any(params, cfg, positions: jnp.ndarray, bound: float = 1.0,
               ) -> jnp.ndarray:
    """Backbone dispatch: hash/tiled grid or factorized triplane. Both the
    NeRF networks and the avatar's color/opacity decode go through this, so
    a stage-1 triplane field carries straight into stage-2 (the handoff
    passes ``NeRFParams.encoder`` verbatim, system/avatar.py:318)."""
    if isinstance(cfg, TriplaneConfig):
        return triplane_encode(params, cfg, positions, bound)
    return grid_encode(params, cfg, positions, bound)


def init_encoder_any(cfg, key):
    if isinstance(cfg, TriplaneConfig):
        return init_triplane(cfg, key)
    return init_grid_encoder(cfg, key)


def enc_cfg_from_nerf(nerf_cfg):
    """Encoder config from a ``NeRFConfig`` — the single place the
    ``nerf.backbone`` knob maps to a backbone config (used by both
    ``build_nerf`` and the stage-2 avatar builder, so stage 1 and stage 2
    always agree on the field layout for the nerf2gs handoff)."""
    if nerf_cfg.backbone == "triplane":
        return TriplaneConfig(
            resolution=nerf_cfg.triplane_resolution,
            feature_dim=nerf_cfg.triplane_dim,
            compute_dtype=nerf_cfg.grid_dtype,
        )
    return GridEncoderConfig(
        num_levels=nerf_cfg.num_levels,
        level_dim=nerf_cfg.level_dim,
        base_resolution=nerf_cfg.base_resolution,
        desired_resolution=int(nerf_cfg.desired_resolution * nerf_cfg.bound),
        log2_hashmap_size=nerf_cfg.log2_hashmap_size,
        gridtype="tiled" if nerf_cfg.backbone == "tiledgrid" else "hash",
        compute_dtype=nerf_cfg.grid_dtype,
    )


def frequency_encode(x: jnp.ndarray, degree: int = 6, include_input: bool = True) -> jnp.ndarray:
    """Sin/cos positional encoding (reference: core/nerf/freqencoder CUDA ext
    and FreqEncoder_torch, encoding.py:7-42). Trivially fused by XLA."""
    out = [x] if include_input else []
    for d in range(degree):
        s = x * (2.0 ** d)
        out.append(jnp.sin(s))
        out.append(jnp.cos(s))
    return jnp.concatenate(out, axis=-1)


def freq_output_dim(input_dim: int, degree: int = 6, include_input: bool = True) -> int:
    return input_dim * (2 * degree + (1 if include_input else 0))
