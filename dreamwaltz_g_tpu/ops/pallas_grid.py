"""Pallas TPU kernel for the multi-level hash-grid encoder forward.

Replaces the XLA gather path of ``nerf/encoder.grid_encode`` on the hot
ray-sample batches (reference CUDA kernel: core/nerf/gridencoder/src/
gridencoder.cu:88-185 ``kernel_grid``). Kernel design:

* grid = (L levels, N/CHUNK point blocks). Each program holds ONE level's
  entire table in VMEM (tables are <= a few hundred KB at the avatar-scale
  ``log2_hashmap_size``) and a CHUNK of points, computes the 8 corner
  indices + trilinear weights exactly like the CUDA kernel, gathers from
  VMEM, and writes the (CHUNK, F) feature slice of the output.
* the level axis is the *inner* grid dimension so consecutive programs
  reuse the same point block while streaming tables (points stay resident).
* backward stays in XLA: index math is recomputed and the table gradient is
  a segment-sum scatter — XLA lowers that well, and it only runs in
  training, so the custom_vjp pairs a Pallas forward with a jnp backward.

Falls back to interpret mode automatically off-TPU (CPU tests).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nerf.encoder import GridEncoderConfig, GridEncoderParams, _level_indices

_PRIMES = (1, 2654435761, 805459861)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _corner_offsets():
    return np.asarray(
        [[(i >> d) & 1 for d in range(3)] for i in range(8)], np.int32)


def _grid_kernel(scale_ref, res_ref, tsize_ref, hashed_ref,
                 coords_ref, tables_ref, out_ref):
    """One (level, point-chunk) program.

    scale/res/tsize/hashed: (L,) SMEM scalar tables indexed by program_id(1).
    coords: (CHUNK, 3) VMEM [0,1]³ (+ in-bounds flag encoded as coords01 sign)
    tables: (T_max, F) VMEM — this level's table
    out: (CHUNK, F) VMEM — this level's feature slice
    """
    lvl = pl.program_id(1)
    scale = scale_ref[lvl]
    stride_mult = res_ref[lvl] + 1
    tsize = tsize_ref[lvl]
    hashed = hashed_ref[lvl]

    c01 = coords_ref[:]                                 # (C, 3)
    in_bounds = jnp.all((c01 >= 0.0) & (c01 <= 1.0), axis=-1)
    c01 = jnp.clip(c01, 0.0, 1.0)
    pos = c01 * scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    # Mosaic lacks a direct f32->u32 cast; go through i32 (values are >= 0)
    base = pos_grid.astype(jnp.int32).astype(jnp.uint32)  # (C, 3)

    um = stride_mult.astype(jnp.uint32)
    tsz = tsize.astype(jnp.uint32)
    # stride-fits tests in f32 (exact semantics of the jnp oracle's python-int
    # strides; CUDA wraps uint32 but never at avatar-scale resolutions)
    mf = stride_mult.astype(jnp.float32)
    tf = tsize.astype(jnp.float32)
    fit1 = mf <= tf          # stride m fits -> include the y term
    fit2 = mf * mf <= tf     # stride m² fits -> include the z term
    use_hash = hashed & (mf * mf * mf > tf)

    feats = jnp.zeros(out_ref.shape, out_ref.dtype)
    tab = tables_ref[:]                                 # (T, F)
    zero = jnp.uint32(0)

    for corner in range(8):
        bits = [(corner >> d) & 1 for d in range(3)]
        cx = base[:, 0] + np.uint32(bits[0])
        cy = base[:, 1] + np.uint32(bits[1])
        cz = base[:, 2] + np.uint32(bits[2])
        # linear index with strides (1, m, m²), accumulated only while the
        # stride fits the table (cu:71-76); out-of-table strides fall back
        # to the xor-prime hash when gridtype='hash'
        lin = cx + jnp.where(fit1, cy * um, zero) \
            + jnp.where(fit2, cz * um * um, zero)
        hsh = (cx * np.uint32(_PRIMES[0])
               ^ cy * np.uint32(_PRIMES[1])
               ^ cz * np.uint32(_PRIMES[2]))
        idx = jnp.where(use_hash, hsh, lin) % tsz
        w = jnp.ones_like(frac[:, 0])
        for d, b in enumerate(bits):
            w = w * jnp.where(b, frac[:, d], 1.0 - frac[:, d])
        # Mosaic's only dynamic-gather form is take_along_axis with indices
        # shaped like the operand (tpu.dynamic_gather): broadcast the (C,)
        # row ids across features and pad rows up to the table height
        C = idx.shape[0]
        T, F = tab.shape
        idx2d = jnp.broadcast_to(idx.astype(jnp.int32)[:, None], (C, F))
        if C < T:
            idx2d = jnp.concatenate(
                [idx2d, jnp.zeros((T - C, F), jnp.int32)], axis=0)
        g = jnp.take_along_axis(tab, idx2d, axis=0)[:C]
        feats = feats + g * w[:, None]

    out_ref[:] = jnp.where(in_bounds[:, None], feats, 0.0)


def _pallas_forward(cfg: GridEncoderConfig, tables: jnp.ndarray,
                    coords01: jnp.ndarray, chunk: int = 2048,
                    interpret: bool = False) -> jnp.ndarray:
    N = coords01.shape[0]
    L, T, F = tables.shape
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        coords01 = jnp.concatenate(
            [coords01, jnp.full((pad, 3), -1.0, coords01.dtype)])

    scales = jnp.asarray([cfg.level_scale(l) for l in range(L)], jnp.float32)
    ress = jnp.asarray([cfg.level_resolution(l) for l in range(L)], jnp.int32)
    tsizes = jnp.asarray([cfg.level_table_size(l) for l in range(L)], jnp.int32)
    hashed = jnp.asarray(
        [cfg.gridtype == "hash"] * L, jnp.bool_)

    # output laid out (L, N, F): the (chunk, F) block tail satisfies the
    # TPU (8, 128)-or-full alignment rule; transposed to (N, L*F) after
    out = pl.pallas_call(
        _grid_kernel,
        grid=(n_chunks, L),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 3), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, F), lambda i, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, F), lambda i, l: (l, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n_chunks * chunk, F),
                                       tables.dtype),
        interpret=interpret,
    )(scales, ress, tsizes, hashed, coords01, tables)
    return out[:, :N].transpose(1, 0, 2).reshape(N, L * F)


def _block_squeeze_kernel_adapter(kernel):
    """tables arrive as (1, T, F) and out as (CHUNK, 1, F) blocks —
    adapt refs to 2D views."""

    def wrapped(scale_ref, res_ref, tsize_ref, hashed_ref,
                coords_ref, tables_ref, out_ref):
        kernel(scale_ref, res_ref, tsize_ref, hashed_ref,
               coords_ref, tables_ref.at[0], out_ref.at[0])

    return wrapped


# rebind with the block-shape adapter
_grid_kernel_core = _grid_kernel
_grid_kernel = _block_squeeze_kernel_adapter(_grid_kernel_core)


def _jnp_forward(cfg, tables, coords01):
    """Reference path (identical math) for backward recompute and CPU."""
    in_bounds = jnp.all((coords01 >= 0.0) & (coords01 <= 1.0), axis=-1)
    c01 = jnp.clip(coords01, 0.0, 1.0)
    feats = []
    for level in range(cfg.num_levels):
        idx, w = _level_indices(
            c01, cfg.level_scale(level), cfg.level_resolution(level),
            cfg.level_table_size(level), cfg.gridtype)
        emb = jnp.take(tables[level], idx, axis=0)
        feats.append(jnp.sum(emb * w[..., None], axis=1))
    out = jnp.concatenate(feats, axis=-1)
    return jnp.where(in_bounds[:, None], out, 0.0)


def make_grid_encode(cfg: GridEncoderConfig, chunk: int = 2048,
                     force_pallas: bool = False):
    """Returns ``encode(params, positions, bound) -> (..., L*F)`` with a
    Pallas forward (on TPU) and an XLA backward via custom_vjp."""
    use_pallas = force_pallas or _on_tpu()
    interpret = not _on_tpu()

    @jax.custom_vjp
    def encode01(tables, coords01):
        if use_pallas:
            return _pallas_forward(cfg, tables, coords01, chunk=chunk,
                                   interpret=interpret)
        return _jnp_forward(cfg, tables, coords01)

    def fwd(tables, coords01):
        return encode01(tables, coords01), (tables, coords01)

    def bwd(res, g):
        tables, coords01 = res
        # recompute through the jnp path; autodiff gives the scatter-add
        # table gradient and the trilinear coord gradient
        _, vjp = jax.vjp(lambda t, c: _jnp_forward(cfg, t, c),
                         tables, coords01)
        return vjp(g)

    encode01.defvjp(fwd, bwd)

    def encode(params: GridEncoderParams, positions: jnp.ndarray,
               bound: float = 1.0) -> jnp.ndarray:
        shape = positions.shape[:-1]
        x = positions.reshape(-1, 3)
        coords01 = (x / bound + 1.0) * 0.5
        out = encode01(params.tables, coords01)
        return out.reshape(shape + (cfg.output_dim,))

    return encode
