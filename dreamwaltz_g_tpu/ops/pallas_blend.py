"""Pallas TPU kernel for per-tile front-to-back Gaussian alpha blending.

The jnp blend (ops/rasterize.blend_tiles) is HBM-bound: every chunk
materializes (T, P, C) weight/contribution tensors in HBM, ~12 GB of traffic
per 1024² frame (measured 8 FPS at 200k splats). This kernel keeps the
whole per-tile state in VMEM:

* grid = (T tiles, K/C chunks); the accumulator (P, 8) and log-transmittance
  (P, 8) live in VMEM scratch, persisting across the chunk axis (TPU grid is
  sequential, innermost-last).
* per-chunk inputs arrive pre-gathered and lane-transposed as (T, 8, K)
  attribute / value panels, so splat fields are lane-resident and no
  in-kernel gather or relayout is needed (Mosaic's dynamic gather can't
  express table lookups; the XLA pre-gather is ~50 MB — 200x less traffic
  than the jnp blend's intermediates).
* the exclusive prefix-sum of log(1-w) is a (P, C) @ (C, C) strict-upper
  matmul and the channel accumulation a (P, C) @ (C, 8) matmul — both MXU
  (same GEMM formulation as the jnp path, ops/rasterize.py:241-307).

attrs lanes: [mean_x, mean_y, conic_a, conic_b, conic_c, opacity, 0, 0]
values lanes: [c0, c1, c2(, c3), depth, 1, 0, 0] (CV = channels + 2 <= 6)

Forward-only kernel wrapped in ``jax.custom_vjp``: the backward recomputes
through the jnp blend (whose autodiff is exact), so training gradients are
unchanged while inference/eval rendering takes the fast path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


_LOG_T_EPS = -9.2  # ln(1e-4): CUDA rasterizer's early-termination threshold

#: default panel precision for the TRAIN kernel pair ('f32' | 'bf16').
#: 'bf16' stores the values panel in bf16 and runs the MXU passes on bf16
#: operands with f32 accumulate — halves values-panel HBM traffic, but the
#: gradient deviation vs f32 is ~1e-2 max-rel (measured,
#: tests/test_pallas_blend.py::test_pallas_train_blend_bf16_panels_gradients
#: + PERF.md "bf16 blend panels"), above the 2e-3 parity envelope — so f32
#: stays the default and bf16 is an opt-in speed knob.
PANEL_DTYPE = "f32"


def _make_kernel(tile_size: int, tiles_x: int, chunk: int,
                 alpha_clip: float, min_alpha: float):
    P = tile_size * tile_size

    def kernel(counts_ref, triu_ref, attrs_ref, values_ref, out_ref,
               acc_ref, logt_ref):
        k = pl.program_id(1)
        nk = pl.num_programs(1)
        t = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            logt_ref[:] = jnp.zeros_like(logt_ref)

        # skip chunks past this tile's entry count, and terminate early once
        # every pixel's transmittance saturates (the CUDA rasterizer's
        # per-pixel T<1e-4 cutoff, tile-granular here)
        nonempty = k * chunk < counts_ref[t, 0]
        live = jnp.max(logt_ref[:, 0]) > _LOG_T_EPS

        @pl.when(nonempty & live)
        def _():
            # pixel centers of this tile
            base_x = (t % tiles_x) * tile_size
            base_y = (t // tiles_x) * tile_size
            pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            px = (base_x + pid % tile_size).astype(jnp.float32) + 0.5
            py = (base_y + pid // tile_size).astype(jnp.float32) + 0.5

            a = attrs_ref[0]                       # (8, C) lane-resident
            mx = a[0:1, :]                         # (1, C)
            my = a[1:2, :]
            ca = a[2:3, :]
            cb = a[3:4, :]
            cc = a[4:5, :]
            op = a[5:6, :]

            dx = px - mx                           # (P, C)
            dy = py - my
            q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
            w = op * jnp.exp(-0.5 * q)
            w = jnp.where((q >= 0) & (w >= min_alpha),
                          jnp.minimum(w, alpha_clip), 0.0)
            l = jnp.log1p(-w)

            log_t = logt_ref[:, 0:1]               # (P, 1)
            excl = jax.lax.dot_general(
                l, triu_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + log_t
            contrib = jnp.exp(excl) * w            # (P, C)

            vals = values_ref[0]                   # (8, C)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                contrib, vals, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logt_ref[:, 0:1] = log_t + jnp.sum(l, axis=1, keepdims=True)

        @pl.when(k == nk - 1)
        def _():
            out_ref[0] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "image_height", "image_width", "tile_size", "chunk",
    "alpha_clip", "min_alpha", "interpret"))
def blend_tiles_pallas(
    tile_lists: jnp.ndarray,   # (T, K) int32, sentinel N
    means2d: jnp.ndarray,      # (N, 2)
    conic: jnp.ndarray,        # (N, 3)
    opacity: jnp.ndarray,      # (N,) pre-masked
    values: jnp.ndarray,       # (N, CV) [colors..., depth, 1]
    image_height: int,
    image_width: int,
    tile_size: int = 32,
    chunk: int = 128,
    alpha_clip: float = 0.999,
    min_alpha: float = 1.0 / 255.0,
    interpret: bool = False,
    tile_counts: Optional[jnp.ndarray] = None,  # (T,) live entries per tile
) -> jnp.ndarray:
    """Returns (H, W, CV) like ops/rasterize.blend_tiles."""
    T, K = tile_lists.shape
    N, CV = values.shape
    assert CV <= 6, "pack at most 4 channels + depth + alpha"
    P = tile_size * tile_size
    if not interpret and chunk % 128 and chunk < K:
        # Mosaic blocks must be 128-lane divisible (or span the array);
        # round the chunking knob up rather than fail to lower
        chunk = -(-chunk // 128) * 128
    C = min(chunk, K)
    n_chunks = -(-K // C)
    if K % C:
        tile_lists = jnp.pad(tile_lists, ((0, 0), (0, n_chunks * C - K)),
                             constant_values=N)

    # pre-gather per-tile panels, lane-transposed: (T, 8, K)
    attrs = jnp.zeros((N + 1, 8), jnp.float32)
    attrs = attrs.at[:N, 0:2].set(means2d)
    attrs = attrs.at[:N, 2:5].set(conic)
    attrs = attrs.at[:N, 5].set(opacity)          # sentinel row stays 0
    vals = jnp.zeros((N + 1, 8), jnp.float32)
    vals = vals.at[:N, :CV].set(values)

    g_attrs = jnp.swapaxes(attrs[tile_lists], 1, 2)   # (T, 8, Kp)
    g_vals = jnp.swapaxes(vals[tile_lists], 1, 2)

    triu = jnp.triu(jnp.ones((C, C), jnp.float32), k=1)
    Tx = -(-image_width // tile_size)
    Ty = -(-image_height // tile_size)
    if tile_counts is None:
        tile_counts = jnp.sum(tile_lists < N, axis=-1).astype(jnp.int32)
    # (T, 1) not (T,): a vmap over views/frames batches this operand to
    # (B, T) whose auto block (Squeezed(), T) fails Mosaic's block rule
    # (last two block dims must divide (8, 128) or span the array; 1 != B).
    # The 2D layout batches to (Squeezed(), T, 1) — T % 8 == 0 and 1 == 1 —
    # which lowers for any B (caught on-chip by profile_multiview, round 5).
    tile_counts = tile_counts.reshape(-1, 1)

    kernel = _make_kernel(tile_size, Tx, C, alpha_clip, min_alpha)
    out = pl.pallas_call(
        kernel,
        grid=(T, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, C), lambda t, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda t, k: (t, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda t, k: (t, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda t, k: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P, 8), jnp.float32),
            pltpu.VMEM((P, 8), jnp.float32),
        ],
        interpret=interpret,
    )(tile_counts, triu, g_attrs, g_vals)

    img = out[..., :CV].reshape(Ty, Tx, tile_size, tile_size, CV)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        Ty * tile_size, Tx * tile_size, CV)
    return img[:image_height, :image_width]


# ---------------------------------------------------------------------------
# Windowed sorted blend (eval fast path)
# ---------------------------------------------------------------------------
#
# The (T, K) tile-list extraction + per-tile panel pre-gather cost ~14 ms of
# the 29 ms frame at 1024² (profiled round 2) — two gathers of ~1M rows each.
# This path gathers the packed attribute rows ONCE in sort order (N*D rows)
# and lets the kernel read each tile's segment as *contiguous* chunks: the
# block index map is scalar-prefetched `seg_start[t] // C + k`, and the
# kernel masks entries outside [seg_start % C, seg_start % C + count) by
# their position within the aligned window. No (T, K) index table, no
# per-tile gather — the only gather left is one (N*D, 16) row gather.
#
# packed lanes: [mx, my, conic_a, conic_b, conic_c, opacity, 0, 0,
#                c0, c1, c2(, c3), depth, 1, 0(, 0, 0)]  (attrs | values)


_T_EPS = 1e-4  # CUDA rasterizer's early-termination transmittance threshold


def _make_sorted_kernel(tile_size: int, tiles_x: int, chunk: int,
                        n_chunks_max: int, alpha_clip: float,
                        min_alpha: float):
    """One grid step per TILE: the kernel double-buffer-DMAs its segment's
    chunks straight from the sorted HBM panel array at the exact (unaligned)
    ``seg_start`` — no (T, K) table, no alignment chunk, 1/9th the grid
    steps of the blocked variant. The DMA chain is unconditional over the
    segment (balanced start/wait pairs); only compute is gated by the
    early-termination transmittance check."""
    P = tile_size * tile_size
    C = chunk

    def kernel(seg_ref, cnt_ref, triu_ref, panels_ref, out_ref,
               buf_ref, acc_ref, logt_ref, sem_ref):
        t = pl.program_id(0)
        start = seg_ref[t]
        count = cnt_ref[t]
        blk0 = start // C
        off = start - blk0 * C      # misalignment within the first block
        # blocks overlapping [start, start + count); 0 when the tile is
        # empty (off alone must not round up — the DMA chain never starts)
        nblk_t = jnp.where(count > 0, (off + count + C - 1) // C, 0)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        logt_ref[:] = jnp.zeros_like(logt_ref)

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                panels_ref.at[blk0 + j],       # (16, C) block, lane-aligned
                buf_ref.at[slot],
                sem_ref.at[slot])

        # 3-deep prefetch: DMA latency (~2 us for 8 KB) exceeds per-chunk
        # compute, so one-ahead stalls the loop
        @pl.when(nblk_t > 0)
        def _():
            get_dma(0, 0).start()

        @pl.when(nblk_t > 1)
        def _():
            get_dma(1, 1).start()

        base_x = (t % tiles_x) * tile_size
        base_y = (t // tiles_x) * tile_size
        pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = (base_x + pid % tile_size).astype(jnp.float32) + 0.5
        py = (base_y + pid // tile_size).astype(jnp.float32) + 0.5

        def body(j, _):
            inseg = j < nblk_t

            @pl.when(inseg)
            def _():
                @pl.when(j + 2 < nblk_t)
                def _():
                    get_dma((j + 2) % 3, j + 2).start()
                get_dma(j % 3, j).wait()
                live = jnp.max(logt_ref[:, 0]) > _LOG_T_EPS

                @pl.when(live)
                def _():
                    a = buf_ref[j % 3]             # (16, C) lane-resident
                    # mask rows outside this tile's [off, off + count)
                    pos = jax.lax.broadcasted_iota(
                        jnp.int32, (1, C), 1) + j * C - off
                    pmask = (pos >= 0) & (pos < count)

                    dx = px - a[0:1, :]
                    dy = py - a[1:2, :]
                    q = a[2:3, :] * dx * dx + 2.0 * a[3:4, :] * dx * dy \
                        + a[4:5, :] * dy * dy
                    w = a[5:6, :] * jnp.exp(-0.5 * q)
                    w = jnp.where(pmask & (q >= 0) & (w >= min_alpha),
                                  jnp.minimum(w, alpha_clip), 0.0)
                    l = jnp.log1p(-w)

                    log_t = logt_ref[:, 0:1]
                    # bf16 MXU pass (eval-only: |l|<=9.2, ~0.4% err on log-T)
                    excl = jax.lax.dot_general(
                        l.astype(jnp.bfloat16), triu_ref[:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + log_t
                    contrib = jnp.exp(excl) * w    # (P, C)
                    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                        contrib, a[8:16, :], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    logt_ref[:, 0:1] = log_t + jnp.sum(l, axis=1,
                                                       keepdims=True)
            return 0

        jax.lax.fori_loop(0, n_chunks_max, body, 0)
        out_ref[0] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "image_height", "image_width", "tile_size", "chunk", "capacity",
    "alpha_clip", "min_alpha", "interpret"))
def blend_sorted_pallas(
    s_idx: jnp.ndarray,        # (Ns,) gaussian index per sorted entry
    seg_start: jnp.ndarray,    # (T,) first sorted row of tile t's segment
    counts: jnp.ndarray,       # (T,) live entries per tile (capped)
    means2d: jnp.ndarray,      # (N, 2)
    conic: jnp.ndarray,        # (N, 3)
    opacity: jnp.ndarray,      # (N,) pre-masked
    values: jnp.ndarray,       # (N, CV) [colors..., depth, 1]
    image_height: int,
    image_width: int,
    tile_size: int = 32,
    chunk: int = 128,
    capacity: int = 1024,
    alpha_clip: float = 0.999,
    min_alpha: float = 1.0 / 255.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (H, W, CV). Eval-only (wrapped in stop_gradient by callers)."""
    Ns = s_idx.shape[0]
    N, CV = values.shape
    assert CV <= 6
    P = tile_size * tile_size
    C = chunk
    Tx = -(-image_width // tile_size)
    Ty = -(-image_height // tile_size)
    T = Tx * Ty
    n_chunks_max = capacity // C + 1   # +1 covers block misalignment

    # one packed row per sorted entry: attrs in lanes 0..7, values in 8..15
    # (concat-built: per-lane .at[...].set copies cost ~10x more)
    f32 = jnp.float32
    z1 = jnp.zeros((N, 1), f32)
    packed = jnp.concatenate(
        [means2d.astype(f32), conic.astype(f32), opacity[:, None].astype(f32),
         z1, z1, values.astype(f32)]
        + [z1] * (8 - CV), axis=-1)                       # (N, 16)
    packed = jnp.concatenate([packed, jnp.zeros((1, 16), f32)], axis=0)

    NB = -(-Ns // C) + 1   # +1 block: a segment may end in the pad block
    pad = NB * C - Ns
    s_idx = jnp.pad(s_idx, (0, pad), constant_values=N)
    # (NB, 16, C) lane-aligned blocks for in-kernel DMA (Mosaic needs the
    # minor dim 128-aligned; 16-lane rows would be relayout-padded 8x)
    panels = packed[s_idx].reshape(NB, C, 16).transpose(0, 2, 1)

    triu = jnp.triu(jnp.ones((C, C), jnp.bfloat16), k=1)
    kernel = _make_sorted_kernel(tile_size, Tx, C, n_chunks_max,
                                 alpha_clip, min_alpha)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((C, C), lambda t, seg, cnt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # panels stay in HBM
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda t, seg, cnt: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, 16, C), jnp.float32),     # DMA triple buffer
            pltpu.VMEM((P, 8), jnp.float32),
            pltpu.VMEM((P, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        interpret=interpret,
    )(seg_start.astype(jnp.int32), counts.astype(jnp.int32), triu, panels)

    img = out[..., :CV].reshape(Ty, Tx, tile_size, tile_size, CV)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        Ty * tile_size, Tx * tile_size, CV)
    return img[:image_height, :image_width]


# ---------------------------------------------------------------------------
# Training path: Pallas forward + Pallas backward over pre-gathered panels
# ---------------------------------------------------------------------------
#
# Backward math (per tile, pixels p, chunk-local splat j, suffix chunks R):
#   contrib_j = T_j * w_j,  T_j = exp(logT_k + sum_{j'<j} log1p(-w_{j'}))
#   G_j(p)    = sum_v g(p, v) * vals_j(v)                      [(P,C) matmul]
#   dL/dw_j   = G_j T_j - (S_j + R) / (1 - w_j)
#     with S_j = sum_{j'>j in chunk} G_{j'} contrib_{j'}       [strict-lower
#     triangular (P,C)@(C,C) matmul] and R the running suffix sum over later
#     chunks (carried in VMEM scratch while the chunk grid runs reversed).
#   dvals_j(v) = sum_p contrib_j(p) g(p, v)                    [(8,C) matmul]
# then chain dw -> d(mean, conic, opacity) through the gaussian weight
# (this mirrors the CUDA rasterizer's back-to-front backward pass).


def _make_fwd_train_kernel(tile_size: int, tiles_x: int, chunk: int,
                           alpha_clip: float, min_alpha: float,
                           bf16: bool = False):
    P = tile_size * tile_size
    mm = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(counts_ref, triu_ref, attrs_ref, values_ref,
               out_ref, ckpt_ref, acc_ref, logt_ref):
        k = pl.program_id(1)
        nk = pl.num_programs(1)
        t = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            logt_ref[:] = jnp.zeros_like(logt_ref)

        # checkpoint the transmittance entering this chunk (the ckpt block
        # is (1, 8, P), revisited for 8 consecutive chunks: row = k % 8)
        ckpt_ref[0, k % 8] = logt_ref[:, 0]

        nonempty = k * chunk < counts_ref[t, 0]
        live = jnp.max(logt_ref[:, 0]) > _LOG_T_EPS

        @pl.when(nonempty & live)
        def _():
            base_x = (t % tiles_x) * tile_size
            base_y = (t // tiles_x) * tile_size
            pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            px = (base_x + pid % tile_size).astype(jnp.float32) + 0.5
            py = (base_y + pid // tile_size).astype(jnp.float32) + 0.5

            a = attrs_ref[0]
            dx = px - a[0:1, :]
            dy = py - a[1:2, :]
            q = a[2:3, :] * dx * dx + 2.0 * a[3:4, :] * dx * dy \
                + a[4:5, :] * dy * dy
            w = a[5:6, :] * jnp.exp(-0.5 * q)
            w = jnp.where((q >= 0) & (w >= min_alpha),
                          jnp.minimum(w, alpha_clip), 0.0)
            l = jnp.log1p(-w)
            log_t = logt_ref[:, 0:1]
            # bf16 panel mode: both MXU passes take bf16 operands with f32
            # accumulate (|l| <= 9.2 -> ~0.4% on log-T; contrib/values are
            # [0,1]-ranged) — attrs stay f32, screen positions need the
            # mantissa (VERDICT r3 #10; measured grad check in PERF.md)
            excl = jax.lax.dot_general(
                l.astype(mm), triu_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + log_t
            contrib = jnp.exp(excl) * w
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                contrib.astype(mm), values_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logt_ref[:, 0:1] = log_t + jnp.sum(l, axis=1, keepdims=True)

        @pl.when(k == nk - 1)
        def _():
            out_ref[0] = acc_ref[:]

    return kernel


def _make_bwd_train_kernel(tile_size: int, tiles_x: int, chunk: int,
                           alpha_clip: float, min_alpha: float,
                           bf16: bool = False):
    P = tile_size * tile_size
    mm = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(counts_ref, tril_ref, triu_ref, attrs_ref, values_ref,
               ckpt_ref, g_ref, dattrs_ref, dvals_ref, suffix_ref):
        k = pl.program_id(1)          # reversed by the index maps
        t = pl.program_id(0)

        @pl.when(k == 0)              # first program = LAST chunk
        def _():
            suffix_ref[:] = jnp.zeros_like(suffix_ref)

        dattrs_ref[0] = jnp.zeros_like(dattrs_ref[0])
        dvals_ref[0] = jnp.zeros_like(dvals_ref[0])

        kf = pl.num_programs(1) - 1 - k  # forward chunk index
        nonempty = kf * chunk < counts_ref[t, 0]
        live = jnp.max(ckpt_ref[0, kf % 8]) > _LOG_T_EPS

        @pl.when(nonempty & live)
        def _():
            base_x = (t % tiles_x) * tile_size
            base_y = (t // tiles_x) * tile_size
            pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            px = (base_x + pid % tile_size).astype(jnp.float32) + 0.5
            py = (base_y + pid // tile_size).astype(jnp.float32) + 0.5

            a = attrs_ref[0]
            op = a[5:6, :]
            dx = px - a[0:1, :]
            dy = py - a[1:2, :]
            q = a[2:3, :] * dx * dx + 2.0 * a[3:4, :] * dx * dy \
                + a[4:5, :] * dy * dy
            w_raw = op * jnp.exp(-0.5 * q)
            active = (q >= 0) & (w_raw >= min_alpha) & (w_raw <= alpha_clip)
            w = jnp.where((q >= 0) & (w_raw >= min_alpha),
                          jnp.minimum(w_raw, alpha_clip), 0.0)
            l = jnp.log1p(-w)
            log_t = ckpt_ref[0, kf % 8].reshape(P, 1)
            excl = jax.lax.dot_general(
                l.astype(mm), triu_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + log_t
            contrib = jnp.exp(excl) * w                     # (P, C)

            g = g_ref[0]                                    # (P, 8)
            # G = g @ vals^T : contract the 8 value lanes
            G = jax.lax.dot_general(
                g.astype(mm), values_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (P, C)
            Gc = G * contrib

            # dvals (8, C): contract pixels
            dvals_ref[0] = jax.lax.dot_general(
                g.astype(mm), contrib.astype(mm),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dvals_ref.dtype)

            # suffix within the chunk + across later chunks
            S = jax.lax.dot_general(
                Gc, tril_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + suffix_ref[:, 0:1]
            T_excl = jnp.exp(excl)
            dw = G * T_excl - S / jnp.maximum(1.0 - w, 1e-6)
            dw = jnp.where(active, dw, 0.0)

            dq = dw * w * (-0.5)                            # (P, C)
            ones = jnp.ones((1, P), jnp.float32)

            def colsum(x):                                   # (P, C) -> (1, C)
                return jax.lax.dot_general(
                    ones, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            d_op = colsum(jnp.where(op > 0, dw * w / jnp.maximum(op, 1e-12),
                                    0.0))
            dqdx = 2.0 * a[2:3, :] * dx + 2.0 * a[3:4, :] * dy
            dqdy = 2.0 * a[4:5, :] * dy + 2.0 * a[3:4, :] * dx
            d_mx = colsum(-dq * dqdx)
            d_my = colsum(-dq * dqdy)
            d_ca = colsum(dq * dx * dx)
            d_cb = colsum(dq * 2.0 * dx * dy)
            d_cc = colsum(dq * dy * dy)
            z = jnp.zeros((1, dw.shape[1]), jnp.float32)
            dattrs_ref[0] = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, z, z], axis=0)

            # accumulate this chunk into the cross-chunk suffix
            suffix_ref[:, 0:1] = suffix_ref[:, 0:1] \
                + jnp.sum(Gc, axis=1, keepdims=True)

    return kernel


def blend_tiles_pallas_train(
    tile_lists: jnp.ndarray,
    tile_counts: jnp.ndarray,
    means2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    values: jnp.ndarray,
    image_height: int,
    image_width: int,
    tile_size: int = 32,
    chunk: int = 128,
    alpha_clip: float = 0.999,
    min_alpha: float = 1.0 / 255.0,
    interpret: bool = False,
    panel_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """Differentiable Pallas blend: VMEM forward AND backward kernels.

    Gradients flow to means2d/conic/opacity/values; the panel->gaussian
    reduction is the XLA vjp of the pre-gather (a segment scatter-add).

    ``panel_dtype='bf16'`` stores the VALUES panel in bf16 and runs both
    MXU passes (log-transmittance prefix, channel accumulation — and their
    backward counterparts) on bf16 operands with f32 accumulate, halving
    the values-panel HBM traffic (VERDICT r3 #10). The ATTRS panel stays
    f32: screen-space means at 512² need more than bf16's 8 mantissa bits
    (a bf16 mean_x at x~500 quantizes to ~2 px). Gradient-accuracy deltas
    are recorded in PERF.md ("bf16 blend panels").
    """
    T, K = tile_lists.shape
    N, CV = values.shape
    assert CV <= 6
    P = tile_size * tile_size
    if not interpret and chunk % 128 and chunk < K:
        # Mosaic blocks must be 128-lane divisible (or span the array)
        chunk = -(-chunk // 128) * 128
    C = min(chunk, K)
    n_chunks = -(-K // C)
    if K % C:
        tile_lists = jnp.pad(tile_lists, ((0, 0), (0, n_chunks * C - K)),
                             constant_values=N)
    Tx = -(-image_width // tile_size)
    Ty = -(-image_height // tile_size)

    if panel_dtype is None:
        panel_dtype = PANEL_DTYPE
    bf16 = panel_dtype == "bf16"
    vdt = jnp.bfloat16 if bf16 else jnp.float32
    attrs = jnp.zeros((N + 1, 8), jnp.float32)
    attrs = attrs.at[:N, 0:2].set(means2d)
    attrs = attrs.at[:N, 2:5].set(conic)
    attrs = attrs.at[:N, 5].set(opacity)
    vals8 = jnp.zeros((N + 1, 8), vdt)
    vals8 = vals8.at[:N, :CV].set(values.astype(vdt))

    # differentiable pre-gather: its vjp is the per-gaussian scatter-add
    g_attrs = jnp.swapaxes(attrs[tile_lists], 1, 2)
    g_vals = jnp.swapaxes(vals8[tile_lists], 1, 2)

    triu = jnp.triu(jnp.ones((C, C), vdt), k=1)
    tril = jnp.tril(jnp.ones((C, C), jnp.float32), k=-1)

    # ``tile_counts`` is a formal custom_vjp argument (not a closure):
    # under vmap (the DP step maps views) a closed-over traced value
    # would leak a BatchTracer into the backward trace, which runs after
    # the vmap trace is closed (UnexpectedTracerError — caught by the
    # round-5 multi-view profiler on the chip).
    @jax.custom_vjp
    def panels_blend(tile_counts, g_attrs, g_vals):
        out, _ = _fwd_impl(tile_counts, g_attrs, g_vals)
        return out

    def _fwd_impl(tile_counts, g_attrs, g_vals):
        kernel = _make_fwd_train_kernel(tile_size, Tx, C, alpha_clip,
                                        min_alpha, bf16=bf16)
        out, ckpt = pl.pallas_call(
            kernel,
            grid=(T, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((C, C), lambda t, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, C), lambda t, k: (t, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, C), lambda t, k: (t, 0, k),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, P, 8), lambda t, k: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, P), lambda t, k: (t, k // 8, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
                jax.ShapeDtypeStruct(
                    (T, -(-n_chunks // 8) * 8, P), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((P, 8), jnp.float32),
                pltpu.VMEM((P, 8), jnp.float32),
            ],
            interpret=interpret,
        )(tile_counts, triu, g_attrs, g_vals)
        return out, ckpt

    def fwd(tile_counts, g_attrs, g_vals):
        out, ckpt = _fwd_impl(tile_counts, g_attrs, g_vals)
        return out, (tile_counts, g_attrs, g_vals, ckpt)

    def bwd(res, g_out):
        tile_counts, g_attrs, g_vals, ckpt = res
        kernel = _make_bwd_train_kernel(tile_size, Tx, C, alpha_clip,
                                        min_alpha, bf16=bf16)
        rev = lambda t, k: (t, 0, n_chunks - 1 - k)  # noqa: E731
        d_attrs, d_vals = pl.pallas_call(
            kernel,
            grid=(T, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((C, C), lambda t, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda t, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, C), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, C), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, P),
                             lambda t, k: (t, (n_chunks - 1 - k) // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, 8), lambda t, k: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 8, C), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, C), rev, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(g_attrs.shape, jnp.float32),
                jax.ShapeDtypeStruct(g_vals.shape, g_vals.dtype),
            ),
            scratch_shapes=[pltpu.VMEM((P, 8), jnp.float32)],
            interpret=interpret,
        )(tile_counts, tril, triu, g_attrs, g_vals, ckpt, g_out)
        # integer primal -> float0 zero cotangent
        ct_counts = np.zeros(np.shape(tile_counts), dtype=jax.dtypes.float0)
        return ct_counts, d_attrs, d_vals

    panels_blend.defvjp(fwd, bwd)
    # (T, 1) smem layout: batches legally under vmap (see blend_tiles_pallas)
    out = panels_blend(tile_counts.reshape(-1, 1), g_attrs, g_vals)

    img = out[..., :CV].reshape(Ty, Tx, tile_size, tile_size, CV)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        Ty * tile_size, Tx * tile_size, CV)
    return img[:image_height, :image_width]
