"""Decompose the eval-frame binning cost at 1024² / 200k gaussians and
measure the building blocks a Pallas counting sort would be made of
(VERDICT r3 #7: is fusing bin+pre-gather into a counting sort worth it?).

Timed on the real chip:
  (a) bin_gaussians_sorted end-to-end (key build + lax.sort + searchsorted),
  (b) the 1.6M-entry (key, idx) lax.sort alone,
  (c) counting-sort pass 1: per-tile histogram — both as a one-hot matmul
      (MXU formulation; the scatter-free way a Pallas kernel would do it)
      and as jax.ops.segment_sum (XLA scatter-add),
  (d) the prefix sum over tile counts (trivial),
  (e) counting-sort pass 2 floor: a (N*D,) scatter of entries to computed
      offsets — XLA scatter, the op Mosaic cannot vectorize either.

If (c)+(d)+(e) is not decisively under (b), the counting sort cannot win
even before kernel-launch and capacity-padding overheads, and the round-3
decision (lax.sort IS the TPU counting sort) stands with fresh numbers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from dreamwaltz_g_tpu.ops.rasterize import bin_gaussians_sorted

    N, D = 200_000, 8
    H = W = 1024
    tile = 32
    Tx = Ty = H // tile
    T = Tx * Ty
    qbits = min(22, 31 - int(np.ceil(np.log2(T + 2))))
    qmax = (1 << qbits) - 1

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    means2d = jax.random.uniform(k1, (N, 2)) * H
    radius = jax.random.uniform(k2, (N,)) * 24.0 + 2.0
    depth = jax.random.uniform(k3, (N,)) * 4.0 + 1.0
    mask = jnp.ones((N,), bool)

    ms = timeit(jax.jit(lambda *a: bin_gaussians_sorted(*a, H, W, tile)),
                means2d, radius, depth, mask)
    print(f"(a) bin_gaussians_sorted end-to-end   {ms:7.3f} ms", flush=True)

    # materialize the flat keys once so (b) times the sort alone
    flat_key = jax.random.randint(k1, (N * D,), 0,
                                  (T + 1) * (qmax + 1), jnp.int32)
    flat_idx = jnp.arange(N * D, dtype=jnp.int32) % N

    ms = timeit(jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1)),
                flat_key, flat_idx)
    print(f"(b) lax.sort (key, idx) {N * D} entries {ms:7.3f} ms", flush=True)

    flat_tile = flat_key // (qmax + 1)

    def hist_matmul(tiles):
        # scatter-free histogram: blocks of one-hot rows summed on the MXU
        B = 2048
        E = tiles.shape[0]
        tb = tiles.reshape(E // B, B)

        def body(carry, blk):
            oh = (blk[:, None] == jnp.arange(T + 1, dtype=jnp.int32)[None, :])
            return carry + jnp.sum(oh.astype(jnp.float32), axis=0), None

        out, _ = jax.lax.scan(body, jnp.zeros(T + 1, jnp.float32), tb)
        return out

    ms = timeit(jax.jit(hist_matmul), flat_tile)
    print(f"(c1) histogram via one-hot sum (scan)  {ms:7.3f} ms", flush=True)

    def hist_segsum(tiles):
        return jax.ops.segment_sum(jnp.ones_like(tiles), tiles,
                                   num_segments=T + 1)

    ms = timeit(jax.jit(hist_segsum), flat_tile)
    print(f"(c2) histogram via segment_sum         {ms:7.3f} ms", flush=True)

    def prefix(counts):
        return jnp.cumsum(counts)

    ms = timeit(jax.jit(prefix), hist_segsum(flat_tile))
    print(f"(d) prefix sum over {T + 1} tiles        {ms:7.3f} ms", flush=True)

    def scatter_pass(tiles, idx):
        counts = jax.ops.segment_sum(jnp.ones_like(tiles), tiles,
                                     num_segments=T + 1)
        starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                  jnp.cumsum(counts)[:-1]])
        # rank within tile: needs a stable order — emulate with the
        # sort-free trick (sorted-by-construction is impossible; this is
        # the FLOOR: assume rank is free and time only the scatter)
        dest = starts[tiles] + (idx % 64)  # fake rank, right distribution
        return jnp.zeros(tiles.shape[0] + 64,
                         jnp.int32).at[dest].set(idx, mode="drop")

    ms = timeit(jax.jit(scatter_pass), flat_tile, flat_idx)
    print(f"(e) counting pass-2 scatter FLOOR      {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
