"""Decompose the eval-frame binning cost at 1024² / 200k gaussians and
measure the building blocks a Pallas counting sort would be made of
(VERDICT r3 #7: is fusing bin+pre-gather into a counting sort worth it?).

Timing methodology: the remote (axon) backend can report buffer
readiness before execution finishes (see bench.py's measure()), so each
op is repeated K times INSIDE one jitted lax.fori_loop with a
data-dependent carry (no CSE/hoisting possible), and the host fetches a
scalar at the end — per-op time = (total - one fetch RTT) / K, with the
RTT measured by a K=0 null program.

Measured:
  (a) the 1.6M-entry (key, idx) lax.sort — the bin pass the counting
      sort would replace,
  (b) the (N*D -> NB,16,C) packed-panel pre-gather that follows it,
  (c) counting-sort pass 1: per-tile histogram via segment_sum,
  (d) counting-sort pass 2 FLOOR: a (N*D,) scatter of entries to
      computed offsets (rank computation assumed free),
  (e) searchsorted segment-bounds extraction (the current post-sort step).

If (c)+(d) is not decisively under (a), the counting sort cannot win
even before kernel-launch and capacity-padding overheads, and the
round-3 decision (lax.sort IS the TPU counting sort) stands.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    N, D = 200_000, 8
    H = W = 1024
    tile = 32
    Tx = Ty = H // tile
    T = Tx * Ty
    qbits = min(22, 31 - int(np.ceil(np.log2(T + 2))))
    qmax = (1 << qbits) - 1
    E = N * D

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    flat_key = jax.random.randint(k1, (E,), 0,
                                  (T + 1) * (qmax + 1), jnp.int32)
    flat_idx = jnp.arange(E, dtype=jnp.int32) % N
    packed = jax.random.normal(k2, (N + 1, 16), jnp.float32)

    from _bench_util import fetch_rtt, time_op

    rtt = fetch_rtt()
    print(f"host fetch RTT baseline: {rtt * 1e3:.1f} ms", flush=True)

    def timed(body, label):
        ms = time_op(body, K=30, rtt=rtt)
        print(f"{label:46s} {ms:8.3f} ms", flush=True)
        return ms

    def body_sort(c):
        kk = flat_key.at[0].set(c & 0x7FFFFFF)
        s_key, s_idx = jax.lax.sort((kk, flat_idx), num_keys=1)
        return s_idx[E // 2]

    timed(body_sort, "(a) lax.sort (key, idx) 1.6M entries")

    def body_gather(c):
        idx = flat_idx.at[0].set(c % N)
        panels = packed[idx]            # (E, 16) row gather
        return panels[E // 3, 0].astype(jnp.int32) + c

    timed(body_gather, "(b) packed-panel pre-gather (1.6M x 16 f32)")

    # (b2)/(b3): is the pre-gather bandwidth-bound or index-bound? If a
    # half-traffic gather (bf16 rows, or half-width f32 rows) is not ~2x
    # faster, the row bytes are not the cost — and the "bf16 eval panels"
    # lever (PERF.md) cannot pay for its precision loss.
    packed_bf16 = packed.astype(jnp.bfloat16)

    def body_gather_bf16(c):
        idx = flat_idx.at[0].set(c % N)
        panels = packed_bf16[idx]       # (E, 16) bf16 row gather
        return panels[E // 3, 0].astype(jnp.int32) + c

    timed(body_gather_bf16, "(b2) pre-gather, bf16 rows (half traffic)")

    packed8 = packed[:, :8]

    def body_gather_8(c):
        idx = flat_idx.at[0].set(c % N)
        panels = packed8[idx]           # (E, 8) f32 row gather
        return panels[E // 3, 0].astype(jnp.int32) + c

    timed(body_gather_8, "(b3) pre-gather, 8-lane f32 rows (half traffic)")

    def body_hist(c):
        tiles = (flat_key // (qmax + 1)).at[0].set(c % T)
        h = jax.ops.segment_sum(jnp.ones((E,), jnp.int32), tiles,
                                num_segments=T + 1)
        return h[c % T]

    timed(body_hist, "(c) counting pass-1 histogram (segment_sum)")

    def body_scatter(c):
        tiles = (flat_key // (qmax + 1)).at[0].set(c % T)
        h = jax.ops.segment_sum(jnp.ones((E,), jnp.int32), tiles,
                                num_segments=T + 1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(h)[:-1]])
        dest = starts[tiles] + (flat_idx & 63)  # fake rank: scatter FLOOR
        out = jnp.zeros((E + 64,), jnp.int32).at[dest].set(
            flat_idx, mode="drop")
        return out[c % E]

    timed(body_scatter, "(d) pass-1 + pass-2 scatter FLOOR")

    def body_bounds(c):
        kk = flat_key.at[0].set(c & 0x7FFFFFF)
        s_key, _ = jax.lax.sort((kk, flat_idx), num_keys=1)
        bounds = jnp.arange(T + 1, dtype=jnp.int32) * np.int32(qmax + 1)
        seg = jnp.searchsorted(s_key, bounds)
        return seg[c % T]

    timed(body_bounds, "(e) sort + searchsorted bounds (current path)")


if __name__ == "__main__":
    main()
