"""Pre-gather fusion probe (VERDICT r4 #7, PERF.md "Next levers").

The eval frame already gathers panels in sorted order (blend_sorted_pallas:
sort (key, idx) then ONE ``packed[s_idx]`` row gather — the (T,K)
tile_lists table died in round 3). The one remaining fusion candidate is
to push the panel THROUGH the sort itself: ``lax.sort`` takes payload
operands, so sorting (key, panel-lane-0..15) permutes the packed rows
in-sort and the index-bound 6.3 ms gather disappears entirely.

Whether that wins depends on what the TPU sort does with payload: every
merge pass now moves 64 B/entry instead of 8 B. This script measures, at
the eval frame's real sizes (N=200k, D=4, 1024², f32 panels):

  (a) sort (key, idx) + packed[s_idx] row gather   [current]
  (b) sort (key, 16 payload lanes)                 [fused candidate]
  (c) sort (key, idx) alone                        [baseline]
  (d) packed[s_idx] gather alone                   [baseline]

In-graph chained timing (scripts/_bench_util.py) — the remote backend's
async readiness makes dispatch-loop timing untrustworthy.
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
    import json

    import jax.numpy as jnp
    import numpy as np

    from _bench_util import fetch_rtt, time_op

    N, D = 200_000, 4            # eval frame uses max_tiles_per_gaussian=4
    T = 1024                     # 1024² / 32² tiles
    qbits = min(22, 31 - int(np.ceil(np.log2(T + 2))))
    qmax = (1 << qbits) - 1
    E = N * D

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    flat_key = jax.random.randint(k1, (E,), 0, (T + 1) * (qmax + 1),
                                  jnp.int32)
    # the real entry->gaussian expansion order: each gaussian's D entries
    # consecutive (bin_gaussians broadcasts (N, D) then reshapes)
    flat_idx = jnp.repeat(jnp.arange(N, dtype=jnp.int32), D)
    # a post-sort-like RANDOM index order for the gather baseline
    shuf_idx = jax.random.permutation(k3, flat_idx)
    packed = jax.random.normal(k2, (N + 1, 16), jnp.float32)

    rtt = fetch_rtt()
    rows = {}

    def chain(c, x):
        return x.flatten()[0].astype(jnp.int32) + c

    rows["sort_key_idx_ms"] = time_op(
        lambda c: chain(c, jax.lax.sort(
            (flat_key.at[0].set(c), flat_idx), num_keys=1)[1]),
        K=20, rtt=rtt)
    rows["gather_random_rows_ms"] = time_op(
        lambda c: chain(c, packed[shuf_idx.at[0].set(c % N)]),
        K=20, rtt=rtt)
    rows["sort_plus_gather_ms"] = time_op(
        lambda c: chain(c, packed[jax.lax.sort(
            (flat_key.at[0].set(c), flat_idx), num_keys=1)[1]]),
        K=20, rtt=rtt)

    def fused(c):
        # expansion (sequential D-repeat read of the N-row table) + the
        # 16-payload-lane sort, both inside the timed op
        exp = packed[flat_idx.at[0].set(c % N)]
        lanes = tuple(exp[:, i] for i in range(16))
        return chain(c, jax.lax.sort(
            (flat_key.at[0].set(c),) + lanes, num_keys=1)[1])

    rows["expand_plus_sort_16lane_ms"] = time_op(fused, K=20, rtt=rtt)
    rows["verdict"] = (
        "fuse" if rows["expand_plus_sort_16lane_ms"]
        < rows["sort_plus_gather_ms"] else "keep sort+gather")
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in rows.items()}), flush=True)


if __name__ == "__main__":
    main()
