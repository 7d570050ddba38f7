"""Decompose the triplane animate backward (round 5 perf lever hunt).

PERF.md's animate table prices the triplane 256²x32 field at 21 ms fwd /
85 ms fwd+bwd @200k points — the single largest component of the fused
stage-2 step (~180 ms). The backward's dominant op should be the plane
cotangent: 12 scatter-adds (3 planes x 4 bilinear corners) of 200k rows
x 32 f32 lanes into (R², F) tables. This probe isolates that cost and
A/Bs a scatter-free reformulation before any kernel work:

  fwd            triplane_encode forward (gathers only)
  bwd_planes     grad wrt planes (the scatter-add backward)
  bwd_pos        grad wrt positions only (no table scatter)
  scatter_raw    the isolated 2.4M-row fused scatter-add
  sortseg        sort-by-cell + cumsum-at-boundaries (scatter-free)

Timing uses the in-graph fori_loop pattern (_bench_util.time_op) to
dodge the remote backend's dispatch-readiness artifact.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _bench_util import fetch_rtt, time_op  # noqa: E402
from _sds_bench_lib import init_jax_cache  # noqa: E402


def main():
    init_jax_cache()
    import jax
    import jax.numpy as jnp

    from dreamwaltz_g_tpu.nerf.encoder import (
        TriplaneConfig,
        init_triplane,
        triplane_encode,
    )

    N = 200_000
    cfg = TriplaneConfig(resolution=256, feature_dim=32)
    R, F = cfg.resolution, cfg.feature_dim
    params = init_triplane(cfg, jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), jnp.float32,
                             -0.9, 0.9)
    ct = jax.random.normal(jax.random.PRNGKey(2), (N, cfg.output_dim),
                           jnp.float32)

    def jitter(x, c):
        # thread the loop carry into the input so iterations serialize
        return x.at[0, 0].add(jnp.float32(c) * 1e-12)

    def loss_planes(p, x, g):
        return jnp.vdot(triplane_encode(p, cfg, x), g)

    grad_planes = jax.grad(loss_planes, argnums=0)
    grad_pos = jax.grad(loss_planes, argnums=1)
    grad_both = jax.grad(loss_planes, argnums=(0, 1))

    # the isolated scatter: 3 planes x 4 corners fused into one segment id
    # space (3*R*R rows), weighted rows scattered-add
    def corner_ids_weights(x):
        coords01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        pairs = ((0, 1), (0, 2), (1, 2))
        ids, ws = [], []
        for p, (a, b) in enumerate(pairs):
            uv = coords01[:, (a, b)] * (R - 1)
            uv0 = jnp.floor(uv)
            frac = uv - uv0
            i0 = uv0.astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, R - 1)
            wu, wv = frac[:, 0], frac[:, 1]
            base = p * R * R
            for (iu, wu_) in ((i0[:, 0], 1 - wu), (i1[:, 0], wu)):
                for (iv, wv_) in ((i0[:, 1], 1 - wv), (i1[:, 1], wv)):
                    ids.append(base + iu * R + iv)
                    ws.append(wu_ * wv_)
        return jnp.stack(ids, 1).reshape(-1), jnp.stack(ws, 1).reshape(-1)

    ids0, ws0 = jax.jit(corner_ids_weights)(pos)
    jax.block_until_ready(ids0)

    def scatter_raw(g, ids, ws):
        rows = jnp.repeat(g, 12, axis=0) * ws[:, None]      # (12N, F)
        tab = jnp.zeros((3 * R * R, F), jnp.float32)
        return tab.at[ids].add(rows)

    def sortseg(g, ids, ws):
        order = jnp.argsort(ids)
        sk = ids[order]
        # gather cotangent rows in sorted order (entry e came from point
        # order[e] // 12)
        rows = g[order // 12] * ws[order][:, None]
        cs = jnp.cumsum(rows, axis=0)
        ends = jnp.searchsorted(sk, jnp.arange(3 * R * R, dtype=ids.dtype),
                                side="right")
        padded = jnp.concatenate([jnp.zeros((1, F), cs.dtype), cs], 0)
        starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
        return padded[ends] - padded[starts]

    rtt = fetch_rtt()
    print(f"fetch rtt: {rtt*1e3:.1f} ms", flush=True)

    def t(name, body, K=20):
        ms = time_op(body, K=K, rtt=rtt)
        print(f"{name:14s} {ms:8.2f} ms", flush=True)

    t("fwd", lambda c: triplane_encode(params, cfg, jitter(pos, c)
                                       )[0, 0].astype(jnp.int32) % 2 + c)
    t("bwd_planes", lambda c: grad_planes(
        params, jitter(pos, c), ct).planes[0, 0, 0, 0].astype(jnp.int32)
        % 2 + c)
    t("bwd_pos", lambda c: grad_pos(
        params, jitter(pos, c), ct)[0, 0].astype(jnp.int32) % 2 + c)
    t("bwd_both", lambda c: grad_both(
        params, jitter(pos, c), ct)[0].planes[0, 0, 0, 0].astype(jnp.int32)
        % 2 + c)
    t("scatter_raw", lambda c: scatter_raw(
        jitter(ct, c), ids0, ws0)[0, 0].astype(jnp.int32) % 2 + c)
    t("sortseg", lambda c: sortseg(
        jitter(ct, c), ids0, ws0)[0, 0].astype(jnp.int32) % 2 + c)

    # numeric check: sortseg == scatter_raw
    a = jax.jit(scatter_raw)(ct, ids0, ws0)
    b = jax.jit(sortseg)(ct, ids0, ws0)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"sortseg-vs-scatter max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
