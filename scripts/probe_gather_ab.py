"""A/B: single flat-gather vs per-level/per-plane gathers (shipped).

The flat formulation (one jnp.take over the concatenated level stack) was
tried in ef32838 and REVERTED in 2d8fe8e after losing this A/B — XLA's
smaller per-table gathers/scatters win. The losing variant is re-created
inline here so the decision stays reproducible; E.grid_encode /
E.triplane_encode ARE the shipped per-level/per-plane implementations.

One process, interleaved measurement — removes session-to-session tunnel
variance from the comparison. 200k points, ref-size 16L/2^19 tiled grid.

TIMING CAVEAT (round 4): this script predates the remote-backend
readiness artifact discovered 2026-08-19 (dispatch-loop +
block_until_ready can time DISPATCH only). Its historical numbers in
PERF.md were taken while the service honored readiness; re-runs
should cross-check against the in-graph pattern in _bench_util.py
(see bench.py measure() / profile_flash_ab.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=8, warmup=3):
    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


if __name__ == "__main__":
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    import numpy as np

    from dreamwaltz_g_tpu.nerf import encoder as E

    cfg = E.GridEncoderConfig()  # 16L / 2^19 tiled
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (200_000, 3),
                           minval=-0.9, maxval=0.9)

    def flat(p, x):
        # the reverted single-gather formulation: all levels' (N, 8) index
        # blocks offset into one (L*T, F) stack, one jnp.take
        N = x.shape[0]
        L, T, F = p.tables.shape
        coords01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        idxs, ws = [], []
        for level in range(cfg.num_levels):
            idx, w = E._level_indices(
                coords01, cfg.level_scale(level), cfg.level_resolution(level),
                cfg.level_table_size(level), cfg.gridtype)
            idxs.append(idx + level * T)
            ws.append(w)
        idx = jnp.concatenate(idxs, axis=1)          # (N, 8L)
        w = jnp.concatenate(ws, axis=1)
        emb = jnp.take(p.tables.reshape(L * T, F), idx, axis=0)
        return (emb * w[..., None]).reshape(N, L, -1, F).sum(2).reshape(N, L * F)

    flat_f = jax.jit(lambda p: jnp.sum(flat(p, x) ** 2))
    pl_f = jax.jit(lambda p: jnp.sum(E.grid_encode(p, cfg, x) ** 2))
    flat_g = jax.jit(jax.grad(lambda p: jnp.sum(flat(p, x) ** 2)))
    pl_g = jax.jit(jax.grad(lambda p: jnp.sum(E.grid_encode(p, cfg, x) ** 2)))

    print(f"grid fwd      flat {timeit(flat_f, params):7.2f} ms   "
          f"per-level {timeit(pl_f, params):7.2f} ms")
    print(f"grid fwd+bwd  flat {timeit(flat_g, params):7.2f} ms   "
          f"per-level {timeit(pl_g, params):7.2f} ms")

    tcfg = E.TriplaneConfig(resolution=256, feature_dim=32)
    tp = E.init_triplane(tcfg, jax.random.PRNGKey(2))

    def flat_tri(p, x):
        # reverted single-gather triplane: 12 rows from one (3*R*R, F) stack
        coords01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        R, F = tcfg.resolution, tcfg.feature_dim
        stack = p.planes.reshape(3 * R * R, F)
        out = 0.0
        for pl, (a, b) in enumerate(((0, 1), (0, 2), (1, 2))):
            uv = coords01[:, (a, b)] * (R - 1)
            i0 = jnp.floor(uv).astype(jnp.int32)
            frac = uv - jnp.floor(uv)
            i1 = jnp.minimum(i0 + 1, R - 1)
            base = pl * R * R
            f00 = jnp.take(stack, base + i0[:, 0] * R + i0[:, 1], axis=0)
            f01 = jnp.take(stack, base + i0[:, 0] * R + i1[:, 1], axis=0)
            f10 = jnp.take(stack, base + i1[:, 0] * R + i0[:, 1], axis=0)
            f11 = jnp.take(stack, base + i1[:, 0] * R + i1[:, 1], axis=0)
            wu, wv = frac[:, :1], frac[:, 1:2]
            out = out + (1 - wu) * ((1 - wv) * f00 + wv * f01) \
                + wu * ((1 - wv) * f10 + wv * f11)
        return out

    tflat_g = jax.jit(jax.grad(lambda p: jnp.sum(flat_tri(p, x) ** 2)))
    tpl_g = jax.jit(jax.grad(
        lambda p: jnp.sum(E.triplane_encode(p, tcfg, x) ** 2)))
    print(f"tri  fwd+bwd  flat {timeit(tflat_g, tp):7.2f} ms   "
          f"per-plane {timeit(tpl_g, tp):7.2f} ms")
