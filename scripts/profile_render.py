"""Stage-by-stage timing of the 1024² render pipeline on the real chip.

Times: project | bin(key+sort) | bin(extract) | pre-gather | pallas kernel,
each as its own jitted program, to target the next optimization lever
(PERF.md 'next levers').

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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0  # ms


if __name__ == "__main__":
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.ops import rasterize as R
    from dreamwaltz_g_tpu.ops.pallas_blend import blend_tiles_pallas
    from dreamwaltz_g_tpu.utils.transforms import quat_normalize

    H = W = 1024
    N = 200_000
    TS, CAP, CHUNK, D = 32, 1024, 128, 4
    rng = np.random.default_rng(0)
    means3d = jnp.asarray(rng.normal(size=(N, 3)) * 0.4, jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(N, 4)), jnp.float32))
    scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)) * 0.3) * 0.004,
                         jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(N,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, size=(N, 3)), jnp.float32)
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)

    cov3d_f = jax.jit(lambda q, s: R.covariance3d(q, s))
    cov3d = jax.block_until_ready(cov3d_f(quats, scales))

    proj_f = jax.jit(lambda c: R.project_gaussians(
        means3d, c, opac, colors, cam.extrinsic[0], cam.intrinsics[0], H, W))
    g2d = jax.block_until_ready(proj_f(cov3d))

    bin_f = jax.jit(lambda g: R.bin_gaussians(
        g.means2d, g.radius, g.depth, g.mask, H, W, TS, CAP, D))
    tile_lists, tile_counts, _overflow = jax.block_until_ready(bin_f(g2d))

    def pregather(g, tl):
        n = g.colors.shape[0]
        attrs = jnp.zeros((n + 1, 8), jnp.float32)
        attrs = attrs.at[:n, 0:2].set(g.means2d)
        attrs = attrs.at[:n, 2:5].set(g.conic)
        attrs = attrs.at[:n, 5].set(g.opacity * g.mask)
        vals = jnp.zeros((n + 1, 8), jnp.float32)
        vals = vals.at[:n, 0:3].set(g.colors)
        vals = vals.at[:n, 3].set(g.depth)
        vals = vals.at[:n, 4].set(1.0)
        return jnp.swapaxes(attrs[tl], 1, 2), jnp.swapaxes(vals[tl], 1, 2)

    pg_f = jax.jit(pregather)
    ga, gv = jax.block_until_ready(pg_f(g2d, tile_lists))

    blend_f = jax.jit(lambda g, tl, tc: blend_tiles_pallas(
        tl, g.means2d, g.conic, g.opacity * g.mask,
        jnp.concatenate([g.colors, g.depth[:, None],
                         jnp.ones((N, 1))], -1),
        H, W, tile_size=TS, chunk=CHUNK, tile_counts=tc))
    _ = jax.block_until_ready(blend_f(g2d, tile_lists, tile_counts))

    full_f = jax.jit(lambda m, q, s, o, c: R.rasterize(
        m, q, s, o, c, cam.extrinsic[0], cam.intrinsics[0], H, W,
        tile_size=TS, capacity=CAP, chunk=CHUNK,
        max_tiles_per_gaussian=D, pallas_mode="eval").image)

    # sub-stages of binning
    def key_sort(g):
        # replica of bin_gaussians up to the sort
        mask, depth, radius, means2d = g.mask, g.depth, g.radius, g.means2d
        Tx = -(-W // TS)
        Ty = -(-H // TS)
        T = Tx * Ty
        qbits = min(22, 31 - int(np.ceil(np.log2(T + 2))))
        qmax = (1 << qbits) - 1
        dmin = jnp.min(jnp.where(mask, depth, jnp.inf))
        dmax = jnp.max(jnp.where(mask, depth, -jnp.inf))
        qd = jnp.clip(((depth - dmin) / jnp.maximum(dmax - dmin, 1e-9)
                       * (qmax - 1)).astype(jnp.int32), 0, qmax - 1)
        x, y = means2d[:, 0], means2d[:, 1]
        r = radius
        txmin = jnp.clip(jnp.floor((x - r) / TS), 0, Tx - 1).astype(jnp.int32)
        txmax = jnp.clip(jnp.floor((x + r) / TS), 0, Tx - 1).astype(jnp.int32)
        tymin = jnp.clip(jnp.floor((y - r) / TS), 0, Ty - 1).astype(jnp.int32)
        tymax = jnp.clip(jnp.floor((y + r) / TS), 0, Ty - 1).astype(jnp.int32)
        sw = txmax - txmin + 1
        sh = tymax - tymin + 1
        d = jnp.arange(D, dtype=jnp.int32)[None, :]
        dx = d % sw[:, None]
        dy = d // sw[:, None]
        valid = mask[:, None] & (d < sw[:, None] * sh[:, None]) \
            & (dy < sh[:, None]) & (r[:, None] > 0)
        tile_id = (tymin[:, None] + dy) * Tx + (txmin[:, None] + dx)
        tile_id = jnp.where(valid, tile_id, T).astype(jnp.int32)
        flat_tile = tile_id.reshape(-1)
        flat_q = jnp.broadcast_to(qd[:, None], (N, D)).reshape(-1)
        flat_idx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, D)).reshape(-1)
        key = flat_tile * np.int32(qmax + 1) + jnp.where(
            flat_tile < T, flat_q, qmax)
        return jax.lax.sort((key, flat_idx), num_keys=1)

    ks_f = jax.jit(key_sort)
    s_key, s_idx = jax.block_until_ready(ks_f(g2d))

    def extract(s_key, s_idx):
        Tx = -(-W // TS)
        Ty = -(-H // TS)
        T = Tx * Ty
        qbits = min(22, 31 - int(np.ceil(np.log2(T + 2))))
        qmax = (1 << qbits) - 1
        seg_start = jnp.searchsorted(
            s_key, jnp.arange(T, dtype=jnp.int32) * np.int32(qmax + 1))
        seg_end = jnp.searchsorted(
            s_key, jnp.arange(1, T + 1, dtype=jnp.int32) * np.int32(qmax + 1))
        k_ar = jnp.arange(CAP, dtype=jnp.int32)[None, :]
        src = seg_start[:, None] + k_ar
        in_seg = src < seg_end[:, None]
        idx_at = jnp.take(s_idx, jnp.minimum(src, N * D - 1), mode="clip")
        return jnp.where(in_seg, idx_at, N), \
            jnp.minimum(seg_end - seg_start, CAP).astype(jnp.int32)

    ex_f = jax.jit(extract)
    _ = jax.block_until_ready(ex_f(s_key, s_idx))

    print(f"cov3d     : {timeit(cov3d_f, quats, scales):7.2f} ms")
    print(f"project   : {timeit(proj_f, cov3d):7.2f} ms")
    print(f"bin total : {timeit(bin_f, g2d):7.2f} ms")
    print(f"  key+sort: {timeit(ks_f, g2d):7.2f} ms")
    print(f"  extract : {timeit(ex_f, s_key, s_idx):7.2f} ms")
    print(f"pre-gather: {timeit(pg_f, g2d, tile_lists):7.2f} ms")
    print(f"blend(+pg): {timeit(blend_f, g2d, tile_lists, tile_counts):7.2f} ms")
    full = timeit(full_f, means3d, quats, scales, opac, colors)
    print(f"FULL      : {full:7.2f} ms  ({1000.0/full:.1f} FPS)")
