"""Secondary benchmark: animated-3DGS rendering throughput (the render-FPS
metric in BASELINE.json; the headline SDS-throughput bench is bench.py).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference renders animated 3DGS avatars through the
diff-gaussian-rasterization CUDA extension; its eval videos target 30-60 FPS
at 1024x1024 (BASELINE.md). We measure full-frame render FPS at 1024² with a
200k-gaussian cloud on one TPU chip — the driver's headline
"animated 3DGS render FPS @1024²" metric (vs_baseline vs 60 FPS target).
"""
import json
import time

import numpy as np


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _probe_devices

    _probe_devices()
    import jax.numpy as jnp

    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.ops import rasterize as R
    from dreamwaltz_g_tpu.utils.transforms import quat_normalize

    H = W = 1024
    N = 200_000
    rng = np.random.default_rng(0)
    means3d = jnp.asarray(rng.normal(size=(N, 3)) * 0.4, jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(N, 4)), jnp.float32))
    scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)) * 0.3) * 0.004, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(N,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, size=(N, 3)), jnp.float32)
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)

    f = jax.jit(
        lambda m, q, s, o, c: R.rasterize(
            m, q, s, o, c, cam.extrinsic[0], cam.intrinsics[0], H, W,
            tile_size=32, capacity=1024, chunk=128,
            max_tiles_per_gaussian=4, pallas_mode="eval").image
    )
    out = f(means3d, quats, scales, opac, colors)
    out.block_until_ready()
    for _ in range(5):  # steady-state warmup (executable cache + queues)
        out = f(means3d, quats, scales, opac, colors)
    out.block_until_ready()

    iters = 50
    t0 = time.time()
    for _ in range(iters):
        out = f(means3d, quats, scales, opac, colors)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    fps = 1.0 / dt

    # in-graph chained cross-check: K frames inside one fori_loop, each
    # frame's input perturbed by the previous frame's output — immune to
    # the remote backend's early-readiness reporting (see
    # scripts/_bench_util.py; the dispatch-loop number above is kept for
    # comparability with r2/r3 but is only trusted when the two agree)
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from _bench_util import fetch_rtt

    rtt = fetch_rtt()
    Kc = 30

    @jax.jit
    def chained(c0):
        def body(i, c):
            m = means3d.at[0, 0].add(c.astype(jnp.float32) * 1e-7)
            img = R.rasterize(
                m, quats, scales, opac, colors, cam.extrinsic[0],
                cam.intrinsics[0], H, W, tile_size=32, capacity=1024,
                chunk=128, max_tiles_per_gaussian=4,
                pallas_mode="eval").image
            return (img[0, 0, 0] != 12345.0).astype(jnp.int32) + c

        return jax.lax.fori_loop(0, Kc, body, c0)

    c = chained(jnp.int32(1))
    int(c)
    t0 = time.time()
    c = chained(c)
    int(c)
    chained_fps = Kc / max(time.time() - t0 - rtt, 1e-9)
    if fps > 1.5 * chained_fps:
        print(f"bench_render: dispatch-loop fps {fps:.1f} not confirmed by "
              f"chained in-graph timing {chained_fps:.1f} — using chained",
              flush=True)
        fps = chained_fps

    # frame-batched rendering: ONE dispatch renders F frames (lax.map
    # inside the jit) — the animation/eval pipeline shape
    # (make_avatar_render_frames); amortizes the remote-runtime round trip
    F = 8
    cams = make_camera_batch([2.5] * F,
                             list(np.linspace(0, 360, F, endpoint=False)),
                             [80.0] * F, [50.0] * F, H, W)

    @jax.jit
    def f_batch(m, q, s, o, c, extr, intr, tf):
        def one(args):
            e, k, t = args
            return R.rasterize(
                m, q, s, o, c, e, k, H, W, tanfov=t,
                tile_size=32, capacity=1024, chunk=128,
                max_tiles_per_gaussian=4, pallas_mode="eval").image

        return jax.lax.map(one, (extr, intr, tf))

    outb = f_batch(means3d, quats, scales, opac, colors,
                   cams.extrinsic, cams.intrinsics, cams.tanfov)
    outb.block_until_ready()
    for _ in range(3):
        outb = f_batch(means3d, quats, scales, opac, colors,
                       cams.extrinsic, cams.intrinsics, cams.tanfov)
    outb.block_until_ready()
    itb = 12
    t0 = time.time()
    for _ in range(itb):
        outb = f_batch(means3d, quats, scales, opac, colors,
                       cams.extrinsic, cams.intrinsics, cams.tanfov)
    outb.block_until_ready()
    bfps = (F * itb) / (time.time() - t0)

    Kb = 6  # chained in-graph cross-check, 8 frames per iteration

    @jax.jit
    def chained_batch(c0):
        def body(i, c):
            m = means3d.at[0, 0].add(c.astype(jnp.float32) * 1e-7)

            def one(args):
                e, k, t = args
                return R.rasterize(
                    m, quats, scales, opac, colors, e, k, H, W, tanfov=t,
                    tile_size=32, capacity=1024, chunk=128,
                    max_tiles_per_gaussian=4, pallas_mode="eval").image

            imgs = jax.lax.map(one, (cams.extrinsic, cams.intrinsics,
                                     cams.tanfov))
            return (imgs[0, 0, 0, 0] != 12345.0).astype(jnp.int32) + c

        return jax.lax.fori_loop(0, Kb, body, c0)

    c = chained_batch(jnp.int32(1))
    int(c)
    t0 = time.time()
    c = chained_batch(c)
    int(c)
    chained_bfps = (F * Kb) / max(time.time() - t0 - rtt, 1e-9)
    if bfps > 1.5 * chained_bfps:
        print(f"bench_render: batched fps {bfps:.1f} not confirmed by "
              f"chained in-graph timing {chained_bfps:.1f} — using chained",
              flush=True)
        bfps = chained_bfps

    best = max(fps, bfps)
    print(json.dumps({
        "metric": "3dgs_render_fps_1024",
        "value": round(best, 2),
        "unit": "frames/sec (200k gaussians, 1024x1024, 1 chip; "
                "best of single-dispatch and 8-frame-batched)",
        "vs_baseline": round(best / 60.0, 3),
        "single_frame_fps": round(fps, 2),
        "batched_fps": round(bfps, 2),
    }))


if __name__ == "__main__":
    main()
