"""A/B the train blend kernel's panel precision on the real chip
(VERDICT r3 #10): panel_dtype='f32' vs 'bf16' — the bf16 mode stores the
values panel in bf16 and feeds both MXU passes bf16 operands with f32
accumulate (ops/pallas_blend.py). Times the full differentiable
rasterize fwd+bwd at the training shape (512², 200k splats) and reports
the gradient deviation of the bf16 path vs f32 on the same scene.

Result goes to PERF.md "bf16 blend panels".

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
    import jax
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0  # ms


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.ops import pallas_blend as PB
    from dreamwaltz_g_tpu.ops import rasterize as R
    from dreamwaltz_g_tpu.utils.transforms import quat_normalize

    H = W = 512
    N = 200_000
    rng = np.random.default_rng(0)
    means3d = jnp.asarray(rng.normal(size=(N, 3)) * 0.4, jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(N, 4)), jnp.float32))
    scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)) * 0.3) * 0.004,
                         jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(N,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, size=(N, 3)), jnp.float32)
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)

    def loss(m3d, cols):
        cov3d = R.covariance3d(quats, scales)
        g2d = R.project_gaussians(m3d, cov3d, opac, cols,
                                  cam.extrinsic[0], cam.intrinsics[0], H, W)
        out = R.rasterize_projected(g2d, H, W, tile_size=32, capacity=1024,
                                    chunk=128, use_pallas=True)
        return jnp.sum(out.image ** 2) + jnp.sum(out.alpha), out.image

    results = {}
    for mode in ("f32", "bf16"):
        PB.PANEL_DTYPE = mode
        # fresh jit wrapper per mode: PANEL_DTYPE is read at trace time
        g = jax.jit(jax.grad(lambda m, c: loss(m, c)[0], argnums=(0, 1)))
        ms = timeit(g, means3d, colors)
        results[mode] = (ms, g(means3d, colors))
        print(f"panel_dtype={mode:4s}  raster fwd+bwd {ms:7.2f} ms",
              flush=True)
    PB.PANEL_DTYPE = "f32"

    (gm32, gc32) = results["f32"][1]
    (gm16, gc16) = results["bf16"][1]
    for name, a, b in (("means3d", gm16, gm32), ("colors", gc16, gc32)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = float(np.abs(a - b).max()) / max(float(np.abs(b).max()), 1e-12)
        print(f"grad max-rel dev {name}: {rel:.2e}", flush=True)
    sp = results["f32"][0] / results["bf16"][0]
    print(f"bf16 speedup: {sp:.3f}x", flush=True)


if __name__ == "__main__":
    main()
