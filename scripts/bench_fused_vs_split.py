"""Compare the fused single-program avatar SDS step against the 3-program
split step on the real chip.

The split step (make_avatar_sds_step_split) re-runs the render + VAE
encode forward inside apply_grads (~15% overhead, PERF.md); the fused
step (make_avatar_sds_step) renders once inside one jax.grad graph. The
split exists because round-2's remote_compile transport failed on the
giant fused graph — this probes whether that still holds and what the
fused step is worth.

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


def bench(step, tstate, args, iters=10, warmup=3, split=False):
    import jax
    k = jax.random.PRNGKey(1)
    for _ in range(warmup):
        k, kk = jax.random.split(k)
        tstate, m = step(tstate, *args, kk)
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for _ in range(iters):
        k, kk = jax.random.split(k)
        tstate, m = step(tstate, *args, kk)
    jax.block_until_ready(m["loss"])
    return (time.time() - t0) / iters


if __name__ == "__main__":
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dreamwaltz_g_tpu import tests_support as ts
    from dreamwaltz_g_tpu.configs import RenderConfig
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.guidance.sds import GuidanceParams, ScoreDistillation
    from dreamwaltz_g_tpu.guidance.unet import UNet2DCondition, sd15_unet_config
    from dreamwaltz_g_tpu.guidance.vae import AutoencoderKL, sd_vae_config
    from dreamwaltz_g_tpu.training.gs_trainer import (
        init_avatar_train_state,
        make_avatar_sds_step,
        make_avatar_sds_step_split,
    )
    from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer

    H = W = 512
    setup = ts.tiny_avatar_setup(capacity=200_000, n_points=180_000,
                                 num_vertices=2048)

    ucfg = sd15_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(sd_vae_config())
    key = jax.random.PRNGKey(0)
    unet_p = unet.init(key, jnp.zeros((1, 64, 64, 4)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)))
    vae_p = vae.init(key, image_size=512)
    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    gparams = GuidanceParams(unet=cast(unet_p), vae=cast(vae_p))
    guidance = ScoreDistillation(unet=unet, vae=vae, latent_size=64,
                                 guidance_scale=50.0)

    tx = build_avatar_optimizer(RenderConfig(), max_steps=5000)
    tstate = init_avatar_train_state(setup.state, tx)
    raster = dict(tile_size=32, capacity=512, chunk=128,
                  max_tiles_per_gaussian=4)

    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    txt = jnp.zeros((1, 77, 768), jnp.bfloat16)
    t = jnp.asarray([500], jnp.int32)
    bg = jnp.zeros((H, W, 3))
    args = (gparams, setup.observed, cam.extrinsic[0], cam.intrinsics[0],
            cam.tanfov[0], bg, txt, txt, t)

    split = make_avatar_sds_step_split(setup.model, guidance, tx, H, W,
                                       **raster)
    dt = bench(split, tstate, args)
    print(f"split step: {dt * 1e3:7.1f} ms  ({1.0 / dt:.2f} it/s)")

    fused = make_avatar_sds_step(setup.model, guidance, tx, H, W, **raster)
    try:
        dt = bench(fused, tstate, args)
        print(f"fused step: {dt * 1e3:7.1f} ms  ({1.0 / dt:.2f} it/s)")
    except Exception as e:  # noqa: BLE001
        print(f"fused step FAILED: {type(e).__name__}: {str(e)[:500]}")
