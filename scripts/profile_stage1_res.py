"""Measure stage-1 NeRF SDS step time at the resolutions PERF.md currently
extrapolates (triplane @256^2, hash+compact+bf16 @256^2) on the real chip.

Fills in the '*'-less cells of the two-stage wall-clock table. Mirrors
bench.py's bench_stage1 exactly (same step builder, 96-candidate compacted
march, SD1.5-size frozen guidance) with H=W configurable.

``--512`` REPLACES the default 256^2 rows with 512^2 ones (triplane @512²,
hash+compact+bf16 @512² — the wall-clock table's last extrapolated cell);
run once without and once with the flag for the full table.

``--small`` likewise replaces the default rows with hash 64^2/128^2 —
the cells re-measured at the 2^19 parity table size (round 4).

``--chunk N`` overrides the render's ray_chunk (default 4096, the
reference's max_ray_batch) for every row — the chunk-size A/B: at 512^2
the default runs 64 sequential rematerialized chunk renders, which may
underutilize the chip for the matmul-heavy triplane backbone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dreamwaltz_g_tpu.configs import NeRFConfig
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.guidance.sds import GuidanceParams, ScoreDistillation
    from dreamwaltz_g_tpu.guidance.unet import UNet2DCondition, sd15_unet_config
    from dreamwaltz_g_tpu.guidance.vae import AutoencoderKL, sd_vae_config
    from dreamwaltz_g_tpu.nerf.network import build_nerf
    from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
    from dreamwaltz_g_tpu.training import nerf_trainer
    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    ucfg = sd15_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(sd_vae_config())
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 64, 64, 4))
    ctx = jnp.zeros((1, 77, 768))
    unet_p = unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx)
    vae_p = vae.init(key, image_size=512)
    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    gparams = GuidanceParams(unet=cast(unet_p), vae=cast(vae_p))
    guidance = ScoreDistillation(unet=unet, vae=vae, latent_size=64,
                                 guidance_scale=50.0)
    txt = jnp.zeros((1, 77, 768), jnp.bfloat16)
    t = jnp.asarray([500], jnp.int32)
    k = jax.random.PRNGKey(1)

    ray_chunk = 4096
    if "--chunk" in sys.argv:
        ray_chunk = int(sys.argv[sys.argv.index("--chunk") + 1])

    def bench_stage1(ncfg, H, n_iters=5, warmup=3):
        nonlocal k
        nerf = build_nerf(ncfg, with_background=False)
        ntx = build_nerf_optimizer(ncfg, 10000)
        nstate = nerf_trainer.init_train_state(nerf, ntx,
                                               jax.random.PRNGKey(2))
        grid = init_occupancy(64)
        nstep = nerf_trainer.make_nerf_sds_step(
            nerf, guidance, ntx, H, H, ncfg, num_steps=96,
            max_iteration=10000, ray_chunk=ray_chunk)
        ncam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, H)
        for _ in range(warmup):
            k, kk = jax.random.split(k)
            nstate, nm = nstep(nstate, grid, gparams, ncam.c2w[0],
                               ncam.intrinsics[0],
                               jnp.asarray([0.5, 0.5, 0.5]),
                               txt, txt, t, kk)
        jax.block_until_ready(nm["loss"])
        t0 = time.time()
        for _ in range(n_iters):
            k, kk = jax.random.split(k)
            nstate, nm = nstep(nstate, grid, gparams, ncam.c2w[0],
                               ncam.intrinsics[0],
                               jnp.asarray([0.5, 0.5, 0.5]),
                               txt, txt, t, kk)
        jax.block_until_ready(nm["loss"])
        return (time.time() - t0) / n_iters

    rows = [
        ("triplane 256^2", NeRFConfig(backbone="triplane"), 256, 8),
        ("hash+compact bf16 256^2", NeRFConfig(backbone="tiledgrid", grid_dtype="bf16"), 256, 3),
    ]
    if "--512" in sys.argv:
        # the two-stage wall-clock table's last extrapolated cell
        # (PERF.md: hash @512² was scaled from the 256² render share)
        rows = [
            ("triplane 512^2", NeRFConfig(backbone="triplane"), 512, 5),
            ("hash+compact bf16 512^2", NeRFConfig(backbone="tiledgrid", grid_dtype="bf16"), 512, 2),
        ]
    if "--small" in sys.argv:
        # hash rows at 64^2/128^2 — re-measured after the 2^19 capacity fix
        # (the r3 cells were 2^16); REPLACES the default rows like --512
        rows = [
            ("hash+compact bf16 64^2", NeRFConfig(backbone="tiledgrid", grid_dtype="bf16"), 64, 5),
            ("hash+compact bf16 128^2", NeRFConfig(backbone="tiledgrid", grid_dtype="bf16"), 128, 4),
        ]
    for name, ncfg, H, n in rows:
        dt = bench_stage1(ncfg, H, n_iters=n)
        print(f"{name:28s} {dt:8.3f} s/it   {1.0/dt:6.3f} it/s", flush=True)


if __name__ == "__main__":
    main()
