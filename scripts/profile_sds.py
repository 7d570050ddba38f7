"""Sub-stage timing of the stage-2 avatar SDS train step on the real chip.

Breaks the bench.py 253 ms step into its three jitted programs
(render_encode / latent_grad / apply_grads) and then decomposes
apply_grads: animate fwd, animate fwd+bwd, project fwd, bin, blend
fwd(train), full render fwd, render fwd+bwd, VAE encode fwd, optimizer
apply. Targets the next optimization lever (PERF.md).

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
    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0  # ms


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
    from dreamwaltz_g_tpu.system import avatar as A
    from dreamwaltz_g_tpu.training.gs_trainer import (
        init_avatar_train_state,
        make_avatar_sds_step_split,
    )
    from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer
    from dreamwaltz_g_tpu.ops import rasterize as R

    H = W = 512
    setup = ts.tiny_avatar_setup(capacity=200_000, n_points=180_000,
                                 num_vertices=2048)
    model, state, observed = setup.model, setup.state, setup.observed

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

    tx = build_avatar_optimizer(RenderConfig(), max_steps=5000)
    tstate = init_avatar_train_state(state, tx)
    raster = dict(tile_size=32, capacity=512, chunk=128,
                  max_tiles_per_gaussian=4)
    step = make_avatar_sds_step_split(model, guidance, tx, H, W, **raster)

    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    txt = jnp.zeros((1, 77, 768), jnp.bfloat16)
    t = jnp.asarray([500], jnp.int32)
    bg = jnp.zeros((H, W, 3))
    ext, intr, tanf = cam.extrinsic[0], cam.intrinsics[0], cam.tanfov[0]

    # --- the three programs, via the public step once to build them ---
    k = jax.random.PRNGKey(1)
    tstate2, m = step(tstate, gparams, observed, ext, intr, tanf, bg, txt,
                      txt, t, k)
    jax.block_until_ready(m["loss"])

    # rebuild the same internals for piecewise timing
    C = state.capacity
    M = model.n_mesh_points
    dummy = jnp.zeros((C + M, 2), jnp.float32)

    animate_f = jax.jit(lambda p: A.animate(
        model, state._replace(params=p), observed))
    gs = jax.block_until_ready(animate_f(state.params))
    print(f"animate fwd:            {timeit(animate_f, state.params):7.2f} ms")

    def animate_loss(p):
        g = A.animate(model, state._replace(params=p), observed)
        return (jnp.sum(g.positions) + jnp.sum(g.colors) + jnp.sum(g.quats)
                + jnp.sum(g.scales) + jnp.sum(g.opacities))
    animate_g = jax.jit(jax.grad(animate_loss))
    print(f"animate fwd+bwd:        {timeit(animate_g, state.params):7.2f} ms")

    proj_f = jax.jit(lambda gs: R.project_gaussians(
        gs.positions, R.covariance3d(gs.quats, gs.scales), gs.opacities,
        gs.colors, ext, intr, H, W, tanfov=tanf, alive=gs.alive))
    g2d = jax.block_until_ready(proj_f(gs))
    print(f"project fwd:            {timeit(proj_f, gs):7.2f} ms")

    bin_f = jax.jit(lambda g: R.bin_gaussians(
        jax.lax.stop_gradient(g.means2d), jax.lax.stop_gradient(g.radius),
        jax.lax.stop_gradient(g.depth), g.mask, H, W, 32, 512, 4))
    tl = jax.block_until_ready(bin_f(g2d))
    print(f"bin (key+sort+extract): {timeit(bin_f, g2d):7.2f} ms")

    rast_f = jax.jit(lambda g: R.rasterize_projected(
        g, H, W, **raster, pallas_mode="train").image)
    print(f"raster fwd (train):     {timeit(rast_f, g2d):7.2f} ms")

    def rast_loss(g):
        out = R.rasterize_projected(g, H, W, **raster, pallas_mode="train")
        return jnp.sum(out.image) + jnp.sum(out.alpha)
    rast_g = jax.jit(jax.grad(lambda g: rast_loss(g), allow_int=True))
    # grad wrt the float fields only
    def rast_loss2(m2d, con, dep, opa, col):
        g = g2d._replace(means2d=m2d, conic=con, depth=dep, opacity=opa,
                         colors=col)
        return rast_loss(g)
    rast_g = jax.jit(jax.grad(rast_loss2, argnums=(0, 1, 2, 3, 4)))
    print(f"raster fwd+bwd:         {timeit(rast_g, g2d.means2d, g2d.conic, g2d.depth, g2d.opacity, g2d.colors):7.2f} ms")

    img = jnp.zeros((1, H, W, 3), jnp.bfloat16)
    enc_f = jax.jit(lambda gp, im: guidance.encode_images(gp, im))
    print(f"VAE encode fwd:         {timeit(enc_f, gparams, img):7.2f} ms")

    # UNet CFG forward, flash-attention A/B (layers.FLASH_ATTENTION gates
    # the 4096/1024-token self-attention layers onto the Pallas kernel)
    from dreamwaltz_g_tpu.guidance import layers as L
    lat2 = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    t2 = jnp.full((2,), 500, jnp.int32)
    ctx2 = jnp.concatenate([txt, txt], axis=0)
    for mode in ("off", "auto"):
        L.FLASH_ATTENTION = mode
        uf = jax.jit(lambda gp, l, tt, cc: guidance.unet.apply(
            gp.unet, l, tt, cc))
        print(f"UNet CFG fwd (flash={mode:4s}): "
              f"{timeit(uf, gparams, lat2, t2, ctx2):7.2f} ms")
    L.FLASH_ATTENTION = "auto"
    for mode in ("off", "auto"):
        L.FLASH_ATTENTION = mode
        ef = jax.jit(lambda gp, im: guidance.encode_images(gp, im))
        print(f"VAE encode (flash={mode:4s}):   "
              f"{timeit(ef, gparams, img):7.2f} ms")
    L.FLASH_ATTENTION = "auto"

    # full render fwd (animate+project+raster+composite)
    def full_render(p):
        from dreamwaltz_g_tpu.training.gs_trainer import _render_with_dummy
        image, out = _render_with_dummy(model, state, p, observed, dummy,
                                        ext, intr, tanf, bg, H, W, raster)
        return image
    fr_f = jax.jit(full_render)
    print(f"full render fwd:        {timeit(fr_f, state.params):7.2f} ms")

    glat = jnp.zeros((1, 64, 64, 4), jnp.float32)

    def full_loss(p, d):
        from dreamwaltz_g_tpu.training.gs_trainer import _render_with_dummy
        image, out = _render_with_dummy(model, state, p, observed, d,
                                        ext, intr, tanf, bg, H, W, raster)
        latents = guidance.encode_images(gparams, image[None].astype(jnp.bfloat16))
        return jnp.sum(latents.astype(jnp.float32) * glat), out.radii
    fl_g = jax.jit(jax.grad(full_loss, argnums=(0, 1), has_aux=True))
    print(f"render+VAE fwd+bwd:     {timeit(fl_g, state.params, dummy):7.2f} ms")

    # optimizer apply alone
    (grads, _dgrad), _aux = fl_g(state.params, dummy)

    def opt_f(g, os_, p):
        up, os2 = tx.update(g, os_, p)
        return optax.apply_updates(p, up), os2
    import optax
    opt_j = jax.jit(opt_f)
    print(f"optimizer apply:        {timeit(opt_j, grads, tstate.opt_state, state.params):7.2f} ms")

    # --- the three public programs ---
    def prog_re(ts_):
        from dreamwaltz_g_tpu.guidance.sds import GuidanceParams as GP
        return None
    # time the public step end-to-end again for the record
    def full_step(ts_, kk):
        ts2, mm = step(ts_, gparams, observed, ext, intr, tanf, bg, txt,
                       txt, t, kk)
        return mm["loss"]
    print(f"full split step:        {timeit(full_step, tstate, k):7.2f} ms")
