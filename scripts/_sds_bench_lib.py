"""Shared setup for the stage-2 SDS profiling scripts (profile_stage2_hash,
profile_multiview): real-size frozen SD1.5 guidance (UNet+VAE+ControlNet,
random weights, bf16) and the OpenPose condition canvas — the same
architecture sizes bench.py's headline step measures
(reference: core/trainer.py:445-476 step composition).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def init_jax_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_guidance(key=None):
    """(guidance, gparams) at SD1.5 sizes, bf16 weights."""
    import jax
    import jax.numpy as jnp

    from dreamwaltz_g_tpu.guidance.controlnet import ControlNet
    from dreamwaltz_g_tpu.guidance.sds import (
        GuidanceParams,
        ScoreDistillation,
    )
    from dreamwaltz_g_tpu.guidance.unet import (
        UNet2DCondition,
        sd15_unet_config,
    )
    from dreamwaltz_g_tpu.guidance.vae import AutoencoderKL, sd_vae_config

    ucfg = sd15_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(sd_vae_config())
    cnet = ControlNet(ucfg)
    key = key if key is not None else jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 64, 64, 4))
    ctx = jnp.zeros((1, 77, 768))
    unet_p = unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx)
    vae_p = vae.init(key, image_size=512)
    cnet_p = cnet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx,
                       jnp.zeros((1, 512, 512, 3)))

    def cast(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    gparams = GuidanceParams(unet=cast(unet_p), vae=cast(vae_p),
                             controlnet=cast(cnet_p))
    del unet_p, vae_p, cnet_p  # free the f32 init trees (~5.2 GB HBM)
    jax.block_until_ready(gparams)
    guidance = ScoreDistillation(unet=unet, vae=vae, controlnet=cnet,
                                 latent_size=64, guidance_scale=50.0)
    return guidance, gparams


def pose_canvas(size: int = 512):
    """A 512² OpenPose condition tensor (1, H, W, 3) bf16."""
    import jax.numpy as jnp
    import numpy as np

    from dreamwaltz_g_tpu.human.openpose import draw_openpose_map

    body = np.full((128, 2), np.nan, np.float32)
    body[:18] = np.array(
        [[.50, .12], [.50, .25], [.42, .25], [.38, .38], [.36, .50],
         [.58, .25], [.62, .38], [.64, .50], [.45, .52], [.44, .72],
         [.44, .90], [.55, .52], [.56, .72], [.56, .90], [.48, .10],
         [.52, .10], [.45, .11], [.55, .11]], np.float32)
    canvas = draw_openpose_map([body], size, size, draw_hand_kp=False)
    cond = jnp.asarray(canvas, jnp.float32)[None] / 255.0
    return cond.astype(jnp.bfloat16)


def timed(fn, iters: int, warmup: int = 3, sync_iters: int = 2):
    """Steady-state seconds/iter: async loop + final block, cross-checked
    against per-iter synced timing (the remote axon backend has produced
    bogus async readings — bench.py measure() precedent). Returns
    (dt_async, dt_sync); trust dt_async when they agree within 3x."""
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt_a = (time.time() - t0) / iters
    t0 = time.time()
    for _ in range(sync_iters):
        jax.block_until_ready(fn())
    dt_s = (time.time() - t0) / sync_iters
    return dt_a, dt_s
