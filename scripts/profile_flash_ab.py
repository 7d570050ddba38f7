"""Flash-attention on/off A/B for the two guidance programs it gates:
the SD1.5 UNet CFG-batch forward (5x 4096-token + 1024-token self-attn
layers) and the VAE encoder (one 4096-token attention block @512²).

Decides layers.FLASH_ATTENTION's default: the Pallas flash kernel keeps
the running softmax in VMEM (no (N, N) HBM materialization) but pads
head_dim 40/80 to the 128-lane MXU tile, so whether it wins at SD1.5
shapes is an empirical question — this measures it on the real chip.

NOTE: intentionally mirrors the A/B inside scripts/profile_sds.py
(lines ~140-158) as a lighter-weight standalone — no GS/render setup, so
it runs in seconds on a cold cache. Keep the shapes/loop in sync with
profile_sds.py when either changes.

The VAE row times encode fwd AND grad-through-encode: training SDS
gradients flow through vae.encode (the backward kernels are what
layers.py's compile probe exercises), so the FLASH_ATTENTION default must
reflect the differentiated path, not just inference.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=20, warmup=3):
    import jax
    out = None
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

    from dreamwaltz_g_tpu.guidance import layers as L
    from dreamwaltz_g_tpu.guidance.unet import UNet2DCondition, sd15_unet_config
    from dreamwaltz_g_tpu.guidance.vae import AutoencoderKL, sd_vae_config

    key = jax.random.PRNGKey(0)
    unet = UNet2DCondition(sd15_unet_config())
    vae = AutoencoderKL(sd_vae_config())
    lat = jnp.zeros((1, 64, 64, 4))
    ctx = jnp.zeros((1, 77, 768))
    unet_p = unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx)
    vae_p = vae.init(key, image_size=512)
    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    unet_p, vae_p = cast(unet_p), cast(vae_p)

    lat2 = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    t2 = jnp.full((2,), 500, jnp.int32)
    ctx2 = jnp.zeros((2, 77, 768), jnp.bfloat16)
    img = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)

    for mode in ("off", "auto"):
        L.FLASH_ATTENTION = mode
        uf = jax.jit(lambda p, l, tt, cc: unet.apply(p, l, tt, cc))
        ms_u = timeit(uf, unet_p, lat2, t2, ctx2)
        ef = jax.jit(lambda p, im: vae.encode(p, im))
        ms_v = timeit(ef, vae_p, img)
        # fwd+bwd through encode — the path SDS training actually pays
        # (gradients flow from the latent loss back through the VAE)
        eg = jax.jit(jax.grad(
            lambda im, p: jnp.sum(vae.encode(p, im).astype(jnp.float32) ** 2)))
        ms_vg = timeit(eg, img, vae_p)
        print(f"flash={mode:4s}  UNet CFG fwd {ms_u:7.2f} ms   "
              f"VAE encode fwd {ms_v:7.2f} ms   "
              f"VAE encode fwd+bwd {ms_vg:7.2f} ms", flush=True)
    L.FLASH_ATTENTION = "auto"


if __name__ == "__main__":
    main()
