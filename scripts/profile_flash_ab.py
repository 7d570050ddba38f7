"""Flash-attention on/off A/B for the two guidance programs it gates:
the SD1.5 UNet CFG-batch forward (5x 4096-token + 1024-token self-attn
layers) and the VAE encoder (one 4096-token attention block @512²).

Decides layers.FLASH_ATTENTION's default: the Pallas flash kernel keeps
the running softmax in VMEM (no (N, N) HBM materialization) but pads
head_dim 40/80 to the 128-lane MXU tile, so whether it wins at SD1.5
shapes is an empirical question — this measures it on the real chip.

NOTE: intentionally mirrors the A/B inside scripts/profile_sds.py as a
lighter-weight standalone — no GS/render setup. Timing uses
_bench_util's in-graph serial repetition: the remote backend's readiness
reporting made the old dispatch-loop pattern read 1.6 ms for a ~40 ms
UNet forward (round-4 artifact; see _bench_util docstring).

The VAE row times encode fwd AND grad-through-encode: training SDS
gradients flow through vae.encode (the backward kernels are what
layers.py's compile probe exercises), so the FLASH_ATTENTION default must
reflect the differentiated path, not just inference.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    from _bench_util import fetch_rtt, time_op

    rtt = fetch_rtt()
    print(f"host fetch RTT baseline: {rtt * 1e3:.1f} ms", flush=True)

    for mode in ("off", "auto"):
        L.FLASH_ATTENTION = mode

        # in-graph serial repetition (see _bench_util): carry perturbs the
        # input, the output feeds the next carry — dispatch-only timing on
        # the remote backend is impossible by construction
        def body_unet(c):
            li = lat2.at[0, 0, 0, 0].set((c % 3).astype(jnp.bfloat16))
            out = unet.apply(unet_p, li, t2, ctx2)
            return (out[0, 0, 0, 0].astype(jnp.float32)
                    != 12345.0).astype(jnp.int32) + c

        ms_u = time_op(body_unet, K=5, rtt=rtt)  # small K: the
        # remote compile helper chokes on big looped UNet programs

        def body_vae(c):
            im = img.at[0, 0, 0, 0].set((c % 3).astype(jnp.bfloat16))
            z = vae.encode(vae_p, im)
            return (z[0, 0, 0, 0].astype(jnp.float32)
                    != 12345.0).astype(jnp.int32) + c

        # fwd-only VAE row behind --full: every program here is a
        # heavyweight remote compile, and training only pays fwd+bwd
        ms_v = time_op(body_vae, K=8, rtt=rtt) \
            if "--full" in sys.argv else float("nan")

        # fwd+bwd through encode — the path SDS training actually pays
        # (gradients flow from the latent loss back through the VAE)
        gfun = jax.grad(
            lambda im, p: jnp.sum(vae.encode(p, im).astype(jnp.float32) ** 2))

        def body_vae_grad(c):
            im = img.at[0, 0, 0, 0].set((c % 3).astype(jnp.bfloat16))
            g = gfun(im, vae_p)
            return (g[0, 0, 0, 0].astype(jnp.float32)
                    != 12345.0).astype(jnp.int32) + c

        ms_vg = time_op(body_vae_grad, K=6, rtt=rtt)
        print(f"flash={mode:4s}  UNet CFG fwd {ms_u:7.2f} ms   "
              f"VAE encode fwd {ms_v:7.2f} ms   "
              f"VAE encode fwd+bwd {ms_vg:7.2f} ms", flush=True)
    L.FLASH_ATTENTION = "auto"


if __name__ == "__main__":
    main()
