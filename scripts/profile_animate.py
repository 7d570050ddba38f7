"""Animate fwd / fwd+bwd cost vs avatar NeRF-field backbone, 200k points.

The stage-2 avatar re-decodes colors/opacities through the stage-1 field
every step with trainable tables (reference: nerf_forward,
core/system/avatar.py:462-496) — on TPU the hash backward is a giant
scatter-add and dominates the step (PERF.md). Rows: the round-2 bench's
under-sized 4-level/2^8 encoder, the reference-size 16-level/2^19 tiled
grid (bench honesty check), and the triplane backbone.

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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dreamwaltz_g_tpu import tests_support as ts
    from dreamwaltz_g_tpu.nerf.encoder import GridEncoderConfig, TriplaneConfig
    from dreamwaltz_g_tpu.system import avatar as A

    cfgs = {
        "grid 4L/2^8 (r2 bench)": GridEncoderConfig(
            num_levels=4, level_dim=2, base_resolution=4,
            desired_resolution=32, log2_hashmap_size=8),
        "grid 16L/2^19 tiled (ref size)": GridEncoderConfig(),
        "grid 16L/2^19 tiled bf16": GridEncoderConfig(compute_dtype="bf16"),
        "triplane 256/32": TriplaneConfig(resolution=256, feature_dim=32),
        "triplane 256/32 bf16": TriplaneConfig(resolution=256, feature_dim=32,
                                               compute_dtype="bf16"),
    }
    for name, enc_cfg in cfgs.items():
        setup = ts.tiny_avatar_setup(capacity=200_000, n_points=180_000,
                                     num_vertices=2048, enc_cfg=enc_cfg)
        model, state, observed = setup.model, setup.state, setup.observed

        fwd = jax.jit(lambda p, m=model, s=state, o=observed: A.animate(
            m, s._replace(params=p), o))

        def loss(p, m=model, s=state, o=observed):
            g = A.animate(m, s._replace(params=p), o)
            return (jnp.sum(g.positions) + jnp.sum(g.colors)
                    + jnp.sum(g.quats) + jnp.sum(g.scales)
                    + jnp.sum(g.opacities))
        bwd = jax.jit(jax.grad(loss))
        t_f = timeit(fwd, state.params)
        t_b = timeit(bwd, state.params)
        print(f"{name:34s} fwd {t_f:7.2f} ms   fwd+bwd {t_b:7.2f} ms")
