"""Measured multi-view scaling on ONE chip (VERDICT r4 #4): run the fused
DP step builders (parallel/dp.py) on a 1-device mesh at B=1/2/4 views and
record the per-view marginal cost. The v5e-8 wall-clock column divides
single-view step time by 8 under SDS view-averaging; a measured B-view
step bounds the collective-free part of that claim — per-view marginal
cost ≤ 1x the B=1 step implies the ÷8 arithmetic is conservative.

Covers both benched steps:
* stage-2 avatar SDS (512², 200k gaussians, triplane field) — the headline,
* stage-1 NeRF SDS (128², triplane backbone) — the <1h-target config.

Usage: python scripts/profile_multiview.py [--iters N] [--stage 1|2|both]
Prints one JSON line per (stage, B).
"""
import argparse
import json

from _sds_bench_lib import build_guidance, init_jax_cache, pose_canvas, timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stage", choices=["1", "2", "both"], default="both")
    ap.add_argument("--views", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    init_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from dreamwaltz_g_tpu import tests_support as ts
    from dreamwaltz_g_tpu.configs import NeRFConfig, RenderConfig
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.nerf.encoder import TriplaneConfig
    from dreamwaltz_g_tpu.parallel.dp import (
        make_avatar_sds_step_dp,
        make_nerf_sds_step_dp,
    )
    from dreamwaltz_g_tpu.training.gs_trainer import init_avatar_train_state
    from dreamwaltz_g_tpu.training.optim import (
        build_avatar_optimizer,
        build_nerf_optimizer,
    )

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    guidance, gparams = build_guidance()
    cond1 = pose_canvas(512)

    def cams(B, H, W):
        return make_camera_batch(
            np.full(B, 2.5, np.float32),
            np.linspace(0.0, 270.0, B).astype(np.float32),
            np.full(B, 80.0, np.float32),
            np.full(B, 50.0, np.float32), H, W)

    rows = []

    if args.stage in ("2", "both"):
        H = W = 512
        setup = ts.tiny_avatar_setup(capacity=200_000, n_points=180_000,
                                     num_vertices=2048,
                                     enc_cfg=TriplaneConfig(resolution=256,
                                                            feature_dim=32))
        tx = build_avatar_optimizer(RenderConfig(), max_steps=5000)
        base = None
        for B in args.views:
            tstate = init_avatar_train_state(setup.state, tx)
            step = make_avatar_sds_step_dp(
                setup.model, guidance, tx, mesh, H, W,
                tile_size=32, capacity=512, chunk=128,
                max_tiles_per_gaussian=4)
            cam = cams(B, H, W)
            txt = jnp.zeros((B, 77, 768), jnp.bfloat16)
            t = jnp.full((B,), 500, jnp.int32)
            bg = jnp.zeros((B, H, W, 3))
            cond = jnp.tile(cond1, (B, 1, 1, 1))
            box = [tstate, jax.random.PRNGKey(1)]

            def one():
                box[1], kk = jax.random.split(box[1])
                keys = jax.random.split(kk, B)
                box[0], m = step(box[0], gparams, setup.observed,
                                 cam.extrinsic, cam.intrinsics, cam.tanfov,
                                 bg, txt, txt, t, keys, cond_image=cond)
                return (box[0], m)

            dt_a, dt_s = timed(one, args.iters)
            base = base or dt_a
            rows.append({"stage": 2, "views": B,
                         "s_per_step": round(dt_a, 3),
                         "s_per_step_synced": round(dt_s, 3),
                         "s_per_view": round(dt_a / B, 3),
                         "marginal_vs_b1": round(dt_a / (B * base), 3)})
            print(json.dumps(rows[-1]), flush=True)
            del tstate, step, box
        del setup
        import gc

        gc.collect()

    if args.stage in ("1", "both"):
        from dreamwaltz_g_tpu.nerf.network import build_nerf
        from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
        from dreamwaltz_g_tpu.training import nerf_trainer

        H = W = 128
        ncfg = NeRFConfig(backbone="triplane")
        nerf = build_nerf(ncfg, with_background=False)
        ntx = build_nerf_optimizer(ncfg, 10000)
        grid = init_occupancy(64)
        base = None
        for B in args.views:
            nstate = nerf_trainer.init_train_state(nerf, ntx,
                                                   jax.random.PRNGKey(2))
            step = make_nerf_sds_step_dp(
                nerf, guidance, ntx, mesh, H, W, ncfg, num_steps=96,
                max_iteration=10000, ray_chunk=4096)
            cam = cams(B, H, W)
            txt = jnp.zeros((B, 77, 768), jnp.bfloat16)
            t = jnp.full((B,), 500, jnp.int32)
            bgc = jnp.tile(jnp.asarray([0.5, 0.5, 0.5])[None], (B, 1))
            cond = jnp.tile(cond1, (B, 1, 1, 1))
            box = [nstate, jax.random.PRNGKey(3)]

            def one():
                box[1], kk = jax.random.split(box[1])
                keys = jax.random.split(kk, B)
                box[0], m = step(box[0], grid, gparams, cam.c2w,
                                 cam.intrinsics, bgc, txt, txt, t, keys,
                                 cond_image=cond)
                return (box[0], m)

            dt_a, dt_s = timed(one, args.iters)
            base = base or dt_a
            rows.append({"stage": 1, "views": B,
                         "s_per_step": round(dt_a, 3),
                         "s_per_step_synced": round(dt_s, 3),
                         "s_per_view": round(dt_a / B, 3),
                         "marginal_vs_b1": round(dt_a / (B * base), 3)})
            print(json.dumps(rows[-1]), flush=True)
            del nstate, step, box


if __name__ == "__main__":
    main()
