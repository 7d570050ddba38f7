"""Measure the fused stage-2 SDS step with the HASH-FIELD avatar — the
shipped `--nerf.backbone tiledgrid` default at reference capacity
(16L/2^19, reference core/nerf/gridencoder/grid.py:100) — so PERF.md's
two-stage wall-clock table can carry a measured hash-row stage-2 cell
instead of silently reusing the triplane step time (VERDICT r4 #2).

Identical step composition to bench.py's headline (animate -> rasterize ->
VAE -> ControlNet+UNet CFG -> backward -> optimizer, 512², 200k gaussians);
the ONLY change is the avatar's NeRF-field backbone. profile_animate
predicts the grid decode backward alone at ~1.8 s @200k points.

Usage: python scripts/profile_stage2_hash.py [--iters N] [--bf16]
Prints one JSON line per backbone config.
"""
import argparse
import json

from _sds_bench_lib import build_guidance, init_jax_cache, pose_canvas, timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--f32-table", action="store_true",
                    help="also measure the f32-table variant")
    args = ap.parse_args()

    init_jax_cache()
    import jax
    import jax.numpy as jnp

    from dreamwaltz_g_tpu import tests_support as ts
    from dreamwaltz_g_tpu.configs import NeRFConfig, RenderConfig
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.nerf.encoder import enc_cfg_from_nerf
    from dreamwaltz_g_tpu.training.gs_trainer import (
        init_avatar_train_state,
        make_avatar_sds_step,
    )
    from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer

    H = W = 512
    guidance, gparams = build_guidance()
    cond = pose_canvas(512)
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    txt = jnp.zeros((1, 77, 768), jnp.bfloat16)
    t = jnp.asarray([500], jnp.int32)
    bg = jnp.zeros((H, W, 3))

    def run(label, ncfg):
        enc = enc_cfg_from_nerf(ncfg)
        setup = ts.tiny_avatar_setup(capacity=200_000, n_points=180_000,
                                     num_vertices=2048, enc_cfg=enc)
        tx = build_avatar_optimizer(RenderConfig(), max_steps=5000)
        tstate = init_avatar_train_state(setup.state, tx)
        step = make_avatar_sds_step(setup.model, guidance, tx, H, W,
                                    tile_size=32, capacity=512, chunk=128,
                                    max_tiles_per_gaussian=4)
        box = [tstate, jax.random.PRNGKey(1)]

        def one():
            box[1], kk = jax.random.split(box[1])
            box[0], m = step(box[0], gparams, setup.observed,
                             cam.extrinsic[0], cam.intrinsics[0],
                             cam.tanfov[0], bg, txt, txt, t, kk,
                             cond_image=cond)
            return (box[0], m)

        dt_a, dt_s = timed(one, args.iters)
        row = {"config": label, "s_per_it": round(dt_a, 3),
               "it_per_s": round(1.0 / dt_a, 3),
               "s_per_it_synced": round(dt_s, 3),
               "stage2_15k_min": round(dt_a * 15000 / 60.0, 1)}
        print(json.dumps(row), flush=True)
        del setup, tstate, step, box
        import gc

        gc.collect()
        return row

    # the shipped default: tiledgrid 16L/2^19, bf16 table gathers
    run("hash_tiledgrid_2^19_bf16",
        NeRFConfig(backbone="tiledgrid", grid_dtype="bf16"))
    if args.f32_table:
        run("hash_tiledgrid_2^19_f32", NeRFConfig(backbone="tiledgrid"))


if __name__ == "__main__":
    main()
