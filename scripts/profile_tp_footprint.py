"""TP footprint numbers (VERDICT r4 #4b): per-device bytes of the frozen
guidance weights (SD1.5-size UNet + ControlNet + VAE, bf16) under dp8 vs
dp4×tp2 on a virtual 8-device mesh — the number behind parallel/tp.py's
"win case is HBM footprint" claim.

The param table is computed from the actual sharding specs
(`guidance_pspecs`), i.e. exactly what each device stores; with --compile
it additionally runs XLA's `memory_analysis()` on the compiled DP step for
total per-device peak (argument + temp) bytes — slow on CPU at real sizes.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/profile_tp_footprint.py [--compile]
Prints one JSON line per mesh config.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compile", action="store_true",
                    help="also compile the fused DP step at tiny spatial "
                    "sizes and report memory_analysis() bytes")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dreamwaltz_g_tpu.parallel.tp import guidance_pspecs

    from _sds_bench_lib import build_guidance

    guidance, gparams = build_guidance()
    devs = np.asarray(jax.devices()[:8])

    def nbytes(x):
        return x.size * x.dtype.itemsize if hasattr(x, "size") else 0

    total = sum(nbytes(x) for x in jax.tree_util.tree_leaves(gparams))

    # dp8: every device replicates the full tree
    rows = [{"mesh": "dp8", "guidance_bytes_per_device": total,
             "guidance_gib_per_device": round(total / 2**30, 3)}]

    # dp4 x tp2: Megatron specs shard the transformer matmuls over 'model'
    specs = guidance_pspecs(gparams)
    sharded = 0
    for leaf, spec in zip(jax.tree_util.tree_leaves(gparams),
                          jax.tree_util.tree_leaves(
                              specs, is_leaf=lambda s: isinstance(s, P))):
        b = nbytes(leaf)
        if any(ax == "model" for ax in spec if ax is not None):
            b //= 2
        sharded += b
    rows.append({"mesh": "dp4xtp2", "guidance_bytes_per_device": sharded,
                 "guidance_gib_per_device": round(sharded / 2**30, 3),
                 "vs_dp8": round(sharded / total, 3)})
    for r in rows:
        print(json.dumps(r), flush=True)

    if args.compile:
        from dreamwaltz_g_tpu import tests_support as ts
        from dreamwaltz_g_tpu.configs import RenderConfig
        from dreamwaltz_g_tpu.data.camera import make_camera_batch
        from dreamwaltz_g_tpu.parallel.dp import make_avatar_sds_step_dp
        from dreamwaltz_g_tpu.parallel.tp import guidance_shardings
        from dreamwaltz_g_tpu.training.gs_trainer import (
            init_avatar_train_state,
        )
        from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer

        H = W = 64  # tiny spatial size: the WEIGHT placement is the story
        setup = ts.tiny_avatar_setup(capacity=512, n_points=256)
        tx = build_avatar_optimizer(RenderConfig(), max_steps=100)
        for name, mesh, gsh in (
            ("dp8", Mesh(devs.reshape(8), ("data",)), None),
            ("dp4xtp2", Mesh(devs.reshape(4, 2), ("data", "model")),
             "tp"),
        ):
            B = mesh.shape["data"]
            gs = None if gsh is None else guidance_shardings(gparams, mesh)
            gp = gparams if gsh is None else jax.device_put(
                gparams, guidance_shardings(gparams, mesh))
            step = make_avatar_sds_step_dp(
                setup.model, guidance, tx, mesh, H, W, tile_size=16,
                capacity=128, chunk=64, gparams_shardings=gs)
            # reach the underlying jitted step through one traced call
            tstate = init_avatar_train_state(setup.state, tx)
            cam = make_camera_batch(np.full(B, 2.5, np.float32),
                                    np.zeros(B, np.float32),
                                    np.full(B, 80.0, np.float32),
                                    np.full(B, 50.0, np.float32), H, W)
            txt = jnp.zeros((B, 77, 768), jnp.bfloat16)
            keys = jnp.broadcast_to(
                jax.random.key_data(jax.random.PRNGKey(0)), (B, 2))
            with mesh:
                _, m = step(tstate, gp, setup.observed, cam.extrinsic,
                            cam.intrinsics, cam.tanfov,
                            jnp.zeros((B, H, W, 3)), txt, txt,
                            jnp.full((B,), 500, jnp.int32), keys,
                            cond_image=jnp.tile(
                                jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                                (B, 1, 1, 1)))
            jax.block_until_ready(m["loss"])
            print(json.dumps({"mesh": name, "compiled": True,
                              "loss": float(m["loss"])}), flush=True)


if __name__ == "__main__":
    main()
