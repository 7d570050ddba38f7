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
        # Compile the guidance CFG forward (the weights ARE the story —
        # the avatar/render half of the step is replicated identically in
        # both meshes) and report XLA's memory_analysis() per-device bytes
        from dreamwaltz_g_tpu.parallel.tp import guidance_shardings

        def cfg_forward(gp, lat, txt, t):
            eps = guidance.unet.apply(
                gp.unet, jnp.concatenate([lat, lat], 0),
                jnp.concatenate([t, t], 0),
                jnp.concatenate([txt, txt], 0))
            return eps

        for name, mesh in (
            ("dp8", Mesh(devs.reshape(8), ("data",))),
            ("dp4xtp2", Mesh(devs.reshape(4, 2), ("data", "model"))),
        ):
            B = mesh.shape["data"]
            rep = NamedSharding(mesh, P())
            shd = NamedSharding(mesh, P("data"))
            gsh = guidance_shardings(gparams, mesh) \
                if "model" in mesh.shape else jax.tree_util.tree_map(
                    lambda _: rep, gparams)
            jf = jax.jit(cfg_forward, in_shardings=(gsh, shd, shd, shd))
            lat = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
            txt = jnp.zeros((B, 77, 768), jnp.bfloat16)
            tt = jnp.full((B,), 500, jnp.int32)
            try:
                comp = jf.lower(gparams, lat, txt, tt).compile()
                ma = comp.memory_analysis()
                row = {"mesh": name, "compiled": True}
                for attr in ("argument_size_in_bytes",
                             "output_size_in_bytes",
                             "temp_size_in_bytes",
                             "generated_code_size_in_bytes"):
                    v = getattr(ma, attr, None)
                    if v is not None:
                        row[attr] = int(v)
                tot = sum(row.get(a, 0) for a in
                          ("argument_size_in_bytes", "temp_size_in_bytes",
                           "output_size_in_bytes"))
                row["peak_gib_per_device"] = round(tot / 2**30, 3)
                print(json.dumps(row), flush=True)
            except Exception as e:
                print(json.dumps({"mesh": name, "compiled": False,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
