"""Re-score a saved compare_backbones state checkpoint through the
SHIPPED stage-1 -> stage-2 export path (including the isolated-cell
outlier filter, nerf/export.py:filter_isolated_cells).

The round-5 backbone-quality runs (.bbq_tri600 / .bbq_tri9600) were
trained and scored BEFORE the export filter existed; their saved
`--state-file` npz checkpoints hold the final train state, so the cloud
geometry metrics can be recomputed without retraining. Held-out mask /
depth MSE are unaffected by the export filter and carry over from the
original JSONL rows.

Usage:
  python scripts/rescore_backbone_state.py /tmp/bbq_tri9600.npz \
      --backbone triplane --iters 9600 [--min-neighbors 0 2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("state_file")
    ap.add_argument("--backbone", choices=["hash", "triplane"],
                    default="triplane")
    ap.add_argument("--iters", type=int, default=600,
                    help="the run's --iters (optimizer-state shapes only)")
    ap.add_argument("--min-neighbors", type=int, nargs="+", default=[0, 2])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from dreamwaltz_g_tpu.human.smplx_model import (
        default_params,
        make_synthetic_model,
        smplx_forward,
    )
    from dreamwaltz_g_tpu.nerf.export import export_point_cloud
    from dreamwaltz_g_tpu.nerf.network import NeRFConfig, build_nerf
    from dreamwaltz_g_tpu.ops.mesh import find_nearest_triangles, knn
    from dreamwaltz_g_tpu.training import nerf_trainer
    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    # the same synthetic body compare_backbones.py trains against
    smpl = make_synthetic_model(num_vertices=240, num_joints=6, num_betas=3,
                                num_expr=2)
    out = smplx_forward(smpl, default_params(smpl, 1))
    verts = jnp.asarray(out.vertices[0])
    faces = jnp.asarray(smpl.faces)

    ncfg = NeRFConfig(backbone="triplane") if args.backbone == "triplane" \
        else NeRFConfig(backbone="tiledgrid", grid_dtype="bf16")
    nerf = build_nerf(ncfg, with_background=False)
    ntx = build_nerf_optimizer(ncfg, args.iters)
    state0 = nerf_trainer.init_train_state(nerf, ntx, jax.random.PRNGKey(1))
    leaves, treedef = jax.tree_util.tree_flatten(state0)
    shapes = [x.shape for x in leaves]

    z = np.load(args.state_file)
    st_flat = [z[f"s{i}"] for i in range(len(leaves))]
    state = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x).reshape(s) for x, s in zip(st_flat, shapes)])

    for mn in args.min_neighbors:
        pc = export_point_cloud(nerf, state.params, resolution=96,
                                density_thresh=ncfg.density_thresh,
                                max_points=20000, min_neighbors=mn)
        cloud = jnp.asarray(pc.points)
        acc = cov = float("nan")
        if cloud.shape[0] > 0:
            near = find_nearest_triangles(cloud, verts, faces)
            acc = float(jnp.sqrt(jnp.mean(near.sq_dists)))
            d2, _ = knn(verts, cloud, 1)
            cov = float(jnp.sqrt(jnp.mean(d2)))
        print(json.dumps({
            "state_file": os.path.basename(args.state_file),
            "backbone": args.backbone, "min_neighbors": mn,
            "cloud_to_mesh_rms": round(acc, 5),
            "mesh_to_cloud_rms": round(cov, 5),
            "n_cloud_points": int(cloud.shape[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
