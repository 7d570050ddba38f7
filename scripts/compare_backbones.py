"""Stage-1 backbone quality comparison: hash grid (reference parity,
2^19 table) vs triplane (the TPU-first factorized field).

VERDICT r3 #2b: the triplane backbone meets the <1h v5e-8 wall-clock target
but had no quality evidence. SDS needs real SD weights, which this container
cannot fetch — the strongest runnable proxy is the NeRF PRETRAIN objective
(reference: Trainer.pretrain, core/trainer.py:1152-1240): depth/mask MSE
against rendered SMPL-X geometry. It is a REAL convergence target (fit the
body's visual hull), exercises the same field + marcher the SDS stage
trains, and needs no licensed assets (synthetic debug body).

Both backbones train the same budget on the same camera stream, then are
scored on
* held-out-view mask / depth MSE (20 fixed eval cameras),
* exported-point-cloud geometry: cloud->mesh RMS distance (accuracy) and
  mesh->cloud RMS distance (coverage).

Prints one JSON line per backbone plus a verdict line. Results are recorded
in PERF.md ("Backbone quality" section).

Usage:  python scripts/compare_backbones.py [--iters N] [--res H] [--cpu]
        python scripts/compare_backbones.py --backbone hash --out h.jsonl
        python scripts/compare_backbones.py --verdict-from h.jsonl t.jsonl

`--backbone` runs one backbone per process — the remote TPU worker has
crashed mid-comparison (UNAVAILABLE kernel fault), and per-process runs
mean a fault only loses one backbone's training, not both.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=60,
                    help="iterations per device dispatch; one unbounded "
                    "600-iter execution trips the remote service's "
                    "per-execution limit (observed UNAVAILABLE fault)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None, help="write JSON rows here too")
    ap.add_argument("--backbone", choices=["hash", "triplane", "both"],
                    default="both")
    ap.add_argument("--state-file", default=None,
                    help="npz path for per-chunk state checkpoints; with "
                    "--resume, training restarts from the last completed "
                    "chunk after a TPU-worker crash (the round-4/5 "
                    "UNAVAILABLE fault kills the in-process backend, so "
                    "recovery = process restart + this file)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--verdict-from", nargs=2, metavar="JSONL", default=None,
                    help="skip training; compute the verdict from two row "
                    "files written by earlier --backbone runs (hash first)")
    args = ap.parse_args()

    if args.verdict_from:
        rows = []
        for path in args.verdict_from:
            with open(path) as f:
                rows += [json.loads(ln) for ln in f if ln.strip()]
        rows = [r for r in rows if "backbone" in r]
        h = next(r for r in rows if r["backbone"].startswith("hash"))
        t = next(r for r in rows if r["backbone"] == "triplane")
        print(json.dumps(_verdict(h, t)), flush=True)
        return

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.human.smplx_model import (
        default_params,
        make_synthetic_model,
        smplx_forward,
    )
    from dreamwaltz_g_tpu.nerf.export import export_point_cloud
    from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
    from dreamwaltz_g_tpu.nerf.network import NeRFConfig, build_nerf
    from dreamwaltz_g_tpu.ops.mesh import find_nearest_triangles, knn
    from dreamwaltz_g_tpu.ops.raycast import rasterize_mesh
    from dreamwaltz_g_tpu.training import nerf_trainer
    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    H = W = args.res
    smpl = make_synthetic_model(num_vertices=240, num_joints=6, num_betas=3,
                                num_expr=2)
    out = smplx_forward(smpl, default_params(smpl, 1))
    verts = jnp.asarray(out.vertices[0])
    faces = jnp.asarray(smpl.faces)

    rng = np.random.default_rng(0)

    # fixed eval views (held out from the training stream's random draws);
    # their raw metric depth + mask are the pretrain target (reference:
    # depth_raw conditions, trainer.py:1242-1279)
    ev = [(a, e) for a in range(0, 360, 72) for e in (15.0, 45.0,
                                                      75.0, -15.0)]
    eval_cams = make_camera_batch(
        np.full(len(ev), 2.0, np.float32),
        np.asarray([a for a, _ in ev], np.float32),
        np.asarray([e for _, e in ev], np.float32),
        np.full(len(ev), 50.0, np.float32), H, W)

    # the whole training-view stream is drawn and ground-truthed up front
    # in batched/jitted calls — the naive per-iteration host loop was
    # tunnel-latency-bound on the remote TPU (~100 eager dispatches/iter)
    azims = rng.uniform(0, 360, args.iters).astype(np.float32)
    elevs = rng.uniform(-30, 80, args.iters).astype(np.float32)
    train_cams = make_camera_batch(
        np.full(args.iters, 2.0, np.float32), azims, elevs,
        np.full(args.iters, 50.0, np.float32), H, W)

    @jax.jit
    def gt_batch(extr, intr):
        def one(a):
            e, K = a
            r = rasterize_mesh(verts, faces, e, K, H, W)
            m = jnp.asarray(r.mask)
            return jnp.where(m, jnp.asarray(r.depth), 0.0), m

        return jax.lax.map(one, (extr, intr))

    train_depth, train_mask = gt_batch(train_cams.extrinsic,
                                       train_cams.intrinsics)
    eval_depth, eval_mask = gt_batch(eval_cams.extrinsic,
                                     eval_cams.intrinsics)
    jax.block_until_ready((train_mask, eval_mask))

    from dreamwaltz_g_tpu.nerf.renderer import update_occupancy

    def run(name, ncfg):
        nerf = build_nerf(ncfg, with_background=False)
        ntx = build_nerf_optimizer(ncfg, args.iters)
        state = nerf_trainer.init_train_state(nerf, ntx, jax.random.PRNGKey(1))
        grid = init_occupancy(64)
        step = nerf_trainer.make_pretrain_step(nerf, ntx, H, W, num_steps=96,
                                               compact_steps=0)
        keys = jax.random.split(jax.random.PRNGKey(2), args.iters)

        # big per-iteration arrays ride as ARGUMENTS — closure capture
        # would bake them into the MLIR as constants (25 MB program, which
        # the remote compile helper rejects). The train state crosses the
        # fori_loop boundary FLATTENED to 1-D leaves: the loop-carry
        # canonical layout tiles (16, 2^19, 2) hash tables T(8,128),
        # padding the minor dim 64x (3 x 4 GB of HLO temp -> OOM).
        _leaves, _treedef = jax.tree_util.tree_flatten(state)
        _shapes = [x.shape for x in _leaves]

        def flat(tree):
            return [x.reshape(-1) for x in jax.tree_util.tree_leaves(tree)]

        def unflat(leaves_1d):
            return jax.tree_util.tree_unflatten(
                _treedef, [x.reshape(s) for x, s in zip(leaves_1d, _shapes)])

        # chunked dispatch: `--chunk` iterations per device execution, state
        # resident on device between dispatches. One unbounded 600-iter
        # execution died with UNAVAILABLE on the remote service (per-
        # execution time limit); bounded executions also let a transient
        # service fault kill only one chunk.
        CH = max(1, min(args.chunk, args.iters))
        n_chunks = -(-args.iters // CH)
        pad_to = n_chunks * CH

        def padded(x):
            reps = np.concatenate(
                [np.arange(args.iters), np.zeros(pad_to - args.iters, int)])
            return jnp.asarray(np.asarray(x)[reps]).reshape(
                (n_chunks, CH) + x.shape[1:])

        p_c2w = padded(train_cams.c2w)
        p_intr = padded(train_cams.intrinsics)
        p_depth = padded(train_depth)
        p_mask = padded(train_mask)
        p_keys = padded(keys)
        n_live = jnp.asarray(
            [min(args.iters - c * CH, CH) for c in range(n_chunks)],
            jnp.int32)

        @jax.jit
        def train_chunk(state_flat, grid0, base, live, c2w, intr, depths,
                        masks, ks):
            def body(i, carry):
                st_flat, gr = carry
                st = unflat(st_flat)
                gr = jax.lax.cond(
                    (base + i) % 16 == 0,
                    lambda g: update_occupancy(
                        g, nerf, st.params, ks[i],
                        density_thresh=ncfg.density_thresh),
                    lambda g: g, gr)
                st, _ = step(st, gr, c2w[i], intr[i], depths[i],
                             masks[i], ks[i])
                return (flat(st), gr)

            return jax.lax.fori_loop(0, live, body, (state_flat, grid0))

        # AOT-compile so train_seconds is pure execution (compile time on
        # the remote service would otherwise dominate the comparison)
        cargs0 = (flat(state), grid, jnp.int32(0), n_live[0], p_c2w[0],
                  p_intr[0], p_depth[0], p_mask[0], p_keys[0])
        compiled = train_chunk.lower(*cargs0).compile()
        st_flat, gr = flat(state), grid
        c0, train_s = 0, 0.0
        _gr_leaves, _gr_tree = jax.tree_util.tree_flatten(grid)
        if args.resume and args.state_file and os.path.exists(args.state_file):
            z = np.load(args.state_file)
            c0 = int(z["chunk"])
            train_s = float(z["train_seconds"])
            st_flat = [jnp.asarray(z[f"s{i}"]) for i in range(len(st_flat))]
            gr = jax.tree_util.tree_unflatten(
                _gr_tree, [jnp.asarray(z[f"g{i}"])
                           for i in range(len(_gr_leaves))])
            print(json.dumps({"resumed_at_chunk": c0,
                              "backbone": name}), flush=True)
        for c in range(c0, n_chunks):
            t0 = time.time()
            st_flat, gr = compiled(st_flat, gr, jnp.int32(c * CH), n_live[c],
                                   p_c2w[c], p_intr[c], p_depth[c],
                                   p_mask[c], p_keys[c])
            jax.block_until_ready(st_flat)
            train_s += time.time() - t0
            if args.state_file:
                # checkpoint OUTSIDE the timed window: a worker crash then
                # re-enters at chunk c+1 after a process restart
                payload = {"chunk": np.asarray(c + 1),
                           "train_seconds": np.asarray(train_s)}
                payload.update({f"s{i}": np.asarray(x)
                                for i, x in enumerate(st_flat)})
                payload.update({f"g{i}": np.asarray(x) for i, x in
                                enumerate(jax.tree_util.tree_leaves(gr))})
                tmp = args.state_file + ".tmp.npz"
                with open(tmp, "wb") as f:
                    np.savez(f, **payload)
                os.replace(tmp, args.state_file)
        state, grid = unflat(st_flat), gr

        # held-out-view losses (one dispatch; the step's metrics are read,
        # its optimizer update discarded)
        ekeys = jax.random.split(jax.random.PRNGKey(7), len(ev))

        @jax.jit
        def eval_all(st, gr):
            def one(j):
                _, m = step(st, gr, eval_cams.c2w[j],
                            eval_cams.intrinsics[j], eval_depth[j],
                            eval_mask[j], ekeys[j])
                return m["mask_loss"], m["depth_loss"]

            return jax.lax.map(one, jnp.arange(len(ev)))

        mloss, dloss = eval_all(state, grid)
        mmse = [float(x) for x in np.asarray(mloss)]
        dmse = [float(x) for x in np.asarray(dloss)]

        # geometry: exported cloud vs the SMPL-X mesh
        # scored through the SHIPPED stage-1->stage-2 export path, incl.
        # the isolated-cell outlier filter both trainer call sites apply
        pc = export_point_cloud(nerf, state.params, resolution=96,
                                density_thresh=ncfg.density_thresh,
                                max_points=20000,
                                min_neighbors=ncfg.export_min_neighbors)
        cloud = jnp.asarray(pc.points)
        acc = float("nan")
        cov = float("nan")
        if cloud.shape[0] > 0:
            near = find_nearest_triangles(cloud, verts, faces)
            acc = float(jnp.sqrt(jnp.mean(near.sq_dists)))
            # coverage: mesh vertices -> nearest cloud point
            d2, _ = knn(verts, cloud, 1)
            cov = float(jnp.sqrt(jnp.mean(d2)))
        row = {"backbone": name, "iters": args.iters, "res": H,
               "eval_mask_mse": round(float(np.mean(mmse)), 6),
               "eval_depth_mse": round(float(np.mean(dmse)), 6),
               "cloud_to_mesh_rms": round(acc, 5),
               "mesh_to_cloud_rms": round(cov, 5),
               "n_cloud_points": int(cloud.shape[0]),
               "train_seconds": round(train_s, 1)}
        print(json.dumps(row), flush=True)
        return row

    specs = {
        "hash": ("hash_2^19_bf16", NeRFConfig(backbone="tiledgrid", grid_dtype="bf16")),
        "triplane": ("triplane", NeRFConfig(backbone="triplane")),
    }
    wanted = ["hash", "triplane"] if args.backbone == "both" \
        else [args.backbone]
    rows = [run(*specs[k]) for k in wanted]
    if len(rows) == 2:
        rows.append(_verdict(rows[0], rows[1]))
        print(json.dumps(rows[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def _verdict(h, t):
    return {
        "verdict": "triplane_quality_vs_hash",
        "mask_mse_ratio": round(t["eval_mask_mse"]
                                / max(h["eval_mask_mse"], 1e-12), 3),
        "depth_mse_ratio": round(t["eval_depth_mse"]
                                 / max(h["eval_depth_mse"], 1e-12), 3),
        "cloud_to_mesh_ratio": round(t["cloud_to_mesh_rms"]
                                     / max(h["cloud_to_mesh_rms"], 1e-12), 3),
        "mesh_to_cloud_ratio": round(t["mesh_to_cloud_rms"]
                                     / max(h["mesh_to_cloud_rms"], 1e-12), 3),
        "speedup": round(h["train_seconds"] / max(t["train_seconds"], 1e-9),
                         2),
    }


if __name__ == "__main__":
    main()
