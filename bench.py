"""Headline benchmark: full stage-2 SDS training-step throughput
(the first metric in BASELINE.json: "SDS iters/sec/chip").

Measures one avatar SDS step end-to-end — animate (GLBS + NeRF-field decode)
-> project -> bin -> Pallas blend fwd -> VAE encode -> SD1.5-sized
**ControlNet + UNet** CFG forward -> blend bwd (Pallas) -> optimizer — with
random weights at the real architecture sizes (512² render, 200k gaussians,
64² latents, full-size 256²x32 triplane avatar field, real SD1.5-ControlNet
encoder + a drawn 512² OpenPose condition canvas). The ControlNet matches
the reference's stage-2 step, which runs ControlNet+UNet twice per CFG pair
(reference: core/trainer.py:445-476, core/guidance/controlnet.py:83-114).
The step is the FUSED single-program builder (optim.fused_step default);
the avatar field is the triplane backbone — the TPU flagship config
(PERF.md: a reference-size 16L/2^19 hash field costs ~1.8 s/step in
backward scatter-adds on TPU; the factorized field is the documented
TPU-first design, carried from stage 1 via the nerf2gs handoff).

Reference budget: 15k stage-2 iters in "several hours" total on one L40S
(BASELINE.md) — roughly 2-3 SDS it/s (an ESTIMATE: the repo publishes no
it/s table; the JSON flags this). Prints one JSON line.
"""
import json
import time

import numpy as np


def _probe_devices(timeout_s: float = 180.0):
    """Fail fast instead of hanging forever when the remote-TPU tunnel is
    down: jax.devices() blocks indefinitely on a dead axon backend, so probe
    it in a daemon thread with a deadline."""
    import threading

    out = {}

    def probe():
        import jax

        out["devices"] = jax.devices()

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" not in out:
        import sys

        print(f"bench: no JAX devices after {timeout_s:.0f}s — the TPU "
              "tunnel appears down; refusing to print a stale/fake metric",
              file=sys.stderr)
        raise SystemExit(2)
    return out["devices"]


def main():
    import os

    import jax

    # persistent compile cache: warm runs (and the driver's run) skip the
    # ~20 min of remote compilation
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _probe_devices()
    import jax.numpy as jnp

    from dreamwaltz_g_tpu import tests_support as ts
    from dreamwaltz_g_tpu.configs import RenderConfig
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.guidance.sds import GuidanceParams, ScoreDistillation
    from dreamwaltz_g_tpu.guidance.unet import UNet2DCondition, sd15_unet_config
    from dreamwaltz_g_tpu.guidance.vae import AutoencoderKL, sd_vae_config
    from dreamwaltz_g_tpu.nerf.encoder import TriplaneConfig
    from dreamwaltz_g_tpu.training.gs_trainer import (
        init_avatar_train_state,
        make_avatar_sds_step,
    )
    from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer

    H = W = 512
    setup = ts.tiny_avatar_setup(capacity=200_000, n_points=180_000,
                                 num_vertices=2048,
                                 enc_cfg=TriplaneConfig(resolution=256,
                                                        feature_dim=32))

    # real-size frozen guidance, random weights, bf16 — incl. the pose
    # ControlNet the reference runs inside every stage-2 step
    from dreamwaltz_g_tpu.guidance.controlnet import ControlNet

    ucfg = sd15_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(sd_vae_config())
    cnet = ControlNet(ucfg)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 64, 64, 4))
    ctx = jnp.zeros((1, 77, 768))
    unet_p = unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx)
    vae_p = vae.init(key, image_size=512)
    cnet_p = cnet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx,
                       jnp.zeros((1, 512, 512, 3)))
    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    gparams = GuidanceParams(unet=cast(unet_p), vae=cast(vae_p),
                             controlnet=cast(cnet_p))
    # free the f32 init trees (~5.2 GB HBM): only the bf16 copies are used.
    # Keeping them alive OOMed the 16 GB chip once the stage-1 section added
    # its 2^19 hash state on top (round-4 regression).
    del unet_p, vae_p, cnet_p
    jax.block_until_ready(gparams)
    guidance = ScoreDistillation(unet=unet, vae=vae, controlnet=cnet,
                                 latent_size=64, guidance_scale=50.0)

    # a real 512² OpenPose condition canvas (the stage-2 condition modality,
    # reference: core/human/smpl_condition.py pose path) drawn from a simple
    # frontal stick figure — content doesn't affect timing, but the tensor
    # takes the full ControlNet cond-embedding path
    from dreamwaltz_g_tpu.human.openpose import draw_openpose_map

    body = np.full((128, 2), np.nan, np.float32)
    body[:18] = np.array(
        [[.50, .12], [.50, .25], [.42, .25], [.38, .38], [.36, .50],
         [.58, .25], [.62, .38], [.64, .50], [.45, .52], [.44, .72],
         [.44, .90], [.55, .52], [.56, .72], [.56, .90], [.48, .10],
         [.52, .10], [.45, .11], [.55, .11]], np.float32)
    canvas = draw_openpose_map([body], 512, 512, draw_hand_kp=False)
    cond = jnp.asarray(canvas, jnp.float32)[None] / 255.0
    cond = cond.astype(jnp.bfloat16)

    tx = build_avatar_optimizer(RenderConfig(), max_steps=5000)
    tstate = init_avatar_train_state(setup.state, tx)
    step = make_avatar_sds_step(setup.model, guidance, tx, H, W,
                                tile_size=32, capacity=512, chunk=128,
                                max_tiles_per_gaussian=4)

    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    txt = jnp.zeros((1, 77, 768), jnp.bfloat16)
    t = jnp.asarray([500], jnp.int32)
    bg = jnp.zeros((H, W, 3))

    k = jax.random.PRNGKey(1)
    # 3 warmup steps: the first two iterations re-specialize (weak-type /
    # optimizer-count promotion) before the executable cache stabilizes
    for w in range(3):
        k, kk = jax.random.split(k)
        tstate, m = step(tstate, gparams, setup.observed, cam.extrinsic[0],
                         cam.intrinsics[0], cam.tanfov[0], bg, txt, txt, t, kk,
                         cond_image=cond)
    jax.block_until_ready(m["loss"])

    def measure(run_async, run_sync, iters, sync_iters, label,
                retries=3, backoff_s=120.0):
        """Async-loop timing with a host-synced cross-check and bounded
        retries. The remote (axon) backend has two observed failure modes:
        (a) per-buffer readiness reported early — the async loop becomes a
        dispatch-only measurement (a 407 "it/s" reading); (b) a degraded
        service window where a trivial matmul takes ~90 s to sync. When
        async and synced timing disagree >3x, the window is bad — back off
        and re-measure rather than record garbage either way."""
        import sys

        for attempt in range(retries):
            t0 = time.time()
            run_async(iters)
            dt_a = (time.time() - t0) / iters
            t0 = time.time()
            run_sync(sync_iters)
            dt_s = (time.time() - t0) / sync_iters
            if dt_s <= 3.0 * dt_a:
                return dt_a
            print(f"bench[{label}] attempt {attempt + 1}: async "
                  f"{1 / dt_a:.1f} vs synced {1 / dt_s:.2f} it/s disagree "
                  "— remote service degraded, backing off "
                  f"{backoff_s:.0f}s", file=sys.stderr)
            time.sleep(backoff_s)
        print(f"bench[{label}]: service never stabilized; reporting the "
              "SYNCED number (overstates per-step cost)", file=sys.stderr)
        return dt_s

    def _run_async(n):
        nonlocal k, tstate, m
        for _ in range(n):
            k, kk = jax.random.split(k)
            tstate, m = step(tstate, gparams, setup.observed,
                             cam.extrinsic[0], cam.intrinsics[0],
                             cam.tanfov[0], bg, txt, txt, t, kk,
                             cond_image=cond)
        # block on the FULL output state, not just the loss
        jax.block_until_ready((tstate, m))

    def _run_sync(n):
        nonlocal k, tstate, m
        for _ in range(n):
            k, kk = jax.random.split(k)
            tstate, m = step(tstate, gparams, setup.observed,
                             cam.extrinsic[0], cam.intrinsics[0],
                             cam.tanfov[0], bg, txt, txt, t, kk,
                             cond_image=cond)
            _ = float(m["loss"])

    dt = measure(_run_async, _run_sync, 10, 3, "stage-2")

    # hardware utilization: XLA's own cost model for the compiled step
    # (VERDICT r4 #3 — "is this fast, or just faster than a guess?").
    # v5e peak: 197 TFLOP/s bf16 per chip (PERF.md names the source).
    V5E_PEAK_FLOPS = 197e12

    def _flops_of(jitted, *args, **kwargs):
        try:
            ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca.get("flops", 0.0))
            return f if f > 0 else None
        except Exception as e:  # cost model unavailable on this backend
            import sys

            print(f"bench: cost_analysis unavailable ({e!r})",
                  file=sys.stderr)
            return None

    k, kk = jax.random.split(k)
    step_flops = _flops_of(step, tstate, gparams, setup.observed,
                           cam.extrinsic[0], cam.intrinsics[0],
                           cam.tanfov[0], bg, txt, txt, t, kk,
                           cond_image=cond)
    mfu = (step_flops / dt / V5E_PEAK_FLOPS) if step_flops else None

    # release the stage-2 train state (200k-capacity avatar + opt slots)
    # before building the stage-1 programs — they never coexist in a real
    # run, and the bench must fit both sections on one 16 GB chip
    del tstate, m, step, setup
    import gc

    gc.collect()

    # stage-1 NeRF SDS throughput (secondary metric — the reference's
    # stage-1 trains a hash-grid NeRF through the same SD1.5 guidance;
    # 128^2 render, 96 marched samples/ray)
    from dreamwaltz_g_tpu.configs import NeRFConfig
    from dreamwaltz_g_tpu.nerf.network import build_nerf
    from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
    from dreamwaltz_g_tpu.training import nerf_trainer
    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    def bench_stage1(ncfg, n_iters=10):
        nonlocal k
        nerf = build_nerf(ncfg, with_background=False)
        ntx = build_nerf_optimizer(ncfg, 10000)
        nstate = nerf_trainer.init_train_state(nerf, ntx,
                                               jax.random.PRNGKey(2))
        grid = init_occupancy(64)
        nstep = nerf_trainer.make_nerf_sds_step(
            nerf, guidance, ntx, 128, 128, ncfg, num_steps=96,
            max_iteration=10000, ray_chunk=4096)
        ncam = make_camera_batch(2.5, 30.0, 80.0, 50.0, 128, 128)
        nstate_box = [nstate]

        def _nrun(n, sync):
            nonlocal k
            nm = None
            for _ in range(n):
                k, kk = jax.random.split(k)
                nstate_box[0], nm = nstep(
                    nstate_box[0], grid, gparams, ncam.c2w[0],
                    ncam.intrinsics[0], jnp.asarray([0.5, 0.5, 0.5]),
                    txt, txt, t, kk, cond_image=cond)
                if sync:
                    _ = float(nm["loss"])
            if not sync:
                jax.block_until_ready((nstate_box[0], nm))

        _nrun(3, False)  # warmup
        dt1 = measure(lambda n: _nrun(n, False), lambda n: _nrun(n, True),
                      n_iters, 2, "stage-1")
        nonlocal_k = jax.random.split(k)[1]
        fl = _flops_of(nstep, nstate_box[0], grid, gparams, ncam.c2w[0],
                       ncam.intrinsics[0], jnp.asarray([0.5, 0.5, 0.5]),
                       txt, txt, t, nonlocal_k, cond_image=cond)
        return dt1, fl

    # parity hash-grid backbone with occupied-sample compaction + bf16
    # table gathers (round-2 baseline, dense f32: 0.15 it/s)
    ndt, nflops = bench_stage1(NeRFConfig(backbone="tiledgrid", grid_dtype="bf16"))
    # TPU-first factorized-plane backbone (12 gathered rows/sample vs the
    # grid's 128 — see nerf/encoder.py TriplaneConfig)
    tdt, tflops = bench_stage1(NeRFConfig(backbone="triplane"))

    print(json.dumps({
        "metric": "sds_train_steps_per_sec",
        "value": round(1.0 / dt, 2),
        "unit": "SDS it/s (512^2, 200k gaussians, SD1.5-size "
                "ControlNet+UNet CFG, 1 chip)",
        "vs_baseline": round((1.0 / dt) / 2.5, 3),
        "baseline_note": "reference 2.5 it/s is ESTIMATED from "
                         "'several hours'/30k iters on one L40S "
                         "(no published it/s table)",
        "nerf_sds_steps_per_sec": round(1.0 / ndt, 2),
        "nerf_sds_unit": "stage-1 NeRF SDS it/s (128^2, 96-candidate "
                         "compacted march, hash grid 2^19 bf16, "
                         "ControlNet+UNet CFG)",
        "nerf_sds_triplane_steps_per_sec": round(1.0 / tdt, 2),
        # hardware utilization (XLA cost_analysis FLOPs / measured step
        # time / 197 TFLOP/s v5e bf16 peak) — None if the backend's cost
        # model is unavailable
        "flops_per_step": step_flops,
        "mfu_pct": round(100.0 * mfu, 2) if mfu else None,
        "stage1_hash_flops_per_step": nflops,
        "stage1_hash_mfu_pct": round(
            100.0 * nflops / ndt / V5E_PEAK_FLOPS, 2) if nflops else None,
        "stage1_triplane_flops_per_step": tflops,
        "stage1_triplane_mfu_pct": round(
            100.0 * tflops / tdt / V5E_PEAK_FLOPS, 2) if tflops else None,
    }))


if __name__ == "__main__":
    main()
