"""Tensor-parallel guidance sharding (parallel/tp.py) over the virtual mesh.

The TP axis is pure GSPMD annotation — correctness must be bit-for-bit-ish
(reduction-order tolerance) against the replicated path, which is what
these tests assert.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dreamwaltz_g_tpu import tests_support as ts
from dreamwaltz_g_tpu.configs import RenderConfig
from dreamwaltz_g_tpu.data.camera import make_camera_batch
from dreamwaltz_g_tpu.parallel.dp import (
    make_avatar_sds_step_dp,
    make_nerf_sds_step_dp,
)
from dreamwaltz_g_tpu.parallel.mesh import make_mesh_2d
from dreamwaltz_g_tpu.parallel.tp import (
    guidance_pspecs,
    guidance_shardings,
    shard_guidance_params,
)
from dreamwaltz_g_tpu.training.gs_trainer import init_avatar_train_state
from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer

# heavyweight e2e module: excluded from the fast profile (pytest.ini)
import pytest  # noqa: E402
pytestmark = pytest.mark.slow


def test_tp_specs_follow_megatron_rules():
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
    specs = guidance_pspecs(gparams)
    u = specs.unet["params"]
    blk = u["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]
    assert blk["attn1"]["to_q"]["kernel"] == jax.sharding.PartitionSpec(
        None, "model")
    assert blk["attn2"]["to_out_0"]["kernel"] == jax.sharding.PartitionSpec(
        "model", None)
    assert blk["attn2"]["to_out_0"]["bias"] == jax.sharding.PartitionSpec()
    assert blk["ff"]["net_0_proj"]["kernel"] == jax.sharding.PartitionSpec(
        None, "model")
    assert blk["ff"]["net_0_proj"]["bias"] == jax.sharding.PartitionSpec(
        "model")
    assert blk["ff"]["net_2"]["kernel"] == jax.sharding.PartitionSpec(
        "model", None)
    # convs / norms / vae replicated
    assert u["conv_in"]["kernel"] == jax.sharding.PartitionSpec()
    flat_vae = jax.tree_util.tree_leaves(
        specs.vae, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    assert all(s == jax.sharding.PartitionSpec() for s in flat_vae)


def test_tp_unet_forward_matches_replicated():
    """UNet forward with Megatron-sharded weights == replicated forward."""
    mesh = make_mesh_2d(dp=1, tp=2)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
    unet = guidance.unet
    D = unet.cfg.cross_attention_dim
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.asarray([300, 301], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, D))

    ref = unet.apply(gparams.unet, lat, t, ctx)

    sharded = shard_guidance_params(gparams, mesh)
    with mesh:
        out = jax.jit(unet.apply)(sharded.unet, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_avatar_dp_tp_step_equals_single_view_step():
    """(data=4, model=2) DP x TP avatar step with 4 identical views ==
    the B=1 single-device step — catches both a wrong grad-psum and any
    TP resharding bug in one assert."""
    from dreamwaltz_g_tpu.training.gs_trainer import make_avatar_sds_step

    mesh = make_mesh_2d(dp=4, tp=2)
    B = 4
    H = W = 24
    setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
    tx = build_avatar_optimizer(RenderConfig(), max_steps=10)
    tstate = init_avatar_train_state(setup.state, tx)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))

    cam1 = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    D = guidance.unet.cfg.cross_attention_dim
    rng = np.random.default_rng(0)
    txt1 = jnp.asarray(rng.normal(size=(1, 4, D)), jnp.float32)
    unc1 = jnp.zeros((1, 4, D))
    t1 = jnp.full((1,), 400, jnp.int32)
    key = jax.random.PRNGKey(42)
    bg1 = jnp.zeros((H, W, 3))

    rk = dict(tile_size=8, capacity=64, chunk=32, max_tiles_per_gaussian=8)
    single = make_avatar_sds_step(setup.model, guidance, tx, H, W, **rk)
    ref_state, ref_m = single(tstate, gparams, setup.observed,
                              cam1.extrinsic[0], cam1.intrinsics[0],
                              cam1.tanfov[0], bg1, txt1, unc1, t1, key)

    def rep(x, n=B):
        return jnp.broadcast_to(x, (n,) + x.shape[1:])

    keys = jnp.broadcast_to(jax.random.key_data(key), (B, 2))
    step = make_avatar_sds_step_dp(
        setup.model, guidance, tx, mesh, H, W, **rk,
        gparams_shardings=guidance_shardings(gparams, mesh))
    gp_tp = shard_guidance_params(gparams, mesh)
    with mesh:
        tp_state, tp_m = step(
            tstate, gp_tp, setup.observed,
            jnp.broadcast_to(cam1.extrinsic, (B, 4, 4)),
            jnp.broadcast_to(cam1.intrinsics, (B, 3, 3)),
            jnp.broadcast_to(cam1.tanfov, (B,)),
            jnp.broadcast_to(bg1, (B, H, W, 3)),
            rep(txt1), rep(unc1), jnp.broadcast_to(t1, (B,)), keys)

    np.testing.assert_allclose(float(tp_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-4)
    for name in ("positions", "log_scales", "quats"):
        np.testing.assert_allclose(
            np.asarray(getattr(tp_state.avatar.params, name)),
            np.asarray(getattr(ref_state.avatar.params, name)),
            atol=5e-6, err_msg=name)


def test_trainer_cli_tp_knob(tmp_path):
    """`--parallel.tp 2` routes the Trainer onto a (data, model) mesh with
    TP-placed guidance weights and the step still trains."""
    from dreamwaltz_g_tpu.configs import parse_args
    from dreamwaltz_g_tpu.training.trainer import Trainer

    cfg = parse_args([
        "--stage", "gs", "--render.gs_type", "vanilla",
        "--log.debug", "true", "--log.exp_root", str(tmp_path),
        "--log.exp_name", "tp", "--optim.iters", "1",
        "--optim.batch_size", "4", "--parallel.tp", "2",
        "--render.n_gaussians", "64",
        "--data.train_w", "16", "--data.eval_h", "16",
        "--data.eval_w", "16", "--data.test_h", "16", "--data.test_w", "16",
        "--log.snapshot_interval", "0", "--log.evaluate_interval", "0",
        "--log.save_interval", "0",
    ])
    tr = Trainer(cfg)
    assert tr.mesh is not None and "model" in tr.mesh.axis_names
    assert tr.mesh.shape["model"] == 2 and tr.mesh.shape["data"] == 4
    # guidance weights actually live on the 2-D mesh
    k = tr.guidance_params.unet["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert not k.sharding.is_fully_replicated
    tr.train()
    assert tr.train_step == 1


def test_nerf_dp_tp_step_runs():
    """Stage-1 NeRF SDS under DP x TP: runs, stays finite, params move."""
    from dreamwaltz_g_tpu.configs import NeRFConfig
    from dreamwaltz_g_tpu.nerf.network import build_nerf
    from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
    from dreamwaltz_g_tpu.training.nerf_trainer import init_train_state
    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    mesh = make_mesh_2d(dp=2, tp=2)
    B = 2
    H = W = 16
    cfg = NeRFConfig(backbone="tiledgrid", num_levels=2, level_dim=2, base_resolution=4,
                     desired_resolution=16, log2_hashmap_size=8,
                     grid_size=16, num_steps=16, bound=1.0,
                     compact_steps=0, max_ray_batch=0)
    model = build_nerf(cfg, with_background=False)
    tx = build_nerf_optimizer(cfg, max_steps=100)
    state = init_train_state(model, tx, jax.random.PRNGKey(0))
    grid = init_occupancy(cfg.grid_size)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(1))
    D = guidance.unet.cfg.cross_attention_dim

    step = make_nerf_sds_step_dp(
        model, guidance, tx, mesh, H, W, cfg, num_steps=16,
        max_iteration=100,
        gparams_shardings=guidance_shardings(gparams, mesh))
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    gp_tp = shard_guidance_params(gparams, mesh)
    with mesh:
        state2, m = step(
            state, grid, gp_tp,
            jnp.broadcast_to(cam.c2w, (B, 4, 4)),
            jnp.broadcast_to(cam.intrinsics, (B, 3, 3)),
            jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), (B, 3)),
            jnp.zeros((B, 4, D)), jnp.zeros((B, 4, D)),
            jnp.full((B,), 300, jnp.int32),
            jax.random.split(jax.random.PRNGKey(2), B))
    assert np.isfinite(float(m["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        state2.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
