"""Data-parallel training over the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu import tests_support as ts
from dreamwaltz_g_tpu.configs import RenderConfig
from dreamwaltz_g_tpu.data.camera import make_camera_batch
from dreamwaltz_g_tpu.parallel.dp import make_avatar_sds_step_dp
from dreamwaltz_g_tpu.parallel.mesh import (
    batch_sharding,
    local_batch_size,
    make_mesh,
    replicate,
    shard_batch,
)
from dreamwaltz_g_tpu.training.gs_trainer import init_avatar_train_state
from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer


def test_mesh_helpers():
    mesh = make_mesh(dp=8)
    assert mesh.shape["data"] == 8
    assert local_batch_size(16, mesh) == 2
    x = jnp.arange(16.0).reshape(8, 2)
    xs = shard_batch(x, mesh)
    assert xs.sharding.is_fully_replicated is False
    xr = replicate(x, mesh)
    assert xr.sharding.is_fully_replicated


def test_dp_step_runs_and_reduces():
    mesh = make_mesh(dp=8)
    B = 8
    H = W = 24
    setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
    tx = build_avatar_optimizer(RenderConfig(), max_steps=10)
    tstate = init_avatar_train_state(setup.state, tx)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))

    cam = make_camera_batch(
        [2.5] * B, list(np.linspace(0, 360, B, endpoint=False)),
        [80.0] * B, [50.0] * B, H, W)
    D = guidance.unet.cfg.cross_attention_dim
    txt = jnp.zeros((B, 4, D))
    t = jnp.full((B,), 400, jnp.int32)
    bg = jnp.zeros((B, H, W, 3))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    step = make_avatar_sds_step_dp(setup.model, guidance, tx, mesh, H, W,
                                   tile_size=8, capacity=64, chunk=32)
    with mesh:
        ts2, m = step(tstate, gparams, setup.observed, cam.extrinsic,
                      cam.intrinsics, cam.tanfov, bg, txt, txt, t, keys)
        loss = float(m["loss"])
    assert np.isfinite(loss)
    assert int(ts2.step) == 1
    # replicated output state
    leaves = jax.tree_util.tree_leaves(ts2.avatar.params)
    assert all(l.sharding.is_fully_replicated for l in leaves
               if hasattr(l, "sharding"))
    # params actually moved
    assert not np.allclose(np.asarray(ts2.avatar.params.positions),
                           np.asarray(tstate.avatar.params.positions))


def test_dp_step_honors_guidance_scale():
    """The annealed CFG scale reaches the DP step as a device scalar and
    changes the gradient (reference: get_guidance_scale, basic.py:404-418)."""
    mesh = make_mesh(dp=8)
    B = 8
    H = W = 24
    setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
    tx = build_avatar_optimizer(RenderConfig(), max_steps=10)
    tstate = init_avatar_train_state(setup.state, tx)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))

    cam = make_camera_batch(
        [2.5] * B, list(np.linspace(0, 360, B, endpoint=False)),
        [80.0] * B, [50.0] * B, H, W)
    D = guidance.unet.cfg.cross_attention_dim
    txt = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 4, D)), jnp.float32)
    unc = jnp.zeros((B, 4, D))
    t = jnp.full((B,), 400, jnp.int32)
    bg = jnp.zeros((B, H, W, 3))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    step = make_avatar_sds_step_dp(setup.model, guidance, tx, mesh, H, W,
                                   tile_size=8, capacity=64, chunk=32)
    with mesh:
        args = (tstate, gparams, setup.observed, cam.extrinsic,
                cam.intrinsics, cam.tanfov, bg, txt, unc, t, keys)
        _, m_lo = step(*args, guidance_scale=0.0)
        _, m_hi = step(*args, guidance_scale=100.0)
    assert not np.isclose(float(m_lo["loss"]), float(m_hi["loss"])), \
        "guidance_scale had no effect on the DP step"


def test_sharded_render_matches_single_device():
    """Gaussian-cloud-sharded rasterization (SURVEY §7.10 second lever):
    project N/D per chip -> all_gather splats -> blend per row-block;
    must match the unsharded render."""
    from dreamwaltz_g_tpu.ops import rasterize as R
    from dreamwaltz_g_tpu.parallel.shard_render import make_sharded_render

    mesh = make_mesh(dp=8)
    H = W = 64
    rng = np.random.default_rng(0)
    N = 300
    positions = jnp.asarray(rng.normal(size=(N, 3)) * 0.3, jnp.float32)
    quats = jnp.zeros((N, 4)).at[:, 0].set(1.0)
    scales = jnp.full((N, 3), 0.02)
    opacities = jnp.asarray(rng.uniform(0.3, 0.9, N), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    alive = jnp.ones((N,), bool)
    cam = make_camera_batch(2.0, 10.0, 80.0, 50.0, H, W)
    bg = jnp.full((H, W, 3), 0.25)

    # unsharded reference (same eval kernel path)
    cov3d = R.covariance3d(quats, scales)
    g2d = R.project_gaussians(positions, cov3d, opacities, colors,
                              cam.extrinsic[0], cam.intrinsics[0], H, W,
                              tanfov=cam.tanfov[0], alive=alive)
    ref = R.rasterize_projected(g2d, H, W, tile_size=16, capacity=512,
                                chunk=64, max_tiles_per_gaussian=16,
                                pallas_mode="eval")
    ref_img = ref.image + (1.0 - ref.alpha)[..., None] * bg

    render = make_sharded_render(mesh, H, W, tile_size=16, capacity=512,
                                 chunk=64, max_tiles_per_gaussian=16)
    img, alpha, depth = render(positions, quats, scales, opacities, colors,
                               alive, cam.extrinsic[0], cam.intrinsics[0],
                               cam.tanfov[0], bg)
    assert img.shape == (H, W, 3)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               atol=2e-3)


def test_dp_per_view_poses():
    """per_view_poses: each DP view renders its own pose draw
    (dp.py per_view_poses; VERDICT r1 weak #8)."""
    mesh = make_mesh(dp=8)
    setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
    tx = build_avatar_optimizer(RenderConfig(), max_steps=50)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
    B = 8
    H = W = 24
    cams = [make_camera_batch(2.5, float(a), 80.0, 60.0, H, W)
            for a in np.linspace(0, 315, B)]
    cam = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, 0)
        if hasattr(xs[0], "ndim") and xs[0].ndim else xs[0], *cams)
    D = guidance.unet.cfg.cross_attention_dim
    txt = jnp.zeros((B, 4, D))
    t = jnp.full((B,), 400, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    bg = jnp.zeros((B, H, W, 3))
    # stack B independent poses (B, ...) on the SMPLXParams leaves
    from dreamwaltz_g_tpu.human.smplx_model import default_params
    poses = []
    rng = np.random.default_rng(3)
    for i in range(B):
        p = default_params(setup.model.smpl, 1)
        p = p._replace(global_orient=jnp.asarray(
            [[0.0, rng.uniform(-1, 1), 0.0]], jnp.float32))
        poses.append(p)
    obs = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *poses)

    step = make_avatar_sds_step_dp(
        setup.model, guidance, tx, mesh, H, W, tile_size=8, capacity=64,
        chunk=32, per_view_poses=True)
    tstate = init_avatar_train_state(setup.state, tx)
    t2, m = step(tstate, gparams, obs, cam.extrinsic, cam.intrinsics,
                 cam.tanfov, bg, txt, txt, t, keys)
    assert np.isfinite(float(m["loss"]))
    assert float(jnp.abs(t2.avatar.params.positions
                         - tstate.avatar.params.positions).max()) > 0
