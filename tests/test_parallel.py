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
