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

# heavyweight e2e module: excluded from the fast profile (pytest.ini)
pytestmark = pytest.mark.slow


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


def test_sharded_render_under_tile_saturation():
    """Per-tile entry counts above capacity: splats outside a chip's row
    block must not consume that block's tile capacity (ADVICE r2 #2 —
    phantom entries evicted genuine splats at scale)."""
    from dreamwaltz_g_tpu.ops import rasterize as R
    from dreamwaltz_g_tpu.parallel.shard_render import make_sharded_render

    mesh = make_mesh(dp=8)
    H = W = 64
    cap = 64
    rng = np.random.default_rng(1)
    N = 3000  # >> capacity entries per tile: dense small splats everywhere
    positions = jnp.asarray(rng.uniform(-0.6, 0.6, (N, 3)), jnp.float32)
    quats = jnp.zeros((N, 4)).at[:, 0].set(1.0)
    scales = jnp.full((N, 3), 0.015)
    opacities = jnp.asarray(rng.uniform(0.2, 0.95, N), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    alive = jnp.ones((N,), bool)
    cam = make_camera_batch(2.0, 25.0, 75.0, 50.0, H, W)
    bg = jnp.full((H, W, 3), 0.1)

    cov3d = R.covariance3d(quats, scales)
    g2d = R.project_gaussians(positions, cov3d, opacities, colors,
                              cam.extrinsic[0], cam.intrinsics[0], H, W,
                              tanfov=cam.tanfov[0], alive=alive)
    rk = dict(tile_size=8, capacity=cap, chunk=32, max_tiles_per_gaussian=8)
    ref = R.rasterize_projected(g2d, H, W, pallas_mode="eval", **rk)
    ref_img = ref.image + (1.0 - ref.alpha)[..., None] * bg

    render = make_sharded_render(mesh, H, W, **rk)
    img, alpha, _ = render(positions, quats, scales, opacities, colors,
                           alive, cam.extrinsic[0], cam.intrinsics[0],
                           cam.tanfov[0], bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               atol=3e-3)


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


def test_avatar_dp_step_equals_single_view_step():
    """VERDICT r2 #2: 8 identical views through the DP step must produce
    the same post-step params as the B=1 step — the test that catches a
    wrong psum (SDS mean over identical views == the single view)."""
    from dreamwaltz_g_tpu.training.gs_trainer import make_avatar_sds_step

    mesh = make_mesh(dp=8)
    B = 8
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
    gs = jnp.asarray(7.5, jnp.float32)
    pr = jnp.asarray(0.3, jnp.float32)

    rk = dict(tile_size=8, capacity=64, chunk=32, max_tiles_per_gaussian=8)
    single = make_avatar_sds_step(setup.model, guidance, tx, H, W, **rk)
    ref_state, ref_m = single(tstate, gparams, setup.observed,
                              cam1.extrinsic[0], cam1.intrinsics[0],
                              cam1.tanfov[0], bg1, txt1, unc1, t1, key,
                              guidance_scale=gs, progress=pr)

    # identical inputs replicated over the view axis
    def rep(x, n=B):
        return jnp.broadcast_to(x, (n,) + x.shape[1:]) \
            if x.ndim >= 1 else jnp.full((n,), x)

    keys = jnp.broadcast_to(jax.random.key_data(key), (B, 2))
    step = make_avatar_sds_step_dp(setup.model, guidance, tx, mesh, H, W,
                                   **rk)
    with mesh:
        dp_state, dp_m = step(
            tstate, gparams, setup.observed,
            jnp.broadcast_to(cam1.extrinsic, (B, 4, 4)),
            jnp.broadcast_to(cam1.intrinsics, (B, 3, 3)),
            jnp.broadcast_to(cam1.tanfov, (B,)),
            jnp.broadcast_to(bg1, (B, H, W, 3)),
            rep(txt1), rep(unc1), jnp.broadcast_to(t1, (B,)), keys,
            guidance_scale=gs, progress=pr)

    np.testing.assert_allclose(float(dp_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    for name in ("positions", "log_scales", "quats"):
        np.testing.assert_allclose(
            np.asarray(getattr(dp_state.avatar.params, name)),
            np.asarray(getattr(ref_state.avatar.params, name)),
            atol=1e-6, err_msg=name)
    # densification stats feed off the same per-view grads/radii
    np.testing.assert_allclose(np.asarray(dp_state.avatar.max_radii),
                               np.asarray(ref_state.avatar.max_radii),
                               atol=1e-5)


class TestNeRFDP:
    def _setup(self, **cfg_kw):
        from dreamwaltz_g_tpu.configs import NeRFConfig
        from dreamwaltz_g_tpu.nerf.network import build_nerf
        from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
        from dreamwaltz_g_tpu.training.nerf_trainer import init_train_state
        from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

        cfg = NeRFConfig(backbone="tiledgrid", num_levels=2, level_dim=2, base_resolution=4,
                         desired_resolution=16, log2_hashmap_size=8,
                         grid_size=16, num_steps=16, bound=1.0,
                         compact_steps=0, max_ray_batch=0, **cfg_kw)
        model = build_nerf(cfg, with_background=False)
        tx = build_nerf_optimizer(cfg, max_steps=100)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        grid = init_occupancy(cfg.grid_size)
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(1))
        return cfg, model, tx, state, grid, guidance, gparams

    def test_nerf_dp_step_runs_and_replicates(self):
        """Stage-1 DP: the NeRF SDS step shards views over the mesh
        (VERDICT r2 #1 — the stage-1 parallelism story)."""
        from dreamwaltz_g_tpu.parallel.dp import make_nerf_sds_step_dp

        cfg, model, tx, state, grid, guidance, gparams = self._setup()
        mesh = make_mesh(dp=8)
        B = 8
        H = W = 16
        cam = make_camera_batch(
            [2.0] * B, list(np.linspace(0, 360, B, endpoint=False)),
            [80.0] * B, [50.0] * B, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jnp.asarray(np.random.default_rng(2).normal(size=(B, 4, D)),
                          jnp.float32)
        t = jnp.full((B,), 300, jnp.int32)
        bg = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), (B, 3))
        keys = jax.random.split(jax.random.PRNGKey(3), B)

        step = make_nerf_sds_step_dp(model, guidance, tx, mesh, H, W, cfg,
                                     num_steps=cfg.num_steps)
        with mesh:
            s2, m = step(state, grid, gparams, cam.c2w, cam.intrinsics, bg,
                         txt, txt, t, keys)
        assert np.isfinite(float(m["loss"]))
        assert int(s2.step) == 1
        leaves = jax.tree_util.tree_leaves(s2.params)
        assert all(l.sharding.is_fully_replicated for l in leaves
                   if hasattr(l, "sharding"))
        assert float(jnp.abs(s2.params.encoder.tables
                             - state.params.encoder.tables).max()) > 0

    def test_nerf_dp_step_equals_single_view_step(self):
        """8 identical views == the B=1 stage-1 step (VERDICT r2 #2).

        The NeRF field is textured (large random tables) before the
        comparison: a near-uniform render makes the VAE's first GroupNorm
        divide by ~zero variance, amplifying float-reassociation noise
        between the two compiled programs to percent level. Tolerances
        target the failure this test exists for — a wrong psum/mean shifts
        gradients ~8x — not bit-exactness across XLA fusions."""
        setup = self._setup()
        state = setup[3]
        big = jax.random.uniform(jax.random.PRNGKey(9),
                                 state.params.encoder.tables.shape,
                                 minval=-2.0, maxval=2.0)
        state = state._replace(params=state.params._replace(
            encoder=state.params.encoder._replace(tables=big)))
        self._assert_dp_equals_single(setup[:3] + (state,) + setup[4:])

    def test_nerf_dp_triplane_volume_sparsity_equals_single(self):
        """Triplane + the ghost stabilizer ACTIVE: the volume-sparsity term
        (losses.volume_sparsity_loss) splits the per-view key in the same
        order as the single-chip step (k_render, k_sds, k_vs), so the
        8-identical-view DP step must still equal the B=1 step with the
        round-5 stabilizer in the loss."""
        setup = self._setup(backbone="triplane", triplane_resolution=8,
                            triplane_dim=4)
        cfg, state = setup[0], setup[3]
        assert cfg.triplane_volume_sparsity > 0  # on by default
        big = jax.random.uniform(jax.random.PRNGKey(9),
                                 state.params.encoder.planes.shape,
                                 minval=-2.0, maxval=2.0)
        state = state._replace(params=state.params._replace(
            encoder=state.params.encoder._replace(planes=big)))
        self._assert_dp_equals_single(setup[:3] + (state,) + setup[4:])

    def _assert_dp_equals_single(self, setup):
        from dreamwaltz_g_tpu.parallel.dp import make_nerf_sds_step_dp
        from dreamwaltz_g_tpu.training.nerf_trainer import make_nerf_sds_step

        cfg, model, tx, state, grid, guidance, gparams = setup
        mesh = make_mesh(dp=8)
        B = 8
        H = W = 16
        cam = make_camera_batch(2.0, 45.0, 80.0, 50.0, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt1 = jnp.asarray(np.random.default_rng(4).normal(size=(1, 4, D)),
                           jnp.float32)
        unc1 = jnp.zeros((1, 4, D))
        t1 = jnp.full((1,), 500, jnp.int32)
        key = jax.random.PRNGKey(7)
        bg = jnp.asarray([0.5, 0.5, 0.5])
        gs = jnp.asarray(7.5, jnp.float32)
        pr = jnp.asarray(0.1, jnp.float32)

        single = make_nerf_sds_step(model, guidance, tx, H, W, cfg,
                                    num_steps=cfg.num_steps)
        ref, ref_m = single(state, grid, gparams, cam.c2w[0],
                            cam.intrinsics[0], bg, txt1, unc1, t1, key,
                            guidance_scale=gs, progress=pr)

        step = make_nerf_sds_step_dp(model, guidance, tx, mesh, H, W, cfg,
                                     num_steps=cfg.num_steps)
        keys = jnp.broadcast_to(jax.random.key_data(key), (B, 2))
        with mesh:
            dp, dp_m = step(
                state, grid, gparams,
                jnp.broadcast_to(cam.c2w, (B, 4, 4)),
                jnp.broadcast_to(cam.intrinsics, (B, 3, 3)),
                jnp.broadcast_to(bg, (B, 3)),
                jnp.broadcast_to(txt1, (B,) + txt1.shape[1:]),
                jnp.broadcast_to(unc1, (B,) + unc1.shape[1:]),
                jnp.broadcast_to(t1, (B,)), keys,
                guidance_scale=gs, progress=pr)

        np.testing.assert_allclose(float(dp_m["loss"]), float(ref_m["loss"]),
                                   rtol=1e-4)
        # adam normalizes updates to ~lr, so a wrong mean would displace
        # params by O(lr)=1e-2; compiled-program noise stays ~1e-6
        for a, b in zip(
                jax.tree_util.tree_leaves((dp.params.encoder,
                                           dp.params.sigma_mlp)),
                jax.tree_util.tree_leaves((ref.params.encoder,
                                           ref.params.sigma_mlp))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_vanilla_dp_step_runs_and_matches_single():
    """gs_type='vanilla' under DP (VERDICT r2 #6): runs, replicates, and 8
    identical views equal the B=1 step."""
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.human.smplx_model import (
        default_params,
        make_synthetic_model,
    )
    from dreamwaltz_g_tpu.parallel.dp import make_vanilla_sds_step_dp
    from dreamwaltz_g_tpu.system.vanilla import (
        VanillaAvatarModel,
        init_vanilla_avatar,
    )
    from dreamwaltz_g_tpu.training.gs_trainer import (
        VanillaTrainState,
        make_vanilla_sds_step,
    )
    from dreamwaltz_g_tpu.training.optim import build_gaussian_optimizer

    mesh = make_mesh(dp=8)
    B = 8
    H = W = 24
    smpl = make_synthetic_model(num_vertices=120, num_joints=6,
                                num_betas=3, num_expr=2)
    canonical = default_params(smpl, 1)
    model = VanillaAvatarModel(smpl=smpl, canonical_inputs=canonical)
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.normal(size=(48, 3)) * 0.15, jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (48, 3)), jnp.float32)
    vstate = init_vanilla_avatar(model, cloud, colors=colors, capacity=64,
                                 init_scale=0.05)
    tx = build_gaussian_optimizer(RenderConfig(), max_steps=50)
    tstate = VanillaTrainState(vstate, tx.init(vstate.gaussians.params),
                               jnp.zeros((), jnp.int32))
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
    D = guidance.unet.cfg.cross_attention_dim
    txt1 = jnp.asarray(rng.normal(size=(1, 4, D)), jnp.float32)
    unc1 = jnp.zeros((1, 4, D))
    t1 = jnp.full((1,), 400, jnp.int32)
    key = jax.random.PRNGKey(9)
    cam = make_camera_batch(2.5, 60.0, 80.0, 50.0, H, W)
    bg1 = jnp.full((H, W, 3), 0.2)
    gs = jnp.asarray(7.5, jnp.float32)
    pr = jnp.asarray(0.0, jnp.float32)

    rk = dict(tile_size=8, capacity=64, chunk=32, max_tiles_per_gaussian=8)
    single = make_vanilla_sds_step(model, guidance, tx, H, W, **rk)
    ref, ref_m = single(tstate, gparams, canonical, cam.extrinsic[0],
                        cam.intrinsics[0], cam.tanfov[0], bg1, txt1, unc1,
                        t1, key, guidance_scale=gs, progress=pr)

    step = make_vanilla_sds_step_dp(model, guidance, tx, mesh, H, W, **rk)
    keys = jnp.broadcast_to(jax.random.key_data(key), (B, 2))
    with mesh:
        dp, dp_m = step(
            tstate, gparams, canonical,
            jnp.broadcast_to(cam.extrinsic, (B, 4, 4)),
            jnp.broadcast_to(cam.intrinsics, (B, 3, 3)),
            jnp.broadcast_to(cam.tanfov, (B,)),
            jnp.broadcast_to(bg1, (B, H, W, 3)),
            jnp.broadcast_to(txt1, (B,) + txt1.shape[1:]),
            jnp.broadcast_to(unc1, (B,) + unc1.shape[1:]),
            jnp.broadcast_to(t1, (B,)), keys,
            guidance_scale=gs, progress=pr)
    np.testing.assert_allclose(float(dp_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dp.avatar.gaussians.params.means),
        np.asarray(ref.avatar.gaussians.params.means), atol=1e-4)
    assert int(dp.step) == 1


def test_avatar_dp_step_with_trainable_background():
    """MLP background under DP (VERDICT r2 #6): bg params receive grads
    through every view's composite and move."""
    from dreamwaltz_g_tpu.system.background import BackgroundMLPNet
    from dreamwaltz_g_tpu.training.optim import adan

    mesh = make_mesh(dp=8)
    B = 8
    H = W = 24
    setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
    tx = build_avatar_optimizer(RenderConfig(), max_steps=10)
    tstate = init_avatar_train_state(setup.state, tx)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
    bg_net = BackgroundMLPNet()
    bg_tx = adan(1e-3, eps=1e-8)
    bg_params = bg_net.init(jax.random.PRNGKey(5), jnp.zeros((1, 3)))
    bg_state = (bg_params, bg_tx.init(bg_params))

    cam = make_camera_batch(
        [2.5] * B, list(np.linspace(0, 360, B, endpoint=False)),
        [80.0] * B, [50.0] * B, H, W)
    D = guidance.unet.cfg.cross_attention_dim
    txt = jnp.asarray(np.random.default_rng(1).normal(size=(B, 4, D)),
                      jnp.float32)
    t = jnp.full((B,), 400, jnp.int32)
    bg = jnp.zeros((B, H, W, 3))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    step = make_avatar_sds_step_dp(setup.model, guidance, tx, mesh, H, W,
                                   tile_size=8, capacity=64, chunk=32,
                                   bg_net=bg_net, bg_tx=bg_tx)
    with mesh:
        ts2, bg2, m = step(tstate, gparams, setup.observed, cam.extrinsic,
                           cam.intrinsics, cam.tanfov, bg, txt, txt, t,
                           keys, bg_state=bg_state, c2w=cam.c2w)
    assert np.isfinite(float(m["loss"]))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(bg2[0]),
                        jax.tree_util.tree_leaves(bg_params)))
    assert moved, "background MLP params did not move under DP"


def test_train_mesh_honors_parallel_dp():
    """--parallel.dp restricts the data axis: batch_size=2 on 8 devices with
    dp=2 builds a 2-device mesh instead of asserting (regression: the knob
    was parsed but ignored in the non-TP path)."""
    from dreamwaltz_g_tpu.configs import parse_args
    from dreamwaltz_g_tpu.training.trainer import _train_mesh_and_gshard

    cfg = parse_args(["--guide.text", "x", "--optim.batch_size", "2",
                      "--parallel.dp", "2"])
    mesh, gshard, _ = _train_mesh_and_gshard(cfg, 2, None)
    assert mesh.shape["data"] == 2 and gshard is None

    # dp=-1 (default) still clamps to batch_size
    cfg2 = parse_args(["--guide.text", "x", "--optim.batch_size", "4"])
    mesh2, _, _ = _train_mesh_and_gshard(cfg2, 4, None)
    assert mesh2.shape["data"] == min(4, len(jax.devices()))

    # indivisible request still fails loudly
    cfg3 = parse_args(["--guide.text", "x", "--optim.batch_size", "3",
                       "--parallel.dp", "2"])
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        _train_mesh_and_gshard(cfg3, 3, None)


def test_frame_dp_render_matches_single():
    """Frame-DP animation rendering (shard_map over the frame axis) must be
    pixel-identical to the single-device frame-batched renderer — the
    serving path for motion-sequence video on a v5e pod slice."""
    from dreamwaltz_g_tpu.training.gs_trainer import make_avatar_render_frames

    mesh = make_mesh(dp=8)
    F = 8
    H = W = 24
    setup = ts.tiny_avatar_setup(capacity=64, n_points=32)

    # F animation frames: vary the pose + orbit the camera
    obs = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * F), setup.observed)
    bp = obs.body_pose
    wiggle = jnp.linspace(0, 0.4, F).reshape(F, 1, 1)
    obs = obs._replace(body_pose=bp + wiggle * jnp.ones_like(bp))
    cam = make_camera_batch(
        [2.5] * F, list(np.linspace(0, 360, F, endpoint=False)),
        [80.0] * F, [50.0] * F, H, W)
    bg = jnp.full((H, W, 3), 0.3)

    rf_one = make_avatar_render_frames(setup.model, H, W, tile_size=8,
                                       capacity=64, chunk=32)
    rf_dp = make_avatar_render_frames(setup.model, H, W, tile_size=8,
                                      capacity=64, chunk=32, mesh=mesh)
    img1, a1, d1 = rf_one(setup.state, obs, cam.extrinsic, cam.intrinsics,
                          cam.tanfov, bg)
    with mesh:
        img8, a8, d8 = rf_dp(setup.state, obs, cam.extrinsic,
                             cam.intrinsics, cam.tanfov, bg)
    assert img8.shape == (F, H, W, 3)
    np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a8), np.asarray(a1),
                               rtol=2e-5, atol=2e-5)
    # frames genuinely differ (the orbit is real)
    assert np.abs(np.asarray(img1[0]) - np.asarray(img1[F // 2])).max() > 1e-3
