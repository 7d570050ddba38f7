"""Tests for optimizers, losses, camera samplers, checkpointing, trainers."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dreamwaltz_g_tpu.configs import DataConfig, NeRFConfig, RenderConfig
from dreamwaltz_g_tpu.data.sampler import (
    CyclicalCamera,
    CyclicalCamera4Avatar,
    RandomCamera,
    RandomCamera4Avatar,
    sample_camera_trajectory,
)
from dreamwaltz_g_tpu.training import losses as L
from dreamwaltz_g_tpu.training.optim import (

    adan,
    build_gaussian_optimizer,
    build_nerf_optimizer,
    expon_lr,
)



# heavyweight e2e module: excluded from the fast profile (pytest.ini)
pytestmark = pytest.mark.slow

class TestExponLR:
    def test_endpoints(self):
        f = expon_lr(1e-2, 1e-4, 100)
        assert np.isclose(float(f(0)), 1e-2, rtol=1e-5)
        assert np.isclose(float(f(100)), 1e-4, rtol=1e-5)
        # log-lerp midpoint = geometric mean
        assert np.isclose(float(f(50)), 1e-3, rtol=1e-4)


class TestAdan:
    def test_converges_on_quadratic(self):
        # adaptive optimizers oscillate around the optimum at ~lr amplitude
        # on a quadratic; decay the lr to land tightly
        tx = adan(lambda step: 0.1 * 0.99 ** step)
        params = jnp.asarray([5.0, -3.0])
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            grads = 2 * params  # d/dp ||p||^2
            updates, state = tx.update(grads, state, params)
            return optax.apply_updates(params, updates), state

        for _ in range(300):
            params, state = step(params, state)
        assert float(jnp.abs(params).max()) < 0.2


class TestGroupOptimizers:
    def test_nerf_groups(self):
        from dreamwaltz_g_tpu.nerf.network import build_nerf

        model = build_nerf(NeRFConfig(backbone="tiledgrid", num_levels=2, level_dim=2,
                                      desired_resolution=64,
                                      log2_hashmap_size=8))
        params = model.init(jax.random.PRNGKey(0))
        tx = build_nerf_optimizer(model.cfg, max_steps=100)
        opt_state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        # encoder step must be ~10x the MLP step
        enc_mag = float(jnp.abs(updates.encoder.tables).mean())
        mlp_mag = float(jnp.abs(
            updates.sigma_mlp["params"]["dense_0"]["kernel"]).mean())
        assert enc_mag > 5 * mlp_mag

    def test_gaussian_groups(self):
        from dreamwaltz_g_tpu.gaussian.model import init_state

        state = init_state(jnp.zeros((8, 3)), capacity=8)
        tx = build_gaussian_optimizer(RenderConfig(), max_steps=100)
        opt_state = tx.init(state.params)
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        updates, _ = tx.update(grads, opt_state, state.params)
        # sh_rest lr is feature_lr / 20
        dc = float(jnp.abs(updates.sh_dc).mean())
        rest = float(jnp.abs(updates.sh_rest).mean())
        assert dc > 10 * rest


class TestLosses:
    def test_sparsity_components(self):
        ws = jnp.asarray([0.1, 0.9, 0.5])
        assert float(L.opacity_loss(ws)) > 0
        assert 0 < float(L.entropy_loss(ws)) <= 1.0
        assert float(L.emptiness_loss(ws)) > 0

    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(L.ssim(img, img)) > 0.999

    def test_recon_loss_zero_at_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(L.image_reconstruction_loss(img, img)) < 1e-5
        other = jnp.zeros_like(img)
        assert float(L.image_reconstruction_loss(img, other)) > 0.1

    def test_sigma_margin_loss(self):
        from dreamwaltz_g_tpu.nerf.network import build_nerf

        model = build_nerf(NeRFConfig(backbone="tiledgrid", num_levels=2, desired_resolution=64,
                                      log2_hashmap_size=8),
                           with_background=False)
        params = model.init(jax.random.PRNGKey(0))
        pts = L.SigmaGuidancePoints(
            surface=jnp.zeros((16, 3)), offset=jnp.ones((16, 3)) * 0.5)
        loss = L.sigma_margin_loss(model, params, pts, peak=15.0)
        assert float(loss) > 0  # fresh net is far from the margins

    def test_make_sigma_points(self):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
        f = jnp.asarray(rng.integers(0, 20, size=(30, 3)))
        pts = L.make_sigma_guidance_points(jax.random.PRNGKey(0), v, f,
                                           num_points=64)
        assert pts.surface.shape == (64, 3) and pts.offset.shape == (64, 3)

    def test_vertex_normals_octahedron(self):
        """The sigma-guidance offset direction interpolates VERTEX normals
        (reference: trainer.py:744-752 via trimesh), not flat face normals;
        on a regular octahedron every vertex normal is radial."""
        from dreamwaltz_g_tpu.ops.mesh import vertex_normals

        v = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                         [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
        f = jnp.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
        vn = vertex_normals(v, f)
        assert np.allclose(np.asarray(vn), np.asarray(v), atol=1e-6)

    def test_sigma_points_use_interpolated_normals(self):
        """On the octahedron, flat face normals are diagonal while the
        interpolated normal varies across the face — points sampled near a
        vertex must offset nearly radially."""
        from dreamwaltz_g_tpu.ops import mesh as M

        v = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                         [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
        f = jnp.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
        pts = L.make_sigma_guidance_points(jax.random.PRNGKey(0), v, f,
                                           num_points=256, noise_range=0.1,
                                           surface_thickness=0.0)
        d = np.asarray(pts.offset - pts.surface)
        d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        p = np.asarray(pts.surface)
        p = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
        # interpolated normals track the sample position on this symmetric
        # solid; a flat normal would be constant per face (cos to radial as
        # low as cos(~35°)≈0.82 at the corners). Samples near vertices must
        # align much better than the flat-normal worst case.
        cosr = np.abs((d * p).sum(-1))
        near_vertex = np.abs(np.asarray(pts.surface)).max(-1) > 0.9
        if near_vertex.any():
            assert cosr[near_vertex].min() > 0.95

    def test_knn_regularizer(self):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        reg = L.KnnRegularizer.build(v, k=4)
        # tiny offsets/scales are free; huge ones are penalized
        assert float(reg.offset_loss(jnp.zeros((32, 3)))) == 0.0
        assert float(reg.offset_loss(jnp.ones((32, 3)) * 10)) > 0
        assert float(reg.scale_loss(jnp.full((32, 3), 1e-6))) == 0.0
        assert float(reg.scale_loss(jnp.ones((32, 3)) * 10)) > 0


class TestCameraSamplers:
    def test_random_camera_ranges(self):
        cfg = DataConfig(radius_range=(1.0, 2.0), fovy_range=(40, 70))
        cam = RandomCamera(cfg, 64, 64, seed=0)(4)
        assert cam.extrinsic.shape == (4, 4, 4)
        r = np.asarray(cam.radius)
        assert (r >= 1.0).all() and (r <= 2.0).all()

    def test_multi_interval_azimuth(self):
        cfg = DataConfig(face_azimuth_range="(0, 10),(350,360)")
        sampler = RandomCamera(cfg, 32, 32, seed=1)
        sampler.azimuth_range = cfg.face_azimuth_range
        az = np.concatenate([np.asarray(sampler(8).azimuth) for _ in range(8)])
        assert ((az <= 10.0) | (az >= 350.0)).all()

    def test_body_part_sampler(self):
        cfg = DataConfig(body_prob=0.0, face_prob=1.0, head_prob=0.0,
                         hand_prob=0.0, foot_prob=0.0, arm_prob=0.0)
        sampler = RandomCamera4Avatar(cfg, 32, 32, seed=0)
        kp = np.zeros((1, 128, 3), np.float32)
        kp[0, :, 1] = 1.5  # ears etc at head height
        sampler.setup_camera_offset(kp)
        cam, part = sampler(1)
        assert part == "face"
        r = float(cam.radius[0])
        assert 0.5 <= r <= 1.0

    def test_trajectories(self):
        assert sample_camera_trajectory(0.5, trajectory="circle")[0] == 180.0
        a, e = sample_camera_trajectory(0.25, azimuth=10, elevation=80,
                                        trajectory="fixed")
        assert (a, e) == (10, 80)

    def test_cyclical_camera(self):
        cfg = DataConfig(eval_radius=2.4)
        cam = CyclicalCamera(cfg, 64, 64)(0.5)
        assert float(cam.azimuth[0]) == 180.0

    def test_cyclical_body_part_offset(self):
        cfg = DataConfig(eval_body_part="head")
        cam = CyclicalCamera4Avatar(cfg, 64, 64)
        kp = np.zeros((1, 128, 3), np.float32)
        kp[0, 16, :] = [0, 1.6, 0]
        kp[0, 17, :] = [0, 1.6, 0]
        cam.setup_camera_offset(kp)
        np.testing.assert_allclose(cam.camera_offset, [0, 1.6, 0], atol=1e-6)


class TestCheckpointer:
    def test_save_restore_rotation(self, tmp_path):
        from dreamwaltz_g_tpu.training.checkpoint import Checkpointer

        ck = Checkpointer(tmp_path / "ckpts", max_keep=2)
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        for s in (10, 20, 30):
            ck.save(s, jax.tree_util.tree_map(lambda x: x * s, tree))
        assert ck.all_steps() == [20, 30]  # rotated
        restored, step = ck.restore()
        assert step == 30
        np.testing.assert_allclose(restored["a"], np.arange(4.0) * 30)


class TestPretrainStep:
    def test_mask_loss_decreases(self):
        from dreamwaltz_g_tpu.data.camera import make_camera_batch
        from dreamwaltz_g_tpu.nerf.network import build_nerf
        from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
        from dreamwaltz_g_tpu.training.nerf_trainer import (
            init_train_state,
            make_pretrain_step,
        )

        cfg = NeRFConfig(backbone="tiledgrid", num_levels=4, desired_resolution=64,
                         log2_hashmap_size=10, bound=1.0)
        model = build_nerf(cfg, with_background=False)
        tx = build_nerf_optimizer(cfg, 50)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        grid = None
        H = W = 16
        cam = make_camera_batch(2.0, 0.0, 90.0, 60.0, H, W)
        # target: circular mask, flat depth
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        mask = ((yy - H / 2) ** 2 + (xx - W / 2) ** 2 < (H / 4) ** 2)
        gt_mask = jnp.asarray(mask, jnp.float32)
        gt_depth = jnp.where(gt_mask > 0, 2.0, 0.0)

        step = make_pretrain_step(model, tx, H, W, num_steps=32)
        grid_none = init_occupancy(8)._replace(
            occupied=jnp.ones((8, 8, 8), bool))
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(30):
            key, k = jax.random.split(key)
            state, m = step(state, grid_none, cam.c2w[0], cam.intrinsics[0],
                            gt_depth, gt_mask, k)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8


class TestAvatarSDSStepShapes:
    def test_avatar_step_runs_with_tiny_guidance(self):
        import dreamwaltz_g_tpu.tests_support as ts

        pytest.importorskip("flax")
        from dreamwaltz_g_tpu.training.gs_trainer import (
            densify,
            init_avatar_train_state,
            make_avatar_sds_step,
        )
        from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer
        from dreamwaltz_g_tpu.gaussian.densify import DensifyConfig

        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        tx = build_avatar_optimizer(RenderConfig(), max_steps=50)
        tstate = init_avatar_train_state(setup.state, tx)
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))

        H = W = 32
        from dreamwaltz_g_tpu.data.camera import make_camera_batch
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, H, W)
        step = make_avatar_sds_step(setup.model, guidance, tx, H, W,
                                    tile_size=8, capacity=64, chunk=32)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jnp.zeros((1, 4, D))
        t = jnp.asarray([500], jnp.int32)
        bg = jnp.zeros((H, W, 3))
        tstate2, metrics = step(
            tstate, gparams, setup.observed, cam.extrinsic[0],
            cam.intrinsics[0], cam.tanfov[0], bg, txt, txt, t,
            jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert int(tstate2.step) == 1
        # stats accumulated on at least some visible gaussians
        assert float(tstate2.avatar.grad_denom.sum()) > 0

        # densify runs and keeps shapes
        tstate3 = densify(tstate2, DensifyConfig(grad_threshold=0.0,
                                                 spatial_scale=1.0),
                          jax.random.PRNGKey(3))
        assert tstate3.avatar.capacity == 64


class TestSplitStep:
    def test_split_matches_fused(self):
        """The 3-jit split SDS step produces the same update as the fused
        step (same seed, same inputs)."""
        import dreamwaltz_g_tpu.tests_support as ts
        from dreamwaltz_g_tpu.training.gs_trainer import (
            init_avatar_train_state,
            make_avatar_sds_step,
            make_avatar_sds_step_split,
        )
        from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer
        from dreamwaltz_g_tpu.data.camera import make_camera_batch

        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        tx = build_avatar_optimizer(RenderConfig(), max_steps=50)
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
        H = W = 24
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jnp.zeros((1, 4, D))
        t = jnp.asarray([400], jnp.int32)
        bg = jnp.zeros((H, W, 3))
        key = jax.random.PRNGKey(7)
        kw = dict(tile_size=8, capacity=64, chunk=32)

        fused = make_avatar_sds_step(setup.model, guidance, tx, H, W, **kw)
        split = make_avatar_sds_step_split(setup.model, guidance, tx, H, W,
                                           **kw)
        s0 = init_avatar_train_state(setup.state, tx)
        a1, m1 = fused(s0, gparams, setup.observed, cam.extrinsic[0],
                       cam.intrinsics[0], cam.tanfov[0], bg, txt, txt, t, key)
        a2, m2 = split(s0, gparams, setup.observed, cam.extrinsic[0],
                       cam.intrinsics[0], cam.tanfov[0], bg, txt, txt, t, key)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(a1.avatar.params.positions),
            np.asarray(a2.avatar.params.positions), rtol=1e-4, atol=1e-6)


class TestGuidanceScaleSchedule:
    def test_split_step_honors_guidance_scale(self):
        """Changing the scheduled CFG scale changes the latent gradient (and
        hence the update) on make_avatar_sds_step_split (reference anneals
        the scale per step: get_guidance_scale, basic.py:404-418)."""
        import dreamwaltz_g_tpu.tests_support as ts
        from dreamwaltz_g_tpu.training.gs_trainer import (
            init_avatar_train_state,
            make_avatar_sds_step_split,
        )
        from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer
        from dreamwaltz_g_tpu.data.camera import make_camera_batch

        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        tx = build_avatar_optimizer(RenderConfig(), max_steps=50)
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
        H = W = 24
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 4, D)), jnp.float32)
        unc = jnp.zeros((1, 4, D))
        t = jnp.asarray([400], jnp.int32)
        bg = jnp.zeros((H, W, 3))
        key = jax.random.PRNGKey(7)

        split = make_avatar_sds_step_split(
            setup.model, guidance, tx, H, W, tile_size=8, capacity=64,
            chunk=32)
        s0 = init_avatar_train_state(setup.state, tx)
        args = (s0, gparams, setup.observed, cam.extrinsic[0],
                cam.intrinsics[0], cam.tanfov[0], bg, txt, unc, t, key)
        _, m_lo = split(*args, guidance_scale=0.0)
        _, m_hi = split(*args, guidance_scale=100.0)
        assert not np.isclose(float(m_lo["loss"]), float(m_hi["loss"])), \
            "guidance_scale had no effect on the split step"
        # default (None) uses the static scale and also runs
        _, m_def = split(*args)
        assert np.isfinite(float(m_def["loss"]))


class TestExtraBetasGradient:
    def test_extra_betas_receives_gradient(self):
        """With learn_face_betas, extra_betas shifts the mesh-part transform
        and receives a nonzero gradient through animate (reference:
        avatar.py:1549-1582)."""
        import dataclasses

        import dreamwaltz_g_tpu.tests_support as ts
        from dreamwaltz_g_tpu.system import avatar as A

        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        model = dataclasses.replace(setup.model, learn_face_betas=True)
        state = setup.state

        def loss_fn(params):
            gs = A.animate(model, state._replace(params=params),
                           setup.observed)
            # mesh-part positions are the tail n_mesh_points entries
            M = model.n_mesh_points
            return jnp.sum(gs.positions[-M:] ** 2)

        grads = jax.grad(loss_fn)(state.params)
        g = np.asarray(grads.extra_betas)
        assert np.any(g != 0.0), "extra_betas gradient is identically zero"

        # without the learn flag the parameter stays dead (documented)
        grads0 = jax.grad(loss_fn)(state.params)  # same fn, flag baked in
        model_off = setup.model
        def loss_off(params):
            gs = A.animate(model_off, state._replace(params=params),
                           setup.observed)
            M = model_off.n_mesh_points
            return jnp.sum(gs.positions[-M:] ** 2)
        g_off = np.asarray(jax.grad(loss_off)(state.params).extra_betas)
        assert np.all(g_off == 0.0)


class TestResolveCkptPath:
    def test_variants(self, tmp_path):
        from dreamwaltz_g_tpu.training.trainer import resolve_ckpt_path

        exp = tmp_path / "exp"
        (exp / "checkpoints" / "step_00000005").mkdir(parents=True)
        (exp / "checkpoints" / "step_00000010").mkdir()
        # exp dir -> latest step
        assert resolve_ckpt_path(exp).name == "step_00000010"
        # checkpoints dir -> latest step
        assert resolve_ckpt_path(exp / "checkpoints").name == "step_00000010"
        # explicit step dir -> itself
        p = exp / "checkpoints" / "step_00000005"
        assert resolve_ckpt_path(p) == p
        # missing -> None
        assert resolve_ckpt_path(tmp_path / "nope") is None


class TestTimePrioritizedLRScaling:
    def test_scale_updates(self):
        from dreamwaltz_g_tpu.guidance.time_prior import (
            TimePrioritizedLR,
            make_schedule,
        )

        tplr = TimePrioritizedLR(make_schedule())
        ups = {"a": jnp.ones(3)}
        out = tplr.scale_updates(ups, 999)
        np.testing.assert_allclose(np.asarray(out["a"]), 1.0)
        out_small = tplr.scale_updates(ups, 50)
        assert float(out_small["a"][0]) < 1.0


class TestTrainableBackground:
    def test_bg_mlp_trains_in_split_step(self):
        """The trainable MLP background receives nonzero gradients and its
        params move (reference: MLPBackground + Adan group,
        background.py:55-89, trainer.py:594-598)."""
        import dreamwaltz_g_tpu.tests_support as ts
        from dreamwaltz_g_tpu.data.camera import make_camera_batch
        from dreamwaltz_g_tpu.system.background import BackgroundMLPNet
        from dreamwaltz_g_tpu.training.gs_trainer import (
            init_avatar_train_state,
            make_avatar_sds_step_split,
        )
        from dreamwaltz_g_tpu.training.optim import adan, build_avatar_optimizer

        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        tx = build_avatar_optimizer(RenderConfig(), max_steps=50)
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
        H = W = 24
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jax.random.normal(jax.random.PRNGKey(5), (1, 4, D)) * 0.1
        t = jnp.asarray([400], jnp.int32)
        bg_net = BackgroundMLPNet()
        bg_tx = adan(1e-3, eps=1e-8, weight_decay=2e-5)
        bg_params = bg_net.init(jax.random.PRNGKey(9), jnp.zeros((1, 3)))
        bg_state = (bg_params, bg_tx.init(bg_params))

        step = make_avatar_sds_step_split(
            setup.model, guidance, tx, H, W, tile_size=8, capacity=64,
            chunk=32, bg_net=bg_net, bg_tx=bg_tx)
        s0 = init_avatar_train_state(setup.state, tx)
        s1, bg1, m = step(
            s0, gparams, setup.observed, cam.extrinsic[0], cam.intrinsics[0],
            cam.tanfov[0], None, txt, txt, t, jax.random.PRNGKey(2),
            bg_state=bg_state, c2w=cam.c2w[0])
        assert np.isfinite(float(m["loss"]))
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), bg_params, bg1[0])
        assert max(jax.tree_util.tree_leaves(moved)) > 0, \
            "background params did not move"
        # avatar still updates too
        assert float(jnp.abs(
            s1.avatar.params.positions - s0.avatar.params.positions).max()) > 0


class TestGsTypeVariants:
    def test_hash_avatar_animate_and_grads(self):
        """gs_type='hash': scales/quats from the pose-independent MLP
        (reference: HashAvatar.nerf_forward, avatar.py:411-492)."""
        import dreamwaltz_g_tpu.tests_support as ts
        from dreamwaltz_g_tpu.nerf.network import SigmaMLP
        from dreamwaltz_g_tpu.system import avatar as A

        base = ts.tiny_avatar_setup(capacity=64, n_points=32)
        model = base.model.__class__(
            **{**base.model.__dict__, "hash_mode": True,
               "sq_net": SigmaMLP(hidden=32, num_layers=2, out_channels=7),
               "mesh_parts": {}})
        state = A.init_avatar_state(model, base.cloud, jax.random.PRNGKey(0),
                                    capacity=64,
                                    prune_dists_close_to_mesh=None)
        gs = A.animate(model, state, base.observed)
        assert gs.positions.shape[0] == 64  # no mesh points
        assert np.isfinite(np.asarray(gs.scales)).all()
        # scales honor exp(.)*init_scale clipping
        assert float(gs.scales.max()) <= model.max_scale + 1e-8

        def loss(params):
            g = A.animate(model, state._replace(params=params), base.observed)
            return jnp.sum(g.scales) + jnp.sum(g.positions)

        grad = jax.grad(loss)(state.params)
        # gradient flows into the scale/quat MLP, not into dead per-point
        # scale params
        assert sum(float(jnp.abs(x).sum())
                   for x in jax.tree_util.tree_leaves(grad.sq_net)) > 0
        assert float(jnp.abs(grad.log_scales).sum()) == 0.0

    def test_vanilla_sds_step_and_densify(self):
        """gs_type='vanilla': SDS step updates GaussianParams, densify
        copies LBS weights to children, opacity reset applies
        (reference: VanillaAvatar, avatar.py:334-407)."""
        import dreamwaltz_g_tpu.tests_support as ts
        from dreamwaltz_g_tpu.gaussian.densify import DensifyConfig
        from dreamwaltz_g_tpu.gaussian.model import opacities
        from dreamwaltz_g_tpu.human.smplx_model import default_params
        from dreamwaltz_g_tpu.system.vanilla import (
            VanillaAvatarModel,
            init_vanilla_avatar,
        )
        from dreamwaltz_g_tpu.training.gs_trainer import (
            VanillaTrainState,
            densify_vanilla,
            make_vanilla_sds_step,
            reset_vanilla_opacity,
        )
        from dreamwaltz_g_tpu.training.optim import build_gaussian_optimizer
        from dreamwaltz_g_tpu.human.smplx_model import make_synthetic_model
        from dreamwaltz_g_tpu.data.camera import make_camera_batch

        smpl = make_synthetic_model(num_vertices=120, num_joints=6,
                                    num_betas=3, num_expr=2)
        canonical = default_params(smpl, 1)
        model = VanillaAvatarModel(smpl=smpl, canonical_inputs=canonical)
        rng = np.random.default_rng(0)
        cloud = jnp.asarray(rng.normal(size=(32, 3)) * 0.15, jnp.float32)
        vstate = init_vanilla_avatar(model, cloud, capacity=64)
        tx = build_gaussian_optimizer(RenderConfig(), max_steps=50)
        tstate = VanillaTrainState(vstate, tx.init(vstate.gaussians.params),
                                   jnp.zeros((), jnp.int32))
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
        H = W = 24
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jax.random.normal(jax.random.PRNGKey(5), (1, 4, D)) * 0.1
        step = make_vanilla_sds_step(model, guidance, tx, H, W,
                                     tile_size=8, capacity=64, chunk=32)
        t1, m = step(tstate, gparams, canonical, cam.extrinsic[0],
                     cam.intrinsics[0], cam.tanfov[0],
                     jnp.zeros((H, W, 3)), txt, txt * 0,
                     jnp.asarray([400], jnp.int32), jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
        assert float(jnp.abs(
            t1.avatar.gaussians.params.means
            - tstate.avatar.gaussians.params.means).max()) > 0

        # densify with hot gradients -> clones copy parent lbs weights
        g2 = t1.avatar.gaussians._replace(
            grad_accum=jnp.zeros(64).at[:4].set(10.0),
            grad_denom=jnp.zeros(64).at[:32].set(1.0))
        t2 = VanillaTrainState(t1.avatar._replace(gaussians=g2),
                               t1.opt_state, t1.step)
        cfg = DensifyConfig(grad_threshold=1.0, percent_dense=100.0)
        t3 = densify_vanilla(t2, cfg, jax.random.PRNGKey(3))
        n_before = int(g2.alive.sum())
        n_after = int(t3.avatar.gaussians.alive.sum())
        assert n_after == n_before + 4
        new_slots = np.where(np.asarray(t3.avatar.gaussians.alive)
                             & ~np.asarray(g2.alive))[0]
        np.testing.assert_allclose(
            np.asarray(t3.avatar.lbs_weights)[new_slots],
            np.asarray(t2.avatar.lbs_weights)[:4], atol=1e-6)

        # opacity reset caps opacities at the reset value
        t4 = reset_vanilla_opacity(t3, value=0.01)
        op = opacities(t4.avatar.gaussians.params)
        assert float(op[t4.avatar.gaussians.alive].max()) <= 0.011


class TestPixelGradHooks:
    def test_pgc_changes_step_update(self):
        """The wired RGB pixel-gradient hook changes the parameter update
        (reference: register_hook dispatch, basic.py:795-817)."""
        import dreamwaltz_g_tpu.tests_support as ts
        from dreamwaltz_g_tpu.data.camera import make_camera_batch
        from dreamwaltz_g_tpu.guidance.sds import make_pgc_suppress
        from dreamwaltz_g_tpu.training.gs_trainer import (
            init_avatar_train_state,
            make_avatar_sds_step,
        )
        from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer

        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        tx = build_avatar_optimizer(RenderConfig(), max_steps=50)
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
        H = W = 24
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jax.random.normal(jax.random.PRNGKey(5), (1, 4, D)) * 0.1
        args = None

        def run(pgc):
            step = make_avatar_sds_step(setup.model, guidance, tx, H, W,
                                        tile_size=8, capacity=64, chunk=32,
                                        pgc=pgc)
            s0 = init_avatar_train_state(setup.state, tx)
            s1, m = step(s0, gparams, setup.observed, cam.extrinsic[0],
                         cam.intrinsics[0], cam.tanfov[0],
                         jnp.zeros((H, W, 3)), txt, txt * 0,
                         jnp.asarray([400], jnp.int32), jax.random.PRNGKey(2))
            return np.asarray(s1.avatar.params.positions), float(m["loss"])

        p_plain, l_plain = run(None)
        p_pgc, l_pgc = run(make_pgc_suppress(1e-4, suppress_type=1))
        # forward (loss) identical — the hook is identity on the forward
        np.testing.assert_allclose(l_plain, l_pgc, rtol=1e-5)
        # backward differs — the update moved differently
        assert np.abs(p_plain - p_pgc).max() > 1e-9


class TestNeRFLRPolicies:
    """lr_policy parity (VERDICT r2 #5; reference: build_scheduler,
    nerf_model.py:187-211 + make_scheduler, core/optim/scheduler)."""

    def test_step_and_multistep_and_warmup(self):
        from dreamwaltz_g_tpu.training.optim import nerf_lr_schedule

        base, M = 1e-3, 1000
        s = nerf_lr_schedule("step", base, M)
        np.testing.assert_allclose(float(s(0)), base)
        np.testing.assert_allclose(float(s(699)), base)
        np.testing.assert_allclose(float(s(700)), base * 0.1, rtol=1e-6)

        m = nerf_lr_schedule("multistep", base, M)
        # milestones at 700, 1050, 1225
        np.testing.assert_allclose(float(m(0)), base)
        np.testing.assert_allclose(float(m(710)), base * 0.1, rtol=1e-6)

        w = nerf_lr_schedule("warmup", base, M)
        assert float(w(0)) < base * 0.01  # 1000-step linear warmup
        np.testing.assert_allclose(float(w(499)), base * 0.5, rtol=1e-3)
        # milestone 700 fires while still warming up (reference
        # WarmupMultiStepLR composes both factors)
        np.testing.assert_allclose(float(w(800)), base * 0.1 * 0.801,
                                   rtol=1e-3)

    def test_lambda_uses_alphas(self):
        from dreamwaltz_g_tpu.training.optim import nerf_lr_schedule

        ac = np.linspace(0.999, 0.005, 1000).astype(np.float32)
        s = nerf_lr_schedule("lambda", 1.0, 1000, alphas_cumprod=ac)
        # i=0 -> idx=1000 -> factor 1.0 (reference lr_lambda special case)
        np.testing.assert_allclose(float(s(0)), 1.0)
        # i=max -> idx=0 -> 1 - ac[0] ~ 0.001
        np.testing.assert_allclose(float(s(1000)), 1.0 - ac[0], rtol=1e-4)
        with pytest.raises(AssertionError):
            nerf_lr_schedule("lambda", 1.0, 1000)

    def test_unknown_policy_raises(self):
        from dreamwaltz_g_tpu.training.optim import nerf_lr_schedule

        with pytest.raises(ValueError):
            nerf_lr_schedule("nope", 1.0, 100)

    def test_ddpm_policy_scales_updates_in_step(self):
        """tp_lr_weights=0 freezes the step; =1 matches the unscaled step
        (the 'ddpm' TimePrioritizedLR wiring, time_prior.py:394-431)."""
        import dataclasses

        from dreamwaltz_g_tpu import tests_support as ts
        from dreamwaltz_g_tpu.configs import NeRFConfig
        from dreamwaltz_g_tpu.nerf.network import build_nerf
        from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
        from dreamwaltz_g_tpu.training.nerf_trainer import (
            init_train_state,
            make_nerf_sds_step,
        )
        from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer
        from dreamwaltz_g_tpu.data.camera import make_camera_batch

        cfg = NeRFConfig(backbone="tiledgrid", num_levels=2, level_dim=2, base_resolution=4,
                         desired_resolution=16, log2_hashmap_size=8,
                         grid_size=16, num_steps=8, bound=1.0,
                         compact_steps=0, max_ray_batch=0,
                         lr_policy="ddpm")
        model = build_nerf(cfg, with_background=False)
        tx = build_nerf_optimizer(cfg, max_steps=100)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        grid = init_occupancy(cfg.grid_size)
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(1))
        H = W = 8
        cam = make_camera_batch(2.0, 0.0, 80.0, 50.0, H, W)
        D = guidance.unet.cfg.cross_attention_dim
        txt = jnp.zeros((1, 4, D))
        t = jnp.full((1,), 500, jnp.int32)
        key = jax.random.PRNGKey(2)
        bg = jnp.asarray([0.5, 0.5, 0.5])

        frozen = make_nerf_sds_step(
            model, guidance, tx, H, W, cfg, num_steps=cfg.num_steps,
            tp_lr_weights=jnp.zeros((1000,)))
        s_frozen, _ = frozen(state, grid, gparams, cam.c2w[0],
                             cam.intrinsics[0], bg, txt, txt, t, key)
        np.testing.assert_array_equal(
            np.asarray(s_frozen.params.encoder.tables),
            np.asarray(state.params.encoder.tables))

        unit = make_nerf_sds_step(
            model, guidance, tx, H, W, cfg, num_steps=cfg.num_steps,
            tp_lr_weights=jnp.ones((1000,)))
        plain = make_nerf_sds_step(
            model, guidance, tx, H, W, cfg, num_steps=cfg.num_steps)
        s_unit, _ = unit(state, grid, gparams, cam.c2w[0],
                         cam.intrinsics[0], bg, txt, txt, t, key)
        s_plain, _ = plain(state, grid, gparams, cam.c2w[0],
                           cam.intrinsics[0], bg, txt, txt, t, key)
        np.testing.assert_allclose(
            np.asarray(s_unit.params.encoder.tables),
            np.asarray(s_plain.params.encoder.tables), atol=1e-7)
