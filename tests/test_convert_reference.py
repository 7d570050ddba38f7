"""Round-trip tests: reference-style torch state dicts -> our pytrees."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu import tests_support as ts
from dreamwaltz_g_tpu.convert_reference import (
    convert_avatar_checkpoint,
    convert_gaussian_checkpoint,
    convert_nerf_checkpoint,
)
from dreamwaltz_g_tpu.nerf.encoder import GridEncoderConfig, tables_to_flat
from dreamwaltz_g_tpu.nerf.network import NeRFConfig, build_nerf


def _mlp_sd(prefix, dims, rng):
    """torch MLP(.net.{i}) state dict with the reference layer layout."""
    sd = {}
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        sd[f"{prefix}net.{i}.weight"] = rng.normal(
            size=(cout, cin)).astype(np.float32)
        sd[f"{prefix}net.{i}.bias"] = np.zeros(cout, np.float32)
    return sd


class TestNeRFConversion:
    def test_triplane_backbone_rejected_with_hint(self):
        # reference checkpoints carry hash-grid tables; loading them under
        # the triplane default must fail with the --nerf.backbone hint,
        # not an AttributeError deep in the layout math
        from dreamwaltz_g_tpu.nerf.encoder import tables_from_flat
        model = build_nerf(NeRFConfig(backbone="triplane"))
        with pytest.raises(ValueError, match="tiledgrid"):
            tables_from_flat(model.enc_cfg, np.zeros((16, 2), np.float32))

    def test_roundtrip_forward(self):
        rng = np.random.default_rng(0)
        cfg = NeRFConfig(backbone="tiledgrid", num_levels=4, level_dim=2, base_resolution=4,
                         desired_resolution=32, log2_hashmap_size=8,
                         bound=1.0)
        model = build_nerf(cfg)
        enc_cfg = model.enc_cfg
        total = sum(enc_cfg.level_table_size(l) for l in range(4))
        sd = {"encoder.embeddings": rng.normal(
            size=(total, 2)).astype(np.float32) * 1e-2}
        sd.update(_mlp_sd("sigma_net.", (enc_cfg.output_dim, 64, 64, 4), rng))
        sd.update(_mlp_sd("bg_net.", (39, 64, 3), rng))

        params = convert_nerf_checkpoint(sd, enc_cfg)
        pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(32, 3)), jnp.float32)
        sigma, albedo = model.density(params, pts)
        assert sigma.shape == (32,) and albedo.shape == (32, 3)
        assert np.isfinite(np.asarray(sigma)).all()
        # flat table layout round-trips
        np.testing.assert_allclose(
            tables_to_flat(enc_cfg, params.encoder),
            sd["encoder.embeddings"], atol=1e-7)
        # MLP weight orientation: flax apply == manual torch math
        h = model.encode(params, pts)
        w0 = sd["sigma_net.net.0.weight"]
        manual = np.maximum(np.asarray(h) @ w0.T, 0.0)
        manual = np.maximum(manual @ sd["sigma_net.net.1.weight"].T, 0.0)
        manual = manual @ sd["sigma_net.net.2.weight"].T
        out = model.sigma_mlp.apply(params.sigma_mlp, h)
        np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-4,
                                   atol=1e-5)


class TestAvatarConversion:
    def test_convert_and_animate(self):
        rng = np.random.default_rng(1)
        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        model = setup.model
        enc_cfg = model.enc_cfg
        N = 40
        total = sum(enc_cfg.level_table_size(l)
                    for l in range(enc_cfg.num_levels))
        J = model.smpl.num_joints

        sd = {
            "avatar._positions": rng.normal(size=(N, 3)).astype(np.float32) * 0.1,
            "avatar._scales": np.full((N, 3), -6.0, np.float32),
            "avatar._quaternions": np.tile(
                np.asarray([1, 0, 0, 0], np.float32), (N, 1)),
            "avatar._lbs_weights": np.abs(
                rng.normal(size=(N, J))).astype(np.float32),
            "avatar.nerf_encoder.embeddings": rng.normal(
                size=(total, 2)).astype(np.float32) * 1e-2,
            "avatar._betas": rng.normal(size=(10,)).astype(np.float32),
        }
        sd.update({f"avatar.nerf_opacity_and_color_net.{k}": v
                   for k, v in _mlp_sd(
                       "", (enc_cfg.output_dim, 32, 4), rng).items()})
        # deform net: depth-2 MLP + heads
        for i, (cin, cout) in enumerate([(enc_cfg.output_dim + 63, 32),
                                         (32, 32)]):
            sd[f"avatar.deform_model.layers.{i}.weight"] = rng.normal(
                size=(cout, cin)).astype(np.float32) * 0.01
            sd[f"avatar.deform_model.layers.{i}.bias"] = np.zeros(cout, np.float32)
        for head, dim in (("gaussian_warp", 3), ("gaussian_rotation", 4),
                          ("gaussian_scaling", 3)):
            sd[f"avatar.deform_model.{head}.weight"] = np.zeros(
                (dim, 32), np.float32)
            sd[f"avatar.deform_model.{head}.bias"] = np.zeros(dim, np.float32)
        # mesh part
        st = model.mesh_parts["face"]
        Fp, G = st.triangles.shape[0], st.n_per_triangle
        sd["avatar.mesh_binding_gaussians.face._bary_coords"] = np.full(
            (Fp, G, 3), 1 / 3, np.float32)
        sd["avatar.mesh_binding_gaussians.face._vertex_coords"] = np.asarray(
            model.smpl.v_template)[np.asarray(st.vertex_indices)]
        sd["avatar.mesh_binding_gaussians.face._scales"] = np.ones(
            (Fp * G, 3), np.float32)

        state = convert_avatar_checkpoint(sd, model)
        assert int(state.num_alive) == N
        np.testing.assert_allclose(
            np.asarray(state.params.positions[:N]), sd["avatar._positions"])
        # extra betas are padded to the model's beta count
        assert state.params.extra_betas.shape == (model.smpl.num_betas,)

        from dreamwaltz_g_tpu.system.avatar import animate

        gs = animate(model, state, None)
        assert np.isfinite(np.asarray(gs.positions)).all()


class TestTorchPthRoundTrip:
    """The full interop path on a structurally-exact dump: a torch-saved
    .pth with the reference's checkpoint wrapper ({'train_step',
    'checkpoints', 'model'}, trainer.py:238-257) and scene key layout ->
    load_torch_checkpoint -> convert_avatar_checkpoint -> animate ->
    rendered image. No --log.debug anywhere."""

    def test_pth_to_rendered_image(self, tmp_path):
        torch = pytest.importorskip("torch")
        from dreamwaltz_g_tpu.convert_reference import load_torch_checkpoint
        from dreamwaltz_g_tpu.data.camera import make_camera_batch
        from dreamwaltz_g_tpu.training.gs_trainer import make_avatar_render

        rng = np.random.default_rng(3)
        setup = ts.tiny_avatar_setup(capacity=64, n_points=32)
        model = setup.model
        enc_cfg = model.enc_cfg
        N = 40
        total = sum(enc_cfg.level_table_size(l)
                    for l in range(enc_cfg.num_levels))
        J = model.smpl.num_joints

        def t(a):
            return torch.from_numpy(np.ascontiguousarray(a))

        sd = {
            "avatar._positions": t(rng.normal(size=(N, 3)).astype(np.float32) * 0.1),
            "avatar._scales": t(np.full((N, 3), -6.0, np.float32)),
            "avatar._quaternions": t(np.tile(
                np.asarray([1, 0, 0, 0], np.float32), (N, 1))),
            "avatar._lbs_weights": t(np.abs(
                rng.normal(size=(N, J))).astype(np.float32)),
            "avatar.nerf_encoder.embeddings": t(rng.normal(
                size=(total, 2)).astype(np.float32) * 1e-2),
            "avatar._betas": t(rng.normal(size=(10,)).astype(np.float32)),
        }
        for k, v in _mlp_sd("", (enc_cfg.output_dim, 32, 4), rng).items():
            sd[f"avatar.nerf_opacity_and_color_net.{k}"] = t(v)
        for i, (cin, cout) in enumerate([(enc_cfg.output_dim + 63, 32),
                                         (32, 32)]):
            sd[f"avatar.deform_model.layers.{i}.weight"] = t(
                rng.normal(size=(cout, cin)).astype(np.float32) * 0.01)
            sd[f"avatar.deform_model.layers.{i}.bias"] = t(
                np.zeros(cout, np.float32))
        for head, dim in (("gaussian_warp", 3), ("gaussian_rotation", 4),
                          ("gaussian_scaling", 3)):
            sd[f"avatar.deform_model.{head}.weight"] = t(
                np.zeros((dim, 32), np.float32))
            sd[f"avatar.deform_model.{head}.bias"] = t(
                np.zeros(dim, np.float32))
        st = model.mesh_parts["face"]
        Fp, G = st.triangles.shape[0], st.n_per_triangle
        sd["avatar.mesh_binding_gaussians.face._bary_coords"] = t(
            np.full((Fp, G, 3), 1 / 3, np.float32))
        sd["avatar.mesh_binding_gaussians.face._vertex_coords"] = t(
            np.asarray(model.smpl.v_template)[np.asarray(st.vertex_indices)])
        sd["avatar.mesh_binding_gaussians.face._scales"] = t(
            np.ones((Fp * G, 3), np.float32))

        path = tmp_path / "step_015000.pth"
        torch.save({"train_step": 15000,
                    "checkpoints": ["step_015000.pth"],
                    "model": sd}, str(path))

        loaded = load_torch_checkpoint(str(path))
        assert isinstance(loaded["avatar._positions"], np.ndarray)
        state = convert_avatar_checkpoint(loaded, model, capacity=64)
        assert int(state.num_alive) == N

        H = W = 32
        cam = make_camera_batch(2.5, 30.0, 80.0, 60.0, H, W)
        render = make_avatar_render(model, H, W, tile_size=8, capacity=64,
                                    chunk=32)
        img, alpha, depth = render(
            state, setup.observed, cam.extrinsic[0], cam.intrinsics[0],
            cam.tanfov[0], jnp.zeros((H, W, 3)))
        img = np.asarray(img)
        assert img.shape == (H, W, 3) and np.isfinite(img).all()
        assert float(np.asarray(alpha).max()) > 0.0, \
            "converted avatar rendered nothing"

    def test_nerf_pth_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        from dreamwaltz_g_tpu.convert_reference import load_torch_checkpoint

        rng = np.random.default_rng(4)
        cfg = NeRFConfig(backbone="tiledgrid", num_levels=4, level_dim=2, base_resolution=4,
                         desired_resolution=32, log2_hashmap_size=8,
                         bound=1.0)
        model = build_nerf(cfg)
        enc_cfg = model.enc_cfg
        total = sum(enc_cfg.level_table_size(l) for l in range(4))
        sd = {"encoder.embeddings": rng.normal(
            size=(total, 2)).astype(np.float32) * 1e-2}
        sd.update(_mlp_sd("sigma_net.", (enc_cfg.output_dim, 64, 64, 4), rng))
        sd = {k: torch.from_numpy(v) for k, v in sd.items()}
        path = tmp_path / "step_005000.pth"
        torch.save({"train_step": 5000, "model": sd}, str(path))

        loaded = load_torch_checkpoint(str(path))
        params = convert_nerf_checkpoint(loaded, enc_cfg,
                                         with_background=False)
        pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(16, 3)), jnp.float32)
        sigma, albedo = model.density(params, pts)
        assert np.isfinite(np.asarray(sigma)).all()


class TestGaussianConversion:
    def test_vanilla_model(self):
        rng = np.random.default_rng(2)
        N = 50
        sd = {
            "_positions": rng.normal(size=(N, 3)).astype(np.float32),
            "_sh_features_dc": rng.normal(size=(N, 1, 3)).astype(np.float32),
            "_sh_features_rest": rng.normal(size=(N, 15, 3)).astype(np.float32),
            "_opacities": rng.normal(size=(N, 1)).astype(np.float32),
            "_scales": np.full((N, 3), -5.0, np.float32),
            "_quaternions": np.tile(np.asarray([1, 0, 0, 0], np.float32),
                                    (N, 1)),
        }
        state = convert_gaussian_checkpoint(sd, capacity=64)
        assert state.capacity == 64 and int(state.num_alive) == N
        from dreamwaltz_g_tpu.gaussian.model import scales

        s = np.asarray(scales(state.params)[:N])
        np.testing.assert_allclose(s, np.exp(-5.0), rtol=1e-5)
