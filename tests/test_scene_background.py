"""Tests for scene composition, backgrounds, prompts, and config parsing."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamwaltz_g_tpu.configs import TrainConfig, parse_args
from dreamwaltz_g_tpu.configs.prompts import get_avatar_list
from dreamwaltz_g_tpu.data.camera import make_camera_batch
from dreamwaltz_g_tpu.system.background import (

    BackgroundMLPNet,
    MLPBackground,
    PureColorBackground,
    VideoBackground,
)



# heavyweight e2e module: excluded from the fast profile (pytest.ini)
import pytest  # noqa: E402
pytestmark = pytest.mark.slow

class TestBackgrounds:
    def test_pure_color(self):
        cam = make_camera_batch(2.0, 0.0, 90.0, 60.0, 16, 16)
        bg = PureColorBackground.make("gray")(cam)
        assert bg.shape == (16, 16, 3)
        np.testing.assert_allclose(np.asarray(bg), 0.5)

    def test_mlp_background(self):
        cam = make_camera_batch(2.0, 0.0, 90.0, 60.0, 16, 16)
        mlp = MLPBackground()
        params = mlp.init(jax.random.PRNGKey(0))
        bg = mlp(params, cam)
        assert bg.shape == (16, 16, 3)
        assert 0.0 <= float(bg.min()) and float(bg.max()) <= 1.0
        # view-dependent: a different azimuth gives a different background
        cam2 = make_camera_batch(2.0, 120.0, 90.0, 60.0, 16, 16)
        bg2 = mlp(params, cam2)
        assert not np.allclose(np.asarray(bg), np.asarray(bg2))

    def test_video_background_cycles(self):
        frames = np.stack([np.full((8, 8, 3), c, np.float32)
                           for c in (0.1, 0.9)])
        vb = VideoBackground(frames)
        cam = make_camera_batch(2.0, 0.0, 90.0, 60.0, 8, 8)
        np.testing.assert_allclose(np.asarray(vb(cam, 0)).mean(), 0.1,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(vb(cam, 3)).mean(), 0.9,
                                   atol=1e-6)


class TestPromptSets:
    def test_full_set(self):
        lst = get_avatar_list("demo")
        assert len(lst) >= 10
        slug, text = lst[0]
        assert " " not in slug and len(text) > 10

    def test_sliced_set(self):
        lst = get_avatar_list("demo,2-4")
        full = get_avatar_list("demo")
        assert lst == full[1:4]  # 1-based inclusive


class TestConfigCLI:
    def test_nested_flags(self):
        cfg = parse_args([
            "--guide.text", "a knight", "--stage", "nerf",
            "--optim.iters", "123", "--data.train_w", "64,128",
            "--render.bg_color", "(0.5,0.5,0.5)",
            "--nerf.lambda_opacity", "0.01",
            "--log.debug", "true",
        ])
        assert cfg.guide.text == "a knight" and cfg.stage == "nerf"
        assert cfg.optim.iters == 123
        assert cfg.data.train_w == "64,128"
        assert tuple(cfg.render.bg_color) == (0.5, 0.5, 0.5)
        assert cfg.nerf.lambda_opacity == 0.01 and cfg.log.debug

    def test_equals_syntax_and_unknown(self):
        cfg = parse_args(["--optim.seed=7"])
        assert cfg.optim.seed == 7
        import pytest

        with pytest.raises(ValueError):
            parse_args(["--no.such", "1"])

    def test_post_init_invariants(self):
        cfg = parse_args(["--log.pretrain_only", "true"])
        assert cfg.guide.controlnet_condition == ["depth_raw"]
        cfg2 = parse_args(["--log.nerf2gs", "true", "--stage", "nerf"])
        assert cfg2.stage == "gs"


class TestSceneForward:
    def test_scene_with_extra_avatar(self):
        from dreamwaltz_g_tpu import tests_support as ts
        from dreamwaltz_g_tpu.system.scene import Scene

        s1 = ts.tiny_avatar_setup(capacity=64, n_points=32, seed=0)
        s2 = ts.tiny_avatar_setup(capacity=64, n_points=32, seed=1)
        scene = Scene(model=s1.model, extra_models=(s2.model,))
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, 32, 32)
        bg = jnp.zeros((32, 32, 3))
        out = scene.forward(s1.state, cam, bg, extra_states=(s2.state,),
                            tile_size=8, capacity=64, chunk=32)
        assert out.image.shape == (32, 32, 3)
        assert out.radii.shape[0] == 64 + s1.model.n_mesh_points \
            + 64 + s2.model.n_mesh_points
