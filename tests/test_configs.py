from dreamwaltz_g_tpu.configs import TrainConfig, parse_args, to_dict
from dreamwaltz_g_tpu.configs.prompts import get_avatar_list


def test_default_config_builds():
    cfg = TrainConfig()
    assert cfg.stage == "gs"
    assert cfg.data.azimuth_range == ((0, 360),)
    assert cfg.data.face_azimuth_range == ((0, 90), (270, 360))
    assert cfg.guide.controlnet_condition == ["pose"]


def test_parse_args_sections():
    cfg = parse_args(
        [
            "--stage", "nerf",
            "--guide.text", "a wizard",
            "--guide.guidance_scale", "25.5",
            "--optim.iters", "100",
            "--data.elevation_range", "(45, 135)",
            "--nerf.lambda_opacity", "1e-3",
            "--log.eval_only", "true",
            "--render.n_gaussians=4096",
        ]
    )
    assert cfg.stage == "nerf"
    assert cfg.guide.text == "a wizard"
    assert cfg.guide.guidance_scale == 25.5
    assert cfg.optim.iters == 100
    assert cfg.data.elevation_range == ((45, 135),)
    assert cfg.nerf.lambda_opacity == 1e-3
    assert cfg.render.n_gaussians == 4096
    # eval_only with no ckpt flips resume on (reference: configs/__init__.py:543-545)
    assert cfg.log.eval_only and cfg.optim.resume


def test_parse_args_rejects_unknown():
    import pytest

    with pytest.raises(ValueError):
        parse_args(["--guide.not_a_field", "1"])
    with pytest.raises(ValueError):
        parse_args(["--nosuchsection.x", "1"])


def test_pretrain_forces_depth_raw():
    cfg = parse_args(["--log.pretrain_only", "true"])
    assert cfg.guide.controlnet_condition == ["depth_raw"]


def test_config_serializes():
    d = to_dict(TrainConfig())
    assert d["guide"]["guidance_scale"] == 50.0
    assert isinstance(d["parallel"]["dp"], int)


def test_prompt_sets():
    full = get_avatar_list("demo")
    assert len(full) >= 10
    sl = get_avatar_list("demo,2-4")
    assert sl == full[1:4]


def test_prompt_library_breadth(tmp_path):
    """The library carries 60+ character prompts plus the txt-file loader
    (reference: configs/prompts.py avatar_prompts + read_txt_file)."""
    from dreamwaltz_g_tpu.configs.prompts import PROMPT_SETS

    chars = get_avatar_list("characters")
    assert len(chars) >= 60
    slugs = [s for s, _ in chars]
    assert len(set(slugs)) == len(slugs)  # unique slugs
    assert len(get_avatar_list("diverse")) >= 30
    assert len(get_avatar_list("everyday")) >= 15
    assert "eval" in PROMPT_SETS
    # txt file loading
    p = tmp_path / "my_prompts.txt"
    p.write_text("# comment\na wizard\na knight,\n\n")
    loaded = get_avatar_list(str(p))
    assert [t for _, t in loaded] == ["a wizard", "a knight"]
    sliced = get_avatar_list("characters,3-5")
    assert sliced == chars[2:5]
