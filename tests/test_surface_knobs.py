"""Behavior tests for the reference CLI-surface knobs honored this round:
avatar_scale/avatar_transl scene placement, nerf_exclusion_bboxes,
detach_bg_weights_sum, grad_rgb_clip_mask_guidance, grad_viz.
(Parse-surface coverage itself lives in test_config_surface.py.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# heavyweight e2e module: excluded from the fast profile (pytest.ini)
pytestmark = pytest.mark.slow


class TestPlaceGaussians:
    def _gs(self, n=4):
        from dreamwaltz_g_tpu.system.avatar import GaussiansOut
        return GaussiansOut(
            positions=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
            colors=jnp.ones((n, 3)), opacities=jnp.ones((n,)),
            scales=jnp.full((n, 3), 0.5), quats=jnp.zeros((n, 4)),
            alive=jnp.ones((n,), bool), densify_mask=jnp.zeros((n,), bool))

    def test_scalar_scale_and_transl(self):
        from dreamwaltz_g_tpu.system.avatar import place_gaussians
        gs = self._gs()
        out = place_gaussians(gs, scale=np.float32(2.0),
                              transl=np.asarray([1.0, 0.0, -1.0]))
        np.testing.assert_allclose(
            np.asarray(out.positions),
            np.asarray(gs.positions) * 2.0 + np.asarray([1.0, 0.0, -1.0]),
            rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.scales),
                                   np.asarray(gs.scales) * 2.0)

    def test_per_avatar_indexing(self):
        from dreamwaltz_g_tpu.system.avatar import place_gaussians
        gs = self._gs()
        scale = np.asarray([0.5, 2.0], np.float32)          # (A,)
        transl = np.asarray([[1, 0, 0], [0, 0, 3]], np.float32)  # (A, 3)
        out1 = place_gaussians(gs, scale, transl, index=1)
        np.testing.assert_allclose(
            np.asarray(out1.positions),
            np.asarray(gs.positions) * 2.0 + np.asarray([0, 0, 3.0]),
            rtol=1e-6)

    def test_none_is_identity(self):
        from dreamwaltz_g_tpu.system.avatar import place_gaussians
        gs = self._gs()
        out = place_gaussians(gs, None, None)
        np.testing.assert_array_equal(np.asarray(out.positions),
                                      np.asarray(gs.positions))


class TestExclusionBboxes:
    def test_corner_format_multibox(self):
        from dreamwaltz_g_tpu.nerf.export import remove_points_inside_bboxes
        from dreamwaltz_g_tpu.utils.point_cloud import BasicPointCloud
        pts = np.asarray([[0, 0, 0], [2, 2, 2], [5, 5, 5], [-3, 0, 0]],
                         np.float32)
        pc = BasicPointCloud(points=pts, colors=pts * 0.1, normals=None)
        # two boxes given as corner lists (the reference derives min/max by
        # amin/amax over corners, to_point_cloud.py:103-104)
        boxes = [
            [(-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)],
            [(4.0, 4.0, 4.0), (6.0, 6.0, 6.0)],
        ]
        out = remove_points_inside_bboxes(pc, boxes)
        np.testing.assert_array_equal(
            out.points, np.asarray([[2, 2, 2], [-3, 0, 0]], np.float32))
        assert out.colors.shape == (2, 3)

    def test_single_box_flat_form(self):
        from dreamwaltz_g_tpu.nerf.export import remove_points_inside_bboxes
        from dreamwaltz_g_tpu.utils.point_cloud import BasicPointCloud
        pts = np.asarray([[0, 0, 0], [9, 9, 9]], np.float32)
        pc = BasicPointCloud(points=pts, colors=None, normals=None)
        out = remove_points_inside_bboxes(
            pc, [(-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)])
        np.testing.assert_array_equal(out.points,
                                      np.asarray([[9, 9, 9]], np.float32))


class TestIsolatedCellFilter:
    def test_islands_dropped_shell_kept(self):
        from dreamwaltz_g_tpu.nerf.export import filter_isolated_cells
        mask = np.zeros((16, 16, 16), bool)
        mask[4:10, 4:10, 4:10] = True       # a solid blob (the body)
        mask[0, 0, 0] = True                # 1-cell ghost island
        mask[14, 14, 14] = True             # 2-cell ghost island
        mask[14, 15, 14] = True             # (each has exactly 1 neighbor)
        out = filter_isolated_cells(mask, min_neighbors=2)
        assert not out[0, 0, 0] and not out[14, 14, 14] \
            and not out[14, 15, 14]
        # the blob survives intact — every blob cell (incl. corners, which
        # have 7 in-blob neighbors) clears min_neighbors=2
        np.testing.assert_array_equal(out[4:10, 4:10, 4:10],
                                      mask[4:10, 4:10, 4:10])
        assert out.sum() == 6 ** 3

    def test_zero_is_reference_identity(self):
        from dreamwaltz_g_tpu.nerf.export import filter_isolated_cells
        rng = np.random.default_rng(0)
        mask = rng.uniform(size=(8, 8, 8)) > 0.7
        np.testing.assert_array_equal(filter_isolated_cells(mask, 0), mask)


class TestDetachBgWeightsSum:
    def test_no_grad_through_background_term(self):
        from dreamwaltz_g_tpu.nerf.renderer import composite_background
        img = jnp.zeros((4, 3))
        bg = jnp.ones((3,))

        def loss(ws, detach):
            out = composite_background(img, ws, bg,
                                       detach_weights_sum=detach)
            return jnp.sum(out)

        ws = jnp.full((4,), 0.3)
        g_plain = jax.grad(lambda w: loss(w, False))(ws)
        g_detached = jax.grad(lambda w: loss(w, True))(ws)
        assert np.abs(np.asarray(g_plain)).max() > 0.1
        np.testing.assert_allclose(np.asarray(g_detached), 0.0)


class TestMaskedGradHook:
    def test_mask_zeroes_and_scales_stats(self):
        from dreamwaltz_g_tpu.guidance.sds import make_rgb_grad_hook
        hook = make_rgb_grad_hook(True, False, grad_clip_scale=3.0,
                                  with_mask=True)
        assert getattr(hook, "wants_mask", False)
        x = jnp.ones((4, 4, 3))
        mask = jnp.zeros((4, 4, 1)).at[:2].set(1.0)

        def loss(v):
            return jnp.sum(hook(v, mask) * jnp.arange(48.0).reshape(4, 4, 3))

        g = np.asarray(jax.grad(loss)(x))
        # masked-out rows contribute zero gradient
        assert np.abs(g[2:]).max() == 0.0
        assert np.abs(g[:2]).max() > 0.0

    def test_unmasked_hook_unchanged(self):
        from dreamwaltz_g_tpu.guidance.sds import make_rgb_grad_hook
        hook = make_rgb_grad_hook(True, False)
        assert not getattr(hook, "wants_mask", False)
        g = jax.grad(lambda v: jnp.sum(hook(v) * 2.0))(jnp.ones((2, 2, 3)))
        assert np.isfinite(np.asarray(g)).all()


class TestMaskGuidanceStageGuard:
    def test_gs_stage_raises(self, tmp_path):
        from dreamwaltz_g_tpu.configs import parse_args
        from dreamwaltz_g_tpu.training.trainer import Trainer
        cfg = parse_args([
            "--stage", "gs", "--log.debug", "true",
            "--log.exp_root", str(tmp_path), "--log.exp_name", "guard",
            "--guide.grad_rgb_clip", "true",
            "--guide.grad_rgb_clip_mask_guidance", "true",
            "--optim.iters", "1",
        ])
        with pytest.raises(ValueError, match="stage-1"):
            Trainer(cfg)


def _tiny_tokenizer(tmp_path):
    """Minimal byte-level CLIP vocab (no merges) — enough for BPE to fall
    back to byte tokens, which is all add_token interaction needs."""
    import json

    from dreamwaltz_g_tpu.guidance.clip_text import (CLIPTokenizer,
                                                     _bytes_to_unicode)
    chars = list(_bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n")
    return CLIPTokenizer(str(vp), str(mp))


class TestConceptMerge:
    def test_add_token_and_encode(self, tmp_path):
        tok = _tiny_tokenizer(tmp_path)
        v = len(tok.encoder)
        tid = tok.add_token("<my-concept>")
        assert tid == v
        ids = tok.encode("a <my-concept> b")
        assert tid in ids
        # surrounding words still byte-tokenize
        assert len(ids) >= 3
        with pytest.raises(ValueError):
            tok.add_token("<my-concept>")

    def test_merge_concept_grows_table(self, tmp_path):
        from dreamwaltz_g_tpu.guidance.convert import merge_concept
        tok = _tiny_tokenizer(tmp_path)
        V, D = len(tok.encoder), 8
        rng = np.random.RandomState(0)
        clip_p = {"params": {"token_embedding": {
            "embedding": jnp.asarray(rng.randn(V, D), jnp.float32)}}}
        emb = rng.randn(D).astype(np.float32)
        np.savez(tmp_path / "learned_embeds.npz", **{"<sks>": emb})
        out, token = merge_concept(clip_p, tok,
                                   str(tmp_path / "learned_embeds.npz"))
        assert token == "<sks>"
        table = out["params"]["token_embedding"]["embedding"]
        assert table.shape == (V + 1, D)
        np.testing.assert_allclose(np.asarray(table[-1]), emb, rtol=1e-6)
        # the prompt path resolves the placeholder to the new row
        ids = tok("a photo of <sks>")
        assert (ids == V).sum() == 1


class TestGaussianBackground:
    def _write_ply(self, path, n=32, seed=0):
        from dreamwaltz_g_tpu.utils.point_cloud import save_gaussian_ply
        rng = np.random.RandomState(seed)
        d = dict(
            positions=rng.randn(n, 3).astype(np.float32),
            sh_dc=rng.randn(n, 3).astype(np.float32),
            sh_rest=rng.randn(n, 15, 3).astype(np.float32),
            opacity_logit=rng.randn(n).astype(np.float32),
            log_scales=rng.randn(n, 3).astype(np.float32) * 0.1 - 3.0,
            quats=rng.randn(n, 4).astype(np.float32),
        )
        save_gaussian_ply(str(path), **d)
        return d

    def test_gaussian_ply_roundtrip(self, tmp_path):
        from dreamwaltz_g_tpu.utils.point_cloud import load_gaussian_ply
        d = self._write_ply(tmp_path / "bg.ply")
        out = load_gaussian_ply(str(tmp_path / "bg.ply"))
        for k in d:
            np.testing.assert_allclose(out[k], d[k], rtol=1e-6,
                                       err_msg=k)

    def test_loader_activations(self, tmp_path):
        from dreamwaltz_g_tpu.system.background import (
            load_gaussian_background)
        d = self._write_ply(tmp_path / "bg.ply")
        gs = load_gaussian_background(str(tmp_path / "bg.ply"))
        np.testing.assert_allclose(
            np.asarray(gs.opacities),
            1.0 / (1.0 + np.exp(-d["opacity_logit"])), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gs.scales),
                                   np.exp(d["log_scales"]), rtol=1e-5)
        q = np.asarray(gs.quats)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0,
                                   rtol=1e-5)
        assert not bool(np.asarray(gs.densify_mask).any())

    def test_trainer_merges_background(self, tmp_path):
        """--render.use_gs_background: bg splats render even with the
        avatar translated out of frame."""
        from dreamwaltz_g_tpu.configs import parse_args
        from dreamwaltz_g_tpu.training.trainer import Trainer
        from dreamwaltz_g_tpu.utils.point_cloud import save_gaussian_ply
        rng = np.random.RandomState(3)
        n = 64
        save_gaussian_ply(
            str(tmp_path / "bg.ply"),
            positions=rng.randn(n, 3).astype(np.float32) * 0.3,
            sh_dc=rng.randn(n, 3).astype(np.float32),
            sh_rest=None,
            opacity_logit=np.full(n, 4.0, np.float32),   # ~sigmoid=0.98
            log_scales=np.full((n, 3), -2.5, np.float32),
            quats=np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1)),
        )
        cfg = parse_args([
            "--stage", "gs", "--render.gs_type", "vanilla",
            "--log.debug", "true", "--log.exp_root", str(tmp_path),
            "--log.exp_name", "gsbg", "--optim.iters", "1",
            "--render.n_gaussians", "64",
            "--render.use_gs_background", str(tmp_path / "bg.ply"),
            "--render.avatar_transl", "(50.0, 0.0, 0.0)",  # avatar gone
            "--data.train_w", "16", "--data.eval_h", "24",
            "--data.eval_w", "24", "--data.test_h", "16",
            "--data.test_w", "16",
            "--log.snapshot_interval", "0", "--log.evaluate_interval", "0",
            "--log.save_interval", "0",
        ])
        tr = Trainer(cfg)
        cam = tr.eval_camera(0.0)
        smpl_inputs, _ = tr.prompt()
        bg = jnp.zeros((24, 24, 3))
        _, alpha, _ = tr.eval_render(tr.state.avatar, smpl_inputs,
                                     cam.extrinsic[0], cam.intrinsics[0],
                                     cam.tanfov[0], bg)
        assert float(jnp.sum(alpha)) > 1.0  # background splats visible
        tr.train()  # the single-device train step also merges the bg
        assert tr.train_step == 1


class TestRebuildKeepsSceneKwargs:
    def test_progressive_rebuild_passes_placement(self, tmp_path,
                                                  monkeypatch):
        """_rebuild_train_step (progressive-resolution switches) must carry
        the same placement/static_gaussians the initial builders got —
        regression for the scene silently changing at the 64->128 switch."""
        from dreamwaltz_g_tpu.configs import parse_args
        from dreamwaltz_g_tpu.training import gs_trainer
        from dreamwaltz_g_tpu.training.trainer import Trainer

        captured = []
        orig = gs_trainer.make_vanilla_sds_step

        def spy(*a, **k):
            captured.append(k)
            return orig(*a, **k)

        monkeypatch.setattr(gs_trainer, "make_vanilla_sds_step", spy)
        cfg = parse_args([
            "--stage", "gs", "--render.gs_type", "vanilla",
            "--log.debug", "true", "--log.exp_root", str(tmp_path),
            "--log.exp_name", "rebuild", "--optim.iters", "2",
            "--render.n_gaussians", "64",
            "--render.avatar_transl", "(0.0, 0.3, 0.0)",
            "--data.train_w", "16", "--data.eval_h", "16",
            "--data.eval_w", "16", "--data.test_h", "16",
            "--data.test_w", "16",
            "--log.snapshot_interval", "0", "--log.evaluate_interval", "0",
            "--log.save_interval", "0",
        ])
        tr = Trainer(cfg)
        tr._rebuild_train_step()
        assert len(captured) >= 2  # initial build + rebuild
        for k in captured:
            assert k.get("placement") is not None, \
                "builder called without the configured placement"
            assert "static_gaussians" in k
        # both calls agree
        np.testing.assert_array_equal(captured[0]["placement"][1],
                                      captured[-1]["placement"][1])


class TestGradViz:
    def test_nerf_snapshot_writes_grad_images(self, tmp_path):
        """--guide.grad_viz dumps the decoded latent-gradient images at
        snapshot steps (reference: trainer.py:956 + _Visualizer)."""
        from dreamwaltz_g_tpu.configs import parse_args
        from dreamwaltz_g_tpu.training.trainer import Trainer
        cfg = parse_args([
            "--stage", "nerf", "--log.debug", "true",
            "--log.exp_root", str(tmp_path), "--log.exp_name", "gviz",
            "--guide.grad_viz", "true",
            "--guide.grad_rgb_clip", "true",
            "--guide.grad_rgb_clip_mask_guidance", "true",
            "--optim.iters", "1", "--data.train_w", "16",
            "--data.train_h", "16", "--data.eval_h", "16",
            "--data.eval_w", "16", "--data.test_h", "16",
            "--data.test_w", "16",
            "--log.snapshot_interval", "1",
            "--log.evaluate_interval", "0", "--log.save_interval", "0",
        ])
        tr = Trainer(cfg)
        tr.train()
        snaps = list((tr.exp_dir / "snapshots" / "train").glob("*.png"))
        names = {p.name.split("_", 1)[1] for p in snaps}
        assert "gradmag.png" in names, sorted(names)
        assert "gradtarget.png" in names, sorted(names)


class TestPlacementEndToEnd:
    def test_trainer_parses_and_shifts_render(self, tmp_path):
        """--render.avatar_transl moves the avatar out of frame: the eval
        render's alpha collapses vs the unplaced run."""
        from dreamwaltz_g_tpu.configs import parse_args
        from dreamwaltz_g_tpu.training.trainer import Trainer

        def build(extra):
            cfg = parse_args([
                "--stage", "gs", "--render.gs_type", "vanilla",
                "--log.debug", "true", "--log.exp_root", str(tmp_path),
                "--log.exp_name", "place" + str(len(extra)),
                "--optim.iters", "1", "--render.n_gaussians", "64",
                "--data.train_w", "16", "--data.eval_h", "24",
                "--data.eval_w", "24", "--data.test_h", "16",
                "--data.test_w", "16",
                "--log.snapshot_interval", "0",
                "--log.evaluate_interval", "0", "--log.save_interval", "0",
            ] + extra)
            return Trainer(cfg)

        tr0 = build([])
        cam = tr0.eval_camera(0.0)
        smpl_inputs, _ = tr0.prompt()
        bg = jnp.zeros((24, 24, 3))
        _, a0, _ = tr0.eval_render(tr0.state.avatar, smpl_inputs,
                                   cam.extrinsic[0], cam.intrinsics[0],
                                   cam.tanfov[0], bg)
        tr1 = build(["--render.avatar_transl", "(50.0, 0.0, 0.0)"])
        _, a1, _ = tr1.eval_render(tr1.state.avatar, smpl_inputs,
                                   cam.extrinsic[0], cam.intrinsics[0],
                                   cam.tanfov[0], bg)
        assert float(jnp.sum(a0)) > 1.0          # avatar visible
        assert float(jnp.sum(a1)) < 0.01 * float(jnp.sum(a0))
