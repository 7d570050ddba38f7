"""Tests for R-Precision, VPoser, PLY io, media io, semantics."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from dreamwaltz_g_tpu.human.vposer import (
    VPoser,
    matrix_to_axis_angle,
    rot6d_to_matrix,
    vposer_from_torch,
)
from dreamwaltz_g_tpu.utils.media import (
    read_video,
    save_image,
    to_uint8,
    write_gif,
    write_video,
)
from dreamwaltz_g_tpu.utils.point_cloud import BasicPointCloud, load_ply, save_ply
from dreamwaltz_g_tpu.utils.r_precision import make_tiny_r_precision


class TestRPrecision:
    @pytest.mark.slow  # 8 s; metric math covered fast by test_feature_shapes, e2e by the slow CLI test
    def test_identical_pairs_score_high(self):
        rp = make_tiny_r_precision(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        imgs = rng.uniform(0, 1, size=(6, 32, 32, 3)).astype(np.float32)
        ids = rng.integers(1, 200, size=(6, 16)).astype(np.int32)
        score = rp.retrieve(imgs, ids, top_k=1)
        assert 0.0 <= score <= 1.0
        # retrieving with top_k = N is always a hit
        assert rp.retrieve(imgs, ids, top_k=6) == 1.0

    def test_feature_shapes(self):
        rp = make_tiny_r_precision(jax.random.PRNGKey(1))
        f = rp.image_features(np.zeros((2, 16, 16, 3), np.float32))
        assert f.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1),
                                   1.0, atol=1e-5)


class TestVPoser:
    def test_rot6d_roundtrip(self):
        rng = np.random.default_rng(0)
        aa = rng.normal(size=(10, 3)) * 0.6
        from dreamwaltz_g_tpu.utils.transforms import axis_angle_to_matrix
        R = axis_angle_to_matrix(jnp.asarray(aa)[None])[0]
        six = jnp.concatenate([R[..., 0], R[..., 1]], axis=-1)
        R2 = rot6d_to_matrix(six)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
        aa2 = matrix_to_axis_angle(R2)
        np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)

    def test_sample_shape(self):
        vp = VPoser()
        pose = vp.sample(jax.random.PRNGKey(0), 4)
        assert pose.shape == (4, 63)
        assert np.isfinite(np.asarray(pose)).all()

    def test_torch_conversion_layout(self):
        rng = np.random.default_rng(0)
        sd = {}
        dims = [(512, 32), (512, 512), (126, 512)]
        for i, (o, c) in zip((1, 3, 5), dims):
            sd[f"decoder_net.{i}.weight"] = rng.normal(size=(o, c)).astype(np.float32)
            sd[f"decoder_net.{i}.bias"] = np.zeros(o, np.float32)
        vp = vposer_from_torch(sd)
        pose = vp.sample(jax.random.PRNGKey(1), 2)
        assert pose.shape == (2, 63)


class TestPointCloudIO:
    def test_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        pc = BasicPointCloud(
            points=rng.normal(size=(100, 3)).astype(np.float32),
            colors=rng.uniform(0, 1, size=(100, 3)).astype(np.float32),
            normals=rng.normal(size=(100, 3)).astype(np.float32))
        p = save_ply(str(tmp_path / "x.ply"), pc)
        back = load_ply(p)
        np.testing.assert_allclose(back.points, pc.points, atol=1e-6)
        np.testing.assert_allclose(back.colors, pc.colors, atol=1 / 255.0)


class TestMedia:
    def test_to_uint8(self):
        img = np.linspace(0, 1, 12).reshape(2, 2, 3)
        u = to_uint8(img)
        assert u.dtype == np.uint8 and u.max() == 255

    def test_video_roundtrip(self, tmp_path):
        frames = [np.full((32, 32, 3), c, np.float32) for c in (0.1, 0.5, 0.9)]
        p = write_video(str(tmp_path / "v.mp4"), frames, fps=5)
        back = read_video(p)
        assert back.shape == (3, 32, 32, 3)
        # mp4 is lossy; mid-gray frame should survive approximately
        assert abs(float(back[1].mean()) - 0.5) < 0.1

    def test_gif_and_image(self, tmp_path):
        frames = [np.zeros((8, 8, 3)), np.ones((8, 8, 3))]
        write_gif(str(tmp_path / "a.gif"), frames, fps=2)
        save_image(str(tmp_path / "i.png"), frames[1])
        assert (tmp_path / "a.gif").exists() and (tmp_path / "i.png").exists()


class TestSemantics:
    def test_parts_without_segmentation(self):
        from dreamwaltz_g_tpu.human.semantics import get_semantic_parts
        from dreamwaltz_g_tpu.human.smplx_model import make_synthetic_model

        model = make_synthetic_model()
        assert get_semantic_parts(model, "hands", root="/nonexistent") is None

    def test_parts_with_fixture_segmentation(self):
        from dreamwaltz_g_tpu.human.semantics import (
            faces_of_vertices,
            get_semantic_parts,
        )
        from dreamwaltz_g_tpu.human.smplx_model import make_synthetic_model

        model = make_synthetic_model()
        seg = {"head": list(range(0, 30)), "leftHand": list(range(30, 50)),
               "rightHand": list(range(50, 70)),
               "leftHandIndex1": [], "rightHandIndex1": []}
        out = get_semantic_parts(model, "hands", segmentation=seg)
        assert out is not None
        vids, fids = out
        assert set(vids) == set(range(30, 70))
        # every returned face uses only part vertices
        f = np.asarray(model.faces)[fids]
        assert np.isin(f, vids).all()

    def test_label_fusion_matches_reference_semantics(self):
        """Golden test of the fused tables on a strip mesh where the
        reference algorithm (smpl_model.py:444-510) can be mirrored
        brute-force: FLAME face wins over json head, MANO tables appear,
        wrists = forearm∩hand dilated 3 rings, wrist faces use any-vertex
        membership while other parts use all-vertex."""
        from dreamwaltz_g_tpu.human.semantics import SMPLSemantics

        # strip mesh: vertices 0..N-1 in a line, triangles (i, i+1, i+2)
        N = 40
        faces = np.stack([np.arange(N - 2), np.arange(1, N - 1),
                          np.arange(2, N)], axis=1)
        seg = {
            "leftForeArm": list(range(0, 12)),
            "leftHand": list(range(10, 20)),
            "leftHandIndex1": [20],
            "rightForeArm": list(range(22, 30)),
            "rightHand": list(range(28, 36)),
            "rightHandIndex1": [],
            "head": list(range(36, 40)),
            "eyeballs": [39],
            "spine": [21], "spine1": [], "spine2": [],
            "leftShoulder": [], "rightShoulder": [],
            "hips": [], "leftLeg": [], "rightLeg": [],
            "leftUpLeg": [], "rightUpLeg": [],
            "leftFoot": [], "rightFoot": [],
            "leftToeBase": [], "rightToeBase": [],
            "neck": [38],
            "leftArm": [], "rightArm": [],
        }
        flame = {"face": [36, 37], "scalp": [38], "eye_region": [37]}
        mano = {"left_hand": list(range(10, 21)),
                "right_hand": list(range(28, 36))}
        sem = SMPLSemantics(faces, N, seg, flame=flame, mano=mano)

        # FLAME face (not the json head)
        assert sem.label_to_vertices["face"].tolist() == [36, 37]
        assert sem.label_to_vertices["scalp"].tolist() == [38]
        assert sem.label_to_vertices["eyes"].tolist() == [39]
        # MANO alternative tables exist
        assert sem.label_to_vertices["hands_MANO"].tolist() == \
            sorted(set(mano["left_hand"]) | set(mano["right_hand"]))
        # skin = everything minus eyeballs
        assert sem.label_to_vertices["skin"].tolist() == list(range(39))

        # wrist_left: forearm∩hand = {10, 11}; 3-ring dilation on the strip
        # adds ±2 neighbors per ring -> [4..17]
        core = {10, 11}
        adj = {i: set(range(max(0, i - 2), min(N, i + 3))) - {i}
               for i in range(N)}
        for _ in range(3):
            core = core | {x for v in core for x in adj[v]}
        assert set(sem.label_to_vertices["wrist_left"].tolist()) == core
        # wrists = union of the two rings
        wl = set(sem.label_to_vertices["wrist_left"].tolist())
        wr = set(sem.label_to_vertices["wrist_right"].tolist())
        assert set(sem.label_to_vertices["wrists"].tolist()) == wl | wr

        # faces: strict for hands (all 3 vertices inside), loose for wrists
        hl = set(sem.label_to_vertices["hand_left"].tolist())
        for fid in sem.label_to_faces["hand_left"]:
            assert set(faces[fid]).issubset(hl)
        loose = sem.label_to_faces["wrist_left"]
        assert any(not set(faces[fid]).issubset(wl) for fid in loose) or \
            all(set(faces[fid]) & wl for fid in loose)
        for fid in loose:
            assert set(faces[fid]) & wl

    def test_get_semantic_parts_face_falls_back_without_flame(self):
        """Without FLAME assets the 'face' part = json head minus eyeballs."""
        from dreamwaltz_g_tpu.human.semantics import get_semantic_parts
        from dreamwaltz_g_tpu.human.smplx_model import make_synthetic_model

        model = make_synthetic_model()
        seg = {"head": list(range(0, 30)), "eyeballs": [0, 1],
               "leftHand": [], "rightHand": [],
               "leftHandIndex1": [], "rightHandIndex1": []}
        out = get_semantic_parts(model, "face", segmentation=seg,
                                 root="/nonexistent")
        assert out is not None
        vids, _ = out
        assert set(vids) == set(range(2, 30))


class TestVanillaAvatar:
    def test_init_and_animate(self):
        from dreamwaltz_g_tpu.human.smplx_model import (
            default_params,
            make_synthetic_model,
        )
        from dreamwaltz_g_tpu.system.vanilla import (
            VanillaAvatarModel,
            animate_vanilla,
            init_vanilla_avatar,
        )

        smpl = make_synthetic_model()
        model = VanillaAvatarModel(smpl=smpl,
                                   canonical_inputs=default_params(smpl))
        rng = np.random.default_rng(0)
        cloud = jnp.asarray(rng.normal(size=(50, 3)) * 0.15
                            + np.asarray([0, 0.7, 0]), jnp.float32)
        state = init_vanilla_avatar(model, cloud, capacity=80)
        assert state.capacity == 80
        gs = animate_vanilla(model, state)
        # canonical animate reproduces the input cloud (inverse then forward)
        np.testing.assert_allclose(np.asarray(gs.positions[:50]),
                                   np.asarray(cloud), atol=1e-3)
        # posed animate moves points
        p = default_params(smpl)._replace(
            body_pose=jnp.ones((1, 63)) * 0.3)
        gs2 = animate_vanilla(model, state, p)
        assert not np.allclose(np.asarray(gs2.positions[:50]),
                               np.asarray(cloud), atol=1e-3)


class TestMeshLosses:
    def _mesh(self):
        # two triangles sharing an edge, initially coplanar
        v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
        f = np.asarray([[0, 1, 2], [1, 3, 2]])
        return jnp.asarray(v), jnp.asarray(f)

    def test_normal_consistency(self):
        from dreamwaltz_g_tpu.training.losses import (
            face_adjacency_from_faces,
            normal_consistency_loss,
        )

        v, f = self._mesh()
        adj = jnp.asarray(face_adjacency_from_faces(np.asarray(f)))
        assert adj.shape[0] == 1
        flat = normal_consistency_loss(v, f, adj)
        assert float(flat) < 1e-6
        v_bent = v.at[3, 2].set(1.0)
        assert float(normal_consistency_loss(v_bent, f, adj)) > 0.1

    def test_laplacian(self):
        from dreamwaltz_g_tpu.training.losses import laplacian_smoothing_loss

        v, f = self._mesh()
        smooth = laplacian_smoothing_loss(v, f)
        spike = laplacian_smoothing_loss(v.at[0, 2].set(2.0), f)
        assert float(spike) > float(smooth)


class TestTimePrioritizedLR:
    def test_weights(self):
        from dreamwaltz_g_tpu.guidance.time_prior import (
            TimePrioritizedLR,
            make_schedule,
        )

        tplr = TimePrioritizedLR(make_schedule())
        assert tplr(999) == 1.0  # max-noise timestep has max weight
        assert 0 < tplr(100) < tplr(500) < 1.0


class TestPGCSuppress:
    def test_all_types_bound_gradients(self):
        from dreamwaltz_g_tpu.guidance.sds import make_pgc_suppress

        x = jnp.ones((4, 4, 3))
        for st in range(6):
            pgc = make_pgc_suppress(0.1, st)
            g = jax.grad(lambda v: jnp.sum(pgc(v) * 100.0))(x)
            assert np.isfinite(np.asarray(g)).all()
            if st in (0, 1, 2, 4, 5):
                assert float(jnp.abs(g).max()) <= 0.1 + 1e-6


class TestOverlay:
    def test_overlay_blend_math(self):
        from dreamwaltz_g_tpu.utils.overlay import overlay_rgba_on_frame

        rgba = np.zeros((8, 8, 4), np.float32)
        rgba[..., 0] = 1.0   # red, straight alpha
        rgba[..., 3] = 0.25
        frame = np.full((8, 8, 3), 0.8, np.float32)
        out = overlay_rgba_on_frame(rgba, frame)
        np.testing.assert_allclose(out[0, 0], [0.25 + 0.75 * 0.8,
                                               0.6, 0.6], atol=1e-6)
        # premultiplied: rgb already alpha-weighted
        rgba_p = rgba.copy()
        rgba_p[..., 0] = 0.25
        out_p = overlay_rgba_on_frame(rgba_p, frame, premultiplied=True)
        np.testing.assert_allclose(out, out_p, atol=1e-6)

    def test_overlay_resizes_to_smaller(self, tmp_path):
        from dreamwaltz_g_tpu.utils.overlay import overlay_frames_on_video

        rgba = [np.ones((16, 16, 4), np.float32) for _ in range(3)]
        vid = [np.zeros((8, 8, 3), np.float32) for _ in range(3)]
        p = overlay_frames_on_video(rgba, vid, str(tmp_path / "overlay.mp4"),
                                    fps=5, save_images=True)
        import os
        assert os.path.isfile(p)
        assert os.path.isfile(str(tmp_path / "overlay_frames" / "000000.png"))


class TestEvalRPrecisionScript:
    @pytest.mark.slow  # 15 s CLI e2e; the metric math stays fast above
    def test_tiny_towers_end_to_end(self, tmp_path):
        """scripts/eval_r_precision.py — the paper's batch retrieval
        protocol (reference ships the tool unwired, utils/r_precision.py)."""
        import subprocess
        import sys

        import numpy as np
        from PIL import Image

        renders = tmp_path / "renders"
        renders.mkdir()
        prompts = ["a wizard", "a knight", "a dancer"]
        (tmp_path / "prompts.txt").write_text("\n".join(prompts))
        rng = np.random.RandomState(0)
        for i in range(3):
            Image.fromarray(
                (rng.rand(48, 48, 3) * 255).astype("uint8")).save(
                renders / f"{i:03d}.png")
        r = subprocess.run(
            [sys.executable, "scripts/eval_r_precision.py",
             "--renders", str(renders),
             "--prompts", str(tmp_path / "prompts.txt"),
             "--tiny", "--platform", "cpu"],
            capture_output=True, text=True, timeout=500,
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-500:]
        import json

        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["n"] == 3 and 0.0 <= out["top1"] <= 1.0
