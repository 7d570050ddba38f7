"""Tests for motion dataset loaders, preprocessing, and the SMPLPrompt hub."""
import os.path as osp
import pickle
import zipfile

import numpy as np
import pytest

from dreamwaltz_g_tpu.configs import PromptConfig
from dreamwaltz_g_tpu.data.motion import (
    expand_humans,
    load_smpl_sequences,
    parse_scene,
    preprocess_smpl_sequences,
)
from dreamwaltz_g_tpu.data.motion.loaders import (
    AIST,
    Demo,
    MotionX,
    _rotmat_to_axis_angle,
)
from dreamwaltz_g_tpu.human.prompt import (
    SMPLPrompt,
    get_smpl_inputs,
    parse_betas,
    parse_scene_type,
    sample_betas,
)
from dreamwaltz_g_tpu.human.smplx_model import make_synthetic_model, smplx_forward


class TestParseScene:
    def test_plain(self):
        assert parse_scene("aist,dance") == ("aist", "dance", None, None)

    def test_range(self):
        assert parse_scene("3dpw,dance,200-275") == ("3dpw", "dance", (200, 275), None)

    def test_range_interval(self):
        assert parse_scene("3dpw,dance,200-275-5") == ("3dpw", "dance", (200, 275), 5)

    def test_scene_types(self):
        assert parse_scene_type("canonical-A") == "canonical"
        assert parse_scene_type("random-body,hand") == "random"
        assert parse_scene_type("vposer") == "random"
        assert parse_scene_type("aist,dance") == "motion"


class TestDemoLoader:
    def test_reference_assets(self):
        root = "/root/reference/assets/motions"
        if not osp.isdir(root):
            pytest.skip("reference assets unavailable")
        demo = Demo(root=root)
        seqs = demo.get_smpl_params("aist")
        assert seqs["body_pose"].shape == (1, 240, 63)
        assert seqs["left_hand_pose"].shape == (1, 240, 45)
        assert seqs["expression"].shape == (1, 240, 100)

    def test_load_via_scene_string(self, tmp_path):
        arr = np.random.default_rng(0).normal(size=(30, 265)).astype(np.float32)
        np.save(tmp_path / "wave.npy", arr)
        seqs, n_person, n_frame = load_smpl_sequences(
            "demo,wave,0-20-2", _dataset=Demo(root=str(tmp_path)),
            centralize_pelvis=False)
        assert (n_person, n_frame) == (1, 10)
        np.testing.assert_allclose(
            seqs["body_pose"][0, 1], arr[2, 12:75], rtol=1e-6)


class TestMotionXLoader:
    def test_zip_roundtrip(self, tmp_path):
        motion = np.random.default_rng(1).normal(size=(12, 322)).astype(np.float32)
        zpath = tmp_path / "motionx_smplx.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            import io
            buf = io.BytesIO()
            np.save(buf, motion)
            z.writestr("motion_data/smplx_322/dance/subset_0001/groove.npy",
                       buf.getvalue())
        mx = MotionX(root=str(tmp_path))
        seqs = mx.get_smpl_params("dance/subset_0001/groove")
        assert seqs["body_pose"].shape == (1, 12, 63)
        np.testing.assert_allclose(seqs["transl"][0], motion[:, 309:312])
        np.testing.assert_allclose(seqs["betas"][0], motion[:, 312:])


class TestAISTLoader:
    def test_zip_fps_resample(self, tmp_path):
        F = 120
        dat = {
            "smpl_poses": np.zeros((F, 72), np.float32),
            "smpl_trans": np.ones((F, 3), np.float32) * 2.0,
            "smpl_scaling": np.asarray([2.0]),
        }
        zpath = tmp_path / "20210308_motions.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("motions/gBR_sBM_c01.pkl", pickle.dumps(dat))
        aist = AIST(root=str(tmp_path))
        seqs = aist.get_smpl_params("gBR_sBM_c01", model_type="smplx")
        # 60 -> 25 fps: ceil(60/25)=3 -> 40 frames; smplx body trimmed to 63
        assert seqs["body_pose"].shape == (1, 40, 63)
        np.testing.assert_allclose(seqs["transl"], np.ones((1, 40, 3)))


class TestPreprocess:
    def _seqs(self, P=1, F=20):
        rng = np.random.default_rng(0)
        return {
            "body_pose": rng.normal(size=(P, F, 63)).astype(np.float32),
            "global_orient": rng.normal(size=(P, F, 3)).astype(np.float32),
            "transl": rng.normal(size=(P, F, 3)).astype(np.float32),
            "betas": rng.normal(size=(P, 16)).astype(np.float32),
        }

    def test_pop_and_center(self):
        seqs = preprocess_smpl_sequences(
            self._seqs(), dataset="demo", pop_betas=True, pop_global_orient=True,
            pelvis_position=np.asarray([0.0, 0.3, 0.0]))
        assert "betas" not in seqs and "global_orient" not in seqs
        assert seqs["transl"].shape == (1, 20, 3)

    def test_betas_resize(self):
        seqs = preprocess_smpl_sequences(self._seqs(), dataset="demo",
                                         num_betas=4, centralize_pelvis=False)
        assert seqs["betas"].shape == (1, 4)
        seqs = preprocess_smpl_sequences(self._seqs(), dataset="demo",
                                         num_betas=30, centralize_pelvis=False)
        assert seqs["betas"].shape == (1, 30)

    def test_talkshow_hand_decode(self):
        rng = np.random.default_rng(0)
        seqs = self._seqs()
        seqs["left_hand_pose"] = rng.normal(size=(1, 20, 12)).astype(np.float32)
        seqs["right_hand_pose"] = rng.normal(size=(1, 20, 12)).astype(np.float32)
        comps = (rng.normal(size=(45, 45)).astype(np.float32),
                 rng.normal(size=(45, 45)).astype(np.float32))
        out = preprocess_smpl_sequences(
            seqs, dataset="talkshow", hand_components=comps,
            centralize_pelvis=False)
        assert out["left_hand_pose"].shape == (1, 20, 45)

    def test_expand_humans(self):
        out = expand_humans(self._seqs(), 3)
        assert out["body_pose"].shape == (3, 20, 63)
        assert out["transl"].shape == (3, 20, 3)
        assert not np.allclose(out["transl"][0], out["transl"][1])


class TestRotmatToAxisAngle:
    def test_roundtrip(self):
        from dreamwaltz_g_tpu.utils.transforms import axis_angle_to_matrix
        rng = np.random.default_rng(0)
        aa = rng.normal(size=(10, 3)) * 0.8
        R = np.asarray(axis_angle_to_matrix(aa[None]))[0]
        back = _rotmat_to_axis_angle(R)
        np.testing.assert_allclose(back, aa, atol=1e-4)

    def test_identity(self):
        out = _rotmat_to_axis_angle(np.eye(3)[None])
        np.testing.assert_allclose(out, 0.0, atol=1e-7)


class TestGetSmplInputs:
    def setup_method(self):
        self.model = make_synthetic_model()

    def test_canonical_variants(self):
        for pt in ("canonical-A-adjust", "canonical-T", "canonical-Y",
                   "canonical-choice"):
            p = get_smpl_inputs(self.model, pt,
                                rng=np.random.default_rng(0))
            assert p.body_pose.shape == (1, 63)

    def test_canonical_loop_interpolates(self):
        p0 = get_smpl_inputs(self.model, "canonical-loop", training_ratio=0.0)
        p1 = get_smpl_inputs(self.model, "canonical-loop", training_ratio=1.0)
        a = np.asarray(canonical := p0.body_pose)
        assert not np.allclose(np.asarray(p1.body_pose), a)

    def test_random_with_mixup_off(self):
        p = get_smpl_inputs(self.model, "random-body,hand,expr",
                            canonical_mixup_prob=0.0,
                            rng=np.random.default_rng(0))
        assert float(np.abs(np.asarray(p.expression)).sum()) > 0


class TestSMPLPrompt:
    def _cfg(self, **kw):
        return PromptConfig(**kw)

    def test_canonical_scene(self):
        model = make_synthetic_model()
        prompt = SMPLPrompt(self._cfg(scene="canonical"), model)
        p, out = prompt()
        assert out.vertices.shape[0] == 1
        # cached object returned
        p2, out2 = prompt()
        assert out2 is out

    def test_random_scene(self):
        model = make_synthetic_model()
        prompt = SMPLPrompt(self._cfg(scene="random"), model)
        p1, o1 = prompt()
        p2, o2 = prompt()
        assert o1.vertices.shape == o2.vertices.shape

    def test_motion_scene_with_demo(self, tmp_path):
        arr = np.random.default_rng(0).normal(
            scale=0.1, size=(8, 265)).astype(np.float32)
        np.save(tmp_path / "jig.npy", arr)
        model = make_synthetic_model()
        from dreamwaltz_g_tpu.data.motion.loaders import Demo
        prompt = SMPLPrompt(self._cfg(scene="demo,jig"), model,
                            _dataset=Demo(root=str(tmp_path)))
        assert prompt.num_frame == 8
        p, out = prompt(frame_idx=3)
        assert out.vertices.shape == (1, model.num_vertices, 3)

    def test_observed_betas_schedule(self):
        model = make_synthetic_model()
        betas = parse_betas("((1.0, 0.0), (0.0, 2.0))", model.num_betas)
        assert betas.shape == (2, model.num_betas)
        b0 = sample_betas(betas, i=0)
        bN = sample_betas(betas, i=100, max_iteration=25)
        np.testing.assert_allclose(np.asarray(b0), np.asarray(betas[:1]))
        np.testing.assert_allclose(np.asarray(bN), np.asarray(betas[1:2]))

    def test_cond_images_from_prompt(self):
        from dreamwaltz_g_tpu.data.camera import make_camera_batch
        model = make_synthetic_model()
        prompt = SMPLPrompt(self._cfg(scene="canonical",
                                      use_occlusion_culling=False),
                            model, cond_type=["depth"], height=32, width=32)
        _, out = prompt()
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, 32, 32)
        imgs = prompt.get_cond_images(out, cam.extrinsic[0], cam.intrinsics[0])
        assert len(imgs) == 1 and imgs[0].shape == (32, 32, 3)


class TestReenactLoader:
    def test_zip_roundtrip(self, tmp_path):
        import json
        import zipfile

        F = 6
        rng = np.random.default_rng(0)
        annos = []
        for i in range(F):
            annos.append({
                "smplx_params": {
                    "root_orient": rng.normal(size=3).tolist(),
                    "pose_body": rng.normal(size=63).tolist(),
                    "pose_hand": rng.normal(size=90).tolist(),
                    "pose_jaw": [0.0, 0.0, 0.0],
                    "trans": [0.0, 0.0, float(i)],
                    "betas": rng.normal(size=10).tolist(),
                },
                "cam_params": {
                    "world_scale": 1.0,
                    "cam_R": np.eye(3).tolist(),
                    "cam_T": [0.0, 0.0, 3.0],
                    "intrins": [500.0, 500.0, 256.0, 256.0],
                },
            })
        zpath = tmp_path / "Motion-X-ReEnact.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("motion/dance01.json",
                       json.dumps({"images": [], "annotations": annos}))
            z.writestr("video/dance01.mp4", b"fake")
            z.writestr("inpainting/dance01_inpainting.mp4", b"fakebg")

        from dreamwaltz_g_tpu.data.motion.loaders import MotionXReEnact

        loader = MotionXReEnact(root=str(tmp_path))
        seqs, cams = loader.get_smpl_params("dance01")
        assert seqs["body_pose"].shape == (1, F, 63)
        assert seqs["left_hand_pose"].shape == (1, F, 45)
        assert cams["extrinsic"].shape == (F, 4, 4)
        assert cams["image_width"] == 512 and cams["image_height"] == 512
        # y-flip applied to the extrinsic
        np.testing.assert_allclose(cams["extrinsic"][0, 1, 1], -1.0)
        # negative-fy intrinsics convention
        assert cams["intrinsics"][0, 1, 1] < 0
        # video extraction
        out = loader.extract_video("dance01", str(tmp_path / "bg.mp4"))
        assert open(out, "rb").read() == b"fakebg"


class TestTramLoader:
    def test_npy_roundtrip(self, tmp_path):
        from dreamwaltz_g_tpu.data.motion.loaders import Tram
        from dreamwaltz_g_tpu.utils.transforms import axis_angle_to_matrix

        F = 5
        rng = np.random.default_rng(1)
        aa = rng.normal(size=(F, 24, 3)).astype(np.float32) * 0.4
        import jax.numpy as jnp
        rotmat = np.asarray(axis_angle_to_matrix(jnp.asarray(aa.reshape(F*24, 3))[None])[0]).reshape(F, 24, 3, 3)
        seq_dir = tmp_path / "run1"
        (seq_dir / "animation").mkdir(parents=True)
        (seq_dir / "camera").mkdir(parents=True)
        np.save(seq_dir / "animation" / "hps_track_0.npy", {
            "pred_rotmat": rotmat,
            "pred_shape": rng.normal(size=(F, 10)).astype(np.float32),
            "pred_trans": rng.normal(size=(F, 1, 3)).astype(np.float32),
        })
        np.save(seq_dir / "camera" / "camera.npy", {
            "pred_cam_R": np.tile(np.eye(3), (F, 1, 1)),
            "pred_cam_T": np.zeros((F, 3)),
            "img_focal": 600.0,
            "img_center": (320, 240),
        })
        loader = Tram(root=str(tmp_path))
        seqs, cams = loader.get_smpl_params("run1")
        assert seqs["body_pose"].shape == (1, F, 63)
        # global orient round-trips the rotmat->axis-angle conversion
        np.testing.assert_allclose(seqs["global_orient"][0], aa[:, 0],
                                   atol=1e-3)
        assert cams["image_width"] == 640 and cams["image_height"] == 480


class TestHybrik:
    def _write_pk(self, tmp_path, data, name="vid"):
        import pickle

        d = tmp_path / "MP"
        d.mkdir(exist_ok=True)
        with open(d / f"{name}.pk", "wb") as f:
            pickle.dump(data, f)
        return str(tmp_path)

    def test_single_person(self, tmp_path):
        from dreamwaltz_g_tpu.data.motion.loaders import Hybrik

        F = 5
        eye = np.tile(np.eye(3), (F, 24, 1, 1)).reshape(F, 24 * 9)
        root = self._write_pk(tmp_path, {
            "pred_thetas": eye.astype(np.float32),
            "transl": np.zeros((F, 3), np.float32),
            "pred_betas": np.zeros((F, 10), np.float32),
        })
        out = Hybrik(root).get_smpl_params("vid", model_type="smplx")
        assert out["body_pose"].shape == (1, F, 63)
        assert out["transl"].shape == (1, F, 3)
        np.testing.assert_allclose(out["global_orient"], 0.0)
        assert out["betas"].shape == (1, 10)

    def test_multi_person_modal_filter(self, tmp_path):
        """MP layout: frames with a non-modal person count are dropped,
        betas average over frames (reference: hybrik.py:23-55)."""
        from dreamwaltz_g_tpu.data.motion.loaders import Hybrik

        eye24 = np.tile(np.eye(3), (24, 1, 1))[None]      # (1, 24, 3, 3)
        two = np.concatenate([eye24, eye24])              # (2, 24, 3, 3)
        frames_th = [two, two, eye24, two]                # frame 2 has 1 person
        frames_tr = [np.zeros((2, 3)), np.ones((2, 3)),
                     np.zeros((1, 3)), np.full((2, 3), 2.0)]
        frames_bt = [np.zeros((2, 10)), np.ones((2, 10)),
                     np.zeros((1, 10)), np.full((2, 10), 2.0)]
        root = self._write_pk(tmp_path, {
            "pred_thetas": frames_th, "transl": frames_tr,
            "pred_betas": frames_bt,
        })
        out = Hybrik(root).get_smpl_params("vid", model_type="smplx")
        assert out["body_pose"].shape == (2, 3, 63)       # 2 people, 3 frames
        assert out["transl"].shape == (2, 3, 3)
        np.testing.assert_allclose(out["betas"], 1.0)     # mean(0, 1, 2)
        np.testing.assert_allclose(out["transl"][:, 1], 1.0)
