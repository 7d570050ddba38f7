"""SMPLPrompt: the per-step human-pose provider.

Owns the canonical pose, the observed-pose source (canonical / random /
motion sequence), betas scheduling, and ControlNet condition fan-out
(reference: core/human/smpl_prompt.py:62-384).

Functional split: the object holds host-side state (loaded sequences,
configs); every pose draw returns plain ``SMPLXParams``/``SMPLXOutput``
pytrees that feed the jit'd render/train steps.
"""
from __future__ import annotations

import ast
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import PromptConfig
from ..data.motion import load_smpl_sequences
from .condition import ConditionRenderer
from .keypoints import LandmarkData
from .poses import canonical_body_pose, canonical_params, sample_random_pose
from .smplx_model import (
    SMPLXModelData,
    SMPLXOutput,
    SMPLXParams,
    default_params,
    smplx_forward,
)


def parse_scene_type(scene: str) -> str:
    """(reference: smpl_prompt.py:21-27)"""
    if scene.startswith("canonical"):
        return "canonical"
    if scene.startswith("random") or scene == "vposer":
        return "random"
    return "motion"


def parse_betas(betas: Optional[Union[str, np.ndarray]], num_betas: int,
                ) -> Optional[jnp.ndarray]:
    """'(b0, b1, ...)' or '((..),(..))' -> (N, num_betas), zero-padded
    (reference: parse_betas, smpl_prompt.py:30-47)."""
    if betas is None:
        return None
    if isinstance(betas, str):
        betas = ast.literal_eval(betas)
    arr = np.asarray(betas, np.float32)
    if arr.ndim == 1:
        arr = arr[None]
    if arr.shape[-1] < num_betas:
        arr = np.pad(arr, ((0, 0), (0, num_betas - arr.shape[-1])))
    return jnp.asarray(arr[:, :num_betas])


def sample_betas(betas: jnp.ndarray, i: Optional[int] = None,
                 max_iteration: int = 25) -> jnp.ndarray:
    """Interpolate canonical->observed betas over the first iterations
    (reference: sample_betas, smpl_prompt.py:50-57)."""
    if betas.shape[0] == 1 or i is None:
        return betas[:1]
    r = min(i / max_iteration, 1.0)
    return betas[:1] * (1 - r) + betas[1:2] * r


def load_hand_components(path: str, ncomps: int = 45):
    """PCA hand bases from a SMPLX npz (for TalkSHOW decode)."""
    with np.load(path, allow_pickle=True) as data:
        if "hands_componentsl" not in data:
            return None
        return (np.asarray(data["hands_componentsl"], np.float32)[:ncomps],
                np.asarray(data["hands_componentsr"], np.float32)[:ncomps])


def get_smpl_inputs(
    model: SMPLXModelData,
    pose_type: str,
    key: Optional[jax.Array] = None,
    batch_size: int = 1,
    flat_hand: bool = True,
    centralize_pelvis: bool = True,
    canonical_mixup_prob: float = 0.5,
    training_ratio: float = 0.0,
    sample_body_fn: Optional[Callable] = None,
    rng: Optional[np.random.Generator] = None,
) -> SMPLXParams:
    """Pose-type dispatch (reference: get_smpl_inputs,
    smpl_model.py:211-298): canonical variants, 'canonical-choice',
    'canonical-loop(2)' interpolation, 'random[-body,hand,expr]' with
    canonical-R mixup, 'vposer' (via ``sample_body_fn``)."""
    rng = rng or np.random.default_rng()
    if key is None:
        key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))

    if pose_type.startswith("random") and rng.random() < canonical_mixup_prob:
        pose_type = "canonical-R"

    if pose_type == "vposer" or pose_type.startswith("random"):
        if pose_type == "vposer":
            parts = ("body",)
        elif "-" in pose_type:
            parts = tuple(pose_type.split("-")[-1].split(","))
        else:
            parts = ("body", "hand", "expr")
        p = sample_random_pose(model, key, parts=parts, batch_size=batch_size)
        if "body" in parts and sample_body_fn is not None:
            p = p._replace(body_pose=sample_body_fn(key, batch_size))
    elif pose_type.startswith("canonical"):
        if pose_type == "canonical-choice":
            pose_type = str(rng.choice([
                "canonical-Y", "canonical-T", "canonical-A",
                "canonical-Y-adjust", "canonical-T-adjust",
                "canonical-A-adjust"]))
            body = canonical_body_pose(pose_type, batch_size=batch_size)
        elif pose_type in ("canonical-loop", "canonical-loop2"):
            r = training_ratio
            if pose_type == "canonical-loop2":
                r = 2.0 * r if r <= 0.5 else 2.0 - 2.0 * r
            a = canonical_body_pose("canonical-A-adjust", batch_size=batch_size)
            b = canonical_body_pose("canonical-Y", batch_size=batch_size)
            body = a * (1 - r) + b * r
        else:
            body = canonical_body_pose(pose_type, key, batch_size)
        p = default_params(model, batch_size)._replace(body_pose=body)
        if flat_hand and model.pose_mean.shape[0] >= 90:
            lh = -model.pose_mean[-90:-45].reshape(1, 45)
            rh = -model.pose_mean[-45:].reshape(1, 45)
            p = p._replace(
                left_hand_pose=jnp.broadcast_to(lh, (batch_size, 45)),
                right_hand_pose=jnp.broadcast_to(rh, (batch_size, 45)),
            )
    else:
        raise ValueError(f"unknown pose_type {pose_type!r}")

    if centralize_pelvis:
        pelvis = jnp.einsum("v,vc->c", model.J_regressor[0], model.v_template)
        p = p._replace(transl=jnp.broadcast_to(-pelvis[None], (batch_size, 3)))
    return p


def _params_from_seq_frame(model: SMPLXModelData, seqs: Dict[str, np.ndarray],
                           frame_idx: int) -> SMPLXParams:
    """Extract one frame of the (P, F, D) sequence dict into SMPLXParams
    (reference: get_smpl_inputs_from_sequences, smpl_prompt.py:134-149)."""
    P = seqs["body_pose"].shape[0]
    p = default_params(model, P)
    updates = {}
    for k, v in seqs.items():
        if k not in SMPLXParams._fields:
            continue
        updates[k] = jnp.asarray(v[:, frame_idx] if v.ndim >= 3 else v)
    # pad/crop to model dims
    if "betas" in updates:
        b = updates["betas"]
        if b.shape[-1] < model.num_betas:
            b = jnp.pad(b, ((0, 0), (0, model.num_betas - b.shape[-1])))
        updates["betas"] = b[:, : model.num_betas]
    if "expression" in updates:
        e = updates["expression"]
        if e.shape[-1] < model.num_expr:
            e = jnp.pad(e, ((0, 0), (0, model.num_expr - e.shape[-1])))
        updates["expression"] = e[:, : model.num_expr]
    return p._replace(**updates)


class SMPLPrompt:
    """(reference: SMPLPrompt, smpl_prompt.py:62-384)"""

    def __init__(
        self,
        cfg: PromptConfig,
        model: SMPLXModelData,
        cond_type: Union[str, List[str]] = "pose",
        height: int = 512,
        width: int = 512,
        landmarks: Optional[LandmarkData] = None,
        hand_components=None,
        sample_body_fn: Optional[Callable] = None,
        seed: int = 0,
        _dataset=None,
    ):
        self.cfg = cfg
        self.model = model
        self.cond_type = [cond_type] if isinstance(cond_type, str) else list(cond_type)
        self.height, self.width = height, width
        self.scene = cfg.scene
        self.scene_type = parse_scene_type(cfg.scene)
        self.canonical_pose = cfg.canonical_pose
        self.canonical_mixup_prob = cfg.canonical_mixup_prob
        self.training_ratio = 0.0
        self.sample_body_fn = sample_body_fn
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

        self.condition = ConditionRenderer(
            model, landmarks=landmarks,
            use_occlusion_culling=cfg.use_occlusion_culling,
            draw_body_keypoints=cfg.draw_body_keypoints,
            draw_hand_keypoints=cfg.draw_hand_keypoints,
            draw_face_landmarks=cfg.draw_face_landmarks,
            openpose_left_right_flip=cfg.openpose_left_right_flip,
        )

        self.canonical_betas = parse_betas(cfg.canonical_betas, model.num_betas)
        self.observed_betas = parse_betas(cfg.observed_betas, model.num_betas)
        self.max_beta_iteration = cfg.max_beta_iteration

        # canonical (zero-pose-space anchor for the avatar)
        self.canonical_inputs = canonical_params(
            model, cfg.canonical_pose, centralize_pelvis=True,
            flat_hand=not cfg.flat_hand_mean)
        if self.canonical_betas is not None:
            self.canonical_inputs = self.canonical_inputs._replace(
                betas=self.canonical_betas[:1])
        self.canonical_outputs = smplx_forward(model, self.canonical_inputs)

        # observed source
        self.num_frame = 1
        self.num_person = cfg.num_person or 1
        self.camera_sequences: Optional[dict] = None
        self.sequences = None
        if self.scene_type == "motion":
            cam_seqs: dict = {}
            pelvis = np.asarray(jnp.einsum(
                "v,vc->c", model.J_regressor[0], model.v_template))
            self.sequences, self.num_person, self.num_frame = load_smpl_sequences(
                self.scene,
                model_type="smplx",
                camera_sequences=cam_seqs,
                num_person=cfg.num_person,
                pop_betas=cfg.pop_betas,
                pop_transl=cfg.pop_transl,
                normalize_transl=cfg.normalize_transl,
                centralize_pelvis=cfg.centralize_pelvis,
                pop_global_orient=cfg.pop_global_orient,
                frame_interval=cfg.frame_interval,
                num_betas=model.num_betas,
                pelvis_position=pelvis if cfg.centralize_pelvis else None,
                hand_components=hand_components,
                _dataset=_dataset,
            )
            self.camera_sequences = cam_seqs or None

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- pose draws -----------------------------------------------------------

    def __call__(self, frame_idx: Optional[int] = None,
                 batch_idx: Optional[int] = None,
                 ) -> Tuple[SMPLXParams, SMPLXOutput]:
        """One observed pose draw (reference: __call__,
        smpl_prompt.py:265-329)."""
        extra = {}
        if self.observed_betas is not None:
            extra["betas"] = sample_betas(
                self.observed_betas, i=batch_idx,
                max_iteration=self.max_beta_iteration)

        if self.scene_type == "canonical":
            if self.scene in ("canonical", self.canonical_pose) and not extra:
                return self.canonical_inputs, self.canonical_outputs
            p = get_smpl_inputs(
                self.model, self.scene, key=self._next_key(),
                training_ratio=self.training_ratio, rng=self._rng)
        elif self.scene_type == "random":
            p = get_smpl_inputs(
                self.model, self.scene, key=self._next_key(),
                canonical_mixup_prob=self.canonical_mixup_prob,
                sample_body_fn=self.sample_body_fn, rng=self._rng)
        else:
            if self.observed_betas is not None and self.observed_betas.shape[0] > 1 \
                    and frame_idx is not None:
                frame_idx = max(self.max_beta_iteration, frame_idx)
            if frame_idx is None:
                frame_idx = int(self._rng.integers(0, self.num_frame))
            frame_idx %= self.num_frame
            p = _params_from_seq_frame(self.model, self.sequences, frame_idx)

        if extra:
            B = p.body_pose.shape[0]
            p = p._replace(betas=jnp.broadcast_to(
                extra["betas"], (B, self.model.num_betas)))
        return p, smplx_forward(self.model, p)

    # -- conditions -----------------------------------------------------------

    def get_cond_images(
        self,
        smpl_outputs: SMPLXOutput,
        extrinsic: jnp.ndarray,
        intrinsics: jnp.ndarray,
        cond_type: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
    ) -> List[np.ndarray]:
        """(reference: get_cond_images, smpl_prompt.py:229-263)"""
        if cond_type is None:
            cond_type = self.cond_type
        if isinstance(cond_type, str):
            cond_type = [cond_type]
        h = height or self.height
        w = width or self.width
        return [
            self.condition(smpl_outputs, extrinsic, intrinsics, c, h, w)
            for c in cond_type
        ]

    def get_cond_images_batch(
        self,
        smpl_outputs_per_view: List[SMPLXOutput],
        extrinsics: jnp.ndarray,   # (B, 4, 4)
        intrinsics: jnp.ndarray,   # (B, 3, 3)
        cond_type: Optional[str] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
    ) -> List[np.ndarray]:
        """B views' condition images; for 'pose' all projection + occlusion
        ray-casts run as ONE device dispatch (VERDICT r4 #8). Other condition
        types fall back to the per-view path (their cost is the full-image
        rasterizer, not the keypoint cast)."""
        if cond_type is None:
            cond_type = self.cond_type
        if isinstance(cond_type, (list, tuple)):
            cond_type = cond_type[0]
        h = height or self.height
        w = width or self.width
        if cond_type in ("pose", "openpose"):
            return self.condition.render_pose_batch(
                smpl_outputs_per_view, extrinsics, intrinsics, h, w)
        return [
            self.condition(o, extrinsics[i], intrinsics[i], cond_type, h, w)
            for i, o in enumerate(smpl_outputs_per_view)
        ]

    def get_camera_params_from_sequences(self, frame_idx: int) -> Optional[dict]:
        """Per-frame predefined camera (reenact/tram tracks)
        (reference: smpl_prompt.py:151-218)."""
        if self.camera_sequences is None:
            return None
        cs = self.camera_sequences
        n = cs["extrinsic"].shape[0]
        i = frame_idx % n
        return {
            "extrinsic": jnp.asarray(cs["extrinsic"][i], jnp.float32),
            "intrinsics": jnp.asarray(cs["intrinsics"][i], jnp.float32),
            "image_height": cs["image_height"],
            "image_width": cs["image_width"],
            "tanfov": float(cs["tanfov"][i]),
        }
