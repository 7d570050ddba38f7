"""SMPL-X keypoints in the OpenPose/ControlNet 128-point format.

The reference drives its pose-ControlNet with 128 keypoints per person —
body 18 (coco18) + left hand 21 + right hand 21 + face 51 landmarks + 17
contour points — produced by smplx's joint pipeline and the ``coco18``
permutation (reference: core/human/smpl_utils.py:79-234 smpl_to_openpose,
core/human/smpl_model.py:70-73 joint mapper, smpl_condition.py:20-79).

The smplx package builds its 144-joint output as:
  0..54   skeleton joints (kinematic chain)
  55..59  nose / right-eye / left-eye / right-ear / left-ear  (mesh vertices)
  60..65  L/R big-toe, small-toe, heel                        (mesh vertices)
  66..75  fingertips l-thumb..l-pinky, r-thumb..r-pinky        (mesh vertices)
  76..126 51 face landmarks (static barycentric regressor)
  127..143 17 face-contour landmarks (head-yaw-dependent regressor)

We reproduce that layout from our own SMPL-X forward outputs: extra
"joints" are posed mesh vertices at the standard SMPL-X vertex ids, and face
landmarks are barycentric combinations over landmark faces loaded from the
model npz (``lmk_faces_idx``/``lmk_bary_coords`` and the dynamic variants).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .smplx_model import SMPLXModelData, SMPLXOutput

# Standard SMPL-X surface-landmark vertex ids (the smplx package's
# vertex_ids table; stable across SMPL-X releases).
SMPLX_VERTEX_IDS = {
    "nose": 9120, "reye": 9929, "leye": 9448, "rear": 616, "lear": 6,
    "LBigToe": 5770, "LSmallToe": 5780, "LHeel": 8846,
    "RBigToe": 8463, "RSmallToe": 8474, "RHeel": 8635,
    "lthumb": 5361, "lindex": 4933, "lmiddle": 5058,
    "lring": 5169, "lpinky": 5286,
    "rthumb": 8079, "rindex": 7669, "rmiddle": 7794,
    "rring": 7905, "rpinky": 8022,
}

# order matters: must match smplx's VertexJointSelector output layout
_EXTRA_VERTEX_ORDER = (
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
)

# coco18 permutation over the 144-joint layout
# (reference: smpl_utils.py:178-234, model_type='smplx')
SMPLX_TO_OPENPOSE_COCO18_BODY = np.array([
    55, 12,          # nose, neck
    17, 19, 21,      # right shoulder/elbow/wrist
    16, 18, 20,      # left shoulder/elbow/wrist
    2, 5, 8,         # right hip/knee/ankle
    1, 4, 7,         # left hip/knee/ankle
    56, 57, 58, 59,  # right-eye, left-eye, right-ear, left-ear
], np.int32)

SMPLX_TO_OPENPOSE_LHAND = np.array([
    20,
    37, 38, 39, 66,
    25, 26, 27, 67,
    28, 29, 30, 68,
    34, 35, 36, 69,
    31, 32, 33, 70,
], np.int32)

SMPLX_TO_OPENPOSE_RHAND = np.array([
    21,
    52, 53, 54, 71,
    40, 41, 42, 72,
    43, 44, 45, 73,
    49, 50, 51, 74,
    46, 47, 48, 75,
], np.int32)

SMPLX_TO_OPENPOSE_FACE = np.arange(76, 76 + 51 + 17, dtype=np.int32)

SMPLX_TO_OPENPOSE_COCO18 = np.concatenate([
    SMPLX_TO_OPENPOSE_COCO18_BODY,
    SMPLX_TO_OPENPOSE_LHAND,
    SMPLX_TO_OPENPOSE_RHAND,
    SMPLX_TO_OPENPOSE_FACE,
])  # (128,)

NUM_OPENPOSE_KEYPOINTS = 128
NUM_BODY_KP, NUM_HAND_KP, NUM_FACE_KP = 18, 21, 68

# keypoint-group index sets within the 128 (reference:
# OcclusionCulling.__init__, smpl_condition.py:82-94)
FACE_KP_INDICES = np.array(
    [0, 14, 15, 16, 17] + list(range(18 + 2 * 21, 128)), np.int32)
HAND_KP_INDICES = np.arange(18, 18 + 2 * 21, dtype=np.int32)
BODY_KP_INDICES = np.array(
    [i for i in range(128)
     if i not in set(FACE_KP_INDICES.tolist())
     and i not in set(HAND_KP_INDICES.tolist())], np.int32)

# head-yaw-dependent contour: see smplx find_dynamic_lmk_idx_and_bcoords;
# the chain from the root to the neck joint (SMPL-X joint 12)
NECK_KIN_CHAIN = (12, 9, 6, 3, 0)


class LandmarkData(NamedTuple):
    """Face-landmark regressors from the SMPLX npz (optional)."""

    lmk_faces_idx: np.ndarray           # (51,) triangle ids
    lmk_bary_coords: np.ndarray         # (51, 3)
    dynamic_lmk_faces_idx: np.ndarray   # (79, 17)
    dynamic_lmk_bary_coords: np.ndarray  # (79, 17, 3)


def load_landmark_data(path: str) -> Optional[LandmarkData]:
    """Pull the landmark tables out of a SMPLX_*.npz if present."""
    with np.load(path, allow_pickle=True) as data:
        if "lmk_faces_idx" not in data:
            return None
        dyn_f = data.get("dynamic_lmk_faces_idx")
        dyn_b = data.get("dynamic_lmk_bary_coords")
        return LandmarkData(
            lmk_faces_idx=np.asarray(data["lmk_faces_idx"], np.int64),
            lmk_bary_coords=np.asarray(data["lmk_bary_coords"], np.float32),
            dynamic_lmk_faces_idx=None if dyn_f is None else np.asarray(dyn_f, np.int64),
            dynamic_lmk_bary_coords=None if dyn_b is None else np.asarray(
                dyn_b, np.float32),
        )


def _dynamic_contour_index(A: jnp.ndarray) -> jnp.ndarray:
    """Head-yaw bucket in [0, 78] from the neck's global rotation.

    smplx semantics: y_rot = round(degrees(asin(R[0, 2]))) of the
    root->neck chain rotation; angles are folded so 0..39 = right turns and
    40..78 = left turns (clamped at 39°). Our kinematic A already carries the
    chain-composed global rotation per joint.
    """
    R = A[:, NECK_KIN_CHAIN[0], :3, :3]
    y_rot = jnp.arcsin(jnp.clip(R[:, 0, 2], -1.0, 1.0))
    deg = jnp.round(jnp.rad2deg(y_rot)).astype(jnp.int32)
    neg = deg < 0
    mag = jnp.clip(jnp.abs(deg), 0, 39)
    return jnp.where(neg, 39 + mag, 39 - mag)


def full_joint_set(
    model: SMPLXModelData,
    output: SMPLXOutput,
    landmarks: Optional[LandmarkData] = None,
) -> jnp.ndarray:
    """(B, 144, 3) joints in the smplx layout (55 skeleton + 21 vertex
    landmarks + 51 + 17 face landmarks). Missing landmark tables produce NaN
    rows, which the drawing layer treats as absent keypoints
    (smpl_condition.py:28-35)."""
    B = output.vertices.shape[0]
    joints = output.joints  # (B, 55, 3)

    V = model.num_vertices
    if V > max(SMPLX_VERTEX_IDS.values()):
        vids = jnp.asarray([SMPLX_VERTEX_IDS[k] for k in _EXTRA_VERTEX_ORDER])
        extra = output.vertices[:, vids]  # (B, 21, 3)
    else:  # synthetic test model: no surface landmarks
        extra = jnp.full((B, len(_EXTRA_VERTEX_ORDER), 3), jnp.nan)

    if landmarks is not None:
        faces = jnp.asarray(model.faces)
        lf = faces[jnp.asarray(landmarks.lmk_faces_idx)]        # (51, 3)
        lb = jnp.asarray(landmarks.lmk_bary_coords)             # (51, 3)
        static_lmk = jnp.einsum("lk,blkc->blc", lb, output.vertices[:, lf])
        if landmarks.dynamic_lmk_faces_idx is not None:
            bucket = _dynamic_contour_index(output.A)           # (B,)
            dlf = jnp.asarray(landmarks.dynamic_lmk_faces_idx)[bucket]   # (B, 17)
            dlb = jnp.asarray(landmarks.dynamic_lmk_bary_coords)[bucket]  # (B, 17, 3)
            tri = output.vertices[jnp.arange(B)[:, None, None], faces[dlf]]
            contour = jnp.einsum("blk,blkc->blc", dlb, tri)
        else:
            contour = jnp.full((B, 17, 3), jnp.nan)
        # smplx prepends the contour before the 51 landmarks then reorders;
        # the coco18 face block is [51 landmarks, 17 contour]
        face = jnp.concatenate([static_lmk, contour], axis=1)
    else:
        face = jnp.full((B, 68, 3), jnp.nan)

    return jnp.concatenate([joints, extra, face], axis=1)


def openpose_keypoints(
    model: SMPLXModelData,
    output: SMPLXOutput,
    landmarks: Optional[LandmarkData] = None,
) -> jnp.ndarray:
    """(B, 128, 3) world-space keypoints in ControlNet-OpenPose order."""
    joints144 = full_joint_set(model, output, landmarks)
    return joints144[:, jnp.asarray(SMPLX_TO_OPENPOSE_COCO18)]


def project_keypoints(
    keypoints: jnp.ndarray,
    extrinsic: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """World (N, K, 3) -> pixel (N, K, 2); behind-camera points become NaN
    (reference: SMPL2Condition.export_pose, smpl_condition.py:191-212)."""
    cam = keypoints @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    z = cam[..., 2]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    z_safe = jnp.where(z > 1e-8, z, 1.0)
    u = fx * cam[..., 0] / z_safe + cx
    v = fy * cam[..., 1] / z_safe + cy
    pts = jnp.stack([u, v], -1)
    return jnp.where((z > 1e-8)[..., None], pts, jnp.nan)
