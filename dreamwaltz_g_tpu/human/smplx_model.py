"""SMPL-X body model as pure JAX functions over a parameter pytree.

Functional re-design of the reference's smplx dependency
(reference: core/human/smpl_model.py:50-124 builds `smplx.SMPLX` with
neutral-2020 npz, 300 betas, 100 expressions, no PCA hands) and of the LBS
math in smplx.lbs. The model data is a NamedTuple pytree so the whole forward
is jit/vmap/grad-able and can be donated/sharded like any other array bundle.

Layout notes (matching the SMPLX_NEUTRAL_2020.npz conventions):
* ``v_template``  (V, 3)
* ``shapedirs``   (V, 3, n_betas)   — shape blendshapes
* ``expr_dirs``   (V, 3, n_expr)    — expression blendshapes
* ``posedirs``    (P, V*3) with P = 9*(J-1) — pose-corrective blendshapes
* ``J_regressor`` (J, V)
* ``lbs_weights`` (V, J)
* ``parents``     (J,) kinematic tree, parents[0] = -1
* ``pose_mean``   (J*3,) added to the flattened full pose (affects hands when
  flat_hand_mean=False)

SMPL-X full pose order (55 joints x 3 axis-angle):
global_orient(1) | body(21) | jaw(1) | leye(1) | reye(1) | lhand(15) | rhand(15).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..utils.transforms import axis_angle_to_matrix

NUM_BODY_JOINTS = 21
NUM_HAND_JOINTS = 15
NUM_FACE_JOINTS = 3  # jaw, leye, reye


class SMPLXModelData(NamedTuple):
    """Static model arrays (a pytree of jnp arrays)."""

    v_template: jnp.ndarray    # (V, 3)
    shapedirs: jnp.ndarray     # (V, 3, n_betas)
    expr_dirs: jnp.ndarray     # (V, 3, n_expr)
    posedirs: jnp.ndarray      # (P, V*3)
    J_regressor: jnp.ndarray   # (J, V)
    lbs_weights: jnp.ndarray   # (V, J)
    parents: np.ndarray        # (J,) numpy int — static for tracing
    pose_mean: jnp.ndarray     # (J*3,)
    faces: np.ndarray          # (F, 3) numpy int — static topology

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @property
    def num_expr(self) -> int:
        return self.expr_dirs.shape[-1]


class SMPLXParams(NamedTuple):
    """Per-frame pose/shape parameters, batched over B.

    All fields optional-by-zeros; build with ``default_params``.
    """

    betas: jnp.ndarray            # (B, n_betas)
    expression: jnp.ndarray       # (B, n_expr)
    global_orient: jnp.ndarray    # (B, 3)
    body_pose: jnp.ndarray        # (B, 21*3)
    jaw_pose: jnp.ndarray         # (B, 3)
    leye_pose: jnp.ndarray        # (B, 3)
    reye_pose: jnp.ndarray        # (B, 3)
    left_hand_pose: jnp.ndarray   # (B, 15*3)
    right_hand_pose: jnp.ndarray  # (B, 15*3)
    transl: jnp.ndarray           # (B, 3)


class SMPLXOutput(NamedTuple):
    vertices: jnp.ndarray      # (B, V, 3)
    joints: jnp.ndarray        # (B, J, 3) posed joint locations
    A: jnp.ndarray             # (B, J, 4, 4) rest->posed relative joint transforms
    v_shaped: jnp.ndarray      # (B, V, 3) template + shape/expr offsets
    shape_offsets: jnp.ndarray  # (B, V, 3)
    pose_offsets: jnp.ndarray  # (B, V, 3)
    full_pose: jnp.ndarray     # (B, J*3)


def default_params(model: SMPLXModelData, batch_size: int = 1) -> SMPLXParams:
    z = lambda *s: jnp.zeros((batch_size,) + s, jnp.float32)  # noqa: E731
    return SMPLXParams(
        betas=z(model.num_betas),
        expression=z(model.num_expr),
        global_orient=z(3),
        body_pose=z(NUM_BODY_JOINTS * 3),
        jaw_pose=z(3),
        leye_pose=z(3),
        reye_pose=z(3),
        left_hand_pose=z(NUM_HAND_JOINTS * 3),
        right_hand_pose=z(NUM_HAND_JOINTS * 3),
        transl=z(3),
    )


def full_pose_from_params(model: SMPLXModelData, p: SMPLXParams) -> jnp.ndarray:
    """Assemble the (B, J*3) axis-angle pose in SMPL-X joint order and add
    pose_mean (reference: inverse_lbs.py:592-630).

    Non-55-joint models (synthetic test fixtures) use the reduced layout
    global_orient | body_pose[:(J-1)*3]."""
    J = model.num_joints
    if J != 1 + NUM_BODY_JOINTS + NUM_FACE_JOINTS + 2 * NUM_HAND_JOINTS:
        B = p.global_orient.shape[0]
        body = p.body_pose[:, : (J - 1) * 3]
        body = jnp.pad(body, ((0, 0), (0, (J - 1) * 3 - body.shape[1])))
        return jnp.concatenate([p.global_orient.reshape(B, 3), body], axis=-1) \
            + model.pose_mean
    full = jnp.concatenate(
        [
            p.global_orient.reshape(-1, 3),
            p.body_pose.reshape(-1, NUM_BODY_JOINTS * 3),
            p.jaw_pose.reshape(-1, 3),
            p.leye_pose.reshape(-1, 3),
            p.reye_pose.reshape(-1, 3),
            p.left_hand_pose.reshape(-1, NUM_HAND_JOINTS * 3),
            p.right_hand_pose.reshape(-1, NUM_HAND_JOINTS * 3),
        ],
        axis=-1,
    )
    return full + model.pose_mean


def blend_shapes(shape_components: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """(B, L) x (V, 3, L) -> (B, V, 3)."""
    return jnp.einsum("bl,vcl->bvc", shape_components, dirs)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", J_regressor, vertices)


def rigid_kinematics(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray):
    """Forward-kinematics chain (smplx's batch_rigid_transform semantics).

    Args:
        rot_mats: (B, J, 3, 3) local joint rotations
        joints:   (B, J, 3) rest joint locations
        parents:  (J,) static numpy parent indices, parents[0] < 0

    Returns:
        posed_joints (B, J, 3), A (B, J, 4, 4) where A_j maps rest-space
        points skinned to joint j into posed space:
        A_j = G_j @ T(-j_rest) with G_j the world transform.

    J is 55; the chain is unrolled at trace time (static python loop) which
    XLA handles well for this size — no scan bookkeeping needed.
    """
    J = joints.shape[1]
    rel_joints = jnp.concatenate(
        [joints[:, :1], joints[:, 1:] - joints[:, np.asarray(parents[1:])]], axis=1
    )

    rots = [None] * J
    trans = [None] * J
    rots[0] = rot_mats[:, 0]
    trans[0] = rel_joints[:, 0]
    for j in range(1, J):
        p = int(parents[j])
        rots[j] = rots[p] @ rot_mats[:, j]
        trans[j] = jnp.einsum("bik,bk->bi", rots[p], rel_joints[:, j]) + trans[p]
    G_rot = jnp.stack(rots, axis=1)     # (B, J, 3, 3)
    G_t = jnp.stack(trans, axis=1)      # (B, J, 3)

    posed_joints = G_t
    # A_j = [G_rot | G_t - G_rot @ j_rest]
    a_t = G_t - jnp.einsum("bjik,bjk->bji", G_rot, joints)
    A = jnp.zeros(G_rot.shape[:2] + (4, 4), G_rot.dtype)
    A = A.at[..., :3, :3].set(G_rot)
    A = A.at[..., :3, 3].set(a_t)
    A = A.at[..., 3, 3].set(1.0)
    return posed_joints, A


def smplx_forward(
    model: SMPLXModelData,
    params: SMPLXParams,
    pose2rot: bool = True,
    full_pose: Optional[jnp.ndarray] = None,
) -> SMPLXOutput:
    """Full SMPL-X forward: shapes -> pose blendshapes -> kinematics -> LBS.

    Mirrors smplx.lbs.lbs semantics (used by the reference via
    core/human/smpl_model.py and inverse_lbs.py:646-718).
    """
    if full_pose is None:
        full_pose = full_pose_from_params(model, params)
    B = full_pose.shape[0]
    shape_components = jnp.concatenate([params.betas, params.expression], axis=-1)
    dirs = jnp.concatenate([model.shapedirs, model.expr_dirs], axis=-1)
    shape_offsets = blend_shapes(shape_components, dirs)
    v_shaped = model.v_template[None] + shape_offsets

    J_rest = vertices2joints(model.J_regressor, v_shaped)

    if pose2rot:
        rot_mats = axis_angle_to_matrix(full_pose.reshape(B, -1, 3))
    else:
        rot_mats = full_pose.reshape(B, -1, 3, 3)
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)

    posed_joints, A = rigid_kinematics(rot_mats, J_rest, model.parents)

    # Per-vertex skinning transform T = W · A
    T = jnp.einsum("vj,bjkl->bvkl", model.lbs_weights, A)
    v_posed = v_shaped + pose_offsets
    vertices = jnp.einsum("bvik,bvk->bvi", T[..., :3, :3], v_posed) + T[..., :3, 3]

    transl = params.transl[:, None, :]
    return SMPLXOutput(
        vertices=vertices + transl,
        joints=posed_joints + transl,
        A=A,
        v_shaped=v_shaped,
        shape_offsets=shape_offsets,
        pose_offsets=pose_offsets,
        full_pose=full_pose,
    )


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_smplx_npz(
    path: str,
    num_betas: int = 300,
    num_expr: int = 100,
    flat_hand_mean: bool = False,
    dtype=jnp.float32,
    kid_template_path: Optional[str] = None,
) -> SMPLXModelData:
    """Load a SMPLX_*.npz model file (the reference uses
    SMPLX_NEUTRAL_2020.npz with 300 betas / 100 expressions,
    core/human/smpl_model.py:75-99).

    ``kid_template_path``: smplx_kid_template.npy (the AGORA kid model) —
    its offset from the adult template is appended as an extra shape
    direction, so ``betas[..., -1]`` interpolates adult -> kid (the
    reference sets it to 0.7 for age='kid',
    core/human/smpl_model.py:102-104, 120-122; smplx's
    kid_template_path mechanics)."""
    with np.load(path, allow_pickle=True) as data:
        v_template = np.asarray(data["v_template"], np.float32)
        shapedirs_full = np.asarray(data["shapedirs"], np.float32)
        # smplx convention: first 300 columns betas, next 100 expressions
        shapedirs = shapedirs_full[..., :num_betas]
        expr_dirs = shapedirs_full[..., 300: 300 + num_expr]
        if kid_template_path is not None:
            # smplx mechanics: mean-center the kid template, then append
            # its offset from the adult template as one extra column
            kid = np.asarray(np.load(kid_template_path), np.float32)
            kid = kid - np.mean(kid, axis=0, keepdims=True)
            shapedirs = np.concatenate(
                [shapedirs, (kid - v_template)[..., None]], axis=-1)
        posedirs = np.asarray(data["posedirs"], np.float32)
        posedirs = posedirs.reshape(posedirs.shape[0] * 3, -1).T if posedirs.ndim == 3 \
            else posedirs
        if posedirs.shape[0] != 9 * (np.asarray(data["J_regressor"]).shape[0] - 1):
            # stored as (V, 3, P): reshape to (P, V*3)
            pd = np.asarray(data["posedirs"], np.float32)
            posedirs = pd.reshape(-1, pd.shape[-1]).T
        J_regressor = np.asarray(data["J_regressor"], np.float32)
        lbs_weights = np.asarray(data["weights"], np.float32)
        parents = np.asarray(data["kintree_table"], np.int64)[0]
        parents[0] = -1
        faces = np.asarray(data["f"], np.int64)
        J = J_regressor.shape[0]
        pose_mean = np.zeros(J * 3, np.float32)
        if not flat_hand_mean and "hands_meanl" in data:
            lh = np.asarray(data["hands_meanl"], np.float32).reshape(-1)
            rh = np.asarray(data["hands_meanr"], np.float32).reshape(-1)
            pose_mean[-2 * NUM_HAND_JOINTS * 3: -NUM_HAND_JOINTS * 3] = lh
            pose_mean[-NUM_HAND_JOINTS * 3:] = rh
    return SMPLXModelData(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        expr_dirs=jnp.asarray(expr_dirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(J_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        parents=np.asarray(parents),
        pose_mean=jnp.asarray(pose_mean, dtype),
        faces=faces,
    )


def make_synthetic_model(
    num_vertices: int = 128,
    num_joints: int = 8,
    num_betas: int = 4,
    num_expr: int = 2,
    seed: int = 0,
) -> SMPLXModelData:
    """A tiny articulated 'stick person' with SMPL-X-shaped arrays, for tests
    and fixtures where the licensed SMPLX npz is unavailable.

    Joints form a chain along +y; vertices are a noisy tube around it with
    smooth distance-based skinning weights.
    """
    rng = np.random.default_rng(seed)
    parents = np.arange(-1, num_joints - 1)
    joint_pos = np.stack(
        [np.zeros(num_joints), np.linspace(0, 1.4, num_joints), np.zeros(num_joints)],
        axis=-1,
    ).astype(np.float32)

    t = rng.uniform(0, 1.4, size=num_vertices)
    theta = rng.uniform(0, 2 * np.pi, size=num_vertices)
    r = 0.12 + 0.02 * rng.standard_normal(num_vertices)
    v_template = np.stack(
        [r * np.cos(theta), t, r * np.sin(theta)], axis=-1
    ).astype(np.float32)

    d = np.linalg.norm(v_template[:, None, :] - joint_pos[None], axis=-1)
    w = np.exp(-(d / 0.25) ** 2) + 1e-4
    lbs_weights = (w / w.sum(-1, keepdims=True)).astype(np.float32)

    # J_regressor: soft-assign vertices near each joint
    jr = np.exp(-(d.T / 0.15) ** 2) + 1e-6
    J_regressor = (jr / jr.sum(-1, keepdims=True)).astype(np.float32)

    shapedirs = (0.01 * rng.standard_normal((num_vertices, 3, num_betas))).astype(np.float32)
    expr_dirs = (0.01 * rng.standard_normal((num_vertices, 3, num_expr))).astype(np.float32)
    posedirs = (0.001 * rng.standard_normal((9 * (num_joints - 1), num_vertices * 3))).astype(np.float32)

    # random triangles over vertex ids (topology is only used for surface ops)
    faces = rng.integers(0, num_vertices, size=(2 * num_vertices, 3))

    return SMPLXModelData(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        expr_dirs=jnp.asarray(expr_dirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        pose_mean=jnp.zeros(num_joints * 3),
        faces=np.asarray(faces),
    )
