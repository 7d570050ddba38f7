"""ControlNet condition rendering from posed SMPL-X bodies.

The reference's ``SMPL2Condition`` (core/human/smpl_condition.py:146-320)
renders, per training step, the condition image the ControlNet sees:

* ``pose``      — OpenPose skeleton map of the projected 128 keypoints with
                  per-part occlusion culling (open3d ray casts in the
                  reference, smpl_condition.py:82-143),
* ``depth``     — inverse-normalized mesh depth (open3d raycast, :237-249),
* ``depth_raw`` — metric depth for the NeRF-pretrain MSE loss,
* ``normal``    — world-space normal map (nvdiffrast, :251-262).

Here the geometry passes are TPU ops (ops/raycast.py) — a jit'd keypoint
ray-cast and a jit'd tile-binned mesh rasterizer — and only the final
skeleton drawing runs host-side (cv2 line drawing is inherently sequential
raster work and is off the differentiable path).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.raycast import cast_rays, rasterize_mesh
from .keypoints import (
    BODY_KP_INDICES,
    FACE_KP_INDICES,
    HAND_KP_INDICES,
    LandmarkData,
    openpose_keypoints,
    project_keypoints,
)
from .openpose import draw_openpose_map
from .smplx_model import SMPLXModelData, SMPLXOutput


@dataclass(frozen=True)  # hashable: used as a static jit argument
class OcclusionCullingConfig:
    """(reference: OcclusionCulling, smpl_condition.py:82-143)"""

    thres_body: float = 0.2
    thres_face: float = 0.02
    thres_hand: float = 0.2
    ignore_body_self_occlusion: bool = True


@functools.partial(jax.jit, static_argnames=("cfg", "n_person"))
def occlusion_cull(
    campos: jnp.ndarray,          # (3,)
    keypoints: jnp.ndarray,       # (N, K, 3) world
    vertices: jnp.ndarray,        # (N*V, 3) all persons' vertices, stacked
    faces: jnp.ndarray,           # (N*F, 3) with per-person vertex offsets
    cfg: OcclusionCullingConfig = OcclusionCullingConfig(),
    n_person: int = 1,
) -> jnp.ndarray:
    """Per-keypoint occlusion test: cast camera->keypoint rays against the
    posed mesh; a keypoint is occluded when the first hit is closer than the
    keypoint by more than a per-part threshold. Body keypoints ignore hits on
    the keypoint's own person when configured (a body always self-intersects
    near its own joints).

    Returns (occluded (N, K) bool, distances (N, K)).
    """
    N, K, _ = keypoints.shape
    kp = keypoints.reshape(-1, 3)
    d = kp - campos
    t_far = jnp.linalg.norm(d, axis=-1)
    dirs = d / jnp.maximum(t_far[:, None], 1e-12)
    F_per = faces.shape[0] // n_person
    t_hit, geom = cast_rays(
        jnp.broadcast_to(campos, kp.shape), dirs, vertices, faces,
        geometry_sizes=(F_per,) * n_person)
    gap = (t_far - t_hit).reshape(N, K)
    geom = geom.reshape(N, K)

    thres = jnp.full((K,), cfg.thres_body)
    thres = thres.at[jnp.asarray(FACE_KP_INDICES)].set(cfg.thres_face)
    thres = thres.at[jnp.asarray(HAND_KP_INDICES)].set(cfg.thres_hand)
    occluded = gap > thres[None, :]

    if cfg.ignore_body_self_occlusion:
        self_hit = geom == jnp.arange(N)[:, None]
        body = jnp.zeros((K,), bool).at[jnp.asarray(BODY_KP_INDICES)].set(True)
        occluded = occluded & ~(self_hit & body[None, :])
    return occluded, t_far.reshape(N, K)


@functools.partial(jax.jit, static_argnames=("cfg", "n_person", "use_cull"))
def _pose_cull_project_batch(
    extrinsics: jnp.ndarray,   # (B, 4, 4)
    intrinsics: jnp.ndarray,   # (B, 3, 3)
    kp3d: jnp.ndarray,         # (B, N, K, 3) per-view world keypoints
    vertices: jnp.ndarray,     # (B, N*V, 3) per-view posed vertices
    faces: jnp.ndarray,        # (N*F, 3) shared topology
    cfg: OcclusionCullingConfig,
    n_person: int,
    use_cull: bool,
) -> jnp.ndarray:
    """All B views' keypoint projection + occlusion ray-casts as ONE device
    dispatch (a vmap over the per-view cull) — the per-view loop was ~B eager
    dispatches per train step, which at DP-8's ~44 conditions/s budget left
    no headroom for host jitter (PERF.md host-pipeline note)."""

    def one(extr, intr, kp, verts):
        kp2d = project_keypoints(kp, extr, intr)
        if use_cull:
            c2w_rot = extr[:3, :3].T
            campos = -c2w_rot @ extr[:3, 3]
            occluded, _ = occlusion_cull(campos, kp, verts, faces,
                                         cfg=cfg, n_person=n_person)
            kp2d = jnp.where(occluded[..., None], jnp.nan, kp2d)
        return kp2d

    return jax.vmap(one)(extrinsics, intrinsics, kp3d, vertices)


class ConditionRenderer:
    """Renders ControlNet conditions for one or more posed persons
    (reference: SMPL2Condition.__call__, smpl_condition.py:271-320)."""

    def __init__(
        self,
        model: SMPLXModelData,
        landmarks: Optional[LandmarkData] = None,
        use_occlusion_culling: bool = True,
        culling: OcclusionCullingConfig = OcclusionCullingConfig(),
        draw_body_keypoints: bool = True,
        draw_hand_keypoints: bool = True,
        draw_face_landmarks: bool = False,
        openpose_left_right_flip: bool = False,
    ):
        self.model = model
        self.landmarks = landmarks
        self.use_occlusion_culling = use_occlusion_culling
        self.culling = culling
        self.draw_body = draw_body_keypoints
        self.draw_hand = draw_hand_keypoints
        self.draw_face = draw_face_landmarks
        self.flip_lr = openpose_left_right_flip

    # -- geometry helpers ---------------------------------------------------

    def _stacked_mesh(self, output: SMPLXOutput):
        """All persons as one soup with per-person vertex offsets."""
        N, V, _ = output.vertices.shape
        verts = output.vertices.reshape(-1, 3)
        f = jnp.asarray(self.model.faces)
        faces = jnp.concatenate([f + i * V for i in range(N)], axis=0)
        return verts, faces

    # -- conditions ----------------------------------------------------------

    def pose_keypoints(
        self,
        output: SMPLXOutput,
        extrinsic: jnp.ndarray,
        intrinsics: jnp.ndarray,
        image_height: int,
        image_width: int,
    ) -> np.ndarray:
        """(N, 128, 2) normalized pixel keypoints, NaN = absent/occluded."""
        kp3d = openpose_keypoints(self.model, output, self.landmarks)
        kp2d = project_keypoints(kp3d, extrinsic, intrinsics)
        if self.use_occlusion_culling:
            verts, faces = self._stacked_mesh(output)
            c2w_rot = extrinsic[:3, :3].T
            campos = -c2w_rot @ extrinsic[:3, 3]
            occluded, _ = occlusion_cull(
                campos, kp3d, verts, faces, cfg=self.culling,
                n_person=output.vertices.shape[0])
            kp2d = jnp.where(occluded[..., None], jnp.nan, kp2d)
        kp2d = np.array(kp2d, np.float32)
        kp2d[..., 0] /= float(image_width)
        kp2d[..., 1] /= float(image_height)
        return kp2d

    def render_pose(self, output, extrinsic, intrinsics,
                    image_height: int, image_width: int) -> np.ndarray:
        """(H, W, 3) uint8 OpenPose map."""
        kp = self.pose_keypoints(output, extrinsic, intrinsics,
                                 image_height, image_width)
        return draw_openpose_map(
            list(kp), image_height, image_width,
            draw_body_kp=self.draw_body, draw_hand_kp=self.draw_hand,
            draw_face_kp=self.draw_face, flip_lr=self.flip_lr)

    def render_pose_batch(
        self,
        outputs: Sequence[SMPLXOutput],
        extrinsics: jnp.ndarray,    # (B, 4, 4)
        intrinsics: jnp.ndarray,    # (B, 3, 3)
        image_height: int,
        image_width: int,
    ) -> list:
        """B views' OpenPose maps with ONE fused device dispatch for all
        projection + occlusion ray-casts (VERDICT r4 #8; reference runs one
        open3d scene per view, smpl_condition.py:82-143). ``outputs`` is one
        SMPLXOutput per view (pass the same object B times to share a pose).
        Only the cv2 skeleton drawing stays host-side, per view."""
        B = int(extrinsics.shape[0])
        assert len(outputs) == B
        kp3d = jnp.stack([
            openpose_keypoints(self.model, o, self.landmarks)
            for o in outputs])
        n_person = outputs[0].vertices.shape[0]
        verts = jnp.stack([o.vertices.reshape(-1, 3) for o in outputs])
        _, faces = self._stacked_mesh(outputs[0])
        kp2d = _pose_cull_project_batch(
            jnp.asarray(extrinsics), jnp.asarray(intrinsics), kp3d, verts,
            faces, cfg=self.culling, n_person=n_person,
            use_cull=self.use_occlusion_culling)
        kp2d = np.array(kp2d, np.float32)  # one host pull for all views
        kp2d[..., 0] /= float(image_width)
        kp2d[..., 1] /= float(image_height)
        return [
            draw_openpose_map(
                list(kp2d[i]), image_height, image_width,
                draw_body_kp=self.draw_body, draw_hand_kp=self.draw_hand,
                draw_face_kp=self.draw_face, flip_lr=self.flip_lr)
            for i in range(B)
        ]

    def render_depth(self, output, extrinsic, intrinsics,
                     image_height: int, image_width: int,
                     raw: bool = False):
        """Inverse-normalized uint8 depth, or raw metric (H, W) when
        ``raw`` (reference: export_depth, smpl_condition.py:237-249 — raw
        depth feeds the NeRF-pretrain loss, trainer.py:1242-1279)."""
        verts, faces = self._stacked_mesh(output)
        render = rasterize_mesh(verts, faces, extrinsic, intrinsics,
                                image_height, image_width)
        depth = np.asarray(render.depth)
        mask = np.asarray(render.mask)
        if raw:
            return np.where(mask, depth, 0.0), mask
        inv = np.where(mask, 1.0 / np.maximum(depth, 1e-6), 0.0)
        lo, hi = inv.min(), inv.max()
        inv = (inv - lo) / max(hi - lo, 1e-12)
        img = (inv * 255.0).astype(np.uint8)
        return np.stack([img] * 3, axis=-1)

    def render_normal(self, output, extrinsic, intrinsics,
                      image_height: int, image_width: int) -> np.ndarray:
        """(H, W, 3) uint8 world-normal map (nvdiffrast replacement)."""
        verts, faces = self._stacked_mesh(output)
        render = rasterize_mesh(verts, faces, extrinsic, intrinsics,
                                image_height, image_width)
        n = np.asarray(render.normal)
        img = ((n * 0.5 + 0.5) * 255.0).astype(np.uint8)
        img[~np.asarray(render.mask)] = 0
        return img

    def render_mesh(self, output, extrinsic, intrinsics,
                    image_height: int, image_width: int,
                    light_dir=(0.3, 0.8, 0.5)) -> np.ndarray:
        """Shaded mesh render: Lambertian gray over the z-buffer
        (reference 'mesh' condition via trimesh/pyrender offscreen,
        smpl_condition.py:316-318 + utils/trimesh.py)."""
        verts, faces = self._stacked_mesh(output)
        render = rasterize_mesh(verts, faces, extrinsic, intrinsics,
                                image_height, image_width)
        n = np.asarray(render.normal)
        l = np.asarray(light_dir, np.float32)
        l = l / np.linalg.norm(l)
        lam = np.abs(n @ l)
        shade = 0.25 + 0.75 * lam
        img = (np.clip(shade, 0, 1) * 255.0).astype(np.uint8)
        img[~np.asarray(render.mask)] = 255  # white background
        return np.stack([img] * 3, axis=-1)

    def __call__(
        self,
        output: SMPLXOutput,
        extrinsic: jnp.ndarray,
        intrinsics: jnp.ndarray,
        condition_type: str,
        condition_height: int,
        condition_width: int,
    ):
        """Dispatch like the reference (smpl_condition.py:271-320). Returns
        uint8 (H, W, 3) for image conditions; ('depth_raw') returns
        (depth (H, W) float, mask (H, W) bool)."""
        args = (output, extrinsic, intrinsics, condition_height, condition_width)
        if condition_type in ("pose", "openpose"):
            return self.render_pose(*args)
        if condition_type == "depth":
            return self.render_depth(*args)
        if condition_type == "depth_raw":
            return self.render_depth(*args, raw=True)
        if condition_type == "normal":
            return self.render_normal(*args)
        if condition_type == "mesh":
            return self.render_mesh(*args)
        raise NotImplementedError(condition_type)


def conditions_to_batch(images: Sequence[np.ndarray]) -> jnp.ndarray:
    """uint8 condition images -> (B, H, W, 3) float32 in [0, 1] for the
    ControlNet input (reference: prepare_condition, controlnet.py:33-72)."""
    arr = np.stack([np.asarray(im, np.float32) / 255.0 for im in images])
    return jnp.asarray(arr)
