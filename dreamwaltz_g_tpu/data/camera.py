"""Camera math with the reference's coordinate conventions.

The conventions here are load-bearing for checkpoint/render parity with the
reference (reference: data/camera/utils.py:60-242):

* world is y-up; spherical camera position is
  ``(r sin(elev) sin(azim), r cos(elev), r sin(elev) cos(azim))`` —
  "elevation" is the polar angle measured from +y,
* c2w columns are (right, up, lookat): camera-space +z looks at the scene,
* intrinsics carry a **negative fy** (y-flip) and cx=cy=H//2,
* the projection matrix is OpenGL-style with y negated and z_sign=+1
  (pytorch3d right-handed convention), default NDC z-range (-1, 1).

All functions are pure jnp and batched over a leading B dim.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..utils.transforms import look_at_rotation


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def angle_to_position(radius, elevation, azimuth, degrees: bool = True):
    """Spherical -> Cartesian, y-up, elevation measured from +y
    (reference: data/camera/utils.py:60-75)."""
    if degrees:
        azimuth = jnp.deg2rad(azimuth)
        elevation = jnp.deg2rad(elevation)
    return jnp.stack(
        [
            radius * jnp.sin(elevation) * jnp.sin(azimuth),
            radius * jnp.cos(elevation),
            radius * jnp.sin(elevation) * jnp.cos(azimuth),
        ],
        axis=-1,
    )


def to_extrinsic(
    radius: jnp.ndarray,
    azimuth: jnp.ndarray,
    elevation: jnp.ndarray,
    at_vector=((0.0, 0.0, 0.0),),
    up_vector=((0.0, 1.0, 0.0),),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (extrinsic w2c (B, 4, 4), c2w (B, 4, 4))
    (reference: data/camera/utils.py:77-111)."""
    B = radius.shape[0]
    at = jnp.broadcast_to(jnp.asarray(at_vector, jnp.float32), (B, 3))
    up = jnp.broadcast_to(jnp.asarray(up_vector, jnp.float32), (B, 3))
    pos_rel = angle_to_position(radius, elevation, azimuth)
    campos = at + pos_rel
    lookat = _normalize(-pos_rel)
    rot = look_at_rotation(lookat, up)  # columns: right, up, lookat
    c2w = jnp.zeros((B, 4, 4), jnp.float32)
    c2w = c2w.at[:, :3, :3].set(rot)
    c2w = c2w.at[:, :3, 3].set(campos)
    c2w = c2w.at[:, 3, 3].set(1.0)
    # Closed-form rigid inverse.
    rt = jnp.swapaxes(rot, -1, -2)
    w2c = jnp.zeros_like(c2w)
    w2c = w2c.at[:, :3, :3].set(rt)
    w2c = w2c.at[:, :3, 3].set(-jnp.einsum("bij,bj->bi", rt, campos))
    w2c = w2c.at[:, 3, 3].set(1.0)
    return w2c, c2w


def to_intrinsics(tanfov: jnp.ndarray, image_height: int, image_width: int) -> jnp.ndarray:
    """(B,) tanfov -> (B, 3, 3) pinhole intrinsics with negative fy
    (reference: data/camera/utils.py:114-145)."""
    B = tanfov.shape[0]
    f = image_height / (2.0 * tanfov)
    K = jnp.zeros((B, 3, 3), jnp.float32)
    K = K.at[:, 0, 0].set(f)
    K = K.at[:, 1, 1].set(-f)
    K = K.at[:, 0, 2].set(image_height // 2)
    K = K.at[:, 1, 2].set(image_width // 2)
    K = K.at[:, 2, 2].set(1.0)
    return K


def to_projection(
    tanfov: jnp.ndarray,
    z_near: float,
    z_far: float,
    aspect_wh: float = 1.0,
    z_range: Tuple[int, int] = (-1, 1),
    tanfov_x: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """OpenGL-style projection, y negated, z_sign=+1
    (reference: data/camera/utils.py:149-201)."""
    B = tanfov.shape[0]
    max_y = tanfov * z_near
    max_x = max_y * aspect_wh if tanfov_x is None else tanfov_x * z_near
    P = jnp.zeros((B, 4, 4), jnp.float32)
    P = P.at[:, 0, 0].set(z_near / max_x)
    P = P.at[:, 1, 1].set(-z_near / max_y)
    if z_range == (0, 1):
        P = P.at[:, 2, 2].set(z_far / (z_far - z_near))
        P = P.at[:, 2, 3].set(-(z_far * z_near) / (z_far - z_near))
    else:
        P = P.at[:, 2, 2].set((z_far + z_near) / (z_far - z_near))
        P = P.at[:, 2, 3].set(-(2 * z_far * z_near) / (z_far - z_near))
    P = P.at[:, 3, 2].set(1.0)
    return P


def to_screen(batch: int, image_height: int, image_width: int, with_xyflip: bool = False) -> jnp.ndarray:
    """NDC -> pixel matrix (reference: data/camera/utils.py:204-220)."""
    s = -1.0 if with_xyflip else 1.0
    K = jnp.zeros((batch, 4, 4), jnp.float32)
    K = K.at[:, 0, 0].set(s * (image_width - 1.0) / 2.0)
    K = K.at[:, 1, 1].set(s * (image_height - 1.0) / 2.0)
    K = K.at[:, 0, 3].set((image_width - 1.0) / 2.0)
    K = K.at[:, 1, 3].set((image_height - 1.0) / 2.0)
    K = K.at[:, 2, 2].set(1.0)
    K = K.at[:, 3, 3].set(1.0)
    return K


def depth_to_ndc_depth(depth, z_near: float, z_far: float):
    """(reference: data/camera/utils.py:223-225)"""
    return (z_near + z_far - 2 * z_near * z_far / depth) / (z_far - z_near)


def ndc_depth_to_depth(ndc_depth, z_near: float, z_far: float):
    """(reference: data/camera/utils.py:228-230)"""
    return 2 * z_near * z_far / (z_near + z_far - ndc_depth * (z_far - z_near))


def get_rays(c2w: jnp.ndarray, intrinsics: jnp.ndarray, H: int, W: int):
    """Per-pixel rays from c2w + intrinsics (reference: core/nerf/nerf_utils.py:72-139).

    Returns (rays_o (B, H*W, 3), rays_d (B, H*W, 3)). Pixel centers at +0.5;
    the negative fy in the intrinsics flips image y into camera-up.
    """
    B = c2w.shape[0]
    fx, fy = intrinsics[:, 0, 0], intrinsics[:, 1, 1]
    cx, cy = intrinsics[:, 0, 2], intrinsics[:, 1, 2]
    jj, ii = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )  # jj = row (y), ii = col (x)
    i = ii.reshape(1, H * W)
    j = jj.reshape(1, H * W)
    xs = (i - cx[:, None]) / fx[:, None]
    ys = (j - cy[:, None]) / fy[:, None]
    zs = jnp.ones_like(xs)
    dirs = _normalize(jnp.stack([xs, ys, zs], axis=-1))
    rays_d = jnp.einsum("bnk,bik->bni", dirs, c2w[:, :3, :3])
    rays_o = jnp.broadcast_to(c2w[:, None, :3, 3], rays_d.shape)
    return rays_o, rays_d


class CameraBatch(NamedTuple):
    """The camera bundle handed to renderers — mirror of the reference's
    camera dict (reference: core/gaussian/gaussian_renderer.py:23-70,
    data/camera/utils.py:245-357)."""

    extrinsic: jnp.ndarray   # (B, 4, 4) w2c
    c2w: jnp.ndarray         # (B, 4, 4)
    intrinsics: jnp.ndarray  # (B, 3, 3)
    projection: jnp.ndarray  # (B, 4, 4)
    tanfov: jnp.ndarray      # (B,)
    radius: jnp.ndarray      # (B,)
    azimuth: jnp.ndarray     # (B,) degrees
    elevation: jnp.ndarray   # (B,) degrees, polar-from-+y
    image_height: int
    image_width: int

    @property
    def full_projection(self) -> jnp.ndarray:
        """world -> NDC: P @ w2c, (B, 4, 4). The reference builds the same
        product transposed for the row-vector CUDA rasterizer
        (gaussian_renderer.py:37-38); we keep column-vector convention."""
        return self.projection @ self.extrinsic

    @property
    def campos(self) -> jnp.ndarray:
        return self.c2w[:, :3, 3]


def make_camera_batch(
    radius,
    azimuth,
    elevation,
    fov_degrees,
    image_height: int,
    image_width: int,
    z_near: float = 0.01,
    z_far: float = 100.0,
    at_vector=((0.0, 0.0, 0.0),),
) -> CameraBatch:
    radius = jnp.atleast_1d(jnp.asarray(radius, jnp.float32))
    azimuth = jnp.atleast_1d(jnp.asarray(azimuth, jnp.float32))
    elevation = jnp.atleast_1d(jnp.asarray(elevation, jnp.float32))
    fov = jnp.atleast_1d(jnp.asarray(fov_degrees, jnp.float32))
    tanfov = jnp.tan(jnp.deg2rad(fov) / 2.0)
    w2c, c2w = to_extrinsic(radius, azimuth, elevation, at_vector=at_vector)
    K = to_intrinsics(tanfov, image_height, image_width)
    P = to_projection(tanfov, z_near, z_far, aspect_wh=image_width / image_height)
    return CameraBatch(
        extrinsic=w2c,
        c2w=c2w,
        intrinsics=K,
        projection=P,
        tanfov=tanfov,
        radius=radius,
        azimuth=azimuth,
        elevation=elevation,
        image_height=image_height,
        image_width=image_width,
    )


# ---------------------------------------------------------------------------
# Camera visualization (debug helpers)
# ---------------------------------------------------------------------------

#: frustum wire color per view direction index (reference DIR_COLORS,
#: data/camera/utils.py:723-731: default/front/side/back/side/overhead/bottom)
_DIR_COLORS = (
    (0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
    (255, 255, 0), (255, 0, 255), (0, 255, 255),
)


def camera_wireframes(c2w, dirs=None, size: float = 0.2,
                      draw_axis: bool = True):
    """Line-segment geometry for a batch of camera poses
    (reference: visualize_camera, data/camera/utils.py:716-769 — the same
    8-segment frustum pyramid per camera plus optional world-scaled local
    axes; trimesh scene objects become plain (segments, colors) arrays
    here, renderable by :func:`draw_camera_viz` without a GL stack).

    Args:
        c2w: (B, 4, 4) camera-to-world poses (array-like).
        dirs: optional (B,) view-direction indices into the 7-color wheel.
    Returns:
        (segs (S, 2, 3) float32, colors (S, 3) uint8)
    """
    import numpy as np

    c2w = np.asarray(c2w, np.float32)
    if c2w.ndim == 2:
        c2w = c2w[None]
    B = c2w.shape[0]
    if dirs is None:
        dirs = np.zeros((B,), np.int8)
    segs, colors = [], []
    for pose, d in zip(c2w, np.asarray(dirs)):
        pos = pose[:3, 3]
        r, u, f = pose[:3, 0], pose[:3, 1], pose[:3, 2]
        a = pos + size * r + size * u + size * f
        b = pos - size * r + size * u + size * f
        c = pos - size * r - size * u + size * f
        e = pos + size * r - size * u + size * f
        quad = [[pos, a], [pos, b], [pos, c], [pos, e],
                [a, b], [b, c], [c, e], [e, a]]
        segs += quad
        colors += [_DIR_COLORS[int(d) % 7]] * len(quad)
        if draw_axis:
            # reference scales: x/y half-length, z stretched 5x
            # (utils.py:758-760) — XYZ <-> RGB
            for axis, scale, col in ((0, 0.5, (255, 0, 0)),
                                     (1, 0.5, (0, 255, 0)),
                                     (2, 5.0, (0, 0, 255))):
                segs.append([pos, pos + scale * pose[:3, axis]])
                colors.append(col)
    import numpy as _np
    return (_np.asarray(segs, _np.float32),
            _np.asarray(colors, _np.uint8))


def draw_camera_viz(c2w, dirs=None, smpl_vertices=None, size: float = 0.2,
                    image_size: int = 512, plane: str = "xz"):
    """Render the camera rig (and optionally the body point cloud) to an
    orthographic debug PNG array (reference: visualize_camera_with_smpl,
    data/camera/utils.py:772-792 — the reference opens a trimesh GL window;
    headless TPU pods get a cv2 canvas instead).

    ``plane`` picks the two world axes to project onto ('xz' top view,
    'xy' front view).
    Returns (H, W, 3) uint8 in RGB channel order (the reference DIR_COLORS
    are RGB); convert with ``img[..., ::-1]`` before ``cv2.imwrite``.
    """
    import cv2
    import numpy as np

    segs, colors = camera_wireframes(c2w, dirs=dirs, size=size)
    ax = {"x": 0, "y": 1, "z": 2}
    i, j = ax[plane[0]], ax[plane[1]]
    pts = segs.reshape(-1, 3)[:, [i, j]]
    if smpl_vertices is not None:
        sv = np.asarray(smpl_vertices, np.float32).reshape(-1, 3)[:, [i, j]]
        pts = np.concatenate([pts, sv], axis=0)
    lo = pts.min(axis=0) - 0.2
    hi = pts.max(axis=0) + 0.2
    scale = (image_size - 1) / max(float((hi - lo).max()), 1e-6)

    def to_px(p):
        q = (p - lo) * scale
        return int(round(float(q[0]))), image_size - 1 - int(round(float(q[1])))

    img = np.full((image_size, image_size, 3), 255, np.uint8)
    if smpl_vertices is not None:
        sv = np.asarray(smpl_vertices, np.float32).reshape(-1, 3)[:, [i, j]]
        for p in sv:
            cv2.circle(img, to_px(p), 1, (80, 80, 80), -1)
    for (p0, p1), col in zip(segs[:, :, [i, j]], colors):
        cv2.line(img, to_px(p0), to_px(p1),
                 tuple(int(x) for x in col), 1, cv2.LINE_AA)
    return img
