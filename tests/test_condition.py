"""Tests for ray casting, mesh rasterization, and condition rendering."""
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.data.camera import make_camera_batch
from dreamwaltz_g_tpu.human.condition import (
    ConditionRenderer,
    OcclusionCullingConfig,
    occlusion_cull,
)
from dreamwaltz_g_tpu.human.openpose import draw_openpose_map
from dreamwaltz_g_tpu.human.smplx_model import (
    default_params,
    make_synthetic_model,
    smplx_forward,
)
from dreamwaltz_g_tpu.ops.raycast import cast_rays, rasterize_mesh


def _unit_quad(z=2.0, half=1.0):
    """Two triangles forming a quad at depth z facing -z."""
    v = jnp.asarray([
        [-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z],
    ])
    f = jnp.asarray([[0, 1, 2], [0, 2, 3]])
    return v, f


class TestCastRays:
    def test_hit_and_miss(self):
        v, f = _unit_quad(z=2.0)
        rays_o = jnp.zeros((2, 3))
        rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
        t, prim = cast_rays(rays_o, rays_d, v, f)
        assert np.isclose(float(t[0]), 2.0, atol=1e-5)
        assert prim[0] >= 0
        assert np.isinf(float(t[1]))
        assert int(prim[1]) == -1

    def test_nearest_of_two(self):
        v1, f1 = _unit_quad(z=2.0)
        v2, f2 = _unit_quad(z=1.0)
        v = jnp.concatenate([v1, v2])
        f = jnp.concatenate([f1, f2 + 4])
        t, _ = cast_rays(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]), v, f)
        assert np.isclose(float(t[0]), 1.0, atol=1e-5)

    def test_geometry_ids(self):
        v1, f1 = _unit_quad(z=1.0)
        v2, f2 = _unit_quad(z=2.0)
        # person 0 = near quad, person 1 = far quad
        v = jnp.concatenate([v1, v2])
        f = jnp.concatenate([f1, f2 + 4])
        t, geom = cast_rays(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]),
                            v, f, geometry_sizes=(2, 2))
        assert int(geom[0]) == 0


class TestRasterizeMesh:
    def _cam(self, H=64, W=64):
        return make_camera_batch(2.5, 0.0, 90.0, 60.0, H, W)

    def test_quad_depth(self):
        # camera at azim=0, elev=90 looks from +z toward origin (radius 2.5)
        cam = self._cam()
        v, f = _unit_quad(z=0.0, half=0.5)  # quad in the xy plane at origin
        out = rasterize_mesh(v, f, cam.extrinsic[0], cam.intrinsics[0], 64, 64)
        center = out.depth[32, 32]
        assert bool(out.mask[32, 32])
        assert np.isclose(float(center), 2.5, atol=0.02)
        # corners are empty
        assert not bool(out.mask[2, 2])

    def test_depth_matches_raycast(self):
        cam = self._cam(32, 32)
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(30, 3)) * 0.4, jnp.float32)
        f = jnp.asarray(rng.integers(0, 30, size=(40, 3)))
        out = rasterize_mesh(v, f, cam.extrinsic[0], cam.intrinsics[0], 32, 32,
                             tile_size=8, capacity=64, chunk=32)
        # cross-check a few covered pixels against brute ray casting
        from dreamwaltz_g_tpu.data.camera import get_rays
        rays_o, rays_d = get_rays(cam.c2w, cam.intrinsics, 32, 32)
        mask = np.asarray(out.mask).reshape(-1)
        depth = np.asarray(out.depth).reshape(-1)
        idx = np.nonzero(mask)[0][:16]
        if len(idx) == 0:
            pytest.skip("random mesh not visible")
        t, _ = cast_rays(rays_o[0, idx], rays_d[0, idx], v, f)
        # depth is camera z; ray t is along the (unit) ray — convert via
        # the z-component of the ray direction in camera space
        W3 = np.asarray(cam.extrinsic[0][:3, :3])
        dz = (np.asarray(rays_d[0, idx]) @ W3.T)[:, 2]
        np.testing.assert_allclose(depth[idx], np.asarray(t) * dz, rtol=0.05)


class TestOcclusionCulling:
    def test_keypoint_behind_wall(self):
        v, f = _unit_quad(z=1.0, half=5.0)
        campos = jnp.zeros(3)
        # one "person" with 128 keypoints all at z=2 (behind the wall)
        kp = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (128, 1))[None]
        occluded, _ = occlusion_cull(
            campos, kp, v, f,
            cfg=OcclusionCullingConfig(ignore_body_self_occlusion=False),
            n_person=1)
        assert bool(occluded.all())

    def test_visible_keypoints(self):
        v, f = _unit_quad(z=5.0, half=5.0)  # wall behind the keypoints
        campos = jnp.zeros(3)
        kp = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (128, 1))[None]
        occluded, _ = occlusion_cull(
            campos, kp, v, f,
            cfg=OcclusionCullingConfig(ignore_body_self_occlusion=False),
            n_person=1)
        assert not bool(occluded.any())


class TestOpenPoseDraw:
    def test_draw_shapes_and_content(self):
        rng = np.random.default_rng(0)
        kp = rng.uniform(0.2, 0.8, size=(128, 2)).astype(np.float32)
        img = draw_openpose_map([kp], 256, 256)
        assert img.shape == (256, 256, 3) and img.dtype == np.uint8
        assert img.max() > 0  # something was drawn

    def test_nan_keypoints_skipped(self):
        kp = np.full((128, 2), np.nan, np.float32)
        img = draw_openpose_map([kp], 64, 64)
        assert img.sum() == 0


class TestConditionRenderer:
    def test_depth_and_normal_on_synthetic_body(self):
        model = make_synthetic_model()
        out = smplx_forward(model, default_params(model))
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, 64, 64)
        r = ConditionRenderer(model, use_occlusion_culling=False)
        depth = r(out, cam.extrinsic[0], cam.intrinsics[0], "depth", 64, 64)
        assert depth.shape == (64, 64, 3) and depth.dtype == np.uint8
        raw, mask = r(out, cam.extrinsic[0], cam.intrinsics[0], "depth_raw", 64, 64)
        assert raw.shape == (64, 64) and mask.any()
        # raw metric depth in a plausible range where covered
        assert 1.0 < raw[mask].mean() < 4.0
        normal = r(out, cam.extrinsic[0], cam.intrinsics[0], "normal", 64, 64)
        assert normal.shape == (64, 64, 3)

    def test_pose_condition_runs(self):
        model = make_synthetic_model()
        out = smplx_forward(model, default_params(model))
        cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, 64, 64)
        r = ConditionRenderer(model, use_occlusion_culling=True)
        img = r(out, cam.extrinsic[0], cam.intrinsics[0], "pose", 64, 64)
        assert img.shape == (64, 64, 3)

    def test_pose_batch_matches_per_view(self):
        """The fused B-view dispatch (VERDICT r4 #8) must reproduce the
        per-view path byte-for-byte, including per-view poses."""
        model = make_synthetic_model()
        rng = np.random.default_rng(3)
        outs = []
        for _ in range(3):
            p = default_params(model)
            p = p._replace(body_pose=jnp.asarray(
                rng.normal(scale=0.2, size=p.body_pose.shape), jnp.float32))
            outs.append(smplx_forward(model, p))
        cams = make_camera_batch(
            np.asarray([2.0, 2.5, 3.0], np.float32),
            np.asarray([0.0, 120.0, 240.0], np.float32),
            np.asarray([10.0, 45.0, 80.0], np.float32),
            np.full(3, 60.0, np.float32), 64, 64)
        r = ConditionRenderer(model, use_occlusion_culling=True)
        batched = r.render_pose_batch(outs, cams.extrinsic, cams.intrinsics,
                                      64, 64)
        for i in range(3):
            single = r(outs[i], cams.extrinsic[i], cams.intrinsics[i],
                       "pose", 64, 64)
            np.testing.assert_array_equal(batched[i], single)


def test_mesh_condition():
    from dreamwaltz_g_tpu.human.condition import ConditionRenderer
    from dreamwaltz_g_tpu.human.smplx_model import (
        default_params,
        make_synthetic_model,
        smplx_forward,
    )

    model = make_synthetic_model()
    out = smplx_forward(model, default_params(model))
    cam = make_camera_batch(2.5, 0.0, 80.0, 60.0, 48, 48)
    r = ConditionRenderer(model, use_occlusion_culling=False)
    img = r(out, cam.extrinsic[0], cam.intrinsics[0], "mesh", 48, 48)
    assert img.shape == (48, 48, 3) and img.dtype == np.uint8
    # background is white, body darker
    assert img.max() == 255 and img.min() < 250
