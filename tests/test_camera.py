import jax.numpy as jnp
import numpy as np

from dreamwaltz_g_tpu.data import camera as C


def test_angle_to_position_conventions():
    # elevation is polar-from-+y: elev=0 -> on +y axis; elev=90, azim=0 -> +z
    p = C.angle_to_position(jnp.asarray([1.0]), jnp.asarray([0.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(p, [[0.0, 1.0, 0.0]], atol=1e-6)
    p = C.angle_to_position(jnp.asarray([2.0]), jnp.asarray([90.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(p, [[0.0, 0.0, 2.0]], atol=1e-6)
    p = C.angle_to_position(jnp.asarray([2.0]), jnp.asarray([90.0]), jnp.asarray([90.0]))
    np.testing.assert_allclose(p, [[2.0, 0.0, 0.0]], atol=1e-6)


def test_extrinsic_inverse_of_c2w():
    r = jnp.asarray([2.5, 3.0])
    az = jnp.asarray([30.0, 200.0])
    el = jnp.asarray([80.0, 95.0])
    w2c, c2w = C.to_extrinsic(r, az, el)
    np.testing.assert_allclose(w2c @ c2w, np.broadcast_to(np.eye(4), (2, 4, 4)), atol=1e-5)


def test_camera_looks_at_origin():
    cam = C.make_camera_batch(3.0, 45.0, 80.0, 49.1, 64, 64)
    # the origin should project to NDC (0, 0) and positive depth
    ndc, w = __import__(
        "dreamwaltz_g_tpu.utils.transforms", fromlist=["transform_points_homogeneous"]
    ).transform_points_homogeneous(cam.full_projection, jnp.zeros((1, 3)))
    assert float(w[0]) > 0
    np.testing.assert_allclose(ndc[0, :2], [0.0, 0.0], atol=1e-5)


def test_projection_depth_range():
    z_near, z_far = 0.01, 100.0
    cam = C.make_camera_batch(3.0, 0.0, 90.0, 49.1, 64, 64, z_near=z_near, z_far=z_far)
    from dreamwaltz_g_tpu.utils.transforms import transform_points_homogeneous

    # a point at distance z_near in front of the camera maps to ndc z=-1
    fwd = cam.c2w[0, :3, 2]
    campos = cam.campos[0]
    for dist, expect in [(z_near, -1.0), (z_far, 1.0)]:
        p = campos + fwd * dist
        ndc, w = transform_points_homogeneous(cam.full_projection, p[None])
        np.testing.assert_allclose(float(ndc[0, 2]), expect, atol=1e-3)
        np.testing.assert_allclose(float(w[0]), dist, atol=1e-4)
    # and the ndc<->depth helpers agree
    d = jnp.asarray([0.5, 1.0, 7.0])
    nd = C.depth_to_ndc_depth(d, z_near, z_far)
    np.testing.assert_allclose(C.ndc_depth_to_depth(nd, z_near, z_far), d, rtol=1e-4)


def test_get_rays_through_center_pixel():
    H = W = 65  # odd so the exact center pixel center is offset by 0.5 from cx
    cam = C.make_camera_batch(3.0, 120.0, 70.0, 49.1, H, W)
    rays_o, rays_d = C.get_rays(cam.c2w, cam.intrinsics, H, W)
    assert rays_o.shape == (1, H * W, 3) and rays_d.shape == (1, H * W, 3)
    np.testing.assert_allclose(rays_o[0, 0], cam.campos[0], atol=1e-6)
    # all rays are unit-norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5)
    # the ray at pixel (cy, cx) is ~ the camera forward axis
    cx = cy = H // 2
    center = np.asarray(rays_d[0, cy * W + cx])
    fwd = np.asarray(cam.c2w[0, :3, 2])
    assert np.dot(center, fwd) > 0.999


def test_get_rays_y_flip():
    # with negative fy, increasing row index (image downward) should produce
    # rays tilted toward world -y for an upright camera at the equator
    H = W = 33
    cam = C.make_camera_batch(3.0, 0.0, 90.0, 60.0, H, W)
    _, rays_d = C.get_rays(cam.c2w, cam.intrinsics, H, W)
    top = np.asarray(rays_d[0, 0 * W + W // 2])
    bottom = np.asarray(rays_d[0, (H - 1) * W + W // 2])
    assert top[1] > bottom[1]


def test_intrinsics_resize_consistency():
    tanfov = jnp.asarray([0.5])
    K64 = C.to_intrinsics(tanfov, 64, 64)
    K128 = C.to_intrinsics(tanfov, 128, 128)
    np.testing.assert_allclose(np.asarray(K128[0, 0, 0]) / np.asarray(K64[0, 0, 0]), 2.0)


class TestCameraViz:
    def test_wireframes_shape_and_colors(self):
        """(reference: visualize_camera, data/camera/utils.py:716-769 —
        8 frustum segments + 3 axis segments per camera; direction-indexed
        color wheel)."""
        from dreamwaltz_g_tpu.data.camera import (
            camera_wireframes,
            make_camera_batch,
        )

        cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, 64, 64)
        c2w = np.concatenate([np.asarray(cam.c2w)] * 3, axis=0)
        segs, colors = camera_wireframes(c2w, dirs=[0, 1, 5])
        assert segs.shape == (3 * 11, 2, 3)
        assert colors.shape == (3 * 11, 3)
        # frustum apex is the camera position
        np.testing.assert_allclose(segs[0, 0], np.asarray(c2w)[0, :3, 3],
                                   atol=1e-6)
        # second camera's frustum wears the 'front' color (255,0,0)
        assert tuple(colors[11]) == (255, 0, 0)

    def test_draw_camera_viz_png(self):
        from dreamwaltz_g_tpu.data.camera import (
            draw_camera_viz,
            make_camera_batch,
        )

        cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, 64, 64)
        body = np.random.default_rng(0).normal(size=(50, 3)) * 0.3
        img = draw_camera_viz(cam.c2w, smpl_vertices=body, image_size=128)
        assert img.shape == (128, 128, 3) and img.dtype == np.uint8
        assert (img < 250).any(), "nothing was drawn"
