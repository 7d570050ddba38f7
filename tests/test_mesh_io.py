"""Mesh container, OBJ roundtrip, tangents, renderer
(reference: utils/mesh.py:279-808)."""
import numpy as np
import pytest

from dreamwaltz_g_tpu.utils.mesh_io import (
    Mesh,
    compute_vertex_normals,
    convert_vertex_indices_to_face_indices,
    render_mesh,
    vertex_colors_to_albedo_image,
)
from tests.test_mesh_export import _sphere_mesh


def test_obj_roundtrip_with_texture(tmp_path):
    v, f = _sphere_mesh(6)
    m = Mesh(v=v, f=f).auto_normal().auto_uv()
    m.set_albedo(np.full((32, 32, 3), 0.5, np.float32))
    p = m.write(str(tmp_path / "m.obj"))
    m2 = Mesh.load_obj(p)
    np.testing.assert_allclose(m2.v, m.v, atol=1e-5)
    np.testing.assert_array_equal(m2.f, m.f)
    np.testing.assert_allclose(m2.vt, m.vt, atol=1e-5)
    assert m2.albedo is not None and m2.albedo.shape == (32, 32, 3)
    np.testing.assert_allclose(m2.albedo, 0.5, atol=0.01)


def test_normals_point_outward_on_sphere():
    v, f = _sphere_mesh(10)
    vn = compute_vertex_normals(v, f)
    r = np.linalg.norm(v, axis=1, keepdims=True)
    ok = r[:, 0] > 0.3  # skip pole degenerates
    align = np.abs(np.sum(vn[ok] * v[ok] / r[ok], axis=1))
    assert align.mean() > 0.9


def test_tangents_orthogonalish():
    v, f = _sphere_mesh(8)
    m = Mesh(v=v, f=f).auto_uv().compute_tangents()
    assert m.tangents.shape == (len(m.vt), 3)
    n = np.linalg.norm(m.tangents, axis=1)
    assert np.isfinite(m.tangents).all()
    # normalized where defined (pole-degenerate uv-verts stay zero)
    assert (n > 0.5).mean() > 0.6


def test_vertex_color_bake():
    v, f = _sphere_mesh(6)
    m = Mesh(v=v, f=f).auto_uv()
    cols = np.tile([[0.1, 0.9, 0.3]], (len(v), 1))
    tex = vertex_colors_to_albedo_image(m, cols, texture_size=64)
    filled = tex.sum(-1) > 0
    np.testing.assert_allclose(tex[filled].mean(0), [0.1, 0.9, 0.3],
                               atol=0.05)


def test_vertex_to_face_indices():
    f = np.asarray([[0, 1, 2], [2, 3, 4], [0, 2, 4]])
    out = convert_vertex_indices_to_face_indices([0, 1, 2, 4], f)
    np.testing.assert_array_equal(out, [0, 2])


def test_render_mesh_textured(tmp_path):
    import jax
    from dreamwaltz_g_tpu.data.camera import make_camera_batch

    v, f = _sphere_mesh(10)
    m = Mesh(v=v, f=f).auto_normal().auto_uv()
    m.set_albedo(np.full((32, 32, 3), [0.9, 0.1, 0.1], np.float32))
    cam = make_camera_batch(3.0, 0.0, 90.0, 50.0, 48, 48)
    rgb, alpha, depth = render_mesh(
        m, np.asarray(cam.extrinsic[0]), np.asarray(cam.intrinsics[0]),
        48, 48, bg_color=(0.0, 0.0, 0.0))
    assert alpha.max() == 1.0 and alpha.mean() > 0.05
    # the sphere shows red-dominant shading where hit
    hit = alpha > 0
    assert rgb[hit][:, 0].mean() > 2 * rgb[hit][:, 1].mean()
    # depth is near the camera radius minus sphere radius
    d = depth[hit]
    assert 1.5 < d.min() < 2.5
