"""NeRF -> textured mesh export toolchain (reference: to_mesh.py:12-339)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.nerf import mesh_export as ME


def _sphere_mesh(n=12):
    """UV-sphere test mesh."""
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    verts, faces = [], []
    idx = {}
    for i, t in enumerate(th):
        for j, p in enumerate(ph):
            idx[(i, j)] = len(verts)
            verts.append([np.sin(t) * np.cos(p), np.cos(t),
                          np.sin(t) * np.sin(p)])
    for i in range(n - 1):
        for j in range(2 * n):
            j2 = (j + 1) % (2 * n)
            a, b = idx[(i, j)], idx[(i, j2)]
            c, d = idx[(i + 1, j)], idx[(i + 1, j2)]
            faces.append([a, b, c])
            faces.append([b, d, c])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int64)


class _ConstModel:
    """Fake NeRF: density 20 inside unit sphere, fixed color."""

    bound = 1.5

    def density(self, params, pts):
        r = jnp.linalg.norm(pts, axis=-1)
        sigma = jnp.where(r < 1.0, 20.0, 0.0)
        albedo = jnp.broadcast_to(jnp.asarray([0.8, 0.2, 0.1]),
                                  pts.shape[:-1] + (3,))
        return sigma, albedo


def test_clean_mesh_merges_and_prunes():
    v, f = _sphere_mesh(8)
    # duplicate a vertex slightly offset + add a floating micro-triangle
    v2 = np.concatenate([v, v[:1] + 1e-6,
                         np.asarray([[5.0, 5.0, 5.0], [5.01, 5.0, 5.0],
                                     [5.0, 5.01, 5.0]], np.float32)])
    f2 = np.concatenate([f, [[len(v), 1, 2]],
                         [[len(v) + 1, len(v) + 2, len(v) + 3]]]).astype(np.int64)
    cv, cf = ME.clean_mesh(v2, f2)
    # micro component removed, duplicate vertex merged
    assert len(cv) <= len(v)
    assert cf.max() < len(cv)
    assert (np.abs(cv).max() < 2.0)  # the distant junk triangle is gone


def test_decimate_mesh_reduces_faces():
    v, f = _sphere_mesh(14)
    target = len(f) // 4
    dv, df = ME.decimate_mesh(v, f, target)
    assert len(df) <= target * 1.2
    # shape preserved: vertices stay near the unit sphere
    r = np.linalg.norm(dv, axis=1)
    assert 0.7 < r.mean() < 1.1


def test_unwrap_uv_in_unit_square():
    v, f = _sphere_mesh(8)
    vt, ft = ME.unwrap_uv(v, f)
    assert ft.shape == f.shape
    assert vt.min() >= -1e-6 and vt.max() <= 1.0 + 1e-6
    assert ft.max() < len(vt)


def test_bake_albedo_fills_charts():
    v, f = _sphere_mesh(6)
    vt, ft = ME.unwrap_uv(v, f)
    model = _ConstModel()
    tex = ME.bake_albedo(model, None, v, f, vt, ft, texture_size=64,
                         chunk=256)
    filled = (tex.sum(-1) > 0)
    assert filled.mean() > 0.05  # charts cover part of the atlas
    fc = tex[filled]
    np.testing.assert_allclose(fc.mean(0), [0.8, 0.2, 0.1], atol=0.05)


def test_export_textured_mesh_end_to_end(tmp_path):
    model = _ConstModel()
    obj = ME.export_textured_mesh(model, None, str(tmp_path),
                                  resolution=24, density_thresh=10.0,
                                  decimate_target=300, texture_size=64)
    assert os.path.isfile(obj)
    assert os.path.isfile(str(tmp_path / "mesh.mtl"))
    assert os.path.isfile(str(tmp_path / "albedo.png"))
    txt = open(obj).read()
    assert "vt " in txt and "f " in txt and "mtllib" in txt
    # faces reference valid v/vt indices
    nv = txt.count("\nv ") + txt.startswith("v ")
    for line in txt.splitlines():
        if line.startswith("f "):
            for part in line.split()[1:]:
                vi, ti = part.split("/")
                assert int(vi) >= 1 and int(ti) >= 1
