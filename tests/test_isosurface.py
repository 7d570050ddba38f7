"""Marching-tetrahedra isosurface tests."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreamwaltz_g_tpu.nerf.isosurface import (
    compact_mesh,
    make_tet_grid,
    marching_tets,
    save_obj,
)


def test_sphere_isosurface():
    """Extracted vertices lie on the zero level set of a sphere SDF."""
    verts, tets = make_tet_grid(24, bound=1.0)
    r = 0.6
    sdf = r - jnp.linalg.norm(jnp.asarray(verts), axis=-1)  # >0 inside
    soup = marching_tets(jnp.asarray(verts), sdf, jnp.asarray(tets))
    v, f = compact_mesh(soup)
    assert v.shape[0] > 100 and f.shape[0] > 100
    radii = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(radii, r, atol=0.06)
    # mesh bounding box is symmetric around the origin
    np.testing.assert_allclose(v.mean(0), 0.0, atol=0.02)


def test_empty_and_full_fields():
    verts, tets = make_tet_grid(8, bound=1.0)
    soup = marching_tets(jnp.asarray(verts), jnp.full((verts.shape[0],), 1.0),
                         jnp.asarray(tets))
    assert not bool(soup.valid.any())
    soup = marching_tets(jnp.asarray(verts), jnp.full((verts.shape[0],), -1.0),
                         jnp.asarray(tets))
    assert not bool(soup.valid.any())


def test_differentiable_through_sdf():
    verts, tets = make_tet_grid(8, bound=1.0)
    verts = jnp.asarray(verts)
    tets = jnp.asarray(tets)

    def loss(r):
        sdf = r - jnp.linalg.norm(verts, axis=-1)
        soup = marching_tets(verts, sdf, tets)
        # mean squared radius of emitted points, weighted by validity
        pts = soup.vertices.reshape(-1, 3)
        w = jnp.repeat(soup.valid, 3).astype(jnp.float32)
        return jnp.sum(w * jnp.sum(pts ** 2, -1)) / jnp.maximum(w.sum(), 1.0)

    g = jax.grad(loss)(0.5)
    # enlarging the sphere increases emitted radii
    assert float(g) > 0


def test_save_obj(tmp_path):
    verts, tets = make_tet_grid(8, bound=1.0)
    sdf = 0.5 - jnp.linalg.norm(jnp.asarray(verts), axis=-1)
    v, f = compact_mesh(marching_tets(jnp.asarray(verts), sdf,
                                      jnp.asarray(tets)))
    p = save_obj(str(tmp_path / "s.obj"), v, f, colors=np.ones_like(v) * 0.5)
    text = open(p).read()
    assert text.count("\nf ") + text.startswith("f ") == f.shape[0]


@pytest.mark.slow
def test_dmtet_render_and_grads():
    """DMTet sphere renders a silhouette and gradients reach the SDF."""
    import jax
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.nerf.dmtet import DMTetModel, render_dmtet_splats

    model = DMTetModel.create(resolution=12, bound=1.0)
    params = model.init_sphere(0.5)
    cam = make_camera_batch(2.5, 0.0, 90.0, 60.0, 32, 32)

    def loss(p):
        soup = model.extract(p)
        M = soup.vertices.shape[0]
        colors = jnp.ones((M, 3)) * 0.8
        out = render_dmtet_splats(
            soup, colors, cam.extrinsic[0], cam.intrinsics[0], 32, 32,
            tile_size=8, capacity=128, chunk=64)
        return jnp.mean(out.alpha), out

    (alpha_mean, out), g = jax.value_and_grad(loss, has_aux=True)(params)
    assert float(alpha_mean) > 0.05  # sphere covers part of the frame
    assert float(jnp.abs(g.sdf).sum()) > 0
    assert float(jnp.abs(g.deform).sum()) > 0
