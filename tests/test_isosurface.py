"""Marching-tetrahedra isosurface tests."""
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
