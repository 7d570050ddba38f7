import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.utils import transforms as T


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_multiply_identity(rng):
    q = jnp.asarray(random_quats(rng, 16))
    ident = T.quat_identity((16,))
    np.testing.assert_allclose(T.quat_multiply(ident, q), q, atol=1e-6)
    np.testing.assert_allclose(T.quat_multiply(q, ident), q, atol=1e-6)


def test_quat_conjugate_inverse(rng):
    q = jnp.asarray(random_quats(rng, 16))
    prod = T.quat_multiply(q, T.quat_conjugate(q))
    np.testing.assert_allclose(prod, T.quat_identity((16,)), atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quats(rng, 32))
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    R = T.quat_to_matrix(q)
    np.testing.assert_allclose(
        T.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5
    )


def test_quat_matrix_roundtrip(rng):
    q = jnp.asarray(random_quats(rng, 64))
    # canonicalize sign (w >= 0) like matrix_to_quat does
    q = jnp.where(q[:, :1] < 0, -q, q)
    q2 = T.matrix_to_quat(T.quat_to_matrix(q))
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_matrix_to_quat_edge_cases():
    # 180-degree rotations around each axis stress each Shepperd branch.
    for axis in range(3):
        aa = np.zeros(3, np.float32)
        aa[axis] = np.pi
        R = T.axis_angle_to_matrix(jnp.asarray(aa)[None])
        q = T.matrix_to_quat(R)
        R2 = T.quat_to_matrix(q)
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_axis_angle_small_angle_stable():
    aa = jnp.asarray([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = T.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), atol=1e-6)
    # grads must not be NaN at zero
    g = jax.grad(lambda a: jnp.sum(T.axis_angle_to_matrix(a)))(aa)
    assert np.isfinite(np.asarray(g)).all()


def test_axis_angle_matches_scipy_form(rng):
    # Rodrigues: R @ v for v along axis is unchanged.
    aa = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    R = T.axis_angle_to_matrix(aa)
    axis = aa / jnp.linalg.norm(aa, axis=-1, keepdims=True)
    np.testing.assert_allclose(jnp.einsum("nij,nj->ni", R, axis), axis, atol=1e-5)
    # det = +1
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_rigid_compose_matches_matmul(rng):
    a = T.RigidTransform(
        T.axis_angle_to_matrix(jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)),
        jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
    )
    b = T.RigidTransform(
        T.axis_angle_to_matrix(jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)),
        jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
    )
    # compose: a first, then b  =>  SE3 = b @ a  (reference semantics)
    out = a.compose(b)
    np.testing.assert_allclose(out.se3, b.se3 @ a.se3, atol=1e-5)


def test_rigid_inverse(rng):
    t = T.RigidTransform(
        T.axis_angle_to_matrix(jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)),
        jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
    )
    ident = t.compose(t.inverse()).se3
    np.testing.assert_allclose(ident, jnp.broadcast_to(jnp.eye(4), (5, 4, 4)), atol=1e-5)


def test_rigid_weight_blend(rng):
    J, N = 4, 10
    t = T.RigidTransform(
        T.axis_angle_to_matrix(jnp.asarray(rng.normal(size=(J, 3)), jnp.float32)),
        jnp.asarray(rng.normal(size=(J, 3)), jnp.float32),
    )
    w = jnp.asarray(rng.dirichlet(np.ones(J), size=N), jnp.float32)
    blended = t.weight(w)
    expect = jnp.einsum("nj,jab->nab", w, t.se3)
    np.testing.assert_allclose(blended.se3, expect, atol=1e-5)
    # one-hot weights reduce to indexing
    onehot = jnp.eye(J)[jnp.asarray([1, 3, 0])]
    np.testing.assert_allclose(
        t.weight(onehot).se3, t.index(jnp.asarray([1, 3, 0])).se3, atol=1e-6
    )


def test_transform_points_weighted_equals_manual(rng):
    J, N = 5, 20
    t = T.RigidTransform(
        T.axis_angle_to_matrix(jnp.asarray(rng.normal(size=(J, 3)), jnp.float32)),
        jnp.asarray(rng.normal(size=(J, 3)), jnp.float32),
    )
    w = jnp.asarray(rng.dirichlet(np.ones(J), size=N), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    got = t.transform_points(pts, weights=w)
    M = jnp.einsum("nj,jab->nab", w, t.se3)
    expect = jnp.einsum("nab,nb->na", M[:, :3, :3], pts) + M[:, :3, 3]
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_transform_quaternions_rotation_only(rng):
    # pure-rotation transform: rotating a quaternion then converting to matrix
    # equals matrix product
    q = jnp.asarray(random_quats(rng, 8))
    R = T.axis_angle_to_matrix(jnp.asarray(rng.normal(size=(1, 3)), jnp.float32))
    t = T.RigidTransform.from_rot(jnp.broadcast_to(R, (8, 3, 3)))
    q2 = t.transform_quaternions(q)
    np.testing.assert_allclose(T.quat_to_matrix(q2), R @ T.quat_to_matrix(q), atol=1e-4)


def test_flip_axis_rotate_matches_reference_formula(rng):
    q = jnp.asarray(random_quats(rng, 8))
    R = T.axis_angle_to_matrix(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32))
    got = T.quat_to_matrix(T.quat_flip_axis_rotate(R, q))
    # reference (inverse_lbs.py:237-242): flip rows [1,2] of M(q), apply R,
    # flip rows [1,2] again
    M = np.asarray(T.quat_to_matrix(q)).copy()
    M[:, [1, 2], :] *= -1
    M = np.asarray(R) @ M
    M[:, [1, 2], :] *= -1
    np.testing.assert_allclose(got, M, atol=1e-4)


def test_homogeneous_transform_divide():
    mat = jnp.asarray(
        [[[2.0, 0, 0, 0], [0, 2.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 1.0, 0]]]
    )
    pts = jnp.asarray([[[1.0, 2.0, 4.0]]])
    ndc, w = T.transform_points_homogeneous(mat, pts)
    np.testing.assert_allclose(w, jnp.asarray([[4.0]]))
    np.testing.assert_allclose(ndc[..., 0], jnp.asarray([[0.5]]))
    np.testing.assert_allclose(ndc[..., 1], jnp.asarray([[1.0]]))
