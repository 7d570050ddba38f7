import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.data.camera import make_camera_batch
from dreamwaltz_g_tpu.ops import rasterize as R
from dreamwaltz_g_tpu.utils.transforms import quat_normalize


def random_scene(rng, n=64, spread=0.5):
    means3d = jnp.asarray(rng.normal(size=(n, 3)) * spread, jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.3) * 0.05, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, size=(n, 3)), jnp.float32)
    return means3d, quats, scales, opac, colors


def project_scene(rng, H, W, n=64):
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    means3d, quats, scales, opac, colors = random_scene(rng, n)
    cov3d = R.covariance3d(quats, scales)
    g = R.project_gaussians(
        means3d, cov3d, opac, colors, cam.extrinsic[0], cam.intrinsics[0], H, W,
        tanfov=cam.tanfov[0],
    )
    return g, cam


def test_covariance3d_properties(rng):
    _, quats, scales, _, _ = random_scene(rng, 16)
    cov = R.covariance3d(quats, scales)
    np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-6)
    # eigenvalues = scales^2 (any order)
    ev = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
    expect = np.sort(np.asarray(scales) ** 2, axis=-1)
    np.testing.assert_allclose(ev, expect, rtol=1e-3, atol=1e-7)


def test_projection_center_gaussian(rng):
    H = W = 64
    cam = make_camera_batch(2.0, 0.0, 90.0, 50.0, H, W)
    g = R.project_gaussians(
        jnp.zeros((1, 3)),
        jnp.broadcast_to(0.01 * jnp.eye(3), (1, 3, 3)),
        jnp.ones(1), jnp.ones((1, 3)),
        cam.extrinsic[0], cam.intrinsics[0], H, W, tanfov=cam.tanfov[0],
    )
    # the origin projects to the principal point and is visible
    np.testing.assert_allclose(g.means2d[0], [W // 2, H // 2], atol=1e-3)
    assert bool(g.mask[0])
    np.testing.assert_allclose(float(g.depth[0]), 2.0, atol=1e-5)
    # isotropic cov stays isotropic on screen: conic b ~ 0, a ~ c
    assert abs(float(g.conic[0, 1])) < 1e-4
    np.testing.assert_allclose(float(g.conic[0, 0]), float(g.conic[0, 2]), rtol=1e-3)


def test_behind_camera_culled(rng):
    H = W = 32
    cam = make_camera_batch(2.0, 0.0, 90.0, 50.0, H, W)
    behind = cam.campos[0] + cam.c2w[0, :3, 2] * -1.0  # 1m behind the camera
    g = R.project_gaussians(
        behind[None], jnp.broadcast_to(0.01 * jnp.eye(3), (1, 3, 3)),
        jnp.ones(1), jnp.ones((1, 3)),
        cam.extrinsic[0], cam.intrinsics[0], H, W,
    )
    assert not bool(g.mask[0])
    assert float(g.radius[0]) == 0.0


def test_bin_gaussians_depth_order_and_membership(rng):
    H = W = 64
    g, _ = project_scene(rng, H, W, n=48)
    lists, counts, _ = R.bin_gaussians(
        g.means2d, g.radius, g.depth, g.mask, H, W,
        tile_size=16, capacity=64, max_tiles_per_gaussian=32,
    )
    lists = np.asarray(lists)
    counts = np.asarray(counts)
    depth = np.asarray(g.depth)
    N = depth.shape[0]
    Tx = 4
    for t in range(lists.shape[0]):
        entries = lists[t][: counts[t]]
        assert (entries < N).all()
        # depth sorted
        d = depth[entries]
        assert (np.diff(d) >= -1e-6).all()
        # all sentinel beyond count
        assert (lists[t][counts[t]:] == N).all()
        # membership: every listed gaussian's bbox overlaps this tile
        tx, ty = t % Tx, t // Tx
        for i in entries:
            x, y = np.asarray(g.means2d)[i]
            r = np.asarray(g.radius)[i]
            assert x + r >= tx * 16 and x - r <= (tx + 1) * 16
            assert y + r >= ty * 16 and y - r <= (ty + 1) * 16


def test_tiled_matches_reference(rng):
    H, W = 48, 64
    g, _ = project_scene(rng, H, W, n=80)
    out = R.rasterize_projected(g, H, W, tile_size=16, capacity=128, chunk=32,
                                max_tiles_per_gaussian=32)
    ref = R.rasterize_reference(g, H, W)
    np.testing.assert_allclose(out.image, ref[..., :3], atol=2e-5)
    np.testing.assert_allclose(out.depth, ref[..., 3], atol=2e-4)
    np.testing.assert_allclose(out.alpha, ref[..., 4], atol=2e-5)


def test_tiled_matches_reference_nonmultiple_size(rng):
    # H, W not multiples of the tile: the untiling crop path
    H, W = 40, 56
    g, _ = project_scene(rng, H, W, n=40)
    out = R.rasterize_projected(g, H, W, tile_size=16, capacity=128, chunk=16,
                                max_tiles_per_gaussian=32)
    ref = R.rasterize_reference(g, H, W)
    np.testing.assert_allclose(out.image, ref[..., :3], atol=2e-5)


def test_sorted_eval_path_matches_reference(rng):
    """The windowed sorted Pallas blend (pallas_mode='eval' on TPU) against
    the per-pixel oracle, in interpret mode."""
    H, W = 64, 64
    g, _ = project_scene(rng, H, W, n=90)
    out = R.rasterize_projected(
        g, H, W, tile_size=16, capacity=512, chunk=64,
        max_tiles_per_gaussian=16, use_pallas=True, pallas_interpret=True,
        pallas_mode="eval")
    ref = R.rasterize_reference(g, H, W)
    # quantized-depth ordering + bf16 prefix matmul: small tolerance
    np.testing.assert_allclose(out.image, ref[..., :3], atol=5e-3)
    np.testing.assert_allclose(out.alpha, ref[..., 4], atol=5e-3)


def test_bin_gaussians_sorted_segments(rng):
    """Sorted-segment binning agrees with the (T, K) table binning."""
    H = W = 64
    g, _ = project_scene(rng, H, W, n=48)
    lists, counts, _ = R.bin_gaussians(
        g.means2d, g.radius, g.depth, g.mask, H, W,
        tile_size=16, capacity=64, max_tiles_per_gaussian=32)
    s_idx, seg_start, counts2, _ = R.bin_gaussians_sorted(
        g.means2d, g.radius, g.depth, g.mask, H, W,
        tile_size=16, capacity=64, max_tiles_per_gaussian=32)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts2))
    s_idx = np.asarray(s_idx)
    seg_start = np.asarray(seg_start)
    for t in range(seg_start.shape[0]):
        seg = s_idx[seg_start[t]: seg_start[t] + counts2[t]]
        np.testing.assert_array_equal(seg, np.asarray(lists)[t][: counts[t]])


def test_occlusion_order():
    """A nearer opaque gaussian must hide a farther one."""
    H = W = 32
    means2d = jnp.asarray([[16.0, 16.0], [16.0, 16.0]])
    conic = jnp.asarray([[0.5, 0.0, 0.5]] * 2)
    depth = jnp.asarray([1.0, 2.0])
    radius = jnp.asarray([10.0, 10.0])
    opacity = jnp.asarray([0.99, 0.99])
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    mask = jnp.asarray([True, True])
    g = R.Gaussians2D(means2d, conic, depth, radius, opacity, colors, mask)
    out = R.rasterize_projected(g, H, W, tile_size=16, capacity=16, chunk=8)
    center = np.asarray(out.image[16, 16])
    # alpha at the pixel is 0.99*exp(-0.5*0.25) ~ 0.87; front color dominates
    assert center[0] > 0.8 and center[0] > 5 * center[1]  # red in front
    # flip depths -> green in front
    g2 = g._replace(depth=jnp.asarray([2.0, 1.0]))
    out2 = R.rasterize_projected(g2, H, W, tile_size=16, capacity=16, chunk=8)
    center2 = np.asarray(out2.image[16, 16])
    assert center2[1] > 0.8 and center2[1] > 5 * center2[0]


def test_capacity_overflow_keeps_nearest(rng):
    """When a tile overflows capacity K, the nearest K gaussians are kept —
    the ones that dominate the blend."""
    H = W = 16
    n = 32
    means2d = jnp.tile(jnp.asarray([[8.0, 8.0]]), (n, 1))
    conic = jnp.tile(jnp.asarray([[0.05, 0.0, 0.05]]), (n, 1))  # wide splats
    depth = jnp.arange(1.0, n + 1)
    radius = jnp.full((n,), 12.0)
    opacity = jnp.full((n,), 0.95)
    colors = jnp.ones((n, 3))
    mask = jnp.ones((n,), bool)
    g = R.Gaussians2D(means2d, conic, depth, radius, opacity, colors, mask)
    full = R.rasterize_projected(g, H, W, tile_size=16, capacity=32, chunk=8)
    trunc = R.rasterize_projected(g, H, W, tile_size=16, capacity=8, chunk=8)
    # near the center alpha ~0.76+, so 8 layers saturate transmittance to
    # ~1e-5 — the kept nearest-8 reproduce the full blend there
    c = slice(5, 12)
    np.testing.assert_allclose(trunc.image[c, c], full.image[c, c], atol=5e-3)
    # no-silent-caps telemetry: the truncated run reports the dropped
    # fraction (one tile, 32 entries, capacity 8 -> 24/32 dropped)
    assert float(full.overflow) == 0.0
    np.testing.assert_allclose(float(trunc.overflow), 24.0 / 32.0, atol=1e-6)


def test_gradients_match_reference(rng):
    H, W = 32, 32
    g, _ = project_scene(rng, H, W, n=24)
    target = jnp.asarray(rng.uniform(0, 1, size=(H, W, 3)), jnp.float32)

    def loss_tiled(means2d, colors, opacity):
        gg = g._replace(means2d=means2d, colors=colors, opacity=opacity)
        out = R.rasterize_projected(gg, H, W, tile_size=16, capacity=64,
                                    chunk=16, max_tiles_per_gaussian=32)
        return jnp.mean((out.image - target) ** 2)

    def loss_ref(means2d, colors, opacity):
        gg = g._replace(means2d=means2d, colors=colors, opacity=opacity)
        ref = R.rasterize_reference(gg, H, W)
        return jnp.mean((ref[..., :3] - target) ** 2)

    gt = jax.grad(loss_tiled, argnums=(0, 1, 2))(g.means2d, g.colors, g.opacity)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(g.means2d, g.colors, g.opacity)
    for a, b in zip(gt, gr):
        np.testing.assert_allclose(a, b, atol=5e-5)
    # screen-space position grads are nonzero (densifier depends on them)
    assert float(jnp.abs(gt[0]).max()) > 0


def test_end_to_end_3d_gradients(rng):
    """Full path: 3D params -> projection -> rasterize -> scalar, all grads
    finite and nonzero."""
    H = W = 32
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    means3d, quats, scales, opac, colors = random_scene(rng, 24)

    @jax.jit
    def loss(means3d, quats, scales, opac, colors):
        out = R.rasterize(means3d, quats, scales, opac, colors,
                          cam.extrinsic[0], cam.intrinsics[0], H, W,
                          tile_size=16, capacity=64, chunk=16)
        return jnp.mean(out.image) + 0.1 * jnp.mean(out.alpha)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means3d, quats, scales, opac, colors)
    for gr, name in zip(grads, ["means", "quats", "scales", "opac", "colors"]):
        arr = np.asarray(gr)
        assert np.isfinite(arr).all(), name
    assert float(jnp.abs(grads[0]).max()) > 0


def test_alpha_is_one_minus_transmittance(rng):
    H = W = 32
    g, _ = project_scene(rng, H, W, n=30)
    out = R.rasterize_projected(g, H, W, tile_size=16, capacity=64, chunk=16,
                                max_tiles_per_gaussian=32)
    assert float(out.alpha.min()) >= 0
    assert float(out.alpha.max()) <= 1.0 + 1e-5
