import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.configs import NeRFConfig
from dreamwaltz_g_tpu.nerf import encoder as E
from dreamwaltz_g_tpu.nerf import renderer as RD
from dreamwaltz_g_tpu.nerf.network import build_nerf, trunc_exp


@pytest.fixture(scope="module")
def small_cfg():
    return NeRFConfig(backbone="tiledgrid", num_levels=4, level_dim=2, base_resolution=4,
                      desired_resolution=32, log2_hashmap_size=8,
                      grid_size=32, num_steps=32, bound=1.0)


def test_encoder_shapes_and_determinism():
    cfg = E.GridEncoderConfig(num_levels=4, base_resolution=4,
                              desired_resolution=64, log2_hashmap_size=10)
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray([[0.1, -0.5, 0.3], [0.0, 0.0, 0.0]])
    out = E.grid_encode(params, cfg, x, bound=1.0)
    assert out.shape == (2, cfg.output_dim)
    out2 = E.grid_encode(params, cfg, x, bound=1.0)
    np.testing.assert_array_equal(out, out2)


def test_encoder_out_of_bounds_zero():
    cfg = E.GridEncoderConfig(num_levels=2, base_resolution=4,
                              desired_resolution=8, log2_hashmap_size=8)
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(0))
    out = E.grid_encode(params, cfg, jnp.asarray([[2.0, 0.0, 0.0]]), bound=1.0)
    np.testing.assert_array_equal(out, jnp.zeros_like(out))


def test_encoder_interpolation_continuity():
    """Features are continuous: nearby points give nearby features, and
    moving across a cell changes features smoothly (trilinear)."""
    cfg = E.GridEncoderConfig(num_levels=1, base_resolution=4,
                              desired_resolution=4, log2_hashmap_size=12)
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(1), scale=1.0)
    t = jnp.linspace(-0.9, 0.9, 200)
    pts = jnp.stack([t, jnp.zeros_like(t), jnp.zeros_like(t)], -1)
    f = E.grid_encode(params, cfg, pts, bound=1.0)
    diffs = jnp.abs(jnp.diff(f, axis=0)).max()
    assert float(diffs) < 0.2  # no jumps on a 0.009 step


def test_encoder_matches_manual_trilinear():
    """One-level dense grid: compare against a direct trilinear interp."""
    cfg = E.GridEncoderConfig(num_levels=1, level_dim=1, base_resolution=4,
                              desired_resolution=4, log2_hashmap_size=12,
                              gridtype="tiled")
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(2), scale=1.0)
    res = cfg.level_resolution(0)       # 4
    scale = cfg.level_scale(0)          # 3.0
    table = np.asarray(params.tables[0, :, 0])

    rng = np.random.default_rng(0)
    x01 = rng.uniform(0.05, 0.95, size=(20, 3))
    pos = x01 * scale + 0.5
    lo = np.floor(pos).astype(int)
    fr = pos - lo
    expect = np.zeros(20)
    for ci in range(8):
        off = np.array([(ci >> d) & 1 for d in range(3)])
        w = np.prod(np.where(off == 1, fr, 1 - fr), axis=-1)
        c = lo + off
        idx = (c[:, 0] + c[:, 1] * (res + 1) + c[:, 2] * (res + 1) ** 2) \
            % cfg.level_table_size(0)
        expect += w * table[idx]
    got = E.grid_encode(params, cfg, jnp.asarray(x01 * 2 - 1, jnp.float32), bound=1.0)
    np.testing.assert_allclose(got[:, 0], expect, atol=1e-5)


def test_encoder_gradients_flow_to_tables():
    cfg = E.GridEncoderConfig(num_levels=2, base_resolution=4,
                              desired_resolution=8, log2_hashmap_size=8)
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray([[0.2, 0.1, -0.3]])

    g = jax.grad(lambda p: jnp.sum(E.grid_encode(p, cfg, x) ** 2))(params)
    assert float(jnp.abs(g.tables).sum()) > 0


def test_flat_roundtrip():
    cfg = E.GridEncoderConfig(num_levels=3, base_resolution=4,
                              desired_resolution=16, log2_hashmap_size=8)
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(0))
    flat = E.tables_to_flat(cfg, params)
    assert flat.shape[0] * cfg.level_dim == cfg.total_params
    back = E.tables_from_flat(cfg, flat)
    x = jnp.asarray([[0.3, -0.2, 0.6]])
    np.testing.assert_allclose(E.grid_encode(params, cfg, x),
                               E.grid_encode(back, cfg, x), atol=1e-7)


def test_trunc_exp_clamps_grad():
    g = jax.grad(trunc_exp)(jnp.float32(100.0))
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)


def test_ray_aabb():
    o = jnp.asarray([[0.0, 0.0, -3.0], [5.0, 5.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far, hit = RD.ray_aabb(o, d, bound=1.0)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(near[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(far[0]), 4.0, atol=1e-5)


def test_render_sphere_depth_and_silhouette(small_cfg):
    """Density = solid sphere of radius 0.5: renders should show the correct
    silhouette and depth ~ distance to the sphere surface."""
    model = build_nerf(small_cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))

    # monkeypatch density: solid sphere
    class SphereModel:
        bound = small_cfg.bound

        @staticmethod
        def density(_params, pts):
            r = jnp.linalg.norm(pts, axis=-1)
            sigma = jnp.where(r < 0.5, 50.0, 0.0)
            albedo = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.25]),
                                      pts.shape[:-1] + (3,))
            return sigma, albedo

    o = jnp.asarray([[0.0, 0.0, -0.99], [0.0, 0.99, 0.0], [0.9, 0.9, -0.9]])
    dctr = jnp.asarray([[0.0, 0.0, 1.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]])
    out = RD.render_rays(SphereModel, None, None, o, dctr, num_steps=256)
    # rays 0,1 hit the sphere: weights_sum ~1, depth ~ 0.49
    assert float(out.weights_sum[0]) > 0.99
    assert float(out.weights_sum[1]) > 0.99
    np.testing.assert_allclose(float(out.depth[0]), 0.49, atol=0.02)
    np.testing.assert_allclose(out.image[0], [1.0, 0.5, 0.25], atol=0.01)
    # ray 2 misses
    assert float(out.weights_sum[2]) < 1e-3


def test_occupancy_update_and_skip(small_cfg):
    model = build_nerf(small_cfg, with_background=False)

    class SphereModel:
        bound = small_cfg.bound

        @staticmethod
        def density(_params, pts):
            r = jnp.linalg.norm(pts, axis=-1)
            return jnp.where(r < 0.4, 100.0, 0.0), jnp.ones(pts.shape[:-1] + (3,))

    grid = RD.init_occupancy(small_cfg.grid_size)
    grid = RD.update_occupancy(grid, SphereModel, None, jax.random.PRNGKey(0),
                               density_thresh=10.0)
    occ_frac = float(grid.occupied.mean())
    sphere_frac = 4 / 3 * np.pi * 0.4 ** 3 / 8.0
    assert abs(occ_frac - sphere_frac) < 0.05

    # with the grid, rendering still matches no-grid within tolerance
    o = jnp.asarray([[0.0, 0.0, -0.99]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    with_g = RD.render_rays(SphereModel, None, grid, o, d, num_steps=128)
    without = RD.render_rays(SphereModel, None, None, o, d, num_steps=512)
    np.testing.assert_allclose(float(with_g.depth[0]), float(without.depth[0]),
                               atol=0.03)
    assert float(with_g.weights_sum[0]) > 0.99


def test_full_nerf_render_grads(small_cfg):
    model = build_nerf(small_cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -0.9]]), (16, 1))
    d = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    @jax.jit
    def loss(p):
        out = RD.render_rays(model, p, None, o, d, num_steps=16)
        return jnp.mean(out.image) + jnp.mean(out.weights_sum)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    total = sum(float(jnp.abs(x).sum()) for x in flat)
    assert total > 0


def test_background_mlp(small_cfg):
    model = build_nerf(small_cfg, with_background=True)
    params = model.init(jax.random.PRNGKey(0))
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    bg = model.background(params, dirs)
    assert bg.shape == (2, 3)
    assert float(bg.min()) >= 0 and float(bg.max()) <= 1


def test_structure_variants(small_cfg):
    """dual_mlp / dual_enc build, render, and gradients reach the right
    params (reference: build_NeRFNetwork, nerf_model.py:565-574)."""
    import dataclasses

    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.5,
                             maxval=0.5)
    sigs = {}
    for structure in ("shared_mlp", "dual_mlp", "dual_enc"):
        cfg = dataclasses.replace(small_cfg, structure=structure)
        model = build_nerf(cfg)
        params = model.init(jax.random.PRNGKey(0))
        sigma, albedo = model.density(params, pts)
        assert sigma.shape == (32,) and albedo.shape == (32, 3), structure
        assert np.isfinite(np.asarray(sigma)).all()
        sigs[structure] = np.asarray(sigma)
        if structure == "shared_mlp":
            assert params.albedo_mlp is None and params.encoder_sigma is None
            continue
        g = jax.grad(lambda p: jnp.sum(
            model.density(p, pts)[0] + model.density(p, pts)[1].sum()))(params)
        assert float(jnp.abs(
            jax.tree_util.tree_leaves(g.albedo_mlp)[0]).sum()) > 0
        if structure == "dual_enc":
            assert params.encoder_sigma is not None
            assert float(jnp.abs(g.encoder_sigma.tables).sum()) > 0
    # the variants are genuinely different functions
    assert np.abs(sigs["shared_mlp"] - sigs["dual_mlp"]).max() > 1e-7


def test_scaling_density_activation(small_cfg):
    import dataclasses

    cfg = dataclasses.replace(small_cfg, density_activation="scaling")
    model = build_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert params.sigma_scale is not None
    pts = jnp.zeros((4, 3))
    sigma, _ = model.density(params, pts)
    assert np.isfinite(np.asarray(sigma)).all()
    # sigma_scale is learnable: gradient flows
    g = jax.grad(lambda p: jnp.sum(model.density(p, pts)[0]))(params)
    assert np.isfinite(float(g.sigma_scale))


@pytest.mark.slow
def test_pdf_upsampling(small_cfg):
    """upsample_steps adds importance samples: output stays finite,
    differentiable, and concentrates samples where density is."""
    model = build_nerf(small_cfg)
    params = model.init(jax.random.PRNGKey(0))
    R = 16
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (R, 1))
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3)) * 0.05 \
        + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = RD.render_rays(model, params, None, rays_o, rays_d,
                         key=jax.random.PRNGKey(2), num_steps=16,
                         upsample_steps=8)
    assert out.image.shape == (R, 3)
    assert np.isfinite(np.asarray(out.image)).all()
    g = jax.grad(lambda p: jnp.sum(RD.render_rays(
        model, p, None, rays_o, rays_d, key=jax.random.PRNGKey(2),
        num_steps=16, upsample_steps=8).image))(params)
    assert float(jnp.abs(g.encoder.tables).sum()) > 0


def test_sample_pdf_concentrates():
    """Inverse-CDF sampling puts samples where the weights are."""
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (2, 11))
    w = jnp.zeros((2, 10)).at[:, 7].set(1.0)  # all mass in bin [0.7, 0.8]
    s = RD.sample_pdf(bins, w, 32)
    s = np.asarray(s)
    assert (s > 0.65).all() and (s < 0.85).all()


@pytest.mark.slow  # 14 s internal-consistency check of a stable code path
def test_ray_chunked_render_matches(small_cfg):
    """jax.checkpoint'ed ray-chunked rendering is exact vs the monolithic
    march (the HBM remat path used by the NeRF SDS trainer)."""
    from dreamwaltz_g_tpu.training.nerf_trainer import _render_image

    model = build_nerf(small_cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))
    H = W = 24
    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    cam = make_camera_batch(2.0, 0.0, 90.0, 60.0, H, W)
    key = jax.random.PRNGKey(1)
    bg = jnp.asarray([0.3, 0.3, 0.3])
    a = _render_image(model, params, None, cam.c2w[0], cam.intrinsics[0],
                      H, W, key, 16, bg)
    b = _render_image(model, params, None, cam.c2w[0], cam.intrinsics[0],
                      H, W, key, 16, bg, ray_chunk=128)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=2e-3)
    # gradients flow through the chunked path
    g = jax.grad(lambda p: jnp.sum(_render_image(
        model, p, None, cam.c2w[0], cam.intrinsics[0], H, W, key, 16, bg,
        ray_chunk=128)[0]))(params)
    assert float(jnp.abs(g.encoder.tables).sum()) > 0


@pytest.mark.slow
def test_compaction_exact_when_under_budget(small_cfg):
    """compact_steps: when every ray has <= K occupied candidates the
    compacted march must equal the dense masked march exactly (the CUDA
    compaction analog, renderer.py render_rays)."""
    model = build_nerf(small_cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))
    G = small_cfg.grid_size
    # occupancy: two thin z-slabs far apart -> the tightened interval spans
    # both, so only a small fraction of the fine samples land occupied
    # (n_occ per ray stays well under the K budget -> exactness regime)
    occ = np.zeros((G, G, G), bool)
    occ[:, :, 4:6] = True            # axis 2 = z: slabs the z-rays cross
    occ[:, :, G - 6: G - 4] = True
    grid = RD.OccupancyGrid(density=jnp.zeros((G, G, G)),
                            occupied=jnp.asarray(occ),
                            mean_density=jnp.zeros(()))
    R = 32
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (R, 1)), jnp.float32)
    d = rng.normal(size=(R, 3)) * 0.08 + np.asarray([0.0, 0.0, 1.0])
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                         jnp.float32)
    dense = RD.render_rays(model, params, grid, rays_o, rays_d,
                           num_steps=32, perturb=False)
    # slab spans ~4/32 of the tightened interval -> well under K=16
    comp = RD.render_rays(model, params, grid, rays_o, rays_d,
                          num_steps=32, perturb=False, compact_steps=16)
    np.testing.assert_allclose(np.asarray(comp.image),
                               np.asarray(dense.image), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp.weights_sum),
                               np.asarray(dense.weights_sum), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp.depth),
                               np.asarray(dense.depth), atol=1e-4)
    # gradients flow through the compacted gathers
    g = jax.grad(lambda p: jnp.sum(RD.render_rays(
        model, p, grid, rays_o, rays_d, num_steps=32,
        compact_steps=16).image))(params)
    assert float(jnp.abs(g.encoder.tables).sum()) > 0


def test_compact_samples_monotonic_across_gap():
    """A ray crossing two occupied slabs with an unoccupied gap: the
    compacted panel must come out depth-sorted (renderer.compact_samples)
    — pre-fix, occupied-first selection left ts non-monotonic, which
    corrupted the upsample_steps importance bins and produced negative
    per-sample deltas."""
    S, K = 16, 8
    ts = jnp.linspace(0.1, 1.0, S)[None, :]
    live = np.zeros((1, S), bool)
    live[0, 0:3] = True          # near slab
    live[0, 12:15] = True        # far slab, gap between -> non-prefix set
    ts_sel, live_sel, stride = RD.compact_samples(ts, jnp.asarray(live), K)
    t = np.asarray(ts_sel[0])
    assert (np.diff(t) >= 0).all(), t
    # every occupied sample survives (n_occ=6 <= K) at its original depth
    occ_ts = np.asarray(ts[0])[live[0]]
    kept = np.asarray(ts_sel[0])[np.asarray(live_sel[0])]
    np.testing.assert_allclose(np.sort(kept), np.sort(occ_ts))
    assert float(stride[0, 0]) == 1.0


@pytest.mark.slow  # 42 s; the oversubscribed-compaction case stays fast
def test_compaction_with_upsample_stays_sane(small_cfg):
    """compact_steps combined with upsample_steps (the trainer allows
    both): weights stay in [0, 1] and the result tracks the dense+upsample
    render — regression for the non-monotonic-ts corruption."""
    model = build_nerf(small_cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))
    G = small_cfg.grid_size
    occ = np.zeros((G, G, G), bool)
    occ[:, :, 4:6] = True
    occ[:, :, G - 6: G - 4] = True   # two slabs -> gap between
    grid = RD.OccupancyGrid(density=jnp.zeros((G, G, G)),
                            occupied=jnp.asarray(occ),
                            mean_density=jnp.zeros(()))
    R = 32
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (R, 1)), jnp.float32)
    d = rng.normal(size=(R, 3)) * 0.08 + np.asarray([0.0, 0.0, 1.0])
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                         jnp.float32)
    comp = RD.render_rays(model, params, grid, rays_o, rays_d,
                          num_steps=32, perturb=False, compact_steps=16,
                          upsample_steps=8)
    ws = np.asarray(comp.weights_sum)
    assert np.isfinite(np.asarray(comp.image)).all()
    assert (ws >= -1e-6).all() and (ws <= 1 + 1e-5).all()
    dense = RD.render_rays(model, params, grid, rays_o, rays_d,
                           num_steps=32, perturb=False, upsample_steps=8)
    np.testing.assert_allclose(ws, np.asarray(dense.weights_sum), atol=0.05)
    np.testing.assert_allclose(np.asarray(comp.image),
                               np.asarray(dense.image), atol=0.05)


def test_compaction_oversubscribed_still_composites(small_cfg):
    """Rays with more occupied candidates than the budget keep an evenly
    strided subset with rescaled dt: weights_sum stays in [0, 1] and close
    to the dense result for a solid object."""
    class SphereModel:
        bound = small_cfg.bound

        @staticmethod
        def density(_params, pts):
            r = jnp.linalg.norm(pts, axis=-1)
            sigma = jnp.where(r < 0.6, 30.0, 0.0)
            albedo = jnp.broadcast_to(jnp.asarray([0.9, 0.4, 0.2]),
                                      pts.shape[:-1] + (3,))
            return sigma, albedo

    G = small_cfg.grid_size
    occ = np.ones((G, G, G), bool)  # fully occupied -> every sample kept
    grid = RD.OccupancyGrid(density=jnp.zeros((G, G, G)),
                            occupied=jnp.asarray(occ),
                            mean_density=jnp.zeros(()))
    R = 16
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (R, 1)), jnp.float32)
    rng = np.random.default_rng(1)
    d = rng.normal(size=(R, 3)) * 0.05 + np.asarray([0.0, 0.0, 1.0])
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                         jnp.float32)
    dense = RD.render_rays(SphereModel, None, grid, rays_o, rays_d,
                           num_steps=64, perturb=False)
    comp = RD.render_rays(SphereModel, None, grid, rays_o, rays_d,
                          num_steps=64, perturb=False, compact_steps=16)
    ws = np.asarray(comp.weights_sum)
    assert (ws >= 0).all() and (ws <= 1 + 1e-5).all()
    # solid object: both saturate the same silhouette
    np.testing.assert_allclose(ws, np.asarray(dense.weights_sum), atol=0.05)
    np.testing.assert_allclose(np.asarray(comp.image),
                               np.asarray(dense.image), atol=0.05)


def test_triplane_encoder_basics():
    cfg = E.TriplaneConfig(resolution=16, feature_dim=8)
    params = E.init_triplane(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray([[0.1, -0.5, 0.3], [0.0, 0.0, 0.0]])
    out = E.triplane_encode(params, cfg, x, bound=1.0)
    assert out.shape == (2, cfg.output_dim)
    # out-of-bounds -> zero features (grid_encode contract)
    oob = E.triplane_encode(params, cfg, jnp.asarray([[2.0, 0.0, 0.0]]),
                            bound=1.0)
    np.testing.assert_array_equal(np.asarray(oob), 0.0)
    # gradients flow to the planes
    g = jax.grad(lambda p: jnp.sum(
        E.triplane_encode(p, cfg, x) ** 2))(params)
    assert float(jnp.abs(g.planes).sum()) > 0


def test_triplane_matches_manual_bilinear():
    cfg = E.TriplaneConfig(resolution=8, feature_dim=4)
    params = E.init_triplane(cfg, jax.random.PRNGKey(3))
    planes = np.asarray(params.planes)
    rng = np.random.default_rng(0)
    x01 = rng.uniform(0.05, 0.95, size=(10, 3))
    R = cfg.resolution
    pairs = ((0, 1), (0, 2), (1, 2))
    expect = np.zeros((10, cfg.feature_dim))
    for p, (a, b) in enumerate(pairs):
        uv = x01[:, (a, b)] * (R - 1)
        i0 = np.floor(uv).astype(int)
        fr = uv - i0
        i1 = np.minimum(i0 + 1, R - 1)
        f00 = planes[p][i0[:, 0], i0[:, 1]]
        f01 = planes[p][i0[:, 0], i1[:, 1]]
        f10 = planes[p][i1[:, 0], i0[:, 1]]
        f11 = planes[p][i1[:, 0], i1[:, 1]]
        wu, wv = fr[:, :1], fr[:, 1:2]
        expect += ((1 - wu) * ((1 - wv) * f00 + wv * f01)
                   + wu * ((1 - wv) * f10 + wv * f11))
    got = E.triplane_encode(params, cfg,
                            jnp.asarray(x01 * 2 - 1, jnp.float32), bound=1.0)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)


def test_build_nerf_triplane_trains():
    """--nerf.backbone triplane: the full model builds, renders, and a
    training step moves the planes (TPU-first backbone, no reference
    counterpart)."""
    import dataclasses

    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    cfg = NeRFConfig(backbone="triplane", triplane_resolution=16,
                     triplane_dim=8, grid_size=16, num_steps=16, bound=1.0)
    model = build_nerf(cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))
    assert isinstance(params.encoder, E.TriplaneParams)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.5,
                             maxval=0.5)
    sigma, albedo = model.density(params, pts)
    assert np.isfinite(np.asarray(sigma)).all()

    tx = build_nerf_optimizer(cfg, max_steps=10)
    opt_state = tx.init(params)
    g = jax.grad(lambda p: jnp.sum(model.density(p, pts)[0]))(params)
    updates, _ = tx.update(g, opt_state, params)
    import optax
    p2 = optax.apply_updates(params, updates)
    assert float(jnp.abs(p2.encoder.planes - params.encoder.planes).max()) > 0


def test_triplane_weight_decay_shrinks_unobserved_planes():
    """``nerf.triplane_weight_decay`` decays plane features that receive no
    gradient (the floater fix measured in PERF.md "Backbone quality" — plane
    outer products hallucinate density in never-observed regions), while
    grid backbones keep exact reference-parity optimization (no decay)."""
    import optax

    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    cfg = NeRFConfig(backbone="triplane", triplane_resolution=16,
                     triplane_dim=8, grid_size=16, bound=1.0)
    assert cfg.triplane_weight_decay > 0  # shipped default is on
    model = build_nerf(cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))
    tx = build_nerf_optimizer(cfg, max_steps=10)
    opt_state = tx.init(params)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    p = params
    for _ in range(3):
        updates, opt_state = tx.update(zero_g, opt_state, p)
        p = optax.apply_updates(p, updates)
    before = float(jnp.abs(params.encoder.planes).mean())
    after = float(jnp.abs(p.encoder.planes).mean())
    assert after < before  # zero-gradient features decay toward zero
    # the MLP group is NOT decayed (decay is plane-tables only)
    w0 = jax.tree_util.tree_leaves(params.sigma_mlp)[0]
    w1 = jax.tree_util.tree_leaves(p.sigma_mlp)[0]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))

    # grid backbone: encoder group stays plain adam — zero grad, zero move
    gcfg = NeRFConfig(backbone="tiledgrid", num_levels=2, desired_resolution=32,
                      log2_hashmap_size=8, grid_size=16, bound=1.0)
    gmodel = build_nerf(gcfg, with_background=False)
    gparams = gmodel.init(jax.random.PRNGKey(0))
    gtx = build_nerf_optimizer(gcfg, max_steps=10)
    gopt = gtx.init(gparams)
    gz = jax.tree_util.tree_map(jnp.zeros_like, gparams)
    gup, _ = gtx.update(gz, gopt, gparams)
    gp2 = optax.apply_updates(gparams, gup)
    np.testing.assert_array_equal(np.asarray(gparams.encoder.tables),
                                  np.asarray(gp2.encoder.tables))


@pytest.mark.slow  # 15 s (two pretrain-step compiles); DP behavior covered fast in test_parallel
def test_triplane_volume_sparsity_suppresses_ghost_density():
    """``nerf.triplane_volume_sparsity`` (losses.volume_sparsity_loss)
    penalizes density at uniform random AABB points — the ghost-intersection
    stabilizer the table weight decay cannot provide (ghost features ARE
    observed through other points). Grid backbones keep exact parity: the
    pretrain step must be bit-identical with the knob on or off."""
    from dreamwaltz_g_tpu.nerf.renderer import init_occupancy
    from dreamwaltz_g_tpu.training import nerf_trainer
    from dreamwaltz_g_tpu.training.losses import volume_sparsity_loss
    from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

    cfg = NeRFConfig(backbone="triplane", triplane_resolution=16,
                     triplane_dim=8, grid_size=16, bound=1.0)
    assert cfg.triplane_volume_sparsity > 0  # shipped default is on
    model = build_nerf(cfg, with_background=False)
    params = model.init(jax.random.PRNGKey(0))

    # shadow mode: sampled points share two coordinates with a surface
    # point (the triplane ghost locus) — verify via a probe surface set
    surf = jnp.asarray([[0.5, 0.5, 0.5]]).repeat(8, 0)
    lv = volume_sparsity_loss(model, params, jax.random.PRNGKey(5),
                              n_points=64, surface_points=surf,
                              surface_valid=jnp.ones(8, bool))
    assert jnp.isfinite(lv)

    # the loss's gradient pushes mean density DOWN
    g = jax.grad(lambda p: volume_sparsity_loss(
        model, p, jax.random.PRNGKey(3), n_points=256))(params)
    p2 = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, params, g)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (128, 3),
                             minval=-1.0, maxval=1.0)
    s_before, _ = model.density(params, pts)
    s_after, _ = model.density(p2, pts)
    assert float(jnp.mean(s_after)) < float(jnp.mean(s_before))

    # grid backbone: step output identical whether the knob is 0 or set
    # (the term is gated on backbone == 'triplane')
    def run_step(vs):
        gcfg = NeRFConfig(backbone="tiledgrid", num_levels=2, desired_resolution=32,
                          log2_hashmap_size=8, grid_size=16, bound=1.0,
                          triplane_volume_sparsity=vs)
        gmodel = build_nerf(gcfg, with_background=False)
        gparams = gmodel.init(jax.random.PRNGKey(0))
        gtx = build_nerf_optimizer(gcfg, max_steps=10)
        state = nerf_trainer.init_train_state(gmodel, gtx,
                                              jax.random.PRNGKey(1))
        grid = init_occupancy(16)
        step = nerf_trainer.make_pretrain_step(gmodel, gtx, 8, 8,
                                               num_steps=8)
        c2w = jnp.eye(4).at[2, 3].set(2.0)
        intr = jnp.asarray([[8.0, 0.0, 4.0],
                            [0.0, -8.0, 4.0],
                            [0.0, 0.0, 1.0]])
        depth = jnp.ones((8, 8)) * 1.5
        mask = jnp.ones((8, 8), bool)
        st, _ = step(state, grid, c2w, intr, depth, mask,
                     jax.random.PRNGKey(2))
        return st.params

    pa = run_step(0.0)
    pb = run_step(0.5)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grid_encoder_bf16_close_to_f32():
    cfg32 = E.GridEncoderConfig(num_levels=4, base_resolution=4,
                                desired_resolution=64, log2_hashmap_size=10)
    cfg16 = cfg32._replace(compute_dtype="bf16")
    params = E.init_grid_encoder(cfg32, jax.random.PRNGKey(0), scale=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.9,
                           maxval=0.9)
    a = np.asarray(E.grid_encode(params, cfg32, x))
    b = np.asarray(E.grid_encode(params, cfg16, x))
    assert b.dtype == np.float32 or b.dtype == np.dtype("float32") \
        or b.dtype.kind == "f"
    np.testing.assert_allclose(a, b, atol=5e-3)
    # grads still land on the f32 master tables
    g = jax.grad(lambda p: jnp.sum(E.grid_encode(p, cfg16, x) ** 2))(params)
    assert g.tables.dtype == jnp.float32
    assert float(jnp.abs(g.tables).sum()) > 0


def test_encoders_match_naive_reference():
    """Pin grid_encode / triplane_encode (fwd AND table gradient) against
    independent naive per-level/per-plane reimplementations — guards any
    future reformulation of the gather layout (encoder.py design note:
    flat-gather and sort-based backward rewrites were both tried and
    reverted on A/B measurements)."""
    cfg = E.GridEncoderConfig(num_levels=4, base_resolution=4,
                              desired_resolution=64, log2_hashmap_size=10)
    params = E.init_grid_encoder(cfg, jax.random.PRNGKey(0), scale=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1.2,
                           maxval=1.2)  # includes out-of-bounds points

    def naive(p, x):
        coords01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        inb = jnp.all((jnp.abs(x) <= 1.0), axis=-1)
        feats = []
        for level in range(cfg.num_levels):
            idx, w = E._level_indices(
                coords01, cfg.level_scale(level),
                cfg.level_resolution(level), cfg.level_table_size(level),
                cfg.gridtype)
            emb = jnp.take(p.tables[level], idx, axis=0)
            feats.append(jnp.sum(emb * w[..., None], axis=1))
        return jnp.where(inb[:, None], jnp.concatenate(feats, -1), 0.0)

    a = np.asarray(E.grid_encode(params, cfg, x))
    b = np.asarray(naive(params, x))
    np.testing.assert_allclose(a, b, atol=1e-6)

    ct = jax.random.normal(jax.random.PRNGKey(2), a.shape)
    g1 = jax.grad(lambda p: jnp.sum(E.grid_encode(p, cfg, x) * ct))(params)
    g2 = jax.grad(lambda p: jnp.sum(naive(p, x) * ct))(params)
    np.testing.assert_allclose(np.asarray(g1.tables), np.asarray(g2.tables),
                               atol=1e-5)

    # triplane: concat mode pins plane-major output ordering
    tcfg = E.TriplaneConfig(resolution=8, feature_dim=4, reduce="concat")
    tp = E.init_triplane(tcfg, jax.random.PRNGKey(3))

    def tnaive(p, x):
        coords01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        inb = jnp.all(jnp.abs(x) <= 1.0, axis=-1)
        R = tcfg.resolution
        feats = []
        for pl, (ax, bx) in enumerate(((0, 1), (0, 2), (1, 2))):
            uv = coords01[:, (ax, bx)] * (R - 1)
            i0 = jnp.floor(uv).astype(jnp.int32)
            frac = uv - jnp.floor(uv)
            i1 = jnp.minimum(i0 + 1, R - 1)
            flat = p.planes[pl].reshape(R * R, tcfg.feature_dim)
            f00 = jnp.take(flat, i0[:, 0] * R + i0[:, 1], axis=0)
            f01 = jnp.take(flat, i0[:, 0] * R + i1[:, 1], axis=0)
            f10 = jnp.take(flat, i1[:, 0] * R + i0[:, 1], axis=0)
            f11 = jnp.take(flat, i1[:, 0] * R + i1[:, 1], axis=0)
            wu, wv = frac[:, :1], frac[:, 1:2]
            feats.append((1 - wu) * ((1 - wv) * f00 + wv * f01)
                         + wu * ((1 - wv) * f10 + wv * f11))
        return jnp.where(inb[:, None], jnp.concatenate(feats, -1), 0.0)

    ta = np.asarray(E.triplane_encode(tp, tcfg, x))
    tb = np.asarray(tnaive(tp, x))
    np.testing.assert_allclose(ta, tb, atol=1e-6)
    tg1 = jax.grad(lambda p: jnp.sum(E.triplane_encode(p, tcfg, x) ** 2))(tp)
    tg2 = jax.grad(lambda p: jnp.sum(tnaive(p, x) ** 2))(tp)
    np.testing.assert_allclose(np.asarray(tg1.planes),
                               np.asarray(tg2.planes), atol=1e-5)
