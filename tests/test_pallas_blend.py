"""Pallas tile-blend kernel vs the jnp blend (interpret mode on CPU)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreamwaltz_g_tpu.data.camera import make_camera_batch
from dreamwaltz_g_tpu.ops import rasterize as R
from dreamwaltz_g_tpu.ops.pallas_blend import blend_tiles_pallas
from dreamwaltz_g_tpu.utils.transforms import quat_normalize


def _scene(n=500, H=64, W=64, seed=0):
    rng = np.random.default_rng(seed)
    means3d = jnp.asarray(rng.normal(size=(n, 3)) * 0.4, jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3))) * 0.03, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, size=(n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, size=(n, 3)), jnp.float32)
    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
    cov3d = R.covariance3d(quats, scales)
    g2d = R.project_gaussians(means3d, cov3d, opac, colors,
                              cam.extrinsic[0], cam.intrinsics[0], H, W)
    return g2d


def test_pallas_blend_matches_jnp():
    H = W = 64
    ts, cap, chunk = 16, 128, 64
    g = _scene(500, H, W)
    tile_lists, _, _ = R.bin_gaussians(g.means2d, g.radius, g.depth, g.mask,
                                    H, W, ts, cap)
    ref = R.blend_tiles(tile_lists, g, H, W, ts, chunk)

    N, CH = g.colors.shape
    values = jnp.concatenate(
        [g.colors, g.depth[:, None], jnp.ones((N, 1))], axis=-1)
    op = g.opacity * g.mask.astype(jnp.float32)
    out = blend_tiles_pallas(tile_lists, g.means2d, g.conic, op, values,
                             H, W, tile_size=ts, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_rasterize_end_to_end():
    """rasterize_projected with use_pallas matches the jnp path."""
    H = W = 48
    g = _scene(300, H, W, seed=1)
    out_ref = R.rasterize_projected(g, H, W, tile_size=16, capacity=64,
                                    chunk=64)
    out_pl = R.rasterize_projected(g, H, W, tile_size=16, capacity=64,
                                   chunk=64, use_pallas=True,
                                   pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl.image),
                               np.asarray(out_ref.image), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_pl.alpha),
                               np.asarray(out_ref.alpha), rtol=1e-4, atol=1e-5)


def test_pallas_rasterize_gradients_match():
    """custom_vjp backward (jnp recompute) == jnp autodiff gradients."""
    H = W = 32
    g = _scene(100, H, W, seed=2)

    def loss(means2d, use_pallas):
        g2 = g._replace(means2d=means2d)
        out = R.rasterize_projected(g2, H, W, tile_size=16, capacity=64,
                                    chunk=64, use_pallas=use_pallas,
                                    pallas_interpret=True)
        return jnp.sum(out.image ** 2)

    g1 = jax.grad(lambda m: loss(m, False))(g.means2d)
    g2 = jax.grad(lambda m: loss(m, True))(g.means2d)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-3, atol=1e-5)


def test_pallas_train_blend_matches_jnp_gradients():
    """The Pallas fwd+bwd training kernels reproduce jnp autodiff gradients
    for every input (means/conic/opacity/values)."""
    from dreamwaltz_g_tpu.ops.pallas_blend import blend_tiles_pallas_train

    H = W = 32
    g = _scene(120, H, W, seed=3)
    tile_lists, tile_counts, _ = R.bin_gaussians(
        g.means2d, g.radius, g.depth, g.mask, H, W, 16, 64)
    N, CH = g.colors.shape
    values = jnp.concatenate(
        [g.colors, g.depth[:, None], jnp.ones((N, 1))], axis=-1)
    op = g.opacity * g.mask.astype(jnp.float32)

    def loss_pallas(means2d, conic, opacity, vals):
        out = blend_tiles_pallas_train(
            tile_lists, tile_counts, means2d, conic, opacity, vals,
            H, W, tile_size=16, chunk=32, interpret=True)
        return jnp.sum(out ** 2) + jnp.sum(out[..., :3] * 0.3)

    def loss_jnp(means2d, conic, opacity, vals):
        gg = g._replace(means2d=means2d, conic=conic,
                        opacity=opacity / jnp.maximum(
                            g.mask.astype(jnp.float32), 1e-12) * 0 + opacity,
                        colors=vals[:, :CH], depth=vals[:, CH],
                        mask=jnp.ones(N, bool))
        # reconstruct blend on the same tile lists with pre-masked opacity
        out = R.blend_tiles(tile_lists, gg._replace(opacity=opacity),
                            H, W, 16, 32)
        return jnp.sum(out ** 2) + jnp.sum(out[..., :3] * 0.3)

    args = (g.means2d, g.conic, op, values)
    v1 = loss_pallas(*args)
    v2 = loss_jnp(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g1[:3], g2[:3], ("means2d", "conic", "opacity")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch: {name}")
    # values: jnp blend_tiles rebuilds its constant ones-lane internally, so
    # its grad for that lane is 0 by construction — compare the real lanes
    np.testing.assert_allclose(
        np.asarray(g1[3][:, :CH + 1]), np.asarray(g2[3][:, :CH + 1]),
        rtol=2e-3, atol=2e-4, err_msg="grad mismatch: values")


def test_pallas_train_blend_grad_under_vmap():
    """Regression (round-5 multi-view profiler, caught on the chip): the
    train blend's custom_vjp bwd closed over ``tile_counts`` — under vmap
    (the DP step maps views, parallel/dp.py loss_fn) the closed-over
    BatchTracer escaped into the backward trace once the vmap trace was
    closed (UnexpectedTracerError). ``tile_counts`` must thread through the
    custom_vjp residuals, so grad-of-vmapped-blend must trace and match
    the per-view gradients."""
    from dreamwaltz_g_tpu.ops.pallas_blend import blend_tiles_pallas_train

    H = W = 32
    scenes = [_scene(120, H, W, seed=s) for s in (3, 4)]
    binned = [R.bin_gaussians(g.means2d, g.radius, g.depth, g.mask,
                              H, W, 16, 64) for g in scenes]
    tile_lists = jnp.stack([b[0] for b in binned])
    tile_counts = jnp.stack([b[1] for b in binned])
    means2d = jnp.stack([g.means2d for g in scenes])
    conic = jnp.stack([g.conic for g in scenes])
    op = jnp.stack([g.opacity * g.mask.astype(jnp.float32) for g in scenes])
    values = jnp.stack([jnp.concatenate(
        [g.colors, g.depth[:, None], jnp.ones((g.colors.shape[0], 1))],
        axis=-1) for g in scenes])

    def one_view(tl, tc, m2d, con, o, vals):
        out = blend_tiles_pallas_train(
            tl, tc, m2d, con, o, vals, H, W,
            tile_size=16, chunk=32, interpret=True)
        return jnp.sum(out ** 2)

    def batched_loss(m2d, con, o, vals):
        return jnp.mean(jax.vmap(one_view)(
            tile_lists, tile_counts, m2d, con, o, vals))

    # pre-fix this raises UnexpectedTracerError at trace time
    gb = jax.grad(batched_loss, argnums=(0, 1, 2, 3))(
        means2d, conic, op, values)
    for i in range(2):
        gi = jax.grad(one_view, argnums=(2, 3, 4, 5))(
            tile_lists[i], tile_counts[i], means2d[i], conic[i],
            op[i], values[i])
        for a, b, name in zip(gb, gi,
                              ("means2d", "conic", "opacity", "values")):
            np.testing.assert_allclose(
                np.asarray(a[i]), np.asarray(b) / 2.0, rtol=1e-4, atol=1e-6,
                err_msg=f"vmapped grad mismatch view {i}: {name}")


@pytest.mark.slow
def test_pallas_train_blend_bf16_panels_gradients():
    """panel_dtype='bf16' (VERDICT r3 #10): values panel + MXU operands in
    bf16 with f32 accumulate. The forward must stay within ~4e-3 of the f32
    kernel and gradients within the documented bf16 envelope (the 2e-3-rtol
    f32 check does NOT hold for bf16 panels — measured bound recorded here
    and in PERF.md; panel_dtype stays opt-in)."""
    from dreamwaltz_g_tpu.ops.pallas_blend import blend_tiles_pallas_train

    H = W = 32
    g = _scene(120, H, W, seed=7)
    tile_lists, tile_counts, _ = R.bin_gaussians(
        g.means2d, g.radius, g.depth, g.mask, H, W, 16, 64)
    N, CH = g.colors.shape
    values = jnp.concatenate(
        [g.colors, g.depth[:, None], jnp.ones((N, 1))], axis=-1)
    op = g.opacity * g.mask.astype(jnp.float32)

    def loss(panel_dtype):
        def f(means2d, conic, opacity, vals):
            out = blend_tiles_pallas_train(
                tile_lists, tile_counts, means2d, conic, opacity, vals,
                H, W, tile_size=16, chunk=32, interpret=True,
                panel_dtype=panel_dtype)
            return jnp.sum(out ** 2) + jnp.sum(out[..., :3] * 0.3)
        return f

    args = (g.means2d, g.conic, op, values)
    v32 = float(loss("f32")(*args))
    v16 = float(loss("bf16")(*args))
    assert abs(v16 - v32) / max(abs(v32), 1e-9) < 4e-3

    g32 = jax.grad(loss("f32"), argnums=(0, 1, 2, 3))(*args)
    g16 = jax.grad(loss("bf16"), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g16, g32,
                          ("means2d", "conic", "opacity", "values")):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(float(np.abs(b).max()), 1e-9)
        rel = float(np.abs(a - b).max()) / denom
        # bf16 operand envelope: ~0.4% per product, f32 accumulate
        assert rel < 2e-2, f"{name}: bf16-panel grad deviates {rel:.2%}"
