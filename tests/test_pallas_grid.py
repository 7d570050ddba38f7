"""Pallas grid-encoder kernel vs the jnp oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.nerf.encoder import (
    GridEncoderConfig,
    grid_encode,
    init_grid_encoder,
)
from dreamwaltz_g_tpu.ops.pallas_grid import make_grid_encode


@pytest.mark.parametrize("gridtype", ["tiled", "hash"])
def test_pallas_matches_jnp(gridtype):
    cfg = GridEncoderConfig(num_levels=4, level_dim=2, base_resolution=4,
                            desired_resolution=64, log2_hashmap_size=9,
                            gridtype=gridtype)
    params = init_grid_encoder(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, size=(300, 3)), jnp.float32)

    ref = grid_encode(params, cfg, pts, bound=1.0)
    enc = make_grid_encode(cfg, chunk=128, force_pallas=True)
    out = enc(params, pts, bound=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_gradients_match():
    cfg = GridEncoderConfig(num_levels=3, level_dim=2, base_resolution=4,
                            desired_resolution=32, log2_hashmap_size=8)
    params = init_grid_encoder(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, 3)), jnp.float32)

    enc = make_grid_encode(cfg, chunk=64, force_pallas=True)

    def loss_pallas(tables):
        from dreamwaltz_g_tpu.nerf.encoder import GridEncoderParams
        return jnp.sum(enc(GridEncoderParams(tables), pts) ** 2)

    def loss_ref(tables):
        from dreamwaltz_g_tpu.nerf.encoder import GridEncoderParams
        return jnp.sum(grid_encode(GridEncoderParams(tables), cfg, pts) ** 2)

    g1 = jax.grad(loss_pallas)(params.tables)
    g2 = jax.grad(loss_ref)(params.tables)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-7)
