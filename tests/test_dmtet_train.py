"""DMTet finetune trainer tests (reference: run_dmtet + init_tet,
core/nerf/nerf_renderer.py:475-646 — wired here via
training/dmtet_trainer.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamwaltz_g_tpu import tests_support as ts
from dreamwaltz_g_tpu.configs import NeRFConfig
from dreamwaltz_g_tpu.nerf.dmtet import (
    DMTetModel,
    shade_soup,
    soup_normal_consistency,
    tet_laplacian_loss,
    unique_tet_edges,
)
from dreamwaltz_g_tpu.nerf.network import build_nerf
from dreamwaltz_g_tpu.training import dmtet_trainer
from dreamwaltz_g_tpu.training.optim import build_nerf_optimizer

# heavyweight e2e module: excluded from the fast profile (pytest.ini)
import pytest  # noqa: E402
pytestmark = pytest.mark.slow


def _tiny_setup(lock_geo=False):
    ncfg = NeRFConfig(backbone="tiledgrid", num_levels=2, desired_resolution=32,
                      log2_hashmap_size=8, bound=1.0, lock_geo=lock_geo)
    nerf = build_nerf(ncfg, with_background=False)
    params = nerf.init(jax.random.PRNGKey(0))
    model = DMTetModel.create(resolution=12, bound=1.0)
    dparams = model.init_sphere(0.5)
    model = model.prune_to_surface_band(dparams, dilate=1)
    edges = jnp.asarray(unique_tet_edges(model.tets))
    tx_n = build_nerf_optimizer(ncfg, 10)
    tx_d = dmtet_trainer.build_dmtet_optimizer(ncfg, 10)
    state = dmtet_trainer.init_train_state(params, dparams, tx_n, tx_d)
    guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(1))
    step = dmtet_trainer.make_dmtet_sds_step(
        nerf, model, edges, guidance, tx_n, tx_d, 16, 16, ncfg,
        tile_size=8, capacity=256, chunk=64)
    return nerf, model, state, step, gparams, guidance


def _step_args(guidance):
    from dreamwaltz_g_tpu.data.camera import make_camera_batch

    cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, 16, 16)
    D = guidance.unet.cfg.cross_attention_dim
    txt = jnp.zeros((1, 4, D))
    t = jnp.asarray([400], jnp.int32)
    campos = cam.c2w[0][:3, 3]
    return (cam.extrinsic[0], cam.intrinsics[0], campos,
            jnp.zeros((3,)), txt, txt, t, jax.random.PRNGKey(2))


def test_dmtet_step_trains_sdf_deform_and_field():
    nerf, model, state, step, gparams, guidance = _tiny_setup()
    s2, m = step(state, gparams, *_step_args(guidance))
    assert np.isfinite(float(m["loss"]))
    assert int(s2.step) == 1
    # geometry params moved
    assert not np.allclose(np.asarray(s2.dmtet.sdf),
                           np.asarray(state.dmtet.sdf))
    assert not np.allclose(np.asarray(s2.dmtet.deform),
                           np.asarray(state.dmtet.deform))
    # the NeRF field (albedo decode) trains too
    l0 = jax.tree_util.tree_leaves(state.params.sigma_mlp)
    l1 = jax.tree_util.tree_leaves(s2.params.sigma_mlp)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l0, l1))
    # regularizers present in metrics
    assert "mesh_normal_loss" in m and "mesh_laplacian_loss" in m


def test_dmtet_lock_geo_freezes_geometry():
    nerf, model, state, step, gparams, guidance = _tiny_setup(lock_geo=True)
    s2, m = step(state, gparams, *_step_args(guidance))
    assert np.allclose(np.asarray(s2.dmtet.sdf), np.asarray(state.dmtet.sdf))
    assert np.allclose(np.asarray(s2.dmtet.deform),
                       np.asarray(state.dmtet.deform))
    l0 = jax.tree_util.tree_leaves(state.params.sigma_mlp)
    l1 = jax.tree_util.tree_leaves(s2.params.sigma_mlp)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l0, l1))


def test_dmtet_shading_modes():
    model = DMTetModel.create(resolution=8, bound=1.0)
    dparams = model.init_sphere(0.5)
    soup = model.extract(dparams)
    M = soup.vertices.shape[0]
    albedo = jnp.full((M, 3), 0.5)
    light = jnp.asarray([0.0, 0.0, 1.0])
    alb = shade_soup(soup, albedo, "albedo", light)
    assert np.allclose(np.asarray(alb), 0.5)
    nrm = shade_soup(soup, albedo, "normal", light)
    assert np.asarray(nrm).min() >= 0 and np.asarray(nrm).max() <= 1
    lam = shade_soup(soup, albedo, "lambertian", light, ambient_ratio=0.1)
    v = np.asarray(soup.valid)
    # lit faces brighter than unlit ones on the sphere
    assert np.asarray(lam)[v].std() > 0
    tex = shade_soup(soup, albedo, "textureless", light, ambient_ratio=0.1)
    assert tex.shape == albedo.shape


def test_dmtet_regularizers():
    model = DMTetModel.create(resolution=8, bound=1.0)
    dparams = model.init_sphere(0.5)
    soup = model.extract(dparams)
    nc = float(soup_normal_consistency(soup))
    assert 0.0 <= nc < 1.0  # sphere quads are nearly coplanar

    edges = jnp.asarray(unique_tet_edges(model.tets))
    base = float(tet_laplacian_loss(model.verts, edges))
    rough = model.verts + 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                                  model.verts.shape)
    assert float(tet_laplacian_loss(rough, edges)) > base


def test_dmtet_init_from_nerf_clamps_and_prunes():
    ncfg = NeRFConfig(backbone="tiledgrid", num_levels=2, desired_resolution=32,
                      log2_hashmap_size=8, bound=1.0,
                      density_prior="gaussian")
    nerf = build_nerf(ncfg, with_background=False)
    params = nerf.init(jax.random.PRNGKey(0))
    model, dparams, edges = dmtet_trainer.init_dmtet(
        nerf, params, resolution=12, density_thresh=2.0)
    sdf = np.asarray(dparams.sdf)
    assert sdf.min() >= -1.0 and sdf.max() <= 1.0  # reference clamp
    assert (sdf > 0).any() and (sdf < 0).any()  # the prior blob cuts
    full = 6 * 11 ** 3
    assert model.tets.shape[0] < full  # band pruning dropped far tets


def test_trainer_dmtet_cli_smoke(tmp_path):
    """--nerf.dmtet true: the warn at the old trainer.py:233 is gone and a
    2-step debug run trains + checkpoints + eval-renders."""
    from dreamwaltz_g_tpu.configs import parse_args
    from dreamwaltz_g_tpu.training.trainer import Trainer

    cfg = parse_args([
        "--stage", "nerf", "--nerf.dmtet", "true",
        "--nerf.tet_grid_size", "12",
        "--nerf.density_prior", "gaussian", "--nerf.density_thresh", "2.0",
        "--log.debug", "true", "--log.exp_root", str(tmp_path),
        "--log.exp_name", "dmtet", "--optim.iters", "2",
        "--optim.batch_size", "1",
        "--data.train_w", "16", "--data.eval_h", "16",
        "--data.eval_w", "16", "--data.test_h", "16", "--data.test_w", "16",
        "--data.eval_size", "1", "--data.eval_save_video", "false",
        "--log.snapshot_interval", "0", "--log.evaluate_interval", "0",
        "--log.save_interval", "0",
    ])
    tr = Trainer(cfg)
    assert tr.dmtet_model is not None
    sdf0 = np.asarray(tr.state.dmtet.sdf)
    tr.train()
    assert tr.train_step == 2
    assert not np.allclose(np.asarray(tr.state.dmtet.sdf), sdf0)
    frames = tr.evaluate(size=1, save_dir=tmp_path / "ev")
    assert frames[0].shape == (16, 16, 3) and np.isfinite(frames[0]).all()
