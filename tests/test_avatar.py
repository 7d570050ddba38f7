import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamwaltz_g_tpu.gaussian.densify import DensifyConfig
from dreamwaltz_g_tpu.human import poses
from dreamwaltz_g_tpu.human.deform import DeformNetwork
from dreamwaltz_g_tpu.human.smplx_model import make_synthetic_model, smplx_forward
from dreamwaltz_g_tpu.nerf.encoder import GridEncoderConfig
from dreamwaltz_g_tpu.nerf.network import SigmaMLP
from dreamwaltz_g_tpu.system import avatar as A
from dreamwaltz_g_tpu.system.background import PureColorBackground
from dreamwaltz_g_tpu.system.scene import Scene, render_gaussians
from dreamwaltz_g_tpu.data.camera import make_camera_batch


@pytest.fixture(scope="module")
def setup():
    smpl = make_synthetic_model(num_vertices=120, num_joints=6, num_betas=3,
                                num_expr=2)
    J = smpl.num_joints
    canonical = poses.canonical_params(smpl, "canonical-A-adjust") \
        if J == 22 else None
    # synthetic model: just use default zero pose with pelvis centering
    from dreamwaltz_g_tpu.human.smplx_model import default_params
    canonical = default_params(smpl, 1)

    enc_cfg = GridEncoderConfig(num_levels=4, level_dim=2, base_resolution=4,
                                desired_resolution=32, log2_hashmap_size=8)
    # one mesh part: a handful of triangles near the chain top ("face")
    faces = smpl.faces
    v = np.asarray(smpl.v_template)
    tri_centroids = v[faces].mean(1)
    top = np.argsort(-tri_centroids[:, 1])[:10]
    part_vids = np.unique(faces[top].reshape(-1))
    part = A.make_mesh_binding_static(faces, part_vids, top, n_per_triangle=3)

    model = A.AvatarModel(
        smpl=smpl,
        canonical_inputs=canonical,
        enc_cfg=enc_cfg,
        nerf_bound=2.0,
        color_mlp=SigmaMLP(hidden=32, num_layers=2, out_channels=4),
        sq_net=DeformNetwork(depth=2, width=32, xyz_input_ch=enc_cfg.output_dim),
        mesh_parts={"face": part},
    )
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.normal(size=(64, 3)) * 0.15
                        + np.asarray([0, 0.7, 0]), jnp.float32)
    state = A.init_avatar_state(model, cloud, jax.random.PRNGKey(0),
                                capacity=128, prune_dists_close_to_mesh=None)
    return model, state, cloud


def test_init_shapes(setup):
    model, state, cloud = setup
    assert state.capacity == 128
    assert int(state.num_alive) == 64
    assert state.params.lbs_weights.shape == (128, model.smpl.num_joints)
    # lbs weights are normalized
    w = np.asarray(state.params.lbs_weights[:64])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)


def test_canonical_roundtrip(setup):
    """zero-pose positions forward-LBS'd to canonical reproduce the cloud
    (inverse then forward is identity when transforms match)."""
    model, state, cloud = setup
    from dreamwaltz_g_tpu.human.glbs import glbs_transforms

    tr = glbs_transforms(model.smpl, model.canonical_inputs)
    back = A.forward_lbs(tr, state.params.positions[:64],
                         state.params.lbs_weights[:64])
    np.testing.assert_allclose(np.asarray(back), np.asarray(cloud), atol=1e-4)


@pytest.mark.slow  # 17 s; animate correctness covered fast by test_animate_jit_and_grads
def test_animate_canonical_near_cloud(setup):
    model, state, cloud = setup
    gs = A.animate(model, state, observed_inputs=None)
    n_mesh = model.n_mesh_points
    assert gs.positions.shape[0] == 128 + n_mesh
    # unconstrained positions ~ cloud + small non-rigid offset
    d = np.linalg.norm(np.asarray(gs.positions[:64]) - np.asarray(cloud), axis=-1)
    assert d.max() < 0.05
    # densify mask only on unconstrained
    assert bool(gs.densify_mask[:128].all()) and not bool(gs.densify_mask[128:].any())
    # mesh part: opacity 1, scales flat (first component ~0)
    assert float(gs.opacities[128:].min()) == 1.0
    assert float(gs.scales[128:, 0].max()) < 1e-5


def test_animate_follows_pose(setup):
    """bending a joint moves the gaussians attached to it."""
    model, state, cloud = setup
    J = model.smpl.num_joints
    from dreamwaltz_g_tpu.human.smplx_model import default_params

    obs = default_params(model.smpl, 1)
    obs = obs._replace(global_orient=jnp.asarray([[0.0, np.pi / 2, 0.0]]))
    gs0 = A.animate(model, state)
    gs1 = A.animate(model, state, obs)
    moved = np.linalg.norm(
        np.asarray(gs1.positions[:64]) - np.asarray(gs0.positions[:64]), axis=-1)
    assert moved.mean() > 0.05  # global rotation displaces points
    # rigid motion: pairwise distances preserved for a pure global rotation
    p0 = np.asarray(gs0.positions[:10])
    p1 = np.asarray(gs1.positions[:10])
    d0 = np.linalg.norm(p0[:, None] - p0[None], axis=-1)
    d1 = np.linalg.norm(p1[:, None] - p1[None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=2e-3)


def test_animate_jit_and_grads(setup):
    model, state, cloud = setup
    from dreamwaltz_g_tpu.human.smplx_model import default_params

    obs = default_params(model.smpl, 1)
    cam = make_camera_batch(2.0, 30.0, 90.0, 50.0, 32, 32, at_vector=((0, 0.7, 0),))
    bg = PureColorBackground.make("gray")(cam)
    scene = Scene(model=model)

    @jax.jit
    def loss_fn(params):
        st = state._replace(params=params)
        out = scene.forward(st, cam, bg, obs, tile_size=16, capacity=64, chunk=16)
        return jnp.mean(out.image)

    g = jax.grad(loss_fn)(state.params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # gradients reach positions, the NeRF tables, the deform net, and bary
    assert float(jnp.abs(g.positions).sum()) > 0
    assert float(jnp.abs(g.encoder.tables).sum()) > 0
    assert float(jnp.abs(g.mesh["face"].bary_coords).sum()) > 0


def test_avatar_densify(setup):
    model, state, cloud = setup
    st = state._replace(
        grad_accum=jnp.zeros(128).at[:4].set(10.0),
        grad_denom=jnp.zeros(128).at[:64].set(1.0),
    )
    cfg = DensifyConfig(grad_threshold=1.0, percent_dense=100.0)  # clone path
    st2, written = A.densify_avatar(st, cfg, jax.random.PRNGKey(0))
    assert int(st2.num_alive) == 68
    # clones carry the parent's lbs weights
    new_slots = np.where(np.asarray(written) & ~np.asarray(st.alive))[0]
    np.testing.assert_allclose(
        np.asarray(st2.params.lbs_weights)[new_slots],
        np.asarray(st.params.lbs_weights)[:4], atol=1e-6)


def test_avatar_densify_opacity_prune(setup):
    """min-opacity prune on DECODED opacities (reference:
    gaussian_densifier.py:211-228; the avatar analog of VERDICT weak #5)."""
    model, state, cloud = setup
    cfg = DensifyConfig(grad_threshold=1e9, min_opacity=0.5)
    # fake decoded opacities: slots 0-9 dead, everything else opaque
    ops = jnp.ones(128).at[:10].set(0.01)
    st2, _ = A.densify_avatar(state, cfg, jax.random.PRNGKey(0),
                              opacities=ops)
    assert int(st2.num_alive) == 64 - 10
    assert not bool(st2.alive[:10].any())
    # without opacities nothing is pruned
    st3, _ = A.densify_avatar(state, cfg, jax.random.PRNGKey(0))
    assert int(st3.num_alive) == 64


def test_decode_opacities_matches_animate(setup):
    """decode_opacities reproduces animate()'s unconstrained opacities."""
    model, state, cloud = setup
    ops = A.decode_opacities(model, state)
    gs = A.animate(model, state, observed_inputs=None)
    np.testing.assert_allclose(np.asarray(ops[:64]),
                               np.asarray(gs.opacities[:64]), atol=1e-5)


@pytest.mark.slow
def test_render_scene_sanity(setup):
    model, state, cloud = setup
    cam = make_camera_batch(2.0, 0.0, 90.0, 50.0, 32, 32, at_vector=((0, 0.7, 0),))
    bg = PureColorBackground.make("white")(cam)
    gs = A.animate(model, state)
    out = render_gaussians(gs, cam, bg, tile_size=16, capacity=64, chunk=16)
    assert out.image.shape == (32, 32, 3)
    assert float(out.alpha.max()) > 0.01  # something rendered
    # background shows through where alpha ~ 0
    corner = np.asarray(out.image[0, 0])
    if float(out.alpha[0, 0]) < 0.01:
        np.testing.assert_allclose(corner, [1, 1, 1], atol=0.02)


@pytest.mark.slow  # 7 s; same equivalence asserted by the driver dryrun's frame-DP leg
def test_frame_batched_render_matches_per_frame(setup):
    """make_avatar_render_frames (one dispatch, F frames via lax.map) must
    equal F single-frame renders (PERF.md 'batched frames' lever)."""
    import jax

    from dreamwaltz_g_tpu.data.camera import make_camera_batch
    from dreamwaltz_g_tpu.training.gs_trainer import (
        make_avatar_render,
        make_avatar_render_frames,
    )

    from dreamwaltz_g_tpu.human.smplx_model import default_params

    model, state, _ = setup
    observed = default_params(model.smpl, 1)
    H = W = 32
    F = 3
    rk = dict(tile_size=8, capacity=64, chunk=32)
    single = make_avatar_render(model, H, W, **rk)
    batched = make_avatar_render_frames(model, H, W, **rk)
    cams = make_camera_batch([2.5] * F, [0.0, 120.0, 240.0], [80.0] * F,
                             [55.0] * F, H, W)
    obs_frames = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (F,) + x.shape), observed)
    bg = jnp.full((H, W, 3), 0.3)

    imgs, alphas, depths = batched(state, obs_frames, cams.extrinsic,
                                   cams.intrinsics, cams.tanfov, bg)
    assert imgs.shape == (F, H, W, 3)
    for i in range(F):
        img1, a1, d1 = single(state, observed,
                              cams.extrinsic[i], cams.intrinsics[i],
                              cams.tanfov[i], bg, ())
        np.testing.assert_allclose(np.asarray(imgs[i]), np.asarray(img1),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(alphas[i]), np.asarray(a1),
                                   atol=2e-3)


@pytest.mark.slow
class TestTriplaneAvatar:
    """Stage-2 avatar over the TPU-first triplane field (encode_any
    dispatch): the nerf2gs handoff passes the stage-1 encoder verbatim, so
    a triplane stage-1 yields a triplane avatar decode (PERF.md: the hash
    scatter-add backward dominates the stage-2 step on TPU; triplane cuts
    it from 8 x num_levels rows/point to 12)."""

    def _setup(self):
        from dreamwaltz_g_tpu import tests_support as ts
        from dreamwaltz_g_tpu.nerf.encoder import TriplaneConfig

        return ts.tiny_avatar_setup(
            enc_cfg=TriplaneConfig(resolution=16, feature_dim=8))

    def test_animate_and_grads(self):
        setup = self._setup()
        gs = A.animate(setup.model, setup.state, setup.observed)
        assert np.isfinite(np.asarray(gs.positions)).all()
        assert np.isfinite(np.asarray(gs.colors)).all()

        def loss(p):
            g = A.animate(setup.model, setup.state._replace(params=p),
                          setup.observed)
            return jnp.sum(g.colors ** 2) + jnp.sum(g.opacities ** 2)

        g = jax.grad(loss)(setup.state.params)
        # gradient reaches the plane tables (the trainable stage-1 field)
        assert float(jnp.linalg.norm(g.encoder.planes)) > 0.0
        assert np.isfinite(np.asarray(g.encoder.planes)).all()

    def test_sds_step_runs(self):
        from dreamwaltz_g_tpu import tests_support as ts
        from dreamwaltz_g_tpu.configs import RenderConfig
        from dreamwaltz_g_tpu.training.gs_trainer import (
            init_avatar_train_state,
            make_avatar_sds_step_split,
        )
        from dreamwaltz_g_tpu.training.optim import build_avatar_optimizer

        setup = self._setup()
        guidance, gparams = ts.tiny_guidance(jax.random.PRNGKey(0))
        H = W = guidance.latent_size * 8
        tx = build_avatar_optimizer(RenderConfig(), max_steps=100)
        tstate = init_avatar_train_state(setup.state, tx)
        step = make_avatar_sds_step_split(
            setup.model, guidance, tx, H, W, tile_size=8, capacity=64,
            chunk=32, max_tiles_per_gaussian=4)
        cam = make_camera_batch(2.5, 30.0, 80.0, 50.0, H, W)
        txt = jnp.zeros((1, 77, guidance.unet.cfg.cross_attention_dim))
        t = jnp.asarray([50], jnp.int32)
        bg = jnp.zeros((H, W, 3))
        tstate2, m = step(tstate, gparams, setup.observed, cam.extrinsic[0],
                          cam.intrinsics[0], cam.tanfov[0], bg, txt, txt, t,
                          jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        # plane tables moved
        d = np.abs(np.asarray(
            tstate2.avatar.params.encoder.planes
            - tstate.avatar.params.encoder.planes)).max()
        assert d > 0.0
