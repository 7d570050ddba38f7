"""End-to-end two-stage CLI chain (the reference's actual workflow):

``--stage nerf`` trains + checkpoints a stage-1 field, then ``--stage gs
--render.from_nerf <exp>`` exports its point cloud through the shipped
filter path and CONTINUES the same encoder tables in the stage-2 avatar
(reference: scripts/train_w_expr.sh stage chain; init_gaussian_model
handoff, core/trainer.py:528-576). The pieces are covered individually
elsewhere (test_avatar encoder-verbatim, test_nerf export, trainer
smokes); this is the only test that runs the real checkpoint-mediated
chain end to end through the CLI surface.
"""
import numpy as np
import pytest


def _tiny_common(tmp_path, name):
    return [
        "--log.debug", "true", "--log.exp_root", str(tmp_path),
        "--log.exp_name", name,
        "--nerf.backbone", "triplane",
        "--nerf.triplane_resolution", "16", "--nerf.triplane_dim", "8",
        "--data.train_w", "16", "--data.train_h", "16",
        "--data.eval_h", "16", "--data.eval_w", "16",
        "--data.test_h", "16", "--data.test_w", "16",
        "--log.snapshot_interval", "0", "--log.evaluate_interval", "0",
    ]


@pytest.mark.slow  # ~2 min: two full Trainer builds + train loops
def test_two_stage_handoff_cli(tmp_path):
    from dreamwaltz_g_tpu.configs import parse_args
    from dreamwaltz_g_tpu.training.trainer import Trainer

    # ---- stage 1: tiny NeRF SDS train, checkpoint at the final step ----
    cfg1 = parse_args([
        "--stage", "nerf", "--optim.iters", "2",
        "--log.save_interval", "2",
    ] + _tiny_common(tmp_path, "s1"))
    tr1 = Trainer(cfg1)
    tr1.train()
    assert tr1.train_step == 2
    ckpts = list((tr1.exp_dir / "checkpoints").glob("step_*"))
    assert ckpts, "stage 1 saved no checkpoint"
    planes1 = np.asarray(tr1.state.params.encoder.planes)

    # ---- stage 2: avatar seeded from the stage-1 field ----
    cfg2 = parse_args([
        "--stage", "gs", "--optim.iters", "1",
        "--render.from_nerf", str(tr1.exp_dir),
        "--render.n_gaussians", "128",
        "--render.nerf_resolution", "24",
        "--nerf.density_thresh", "1e-4",
        "--log.save_interval", "0",
    ] + _tiny_common(tmp_path, "s2"))
    tr2 = Trainer(cfg2)

    # the exported cloud seeded the avatar (not the SMPL-X mesh fallback)
    assert tr2._nerf_guidance is not None
    n_alive = int(np.asarray(tr2.state.avatar.alive).sum())
    assert n_alive > 0

    # the stage-1 encoder tables carried over VERBATIM (the continued-nets
    # handoff — system/avatar.py init passes NeRFParams.encoder through)
    planes2 = np.asarray(tr2.state.avatar.params.encoder.planes)
    np.testing.assert_array_equal(planes2, planes1)

    # and stage 2 trains on top of them
    tr2.train()
    assert tr2.train_step == 1
    after = np.asarray(tr2.state.avatar.params.encoder.planes)
    assert np.abs(after - planes1).max() > 0.0
