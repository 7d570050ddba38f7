"""Top-level trainer: wires config -> models -> data -> train loops -> eval.

Functional re-design of the reference god-Trainer
(reference: core/trainer.py:302-1386). The reference mutates one giant
object; here the Trainer owns *static* builders and host-side providers
(pose prompt, camera samplers, timestep scheduler, checkpointer) while all
device state lives in explicit pytrees (NeRFTrainState / AvatarTrainState)
flowing through jitted step functions.

Asset gating: the licensed SMPL-X npz and converted SD weights are external.
When they are absent and ``cfg.log.debug`` is set, synthetic fixtures stand
in (tiny body + randomly-initialized tiny SD) so the full pipeline runs
anywhere — the CPU smoke-test strategy of SURVEY.md §4.
"""
from __future__ import annotations

import logging
import os
import os.path as osp
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import TrainConfig, save_config
from ..configs.paths import GUIDANCE_WEIGHTS, HUMAN_TEMPLATES
from ..data.camera import CameraBatch, make_camera_batch
from ..data.sampler import CyclicalCamera4Avatar, RandomCamera4Avatar
from ..gaussian.densify import DensifyConfig
from ..guidance.sds import GuidanceParams, ScoreDistillation
from ..guidance.text_aug import TextAugmentation
from ..guidance.time_prior import TimePrioritizedScheduler
from ..human.condition import conditions_to_batch
from ..human.keypoints import load_landmark_data, openpose_keypoints
from ..human.prompt import SMPLPrompt, load_hand_components
from ..human.smplx_model import load_smplx_npz, make_synthetic_model
from ..nerf.network import build_nerf
from ..nerf.renderer import init_occupancy
from ..utils.media import save_image, write_video
from . import gs_trainer, nerf_trainer
from .checkpoint import Checkpointer, load_pytree, save_pytree
from .losses import make_sigma_guidance_points
from .optim import build_avatar_optimizer, build_nerf_optimizer

logger = logging.getLogger("dreamwaltz_g_tpu")


def resolve_ckpt_path(path) -> Optional[Path]:
    """Accept an orbax step dir, a checkpoints/ dir, or an exp dir
    (reference: latest-checkpoint glob discovery, trainer.py:175-192)."""
    p = Path(path)
    if not p.exists():
        return None
    if p.name.startswith("step_"):
        return p
    if (p / "checkpoints").is_dir():
        p = p / "checkpoints"
    steps = sorted(d for d in p.iterdir() if d.name.startswith("step_"))
    return steps[-1] if steps else None


def _find_smplx_npz(cfg: TrainConfig) -> Optional[str]:
    """(reference: smplx model card resolution, core/human/smpl_model.py:75-99)"""
    root = Path(HUMAN_TEMPLATES)
    candidates = [
        root / "smplx" / "SMPLX_NEUTRAL_2020.npz",
        root / "smplx" / f"SMPLX_{cfg.prompt.smpl_gender.upper()}.npz",
    ]
    for c in candidates:
        if c.is_file():
            return str(c)
    return None


def _train_mesh_and_gshard(cfg, batch_size, guidance_params):
    """Device mesh for DP training, plus TP placement of the frozen
    guidance when ``parallel.tp > 1`` (parallel/tp.py Megatron sharding).

    Returns ``(mesh, gparams_shardings_or_None, guidance_params)`` — with
    TP the guidance weights are re-placed onto the (data, model) mesh.
    """
    from ..parallel.mesh import make_mesh, make_mesh_2d

    n_dev = len(jax.devices())
    tp = max(int(getattr(cfg.parallel, "tp", 1) or 1), 1)
    req_dp = int(getattr(cfg.parallel, "dp", -1) or -1)  # -1 = all devices
    if tp > 1:
        from ..guidance import layers
        from ..parallel.tp import guidance_shardings, shard_guidance_params

        # GSPMD cannot partition the Pallas flash-attention custom call;
        # publish the mesh so layers.flash_self_attention wraps the kernel
        # in shard_map (batch over 'data', heads over 'model') instead of
        # losing flash in every multi-device config.
        assert n_dev % tp == 0, (
            f"parallel.tp={tp} must divide the device count {n_dev}")
        dp = n_dev // tp if req_dp < 0 else min(req_dp, n_dev // tp)
        dp = max(min(dp, batch_size), 1)
        assert batch_size % dp == 0, (
            f"batch_size {batch_size} must divide over dp={dp}")
        mesh = make_mesh_2d(dp=dp, tp=tp)
        layers.FLASH_SHARD = (mesh, "data", "model")
        gshard = guidance_shardings(guidance_params, mesh)
        return mesh, gshard, shard_guidance_params(guidance_params, mesh)
    dp = n_dev if req_dp < 0 else min(req_dp, n_dev)
    dp = max(min(dp, batch_size), 1)
    assert batch_size % dp == 0, (
        f"batch_size {batch_size} must divide over dp={dp} "
        f"(parallel.dp={req_dp}, {n_dev} devices)")
    mesh = make_mesh(dp=dp)
    if dp > 1:
        # Same constraint as the TP branch above: the DP train steps are
        # jax.jit with in_shardings over a >1-device mesh, and GSPMD has
        # no partitioning rule for the Pallas flash-attention custom call.
        # The shard_map wrapper splits the CFG-batch rows over 'data'.
        from ..guidance import layers

        layers.FLASH_SHARD = (mesh, "data", None)
    return mesh, None, guidance_params


class Trainer:
    """(reference: Trainer.__init__, core/trainer.py:303-384)"""

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.exp_dir = Path(cfg.log.exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        save_config(cfg, self.exp_dir / "config.json")
        if not logger.handlers:  # console + log.txt (reference: _Logger,
            # trainer.py:282-287)
            logger.setLevel(logging.INFO)
            fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            for h in (logging.StreamHandler(),
                      logging.FileHandler(self.exp_dir / "log.txt")):
                h.setFormatter(fmt)
                logger.addHandler(h)
            logger.propagate = False

        self.rng = np.random.default_rng(cfg.optim.seed)
        # dedicated generator for _train_batch: it runs on the prefetch
        # worker thread, and numpy Generators are not thread-safe against
        # the main thread's self.rng draws (_bg_color, sigma_prob)
        self._batch_rng = np.random.default_rng(cfg.optim.seed + 7919)
        self.key = jax.random.PRNGKey(cfg.optim.seed)
        self.max_iteration = cfg.optim.iters
        self.train_step = 0
        self.extra_states = ()
        self.extra_models = ()
        self.bg_state = None   # trainable MLP background (gs stage opt-in)
        self.bg_net = None
        self.neg_embeds = None  # csd/nfsd negative-prompt branch

        self._warn_unsupported_knobs()
        self._init_human()
        self._init_guidance()
        self._init_cameras()
        self.checkpointer = Checkpointer(self.exp_dir / "checkpoints",
                                         max_keep=cfg.log.max_keep_ckpts)
        self.dmtet_model = None  # set by _init_nerf when --nerf.dmtet
        if cfg.stage == "nerf":
            self._init_nerf()
        else:
            self._init_avatar()
        if cfg.log.check or cfg.log.check_sd:
            self.check()

    def _warn_unsupported_knobs(self):
        """Reference flags parsed for CLI compatibility but not implemented
        in this build — warn instead of silently ignoring (VERDICT r1 #10:
        advertised-but-ignored flags are worse than absent ones)."""
        r, g, d = self.cfg.render, self.cfg.guide, self.cfg.data
        checks = [
            # non_rigid_scale_mode is DEAD IN THE REFERENCE: stored
            # (avatar.py:1126) but never read — both the scale and the
            # quaternion composition branch gate on non_rigid_ROTATION_mode
            # (avatar.py:1471, 1485), which IS honored here
            (r.non_rigid_scale_mode != "add",
             "render.non_rigid_scale_mode (dead in the reference: stored at "
             "avatar.py:1126, never read — the scale branch gates on "
             "non_rigid_rotation_mode, avatar.py:1471)"),
            (r.use_nerf_opacities is False, "render.use_nerf_opacities "
             "(dead in the reference: defaulted at configs/__init__.py:179, "
             "never read by any core module)"),
            (r.use_nerf_scales_and_quaternions is False,
             "render.use_nerf_scales_and_quaternions (use gs_type=hash)"),
            (r.use_nerf_mesh_scales_and_quaternions is False,
             "render.use_nerf_mesh_scales_and_quaternions (only read by "
             "the reference's dead HashAvatarWithMesh, avatar.py:520)"),
            (not r.learn_mesh_quaternions is False,
             "render.learn_mesh_quaternions (dead for the shipped avatar: "
             "only read by the reference's dead HashAvatarWithMesh, "
             "avatar.py:518/563/746 — DreamWaltzG's mesh quats always "
             "derive from triangle frames, avatar.py:1027-1079)"),
            # batched_view / uniform_sphere_rate / jitter_pose are DEAD IN
            # THE REFERENCE TOO: defined in its DataConfig
            # (reference configs/__init__.py:319-322) and never read by any
            # code (stable-dreamfusion vestiges) — deliberately not
            # implemented here; parsed only for CLI compatibility
            (d.batched_view, "data.batched_view (dead in the reference: "
             "parsed at configs/__init__.py:319, never read)"),
            (d.uniform_sphere_rate not in (None, 0, 0.0),
             "data.uniform_sphere_rate (dead in the reference: parsed at "
             "configs/__init__.py:320, never read)"),
            (d.jitter_pose, "data.jitter_pose (dead in the reference: "
             "parsed at configs/__init__.py:322, never read)"),
        ]
        n, p, lg = self.cfg.nerf, self.cfg.prompt, self.cfg.log
        checks += [
            (g.concept_name is not None and g.diffusion.startswith("sdxl"),
             "guide.concept_name with SDXL (sd-concepts are 768-dim SD1.x "
             "embeddings — dimensionally incompatible with the bigG tower; "
             "the reference would inject them into tower 1 only)"),
            # precision-intent flags: TPU guidance always computes in
            # guide.dtype (bf16 default, the MXU-native fp16 analog)
            (g.diffusion_fp16 or g.controlnet_fp16,
             "guide.diffusion_fp16/controlnet_fp16 (precision comes from "
             "guide.dtype here: bf16 default, f32 available)"),
            # CUDA variable-step marching knobs — replaced by static-shape
            # marching (nerf.num_steps/compact_steps); see configs comment
            (not n.cuda_ray, "nerf.cuda_ray=false (the TPU marcher IS the "
             "non-CUDA path; tune nerf.num_steps instead)"),
            (n.max_steps != 1024, "nerf.max_steps (use nerf.num_steps/"
             "compact_steps — static-shape TPU marching)"),
            (n.dt_gamma != 0.0, "nerf.dt_gamma (fixed-step TPU marching)"),
            (n.bg_suppress, "nerf.bg_suppress (dead in the reference: "
             "consumer commented out, nerf_renderer.py:445-462)"),
            # DMTet finetune is wired (--nerf.dmtet -> training/
            # dmtet_trainer.py); lambda_normal / lambda_2d_normal_smooth
            # gate a normal_image the reference renders but whose losses
            # its trainer never consumes (no reader of those lambdas
            # outside configs) — parsed + warned here
            (n.lambda_normal > 0, "nerf.lambda_normal (normal_image loss "
             "never consumed by the reference trainer)"),
            (n.lambda_2d_normal_smooth > 0,
             "nerf.lambda_2d_normal_smooth (normal_image loss never "
             "consumed by the reference trainer)"),
            (n.lambda_3d_normal_smooth > 0,
             "nerf.lambda_3d_normal_smooth (dead in the reference)"),
            (n.start_shading_iter is not None,
             "nerf.start_shading_iter (dead in the reference)"),
            (r.use_nerf_scales or r.use_nerf_quaternions
             or r.use_deform_scales_and_quaternions,
             "render.use_nerf_scales/use_nerf_quaternions/"
             "use_deform_scales_and_quaternions (dead in the reference)"),
            (r.use_nerf_mesh_opacities, "render.use_nerf_mesh_opacities "
             "(only read by the reference's dead HashAvatarWithMesh)"),
            (p.nerf_depth_step != 0.2,
             "prompt.nerf_depth_step (dead in the reference)"),
            (p.num_object != 0, "prompt.num_object (dead in the reference)"),
            (p.adaptive_hand_dist_thres is not None,
             "prompt.adaptive_hand_dist_thres (dead in the reference: "
             "consumer commented out, smpl_condition.py:152)"),
            (lg.nvstrain_only or lg.anytrain_only or lg.skip_rgb,
             "log.nvstrain_only/anytrain_only/skip_rgb (dead in the "
             "reference)"),
        ]
        for cond, name in checks:
            if cond:
                logger.warning("config knob %s is parsed for reference-CLI "
                               "compatibility but has no effect in this "
                               "build", name)
        if g.grad_rgb_clip_mask_guidance and self.cfg.stage != "nerf":
            # the reference asserts for non-nerf stages (trainer.py:959-962)
            raise ValueError(
                "guide.grad_rgb_clip_mask_guidance is a stage-1 (nerf) "
                "feature — the mask is the NeRF render's weights_sum")
        if r.deform_type == "lbs":
            # pure-LBS deform: disable the non-rigid residuals
            # (reference: build_gaussian_avatar deform_type dispatch,
            # avatar.py:1643-1660)
            r.use_non_rigid_offsets = False
            r.use_non_rigid_scales = False
            r.use_non_rigid_rotations = False

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _placement(self):
        """Scene-level avatar placement from --render.avatar_scale /
        avatar_transl (reference: Scene.__init__ eval()'d tensors,
        scene.py:65-66; ast.literal_eval here)."""
        import ast

        r = self.cfg.render
        if r.avatar_scale is None and r.avatar_transl is None:
            return None
        sc = None if r.avatar_scale is None else np.asarray(
            ast.literal_eval(str(r.avatar_scale)), np.float32)
        tr = None if r.avatar_transl is None else np.asarray(
            ast.literal_eval(str(r.avatar_transl)), np.float32)
        return (sc, tr)

    def _common_step_kwargs(self):
        """Builder kwargs shared by EVERY stage-2 SDS step constructor,
        assembled in exactly one place so the initial build and
        _rebuild_train_step (progressive-resolution switches) can never
        drift apart."""
        return dict(
            lambda_guidance=self.cfg.guide.lambda_guidance,
            neg_embeds=self.neg_embeds, pgc=self.pgc,
            placement=self._placement(),
            static_gaussians=self._static_bg_gaussians())

    def _static_bg_gaussians(self):
        """PLY-initialized 3DGS background merged into every render
        (reference: --render.use_gs_background, scene.py:233-235)."""
        if not self.cfg.render.use_gs_background:
            return None
        if getattr(self, "_gs_bg_cache", None) is None:
            from ..system.background import load_gaussian_background

            self._gs_bg_cache = load_gaussian_background(
                self.cfg.render.use_gs_background)
        return self._gs_bg_cache

    # ------------------------------------------------------------------
    # builders
    # ------------------------------------------------------------------

    def _init_human(self):
        cfg = self.cfg
        npz = _find_smplx_npz(cfg)
        if npz is not None:
            kid_path = None
            if cfg.prompt.smpl_age == "kid":
                # AGORA kid template: extra shape direction + betas[-1]=0.7
                # (reference: smpl_model.py:102-104, 120-122)
                cand = Path(npz).parent / "smplx_kid_template.npy"
                if cand.is_file():
                    kid_path = str(cand)
                else:
                    logger.warning(
                        "smpl_age='kid' but %s is missing — training the "
                        "adult template", cand)
            self.smpl = load_smplx_npz(
                npz, flat_hand_mean=cfg.prompt.flat_hand_mean,
                kid_template_path=kid_path)
            if kid_path is not None:
                rate = 0.7  # kid_interpolation_rate (smpl_model.py:121)
                kid_vec = np.zeros((1, self.smpl.num_betas), np.float32)
                kid_vec[0, -1] = rate
                if cfg.prompt.canonical_betas is None:
                    cfg.prompt.canonical_betas = kid_vec
                if cfg.prompt.observed_betas is None:
                    cfg.prompt.observed_betas = kid_vec
            landmarks = load_landmark_data(npz)
            hand_components = load_hand_components(npz)
        else:
            assert cfg.log.debug, (
                "SMPL-X npz not found under HUMAN_TEMPLATES; "
                "pass --log.debug true to run with the synthetic body")
            logger.warning("debug: using the synthetic stick body")
            self.smpl = make_synthetic_model()
            landmarks, hand_components = None, None

        cond_h = cond_w = 512  # ControlNet native condition resolution
        self.prompt = SMPLPrompt(
            cfg.prompt, self.smpl,
            cond_type=list(cfg.guide.controlnet_condition),
            height=cond_h, width=cond_w,
            landmarks=landmarks, hand_components=hand_components,
            seed=cfg.optim.seed)

    def _init_guidance(self):
        """(reference: init_diffusion + init_text_embeddings,
        trainer.py:445-476, 647-678)"""
        cfg = self.cfg
        self.view_prompt = TextAugmentation(
            cfg.guide.text or "a person",
            mode=cfg.prompt.text_augmentation_mode
            if cfg.prompt.text_augmentation else "suffix",
            angle_front=cfg.prompt.angle_front,
            angle_overhead=cfg.prompt.angle_overhead)

        # model-card selection (reference: MODEL_CARDS, basic.py:29-49) —
        # 'sdxl*' dispatches to the XL stack (dual CLIP + pooled embeds)
        is_xl = str(cfg.guide.diffusion).startswith("sdxl")
        weights_dir = cfg.guide.weights_dir or GUIDANCE_WEIGHTS
        unet_file = "unet_xl.msgpack" if is_xl else "unet.msgpack"
        if osp.isdir(weights_dir) and osp.isfile(
                osp.join(weights_dir, unet_file)):
            texts = list(self.view_prompt.texts)
            uncond = cfg.guide.negative_text if cfg.guide.use_negative_text \
                else cfg.guide.null_text
            if is_xl:
                from ..guidance.convert import load_converted_guidance_xl

                (self.guidance, self.guidance_params,
                 text_embed_fn) = load_converted_guidance_xl(
                    weights_dir, loss_type=cfg.guide.sds_loss_type,
                    weight_type=cfg.guide.sds_weight_type,
                    guidance_scale=cfg.guide.guidance_scale,
                    guidance_rescale=cfg.guide.guidance_rescale,
                    denoise_timesteps=cfg.guide.denoise_timesteps,
                    use_controlnet=cfg.guide.use_controlnet,
                    controlnet_scale=cfg.guide.controlnet_scale,
                    lora_name=cfg.guide.lora_name,
                    lora_scale=cfg.guide.lora_scale)
                self.text_embeds, pooled_t = text_embed_fn(texts)
                self.uncond_embeds, pooled_u = text_embed_fn([uncond])
                # view variants share the base prompt's pooled embedding
                # (the per-view suffix lives in the context tokens)
                self.guidance.pooled_text = pooled_t[:1]
                self.guidance.pooled_uncond = pooled_u[:1]
            else:
                from ..guidance.convert import load_converted_guidance

                (self.guidance, self.guidance_params,
                 text_embed_fn) = load_converted_guidance(
                    weights_dir, use_controlnet=cfg.guide.use_controlnet,
                    loss_type=cfg.guide.sds_loss_type,
                    weight_type=cfg.guide.sds_weight_type,
                    guidance_scale=cfg.guide.guidance_scale,
                    controlnet_scale=cfg.guide.controlnet_scale,
                    guidance_rescale=cfg.guide.guidance_rescale,
                    denoise_timesteps=cfg.guide.denoise_timesteps,
                    model=cfg.guide.diffusion,
                    lora_name=cfg.guide.lora_name,
                    lora_scale=cfg.guide.lora_scale,
                    concept_name=cfg.guide.concept_name)
                self.text_embeds = text_embed_fn(texts)      # (V, L, D)
                self.uncond_embeds = text_embed_fn([uncond])  # (1, L, D)
            # csd/nfsd 3-way CFG needs the negative prompt as its own
            # branch (reference: ('null','text','neg'), basic.py:557-563)
            self.neg_embeds = None
            if cfg.guide.sds_loss_type in ("csd", "nfsd"):
                if is_xl:
                    self.neg_embeds, _ = text_embed_fn(
                        [cfg.guide.negative_text])
                else:
                    self.neg_embeds = text_embed_fn(
                        [cfg.guide.negative_text])
            self._cast_guidance_dtype()
        else:
            assert cfg.log.debug, (
                f"converted guidance weights not found at {weights_dir} "
                f"({unet_file}); run the converter or pass --log.debug true")
            logger.warning("debug: using tiny randomly-initialized guidance")
            if is_xl:
                from ..tests_support import tiny_guidance_xl

                (self.guidance, self.guidance_params,
                 text_embed_fn) = tiny_guidance_xl(self._next_key())
                self.guidance.loss_type = cfg.guide.sds_loss_type
                self.guidance.weight_type = cfg.guide.sds_weight_type
                self.guidance.guidance_scale = cfg.guide.guidance_scale
                self.guidance.guidance_rescale = cfg.guide.guidance_rescale
                self.guidance.denoise_timesteps = \
                    cfg.guide.denoise_timesteps
                texts = list(self.view_prompt.texts)
                self.text_embeds, pooled_t = text_embed_fn(texts)
                self.uncond_embeds, pooled_u = text_embed_fn(
                    [cfg.guide.null_text])
                self.guidance.pooled_text = pooled_t[:1]
                self.guidance.pooled_uncond = pooled_u[:1]
                if cfg.guide.sds_loss_type in ("csd", "nfsd"):
                    self.neg_embeds, _ = text_embed_fn(
                        [cfg.guide.negative_text])
            else:
                from ..tests_support import tiny_guidance

                self.guidance, self.guidance_params = tiny_guidance(
                    self._next_key(),
                    with_controlnet=cfg.guide.use_controlnet)
                self.guidance.loss_type = cfg.guide.sds_loss_type
                self.guidance.weight_type = cfg.guide.sds_weight_type
                self.guidance.guidance_scale = cfg.guide.guidance_scale
                self.guidance.guidance_rescale = cfg.guide.guidance_rescale
                self.guidance.denoise_timesteps = \
                    cfg.guide.denoise_timesteps
                D = self.guidance.unet.cfg.cross_attention_dim
                V = len(self.view_prompt.texts)
                self.text_embeds = jax.random.normal(
                    self._next_key(), (V, 4, D)) * 0.02
                self.uncond_embeds = jnp.zeros((1, 4, D))
            self.neg_embeds = None
            if cfg.guide.sds_loss_type in ("csd", "nfsd"):
                D = self.guidance.unet.cfg.cross_attention_dim
                L = self.text_embeds.shape[1]
                self.neg_embeds = jax.random.normal(
                    self._next_key(), (1, L, D)) * 0.02
            self._cast_guidance_dtype()

        self._guidance_cast_done = True
        # keep natively-supported render sizes un-resized when requested
        # (reference: prepare_latents + input_interpolate, basic.py:354-383)
        self.guidance.input_interpolate = cfg.guide.input_interpolate
        from ..guidance.sds import build_pixel_grad_hook

        # RGB pixel-gradient hook (PGC / clip / norm) applied to the
        # rendered image inside the step (reference: basic.py:795-817)
        self.pgc = build_pixel_grad_hook(cfg.guide)
        self.t_scheduler = TimePrioritizedScheduler(
            cfg.guide, schedule=self.guidance.schedule,
            seed=cfg.optim.seed)
        self.guidance.schedule = self.t_scheduler.schedule

        vae_factor = 2 ** (len(self.guidance.vae.cfg.block_out_channels) - 1)
        self.cond_size = self.guidance.latent_size * vae_factor

    def _cast_guidance_dtype(self):
        """Frozen guidance weights in the configured compute dtype
        (cfg.guide.dtype, default bf16 — the TPU analog of the reference's
        fp16 diffusion, configs/__init__.py fp16; ~2x UNet throughput and
        half the HBM footprint)."""
        dt = {"bf16": jnp.bfloat16, "fp16": jnp.bfloat16,
              "fp32": jnp.float32, "f32": jnp.float32}.get(
            self.cfg.guide.dtype, jnp.bfloat16)
        if dt == jnp.float32:
            return

        def cast(x):
            return x.astype(dt) if hasattr(x, "dtype") \
                and x.dtype == jnp.float32 else x

        self.guidance_params = jax.tree_util.tree_map(cast, self.guidance_params)
        self.text_embeds = self.text_embeds.astype(dt)
        self.uncond_embeds = self.uncond_embeds.astype(dt)
        if getattr(self, "neg_embeds", None) is not None:
            self.neg_embeds = self.neg_embeds.astype(dt)
        if getattr(self.guidance, "pooled_text", None) is not None:
            self.guidance.pooled_text = self.guidance.pooled_text.astype(dt)
            self.guidance.pooled_uncond = \
                self.guidance.pooled_uncond.astype(dt)

    def _init_cameras(self):
        """(reference: init_dataloaders, trainer.py:607-631 +
        DataLoaderManager progressive resolution, data/iterator.py:8-109)"""
        cfg = self.cfg
        if isinstance(cfg.data.train_w, str):
            self.train_resolutions = [int(x) for x in
                                      str(cfg.data.train_w).split(",")]
        else:
            self.train_resolutions = [int(cfg.data.train_w)]
        if not cfg.data.progressive_grid:
            # single-resolution training (reference: progressive_grid off)
            self.train_resolutions = self.train_resolutions[-1:]
        if cfg.data.grid_milestone:
            self.grid_milestones = list(cfg.data.grid_milestone)
        else:  # equal splits of the training run (reference default)
            n = len(self.train_resolutions)
            self.grid_milestones = [i / n for i in range(1, n)]
        self._res_index = 0
        train_res = self.train_resolutions[0]
        self.train_res = train_res
        self.train_camera = RandomCamera4Avatar(
            cfg.data, train_res, train_res, seed=cfg.optim.seed)
        self.eval_camera = CyclicalCamera4Avatar(
            cfg.data, cfg.data.eval_h, cfg.data.eval_w)
        self.test_camera = CyclicalCamera4Avatar(
            cfg.data, cfg.data.test_h, cfg.data.test_w)
        # keypoint-derived body-part camera offsets from the canonical body
        kp = np.asarray(openpose_keypoints(
            self.smpl, self.prompt.canonical_outputs,
            self.prompt.condition.landmarks))
        if np.isfinite(kp[:, :18]).all():
            self.train_camera.setup_camera_offset(kp)
            self.eval_camera.setup_camera_offset(kp)
            self.test_camera.setup_camera_offset(kp)

    def _init_nerf(self):
        """(reference: init_nerf_model path, trainer.py:498-512)"""
        cfg = self.cfg
        self.nerf = build_nerf(
            cfg.nerf,
            with_background=cfg.nerf.bg_mode == 'nerf'
            or cfg.nerf.bg_radius > 0)
        ac = np.asarray(self.guidance.schedule.alphas_cumprod)
        tx = build_nerf_optimizer(cfg.nerf, self.max_iteration,
                                  alphas_cumprod=ac)
        self.tx = tx
        # 'ddpm' lr_policy: per-timestep update weights applied inside the
        # SDS step (reference: TimePrioritizedLR, time_prior.py:394-431)
        self._tp_lr_weights = None
        if cfg.nerf.lr_policy == "ddpm":
            from ..guidance.time_prior import TimePrioritizedLR

            self._tp_lr_weights = jnp.asarray(
                TimePrioritizedLR(self.guidance.schedule).weights,
                jnp.float32)
        self.state = nerf_trainer.init_train_state(
            self.nerf, tx, self._next_key())
        if cfg.optim.ckpt:
            # model-only warm start (reference: 'ckpt' load, trainer.py:223)
            step_dir = resolve_ckpt_path(cfg.optim.ckpt)
            if step_dir is not None:
                template = {"params": self.state.params,
                            "opt_state": self.state.opt_state,
                            "step": np.asarray(0)}
                restored = load_pytree(step_dir, target=template)
                self.state = self.state._replace(
                    params=jax.tree_util.tree_map(
                        jnp.asarray, restored["params"]))
                logger.info("warm-started NeRF from %s", step_dir)
        self.grid = init_occupancy(cfg.nerf.grid_size)
        self.dmtet_model = None
        if cfg.nerf.dmtet:
            # DMTet finetune (reference: run_dmtet + init_tet,
            # nerf_renderer.py:475-646): seed SDF/deform from the
            # (warm-started) stage-1 field, train surface + field by SDS
            from . import dmtet_trainer

            assert cfg.optim.batch_size == 1 and cfg.parallel.tp <= 1, \
                "--nerf.dmtet runs single-view (batch_size=1, no TP)"
            self.dmtet_model, dparams, self._tet_edges = \
                dmtet_trainer.init_dmtet(
                    self.nerf, self.state.params,
                    int(cfg.nerf.tet_grid_size),
                    density_thresh=cfg.nerf.density_thresh)
            self._tx_dmtet = dmtet_trainer.build_dmtet_optimizer(
                cfg.nerf, self.max_iteration)
            self.state = dmtet_trainer.init_train_state(
                self.state.params, dparams, tx, self._tx_dmtet)
            logger.info("DMTet finetune: %d tets in the surface band "
                        "(grid %d)", self.dmtet_model.tets.shape[0],
                        cfg.nerf.tet_grid_size)
        H = self.train_res
        self.pretrain_step_fn = nerf_trainer.make_pretrain_step(
            self.nerf, tx, H, H, num_steps=cfg.nerf.num_steps,
            compact_steps=cfg.nerf.compact_steps)
        if (cfg.optim.batch_size > 1 or cfg.parallel.tp > 1) \
                and self.dmtet_model is None:
            # stage-1 data parallelism: one view per chip (VERDICT r2 #1 —
            # the reference is single-GPU B=1; SDS view-gradient averaging
            # makes the B-view step B reference steps averaged)
            self.mesh, self._gshard, self.guidance_params = \
                _train_mesh_and_gshard(cfg, cfg.optim.batch_size,
                                       self.guidance_params)
        else:
            self.mesh = None
            self._gshard = None
        self._build_nerf_sds_step(H)
        if self.dmtet_model is not None:
            from . import dmtet_trainer

            self.eval_render = dmtet_trainer.make_dmtet_eval_render(
                self.nerf, self.dmtet_model, self.cfg.data.eval_h,
                self.cfg.data.eval_w, tile_size=cfg.render.tile_size,
                capacity=cfg.render.tile_capacity, chunk=cfg.render.chunk)
        else:
            self.eval_render = nerf_trainer.make_eval_render(
                self.nerf, self.cfg.data.eval_h, self.cfg.data.eval_w)

    def _build_nerf_sds_step(self, H: int):
        cfg = self.cfg
        if getattr(self, "dmtet_model", None) is not None:
            from . import dmtet_trainer

            self.sds_step_fn = dmtet_trainer.make_dmtet_sds_step(
                self.nerf, self.dmtet_model, self._tet_edges, self.guidance,
                self.tx, self._tx_dmtet, H, H, cfg.nerf,
                lambda_guidance=cfg.guide.lambda_guidance,
                neg_embeds=self.neg_embeds, pgc=self.pgc,
                tile_size=cfg.render.tile_size,
                capacity=cfg.render.tile_capacity, chunk=cfg.render.chunk)
            return
        common = dict(
            num_steps=cfg.nerf.num_steps,
            lambda_guidance=cfg.guide.lambda_guidance,
            lambda_sigma=cfg.lambda_sigma_sigma,
            sigma_peak=cfg.sigma_guidance_peak,
            sigma_loss_type=cfg.sigma_loss_type,
            max_iteration=self.max_iteration,
            bg_mode="nerf" if cfg.nerf.bg_mode == "nerf" else "color",
            ray_chunk=cfg.nerf.max_ray_batch,
            neg_embeds=self.neg_embeds, pgc=self.pgc,
            tp_lr_weights=getattr(self, "_tp_lr_weights", None))
        if getattr(self, "mesh", None) is not None and cfg.stage == "nerf":
            from ..parallel.dp import make_nerf_sds_step_dp

            self.sds_step_fn = make_nerf_sds_step_dp(
                self.nerf, self.guidance, self.tx, self.mesh, H, H,
                cfg.nerf, gparams_shardings=getattr(self, "_gshard", None),
                **common)
        else:
            self.sds_step_fn = nerf_trainer.make_nerf_sds_step(
                self.nerf, self.guidance, self.tx, H, H, cfg.nerf, **common)

    def _build_avatar_model(self):
        from ..human.deform import DeformNetwork
        from ..nerf.network import SigmaMLP
        from ..system import avatar as A

        cfg = self.cfg
        # stage-2 decodes colors/opacities through the SAME field layout as
        # stage 1 (single source of truth: encoder.enc_cfg_from_nerf) — with
        # backbone=triplane the avatar decode runs on 12 bilinear plane rows
        # per point instead of 8 x num_levels hash rows (PERF.md)
        from ..nerf.encoder import enc_cfg_from_nerf

        enc_cfg = enc_cfg_from_nerf(cfg.nerf)

        # gs_type dispatch (reference: build_avatar, avatar.py:1643-1712):
        # 'dreamwaltz-g' = hybrid w/ mesh parts + deform net; 'hash' = the
        # pose-independent scale/quat MLP variant, no mesh binding
        gs_type = cfg.render.gs_type
        hash_mode = gs_type == "hash"

        mesh_parts = {}
        if hash_mode:
            pass  # HashAvatar has no mesh-bound parts (avatar.py:411-492)
        # hands/face submesh binding requires the semantic tables of the real
        # SMPL-X; for the synthetic debug body bind the top of the chain
        elif self.smpl.num_vertices < 1000:
            faces = self.smpl.faces
            v = np.asarray(self.smpl.v_template)
            top = np.argsort(-v[faces].mean(1)[:, 1])[:10]
            vids = np.unique(faces[top].reshape(-1))
            mesh_parts["face"] = A.make_mesh_binding_static(
                faces, vids, top, n_per_triangle=cfg.render.n_gaussians_per_triangle)
        else:
            from ..human.semantics import get_semantic_parts

            for name in self.cfg.predefined_body_parts.split(","):
                part = get_semantic_parts(self.smpl, name)
                if part is not None:
                    vids, fids = part
                    mesh_parts[name] = A.make_mesh_binding_static(
                        self.smpl.faces, vids, fids,
                        n_per_triangle=cfg.render.n_gaussians_per_triangle)

        out_ch = 1 + (4 if cfg.nerf.nerf_type == "latent" else 3)
        if hash_mode:
            sq_net = SigmaMLP(hidden=64, num_layers=3, out_channels=7)
        else:
            # use_nerf_encoded_position=False feeds detached raw positions,
            # frequency-encoded inside the net (reference: DeformNetwork
            # (xyz_input_ch=None), avatar.py:1171-1174)
            sq_net = DeformNetwork(
                xyz_input_ch=enc_cfg.output_dim
                if cfg.render.use_nerf_encoded_position else None)
        r = cfg.render
        assert not (r.use_joint_shape_offsets and r.use_vertex_shape_offsets), \
            "joint and vertex shape offsets are mutually exclusive " \
            "(reference: avatar.py:1132)"
        deform_learn = tuple(
            k for k in ("v_template", "shapedirs", "posedirs", "expr_dirs",
                        "lbs_weights", "J_regressor")
            if getattr(r, f"deform_learn_{k}"))
        return A.AvatarModel(
            smpl=self.smpl,
            canonical_inputs=self.prompt.canonical_inputs,
            enc_cfg=enc_cfg,
            nerf_bound=cfg.nerf.bound,
            color_mlp=SigmaMLP(hidden=64, num_layers=3, out_channels=out_ch),
            sq_net=sq_net,
            hash_mode=hash_mode,
            mesh_parts=mesh_parts,
            init_scale=cfg.render.init_scale,
            max_scale=cfg.render.max_scale,
            init_offset=cfg.render.init_offset,
            use_non_rigid_offsets=cfg.render.use_non_rigid_offsets,
            use_non_rigid_scales=cfg.render.use_non_rigid_scales,
            use_non_rigid_rotations=cfg.render.use_non_rigid_rotations,
            use_joint_shape_offsets=r.use_joint_shape_offsets,
            use_vertex_shape_offsets=r.use_vertex_shape_offsets,
            use_vertex_pose_offsets=r.use_vertex_pose_offsets,
            non_rigid_rotation_mode=r.non_rigid_rotation_mode,
            deform_with_shape=r.deform_with_shape,
            deform_rotation_mode=r.deform_rotation_mode,
            use_nerf_encoded_position=r.use_nerf_encoded_position,
            deform_learn=deform_learn,
            learn_hand_betas=cfg.render.learn_hand_betas,
            learn_face_betas=cfg.render.learn_face_betas,
            use_zero_scales=cfg.render.use_zero_scales,
            use_constant_colors=cfg.render.use_constant_colors,
            use_constant_opacities=cfg.render.use_constant_opacities,
            use_fixed_n_gaussians=cfg.render.use_fixed_n_gaussians,
            render_only="mesh"
            if cfg.render.render_mesh_binding_3d_gaussians_only
            else "unconstrained"
            if cfg.render.render_unconstrained_3d_gaussians_only else "all",
        )

    def _seed_cloud(self):
        """Mesh-based gaussian seeding when no stage-1 NeRF cloud exists
        (reference: initialize_positions/colors/scales,
        core/system/avatar.py:65-222 — the gaussian_point_init /
        gaussian_color_init / gaussian_scale_init knobs).

        Returns (cloud (N, 3), colors (N, 3), scales (N, 3) linear or
        None when gaussian_scale_init='default')."""
        from ..gaussian.seed import (
            seed_colors,
            seed_positions,
            seed_scales_radius,
        )

        r = self.cfg.render
        verts = jnp.asarray(self.prompt.canonical_outputs.vertices[0])
        faces = jnp.asarray(self.smpl.faces)
        cloud = seed_positions(
            r.gaussian_point_init, self._next_key(), verts, faces,
            r.n_gaussians, r.n_gaussians_per_vertex)
        colors = seed_colors(r.gaussian_color_init, self._next_key(),
                             cloud, verts, faces)
        scales = None
        if r.gaussian_scale_init == "radius":
            scales = seed_scales_radius(cloud, verts,
                                        r.init_scale_radius_rate)
        logger.info(
            "seeded %d gaussians from the SMPL-X mesh (point_init=%s, "
            "color_init=%s, scale_init=%s)", cloud.shape[0],
            r.gaussian_point_init, r.gaussian_color_init,
            r.gaussian_scale_init)
        return cloud, colors, scales

    def _init_vanilla_avatar(self):
        """gs_type='vanilla': plain learnable 3DGS rigged by LBS
        (reference: VanillaAvatar, avatar.py:334-407 + build_gaussian_avatar
        dispatch, 1687-1689)."""
        from ..system.vanilla import VanillaAvatarModel, init_vanilla_avatar
        from .optim import build_gaussian_optimizer

        cfg = self.cfg
        self._nerf_guidance = None
        self.avatar_model = VanillaAvatarModel(
            smpl=self.smpl,
            canonical_inputs=self.prompt.canonical_inputs,
            max_scale=cfg.render.max_scale)

        colors = None
        nerf_step_dir = resolve_ckpt_path(cfg.render.from_nerf) \
            if cfg.render.from_nerf else None
        if nerf_step_dir is not None:
            nerf = build_nerf(
                cfg.nerf,
                with_background=cfg.nerf.bg_mode == 'nerf'
                or cfg.nerf.bg_radius > 0)
            nerf_tx = build_nerf_optimizer(cfg.nerf, 1)
            tmpl = nerf_trainer.init_train_state(nerf, nerf_tx,
                                                 jax.random.PRNGKey(0))
            raw = load_pytree(nerf_step_dir,
                              target={"params": tmpl.params,
                                      "opt_state": tmpl.opt_state,
                                      "step": np.asarray(0)})
            nerf_params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
            from ..nerf.export import export_point_cloud

            pc = export_point_cloud(nerf, nerf_params,
                                    resolution=cfg.render.nerf_resolution,
                                    density_thresh=cfg.nerf.density_thresh,
                                    max_points=cfg.render.n_gaussians,
                                    min_neighbors=cfg.nerf.export_min_neighbors)
            if cfg.render.nerf_exclusion_bboxes is not None:
                import ast

                from ..nerf.export import remove_points_inside_bboxes
                pc = remove_points_inside_bboxes(
                    pc, ast.literal_eval(cfg.render.nerf_exclusion_bboxes))
            cloud = jnp.asarray(pc.points)
            colors = jnp.asarray(pc.colors) if pc.colors is not None else None
            seed_scales = None
        else:
            # no stage-1 checkpoint: seed from the SMPL-X mesh (reference:
            # initialize_positions/colors/scales, avatar.py:65-222)
            cloud, colors, seed_scales = self._seed_cloud()

        capacity = min(cfg.render.n_gaussians,
                       max(2 * cloud.shape[0], cloud.shape[0] + 1024))
        vstate = init_vanilla_avatar(
            self.avatar_model, cloud, colors=colors, capacity=capacity,
            sh_levels=cfg.render.sh_levels,
            init_scale=seed_scales if seed_scales is not None
            else cfg.render.init_scale,
            init_opacity=cfg.render.init_opacity,
            lbs_weight_smooth=cfg.render.lbs_weight_smooth,
            lbs_weight_smooth_K=cfg.render.lbs_weight_smooth_K,
            lbs_weight_smooth_N=cfg.render.lbs_weight_smooth_N)

        spatial = cfg.render.spatial_scale or 1.0
        tx = build_gaussian_optimizer(cfg.render, self.max_iteration,
                                      spatial_scale=spatial)
        self.tx = tx
        self.state = gs_trainer.VanillaTrainState(
            vstate, tx.init(vstate.gaussians.params),
            jnp.zeros((), jnp.int32))

        if cfg.optim.ckpt:
            step_dir = resolve_ckpt_path(cfg.optim.ckpt)
            if step_dir is not None:
                template = {"params": self.state.avatar,
                            "opt_state": self.state.opt_state,
                            "step": np.asarray(0)}
                restored = load_pytree(step_dir, target=template)
                self.state = self.state._replace(
                    avatar=jax.tree_util.tree_map(
                        jnp.asarray, restored["params"]))
                logger.info("warm-started vanilla avatar from %s", step_dir)

        H = self.train_res
        rk = dict(tile_size=cfg.render.tile_size,
                  capacity=cfg.render.tile_capacity, chunk=cfg.render.chunk)
        self.mesh = None
        if cfg.optim.batch_size > 1 or cfg.parallel.tp > 1:
            # vanilla DP: one view per chip (VERDICT r2 #6 — batch_size
            # restriction lifted)
            from ..parallel.dp import make_vanilla_sds_step_dp

            self.mesh, self._gshard, self.guidance_params = \
                _train_mesh_and_gshard(cfg, cfg.optim.batch_size,
                                       self.guidance_params)
            self.sds_step_fn = make_vanilla_sds_step_dp(
                self.avatar_model, self.guidance, tx, self.mesh, H, H,
                per_view_poses=cfg.data.per_view_poses,
                gparams_shardings=self._gshard,
                **self._common_step_kwargs(), **rk)
        else:
            self.sds_step_fn = gs_trainer.make_vanilla_sds_step(
                self.avatar_model, self.guidance, tx, H, H,
                **self._common_step_kwargs(), **rk)
        self.nerf2gs_step_fn = None
        self.eval_render = gs_trainer.make_vanilla_render(
            self.avatar_model, cfg.data.eval_h, cfg.data.eval_w,
            placement=self._placement(),
            static_gaussians=self._static_bg_gaussians(), **rk)
        self.test_render = gs_trainer.make_vanilla_render(
            self.avatar_model, cfg.data.test_h, cfg.data.test_w,
            placement=self._placement(),
            static_gaussians=self._static_bg_gaussians(), **rk)
        self.densify_cfg = DensifyConfig(
            grad_threshold=cfg.render.densify_grad_threshold,
            spatial_scale=spatial,
            min_opacity=cfg.render.densify_min_opacity,
            enable_clone=not cfg.render.densify_disable_clone,
            enable_split=not cfg.render.densify_disable_split,
            enable_prune=not cfg.render.densify_disable_prune)
        self.densification_interval = cfg.render.densification_interval \
            or max(int(self.max_iteration * 100 / 15000), 1)
        # reference cadence 3000/15000 (gaussian_densifier.py:30-40)
        self.opacity_reset_interval = cfg.render.opacity_reset_interval \
            or max(int(self.max_iteration * 3000 / 15000), 1)

    def _init_avatar(self):
        """(reference: init_gaussian_model, trainer.py:528-576)"""
        from ..system import avatar as A

        cfg = self.cfg
        if cfg.render.gs_type == "vanilla":
            return self._init_vanilla_avatar()
        self.avatar_model = self._build_avatar_model()
        self._nerf_guidance = None

        nerf_params = None
        nerf_step_dir = resolve_ckpt_path(cfg.render.from_nerf) \
            if cfg.render.from_nerf else None
        if nerf_step_dir is not None:
            # stage-1 handoff: NeRF checkpoint -> point cloud + continued nets
            nerf = build_nerf(
                cfg.nerf,
                with_background=cfg.nerf.bg_mode == 'nerf'
                or cfg.nerf.bg_radius > 0)
            nerf_tx = build_nerf_optimizer(cfg.nerf, 1)
            tmpl_state = nerf_trainer.init_train_state(
                nerf, nerf_tx, jax.random.PRNGKey(0))
            template = {"params": tmpl_state.params,
                        "opt_state": tmpl_state.opt_state,
                        "step": np.asarray(0)}
            raw = load_pytree(nerf_step_dir, target=template)
            nerf_params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
            from ..nerf.export import export_point_cloud

            pc = export_point_cloud(nerf, nerf_params,
                                    resolution=cfg.render.nerf_resolution,
                                    density_thresh=cfg.nerf.density_thresh,
                                    max_points=cfg.render.n_gaussians,
                                    min_neighbors=cfg.nerf.export_min_neighbors)
            if cfg.render.nerf_exclusion_bboxes is not None:
                import ast

                from ..nerf.export import remove_points_inside_bboxes
                n0 = pc.points.shape[0]
                pc = remove_points_inside_bboxes(
                    pc, ast.literal_eval(cfg.render.nerf_exclusion_bboxes))
                logger.info("removed %d points inside exclusion bboxes "
                            "(reference: trainer.py:550-553)",
                            n0 - pc.points.shape[0])
            cloud = jnp.asarray(pc.points)
            logger.info("NeRF point cloud: %d points", cloud.shape[0])
            self._nerf_guidance = (nerf, nerf_params)  # frozen, for nerf2gs
            if cfg.render.reset_nerf:
                # fresh encoder/color nets; only the cloud carries over
                # (reference: reset_nerf, avatar.py init path)
                nerf_params = None
        forced_capacity = None
        if nerf_step_dir is None and cfg.optim.ckpt \
                and resolve_ckpt_path(cfg.optim.ckpt) is not None:
            # sub-stage handoff without from_nerf: size buffers exactly like
            # the checkpoint (its arrays overwrite everything learnable below)
            raw = load_pytree(resolve_ckpt_path(cfg.optim.ckpt))
            forced_capacity = np.asarray(
                raw["params"]["params"]["positions"]).shape[0]
            rng = np.random.default_rng(cfg.optim.seed)
            cloud = jnp.asarray(
                rng.normal(size=(forced_capacity, 3)) * 0.2, jnp.float32)
        elif nerf_step_dir is None:
            # no stage-1 checkpoint: seed from the SMPL-X mesh (reference:
            # initialize_positions/scales, avatar.py:65-115, 196-221;
            # colors come from the NeRF field in this gs_type)
            cloud, _, seed_scales = self._seed_cloud()

        if nerf_step_dir is not None or forced_capacity is not None:
            seed_scales = None
        capacity = forced_capacity or min(
            cfg.render.n_gaussians,
            max(2 * cloud.shape[0], cloud.shape[0] + 1024))
        avatar_state = A.init_avatar_state(
            self.avatar_model, cloud, self._next_key(), capacity=capacity,
            nerf_params=nerf_params,
            init_scales=seed_scales,
            prune_dists_close_to_mesh=cfg.render.prune_dists_close_to_mesh
            if cfg.render.prune_points_close_to_mesh
            and self.avatar_model.mesh_parts else None,
            lbs_weight_smooth=cfg.render.lbs_weight_smooth,
            lbs_weight_smooth_K=cfg.render.lbs_weight_smooth_K,
            lbs_weight_smooth_N=cfg.render.lbs_weight_smooth_N)

        spatial = cfg.render.spatial_scale or 1.0
        tx = build_avatar_optimizer(cfg.render, self.max_iteration,
                                    spatial_scale=spatial)
        self.tx = tx
        self.state = gs_trainer.init_avatar_train_state(avatar_state, tx)

        if cfg.optim.ckpt:
            # stage-2 sub-stage handoff: warm-start the avatar from a prior
            # gs checkpoint (reference: scripts/train_w_expr.sh:72-97 pass
            # --optim.ckpt between the cnl/rcnl/rand sub-stages; the
            # reference resizes tensors via reset_by_state_dict — our
            # capacities match by construction, shapes are static)
            step_dir = resolve_ckpt_path(cfg.optim.ckpt)
            if step_dir is not None:
                template = {"params": self.state.avatar,
                            "opt_state": self.state.opt_state,
                            "step": np.asarray(0)}
                try:
                    restored = load_pytree(step_dir, target=template)
                    self.state = self.state._replace(
                        avatar=jax.tree_util.tree_map(
                            jnp.asarray, restored["params"]))
                    logger.info("warm-started avatar from %s", step_dir)
                except Exception as e:
                    raise RuntimeError(
                        f"avatar checkpoint at {step_dir} does not match "
                        f"this configuration (capacity/mesh parts): {e}")

        H = self.train_res
        rk = dict(tile_size=cfg.render.tile_size,
                  capacity=cfg.render.tile_capacity, chunk=cfg.render.chunk)
        self.mesh = None
        # trainable MLP background: Adan group alongside the avatar
        # (reference: MLPBackground.get_optimizer, background.py:86-89 +
        # trainer.py:594-598)
        self.bg_state = None
        self.bg_net = None
        if cfg.render.use_mlp_background:
            from ..system.background import BackgroundMLPNet
            from .optim import adan

            self.bg_net = BackgroundMLPNet()
            self.bg_tx = adan(1e-3, eps=1e-8, weight_decay=2e-5,
                              max_grad_norm=5.0)
            bg_params = self.bg_net.init(self._next_key(), jnp.zeros((1, 3)))
            self.bg_state = (bg_params, self.bg_tx.init(bg_params))
        if cfg.optim.batch_size > 1 or cfg.parallel.tp > 1:
            # data-parallel SDS: one view per chip (SURVEY.md §7.10; no
            # reference counterpart — the reference is single-GPU B=1)
            from ..parallel.dp import make_avatar_sds_step_dp

            self.mesh, self._gshard, self.guidance_params = \
                _train_mesh_and_gshard(cfg, cfg.optim.batch_size,
                                       self.guidance_params)
            self.sds_step_fn = make_avatar_sds_step_dp(
                self.avatar_model, self.guidance, tx, self.mesh, H, H,
                per_view_poses=cfg.data.per_view_poses,
                bg_net=self.bg_net,
                bg_tx=getattr(self, "bg_tx", None),
                gparams_shardings=self._gshard,
                **self._common_step_kwargs(), **rk)
        elif not cfg.guide.sds_loss_type.startswith("x0") \
                and (self.bg_state is not None
                     or (jax.devices()[0].platform == "tpu"
                         and not cfg.optim.fused_step)):
            # three small XLA programs instead of one giant graph — the
            # remote-compiler fallback (--optim.fused_step false) and the
            # host of the trainable-background variant. The fused step
            # renders forward ONCE inside the grad graph and measured 16%
            # faster (PERF.md), so it is the default elsewhere. x0 denoise
            # modes are pixel-space losses (no latent SpecifyGradient) —
            # monolithic step only.
            self.sds_step_fn = gs_trainer.make_avatar_sds_step_split(
                self.avatar_model, self.guidance, tx, H, H,
                bg_net=self.bg_net,
                bg_tx=getattr(self, "bg_tx", None),
                **self._common_step_kwargs(), **rk)
        else:
            self.sds_step_fn = gs_trainer.make_avatar_sds_step(
                self.avatar_model, self.guidance, tx, H, H,
                **self._common_step_kwargs(), **rk)
        # scene composition: a second avatar from another run's checkpoint
        # (reference: ckpt_extra, trainer.py:273-278 + scene.py:213-222)
        self.extra_states = ()
        self.extra_models = ()
        if cfg.optim.ckpt_extra:
            step_dir = resolve_ckpt_path(cfg.optim.ckpt_extra)
            if step_dir is not None:
                raw = load_pytree(step_dir)
                cap2 = np.asarray(
                    raw["params"]["params"]["positions"]).shape[0]
                rng = np.random.default_rng(cfg.optim.seed + 7)
                cloud2 = jnp.asarray(
                    rng.normal(size=(cap2, 3)) * 0.2, jnp.float32)
                model2 = self._build_avatar_model()
                state2 = A.init_avatar_state(
                    model2, cloud2, self._next_key(), capacity=cap2,
                    prune_dists_close_to_mesh=None)
                template = {"params": state2,
                            "opt_state": tx.init(state2.params),
                            "step": np.asarray(0)}
                restored = load_pytree(step_dir, target=template)
                self.extra_states = (jax.tree_util.tree_map(
                    jnp.asarray, restored["params"]),)
                self.extra_models = (model2,)
                logger.info("loaded extra avatar from %s", step_dir)

        self.nerf2gs_step_fn = None
        self.eval_render = gs_trainer.make_avatar_render(
            self.avatar_model, cfg.data.eval_h, cfg.data.eval_w,
            extra_models=self.extra_models,
            placement=self._placement(),
            static_gaussians=self._static_bg_gaussians(), **rk)
        self.test_render = gs_trainer.make_avatar_render(
            self.avatar_model, cfg.data.test_h, cfg.data.test_w,
            extra_models=self.extra_models,
            placement=self._placement(),
            static_gaussians=self._static_bg_gaussians(), **rk)
        self.densify_cfg = DensifyConfig(
            grad_threshold=cfg.render.densify_grad_threshold,
            spatial_scale=spatial,
            min_opacity=cfg.render.densify_min_opacity,
            enable_clone=not cfg.render.densify_disable_clone,
            enable_split=not cfg.render.densify_disable_split,
            enable_prune=not cfg.render.densify_disable_prune)
        # schedule defaults scale from max_iteration like the reference's
        # 15k-iter baseline (gaussian_densifier.py:30-40)
        self.densification_interval = cfg.render.densification_interval \
            or max(int(self.max_iteration * 100 / 15000), 1)

    def check(self) -> None:
        """Pre-training sanity exports: condition images around the body and
        the timestep-annealing curve (reference: --log.check path,
        trainer.py:374-443 + draw_curves, time_prior.py:354-391)."""
        from ..guidance.time_prior import draw_curves

        d = self.exp_dir / "check"
        try:
            draw_curves(self.t_scheduler, self.max_iteration,
                        str(d / "timestep_curve.png"))
        except Exception as e:
            logger.warning("timestep curve export failed: %s", e)
        _, smpl_outputs = self.prompt()
        cond_arrays = {}
        for azim in (0.0, 90.0, 180.0, 270.0):
            cam = make_camera_batch(2.0, azim, 80.0, 60.0,
                                    self.cond_size, self.cond_size)
            for cond in self.cfg.guide.controlnet_condition:
                try:
                    img = self.prompt.get_cond_images(
                        smpl_outputs, cam.extrinsic[0], cam.intrinsics[0],
                        cond_type=cond, height=self.cond_size,
                        width=self.cond_size)[0]
                    if isinstance(img, tuple):
                        continue  # depth_raw returns arrays, skip
                    save_image(str(d / f"cond_{cond}_az{int(azim)}.png"), img)
                    # the SD sanity samples must pair the ControlNet with
                    # the modality training actually uses —
                    # controlnet_condition[0] (see _train_batch)
                    if cond == self.cfg.guide.controlnet_condition[0]:
                        cond_arrays[azim] = np.asarray(img, np.float32) / 255.0
                except Exception as e:
                    logger.warning("condition export %s failed: %s", cond, e)
        if self.cfg.log.check_sd:
            self._check_sd(d, cond_arrays)
        logger.info("sanity exports written to %s", d)

    def _check_sd(self, d: Path, cond_arrays: Dict[float, np.ndarray]):
        """Sample the frozen SD (+ControlNet) for the prompt BEFORE
        committing hours of training — the cheapest end-to-end guidance
        validation (reference: export_samples, trainer.py:386-443: sd
        samples at cfg 7.5 and the configured scale; with ControlNet, one
        sample per condition view)."""
        import functools

        steps = self.cfg.log.check_sd_steps
        sample = jax.jit(functools.partial(
            self.guidance.sample_images, num_inference_steps=steps))
        txt, unc = self.text_embeds[:1], self.uncond_embeds[:1]
        try:
            has_cn = self.guidance.controlnet is not None \
                and self.guidance_params.controlnet is not None
            if has_cn and cond_arrays:
                for azim, cond in cond_arrays.items():
                    img = sample(self.guidance_params, txt, unc,
                                 self._next_key(),
                                 cond_image=jnp.asarray(cond)[None])
                    save_image(str(d / f"control_az{int(azim)}.png"),
                               np.asarray(jnp.clip(img[0], 0, 1)))
            for gs_val in {7.5, float(self.cfg.guide.guidance_scale)}:
                img = sample(self.guidance_params, txt, unc,
                             self._next_key(),
                             guidance_scale=jnp.asarray(gs_val))
                save_image(str(d / f"sd_{gs_val:g}.png"),
                           np.asarray(jnp.clip(img[0], 0, 1)))
            logger.info("check_sd samples written to %s", d)
        except Exception as e:
            logger.warning("check_sd sampling failed: %s", e)

    # ------------------------------------------------------------------
    # data assembly (host side)
    # ------------------------------------------------------------------

    def _train_batch(self, step: Optional[int] = None) -> Dict[str, Any]:
        """One training draw: camera + pose + conditions + text
        (reference: CameraDatasetWithSMPL.collate, data/camera/__init__.py:127-163).

        ``step`` is the step the batch is INTENDED for — the prefetch worker
        builds step N+1's batch while the device runs step N, so reading
        ``self.train_step`` here would lag the timestep/CFG schedules and the
        random_pose_iter cadence one step behind the reference's semantics.
        """
        if step is None:
            step = self.train_step
        B = self.cfg.optim.batch_size
        frame_idx = None
        if self.prompt.scene_type == "motion":
            frame_idx = int(self._batch_rng.integers(0, self.prompt.num_frame))
        # random-pose caching: hold the sampled pose fixed for N consecutive
        # steps (reference: random_pose_iter, data/camera/__init__.py:66-163)
        rpi = self.cfg.data.random_pose_iter
        per_view = self.cfg.data.per_view_poses and B > 1 \
            and self.cfg.stage == "gs"
        if rpi and self.prompt.scene_type == "random" \
                and getattr(self, "_pose_cache", None) is not None \
                and step % rpi != 0:
            smpl_inputs, smpl_outputs, per_view_outputs = self._pose_cache
        elif per_view:
            # independent pose draw per DP view (parallel/dp.py
            # per_view_poses; no reference counterpart — single GPU B=1)
            draws = [self.prompt(frame_idx=frame_idx, batch_idx=step * B + i)
                     for i in range(B)]
            smpl_inputs = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *[d[0] for d in draws])
            # each view's ControlNet conditions must come from ITS pose
            # draw, or views 1..B-1 get conditioning that contradicts their
            # render (ADVICE r2 #3)
            per_view_outputs = [d[1] for d in draws]
            smpl_outputs = draws[0][1]
            self._pose_cache = (smpl_inputs, smpl_outputs, per_view_outputs)
        else:
            smpl_inputs, smpl_outputs = self.prompt(
                frame_idx=frame_idx, batch_idx=step)
            per_view_outputs = None
            self._pose_cache = (smpl_inputs, smpl_outputs, None)

        # --render.always_animate=false: in the plain canonical scene the
        # render observes the CANONICAL pose while conditions/text still
        # come from the sampled pose (reference: trainer.py:692-695 —
        # smpl_observed_inputs=None → animate falls back to canonical)
        render_inputs = smpl_inputs
        if self.cfg.stage == "gs" and not self.cfg.render.always_animate \
                and self.cfg.prompt.scene == "canonical":
            B_in = smpl_inputs.body_pose.shape[0]
            ci = self.prompt.canonical_inputs
            render_inputs = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    x, (B_in,) + x.shape[1:]).astype(x.dtype), ci)

        cams, parts, texts, uncs = [], [], [], []
        for i in range(B):
            cam, part = self.train_camera(1)
            cams.append(cam)
            parts.append(part)
            view_idx = int(self.view_prompt(
                np.asarray(cam.azimuth), np.asarray(cam.elevation), part)[0])
            texts.append(self.text_embeds[view_idx])
            uncs.append(self.uncond_embeds[0])

        cam = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0)
            if hasattr(xs[0], "ndim") and xs[0].ndim > 0 else xs[0], *cams)
        cond_image = None
        if self.cfg.guide.use_controlnet:
            # all B views' keypoint projection + occlusion ray-casts as ONE
            # device dispatch (VERDICT r4 #8; batched == per-view is
            # test-asserted in tests/test_condition.py)
            outs = per_view_outputs if per_view_outputs is not None \
                else [smpl_outputs] * B
            imgs = self.prompt.get_cond_images_batch(
                outs, cam.extrinsic, cam.intrinsics,
                cond_type=self.cfg.guide.controlnet_condition[0],
                height=self.cond_size, width=self.cond_size)
            cond_image = jnp.asarray(np.stack(
                [np.asarray(im, np.float32) / 255.0 for im in imgs]))
        if self.cfg.guide.sds_loss_type == "ism":
            # ISM draws from its own expanded warmup window, not the
            # DreamTime prior (reference: ism(), basic.py:722-742)
            t = jnp.asarray(self.t_scheduler.get_ism_timestep(
                B, step, self.max_iteration))
        else:
            t = jnp.asarray(self.t_scheduler.get_timestep(
                B, step, self.max_iteration))
        # as device scalars: a changing python float would re-specialize
        # the jitted step every iteration under non-constant schedules
        gs_scale = jnp.asarray(self.t_scheduler.get_guidance_scale(
            step, self.max_iteration), jnp.float32)
        progress = jnp.asarray(step / max(self.max_iteration, 1), jnp.float32)
        return dict(cam=cam, part=parts[0], smpl_inputs=render_inputs,
                    cond_image=cond_image,
                    text=jnp.stack(texts), uncond=jnp.stack(uncs),
                    t=t, guidance_scale=gs_scale, progress=progress)

    def _resolution_target(self) -> int:
        ratio = self.train_step / self.max_iteration
        target = 0
        for m in self.grid_milestones:
            if ratio >= m:
                target += 1
        return min(target, len(self.train_resolutions) - 1)

    def _maybe_switch_resolution(self) -> bool:
        """Progressive 64->128->256 training resolution
        (reference: DataLoaderManager.__call__, data/iterator.py:60-109).
        Returns True when the resolution changed (prefetched batches from
        the old resolution must be discarded)."""
        ratio = self.train_step / self.max_iteration
        target = self._resolution_target()
        if target != self._res_index:
            self._res_index = target
            self.train_res = self.train_resolutions[target]
            logger.info("switching train resolution to %d", self.train_res)
            seed = self.cfg.optim.seed + target
            self.train_camera = RandomCamera4Avatar(
                self.cfg.data, self.train_res, self.train_res, seed=seed)
            self.train_camera.training_ratio = ratio
            kp = np.asarray(openpose_keypoints(
                self.smpl, self.prompt.canonical_outputs,
                self.prompt.condition.landmarks))
            if np.isfinite(kp[:, :18]).all():
                self.train_camera.setup_camera_offset(kp)
            self._rebuild_train_step()
            return True
        return False

    def _rebuild_train_step(self):
        cfg = self.cfg
        H = self.train_res
        if cfg.stage == "nerf":
            self.pretrain_step_fn = nerf_trainer.make_pretrain_step(
                self.nerf, self.tx, H, H, num_steps=cfg.nerf.num_steps,
                compact_steps=cfg.nerf.compact_steps)
            self._build_nerf_sds_step(H)
        else:
            rk = dict(tile_size=cfg.render.tile_size,
                      capacity=cfg.render.tile_capacity,
                      chunk=cfg.render.chunk)
            if cfg.render.gs_type == "vanilla":
                if self.mesh is not None:
                    from ..parallel.dp import make_vanilla_sds_step_dp

                    self.sds_step_fn = make_vanilla_sds_step_dp(
                        self.avatar_model, self.guidance, self.tx,
                        self.mesh, H, H,
                        per_view_poses=cfg.data.per_view_poses,
                        gparams_shardings=getattr(self, "_gshard", None),
                        **self._common_step_kwargs(), **rk)
                else:
                    self.sds_step_fn = gs_trainer.make_vanilla_sds_step(
                        self.avatar_model, self.guidance, self.tx, H, H,
                        **self._common_step_kwargs(), **rk)
            elif self.mesh is not None:
                from ..parallel.dp import make_avatar_sds_step_dp

                self.sds_step_fn = make_avatar_sds_step_dp(
                    self.avatar_model, self.guidance, self.tx, self.mesh,
                    H, H, per_view_poses=cfg.data.per_view_poses,
                    bg_net=self.bg_net,
                    bg_tx=getattr(self, "bg_tx", None),
                    gparams_shardings=getattr(self, "_gshard", None),
                    **self._common_step_kwargs(), **rk)
            elif not cfg.guide.sds_loss_type.startswith("x0") \
                    and (getattr(self, "bg_state", None) is not None
                         or (jax.devices()[0].platform == "tpu"
                             and not cfg.optim.fused_step)):
                self.sds_step_fn = gs_trainer.make_avatar_sds_step_split(
                    self.avatar_model, self.guidance, self.tx, H, H,
                    bg_net=self.bg_net,
                    bg_tx=getattr(self, "bg_tx", None),
                    **self._common_step_kwargs(), **rk)
            else:
                self.sds_step_fn = gs_trainer.make_avatar_sds_step(
                    self.avatar_model, self.guidance, self.tx, H, H,
                    **self._common_step_kwargs(), **rk)

    def _bg_color(self) -> jnp.ndarray:
        if self.cfg.stage == "nerf":
            from ..system.background import COLOR_PRESETS

            c = COLOR_PRESETS.get(self.cfg.nerf.bg_mode, (0.5, 0.5, 0.5))
            if self.cfg.nerf.rand_bg_prob \
                    and self.rng.random() < self.cfg.nerf.rand_bg_prob:
                c = tuple(self.rng.random(3))
        else:
            c = tuple(self.cfg.render.bg_color)
        return jnp.asarray(c, jnp.float32)

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def train(self) -> None:
        """Crash-safe wrapper: a runtime failure saves an emergency
        checkpoint and renders the eval track before re-raising
        (reference: train's RuntimeError handler, trainer.py:839, 919-923)."""
        try:
            self._train_loop()
        except (RuntimeError, jax.errors.JaxRuntimeError):
            logger.exception("training crashed at step %d — saving "
                             "emergency checkpoint", self.train_step)
            self.save_checkpoint()
            try:
                self.evaluate()
            finally:
                raise

    def _train_loop(self) -> None:
        """(reference: Trainer.train, trainer.py:826-931)

        Host/device overlap: the next step's batch (pose draw + cv2
        condition rendering + camera sampling — all host work) is prepared
        on a worker thread while the current device step executes (the TPU
        analog of the reference's CUDA-prefetch DataIterator,
        data/iterator.py:30-58)."""
        import concurrent.futures as cf

        cfg = self.cfg
        log_interval = max(cfg.log.snapshot_interval, 1)
        t0 = time.time()
        pool = cf.ThreadPoolExecutor(max_workers=1)
        pending = None
        try:
            while self.train_step < self.max_iteration:
                self.train_step += 1
                if pending is not None and self._will_mutate_shared_state():
                    # evaluate/_snapshot (in _maybe_switch_resolution's
                    # rebuild too) mutate self.prompt/self.train_camera;
                    # drain the worker before touching them
                    pending.result()
                    pending = None
                self.prompt.training_ratio = \
                    self.train_step / self.max_iteration
                self.train_camera.training_ratio = self.prompt.training_ratio
                switched = self._maybe_switch_resolution()
                if pending is not None and not switched:
                    batch = pending.result()
                else:
                    if pending is not None:
                        # stale future from the old resolution: wait for it
                        # to stop mutating _pose_cache before re-entering
                        pending.result()
                    batch = self._train_batch(self.train_step)
                pending = None
                # prefetch the NEXT step's batch while the device runs this
                # one — unless this step's post-step work (eval/snapshot)
                # will mutate the prompt/camera state the worker reads
                if self.train_step < self.max_iteration \
                        and not self._post_step_mutates(self.train_step):
                    pending = pool.submit(self._train_batch,
                                          self.train_step + 1)
                metrics = self._train_one(batch)
                self._post_step(batch, metrics, log_interval, t0)
                if pending is None and self.train_step < self.max_iteration:
                    pending = pool.submit(self._train_batch,
                                          self.train_step + 1)
            self.save_checkpoint()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    def _post_step_mutates(self, step: int) -> bool:
        """Whether _post_step at ``step`` will run eval/snapshot (which use
        self.prompt / cameras and must not race the prefetch worker)."""
        cfg = self.cfg
        return bool(
            (cfg.log.snapshot_interval
             and step % cfg.log.snapshot_interval == 0)
            or (cfg.log.evaluate_interval
                and step % cfg.log.evaluate_interval == 0))

    def _will_mutate_shared_state(self) -> bool:
        # resolution switches rebuild self.train_camera mid-flight
        return self._resolution_target() != self._res_index

    def _post_step(self, batch, metrics, log_interval, t0) -> None:
        cfg = self.cfg
        if self.train_step % log_interval == 0 or self.train_step == 1:
            # only sync with the device on log steps — JAX async dispatch
            # overlaps the next host-side batch prep with this step
            loss = float(metrics.get("loss", np.nan))
            ovf = metrics.get("tile_overflow")
            logger.info("step %d/%d loss=%.4f (%.2f s/it)%s",
                        self.train_step, self.max_iteration, loss,
                        (time.time() - t0) / self.train_step,
                        "" if ovf is None
                        else " tile_overflow=%.4f" % float(ovf))
        if cfg.log.snapshot_interval and \
                self.train_step % cfg.log.snapshot_interval == 0:
            self._snapshot(batch)
        if cfg.log.evaluate_interval and \
                self.train_step % cfg.log.evaluate_interval == 0:
            self.evaluate()
        if cfg.log.save_interval and \
                self.train_step % cfg.log.save_interval == 0:
            self.save_checkpoint()

    def _snapshot(self, batch) -> None:
        """Dump the current train view + condition image
        (reference: _Visualizer.snapshot, trainer.py:139-169)."""
        d = self.exp_dir / "snapshots" / "train"
        cam = self.eval_camera(0.0)  # fixed front view at eval resolution
        try:
            if self.cfg.stage == "gs":
                img, _, _ = self.eval_render(
                    self.state.avatar, batch["smpl_inputs"],
                    cam.extrinsic[0], cam.intrinsics[0], cam.tanfov[0],
                    jnp.zeros((self.cfg.data.eval_h, self.cfg.data.eval_w, 3)),
                    self.extra_states)
            elif self.dmtet_model is not None:
                img, _, _ = self.eval_render(
                    self.state, cam.c2w[0], cam.intrinsics[0],
                    jnp.asarray([0.5, 0.5, 0.5]))
            else:
                img, _, _ = self.eval_render(
                    self.state.params, self.grid, cam.c2w[0],
                    cam.intrinsics[0], jnp.asarray([0.5, 0.5, 0.5]))
            save_image(str(d / f"{self.train_step:06d}_rgb.png"),
                       np.asarray(jnp.clip(img, 0, 1)))
            if batch.get("cond_image") is not None:
                save_image(str(d / f"{self.train_step:06d}_cond.png"),
                           np.asarray(batch["cond_image"][0]))
            if self.cfg.guide.grad_viz:
                self._snapshot_grad_viz(d, batch, img)
        except Exception as e:  # snapshots must never kill training
            logger.warning("snapshot failed: %s", e)

    def _snapshot_grad_viz(self, d, batch, img) -> None:
        """Decode + dump the latent SDS gradient at snapshot steps
        (reference: --guide.grad_viz, trainer.py:956 + the _Visualizer
        VAE-decode of gradients/denoised latents, trainer.py:34-169):
        the per-pixel gradient magnitude and the VAE decode of the
        gradient-descended latents (the direction SDS pulls toward)."""
        g = self.guidance
        if img.shape[-1] != 3:
            return  # latent-NeRF snapshots have no RGB grad to decode
        latents = g.encode_images(self.guidance_params, img[None])
        grad = g.latent_gradients(
            self.guidance_params, latents, batch["text"][:1],
            batch["uncond"][:1], batch["t"][:1], self._next_key(),
            cond_image=batch.get("cond_image"),
            neg_embeds=self.neg_embeds,
            guidance_scale=batch.get("guidance_scale"),
            progress=batch.get("progress"))
        mag = jnp.linalg.norm(grad[0], axis=-1)
        mag = mag / jnp.maximum(jnp.max(mag), 1e-8)
        save_image(str(d / f"{self.train_step:06d}_gradmag.png"),
                   np.asarray(mag))
        target = g.vae.decode(self.guidance_params.vae,
                              (latents - grad).astype(jnp.float32))
        save_image(str(d / f"{self.train_step:06d}_gradtarget.png"),
                   np.asarray(jnp.clip(target[0], 0, 1)))

    def _train_one(self, batch) -> Dict[str, float]:
        cfg = self.cfg
        cam: CameraBatch = batch["cam"]
        if cfg.stage == "nerf" and self.dmtet_model is not None:
            # DMTet finetune step (no occupancy grid / sigma guidance —
            # the surface IS the density structure now)
            campos = cam.c2w[0][:3, 3]
            self.state, metrics = self.sds_step_fn(
                self.state, self.guidance_params, cam.extrinsic[0],
                cam.intrinsics[0], campos, self._bg_color(),
                batch["text"], batch["uncond"], batch["t"],
                self._next_key(),
                cond_image=batch["cond_image"],
                guidance_scale=batch["guidance_scale"],
                progress=batch["progress"])
            return metrics
        if cfg.stage == "nerf":
            self.grid = nerf_trainer.maybe_update_occupancy(
                self.state, self.grid, self.nerf, self._next_key(),
                interval=cfg.nerf.update_extra_interval,
                density_thresh=cfg.nerf.density_thresh)
            sigma_pts = None
            use_sigma = cfg.use_sigma_guidance \
                and self.rng.random() < cfg.sigma_prob
            if use_sigma:
                verts = self.prompt.canonical_outputs.vertices[0]
                sigma_pts = make_sigma_guidance_points(
                    self._next_key(), verts, jnp.asarray(self.smpl.faces),
                    num_points=cfg.sigma_num_points,
                    noise_range=cfg.sigma_noise_range,
                    surface_thickness=cfg.sigma_surface_thickness)
            if self.mesh is not None:
                # stage-1 DP: one view per chip (parallel/dp.py
                # make_nerf_sds_step_dp)
                B = cam.c2w.shape[0]
                bg = jnp.stack([self._bg_color() for _ in range(B)])
                keys = jax.random.split(self._next_key(), B)
                with self.mesh:
                    self.state, metrics = self.sds_step_fn(
                        self.state, self.grid, self.guidance_params,
                        cam.c2w, cam.intrinsics, bg,
                        batch["text"], batch["uncond"], batch["t"], keys,
                        cond_image=batch["cond_image"],
                        guidance_scale=batch["guidance_scale"],
                        progress=batch["progress"],
                        sigma_pts=sigma_pts, use_sigma=use_sigma)
            else:
                self.state, metrics = self.sds_step_fn(
                    self.state, self.grid, self.guidance_params,
                    cam.c2w[0], cam.intrinsics[0], self._bg_color(),
                    batch["text"], batch["uncond"], batch["t"],
                    self._next_key(),
                    cond_image=batch["cond_image"],
                    guidance_scale=batch["guidance_scale"],
                    progress=batch["progress"],
                    sigma_pts=sigma_pts, use_sigma=use_sigma)
        elif self.mesh is not None:
            B = cam.extrinsic.shape[0]
            bg = jnp.broadcast_to(self._bg_color(),
                                  (B, self.train_res, self.train_res, 3))
            keys = jax.random.split(self._next_key(), B)
            with self.mesh:
                if self.bg_state is not None \
                        and cfg.render.gs_type != "vanilla":
                    self.state, self.bg_state, metrics = self.sds_step_fn(
                        self.state, self.guidance_params,
                        batch["smpl_inputs"],
                        cam.extrinsic, cam.intrinsics, cam.tanfov, bg,
                        batch["text"], batch["uncond"], batch["t"], keys,
                        cond_image=batch["cond_image"],
                        guidance_scale=batch["guidance_scale"],
                        progress=batch["progress"],
                        bg_state=self.bg_state, c2w=cam.c2w)
                else:
                    self.state, metrics = self.sds_step_fn(
                        self.state, self.guidance_params,
                        batch["smpl_inputs"],
                        cam.extrinsic, cam.intrinsics, cam.tanfov, bg,
                        batch["text"], batch["uncond"], batch["t"], keys,
                        cond_image=batch["cond_image"],
                        guidance_scale=batch["guidance_scale"],
                        progress=batch["progress"])
            self._maybe_densify()
        else:
            bg = jnp.broadcast_to(self._bg_color(),
                                  (self.train_res, self.train_res, 3))
            if self.bg_state is not None:
                self.state, self.bg_state, metrics = self.sds_step_fn(
                    self.state, self.guidance_params, batch["smpl_inputs"],
                    cam.extrinsic[0], cam.intrinsics[0], cam.tanfov[0], bg,
                    batch["text"][:1], batch["uncond"][:1], batch["t"][:1],
                    self._next_key(),
                    cond_image=batch["cond_image"],
                    guidance_scale=batch["guidance_scale"],
                    progress=batch["progress"],
                    bg_state=self.bg_state, c2w=cam.c2w[0])
            else:
                self.state, metrics = self.sds_step_fn(
                    self.state, self.guidance_params, batch["smpl_inputs"],
                    cam.extrinsic[0], cam.intrinsics[0], cam.tanfov[0], bg,
                    batch["text"][:1], batch["uncond"][:1], batch["t"][:1],
                    self._next_key(),
                    cond_image=batch["cond_image"],
                    guidance_scale=batch["guidance_scale"],
                    progress=batch["progress"])
            self._maybe_densify()
        return metrics  # device arrays — pulled lazily at log cadence

    def _maybe_densify(self):
        """(reference: densify cadence, trainer.py:879-885 +
        densification_interval / opacity_reset_interval,
        gaussian_densifier.py:30-40)"""
        r = self.cfg.render
        if not r.use_densifier or r.densify_from_iter is None:
            return
        in_window = r.densify_from_iter <= self.train_step \
            and (r.densify_until_iter is None
                 or self.train_step < r.densify_until_iter)
        if not in_window:
            return
        vanilla = r.gs_type == "vanilla"
        if self.train_step % self.densification_interval == 0:
            dcfg = self.densify_cfg
            if r.enable_grad_prune:
                # grad-prune mode holds for the first third of the densify
                # window, then auto-disables (reference:
                # gaussian_densifier.py:360-376)
                until = r.densify_until_iter or self.max_iteration
                window = (until - r.densify_from_iter) / 3
                # the reference flips enable_grad_prune off only AFTER the
                # first event past the boundary has grad-pruned once
                # (gaussian_densifier.py:369-373) — so the mode is active
                # iff the PREVIOUS densify event was still inside the window
                dcfg = dcfg._replace(
                    grad_prune=self.train_step - self.densification_interval
                    <= r.densify_from_iter + window)
            if vanilla:
                n_before = int(self.state.avatar.gaussians.alive.sum())
                self.state = gs_trainer.densify_vanilla(
                    self.state, dcfg, self._next_key())
                n_after = int(self.state.avatar.gaussians.alive.sum())
            else:
                n_before = int(self.state.avatar.num_alive)
                self.state = gs_trainer.densify(
                    self.state, dcfg, self._next_key(),
                    model=self.avatar_model)
                n_after = int(self.state.avatar.num_alive)
            logger.info("densify @%d: %d -> %d alive", self.train_step,
                        n_before, n_after)
        # periodic opacity reset — vanilla only: opacity IS a parameter
        # there (reference: gaussian_densifier.py:304-335)
        if vanilla and not r.densify_disable_reset \
                and self.train_step % self.opacity_reset_interval == 0:
            self.state = gs_trainer.reset_vanilla_opacity(
                self.state, value=self.densify_cfg.opacity_reset_value)
            logger.info("opacity reset @%d", self.train_step)

    def pretrain(self) -> None:
        """NeRF pretrain against SMPL-X depth/mask
        (reference: Trainer.pretrain, trainer.py:1152-1240)."""
        cfg = self.cfg
        assert cfg.stage == "nerf"
        if cfg.log.resume_pretrain:
            try:
                self.load_checkpoint()
                logger.info("resume_pretrain: reusing checkpoint at step "
                            "%d", self.train_step)
                return
            except FileNotFoundError:
                pass
        H = self.train_res
        while self.train_step < self.max_iteration:
            self.train_step += 1
            cam, _ = self.train_camera(1)
            _, smpl_outputs = self.prompt()
            depth, mask = self.prompt.condition.render_depth(
                smpl_outputs, cam.extrinsic[0], cam.intrinsics[0], H, H,
                raw=True)
            self.grid = nerf_trainer.maybe_update_occupancy(
                self.state, self.grid, self.nerf, self._next_key(),
                interval=cfg.nerf.update_extra_interval,
                density_thresh=cfg.nerf.density_thresh)
            self.state, metrics = self.pretrain_step_fn(
                self.state, self.grid, cam.c2w[0], cam.intrinsics[0],
                jnp.asarray(depth), jnp.asarray(mask), self._next_key())
            if self.train_step % max(cfg.log.snapshot_interval, 1) == 0 \
                    or self.train_step == 1:
                logger.info("pretrain %d/%d loss=%.5f", self.train_step,
                            self.max_iteration, float(metrics["loss"]))
        self.save_checkpoint()

    def pretrain_nerf2gs(self) -> None:
        """Distill frozen stage-1 NeRF renders into the avatar
        (reference: Trainer.pretrain_nerf2gs, trainer.py:1281-1386:
        L1+DSSIM on the NeRF's foreground from random cameras)."""
        cfg = self.cfg
        assert cfg.stage == "gs" and self._nerf_guidance is not None, (
            "nerf2gs needs --render.from_nerf pointing at a stage-1 ckpt")
        nerf, nerf_params = self._nerf_guidance
        H = self.train_res
        from ..nerf.renderer import init_occupancy

        grid = init_occupancy(cfg.nerf.grid_size)
        nerf_render = nerf_trainer.make_eval_render(nerf, H, H,
                                                    num_steps=cfg.nerf.num_steps)
        rk = dict(tile_size=cfg.render.tile_size,
                  capacity=cfg.render.tile_capacity, chunk=cfg.render.chunk)
        step_fn = gs_trainer.make_nerf2gs_step(
            self.avatar_model, self.tx, H, H, **rk)
        while self.train_step < self.max_iteration:
            self.train_step += 1
            cam, _ = self.train_camera(1)
            smpl_inputs, _ = self.prompt()
            bg = self._bg_color()
            target, _, alpha = nerf_render(nerf_params, grid, cam.c2w[0],
                                           cam.intrinsics[0], bg)
            bg_img = jnp.broadcast_to(bg, (H, H, 3))
            self.state, metrics = step_fn(
                self.state, smpl_inputs, cam.extrinsic[0], cam.intrinsics[0],
                cam.tanfov[0], bg_img, target, alpha)
            if self.train_step % max(cfg.log.snapshot_interval, 1) == 0 \
                    or self.train_step == 1:
                logger.info("nerf2gs %d/%d loss=%.5f", self.train_step,
                            self.max_iteration, float(metrics["loss"]))
        self.save_checkpoint()

    # ------------------------------------------------------------------
    # eval / io
    # ------------------------------------------------------------------

    def evaluate(self, size: Optional[int] = None, save_dir: Optional[Path] = None,
                 use_test_res: bool = False) -> List[np.ndarray]:
        """Render the cyclical eval track
        (reference: Trainer.evaluate, trainer.py:1019-1112)."""
        cfg = self.cfg
        size = size or cfg.data.eval_size
        save_dir = Path(save_dir or (
            self.exp_dir / (cfg.log.eval_dirname or "results")))
        camera = self.test_camera if use_test_res else self.eval_camera
        render = getattr(self, "test_render", None) if use_test_res \
            else self.eval_render
        if render is None:
            render = self.eval_render
        H = cfg.data.test_h if use_test_res else cfg.data.eval_h
        W = cfg.data.test_w if use_test_res else cfg.data.eval_w

        # predefined camera tracks + video backgrounds: the reenactment
        # path (reference: evaluate with reenact/tram sequences,
        # trainer.py:1019-1112 + VideoBackground, background.py:92-160)
        predefined = self.prompt.camera_sequences is not None \
            and cfg.data.cameras != "cyclical" and cfg.stage == "gs"
        video_bg = None
        if cfg.render.use_video_background:
            from ..system.background import VideoBackground
            from ..utils.media import read_video

            frames_arr = read_video(cfg.render.use_video_background) \
                if str(cfg.render.use_video_background).endswith(".mp4") \
                else None
            if frames_arr is not None and frames_arr.size:
                video_bg = VideoBackground(frames_arr)
        reenact_render = None
        # mask-aware overlay export: rendered avatar RGBA composited onto
        # the inpainted source video at its native size (reference:
        # overlay_pngs_on_video, motionx_reenact.py:162-274)
        overlay_rgba = [] if video_bg is not None else None

        # frame-batched fast path: the standard gs animation eval (fixed
        # resolution, hybrid avatar, no scene extras) defers renders and
        # runs them 8-frames-per-dispatch (make_avatar_render_frames —
        # each dispatch pays a host round trip on the remote TPU runtime)
        batchable = (cfg.stage == "gs" and not predefined
                     and cfg.render.gs_type != "vanilla"
                     and not self.extra_states and size > 1)
        pending = [] if batchable else None

        frames = []
        for i in range(size):
            p = i / max(size, 1)
            if self.prompt.scene_type == "motion" and not cfg.data.eval_fix_animation:
                smpl_inputs, smpl_outputs = self.prompt(frame_idx=i)
            else:
                smpl_inputs, smpl_outputs = self.prompt(frame_idx=0) \
                    if self.prompt.scene_type == "motion" else self.prompt()

            if predefined:
                cp = self.prompt.get_camera_params_from_sequences(i)
                extr = cp["extrinsic"]
                intr = cp["intrinsics"]
                tanfov = jnp.asarray(cp["tanfov"])
                vh, vw = cp["image_height"], cp["image_width"]
                if reenact_render is None and cfg.stage == "gs":
                    if cfg.render.gs_type == "vanilla":
                        reenact_render = gs_trainer.make_vanilla_render(
                            self.avatar_model, vh, vw,
                            tile_size=cfg.render.tile_size,
                            capacity=cfg.render.tile_capacity,
                            chunk=cfg.render.chunk)
                    else:
                        reenact_render = gs_trainer.make_avatar_render(
                            self.avatar_model, vh, vw,
                            tile_size=cfg.render.tile_size,
                            capacity=cfg.render.tile_capacity,
                            chunk=cfg.render.chunk,
                            extra_models=self.extra_models)
                Hc, Wc = vh, vw
            else:
                cam = camera(p)
                extr, intr = cam.extrinsic[0], cam.intrinsics[0]
                tanfov = cam.tanfov[0]
                Hc, Wc = H, W

            if video_bg is not None:
                bg = video_bg.frames[i % video_bg.frames.shape[0]]
                bg = jax.image.resize(bg, (Hc, Wc, 3), "bilinear")
            elif self.bg_state is not None and not predefined:
                # render the learned MLP background at the eval camera
                # (reference: scene.background in eval forward)
                from ..data.camera import get_rays

                _, rd = get_rays(cam.c2w[:1], cam.intrinsics[:1], Hc, Wc)
                bg = self.bg_net.apply(
                    self.bg_state[0], rd[0]).reshape(Hc, Wc, 3)
            elif cfg.stage == "gs":
                from ..system.background import COLOR_PRESETS

                c = COLOR_PRESETS.get(cfg.data.eval_bg_mode,
                                      cfg.render.bg_color) \
                    if cfg.data.eval_bg_mode else cfg.render.bg_color
                bg = jnp.broadcast_to(
                    jnp.asarray(c, jnp.float32), (Hc, Wc, 3))
            else:
                from ..system.background import COLOR_PRESETS

                c = COLOR_PRESETS.get(cfg.data.eval_bg_mode or "gray",
                                      (0.5, 0.5, 0.5))
                bg = jnp.asarray(c)

            if cfg.stage == "nerf" and self.dmtet_model is not None:
                img, _, _ = self.eval_render(
                    self.state, cam.c2w[0], cam.intrinsics[0], bg)
            elif cfg.stage == "nerf":
                img, _, _ = self.eval_render(
                    self.state.params, self.grid, cam.c2w[0],
                    cam.intrinsics[0], bg)
            elif pending is not None:
                pending.append((smpl_inputs, extr, intr, tanfov, bg))
                frames.append(None)  # filled by the batched pass below
                continue
            elif overlay_rgba is not None:
                # render over a transparent bg once; composite the video
                # frame host-side and keep the RGBA for the overlay export
                r = reenact_render if predefined else render
                img0, alpha, _ = r(self.state.avatar, smpl_inputs, extr,
                                   intr, tanfov, jnp.zeros((Hc, Wc, 3)),
                                   self.extra_states)
                overlay_rgba.append(np.concatenate(
                    [np.asarray(jnp.clip(img0, 0, 1)),
                     np.asarray(alpha)[..., None]], axis=-1))
                img = img0 + (1.0 - alpha)[..., None] * bg
            else:
                r = reenact_render if predefined else render
                img, _, _ = r(self.state.avatar, smpl_inputs, extr, intr,
                              tanfov, bg, self.extra_states)
            frames.append(np.asarray(jnp.clip(img, 0, 1)))

        if pending:
            # frame-DP eval: shard the frame batch over all devices
            # (shard_map in make_avatar_render_frames) — animation/video
            # serving scales near-linearly with chips
            n_dev = len(jax.devices())
            req_dp = int(getattr(cfg.parallel, "dp", -1) or -1)
            D = n_dev if req_dp < 0 else min(req_dp, n_dev)
            eval_mesh = None
            if D > 1 and len(pending) >= D:
                from ..parallel.mesh import make_mesh
                eval_mesh = make_mesh(dp=D)
            cache = getattr(self, "_frame_render_cache", {})
            ck = (H, W, D if eval_mesh is not None else 1)
            if ck not in cache:
                cache[ck] = gs_trainer.make_avatar_render_frames(
                    self.avatar_model, H, W,
                    tile_size=cfg.render.tile_size,
                    capacity=cfg.render.tile_capacity,
                    chunk=cfg.render.chunk, mesh=eval_mesh)
                self._frame_render_cache = cache
            rf = cache[ck]
            if eval_mesh is not None:
                # multiple of D, at most 8 frames per chip per dispatch
                Fc = min(8 * D, -(-len(pending) // D) * D)
            else:
                Fc = min(8, len(pending))
            for s0 in range(0, len(pending), Fc):
                chunk = pending[s0: s0 + Fc]
                n = len(chunk)
                chunk = chunk + [chunk[-1]] * (Fc - n)  # pad: static shape
                obs = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *[c[0] for c in chunk])
                extr = jnp.stack([c[1] for c in chunk])
                intr = jnp.stack([c[2] for c in chunk])
                tf = jnp.stack([c[3] for c in chunk])
                bgs = jnp.stack([jnp.broadcast_to(c[4], (H, W, 3))
                                 for c in chunk])
                if overlay_rgba is not None:
                    imgs, alphas, _ = rf(self.state.avatar, obs, extr,
                                         intr, tf, jnp.zeros((H, W, 3)))
                    for j in range(n):
                        overlay_rgba.append(np.concatenate(
                            [np.asarray(jnp.clip(imgs[j], 0, 1)),
                             np.asarray(alphas[j])[..., None]], axis=-1))
                        comp = imgs[j] + (1.0 - alphas[j])[..., None] \
                            * bgs[j]
                        frames[s0 + j] = np.asarray(jnp.clip(comp, 0, 1))
                else:
                    imgs, _, _ = rf(self.state.avatar, obs, extr, intr,
                                    tf, bgs)
                    for j in range(n):
                        frames[s0 + j] = np.asarray(
                            jnp.clip(imgs[j], 0, 1))
        if cfg.data.eval_save_image:
            for i, f in enumerate(frames):
                save_image(str(save_dir / f"step_{self.train_step:06d}"
                               / f"{i:04d}.png"), f)
        if cfg.data.eval_save_video and len(frames) > 1:
            write_video(str(save_dir / f"step_{self.train_step:06d}.mp4"),
                        frames, fps=cfg.data.eval_video_fps)
        if overlay_rgba:
            from ..utils.overlay import overlay_frames_on_video

            vid = [np.asarray(video_bg.frames[i % video_bg.frames.shape[0]])
                   for i in range(len(overlay_rgba))]
            overlay_frames_on_video(
                overlay_rgba, vid,
                str(save_dir / f"step_{self.train_step:06d}_overlay.mp4"),
                fps=cfg.data.eval_video_fps, premultiplied=True)
        return frames

    def export_mesh(self) -> str:
        """Stage-1 NeRF -> textured mesh files under exp_dir/mesh
        (reference: to_mesh.py export_mesh — clean, decimate, UV-unwrap,
        albedo bake). Load the checkpoint first (--optim.resume true)."""
        assert self.cfg.stage == "nerf", "nerf2mesh needs --stage nerf"
        from ..nerf.mesh_export import export_textured_mesh

        out = export_textured_mesh(
            self.nerf, self.state.params, str(self.exp_dir / "mesh"),
            resolution=self.cfg.log.mesh_resolution,
            density_thresh=self.cfg.nerf.density_thresh,
            decimate_target=self.cfg.log.mesh_decimate_target,
            texture_size=self.cfg.log.mesh_texture_size)
        logger.info("exported textured mesh to %s", out)
        return out

    def full_eval(self) -> List[np.ndarray]:
        """(reference: Trainer.full_eval, trainer.py:1114-1150)"""
        frames = self.evaluate(size=self.cfg.data.full_eval_size,
                               use_test_res=True)
        score = self.compute_r_precision(frames)
        if score is not None:
            logger.info("CLIP R-Precision(top-1) vs view prompts: %.3f", score)
        return frames

    def compute_r_precision(self, frames) -> Optional[float]:
        """CLIP retrieval score of rendered frames against this run's prompt
        (the paper's quantitative protocol; reference ships the tool unwired,
        utils/r_precision.py:7-69). Needs converted CLIP towers under the
        guidance weights dir; falls back to the tiny random towers in debug
        (pipeline-exercise only, not a meaningful score)."""
        try:
            if self.cfg.log.debug:
                from ..utils.r_precision import make_tiny_r_precision

                rp = make_tiny_r_precision(self._next_key())
                ids = np.asarray(
                    self.rng.integers(1, 200, size=(len(frames), 16)),
                    np.int32)
                return rp.retrieve(np.stack(frames), ids)
            weights_dir = self.cfg.guide.weights_dir or GUIDANCE_WEIGHTS
            vp = Path(weights_dir) / "clip_vision.msgpack"
            if not vp.is_file():
                return None
            from ..guidance.clip_text import CLIPTextConfig, CLIPTokenizer
            from ..guidance.convert import load_params
            from ..utils.r_precision import (
                CLIPTextTower,
                CLIPVisionModel,
                RPrecision,
            )

            vision = CLIPVisionModel()
            text = CLIPTextTower(CLIPTextConfig())
            vparams = load_params(str(vp), vision.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))
            tparams = load_params(
                str(Path(weights_dir) / "clip_retrieval_text.msgpack"),
                text.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 77), jnp.int32)))
            tok = CLIPTokenizer(str(Path(weights_dir) / "vocab.json"),
                                str(Path(weights_dir) / "merges.txt"))
            rp = RPrecision(vision, text, vparams, tparams, tokenizer=tok)
            texts = [self.cfg.guide.text] * len(frames)
            return rp.retrieve(np.stack(frames), texts)
        except Exception as e:
            logger.warning("R-Precision skipped: %s", e)
            return None

    def save_checkpoint(self) -> None:
        tree = {"params": self.state.params
                if self.cfg.stage == "nerf" else self.state.avatar,
                "opt_state": self.state.opt_state,
                "step": np.asarray(self.train_step)}
        if self.bg_state is not None:
            tree["background"] = self.bg_state
        if self.dmtet_model is not None:
            tree["dmtet"] = self.state.dmtet
        self.checkpointer.save(self.train_step, tree)
        logger.info("saved checkpoint at step %d", self.train_step)

    def load_checkpoint(self, step: Optional[int] = None) -> None:
        """(reference: _Checkpointer.init_checkpoints, trainer.py:172-278)"""
        template = {"params": self.state.params
                    if self.cfg.stage == "nerf" else self.state.avatar,
                    "opt_state": self.state.opt_state,
                    "step": np.asarray(0)}
        if self.bg_state is not None:
            template["background"] = self.bg_state
        if self.dmtet_model is not None:
            template["dmtet"] = self.state.dmtet
        restored, step = self.checkpointer.restore(step, target=template)
        if self.bg_state is not None and "background" in restored:
            self.bg_state = tuple(restored["background"])
        self.train_step = int(restored["step"])
        if self.cfg.stage == "nerf":
            self.state = self.state._replace(
                params=restored["params"], opt_state=restored["opt_state"],
                step=jnp.asarray(self.train_step))
            if self.dmtet_model is not None and "dmtet" in restored:
                self.state = self.state._replace(dmtet=restored["dmtet"])
        else:
            self.state = self.state._replace(
                avatar=restored["params"], opt_state=restored["opt_state"],
                step=jnp.asarray(self.train_step))
        logger.info("restored checkpoint step %d", step)
