"""Optimizer construction: per-attribute param groups as optax transforms.

Replaces the reference's mutable Adam param-group machinery
(reference: core/gaussian/gaussian_optimizer.py:49-141 canonical 3DGS LRs,
core/optim/adan.py vendored Adan, core/optim/optim_utils.py:5-30 expon LR)
with optax: ``multi_transform`` partitions the avatar parameter pytree into
the same six groups the reference keeps as separate optimizers
(reference: DreamWaltzG.get_optimizer, core/system/avatar.py:1590-1635).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..configs import NeRFConfig, RenderConfig


def expon_lr(lr_init: float, lr_final: float, max_steps: int,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """3DGS log-lerp learning rate with optional delayed warmup
    (reference: get_expon_lr_func, core/optim/optim_utils.py:5-30)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(max(lr_init, 1e-30)) * (1 - t)
            + jnp.log(max(lr_final, 1e-30)) * t)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay = 1.0
        return delay * log_lerp

    return schedule


def adan(
    learning_rate,
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    """Adan (Adaptive Nesterov Momentum) as an optax transform
    (reference: vendored core/optim/adan.py — used for the MLP background,
    core/system/background.py:88 with max_grad_norm=5.0).

    With the reference's retention-factor convention (betas are EMA decay):
    m = EMA_b1(g); v = EMA_b2(g_t - g_{t-1}); n = EMA_b3((g + b2·dg)^2);
    update = (m/bc1 + b2·v/bc2) / (sqrt(n/bc3) + eps), proximal decoupled
    weight decay (no_prox=False: p <- (p + u) / (1 + lr·wd)). Grads are
    pre-scaled by min(1, max_grad_norm / (‖g‖ + eps)) when
    ``max_grad_norm > 0`` (reference: adan.py:109-128).
    """

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree_util.tree_map(jnp.zeros_like, params),
                "n": jax.tree_util.tree_map(jnp.zeros_like, params),
                "g_prev": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update_fn(grads, state, params=None):
        count = state["count"] + 1
        first = count == 1
        t = jax.tree_util.tree_map

        if max_grad_norm > 0.0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
            grads = t(lambda g: g * scale, grads)

        def dg_fn(g, gp):
            return jnp.where(first, jnp.zeros_like(g), g - gp)

        dg = t(dg_fn, grads, state["g_prev"])
        m = t(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = t(lambda v_, d: b2 * v_ + (1 - b2) * d, state["v"], dg)
        n = t(lambda n_, g, d: b3 * n_ + (1 - b3) * (g + b2 * d) ** 2,
              state["n"], grads, dg)

        c1 = 1 - b1 ** count
        c2 = 1 - b2 ** count
        c3 = 1 - b3 ** count
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def upd(m_, v_, n_, p):
            denom = jnp.sqrt(n_ / c3) + eps
            step = (m_ / c1 + b2 * v_ / c2) / denom
            u = -lr * step
            if weight_decay > 0.0 and p is not None:
                u = (p + u) / (1.0 + lr * weight_decay) - p
            return u

        if params is None:
            updates = t(lambda m_, v_, n_: upd(m_, v_, n_, None), m, v, n)
        else:
            updates = t(upd, m, v, n, params)
        return updates, {"m": m, "v": v, "n": n, "g_prev": grads, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def global_norm_scale(max_norm: float,
                      eps: float = 1e-8) -> optax.GradientTransformation:
    """Scale grads by min(1, max_norm / (‖g‖ + eps)) over the WHOLE tree
    (reference: Adan.step's clip_global_grad_norm, core/optim/adan.py:109-128
    — computed across every param group of the optimizer)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(grads, state, params=None):
        del params
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(max_norm / (gnorm + eps), 1.0)
        return jax.tree_util.tree_map(lambda g: g * scale, grads), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(kind: str, lr, **kwargs) -> optax.GradientTransformation:
    if kind == "adam":
        return optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)
    if kind == "adamw":
        return optax.adamw(lr, **kwargs)
    if kind == "adan":
        return adan(lr, **kwargs)
    raise ValueError(f"unknown optimizer {kind!r}")


def nerf_lr_schedule(policy: str, base: float, max_steps: int,
                     alphas_cumprod=None):
    """Stage-1 lr policies (reference: build_scheduler,
    nerf_model.py:187-211 + make_scheduler, core/optim/scheduler):

    * 'none'/'constant' — flat;
    * 'cosine' — cosine decay (TPU addition);
    * 'step' — x0.1 after 0.7 x max_steps (StepLR, gamma=0.1);
    * 'multistep' — x0.1 at [s0, s0+s0/2, s0+3s0/4], s0=0.7 max (MultiStepLR);
    * 'warmup' — linear 1000-step warmup then the multistep decays
      (WarmupMultiStepLR, warmup_iter=1000);
    * 'lambda' — factor = 1 - alphas_cumprod[(1 - i/max) x 1000]
      (the DDPM-alphas ramp, nerf_model.py:197-207);
    * 'ddpm' — flat here; the per-timestep TimePrioritizedLR weight is
      applied to the updates inside the train step (time_prior.py:394-431).
    """
    if policy in ("none", "constant", "ddpm"):
        return lambda s: base
    if policy == "cosine":
        return optax.cosine_decay_schedule(base, max_steps)
    if policy == "step":
        k = int(max_steps * 0.7)
        return lambda s: base * jnp.where(jnp.asarray(s) >= k, 0.1, 1.0)
    if policy in ("multistep", "multi_step", "warmup"):
        s0 = int(max_steps * 0.7)
        ms = jnp.asarray([s0, s0 + s0 // 2, s0 + s0 // 2 + s0 // 4])
        warmup_iter = 1000 if policy == "warmup" else 0

        def sched(s):
            s = jnp.asarray(s, jnp.float32)
            n = jnp.sum((s >= ms).astype(jnp.float32))
            lr = base * jnp.power(0.1, n)
            if warmup_iter > 0:
                lr = lr * jnp.clip((s + 1.0) / warmup_iter, 0.0, 1.0)
            return lr

        return sched
    if policy == "lambda":
        assert alphas_cumprod is not None, (
            "lr_policy='lambda' needs the diffusion alphas_cumprod "
            "(pass the guidance schedule to build_nerf_optimizer)")
        ac = jnp.asarray(alphas_cumprod)
        T = ac.shape[0]

        def sched(s):
            idx = ((1.0 - jnp.asarray(s, jnp.float32) / max_steps)
                   * T).astype(jnp.int32)
            return base * jnp.where(
                idx >= T, 1.0, 1.0 - ac[jnp.clip(idx, 0, T - 1)])

        return sched
    raise ValueError(f"unknown nerf lr_policy {policy!r}")


def build_nerf_optimizer(cfg: NeRFConfig, max_steps: int,
                         alphas_cumprod=None,
                         ) -> optax.GradientTransformation:
    """Encoder gets lr x ``encoder_lr_scale`` (reference:
    nerf_model.py:171-211 get_params: encoder lr x10), MLPs base lr.
    ``cfg.optimizer='adan'`` swaps the group optimizer and scales lr x5
    (reference: get_optimizer, nerf_model.py:524-531)."""
    use_adan = cfg.optimizer == "adan"
    base = cfg.lr * (5.0 if use_adan else 1.0)
    bg_lr = cfg.bg_lr * (5.0 if use_adan else 1.0)
    sched = nerf_lr_schedule(cfg.lr_policy, base, max_steps,
                             alphas_cumprod=alphas_cumprod)

    def scale_by_group(path_key):
        def label_fn(params):
            # NeRFParams: encoders x10 lr, heads + sigma_scale base lr,
            # bg its own lr (reference: get_optimizer, nerf_model.py:171-211,
            # 404-441, 523-560)
            return type(params)(
                encoder="encoder",
                sigma_mlp="mlp",
                bg_mlp=None if params.bg_mlp is None else "bg",
                albedo_mlp=None if params.albedo_mlp is None else "mlp",
                encoder_sigma=None if params.encoder_sigma is None
                else "encoder",
                sigma_scale=None if params.sigma_scale is None else "mlp",
            )
        return label_fn

    def opt(lr, weight_decay: float = 0.0):
        if use_adan:
            # reference: nerf_model.py:178 — Adan(eps=1e-8, weight_decay=2e-5,
            # max_grad_norm=5.0); the norm clip is applied globally across
            # all param groups (adan.py:109-128), so it is chained BEFORE
            # the per-group transforms rather than set per group.
            return adan(lr, eps=1e-8, weight_decay=2e-5)
        if weight_decay > 0.0:
            return optax.adamw(lr, b1=0.9, b2=0.99, eps=1e-15,
                               weight_decay=weight_decay)
        return optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)

    # plane-table decay (triplane only; see configs.NeRFConfig
    # triplane_weight_decay — grid backbones keep reference parity)
    enc_wd = cfg.triplane_weight_decay if cfg.backbone == "triplane" \
        and getattr(cfg, "triplane_weight_decay", 0.0) else 0.0

    tx = optax.multi_transform(
        {
            "encoder": opt(lambda s: sched(s) * cfg.encoder_lr_scale,
                           weight_decay=enc_wd),
            "mlp": opt(sched),
            "bg": opt(bg_lr),
        },
        scale_by_group(None),
    )
    if use_adan:
        tx = optax.chain(global_norm_scale(5.0, eps=1e-8), tx)
    return tx


def build_avatar_optimizer(cfg: RenderConfig, max_steps: int,
                           spatial_scale: float = 1.0,
                           ) -> optax.GradientTransformation:
    """Six param groups over ``AvatarParams``
    (reference: get_optimizer, avatar.py:1590-1635 + canonical 3DGS LRs,
    gaussian_optimizer.py:49-121): positions (expon decay x spatial_scale),
    scales/quats, lbs weights, the NeRF encoder+color MLP (continued at a
    small lr), the deform net, and mesh-binding params."""
    pos_lr = expon_lr(
        cfg.position_lr_init * spatial_scale,
        cfg.position_lr_final * spatial_scale,
        max_steps)

    def label_fn(params):
        # AvatarParams NamedTuple fields; mesh-binding sub-params get their
        # own labels so learn_mesh_bary_coords / learn_mesh_vertex_coords /
        # learn_mesh_scales freeze them individually (reference:
        # avatar.py:1076-1092 MeshBindingGaussianModel.get_optimizer groups)
        def mesh_labels(mp):
            return type(mp)(bary_coords="mesh_bary",
                            vertex_coords="mesh_vertex",
                            scales="mesh_scale")

        return type(params)(
            positions="pos",
            log_scales="scale",
            quats="quat",
            lbs_weights="lbs",
            encoder="nerf",
            color_mlp="nerf",
            sq_net="deform",
            mesh={k: mesh_labels(v) for k, v in params.mesh.items()},
            extra_betas="betas",
            # learnable SMPL-X template copies: lbs_lr, v_template x10 —
            # the documented intent of LinearBlendSkinning.get_optimizer
            # (inverse_lbs.py:504-514); NOTE the reference parses
            # deform_learn_* into requires_grad Parameters but its only
            # optimizer hookup is commented out (avatar.py:325-327), so
            # these params never actually step there — here they do
            smpl_learn={k: ("smpl_vt" if k == "v_template" else "smpl_tpl")
                        for k in params.smpl_learn},
        )

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    def maybe_frozen(enabled, tx):
        return tx if enabled else optax.set_to_zero()

    return optax.multi_transform(
        {
            "pos": maybe_frozen(cfg.learn_positions, adam(pos_lr)),
            "scale": maybe_frozen(cfg.learn_scales, adam(cfg.scaling_lr)),
            "quat": maybe_frozen(cfg.learn_quaternions, adam(cfg.rotation_lr)),
            "lbs": maybe_frozen(cfg.learn_lbs_weights, adam(cfg.lbs_lr)),
            "nerf": adam(1e-3),
            "deform": adam(1e-4),
            # mesh-binding LRs per the reference's get_optimizer groups
            # (avatar.py:1083-1091): bary/vertex coords at position_lr_init,
            # scales at scaling_lr; vertex coords train only under
            # --render.learn_mesh_vertex_coords (requires_grad gate,
            # avatar.py:952)
            "mesh_vertex": maybe_frozen(cfg.learn_mesh_vertex_coords,
                                        adam(cfg.position_lr_init)),
            "mesh_bary": maybe_frozen(cfg.learn_mesh_bary_coords,
                                      adam(cfg.position_lr_init)),
            "mesh_scale": maybe_frozen(cfg.learn_mesh_scales,
                                       adam(cfg.scaling_lr)),
            "betas": maybe_frozen(
                cfg.learn_hand_betas or cfg.learn_face_betas,
                adam(cfg.betas_lr)),
            "smpl_tpl": adam(cfg.lbs_lr),
            "smpl_vt": adam(cfg.lbs_lr * 10.0),
        },
        label_fn,
    )


def build_gaussian_optimizer(cfg: RenderConfig, max_steps: int,
                             spatial_scale: float = 1.0,
                             ) -> optax.GradientTransformation:
    """Vanilla-3DGS per-attribute groups over ``GaussianParams``
    (reference: gaussian_optimizer.py:49-121; sh_rest lr = feature_lr/20)."""
    pos_lr = expon_lr(
        cfg.position_lr_init * spatial_scale,
        cfg.position_lr_final * spatial_scale,
        max_steps)

    def label_fn(params):
        return type(params)(
            means="pos", sh_dc="dc", sh_rest="rest",
            opacity_logit="opacity", log_scales="scale", quats="quat")

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    return optax.multi_transform(
        {
            "pos": adam(pos_lr),
            "dc": adam(cfg.feature_lr),
            "rest": adam(cfg.feature_lr / 20.0),
            "opacity": adam(cfg.opacity_lr),
            "scale": adam(cfg.scaling_lr),
            "quat": adam(cfg.rotation_lr),
        },
        label_fn,
    )
