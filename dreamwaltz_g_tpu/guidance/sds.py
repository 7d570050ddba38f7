"""Score Distillation Sampling.

Counterpart of the reference's BasicScoreDistillation / ScoreDistillation /
ControlNetScoreDistillation (reference: core/guidance/basic.py:330-917,
stable_diffusion.py, controlnet.py):

* render -> (resize to 512²) -> VAE encode (gradients flow) -> add noise at a
  prioritized timestep -> frozen UNet(+ControlNet) eps-prediction with CFG ->
  loss-family gradient -> weighting -> clip/norm/nan-guard -> injected into
  the autodiff graph via the SpecifyGradient trick, which in JAX is simply
  ``loss = Σ latents · stop_gradient(grad)`` (reference: basic.py:213-226).
* loss families sds / sjc / csd / nfsd / ism (basic.py:546-663; ISM's
  DDIM-inversion path basic.py:665-776 reduced to its single-step core),
* weightings dreamfusion / latent-nerf / ism / sjc (basic.py:634-646),
* RGB-space pixel gradient clipping as a custom_vjp on the rendered image
  (replaces torch backward hooks, reference: core/guidance/pgc.py:13-79).

Everything on the hot path is jit-compatible; text encoding and timestep
selection happen host-side once per step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .clip_text import CLIPTextModel
from .controlnet import ControlNet
from .time_prior import DiffusionSchedule, TimePrioritizedScheduler, make_schedule
from .unet import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL


class GuidanceParams(NamedTuple):
    """Frozen model weights (replicated across the mesh)."""

    unet: dict
    vae: dict
    controlnet: Optional[dict] = None


@dataclass
class ScoreDistillation:
    """Static guidance definition + jit-able loss computation."""

    unet: UNet2DCondition
    vae: AutoencoderKL
    controlnet: Optional[ControlNet] = None
    schedule: DiffusionSchedule = None
    # score families: {'sds','sjc','sjc-red','csd','nfsd','ism','custom'}
    # denoise families: {'z0','z0_final','x0','x0_final'} (basic.py:843-898)
    loss_type: str = "sds"
    weight_type: str = "sjc"          # {'dreamfusion', 'latent-nerf', 'ism', 'sjc'}
    guidance_scale: float = 50.0
    guidance_rescale: float = 0.0     # CFG std-rescale (arXiv 2305.08891 §3.4)
    controlnet_scale: float = 1.0
    grad_latent_clip: bool = False
    grad_latent_clip_scale: float = 3.0
    grad_latent_norm: bool = False
    grad_latent_nan_to_num: bool = True
    # ISM two-phase DDIM inversion (reference: ism(), basic.py:717-776):
    # phase 1 inverts x0->x_{t_prev} with xs_delta_t strides, phase 2 takes
    # one annealed-delta step to t; delta anneals delta_t_start -> delta_t
    # over the first warmup_frac of training
    ism_delta_t: int = 80
    ism_delta_t_start: int = 100
    ism_xs_delta_t: int = 200
    ism_xs_inv_steps: int = 5
    ism_warmup_frac: float = 0.3      # warmup_iter = 1500/5000 * max_iter
    denoise_timesteps: int = 50       # inference grid for z0/x0 modes
    # 'epsilon' (SD1.x/2.x-base/XL) or 'v_prediction' (SD2.x 768-v
    # checkpoints). v outputs are converted to eps right at the UNet call
    # (_eps), so every downstream consumer — SDS families, ISM inversion,
    # denoise modes, sampling — stays in eps space. (The reference has no
    # v handling at all: its sd20/sd21 cards feed v outputs into eps-space
    # SDS, basic.py:443-467.)
    prediction_type: str = "epsilon"
    latent_size: int = 64
    latent_input: bool = False    # 4-channel renders ARE latents (Latent-NeRF)
    # input_interpolate=False keeps a natively-supported render size instead
    # of resizing to the default (reference: prepare_latents,
    # basic.py:354-383 — SD1.5 accepts 512/768 pixels i.e. 64/96 latents)
    input_interpolate: bool = True

    @property
    def is_denoising_mode(self) -> bool:
        """(reference: basic.py:344-345)"""
        return self.loss_type in ("z0", "z0_final", "x0", "x0_final")

    def __post_init__(self):
        if self.schedule is None:
            self.schedule = make_schedule()

    # -- helpers -----------------------------------------------------------

    def encode_images(self, params: GuidanceParams, images: jnp.ndarray,
                      ) -> jnp.ndarray:
        """(B, H, W, 3) in [0,1] -> latents; resizes to the VAE's native
        resolution first (reference: prepare_latents + input_interpolate,
        basic.py:354-383). With ``latent_input`` (Latent-NeRF: the renderer
        emits 4 channels that ARE latents, basic.py:55-64) the VAE is
        bypassed and the render is only resized to the latent grid."""
        B, H, W, C = images.shape
        if self.latent_input:
            assert C == 4, "latent_input expects 4-channel renders"
            if (H != self.latent_size or W != self.latent_size) and (
                    self.input_interpolate
                    or H != W or H not in (self.latent_size, 96)):
                images = jax.image.resize(
                    images, (B, self.latent_size, self.latent_size, 4),
                    "bilinear")
            return images
        vae_factor = 2 ** (len(self.vae.cfg.block_out_channels) - 1)
        target = self.latent_size * vae_factor
        if (H != target or W != target) and (
                self.input_interpolate
                or H != W or H not in (target, 768)):
            # input_interpolate=False keeps a square 768 (or native) render
            # un-resized — it encodes to 96^2 latents which the conv/attn
            # UNet handles natively (reference: basic.py:358-366 asserts
            # 512/768 for SD1.5 instead of resizing)
            images = jax.image.resize(images, (B, target, target, 3), "bilinear")
        return self.vae.encode(params.vae, images)

    def _eps(self, params: GuidanceParams, latents, t, context,
             cond_image=None):
        """One frozen eps-prediction (optionally ControlNet-conditioned)
        (reference: controlnet.py:83-114 _predict)."""
        if self.controlnet is not None and cond_image is not None \
                and params.controlnet is not None:
            down_res, mid_res = self.controlnet.apply(
                params.controlnet, latents, t, context, cond_image,
                self.controlnet_scale)
            pred = self.unet.apply(params.unet, latents, t, context,
                                   down_residuals=down_res,
                                   mid_residual=mid_res)
        else:
            pred = self.unet.apply(params.unet, latents, t, context)
        if self.prediction_type == "v_prediction":
            # v = sqrt(ac) eps - sqrt(1-ac) x0  =>
            # eps = sqrt(ac) v + sqrt(1-ac) x_t  (x_t = the noisy input)
            ac = self.schedule.alphas_cumprod[t.astype(jnp.int32)]
            ac = ac.reshape((-1,) + (1,) * (latents.ndim - 1))
            pred = (jnp.sqrt(ac) * pred.astype(jnp.float32)
                    + jnp.sqrt(1.0 - ac) * latents.astype(jnp.float32)
                    ).astype(pred.dtype)
        return pred

    def _cfg_eps(self, params, latents_noisy, t, ctx_text, ctx_uncond,
                 cond_image, guidance_scale):
        """eps with classifier-free guidance: one batched UNet pass over the
        (uncond | text) stack (reference: basic.py:443-467)."""
        B = latents_noisy.shape[0]
        lat2 = jnp.concatenate([latents_noisy, latents_noisy], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        ctx2 = jnp.concatenate([ctx_uncond, ctx_text], axis=0)
        cond2 = None if cond_image is None else jnp.concatenate(
            [cond_image, cond_image], axis=0)
        eps = self._eps(params, lat2, t2, ctx2, cond2)
        eps_uncond, eps_text = eps[:B], eps[B:]
        return eps_uncond + guidance_scale * (eps_text - eps_uncond), \
            eps_uncond, eps_text

    def sample_images(self, params: GuidanceParams, text_embeds,
                      uncond_embeds, key, num_inference_steps: int = 50,
                      guidance_scale=None, cond_image=None) -> jnp.ndarray:
        """Full text->image DDIM sampling from pure noise — the
        ``--log.check_sd`` sanity export (reference: export_samples,
        core/trainer.py:386-443 drives the diffusers pipeline; here the
        same frozen UNet/CFG/ControlNet stack walks the DDIM grid).
        Returns (B, H, W, 3) images in [0, 1]."""
        gs = self.guidance_scale if guidance_scale is None else guidance_scale
        dt = text_embeds.dtype
        B = text_embeds.shape[0]
        T = self.schedule.num_train_timesteps
        stride = T // num_inference_steps
        x = jax.random.normal(
            key, (B, self.latent_size, self.latent_size, 4), dtype=dt)

        def body(i, x):
            t_cur = jnp.full((B,), T - stride - i * stride, jnp.int32)
            eps, _, _ = self._cfg_eps(params, x, t_cur, text_embeds,
                                      uncond_embeds, cond_image, gs)
            # the f32 schedule promotes the bf16 carry — keep its dtype
            return self.schedule.ddim_step(
                x, eps, t_cur, t_cur - stride).astype(x.dtype)

        x = jax.lax.fori_loop(0, num_inference_steps, body, x)
        return self.vae.decode(params.vae, x.astype(jnp.float32))

    def _weight(self, t: jnp.ndarray) -> jnp.ndarray:
        ac = self.schedule.alphas_cumprod[t]
        if self.weight_type == "dreamfusion":
            w = 1.0 - ac
        elif self.weight_type == "latent-nerf":
            w = (1.0 - ac) * jnp.sqrt(ac)
        elif self.weight_type == "ism":
            w = jnp.sqrt((1.0 - ac) / ac)
        elif self.weight_type == "sjc":
            w = jnp.ones_like(ac)
        else:
            raise NotImplementedError(self.weight_type)
        return w[:, None, None, None]

    # -- the loss ----------------------------------------------------------

    def __call__(
        self,
        params: GuidanceParams,
        images: jnp.ndarray,          # (B, H, W, 3) rendered, grads flow
        text_embeds: jnp.ndarray,     # (B, L, D) view-conditioned prompt
        uncond_embeds: jnp.ndarray,   # (B, L, D) null or negative prompt
        t: jnp.ndarray,               # (B,) int32 timesteps
        key: jax.Array,
        cond_image: Optional[jnp.ndarray] = None,  # (B, 512, 512, 3)
        neg_embeds: Optional[jnp.ndarray] = None,  # for csd/nfsd 3-way CFG
        guidance_scale: Optional[float] = None,
        progress: Optional[jnp.ndarray] = None,    # step/max_iter in [0,1]
    ) -> Dict[str, jnp.ndarray]:
        """Returns dict with 'loss' (scalar — backprop this), 'gradients',
        'latents', 'noise_pred' (reference: __call__, basic.py:778-917)."""
        # run the frozen stack in the embeds' dtype (bf16 policy casts params
        # and embeds together; f32 inputs would silently promote everything
        # back to f32 and halve UNet throughput)
        dt = text_embeds.dtype
        if self.loss_type in ("x0", "x0_final"):
            # pixel-space denoise loss (reference: basic.py:872-877):
            # sources are the (resized) INPUT pixels; targets decode the
            # denoised latents — the VAE is outside the gradient path.
            B, H, W, C = images.shape
            vae_factor = 2 ** (len(self.vae.cfg.block_out_channels) - 1)
            target_hw = self.latent_size * vae_factor
            inputs = images.astype(dt)
            if H != target_hw or W != target_hw:
                inputs = jax.image.resize(
                    inputs, (B, target_hw, target_hw, C), "bilinear")
            latents = self.vae.encode(params.vae, inputs)
            x0 = self._denoised_latents(
                params, jax.lax.stop_gradient(latents), text_embeds,
                uncond_embeds, t, key, cond_image, guidance_scale)
            target = jax.lax.stop_gradient(
                self.vae.decode(params.vae, x0).astype(jnp.float32))
            src = inputs.astype(jnp.float32)
            loss = 0.5 * jnp.sum((src - target) ** 2) / B
            return {"loss": loss, "gradients": src - target,
                    "latents": latents, "target": target}

        latents = self.encode_images(params, images.astype(dt))
        if self.loss_type in ("z0", "z0_final"):
            # latent-space denoise loss (reference: basic.py:864-871, 896-898)
            x0 = self._denoised_latents(
                params, jax.lax.stop_gradient(latents), text_embeds,
                uncond_embeds, t, key, cond_image, guidance_scale)
            target = jax.lax.stop_gradient(x0.astype(jnp.float32))
            src = latents.astype(jnp.float32)
            loss = 0.5 * jnp.sum((src - target) ** 2) / latents.shape[0]
            return {"loss": loss, "gradients": src - target,
                    "latents": latents, "target": target}

        grad = self.latent_gradients(
            params, jax.lax.stop_gradient(latents), text_embeds,
            uncond_embeds, t, key, cond_image=cond_image,
            neg_embeds=neg_embeds, guidance_scale=guidance_scale,
            progress=progress)
        # SpecifyGradient (reference: basic.py:213-226, 900): d loss / d
        # latents == grad; the reduction runs in f32 for gradient fidelity
        loss = jnp.sum(latents.astype(jnp.float32) * grad) / latents.shape[0]
        return {
            "loss": loss,
            "gradients": grad,
            "latents": latents,
            "target": jax.lax.stop_gradient(
                latents.astype(jnp.float32) - grad),
        }

    def _denoised_latents(self, params, lat_sg, text_embeds, uncond_embeds,
                          t, key, cond_image, guidance_scale):
        """Denoise-mode targets: noise to t, CFG eps, one DDIM step on the
        ``denoise_timesteps`` inference grid -> pred_original_sample; the
        ``*_final`` variants keep stepping the grid to t=0 (reference:
        get_denoise_pred, basic.py:468-527 — deterministic DDIM steps here
        instead of the reference's stochastic DDPM ancestral steps)."""
        gs = self.guidance_scale if guidance_scale is None else guidance_scale
        dt = text_embeds.dtype
        gs = jnp.asarray(gs, dt) if isinstance(gs, jnp.ndarray) else gs
        lat_sg = lat_sg.astype(dt)
        noise = jax.random.normal(key, lat_sg.shape, dtype=dt)
        latents_noisy = self.schedule.add_noise(lat_sg, noise, t)
        # snap t to the inference grid (largest grid step <= t — the
        # reference's min-over-bool index trick, basic.py:483-486)
        T = self.schedule.num_train_timesteps
        stride = T // self.denoise_timesteps
        t_grid = (t // stride) * stride
        eps_hat, _, _ = self._cfg_eps(
            params, latents_noisy, t_grid, text_embeds, uncond_embeds,
            cond_image, gs)
        x0 = self.schedule.pred_x0_from_eps(latents_noisy, eps_hat, t_grid)
        if not self.loss_type.endswith("_final"):
            return jax.lax.stop_gradient(x0)

        # iterative refinement: DDIM-walk the remaining grid steps to 0,
        # masked so steps at/above t_grid leave x untouched
        x = self.schedule.ddim_step(latents_noisy, eps_hat, t_grid,
                                    t_grid - stride)

        def body(i, x):
            cur = T - stride - i * stride  # descending grid: T-s, T-2s, ... 0
            cur_b = jnp.full(t_grid.shape, cur, t_grid.dtype)
            eps, _, _ = self._cfg_eps(
                params, x, cur_b, text_embeds, uncond_embeds, cond_image, gs)
            x_next = self.schedule.ddim_step(x, eps, cur_b, cur_b - stride)
            take = (cur_b < t_grid)
            while take.ndim < x.ndim:
                take = take[..., None]
            return jnp.where(take, x_next, x)

        x = jax.lax.fori_loop(0, self.denoise_timesteps, body, x)
        return jax.lax.stop_gradient(x)

    def latent_gradients(
        self,
        params: GuidanceParams,
        lat_sg: jnp.ndarray,          # (B, h, w, 4) latents, NO grad flow
        text_embeds: jnp.ndarray,
        uncond_embeds: jnp.ndarray,
        t: jnp.ndarray,
        key: jax.Array,
        cond_image: Optional[jnp.ndarray] = None,
        neg_embeds: Optional[jnp.ndarray] = None,
        guidance_scale: Optional[float] = None,
        progress: Optional[jnp.ndarray] = None,   # step/max_iter in [0,1]
    ) -> jnp.ndarray:
        """The frozen forward-only half of SDS: eps predictions -> weighted,
        guarded latent gradient (f32). Factored out so train steps can run
        it in its own jit — the UNet never needs to live in the same XLA
        program as the differentiable render (basic.py runs it under
        no_grad for the same reason).

        ``progress`` drives the csd null/neg annealing (basic.py:608-618)
        and the ISM delta_t warmup (basic.py:731-737); it enters as a device
        scalar so schedule changes never retrace."""
        gs = self.guidance_scale if guidance_scale is None else guidance_scale
        dt = text_embeds.dtype
        # gs may be a traced device scalar (the per-step annealed CFG scale,
        # reference: basic.py:404-418); cast to the compute dtype so a f32
        # scalar doesn't silently promote the bf16 eps stack.
        gs = jnp.asarray(gs, dt) if isinstance(gs, jnp.ndarray) else gs
        lat_sg = lat_sg.astype(dt)

        k_noise, k_ism = jax.random.split(key)
        noise = jax.random.normal(k_noise, lat_sg.shape, dtype=dt)
        latents_noisy = self.schedule.add_noise(lat_sg, noise, t)

        if self.loss_type in ("sds", "sjc", "sjc-red"):
            eps_hat, _, eps_text = self._cfg_eps(
                params, latents_noisy, t, text_embeds, uncond_embeds,
                cond_image, gs)
            if self.guidance_rescale > 0.0:
                eps_hat = _rescale_noise_cfg(eps_hat, eps_text,
                                             self.guidance_rescale)
            # sjc-red keeps the full CFG'd score as the gradient — no noise
            # subtraction (reference: basic.py:605-606)
            grad = eps_hat if self.loss_type == "sjc-red" else eps_hat - noise

        elif self.loss_type == "custom":
            # raw condition delta, no CFG scale (reference: basic.py:587-592)
            _, eps_uncond, eps_text = self._cfg_eps(
                params, latents_noisy, t, text_embeds, uncond_embeds,
                cond_image, gs)
            grad = eps_text - eps_uncond
            if self.guidance_rescale > 0.0:
                grad = _rescale_noise_cfg(grad, eps_text,
                                          self.guidance_rescale)

        elif self.loss_type == "csd":
            # classifier score distillation; with ``progress`` the annealed
            # 3-term null/neg mix (reference: basic.py:608-618)
            _, eps_uncond, eps_text = self._cfg_eps(
                params, latents_noisy, t, text_embeds, uncond_embeds,
                cond_image, gs)
            if progress is None or neg_embeds is None:
                grad = eps_text - eps_uncond
            else:
                eps_neg = self._eps(params, latents_noisy, t, neg_embeds,
                                    cond_image)
                p = jnp.asarray(progress, dt)
                grad = eps_text + (-0.5 * p) * eps_uncond \
                    + (-1.0 + 0.5 * p) * eps_neg

        elif self.loss_type == "nfsd":
            assert neg_embeds is not None
            _, eps_uncond, eps_text = self._cfg_eps(
                params, latents_noisy, t, text_embeds, uncond_embeds,
                cond_image, gs)
            eps_neg = self._eps(params, latents_noisy, t, neg_embeds, cond_image)
            delta_domain = jnp.where(
                (t >= 200)[:, None, None, None], eps_uncond - eps_neg, eps_uncond)
            grad = delta_domain + gs * (eps_text - eps_uncond)

        elif self.loss_type == "ism":
            # Interval Score Matching — the reference's two-phase inversion
            # (ism(), basic.py:717-776 + ism_add_noise_with_cfg, 665-715):
            # phase 1 noises x0 to starting_ind and DDIM-inverts with
            # xs_delta_t strides up to t_prev; phase 2 takes ONE inversion
            # step of the annealed delta to t. grad = eps_cfg(x_t, t) -
            # eps_uncond(x_{t_prev}, t_prev) (pred_scores[0]).
            p = jnp.asarray(0.0 if progress is None else progress, jnp.float32)
            warm_up_rate = 1.0 - jnp.minimum(p / self.ism_warmup_frac, 1.0)
            cur_delta = (self.ism_delta_t + jnp.ceil(
                warm_up_rate * (self.ism_delta_t_start - self.ism_delta_t))
            ).astype(t.dtype)
            t_prev = jnp.maximum(t - cur_delta, 0)
            start = jnp.maximum(
                t_prev - self.ism_xs_delta_t * self.ism_xs_inv_steps, 0)
            x_start = self.schedule.add_noise(lat_sg, noise, start)

            def invert(i, carry):
                x, cur = carry
                eps_u = self._eps(params, x, cur, uncond_embeds, cond_image)
                nxt = jnp.minimum(cur + self.ism_xs_delta_t, t_prev)
                # cur == nxt recomposes x identically — the fori_loop stays
                # static-shape where the reference breaks out early
                return (self.schedule.ddim_step(x, eps_u, cur, nxt), nxt)

            xs_prev, _ = jax.lax.fori_loop(
                0, self.ism_xs_inv_steps, invert, (x_start, start))
            xs_prev = jax.lax.stop_gradient(xs_prev)
            eps_prev = jax.lax.stop_gradient(
                self._eps(params, xs_prev, t_prev, uncond_embeds, cond_image))
            xs_t = self.schedule.ddim_step(xs_prev, eps_prev, t_prev, t)
            eps_hat, _, _ = self._cfg_eps(
                params, xs_t, t, text_embeds, uncond_embeds, cond_image, gs)
            grad = eps_hat - eps_prev

        elif self.is_denoising_mode:
            # latent-space denoise gradient (z0 modes); equals the mse-loss
            # gradient of __call__'s reparameterization (basic.py:896-898)
            assert self.loss_type in ("z0", "z0_final"), \
                "x0 modes are pixel-space — use __call__, not latent_gradients"
            x0 = self._denoised_latents(params, lat_sg, text_embeds,
                                        uncond_embeds, t, k_ism, cond_image,
                                        gs)
            return jax.lax.stop_gradient(
                lat_sg.astype(jnp.float32) - x0.astype(jnp.float32))

        else:
            raise NotImplementedError(self.loss_type)

        grad = grad * self._weight(t)

        # latent-gradient guards (reference: basic.py:648-661)
        if self.grad_latent_clip:
            g = jnp.nan_to_num(grad)
            nz = jnp.maximum(jnp.sum(jnp.abs(g) > 0), 1)
            std = jnp.sqrt(jnp.sum(g * g) / nz) * self.grad_latent_clip_scale
            grad = jnp.nan_to_num(jnp.clip(grad, -std, std))
        if self.grad_latent_norm:
            g = jnp.nan_to_num(grad)
            n = jnp.sqrt(jnp.sum(g * g, axis=(1, 2, 3), keepdims=True))
            grad = g / jnp.maximum(n, 1e-8)
        if self.grad_latent_nan_to_num:
            grad = jnp.nan_to_num(grad)

        return jax.lax.stop_gradient(grad).astype(jnp.float32)


def _rescale_noise_cfg(noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray,
                       guidance_rescale: float) -> jnp.ndarray:
    """Rescale CFG'd eps toward the text-branch std (arXiv 2305.08891 §3.4;
    reference: rescale_noise_cfg used at basic.py:462-465, 589-592)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.maximum(jnp.std(noise_cfg, axis=axes, keepdims=True), 1e-8)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


# ---------------------------------------------------------------------------
# Pixel gradient clipping (PGC) — custom_vjp on the rendered image
# ---------------------------------------------------------------------------

def make_pgc(clip_value: float = 0.1, mode: str = "clip"):
    """Identity forward; the backward clips/normalizes per-pixel RGB grads
    (reference: core/guidance/pgc.py:13-41 build_grad_hook_func)."""

    @jax.custom_vjp
    def pgc(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        if mode == "clip":
            return (jnp.clip(g, -clip_value, clip_value),)
        if mode == "std_clip":
            std = jnp.std(g) * clip_value
            return (jnp.clip(g, -std, std),)
        if mode == "normalize":
            n = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
            return (g / jnp.maximum(n, 1e-8) * clip_value,)
        raise NotImplementedError(mode)

    pgc.defvjp(fwd, bwd)
    return pgc


def make_rgb_grad_hook(grad_clip: bool, grad_norm: bool,
                       grad_clip_scale: float = 3.0,
                       with_mask: bool = False):
    """RMS-std clip then global L2 normalize of the rendered-image gradient
    (reference: build_grad_hook_func, pgc.py:13-41).

    ``with_mask``: the hook takes a second (H, W, 1) mask argument (the
    render's weights_sum) — grads are masked before the std statistic, the
    reference's ``--guide.grad_rgb_clip_mask_guidance`` path
    (trainer.py:959-962, pgc.py:19-24). The returned callable carries
    ``wants_mask=True`` so step builders know to pass it.
    """
    if with_mask:
        @jax.custom_vjp
        def hook_m(x, mask):
            return x

        def fwd_m(x, mask):
            return x, mask

        def bwd_m(mask, g):
            out = g
            if grad_clip:
                gz = jnp.nan_to_num(out * mask)
                # the std statistic runs over mask>0.5 pixels ONLY
                # (reference: grad_for_std = grad[mask > 0.5], pgc.py:20-25)
                # — a soft weights_sum mask must not deflate the threshold
                # with its tiny-but-nonzero background entries
                sel = jnp.broadcast_to(mask > 0.5, gz.shape)
                sq = jnp.where(sel, gz * gz, 0.0)
                nz = jnp.maximum(jnp.sum(sel & (gz != 0)), 1)
                std = jnp.sqrt(jnp.sum(sq) / nz) * grad_clip_scale
                out = jnp.nan_to_num(jnp.clip(gz, -std, std))
            if grad_norm:
                n = jnp.sqrt(jnp.sum(out * out))
                out = out / jnp.maximum(n, 1e-8)
            return (out, jnp.zeros_like(mask))

        hook_m.defvjp(fwd_m, bwd_m)
        hook_m.wants_mask = True
        return hook_m

    @jax.custom_vjp
    def hook(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        out = g
        if grad_clip:
            gz = jnp.nan_to_num(out)
            nz = jnp.maximum(jnp.sum(jnp.abs(gz) > 0), 1)
            std = jnp.sqrt(jnp.sum(gz * gz) / nz) * grad_clip_scale
            out = jnp.nan_to_num(jnp.clip(out, -std, std))
        if grad_norm:
            n = jnp.sqrt(jnp.sum(out * out))
            out = out / jnp.maximum(n, 1e-8)
        return (out,)

    hook.defvjp(fwd, bwd)
    return hook


def build_pixel_grad_hook(guide_cfg):
    """Select the image-gradient hook from config, or None
    (reference: the register_hook dispatch, basic.py:795-817 — PGC suppress
    when pgc_clip_rgb >= 0, else the clip/norm hook)."""
    if getattr(guide_cfg, "pgc_clip_rgb", -1.0) is not None \
            and guide_cfg.pgc_clip_rgb >= 0:
        return make_pgc_suppress(guide_cfg.pgc_clip_rgb,
                                 guide_cfg.pgc_suppress_type)
    if guide_cfg.grad_rgb_clip or guide_cfg.grad_rgb_norm:
        return make_rgb_grad_hook(
            guide_cfg.grad_rgb_clip,
            guide_cfg.grad_rgb_norm,
            guide_cfg.grad_rgb_clip_scale,
            with_mask=getattr(guide_cfg, "grad_rgb_clip_mask_guidance",
                              False))
    return None


def make_pgc_suppress(clip_value: float, suppress_type: int = 0):
    """The reference's numbered PGC suppress family as a custom_vjp
    (reference: build_pgc_hook_func, pgc.py:44-79; channel dim last here
    vs the torch CHW dim-1):

    0 pixel-wise clip · 1 clip · 2 global scale · 3 sigmoid ·
    4 PNGD · 5 pixel-max PNGD · other: identity."""

    @jax.custom_vjp
    def pgc(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        c = clip_value
        if suppress_type == 0:
            ratio = jnp.minimum(c / jnp.maximum(jnp.abs(g), 1e-20), 1.0)
            out = g * jnp.min(ratio, axis=-1, keepdims=True)
        elif suppress_type == 1:
            out = jnp.clip(g, -c, c)
        elif suppress_type == 2:
            out = g / jnp.maximum(jnp.max(jnp.abs(g)), 1e-20) * c
        elif suppress_type == 3:
            out = (jax.nn.sigmoid(g) - 0.5) * c
        elif suppress_type == 4:
            out = c * g / (jnp.abs(g) + c)
        elif suppress_type == 5:
            n = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
            out = c * g / (n + c)
        else:
            out = g
        return (out,)

    pgc.defvjp(fwd, bwd)
    return pgc
