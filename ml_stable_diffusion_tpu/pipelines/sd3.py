"""SD3 pipeline (MMDiT + triple text encoders + rectified flow).

Capability parity with the reference's StableDiffusion3Pipeline.swift:
- CLIP-L + CLIP-G + optional T5 (:16-18); prompt embedding = concat(L,G) ->
  zero-pad 2048->4096 -> concat T5 along sequence (:213-249, giving
  [B, 77+T5_len, 4096]); pooled = concat(projected L, projected G) = 2048
  (:261-264)
- DiscreteFlowScheduler only, float timesteps (:131-133, :153)
- SD3 latent scale 1.5305 / shift 0.0609 (main.swift:137-139)
- 16-channel VAE (VAEConfig.sd3())
- latent->RGB preview path (decodePreviewImage :327-394) via
  utils.latent_preview

Note: the reference concatenates [pos, neg] with matching reversed guidance
(:258, :293-310).  Internally we keep the [neg, pos] convention used by the
SD/XL paths — the guidance arithmetic is identical.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..schedulers import DiscreteFlowScheduler
from .config import PipelineConfiguration
from .sd import TEXT_LEN, StableDiffusionPipeline


class StableDiffusion3Pipeline(StableDiffusionPipeline):
    default_latent_scale = 1.5305
    default_latent_shift = 0.0609
    latent_channels = 16
    #: MMDiT is a uniform transformer stack — no shallow/deep UNet split
    #: for DeepCache-style feature reuse
    supports_deepcache = False

    def __init__(self, *, tokenizer, tokenizer2, t5_tokenizer=None,
                 text_encoder, text_encoder2, t5_encoder=None, mmdit,
                 vae_decoder, vae_encoder=None, safety_checker=None,
                 controlnets=(), scheduler_config=None,
                 t5_sequence_length: int = 77):
        if controlnets and vae_encoder is None:
            raise ValueError("SD3 ControlNet conditions on VAE-encoded "
                             "control latents; pass vae_encoder")
        super().__init__(tokenizer=tokenizer, text_encoder=text_encoder,
                         unet=mmdit, vae_decoder=vae_decoder,
                         vae_encoder=vae_encoder,
                         safety_checker=safety_checker,
                         controlnets=controlnets,
                         scheduler_config=scheduler_config)
        self.tokenizer2 = tokenizer2
        self.t5_tokenizer = t5_tokenizer
        self.text_encoder2, self.text_encoder2_params = text_encoder2
        self.t5_encoder, self.t5_encoder_params = t5_encoder or (None, None)
        self.t5_sequence_length = t5_sequence_length
        self.context_dim = self.unet.config.context_dim

    #: text_encoder2/t5 params must ride along for offload/shard
    _PARAM_ATTRS = StableDiffusionPipeline._PARAM_ATTRS + (
        "text_encoder2_params", "t5_encoder_params")

    #: SD3 LoRA adapters address the MMDiT as "transformer"
    #: (diffusers-PEFT naming); it lives in unet_params here
    _LORA_DENOISER_TARGET = "transformer"

    # -- scheduler: rectified flow only (reference :131-133) --------------------

    def _make_scheduler(self, cfg: PipelineConfiguration):
        if cfg.scheduler == "PNDM":  # the config default -> family default
            cfg.scheduler = "DiscreteFlow"
        if cfg.scheduler not in ("DiscreteFlow",):
            raise ValueError("SD3 supports only the DiscreteFlow scheduler "
                             "(reference StableDiffusion3Pipeline.swift:131-133)")
        return DiscreteFlowScheduler(self.scheduler_config,
                                     shift=cfg.timestep_shift)

    # -- text --------------------------------------------------------------------

    def _tokenize(self, cfg: PipelineConfiguration):
        neg, pos = self._prompt_lists(cfg)
        out = {
            "ids": np.stack([self.tokenizer.tokenize(t, max_length=TEXT_LEN)[0]
                             for t in neg + pos]),
            "ids2": np.stack([
                self.tokenizer2.tokenize(t, max_length=TEXT_LEN)[0]
                for t in neg + pos]),
        }
        if self.t5_encoder is not None:
            L = self.t5_sequence_length
            rows = [self.t5_tokenizer.tokenize(t, max_length=L)
                    for t in neg + pos]
            out["ids_t5"] = np.stack([r[0] for r in rows])
            out["mask_t5"] = np.stack([r[1] for r in rows])
        return out

    def _params_bundle(self) -> dict:
        b = super()._params_bundle()
        b["text_encoder2"] = self.text_encoder2_params
        if self.t5_encoder is not None:
            b["t5"] = self.t5_encoder_params
        return b

    def _encode_text(self, cfg: PipelineConfiguration, token_inputs: dict,
                     bundle: dict) -> dict:
        out1 = self.text_encoder.apply(
            {"params": bundle["text_encoder"]}, token_inputs["ids"])
        out2 = self.text_encoder2.apply(
            {"params": bundle["text_encoder2"]}, token_inputs["ids2"])
        clip_ctx = jnp.concatenate([out1["penultimate_hidden_state"],
                                    out2["penultimate_hidden_state"]], axis=-1)
        # zero-pad the CLIP context up to the MMDiT context width (:224-240)
        pad = self.context_dim - clip_ctx.shape[-1]
        clip_ctx = jnp.pad(clip_ctx, ((0, 0), (0, 0), (0, pad)))
        L = self.t5_sequence_length
        if self.t5_encoder is not None:
            t5 = self.t5_encoder.apply({"params": bundle["t5"]},
                                       token_inputs["ids_t5"],
                                       token_inputs["mask_t5"])
            # truncatedT5Embeds (:402-418): the T5 block is always exactly L
            # positions, truncating longer encoder outputs
            t5_states = t5["encoder_hidden_states"][:, :L]
        else:
            # reference substitutes a ZERO T5 block rather than shrinking the
            # context: [1, 4096, 1, 77] of zeros (:219), so the MMDiT always
            # sees 77+L positions
            t5_states = jnp.zeros(
                (clip_ctx.shape[0], L, self.context_dim), clip_ctx.dtype)
        ctx = jnp.concatenate([clip_ctx, t5_states], axis=1)
        pooled = jnp.concatenate([out1["pooled_output"],
                                  out2["pooled_output"]], axis=-1)
        return {"context": ctx, "pooled": pooled}

    # -- denoiser ------------------------------------------------------------------

    def _call_unet(self, bundle, latents, t, context, added_cond, down_res,
                   mid_res):
        return self.unet.apply({"params": bundle["unet"]}, latents, t,
                               context, added_cond["pooled"],
                               controlnet_residuals=down_res)

    # -- SD3 ControlNet (models/controlnet_sd3.py; beyond the reference) -------

    def _prepare_control_inputs(self, bundle, cfg, ctrl_images):
        """VAE-encode the RGB control images to latents once per program
        (the control branch patch-embeds latents, not pixels).  Uses the
        distribution MEAN (deterministic).  Encoding convention is keyed on
        each net's force_zeros_for_pooled_projection (ecosystem
        StableDiffusion3ControlNetPipeline): InstantX nets get ``mean *
        scale`` with NO shift; SD3.5-family nets get ``(mean - shift) *
        scale``."""
        scale = cfg.encoder_scale_factor or self.default_latent_scale
        out = []
        for ci, im in enumerate(ctrl_images):
            moments = self.vae_encoder.apply(
                {"params": bundle["vae_encoder"]}, im)
            mean = jnp.split(moments, 2, axis=-1)[0]
            cn_model, _ = self.controlnets[ci]
            if not cn_model.config.force_zeros_for_pooled_projection:
                mean = mean - self.default_latent_shift
            out.append(mean * scale)
        return out

    def _call_controlnet(self, bundle, ci, latents_in, t, ctx_pos, added_pos,
                         ctrl_latents):
        cn_model, _ = self.controlnets[ci]
        pooled = added_pos["pooled"]
        if cn_model.config.force_zeros_for_pooled_projection:
            # InstantX SD3 nets were trained with zeroed pooled projections
            pooled = jnp.zeros_like(pooled)
        return cn_model.apply(
            {"params": bundle["controlnets"][ci]}, latents_in, t, ctx_pos,
            pooled, ctrl_latents)

    def _phase_conditioning(self, cfg, text, N, call_unet):
        ctx_neg, ctx_pos = self._split_neg_pos(text["context"], N)
        pooled_neg, pooled_pos = self._split_neg_pos(text["pooled"], N)
        return (ctx_neg, ctx_pos,
                {"pooled": pooled_neg}, {"pooled": pooled_pos})

    def _conditioning_cache_key(self, cfg):
        return (self.t5_encoder is not None,)
