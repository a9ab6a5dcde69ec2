"""SDXL pipeline (base + optional refiner), TPU-native.

Capability parity with the reference's StableDiffusionXLPipeline.swift:
- dual text encoders with penultimate-layer taps, concatenated 768+1280 ->
  2048 context (encodePrompt :285-313; conversion tap torch2coreml.py:416-428)
- pooled text embedding + time-ids micro-conditioning (generateConditioning
  :315-363): base = size+crop+target_size, refiner = size+crop+aestheticScore
- force_zeros_for_empty_prompt (reference pipeline.py:183-187)
- refiner ensemble-of-denoisers handoff at refiner_start (:206-225), realized
  as two consecutive scans sharing scheduler state — the refiner attends only
  to the 1280-dim encoder-2 context (cross_attention_dim 1280)
- SDXL latent scale 0.13025 (main.swift:124)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import PipelineConfiguration
from .sd import TEXT_LEN, StableDiffusionPipeline


class StableDiffusionXLPipeline(StableDiffusionPipeline):
    default_latent_scale = 0.13025

    def __init__(self, *, tokenizer, tokenizer2, text_encoder=None,
                 text_encoder2, unet, refiner_unet=None, vae_decoder,
                 vae_encoder=None, safety_checker=None, controlnets=(),
                 scheduler_config=None, force_zeros_for_empty_prompt=True):
        # text_encoder (OpenAI ViT-L) is optional: refiner-only setups omit it
        # (reference StableDiffusionXL+Resources.swift:60-65)
        super().__init__(tokenizer=tokenizer,
                         text_encoder=text_encoder or (None, None),
                         unet=unet, vae_decoder=vae_decoder,
                         vae_encoder=vae_encoder,
                         safety_checker=safety_checker,
                         controlnets=controlnets,
                         scheduler_config=scheduler_config)
        self.tokenizer2 = tokenizer2
        self.text_encoder2, self.text_encoder2_params = text_encoder2
        self.refiner_unet, self.refiner_unet_params = refiner_unet or (None, None)
        self.force_zeros_for_empty_prompt = force_zeros_for_empty_prompt

    # -- text -----------------------------------------------------------------

    def _tokenize(self, cfg: PipelineConfiguration):
        neg, pos = self._prompt_lists(cfg)
        from ..tokenizer.prompt_weights import empty_chunk_row
        from .sd import _tokenize_chunked

        out = {}
        ids2, w2, any_w2 = _tokenize_chunked(self.tokenizer2, neg + pos)
        if self.text_encoder is not None:
            ids1, w1, any_w1 = _tokenize_chunked(self.tokenizer, neg + pos)
            # the two encoders run over the SAME window count (their hidden
            # states concatenate per window)
            k1 = ids1.shape[1] if ids1.ndim == 3 else 1
            k2 = ids2.shape[1] if ids2.ndim == 3 else 1
            k = max(k1, k2)

            def _to_k(ids, w, tok):
                if k == 1:
                    return ids, w
                if ids.ndim == 2:
                    ids, w = ids[:, None], w[:, None]
                pad = k - ids.shape[1]
                if pad:
                    B = ids.shape[0]
                    empty = np.tile(empty_chunk_row(tok, TEXT_LEN),
                                    (B, pad, 1))
                    ids = np.concatenate([ids, empty], axis=1)
                    w = np.concatenate(
                        [w, np.ones((B, pad, TEXT_LEN), np.float32)], axis=1)
                return ids, w

            ids1, w1 = _to_k(ids1, w1, self.tokenizer)
            ids2, w2 = _to_k(ids2, w2, self.tokenizer2)
            out["ids"] = ids1
            if any_w1:
                out["weights"] = w1
        out["ids2"] = ids2
        if any_w2:
            out["weights2"] = w2
        # static flag: zero out empty negative embeddings (pipeline.py:183-187)
        out["zero_negative"] = np.asarray(
            self.force_zeros_for_empty_prompt and all(t == "" for t in neg))
        return out

    def _params_bundle(self) -> dict:
        b = super()._params_bundle()
        b["text_encoder2"] = self.text_encoder2_params
        if self.refiner_unet is not None:
            b["refiner"] = self.refiner_unet_params
        return b

    _PARAM_ATTRS = StableDiffusionPipeline._PARAM_ATTRS + (
        "text_encoder2_params", "refiner_unet_params")

    def _phase_module_key(self, call_unet) -> str:
        return "refiner" if call_unet == self._call_refiner else "unet"

    def _encode_text(self, cfg: PipelineConfiguration, token_inputs: dict,
                     bundle: dict) -> dict:
        from .sd import _reseq, apply_prompt_weights, encode_text_chunked

        out2, shape3 = encode_text_chunked(
            lambda i: self.text_encoder2.apply(
                {"params": bundle["text_encoder2"]}, i),
            token_inputs["ids2"])
        ctx2 = out2["penultimate_hidden_state"]
        pooled = out2["pooled_output"]
        if shape3 is not None:
            ctx2 = _reseq(ctx2, shape3)
            # pooled conditioning comes from the FIRST window
            pooled = pooled.reshape(shape3[0], shape3[1], -1)[:, 0]
        if "weights2" in token_inputs:
            w2 = token_inputs["weights2"]
            ctx2 = apply_prompt_weights(ctx2, w2.reshape(w2.shape[0], -1))
        if self.text_encoder is not None:
            out1, shape31 = encode_text_chunked(
                lambda i: self.text_encoder.apply(
                    {"params": bundle["text_encoder"]}, i),
                token_inputs["ids"])
            ctx1 = out1["penultimate_hidden_state"]
            if shape31 is not None:
                ctx1 = _reseq(ctx1, shape31)
            if "weights" in token_inputs:
                w1 = token_inputs["weights"]
                ctx1 = apply_prompt_weights(ctx1,
                                            w1.reshape(w1.shape[0], -1))
            # concat [1,S,768]+[1,S,1280] -> 2048 (XLPipeline:285-313)
            ctx = jnp.concatenate([ctx1, ctx2], axis=-1)
        else:
            ctx = ctx2
        zero_neg = token_inputs["zero_negative"]
        neg_mask = jnp.where(zero_neg, 0.0, 1.0)
        half = ctx.shape[0] // 2  # negative rows are the first half
        ctx = ctx.at[:half].multiply(neg_mask)
        pooled = pooled.at[:half].multiply(neg_mask)
        return {"context": ctx, "context2": ctx2, "pooled": pooled}

    # -- phases -----------------------------------------------------------------

    def _refiner_cut(self, cfg: PipelineConfiguration, num_steps: int) -> int:
        if self.refiner_unet is None:
            return num_steps
        return min(num_steps, max(0, int(cfg.refiner_start * num_steps)))

    def _denoise_phases(self, cfg: PipelineConfiguration, num_steps: int):
        cut = self._refiner_cut(cfg, num_steps)
        phases = []
        if cut > 0:
            phases.append((0, cut, self._call_unet))
        if cut < num_steps:
            phases.append((cut, num_steps, self._call_refiner))
        return phases

    def _call_refiner(self, bundle, latents, t, context, added_cond,
                      down_res, mid_res, **unet_kw):
        return self.refiner_unet.apply(
            {"params": bundle["refiner"]}, latents, t, context,
            added_cond=added_cond, down_block_residuals=down_res,
            mid_block_residual=mid_res, **unet_kw)

    def _phase_unet(self, call_unet):
        if call_unet == self._call_refiner:
            return self.refiner_unet
        return self.unet

    def _phase_conditioning(self, cfg, text, N, call_unet):
        is_refiner = call_unet == self._call_refiner

        ctx = text["context2"] if is_refiner else text["context"]
        ctx_neg, ctx_pos = self._split_neg_pos(ctx, N)
        pooled_neg, pooled_pos = self._split_neg_pos(text["pooled"], N)

        osz = cfg.original_size or (1024, 1024)
        tsz = cfg.target_size or (1024, 1024)
        crop = cfg.crops_coords_top_left
        if is_refiner:
            # size+crop+aestheticScore, [2,5] (XLPipeline:326-344)
            ids_pos = [osz[0], osz[1], crop[0], crop[1], cfg.aesthetic_score]
            ids_neg = [osz[0], osz[1], crop[0], crop[1],
                       cfg.negative_aesthetic_score]
        else:
            # size+crop+targetSize (XLPipeline:346-358)
            ids_pos = [osz[0], osz[1], crop[0], crop[1], tsz[0], tsz[1]]
            ids_neg = ids_pos
        time_ids_pos = jnp.broadcast_to(
            jnp.asarray(ids_pos, jnp.float32), (N, len(ids_pos)))
        time_ids_neg = jnp.broadcast_to(
            jnp.asarray(ids_neg, jnp.float32), (N, len(ids_neg)))
        added_neg = {"text_embeds": pooled_neg, "time_ids": time_ids_neg}
        added_pos = {"text_embeds": pooled_pos, "time_ids": time_ids_pos}
        return ctx_neg, ctx_pos, added_neg, added_pos

    def _conditioning_cache_key(self, cfg):
        neg, _ = self._prompt_lists(cfg)
        return (cfg.original_size, cfg.target_size, cfg.crops_coords_top_left,
                cfg.aesthetic_score, cfg.negative_aesthetic_score,
                round(cfg.refiner_start, 4), all(t == "" for t in neg))
