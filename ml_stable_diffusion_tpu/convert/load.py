"""Checkpoint loading: HF-diffusers-layout directories -> TPU pipelines.

The TPU analog of the reference's conversion driver + pipeline assembly
(torch2coreml.py get_pipeline :1485-1513 incl. custom-VAE override :1489,
pipeline.py get_coreml_pipe :607-698): reads ``model_index.json`` to pick the
family, parses each submodule's diffusers ``config.json`` into our configs,
loads (possibly sharded) safetensors state dicts, and ports them into Flax
pytrees.  Works fully offline on a local checkout — there is no network
dependency.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax.numpy as jnp

from ..models.clip import CLIPTextConfig, CLIPTextEncoder
from ..models.mmdit import MMDiT, MMDiTConfig
from ..models.t5 import T5Config, T5Encoder
from ..models.unet import UNetConfig, UNet2DConditionModel
from ..models.vae import VAEConfig, VAEDecoder, VAEEncoder
from ..tokenizer import CLIPTokenizer
from .clip import port_clip_text_encoder
from .t5 import port_t5_encoder
from .unet import port_unet
from .vae import port_vae_decoder, port_vae_encoder

logger = logging.getLogger(__name__)


def load_safetensors_state_dict(module_dir: str | Path) -> dict:
    """Load a (possibly sharded) diffusers-layout safetensors state dict.

    Arrays are zero-copy read-only mmap views (convert/native_io): porting
    transposes/reshapes them into fresh buffers, so checkpoints page in
    lazily and are never duplicated in host RAM."""
    from .native_io import load_file

    module_dir = Path(module_dir)
    index = None
    for cand in module_dir.glob("*.safetensors.index.json"):
        index = json.loads(cand.read_text())
        break
    sd = {}
    if index is not None:
        for fname in sorted(set(index["weight_map"].values())):
            sd.update(load_file(str(module_dir / fname)))
    else:
        files = sorted(module_dir.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"no safetensors in {module_dir}")
        for f in files:
            sd.update(load_file(str(f)))
    return sd


def _config_json(module_dir: Path) -> dict:
    return json.loads((module_dir / "config.json").read_text())


def unet_config_from_diffusers(cfg: dict) -> UNetConfig:
    n = len(cfg["block_out_channels"])

    def per_block(v, default):
        v = cfg.get(v, default)
        return tuple(v) if isinstance(v, (list, tuple)) else (v,) * n

    # diffusers' attention_head_dim is historically the HEAD COUNT for the
    # SD family (num_attention_heads when that key is absent)
    heads = cfg.get("num_attention_heads") or cfg["attention_head_dim"]
    heads = tuple(heads) if isinstance(heads, (list, tuple)) else (heads,) * n
    return UNetConfig(
        in_channels=cfg["in_channels"],
        out_channels=cfg.get("out_channels", cfg["in_channels"]),
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        # ControlNet checkpoints have no up blocks
        up_block_types=tuple(cfg.get("up_block_types", ())),
        layers_per_block=cfg.get("layers_per_block", 2),
        transformer_layers_per_block=per_block("transformer_layers_per_block", 1),
        num_attention_heads=heads,
        cross_attention_dim=cfg["cross_attention_dim"],
        norm_num_groups=cfg.get("norm_num_groups", 32),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256),
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim", 2816),
        time_cond_proj_dim=cfg.get("time_cond_proj_dim"),
    )


def vae_config_from_diffusers(cfg: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        use_quant_conv=cfg.get("use_quant_conv", True),
    )


def clip_config_from_diffusers(cfg: dict, with_projection: bool = False) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        eos_token_id=cfg.get("eos_token_id", 49407),
        use_text_projection=with_projection,
        projection_dim=cfg.get("projection_dim", 1280),
    )


def t5_config_from_diffusers(cfg: dict) -> T5Config:
    return T5Config(
        vocab_size=cfg["vocab_size"],
        d_model=cfg["d_model"],
        d_kv=cfg["d_kv"],
        d_ff=cfg["d_ff"],
        num_layers=cfg["num_layers"],
        num_heads=cfg["num_heads"],
    )


def scheduler_config_from_diffusers(cfg: dict) -> "SchedulerConfig":
    """Parse a diffusers ``scheduler/scheduler_config.json`` into our
    SchedulerConfig.  The reference takes its scheduler straight from the
    diffusers pipe (pipeline.py:57-80, 730-735) so e.g. a v_prediction
    checkpoint (SD-2.1 768-v) denoises correctly without user flags."""
    from ..schedulers.base import (BetaSchedule, PredictionType,
                                   SchedulerConfig, TimestepSpacing)

    beta_schedule = {
        "linear": BetaSchedule.LINEAR,
        "scaled_linear": BetaSchedule.SCALED_LINEAR,
        "scaledLinear": BetaSchedule.SCALED_LINEAR,
    }.get(cfg.get("beta_schedule", "scaled_linear"))
    if beta_schedule is None:
        raise ValueError(
            f"unsupported beta_schedule {cfg.get('beta_schedule')!r}")
    spacing = TimestepSpacing(cfg.get("timestep_spacing", "leading"))
    return SchedulerConfig(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=beta_schedule,
        prediction_type=PredictionType(cfg.get("prediction_type", "epsilon")),
        steps_offset=cfg.get("steps_offset", 1),
        timestep_spacing=spacing,
    )


def load_scheduler_config(checkpoint_dir: str | Path):
    """Read <checkpoint>/scheduler/scheduler_config.json if present; None
    otherwise (callers fall back to SD defaults)."""
    path = Path(checkpoint_dir) / "scheduler" / "scheduler_config.json"
    if not path.exists():
        return None
    return scheduler_config_from_diffusers(json.loads(path.read_text()))


def load_safety_checker(module_dir: str | Path, dtype=jnp.float32):
    """HF safety_checker/ directory -> (SafetyChecker, params).
    Reference converts (torch2coreml.py:1119) and loads it
    (coreml_model.py:184-186) as a first-class pipeline module."""
    from ..models.safety import SafetyChecker
    from .safety import port_safety_checker, safety_config_from_diffusers

    import dataclasses

    module_dir = Path(module_dir)
    cfg = safety_config_from_diffusers(_config_json(module_dir))
    sd = load_safetensors_state_dict(module_dir)
    # concept-bank sizes exist only as buffer shapes in HF checkpoints
    cfg = dataclasses.replace(
        cfg, num_concepts=sd["concept_embeds"].shape[0],
        num_special_care=sd["special_care_embeds"].shape[0])
    return SafetyChecker(cfg, dtype=dtype), port_safety_checker(sd, cfg)


def _is_projection_encoder(module_dir: Path) -> bool:
    cfg = _config_json(module_dir)
    return "CLIPTextModelWithProjection" in (cfg.get("architectures") or [])


def load_text_encoder(module_dir: str | Path, dtype=jnp.float32,
                      with_projection: bool | None = None):
    module_dir = Path(module_dir)
    if with_projection is None:
        with_projection = _is_projection_encoder(module_dir)
    cfg = clip_config_from_diffusers(_config_json(module_dir), with_projection)
    sd = load_safetensors_state_dict(module_dir)
    params = port_clip_text_encoder(sd, cfg)
    return CLIPTextEncoder(cfg, dtype=dtype), params


def load_unet(module_dir: str | Path, dtype=jnp.bfloat16,
              fuse_qkv: bool = False):
    import dataclasses

    module_dir = Path(module_dir)
    cfg = unet_config_from_diffusers(_config_json(module_dir))
    sd = load_safetensors_state_dict(module_dir)
    params = port_unet(sd, cfg)
    if fuse_qkv:
        from .optimize import fuse_qkv_params

        cfg = dataclasses.replace(cfg, fuse_qkv=True)
        params = fuse_qkv_params(params)
    if dtype == jnp.bfloat16:
        import jax

        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if hasattr(x, "astype") else x, params)
    return UNet2DConditionModel(cfg, dtype=dtype), params


def load_vae(module_dir: str | Path, dtype=jnp.float32):
    module_dir = Path(module_dir)
    cfg = vae_config_from_diffusers(_config_json(module_dir))
    sd = load_safetensors_state_dict(module_dir)
    dec = (VAEDecoder(cfg, dtype=dtype), port_vae_decoder(sd, cfg))
    enc = (VAEEncoder(cfg, dtype=dtype), port_vae_encoder(sd, cfg))
    return dec, enc


def load_controlnet(module_dir: str | Path, dtype=jnp.bfloat16):
    """diffusers ControlNet directory -> (model, params).

    Dispatches on config.json ``_class_name``: UNet-family ControlNetModel
    (reference convert_controlnet torch2coreml.py:1317; base-model
    compatibility is the caller's concern :1330-1342) or SD3ControlNetModel
    (models/controlnet_sd3.py — beyond the reference)."""
    import jax

    module_dir = Path(module_dir)
    raw = _config_json(module_dir)
    sd = load_safetensors_state_dict(module_dir)
    if "SD3" in raw.get("_class_name", ""):
        from ..models.controlnet_sd3 import (
            SD3ControlNetConfig,
            SD3ControlNetModel,
        )
        from .mmdit import port_sd3_controlnet

        # NB mmdit.depth here is the control branch's own num_layers (the
        # controlnet config.json has no record of the paired MMDiT's depth);
        # SD3ControlNetConfig documents that this field is unused.
        cfg = SD3ControlNetConfig(
            mmdit=mmdit_config_from_diffusers(raw),
            num_layers=raw["num_layers"],
            force_zeros_for_pooled_projection=raw.get(
                "force_zeros_for_pooled_projection", True))
        model = SD3ControlNetModel(cfg, dtype=dtype)
        params = port_sd3_controlnet(sd, cfg)
    else:
        from ..models.controlnet import ControlNetModel
        from .controlnet import port_controlnet

        ucfg = unet_config_from_diffusers(raw)
        model = ControlNetModel(ucfg, dtype=dtype)
        params = port_controlnet(sd, ucfg)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if hasattr(x, "astype") else x, params)
    return model, params


def mmdit_config_from_diffusers(cfg: dict) -> MMDiTConfig:
    return MMDiTConfig(
        patch_size=cfg.get("patch_size", 2),
        in_channels=cfg.get("in_channels", 16),
        out_channels=cfg.get("out_channels", 16),
        depth=cfg["num_layers"],
        hidden_size=(cfg.get("attention_head_dim", 64)
                     * cfg["num_attention_heads"]),
        num_heads=cfg["num_attention_heads"],
        context_dim=cfg.get("joint_attention_dim", 4096),
        pooled_dim=cfg.get("pooled_projection_dim", 2048),
        pos_embed_max_size=cfg.get("pos_embed_max_size", 192),
        qk_norm=cfg.get("qk_norm") is not None,
    )


def load_mmdit(module_dir: str | Path, dtype=jnp.bfloat16):
    """diffusers SD3 transformer/ directory -> (MMDiT, params)
    (reference convert_mmdit torch2coreml.py:1053)."""
    from .mmdit import port_mmdit

    module_dir = Path(module_dir)
    cfg = mmdit_config_from_diffusers(_config_json(module_dir))
    sd = load_safetensors_state_dict(module_dir)
    params = port_mmdit(sd, cfg)
    if dtype == jnp.bfloat16:
        import jax

        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if hasattr(x, "astype") else x, params)
    return MMDiT(cfg, dtype=dtype), params


def load_t5(module_dir: str | Path, dtype=jnp.bfloat16):
    module_dir = Path(module_dir)
    cfg = t5_config_from_diffusers(_config_json(module_dir))
    sd = load_safetensors_state_dict(module_dir)
    return T5Encoder(cfg, dtype=dtype), port_t5_encoder(sd, cfg)


def load_pipeline(checkpoint_dir: str | Path, custom_vae_dir=None,
                  refiner_dir=None, controlnet_dirs=(),
                  compute_dtype=jnp.bfloat16, fuse_qkv: bool = False,
                  multilingual_encoder=None, mesh=None):
    """Assemble a pipeline from a diffusers-layout checkpoint directory.

    Family is read from model_index.json ``_class_name`` (SD / SDXL / SD3).
    ``custom_vae_dir`` overrides the bundled VAE (reference --custom-vae-version,
    torch2coreml.py:1489-1513).
    ``mesh``: optional jax.sharding.Mesh — the assembled pipeline is sharded
    across it (pipe.shard) so generation runs multi-chip under GSPMD.
    """
    from ..pipelines.sd import StableDiffusionPipeline
    from ..pipelines.sdxl import StableDiffusionXLPipeline

    def _finish(pipe):
        return pipe.shard(mesh) if mesh is not None else pipe

    root = Path(checkpoint_dir)
    index = json.loads((root / "model_index.json").read_text())
    family = index["_class_name"]

    tok = CLIPTokenizer.from_pretrained_dir(root / "tokenizer")
    vae_dir = Path(custom_vae_dir) if custom_vae_dir else root / "vae"
    dec, enc = load_vae(vae_dir)
    # scheduler constants come from the checkpoint (reference pipeline.py:57-80)
    sched_cfg = load_scheduler_config(root)
    # safety checker is a first-class optional module (coreml_model.py:184-186)
    safety = (load_safety_checker(root / "safety_checker")
              if (root / "safety_checker" / "config.json").exists() else None)
    if multilingual_encoder is not None and ("XL" in family
                                             or "StableDiffusion3" in family):
        raise ValueError("multilingual text encoding is an SD 1.x/2.x "
                         "feature (reference Resources.swift:73-88)")

    if "XL" in family:
        tok2 = CLIPTokenizer.from_pretrained_dir(root / "tokenizer_2",
                                                 pad_token="!")
        te = (load_text_encoder(root / "text_encoder")
              if (root / "text_encoder").exists() else None)
        te2 = load_text_encoder(root / "text_encoder_2", with_projection=True)
        unet = load_unet(root / "unet", dtype=compute_dtype, fuse_qkv=fuse_qkv)
        refiner = (load_unet(Path(refiner_dir) / "unet", dtype=compute_dtype,
                             fuse_qkv=fuse_qkv)
                   if refiner_dir else None)
        return _finish(StableDiffusionXLPipeline(
            tokenizer=tok, tokenizer2=tok2, text_encoder=te,
            text_encoder2=te2, unet=unet, refiner_unet=refiner,
            vae_decoder=dec, vae_encoder=enc, safety_checker=safety,
            scheduler_config=sched_cfg,
            force_zeros_for_empty_prompt=index.get(
                "force_zeros_for_empty_prompt", True)))
    if "StableDiffusion3" in family:
        from ..pipelines.sd3 import StableDiffusion3Pipeline
        from ..tokenizer.t5 import T5Tokenizer

        tok2 = CLIPTokenizer.from_pretrained_dir(root / "tokenizer_2",
                                                 pad_token="!")
        te = load_text_encoder(root / "text_encoder", with_projection=True)
        te2 = load_text_encoder(root / "text_encoder_2", with_projection=True)
        t5 = t5_tok = None
        if (root / "text_encoder_3").exists():
            t5 = load_t5(root / "text_encoder_3", dtype=compute_dtype)
            t5_tok = T5Tokenizer(root / "tokenizer_3" / "tokenizer.json")
        mmdit = load_mmdit(root / "transformer", dtype=compute_dtype)
        controlnets = [load_controlnet(d, dtype=compute_dtype)
                       for d in controlnet_dirs]
        return _finish(StableDiffusion3Pipeline(
            tokenizer=tok, tokenizer2=tok2, t5_tokenizer=t5_tok,
            text_encoder=te, text_encoder2=te2, t5_encoder=t5,
            mmdit=mmdit, vae_decoder=dec, vae_encoder=enc,
            safety_checker=safety, scheduler_config=sched_cfg,
            controlnets=controlnets))

    te = load_text_encoder(root / "text_encoder")
    unet = load_unet(root / "unet", dtype=compute_dtype, fuse_qkv=fuse_qkv)
    controlnets = [load_controlnet(d, dtype=compute_dtype)
                   for d in controlnet_dirs]
    return _finish(StableDiffusionPipeline(
        tokenizer=tok, text_encoder=te, unet=unet,
        vae_decoder=dec, vae_encoder=enc, safety_checker=safety,
        scheduler_config=sched_cfg,
        multilingual_encoder=multilingual_encoder,
        controlnets=controlnets))


def load_pipeline_from_artifacts(artifact_dir: str | Path,
                                 compute_dtype=jnp.bfloat16, mesh=None):
    """Assemble a pipeline (SD / SDXL / SD3) from a converted artifact bundle
    (cli/convert.py output) — the analog of the reference loading compiled
    .mlmodelc Resources/ (coreml_model.py get_resource_type/_load_mlpackage;
    full module set per StableDiffusionPipeline+Resources.swift:11-44 and
    XL/SD3 +Resources.swift).

    Palettized modules (manifest "palettized" entries) are installed for
    compressed serving: HBM keeps indices+LUT, the program dequantizes at
    entry (install_palettized).
    """
    from ..models.controlnet import ControlNetModel
    from ..models.safety import SafetyChecker, SafetyCheckerConfig
    from ..pipelines.sd import StableDiffusionPipeline
    from .artifacts import load_module

    root = Path(artifact_dir)
    bundle = {}
    if (root / "bundle.json").exists():
        bundle = json.loads((root / "bundle.json").read_text())
    family = bundle.get("family", "StableDiffusionPipeline")
    sched_cfg = (scheduler_config_from_diffusers(bundle["scheduler"])
                 if bundle.get("scheduler") else None)

    def has(name):
        return (root / f"{name}.safetensors").exists()

    def module(name, model_cls, cfg_cls, dtype, dequantize=True):
        params, manifest = load_module(root, name=name, dequantize=dequantize)
        cfg = cfg_cls(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in manifest["config"].items()})
        return (model_cls(cfg, dtype=dtype), params,
                bool(manifest.get("palettized")))

    def denoiser(name, model_cls, cfg_cls):
        """Load a (possibly palettized) denoiser; -> ((model, dense), pal)."""
        model, params, is_pal = module(name, model_cls, cfg_cls,
                                       compute_dtype, dequantize=False)
        if is_pal:
            return (model, None), params
        return (model, params), None

    def controlnet(cn_name):
        """Class-aware ControlNet reconstruction (manifest config_class:
        UNet-family ControlNetModel or SD3ControlNetModel)."""
        params, manifest = load_module(root, name=cn_name)
        conf = {k: tuple(v) if isinstance(v, list) else v
                for k, v in manifest["config"].items()}
        if manifest.get("config_class") == "SD3ControlNetConfig":
            from ..models.controlnet_sd3 import (
                SD3ControlNetConfig,
                SD3ControlNetModel,
            )

            cfg = SD3ControlNetConfig(
                mmdit=MMDiTConfig(**dict(conf["mmdit"])),
                num_layers=conf["num_layers"],
                force_zeros_for_pooled_projection=conf.get(
                    "force_zeros_for_pooled_projection", True))
            return (SD3ControlNetModel(cfg, dtype=compute_dtype), params)
        return (ControlNetModel(UNetConfig(**conf), dtype=compute_dtype),
                params)

    safety = None
    if has("SafetyChecker"):
        model, params, _ = module("SafetyChecker", SafetyChecker,
                                  SafetyCheckerConfig, jnp.float32)
        safety = (model, params)

    dec_m, dec_p, _ = module("VAEDecoder", VAEDecoder, VAEConfig, jnp.float32)
    dec = (dec_m, dec_p)
    enc = None
    if has("VAEEncoder"):
        enc_m, enc_p, _ = module("VAEEncoder", VAEEncoder, VAEConfig,
                                 jnp.float32)
        enc = (enc_m, enc_p)

    def finish(pipe, pal_map):
        for key, pal in pal_map.items():
            if pal is not None:
                pipe.install_palettized(key, pal, dtype=compute_dtype)
        return pipe.shard(mesh) if mesh is not None else pipe

    if "XL" in family:
        from ..pipelines.sdxl import StableDiffusionXLPipeline

        tok = (CLIPTokenizer.from_pretrained_dir(root)
               if (root / "vocab.json").exists() else None)
        tok2 = CLIPTokenizer.from_pretrained_dir(root / "tokenizer_2",
                                                 pad_token="!")
        te = None
        if has("TextEncoder"):
            m, p, _ = module("TextEncoder", CLIPTextEncoder, CLIPTextConfig,
                             jnp.float32)
            te = (m, p)
        m2, p2, _ = module("TextEncoder2", CLIPTextEncoder, CLIPTextConfig,
                           jnp.float32)
        unet, unet_pal = denoiser("Unet", UNet2DConditionModel, UNetConfig)
        refiner = refiner_pal = None
        if has("RefinerUnet"):
            refiner, refiner_pal = denoiser("RefinerUnet",
                                            UNet2DConditionModel, UNetConfig)
        pipe = StableDiffusionXLPipeline(
            tokenizer=tok, tokenizer2=tok2, text_encoder=te,
            text_encoder2=(m2, p2), unet=unet, refiner_unet=refiner,
            vae_decoder=dec, vae_encoder=enc, safety_checker=safety,
            scheduler_config=sched_cfg,
            force_zeros_for_empty_prompt=bundle.get(
                "force_zeros_for_empty_prompt", True))
        return finish(pipe, {"unet": unet_pal, "refiner": refiner_pal})

    if "StableDiffusion3" in family:
        from ..pipelines.sd3 import StableDiffusion3Pipeline
        from ..tokenizer.t5 import T5Tokenizer

        tok = CLIPTokenizer.from_pretrained_dir(root)
        tok2 = CLIPTokenizer.from_pretrained_dir(root / "tokenizer_2",
                                                 pad_token="!")
        m1, p1, _ = module("TextEncoder", CLIPTextEncoder, CLIPTextConfig,
                           jnp.float32)
        m2, p2, _ = module("TextEncoder2", CLIPTextEncoder, CLIPTextConfig,
                           jnp.float32)
        t5 = t5_tok = None
        if has("TextEncoderT5"):
            tm, tp, _ = module("TextEncoderT5", T5Encoder, T5Config,
                               compute_dtype)
            t5 = (tm, tp)
            t5_tok = T5Tokenizer(root / "tokenizer_3" / "tokenizer.json")
        mmdit, mmdit_pal = denoiser("MMDiT", MMDiT, MMDiTConfig)
        pipe = StableDiffusion3Pipeline(
            tokenizer=tok, tokenizer2=tok2, t5_tokenizer=t5_tok,
            text_encoder=(m1, p1), text_encoder2=(m2, p2), t5_encoder=t5,
            mmdit=mmdit, vae_decoder=dec, vae_encoder=enc,
            safety_checker=safety, scheduler_config=sched_cfg,
            controlnets=[controlnet(n)
                         for n in bundle.get("controlnets", ())])
        return finish(pipe, {"unet": mmdit_pal})

    tok = CLIPTokenizer.from_pretrained_dir(root)
    m, p, _ = module("TextEncoder", CLIPTextEncoder, CLIPTextConfig,
                     jnp.float32)
    unet, unet_pal = denoiser("Unet", UNet2DConditionModel, UNetConfig)
    controlnets = [controlnet(n) for n in bundle.get("controlnets", ())]
    pipe = StableDiffusionPipeline(
        tokenizer=tok, text_encoder=(m, p), unet=unet, vae_decoder=dec,
        vae_encoder=enc, safety_checker=safety, scheduler_config=sched_cfg,
        controlnets=controlnets)
    return finish(pipe, {"unet": unet_pal})
