from .report import compute_psnr, report_correctness, ABSOLUTE_MIN_PSNR
from .clip import port_clip_text_encoder
from .unet import port_unet
from .vae import port_vae_decoder, port_vae_encoder
from .controlnet import port_controlnet
from .t5 import port_t5_encoder
from .mmdit import port_mmdit, port_sd3_controlnet
from .artifacts import save_module, load_module
from .lora import LoRAAdapter, load_lora, merge_lora_into_params
from .load import (
    load_pipeline,
    load_pipeline_from_artifacts,
    load_safetensors_state_dict,
    load_text_encoder,
    load_unet,
    load_vae,
    load_controlnet,
    load_t5,
    load_mmdit,
    load_safety_checker,
    load_scheduler_config,
    scheduler_config_from_diffusers,
)

__all__ = [
    "compute_psnr",
    "report_correctness",
    "ABSOLUTE_MIN_PSNR",
    "port_clip_text_encoder",
    "port_unet",
    "port_vae_decoder",
    "port_vae_encoder",
    "port_controlnet",
    "port_t5_encoder",
    "port_mmdit",
    "port_sd3_controlnet",
    "save_module",
    "load_module",
    "load_pipeline",
    "load_pipeline_from_artifacts",
    "load_safetensors_state_dict",
    "load_text_encoder",
    "load_unet",
    "load_vae",
    "load_controlnet",
    "load_t5",
    "load_mmdit",
    "load_safety_checker",
    "load_scheduler_config",
    "scheduler_config_from_diffusers",
    "LoRAAdapter",
    "load_lora",
    "merge_lora_into_params",
]
