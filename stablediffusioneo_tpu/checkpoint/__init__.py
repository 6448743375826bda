"""Checkpoint IO: torch-pickle / safetensors readers and key-mapping to JAX.

Replaces the reference's `load_state_dict` (cldm/model.py:8-21) and the
missing-from-snapshot `ldm/models` instantiation. The ONNX stage of the
reference's pipeline disappears entirely: original `.pth`/`.safetensors`
checkpoints load straight into the JAX param trees.
"""

from stablediffusioneo_tpu.checkpoint.torch_reader import load_torch_state_dict
from stablediffusioneo_tpu.checkpoint.convert import (
    convert_unet,
    convert_controlnet,
    convert_vae,
    convert_clip,
    load_controlnet_pipeline,
    load_sdxl_pipeline,
    load_sdxl_refiner_pipeline,
    load_depth2img_pipeline,
    load_inpaint_pipeline,
    load_sd_pipeline,
)
from stablediffusioneo_tpu.checkpoint.diffusers import (
    convert_clip_diffusers,
    convert_clip_g_diffusers,
    convert_unet_diffusers,
    convert_vae_diffusers,
)
from stablediffusioneo_tpu.checkpoint.textual_inversion import (
    add_concepts,
    apply_textual_inversion,
    load_concept,
)

__all__ = [
    "load_torch_state_dict",
    "convert_unet",
    "convert_controlnet",
    "convert_vae",
    "convert_clip",
    "convert_unet_diffusers",
    "convert_vae_diffusers",
    "convert_clip_diffusers",
    "convert_clip_g_diffusers",
    "load_controlnet_pipeline",
    "load_sdxl_pipeline",
    "load_sdxl_refiner_pipeline",
    "load_depth2img_pipeline",
    "load_inpaint_pipeline",
    "load_sd_pipeline",
    "load_concept",
    "add_concepts",
    "apply_textual_inversion",
]
