"""Functional JAX model definitions for the four CNSD networks.

Each model exposes `init_<name>(key, cfg) -> params` (random init, torch
default distributions) and `<name>_apply(params, cfg, ...) -> outputs`.
Params are nested dicts of jnp arrays; checkpoint/convert.py maps the
original torch state-dicts onto these trees.
"""

from stablediffusioneo_tpu.models.unet import init_unet, unet_apply
from stablediffusioneo_tpu.models.controlnet import (
    init_controlnet,
    controlnet_apply,
    controlled_unet_apply,
)
from stablediffusioneo_tpu.models.vae import (
    init_vae,
    vae_decode,
    vae_encode,
    DiagonalGaussian,
)
from stablediffusioneo_tpu.models.clip import init_clip_text, clip_text_apply
from stablediffusioneo_tpu.models.t5 import (
    T5Config,
    clip_t5_encode,
    convert_t5,
    init_t5,
    t5_encode,
)

__all__ = [
    "T5Config",
    "clip_t5_encode",
    "convert_t5",
    "init_t5",
    "t5_encode",
    "init_unet",
    "unet_apply",
    "init_controlnet",
    "controlnet_apply",
    "controlled_unet_apply",
    "init_vae",
    "vae_decode",
    "vae_encode",
    "DiagonalGaussian",
    "init_clip_text",
    "clip_text_apply",
    "clip_text_pooled",
]

from stablediffusioneo_tpu.models.clip import clip_text_pooled  # noqa: E402
