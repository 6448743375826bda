"""SDXL family: configs, dual-tower conditioning, and a txt2img sampler.

Beyond the reference (SD-1.5 ControlNet); the SDXL base architecture
(Podell et al., arXiv:2307.01952) reuses this framework's building blocks:
the openaimodel UNet with a per-LEVEL transformer-depth ladder and ADM
conditioning (models/unet.py), the CLIP tower with a pooled/projected
output (models/clip.py), the AutoencoderKL VAE, and the DDIM scan update
(pipeline/ddim.py).

Conditioning contract (sgm GeneralConditioner):
  context = concat(CLIP-L penultimate (B,77,768),
                   OpenCLIP-bigG penultimate (B,77,1280)) -> (B,77,2048)
  y       = concat(bigG pooled (B,1280),
                   fourier(add_time_ids: orig_hw + crop_tl + target_hw,
                           256 each) (B,1536)) -> (B,2816)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.config import (
    CLIPTextConfig,
    DiffusionConfig,
    UNetConfig,
    VAEConfig,
)
from stablediffusioneo_tpu.models.clip import (
    clip_text_apply,
    clip_text_apply_with_pooled,
    clip_text_pooled,
)
from stablediffusioneo_tpu.models.unet import unet_apply
from stablediffusioneo_tpu.ops.schedule import timestep_embedding
from stablediffusioneo_tpu.pipeline.ddim import _cfg_combine, _ddim_update


# ------------------------------------------------------------------ configs


def sdxl_unet() -> UNetConfig:
    """SDXL-base UNet: 3 levels, depth ladder (0, 2, 10), ctx 2048,
    64-ch heads, ADM 2816 (sgm configs/inference/sd_xl_base.yaml)."""
    return UNetConfig(
        model_channels=320,
        channel_mult=(1, 2, 4),
        num_res_blocks=2,
        attention_resolutions=(2, 4),
        transformer_depth=(0, 2, 10),
        context_dim=2048,
        num_head_channels=64,
        adm_in_channels=2816,
    )


def clip_l_sdxl() -> CLIPTextConfig:
    """Tower 1: OpenAI CLIP-L, penultimate hidden WITHOUT the final LN
    (sgm FrozenCLIPEmbedder layer='hidden', layer_idx=11)."""
    return CLIPTextConfig(layer="penultimate_raw")


def clip_bigg_sdxl() -> CLIPTextConfig:
    """Tower 2: OpenCLIP bigG/14 text tower (1280 wide, 32 layers,
    penultimate hidden raw; pooled output through text_projection)."""
    return CLIPTextConfig(
        hidden_size=1280, intermediate_size=5120, num_layers=32,
        num_heads=20, layer="penultimate_raw", act="gelu",
        projection_dim=1280,
    )


def sdxl_vae() -> VAEConfig:
    """Same AutoencoderKL topology as SD-1.x; SDXL scale factor 0.13025."""
    return VAEConfig(scale_factor=0.13025)


@dataclasses.dataclass(frozen=True)
class SDXLConfig:
    unet: UNetConfig = dataclasses.field(default_factory=sdxl_unet)
    clip_l: CLIPTextConfig = dataclasses.field(default_factory=clip_l_sdxl)
    clip_g: CLIPTextConfig = dataclasses.field(default_factory=clip_bigg_sdxl)
    vae: VAEConfig = dataclasses.field(default_factory=sdxl_vae)
    diffusion: DiffusionConfig = dataclasses.field(
        default_factory=DiffusionConfig)
    dtype: str = "bfloat16"


def tiny_sdxl() -> SDXLConfig:
    """Miniature SDXL topology for tests: same structure, tiny widths."""
    unet = UNetConfig(
        model_channels=32, channel_mult=(1, 2, 4), num_res_blocks=2,
        attention_resolutions=(2, 4), transformer_depth=(0, 1, 2),
        context_dim=48, num_head_channels=16, adm_in_channels=16 + 6 * 8,
        groups=8,
    )
    mk = lambda d, p: CLIPTextConfig(  # noqa: E731
        vocab_size=1000, hidden_size=d, intermediate_size=2 * d,
        num_layers=2, num_heads=2, max_length=16, layer="penultimate_raw",
        act="gelu", projection_dim=p)
    return SDXLConfig(
        unet=unet,
        clip_l=mk(32, None),
        clip_g=mk(16, 16),
        vae=VAEConfig(ch=16, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                      groups=8, scale_factor=0.13025),
        dtype="float32",
    )


# -------------------------------------------------------------- conditioning


def add_time_ids(
    original_size: Tuple[int, int],
    crop_coords: Tuple[int, int],
    target_size: Tuple[int, int],
    batch: int,
    fourier_dim: int = 256,
) -> np.ndarray:
    """The SDXL micro-conditioning vector: fourier features of
    (orig_h, orig_w, crop_top, crop_left, target_h, target_w), 256 each
    (sgm ConcatTimestepEmbedderND). Returns (B, 6 * fourier_dim) f32."""
    ids = np.asarray(
        list(original_size) + list(crop_coords) + list(target_size),
        np.float32)
    emb = timestep_embedding(jnp.asarray(ids), fourier_dim)  # (6, F)
    flat = np.asarray(emb).reshape(1, -1)
    return np.repeat(flat, batch, axis=0)


def sdxl_tokenize(tokenizer, texts) -> Tuple[np.ndarray, np.ndarray]:
    """Per-tower token ids from ONE BPE tokenizer (CLIP-L and bigG share
    the 49408 vocab; only the padding convention differs):
      tower 1 (CLIP-L / HF): pad with EOT after the first EOT
      tower 2 (bigG / open_clip.tokenize): pad with ZEROS after EOT
    Returns (ids_l, ids_g), each (B, 77) int32."""
    ids_l = np.asarray(tokenizer(texts))
    ids_g = ids_l.copy()
    for row in ids_g:
        eots = np.nonzero(row == tokenizer.eot)[0]
        if len(eots) > 1:
            row[eots[0] + 1:] = 0
    return ids_l, ids_g


def sdxl_conditioning(
    params: Dict,
    cfg: SDXLConfig,
    ids_l: jax.Array,
    ids_g: jax.Array,
    size_hw: Tuple[int, int],
    original_size: Optional[Tuple[int, int]] = None,
    crop_coords: Tuple[int, int] = (0, 0),
) -> Tuple[jax.Array, jax.Array]:
    """(context (B, 77, 2048), y (B, 2816)) from both towers' token ids.

    The towers share the BPE vocab but differ in padding convention —
    build per-tower ids with sdxl_tokenize. size_hw is the TARGET size;
    original_size defaults to it (the no-crop, native-size conditioning
    that sampling uses)."""
    b = ids_l.shape[0]
    hl = clip_text_apply(params["clip_l"], cfg.clip_l, ids_l)
    # ONE bigG forward yields both halves (context hidden + pooled) —
    # the 32-layer tower is the heaviest text-encode cost in SDXL
    hg, pooled = clip_text_apply_with_pooled(params["clip_g"], cfg.clip_g,
                                             ids_g)
    context = jnp.concatenate([hl, hg], axis=-1)
    tids = jnp.asarray(add_time_ids(
        original_size or size_hw, crop_coords, size_hw, b,
        fourier_dim=(cfg.unet.adm_in_channels
                     - (cfg.clip_g.projection_dim
                        or cfg.clip_g.hidden_size)) // 6))
    y = jnp.concatenate([pooled.astype(jnp.float32), tids], axis=-1)
    return context, y


# ------------------------------------------------------------------ sampler


def sdxl_txt2img_scan(
    unet_params: Dict,
    cfg: SDXLConfig,
    schedule: Dict[str, np.ndarray],
    x_T: jax.Array,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    y_cond: jax.Array,
    y_uncond: jax.Array,
    scale: jax.Array,
    key: jax.Array,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
    inpaint_latent: Optional[jax.Array] = None,
    inpaint_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """DDIM txt2img loop for the (ControlNet-free) SDXL base: CFG batch-2
    through one UNet eval per step, ADM y riding alongside the context.
    Same one-lax.scan structure as pipeline/ddim.ddim_sample_scan.

    inpaint_latent/inpaint_mask enable blended-latent inpainting with the
    same semantics (and key decorrelation) as ddim_sample_scan: mask is
    (B, h, w, 1) in [0, 1] with 1 = generate; mask == 1 everywhere is
    bit-identical to plain sampling, mask == 0 returns inpaint_latent."""
    from stablediffusioneo_tpu.models.unet import precompute_context_kv
    from stablediffusioneo_tpu.pipeline.ddim import _step_noise

    b = x_T.shape[0]
    ctx2 = jnp.concatenate([ctx_cond, ctx_uncond], axis=0)
    y2 = jnp.concatenate([y_cond, y_uncond], axis=0)
    # hoist the step-invariant 2048-wide context K/V projections out of
    # the scan (XLA's LICM does not lift dots; see pipeline/ddim.py)
    ctx_kv = precompute_context_kv(unet_params, cfg.unet, ctx2)
    n_steps = len(schedule["timesteps"])
    consts = (
        jnp.asarray(schedule["timesteps"], jnp.float32),
        jnp.asarray(schedule["alphas"], jnp.float32),
        jnp.asarray(schedule["alphas_prev"], jnp.float32),
        jnp.asarray(schedule["sigmas"], jnp.float32),
        jnp.asarray(schedule["sqrt_one_minus_alphas"], jnp.float32),
        jnp.arange(n_steps, dtype=jnp.int32),
    )

    # kept-region forward-diffusion noise: key decorrelated from the eta
    # noise with the same fold tag as ddim_sample_scan
    if inpaint_latent is not None:
        ikey = (jax.vmap(lambda k: jax.random.fold_in(k, 0x1B9A1))(key)
                if key.ndim == 2 else jax.random.fold_in(key, 0x1B9A1))
    else:
        ikey = None

    def body(x, per_step):
        t = per_step[0]
        t2 = jnp.full((2 * b,), t, jnp.float32)
        x2 = jnp.concatenate([x, x], axis=0)
        eps2 = unet_apply(unet_params, cfg.unet, x2, t2, ctx2, y=y2,
                          ctx_kv=ctx_kv)
        e_c, e_u = eps2[:b], eps2[b:]
        model_out = _cfg_combine(e_c, e_u, scale, x, cfg_rescale)
        x_next = _ddim_update(x, model_out, per_step, key, 1.0,
                              parameterization)
        if inpaint_latent is not None:
            a_prev, step_idx = per_step[2], per_step[5]
            noised = (jnp.sqrt(a_prev)
                      * inpaint_latent.astype(jnp.float32)
                      + jnp.sqrt(1.0 - a_prev)
                      * _step_noise(ikey, step_idx, x_next.shape))
            m = inpaint_mask.astype(jnp.float32)
            x_next = (m * x_next.astype(jnp.float32)
                      + (1.0 - m) * noised).astype(x_next.dtype)
        return x_next, ()

    x0, _ = jax.lax.scan(body, x_T, consts)
    if inpaint_latent is not None:
        m = inpaint_mask.astype(jnp.float32)
        x0 = (m * x0.astype(jnp.float32)
              + (1.0 - m) * inpaint_latent.astype(jnp.float32)
              ).astype(x0.dtype)
    return x0


def sdxl_img2img_latents(
    unet_params: Dict,
    cfg: SDXLConfig,
    schedule: Dict[str, np.ndarray],
    z0: jax.Array,
    t_enc: int,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    y_cond: jax.Array,
    y_uncond: jax.Array,
    scale: jax.Array,
    key: jax.Array,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """SDXL-base img2img: stochastic-encode z0 to the entry step (the last
    t_enc entries of the num_steps discretization — the DDIMSampler.img2img
    convention shared with sd_concat_img2img and the engine img2img
    variant) and denoise the tail with the base UNet.

    Same flow as sdxl_refine_latents but with the BASE model and its
    dual-tower conditioning (the refiner variant carries bigG-only ctx +
    aesthetic-score time ids). The reference has no SDXL at all; this is
    the diffusers StableDiffusionXLImg2ImgPipeline role."""
    from stablediffusioneo_tpu.pipeline.ddim import stochastic_tail_entry

    tail, x_T, key = stochastic_tail_entry(schedule, t_enc, z0, key)
    return sdxl_txt2img_scan(
        unet_params, cfg, tail, x_T, ctx_cond, ctx_uncond, y_cond,
        y_uncond, scale, key, parameterization=parameterization,
        cfg_rescale=cfg_rescale)


# ------------------------------------------------------------------ refiner


def sdxl_refiner_unet() -> UNetConfig:
    """SDXL-refiner UNet (sgm configs/inference/sd_xl_refiner.yaml):
    384 base channels over 4 levels, uniform transformer depth 4 at the
    ds-2/4 attention sites AND the middle block, bigG-only context (1280),
    ADM 2560 (pooled 1280 + 5 x 256 aesthetic/size fourier ids).

    Encoding note: upstream transformer_depth=4 with attention_resolutions
    [2, 4] means level 3 (ds 8) has NO attention sites while the middle
    block still carries a depth-4 transformer. The ladder (0, 4, 4, 4)
    expresses exactly that here: per-level sites are gated on
    `ds in attention_resolutions and depth > 0` and the middle block takes
    depth_for(last level) = 4 (models/unet.py encoder_plan)."""
    return UNetConfig(
        model_channels=384,
        channel_mult=(1, 2, 4, 4),
        num_res_blocks=2,
        attention_resolutions=(2, 4),
        transformer_depth=(0, 4, 4, 4),
        context_dim=1280,
        num_head_channels=64,
        adm_in_channels=2560,
    )


@dataclasses.dataclass(frozen=True)
class SDXLRefinerConfig:
    """The refiner conditions on the bigG tower ONLY (no CLIP-L) and swaps
    the size/crop micro-conditioning tail for (orig_hw, crop_tl,
    aesthetic_score)."""

    unet: UNetConfig = dataclasses.field(default_factory=sdxl_refiner_unet)
    clip_g: CLIPTextConfig = dataclasses.field(default_factory=clip_bigg_sdxl)
    vae: VAEConfig = dataclasses.field(default_factory=sdxl_vae)
    diffusion: DiffusionConfig = dataclasses.field(
        default_factory=DiffusionConfig)
    dtype: str = "bfloat16"


def tiny_sdxl_refiner() -> SDXLRefinerConfig:
    """Miniature refiner topology: 4 levels, no-attn top level feeding a
    transformer middle block, bigG-only conditioning."""
    unet = UNetConfig(
        model_channels=32, channel_mult=(1, 1, 2, 2), num_res_blocks=1,
        attention_resolutions=(2, 4), transformer_depth=(0, 1, 1, 1),
        context_dim=16, num_head_channels=16, adm_in_channels=16 + 5 * 8,
        groups=8,
    )
    return SDXLRefinerConfig(
        unet=unet,
        clip_g=CLIPTextConfig(
            vocab_size=1000, hidden_size=16, intermediate_size=32,
            num_layers=2, num_heads=2, max_length=16,
            layer="penultimate_raw", act="gelu", projection_dim=16),
        vae=VAEConfig(ch=16, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                      groups=8, scale_factor=0.13025),
        dtype="float32",
    )


def refiner_add_time_ids(
    original_size: Tuple[int, int],
    crop_coords: Tuple[int, int],
    aesthetic_score: float,
    batch: int,
    fourier_dim: int = 256,
) -> np.ndarray:
    """Refiner micro-conditioning: fourier features of (orig_h, orig_w,
    crop_top, crop_left, aesthetic_score), 5 ids (sgm refiner conditioner:
    the target-size pair is replaced by the aesthetic score). Returns
    (B, 5 * fourier_dim) f32."""
    ids = np.asarray(
        list(original_size) + list(crop_coords) + [aesthetic_score],
        np.float32)
    emb = timestep_embedding(jnp.asarray(ids), fourier_dim)  # (5, F)
    flat = np.asarray(emb).reshape(1, -1)
    return np.repeat(flat, batch, axis=0)


def sdxl_refiner_conditioning(
    params: Dict,
    cfg: SDXLRefinerConfig,
    ids_g: jax.Array,
    size_hw: Tuple[int, int],
    aesthetic_score: float = 6.0,
    original_size: Optional[Tuple[int, int]] = None,
    crop_coords: Tuple[int, int] = (0, 0),
) -> Tuple[jax.Array, jax.Array]:
    """(context (B, 77, 1280), y (B, 2560)) for ONE CFG branch.

    The refiner's cond/uncond branches differ in aesthetic score too, not
    just the prompt (sgm defaults: 6.0 for cond, 2.5 for uncond) — call
    once per branch. ids_g uses the bigG padding convention
    (sdxl_tokenize's second output)."""
    b = ids_g.shape[0]
    hg, pooled = clip_text_apply_with_pooled(params["clip_g"], cfg.clip_g,
                                             ids_g)
    proj = cfg.clip_g.projection_dim or cfg.clip_g.hidden_size
    tids = jnp.asarray(refiner_add_time_ids(
        original_size or size_hw, crop_coords, aesthetic_score, b,
        fourier_dim=(cfg.unet.adm_in_channels - proj) // 5))
    y = jnp.concatenate([pooled.astype(jnp.float32), tids], axis=-1)
    return hg, y


def sdxl_refine_latents(
    unet_params: Dict,
    cfg: SDXLRefinerConfig,
    schedule: Dict[str, np.ndarray],
    z0: jax.Array,
    t_enc: int,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    y_cond: jax.Array,
    y_uncond: jax.Array,
    scale: jax.Array,
    key: jax.Array,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """Refine base-model latents: stochastic-encode z0 to the entry step
    (the last t_enc entries of the num_steps discretization, the
    DDIMSampler.img2img convention) and run the refiner UNet over the
    tail — the SDXL base->refiner ensemble-of-experts handoff in LATENT
    space (both stages share the VAE, so no decode/re-encode).
    Entry-step noising via pipeline.ddim.stochastic_tail_entry (shared
    with sd_concat_img2img and the engine img2img variant)."""
    from stablediffusioneo_tpu.pipeline.ddim import stochastic_tail_entry

    tail, x_T, key = stochastic_tail_entry(schedule, t_enc, z0, key)
    return sdxl_txt2img_scan(
        unet_params, cfg, tail, x_T, ctx_cond, ctx_uncond, y_cond,
        y_uncond, scale, key, parameterization=parameterization,
        cfg_rescale=cfg_rescale)
