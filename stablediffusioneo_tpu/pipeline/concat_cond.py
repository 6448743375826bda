"""Concat-conditioned SD models — depth2img and dedicated inpainting.

LDM "hybrid" conditioning: extra channels are concatenated to the latent
at EVERY UNet call. Two shipped model families use it:

  * **depth2img** (SD-2.0 `512-depth-ema`): in_channels = 5 — the 4 latent
    channels + 1 MiDaS depth channel, normalized per-sample to [-1, 1] at
    latent resolution. The reference vendors the full MiDaS DPT
    implementation inside `ldm/modules/midas/` (a byte-level duplicate of
    `annotator/midas/`) precisely to serve this model — the rebuild
    reuses its single `annotators.midas_hybrid` DPT tower instead.
  * **inpainting** (`sd-v1-5-inpainting` / SD-2.0-inpainting): in_channels
    = 9 — latent + 1 mask channel (1 = region to repaint, downsampled to
    latent resolution) + the 4-channel VAE latent of the masked image.

Both ride the existing UNet unchanged (`UNetConfig.in_channels` drives the
conv_in width; checkpoint/convert.py's topology-driven mapping handles the
5/9-channel conv_in with no special cases) and the same one-`lax.scan`
DDIM loop shape as pipeline/ddim.py: CFG batch-2, context K/V hoisted,
per-step constants as scan inputs. The concat channels are step-invariant,
so they concatenate ONCE outside the scan and ride the carry untouched.

Distinct from pipeline/ddim.py's blended-latent inpainting (which works
with ANY 4-channel checkpoint by re-imposing the kept region per step):
this module runs the dedicated inpainting *checkpoints*, which were
fine-tuned to consume the mask/masked-image channels directly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.config import UNetConfig, VAEConfig
from stablediffusioneo_tpu.models.unet import precompute_context_kv, unet_apply
from stablediffusioneo_tpu.models.vae import vae_encode
from stablediffusioneo_tpu.pipeline.ddim import _cfg_combine, _ddim_update


def sd_concat_sample_scan(
    unet_params: Dict,
    ucfg: UNetConfig,
    schedule: Dict[str, np.ndarray],
    x_T: jax.Array,
    c_concat: jax.Array,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    scale: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """DDIM loop for a concat-conditioned (ControlNet-free) SD UNet.

    c_concat: (B, h, w, k) latent-resolution conditioning channels with
    k = ucfg.in_channels - 4 (1 for depth2img, 5 for inpainting). Both CFG
    branches consume the same c_concat (upstream gradio depth2img/inpaint
    behavior: the unconditional pass keeps the image conditioning).
    schedule: DiffusionSchedule.ddim(steps, eta) dict in sampling order —
    eta > 0 adds the usual DDIM noise via `key` (one PRNGKey or (B, 2)
    per-sample keys). Returns x0 latents (B, h, w, 4)."""
    b = x_T.shape[0]
    want = ucfg.in_channels - 4
    if c_concat.shape[-1] != want:
        raise ValueError(
            f"c_concat has {c_concat.shape[-1]} channels; this UNet "
            f"(in_channels={ucfg.in_channels}) expects {want}")
    ctx2 = jnp.concatenate([ctx_cond, ctx_uncond], axis=0)
    ctx_kv = precompute_context_kv(unet_params, ucfg, ctx2)
    cc2 = jnp.concatenate([c_concat, c_concat], axis=0).astype(x_T.dtype)
    n_steps = len(schedule["timesteps"])
    consts = (
        jnp.asarray(schedule["timesteps"], jnp.float32),
        jnp.asarray(schedule["alphas"], jnp.float32),
        jnp.asarray(schedule["alphas_prev"], jnp.float32),
        jnp.asarray(schedule["sigmas"], jnp.float32),
        jnp.asarray(schedule["sqrt_one_minus_alphas"], jnp.float32),
        jnp.arange(n_steps, dtype=jnp.int32),
    )

    def body(x, per_step):
        t2 = jnp.full((2 * b,), per_step[0], jnp.float32)
        x2 = jnp.concatenate([x, x], axis=0)
        xin = jnp.concatenate([x2, cc2], axis=-1)
        eps2 = unet_apply(unet_params, ucfg, xin, t2, ctx2, ctx_kv=ctx_kv)
        e_c, e_u = eps2[:b], eps2[b:]
        model_out = _cfg_combine(e_c, e_u, scale, x, cfg_rescale)
        x_next = _ddim_update(x, model_out, per_step, key, temperature,
                              parameterization)
        return x_next, ()

    x0, _ = jax.lax.scan(body, x_T, consts)
    return x0


def sd_concat_img2img(
    unet_params: Dict,
    ucfg: UNetConfig,
    schedule: Dict[str, np.ndarray],
    z0: jax.Array,
    t_enc: int,
    c_concat: jax.Array,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    scale: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """The upstream depth2img flow (gradio_depth2img.py semantics): the
    init image's latent z0 is stochastic-encoded to the entry step (the
    last t_enc entries of the num_steps discretization) and only the tail
    runs, with the conditioning channels concatenated at every eval —
    denoise strength = t_enc / num_steps. Same handoff as
    models.sdxl.sdxl_refine_latents (shared stochastic_tail_entry)."""
    from stablediffusioneo_tpu.pipeline.ddim import stochastic_tail_entry

    tail, x_T, key = stochastic_tail_entry(schedule, t_enc, z0, key)
    return sd_concat_sample_scan(
        unet_params, ucfg, tail, x_T, c_concat, ctx_cond, ctx_uncond,
        scale, key, temperature=temperature,
        parameterization=parameterization, cfg_rescale=cfg_rescale)


def sd_txt2img_scan(
    unet_params: Dict,
    ucfg: UNetConfig,
    schedule: Dict[str, np.ndarray],
    x_T: jax.Array,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    scale: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """Plain (ControlNet-free, concat-free) SD txt2img DDIM loop for the
    SD-1.x/2.x families — the stock LatentDiffusion sampling path the
    reference's gitignored `ldm/models/diffusion/ddpm.py` provided.
    Same structure as the ControlNet scan minus the control branch: one
    `lax.scan`, CFG batch-2, context K/V hoisted. The SDXL equivalent
    (with ADM y conditioning) is models/sdxl.sdxl_txt2img_scan."""
    b = x_T.shape[0]
    ctx2 = jnp.concatenate([ctx_cond, ctx_uncond], axis=0)
    ctx_kv = precompute_context_kv(unet_params, ucfg, ctx2)
    n_steps = len(schedule["timesteps"])
    consts = (
        jnp.asarray(schedule["timesteps"], jnp.float32),
        jnp.asarray(schedule["alphas"], jnp.float32),
        jnp.asarray(schedule["alphas_prev"], jnp.float32),
        jnp.asarray(schedule["sigmas"], jnp.float32),
        jnp.asarray(schedule["sqrt_one_minus_alphas"], jnp.float32),
        jnp.arange(n_steps, dtype=jnp.int32),
    )

    def body(x, per_step):
        t2 = jnp.full((2 * b,), per_step[0], jnp.float32)
        x2 = jnp.concatenate([x, x], axis=0)
        eps2 = unet_apply(unet_params, ucfg, x2, t2, ctx2, ctx_kv=ctx_kv)
        e_c, e_u = eps2[:b], eps2[b:]
        model_out = _cfg_combine(e_c, e_u, scale, x, cfg_rescale)
        x_next = _ddim_update(x, model_out, per_step, key, temperature,
                              parameterization)
        return x_next, ()

    x0, _ = jax.lax.scan(body, x_T, consts)
    return x0


def depth_to_concat(depth: jax.Array, latent_hw) -> jax.Array:
    """MiDaS depth map -> the depth2img conditioning channel.

    depth: (B, H, W) or (B, H, W, 1) raw (unnormalized) MiDaS output.
    Bicubic-resized to latent resolution then normalized PER SAMPLE to
    [-1, 1] via min/max (the LatentDepth2ImageDiffusion convention: depth
    is relative, so each sample spans the full range). Returns
    (B, h, w, 1) float32."""
    d = depth.astype(jnp.float32)
    if d.ndim == 3:
        d = d[..., None]
    h, w = latent_hw
    d = jax.image.resize(d, (d.shape[0], h, w, 1), method="bicubic")
    lo = jnp.min(d, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(d, axis=(1, 2, 3), keepdims=True)
    return 2.0 * (d - lo) / jnp.maximum(hi - lo, 1e-6) - 1.0


def inpaint_to_concat(
    vae_params: Dict,
    vcfg: VAEConfig,
    image: jax.Array,
    mask: jax.Array,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """(image, mask) -> the 5 inpainting conditioning channels.

    image: (B, H, W, 3) in [-1, 1]; mask: (B, H, W) or (B, H, W, 1) in
    [0, 1], 1 = region to REPAINT. The masked image (kept pixels only) is
    VAE-encoded (posterior mode when key is None, else a sample) and
    scaled to LatentDiffusion units; the mask is nearest-downsampled to
    latent resolution. Returns (B, h, w, 5): [mask, masked_latent] in the
    runway sd-inpainting concat order (c_cat = cat([mask, masked_image]))."""
    m = mask.astype(jnp.float32)
    if m.ndim == 3:
        m = m[..., None]
    masked = image.astype(jnp.float32) * (1.0 - m)
    dist = vae_encode(vae_params, vcfg, masked.astype(image.dtype))
    z = (dist.mode() if key is None else dist.sample(key)).astype(jnp.float32)
    z = z * vcfg.scale_factor
    h, w = z.shape[1], z.shape[2]
    m_lat = jax.image.resize(m, (m.shape[0], h, w, 1), method="nearest")
    return jnp.concatenate([m_lat, z], axis=-1)
