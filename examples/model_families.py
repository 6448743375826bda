"""Tour of the model families beyond ControlNet-SD1.5, on tiny configs:
plain SD txt2img, SDXL base -> refiner handoff, SD-2.0-style depth2img,
the dedicated 9-channel inpainting checkpoints, and the sampler set
(PLMS / DPM++ / UniPC / Euler / Euler-a / Heun).

    JAX_PLATFORMS=cpu python examples/model_families.py   (~4 min CPU)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu" and jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_unet, init_vae
from stablediffusioneo_tpu.models.sdxl import (
    sdxl_refine_latents,
    sdxl_txt2img_scan,
    tiny_sdxl,
    tiny_sdxl_refiner,
)
from stablediffusioneo_tpu.models.vae import vae_decode, vae_encode
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.concat_cond import (
    depth_to_concat,
    inpaint_to_concat,
    sd_concat_img2img,
    sd_concat_sample_scan,
    sd_txt2img_scan,
)

rng = np.random.default_rng(0)
cfg = tiny_pipeline()
sched = DiffusionSchedule().ddim(4)
ctxd = cfg.unet.context_dim


def ctx(b=1, d=None):
    return jnp.asarray(
        rng.standard_normal((b, 5, d or ctxd)).astype(np.float32))


def latent(b=1):
    return jnp.asarray(rng.standard_normal((b, 8, 8, 4)).astype(np.float32))


# ---- 1. plain (ControlNet-free) SD txt2img --------------------------------
up = init_unet(jax.random.PRNGKey(0), cfg.unet)
vp = init_vae(jax.random.PRNGKey(1), cfg.vae)
z = sd_txt2img_scan(up, cfg.unet, sched, latent(), ctx(), ctx(),
                    jnp.asarray(7.5), jax.random.PRNGKey(2))
img = vae_decode(vp, cfg.vae, z, scaled=True)
print(f"1. plain txt2img: {img.shape}  (load real weights with "
      "checkpoint.load_sd_pipeline)")

# ---- 2. SDXL base -> refiner (latent handoff) -----------------------------
bx, rx = tiny_sdxl(), tiny_sdxl_refiner()
b_up = init_unet(jax.random.PRNGKey(3), bx.unet)
r_up = init_unet(jax.random.PRNGKey(4), rx.unet)
y_b = jnp.asarray(rng.standard_normal((1, bx.unet.adm_in_channels)).astype(np.float32))
y_r = jnp.asarray(rng.standard_normal((1, rx.unet.adm_in_channels)).astype(np.float32))
z_base = sdxl_txt2img_scan(b_up, bx, sched, latent(),
                           ctx(d=bx.unet.context_dim), ctx(d=bx.unet.context_dim),
                           y_b, y_b, jnp.asarray(5.0), jax.random.PRNGKey(5))
z_ref = sdxl_refine_latents(r_up, rx, sched, z_base, 2,
                            ctx(d=rx.unet.context_dim), ctx(d=rx.unet.context_dim),
                            y_r, y_r, jnp.asarray(5.0), jax.random.PRNGKey(6))
print(f"2. SDXL base -> refiner: {z_base.shape} -> {z_ref.shape}  "
      "(loaders: load_sdxl_pipeline / load_sdxl_refiner_pipeline)")

# ---- 3. depth2img (5-channel hybrid conditioning) -------------------------
dcfg = dataclasses.replace(cfg.unet, in_channels=5)
d_up = init_unet(jax.random.PRNGKey(7), dcfg)
depth = jnp.asarray(rng.random((1, 64, 64), dtype=np.float32))  # MiDaS out
cc = depth_to_concat(depth, (8, 8))
src = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32) * 2 - 1)
z0 = vae_encode(vp, cfg.vae, src).mode() * cfg.vae.scale_factor
z = sd_concat_img2img(d_up, dcfg, sched, z0, 3, cc, ctx(), ctx(),
                      jnp.asarray(9.0), jax.random.PRNGKey(8))
print(f"3. depth2img (denoise strength 3/4): {z.shape}  "
      "(load_depth2img_pipeline bundles the MiDaS tower)")

# ---- 4. dedicated 9-channel inpainting checkpoint -------------------------
icfg = dataclasses.replace(cfg.unet, in_channels=9)
i_up = init_unet(jax.random.PRNGKey(9), icfg)
mask = np.zeros((1, 64, 64), np.float32)
mask[:, 16:48, 16:48] = 1.0  # 1 = repaint
cc5 = inpaint_to_concat(vp, cfg.vae, src, jnp.asarray(mask))
z = sd_concat_sample_scan(i_up, icfg, sched, latent(), cc5, ctx(), ctx(),
                          jnp.asarray(9.0), jax.random.PRNGKey(10))
print(f"4. inpainting model: {z.shape}  (load_inpaint_pipeline; "
      "distinct from the any-checkpoint blended-latent path)")

# ---- 5. the sampler set through the flagship pipeline ---------------------
from stablediffusioneo_tpu.models import init_clip_text, init_controlnet
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

ks = jax.random.split(jax.random.PRNGKey(11), 4)
pipe = Canny2ImagePipeline(
    {"unet": init_unet(ks[0], cfg.unet),
     "controlnet": init_controlnet(ks[1], cfg.controlnet),
     "vae": init_vae(ks[2], cfg.vae),
     "clip": init_clip_text(ks[3], cfg.clip)},
    toy_tokenizer(max_length=cfg.clip.max_length), cfg,
    persistent_cache=False)
hint = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
for sampler in ("ddim", "plms", "dpmpp-karras", "unipc", "euler-a", "heun"):
    out = pipe.process(hint, "a bird", num_samples=1, image_resolution=64,
                       ddim_steps=2, seed=1, sampler=sampler)[1]
    print(f"5. sampler {sampler:13s}: {out.shape} mean {out.mean():.1f}")
print("done.")
