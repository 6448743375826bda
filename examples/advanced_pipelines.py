"""Tour of the beyond-reference pipeline surface on the tiny config:
img2img, blended-latent inpainting, prompt emphasis, textual inversion,
multi-ControlNet, and the Karras DPM++ spacing — all through the same
fused AOT engines as production.

    JAX_PLATFORMS=cpu python examples/advanced_pipelines.py   (~4 min CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu" and jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env

from stablediffusioneo_tpu.annotators.canny import CannyDetector
from stablediffusioneo_tpu.annotators.hed import HEDdetector
from stablediffusioneo_tpu.checkpoint import apply_textual_inversion
from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import (
    init_clip_text, init_controlnet, init_unet, init_vae,
)
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline


def main():
    cfg = tiny_pipeline()
    ks = jax.random.split(jax.random.PRNGKey(0), 5)

    # random-weight demo nets; re-randomized so every output gate is live
    # (zero_module init would make the pipeline prompt/control-independent)
    def rnd(tree, key):
        cnt = iter(jax.random.split(key, 4096))
        return jax.tree.map(
            lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * 0.05,
            tree)

    unet = rnd(init_unet(ks[0], cfg.unet), ks[0])
    cn1 = rnd(init_controlnet(ks[1], cfg.controlnet), ks[1])
    cn2 = rnd(init_controlnet(ks[2], cfg.controlnet), ks[2])
    vae = init_vae(ks[3], cfg.vae)
    clip = init_clip_text(ks[4], cfg.clip)
    tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                        max_length=cfg.clip.max_length)

    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    kw = dict(num_samples=1, image_resolution=64, ddim_steps=2, seed=7)

    # ---- single-net pipeline: emphasis, img2img, inpaint, karras
    pipe = Canny2ImagePipeline(
        {"unet": unet, "controlnet": cn1, "vae": vae, "clip": clip},
        tok, cfg, persistent_cache=False)
    out = pipe.process(img, "a (majestic:1.4) bird", prompt_emphasis=True,
                       **kw)[1]
    print("prompt emphasis:", out.shape)
    out = pipe.process(img, "a bird", init_image=img, denoise_strength=0.5,
                       **kw)[1]
    print("img2img:", out.shape)
    mask = np.zeros((64, 64), np.uint8)
    mask[:, 32:] = 255
    out = pipe.process(img, "a bird", inpaint_image=img, inpaint_mask=mask,
                       **kw)[1]
    print("inpaint:", out.shape)
    out = pipe.process(img, "a bird", sampler="dpmpp-karras", **kw)[1]
    print("dpm++ 2m karras:", out.shape)

    # ---- textual inversion into the live runtime
    vec = rng.standard_normal((2, cfg.clip.hidden_size)).astype(np.float32)
    n = apply_textual_inversion(pipe.runtime, tok, {"<thing>": vec * 0.02})
    out = pipe.process(img, "a photo of <thing>", **kw)[1]
    print(f"textual inversion ({n} vectors):", out.shape)

    # ---- multi-ControlNet: canny + HED hints, per-net strengths
    multi = Canny2ImagePipeline(
        {"unet": unet, "controlnet": (cn1, cn2), "vae": vae, "clip": clip},
        tok, cfg, persistent_cache=False,
        annotator=[CannyDetector(), HEDdetector()])
    out = multi.process(img, "a bird", strength=(1.0, 0.5), **kw)[1]
    print("multi-controlnet:", out.shape,
          f"({len(multi.last_detected_maps)} hint maps)")


if __name__ == "__main__":
    main()
