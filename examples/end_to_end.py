"""Minimal canny2image bring-up — the examples_python.py equivalent.

With no checkpoint path set this runs random weights at tiny scale (flow
demo); point SDEO_CKPT at a control_sd15_canny.pth (+ SDEO_TOKENIZER at a
CLIP vocab dir) for real generation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from stablediffusioneo_tpu.config import sd15_pipeline, tiny_pipeline
    from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

    ckpt = os.environ.get("SDEO_CKPT")
    if ckpt:
        from stablediffusioneo_tpu.checkpoint import load_controlnet_pipeline
        from stablediffusioneo_tpu.models.tokenizer import CLIPTokenizer

        cfg = sd15_pipeline()
        params = load_controlnet_pipeline(ckpt, cfg)
        tok = CLIPTokenizer.from_pretrained(os.environ["SDEO_TOKENIZER"])
        resolution, steps = 512, 20
    else:
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

        cfg = tiny_pipeline()
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {
            "unet": init_unet(ks[0], cfg.unet),
            "controlnet": init_controlnet(ks[1], cfg.controlnet),
            "vae": init_vae(ks[2], cfg.vae),
            "clip": init_clip_text(ks[3], cfg.clip),
        }
        tok = toy_tokenizer(max_length=cfg.clip.max_length)
        resolution, steps = 64, 2

    pipe = Canny2ImagePipeline(params, tok, cfg)
    img = (np.random.default_rng(0).random((resolution, resolution, 3)) * 255).astype(np.uint8)
    results = pipe.process(
        img, "a bird", num_samples=1, image_resolution=resolution,
        ddim_steps=steps, seed=2946901,
    )
    print("detected_map:", results[0].shape, "sample:", results[1].shape)
    print("timings:", {k: round(v, 1) for k, v in pipe.last_timings.items()})


if __name__ == "__main__":
    main()
