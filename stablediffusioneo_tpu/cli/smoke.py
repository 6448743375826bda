"""Smoke test — the trt_check.py analog (trt_check.py:1-14): bring up the
CLIP engine with random tokens and print the output stats.

Usage: sdeo-smoke [--tiny]   (--tiny uses the random-weight tiny config
instead of SD-1.5 sizes).
"""

import sys

import numpy as np


def main():
    import jax

    from stablediffusioneo_tpu.config import sd15_pipeline, tiny_pipeline
    from stablediffusioneo_tpu.models import init_clip_text
    from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

    tiny = "--tiny" in sys.argv
    cfg = tiny_pipeline() if tiny else sd15_pipeline()
    params_clip = init_clip_text(jax.random.PRNGKey(0), cfg.clip)
    rt = CNSDRuntime({"clip": params_clip, "unet": {}, "controlnet": {}, "vae": {}}, cfg)
    ids = np.random.default_rng(0).integers(
        0, cfg.clip.vocab_size, (1, cfg.clip.max_length)
    ).astype(np.int32)
    out = rt.encode_prompt(ids)
    print("clip engine OK:", out.shape, out.dtype,
          "mean|x|=", float(abs(np.asarray(out, np.float32)).mean()))
    print(rt.clip_engine(1).get_engine_infor())


if __name__ == "__main__":
    main()
