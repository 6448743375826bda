"""Benchmark: canny2image end-to-end on one TPU chip.

Workload = BASELINE.md north star: 512x512, 20-step DDIM + CFG, bf16,
batch 1 (the reference's compute_score workload at the target resolution,
compute_score.py:44-64). Weights are random-init (timing is
weight-independent); the tokenizer is the built-in toy vocab (host-side,
not timed meaningfully).

Prints ONE JSON line:
  {"metric": ..., "value": p50_seconds, "unit": "s", "vs_baseline": ...}
vs_baseline = 2.0 / p50  (>1 means faster than the 2 s/img target).

Extra detail goes to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    resolution = int(os.environ.get("BENCH_RESOLUTION", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    import numpy as np
    import jax

    log(f"devices: {jax.devices()}")

    from stablediffusioneo_tpu.config import sd15_pipeline
    from stablediffusioneo_tpu.models import (
        init_clip_text,
        init_controlnet,
        init_unet,
        init_vae,
    )
    from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
    from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

    cfg = sd15_pipeline(dtype="bfloat16")

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    # Benchmark weights: zeros materialized directly on-device from
    # eval_shape trees. Dense-op timing on TPU is data-independent, and this
    # avoids dispatching thousands of tiny host->device init ops through the
    # device tunnel (real deployments load a checkpoint instead).
    import jax.numpy as jnp

    shapes = {
        "unet": jax.eval_shape(lambda k: init_unet(k, cfg.unet), ks[0]),
        "controlnet": jax.eval_shape(
            lambda k: init_controlnet(k, cfg.controlnet), ks[1]
        ),
        "vae": jax.eval_shape(lambda k: init_vae(k, cfg.vae), ks[2]),
        "clip": jax.eval_shape(lambda k: init_clip_text(k, cfg.clip), ks[3]),
    }
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )()
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    log(f"param init (zeros, {n_params/1e6:.0f}M params): {time.perf_counter()-t0:.1f}s")

    tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size, max_length=cfg.clip.max_length)
    pipe = Canny2ImagePipeline(params, tok, cfg)
    del params  # runtime holds the bf16 copy

    # synthetic bird-ish input image
    rng = np.random.default_rng(2946901)
    img = (rng.random((resolution, resolution, 3)) * 255).astype(np.uint8)

    t0 = time.perf_counter()
    # compile+warm every engine at the bench shape (1 full process call)
    pipe.process(img, "a bird", num_samples=1, image_resolution=resolution,
                 ddim_steps=steps, seed=2946901)
    log(f"warmup (incl. compile): {time.perf_counter()-t0:.1f}s")
    log(f"warmup timings: {pipe.last_timings}")

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = pipe.process(img, "a bird", num_samples=1,
                           image_resolution=resolution, ddim_steps=steps,
                           seed=2946901)
        times.append(time.perf_counter() - t0)
        log(f"iter {i}: {times[-1]*1e3:.0f} ms  {pipe.last_timings}")

    p50 = float(np.median(times))
    result = {
        "metric": f"canny2image_{resolution}x{resolution}_{steps}step_bf16_b1_e2e_p50",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(2.0 / p50, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
