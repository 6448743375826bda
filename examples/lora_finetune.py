"""LoRA fine-tune -> save -> load -> merged inference, end to end.

Beyond the reference's training surface (full-branch AdamW,
cldm/cldm.py:416-423): rank-r adapters on a frozen base, then a zero-cost
merge into the resident engine weights. Runs in ~2 min on CPU at the tiny
config; swap `tiny_pipeline()` for `sd15_pipeline()` + a real checkpoint
for production.

    JAX_PLATFORMS=cpu python examples/lora_finetune.py
"""

import functools
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu" and jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import (
    init_clip_text, init_controlnet, init_unet, init_vae,
)
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline
from stablediffusioneo_tpu.training import (
    create_train_state, init_lora, load_lora, lora_train_step, save_lora,
)
from stablediffusioneo_tpu.training.lora import count_params
from stablediffusioneo_tpu.training.trainer import make_schedule_buffers


def main():
    cfg = tiny_pipeline()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)

    # Demo stand-in for trained weights: TRUE random init zero-initializes
    # every output gate (SD zero_module heads, ControlNet zero-convs), which
    # makes the pipeline output independent of the adapted linears — so
    # re-randomize the trees. With a real checkpoint, skip this.
    def randomize(tree, key):
        cnt = iter(jax.random.split(key, 4096))
        return jax.tree.map(
            lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * 0.05,
            tree)

    params = {
        "unet": randomize(init_unet(ks[0], cfg.unet), ks[0]),
        "controlnet": randomize(init_controlnet(ks[1], cfg.controlnet), ks[1]),
        "vae": init_vae(ks[2], cfg.vae),
        "clip": init_clip_text(ks[3], cfg.clip),
    }

    # 1. rank-4 adapters on the ControlNet branch (frozen base)
    lora = init_lora(jax.random.PRNGKey(1), params["controlnet"], rank=4)
    print(f"trainable: {count_params(lora):,} LoRA params vs "
          f"{count_params(params['controlnet']):,} in the branch")

    # 2. a few AdamW steps on a synthetic batch
    state, tx = create_train_state(lora, learning_rate=1e-3)
    sa, s1a = make_schedule_buffers(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x0": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
        "hint": rng.random((2, 64, 64, 3)).astype(np.float32),
        "ctx": rng.standard_normal((2, 5, cfg.unet.context_dim)).astype(np.float32),
    }
    step = jax.jit(functools.partial(
        lora_train_step, tx=tx, cfg=cfg, on="controlnet", scale=1.0))
    for i in range(5):
        state, loss = step(state, frozen=params, sqrt_abar=sa,
                           sqrt_one_minus_abar=s1a, batch=batch,
                           key=jax.random.PRNGKey(2))
        print(f"step {i}: loss {float(loss):.4f}")

    # 3. save / load with strict accounting
    path = os.path.join(tempfile.gettempdir(), "lora_demo.npz")
    save_lora(path, state.params, alpha=4.0, on="controlnet")
    tree, meta = load_lora(path)
    print(f"saved {os.path.getsize(path)/1e3:.0f} KB, meta {meta}")

    # 4. merge into a live runtime: engines stay valid, next call streams
    #    the adapted weights
    tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                        max_length=cfg.clip.max_length)
    pipe = Canny2ImagePipeline(params, tok, cfg, persistent_cache=False)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    base_out = pipe.process(img, "a bird", num_samples=1,
                            image_resolution=64, ddim_steps=2, seed=7)[1]
    n = pipe.runtime.apply_lora(tree, scale=meta["alpha"] / meta["rank"],
                                on=meta["on"])
    lora_out = pipe.process(img, "a bird", num_samples=1,
                            image_resolution=64, ddim_steps=2, seed=7)[1]
    print(f"merged {n} sites; output changed: "
          f"{bool(np.any(base_out != lora_out))}")


if __name__ == "__main__":
    main()
