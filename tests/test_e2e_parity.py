"""Full-pipeline integration parity: Canny2ImagePipeline vs an independent
torch pipeline (HF CLIP + torch UNet/ControlNet/VAE + explicit DDIM loop),
sharing weights, tokenizer, canny map, and x_T.

This is the reference's strongest check — the torch-vs-TRT flavor swap on
the same entry point (SURVEY §4.6, compute_score goldens) — at fp32/tiny
scale. Per-pixel uint8 agreement within 1 LSB required.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.annotators.canny import CannyDetector
from stablediffusioneo_tpu.annotators.util import HWC3, resize_image
from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.checkpoint.convert import (
    convert_clip, convert_controlnet, convert_unet, convert_vae,
)
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

from torch_ref import TorchControlNet, TorchUNet, TorchVAE, state_dict_numpy
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


def _build_models():
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    torch.manual_seed(0)
    unet_t = TorchUNet(CFG.unet).eval()
    torch.manual_seed(1)
    ctrl_t = TorchControlNet(CFG.controlnet).eval()
    torch.manual_seed(2)
    vae_t = TorchVAE(CFG.vae).eval()
    torch.manual_seed(3)
    clip_t = CLIPTextModel(HFConfig(
        vocab_size=CFG.clip.vocab_size, hidden_size=CFG.clip.hidden_size,
        intermediate_size=CFG.clip.intermediate_size,
        num_hidden_layers=CFG.clip.num_layers,
        num_attention_heads=CFG.clip.num_heads,
        max_position_embeddings=CFG.clip.max_length, hidden_act="quick_gelu",
    )).eval()
    params = {
        "unet": convert_unet(state_dict_numpy(unet_t), CFG.unet, prefix=""),
        "controlnet": convert_controlnet(
            state_dict_numpy(ctrl_t), CFG.controlnet, prefix=""
        ),
        "vae": convert_vae(state_dict_numpy(vae_t), CFG.vae, prefix=""),
        "clip": convert_clip(state_dict_numpy(clip_t), CFG.clip, prefix=""),
    }
    return params, unet_t, ctrl_t, vae_t, clip_t


def torch_pipeline(unet_t, ctrl_t, vae_t, clip_t, tok, img, prompt, a_prompt,
                   n_prompt, steps, scale, x_T, schedule):
    """Independent torch implementation of process() (canny2image_torch flow)."""
    img = resize_image(HWC3(img), 64)
    detected = HWC3(CannyDetector()(img, 100, 200))
    hint = torch.from_numpy(
        (detected.astype(np.float32) / 255.0)[None]
    ).permute(0, 3, 1, 2)

    ids = tok([prompt + ", " + a_prompt, n_prompt]).astype(np.int64)
    with torch.no_grad():
        ctx = clip_t(input_ids=torch.from_numpy(ids)).last_hidden_state
    ctx_c, ctx_u = ctx[0:1], ctx[1:2]

    sched = schedule.ddim(steps, eta=0.0)
    x = torch.from_numpy(np.transpose(np.asarray(x_T), (0, 3, 1, 2)))
    with torch.no_grad():
        for i in range(steps):
            t = torch.full((1,), float(sched["timesteps"][i]))
            ctrl_c = [c * 1.0 for c in ctrl_t(x, hint, t, ctx_c)]
            e_c = unet_t(x, t, ctx_c, control=ctrl_c)
            ctrl_u = [c * 1.0 for c in ctrl_t(x, hint, t, ctx_u)]
            e_u = unet_t(x, t, ctx_u, control=ctrl_u)
            e = e_u + scale * (e_c - e_u)
            a_t = float(sched["alphas"][i])
            a_prev = float(sched["alphas_prev"][i])
            sq = float(sched["sqrt_one_minus_alphas"][i])
            x0 = (x - sq * e) / np.sqrt(a_t)
            x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * e
        img_out = vae_t.decode(x / CFG.vae.scale_factor)
    out = img_out.permute(0, 2, 3, 1).numpy()
    return np.clip(out * 127.5 + 127.5, 0, 255).astype(np.uint8)[0], detected


class TestEndToEndParity:
    def test_process_vs_torch(self, rng):
        params, unet_t, ctrl_t, vae_t, clip_t = _build_models()
        tok = toy_tokenizer(
            vocab_size=CFG.clip.vocab_size, max_length=CFG.clip.max_length
        )
        pipe = Canny2ImagePipeline(params, tok, CFG, persistent_cache=False)

        img = np.zeros((72, 68, 3), np.uint8)
        img[20:50, 18:48] = 200  # structure for canny
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        prompt, a_prompt = "a bird", "best quality"
        n_prompt = "lowres"
        steps, scale = 5, 9.0

        results = pipe.process(
            img, prompt, a_prompt=a_prompt, n_prompt=n_prompt,
            num_samples=1, image_resolution=64, ddim_steps=steps,
            scale=scale, seed=7, eta=0.0, x_T=x_T,
        )
        jax_detected, jax_img = results[0], results[1]

        ref_img, ref_detected = torch_pipeline(
            unet_t, ctrl_t, vae_t, clip_t, tok, img, prompt, a_prompt,
            n_prompt, steps, scale, x_T, pipe.runtime.schedule,
        )

        np.testing.assert_array_equal(jax_detected, ref_detected)
        diff = np.abs(jax_img.astype(int) - ref_img.astype(int))
        # fp32 end-to-end: a few quantization LSBs of slack
        assert (diff <= 2).mean() > 0.999, f"pixel diff histogram: max={diff.max()}"
        assert diff.max() <= 8
