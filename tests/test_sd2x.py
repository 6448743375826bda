"""SD-2.x support: v-parameterization sampling, per-head-channel attention,
OpenCLIP text converter, linear transformer projections."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import (
    CLIPTextConfig, ControlNetConfig, DiffusionConfig, PipelineConfig,
    UNetConfig, sd21_pipeline,
)
from stablediffusioneo_tpu.checkpoint.convert import convert_openclip_text
from stablediffusioneo_tpu.models import clip_text_apply, init_unet, unet_apply
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


class TestVParam:
    def test_v_sampler_math(self, rng):
        """One v-param DDIM step vs hand-computed update."""
        from stablediffusioneo_tpu.pipeline.ddim import ddim_scan_step
        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import init_controlnet

        CFG = tiny_pipeline()
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        up = init_unet(ks[0], CFG.unet)
        cp = init_controlnet(ks[1], CFG.controlnet)
        from stablediffusioneo_tpu.models.controlnet import hint_block_apply

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        hint = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        gh = hint_block_apply(cp["input_hint_block"], hint)
        ctx = jnp.asarray(rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32))
        consts = (
            jnp.asarray(500.0), jnp.asarray(0.6), jnp.asarray(0.7),
            jnp.asarray(0.0), jnp.asarray(np.sqrt(1 - 0.6), np.float32),
            jnp.asarray(0, jnp.int32),
        )
        args = (up, cp, CFG.controlnet, False, 1.0, x, consts, gh, ctx, ctx,
                jnp.asarray(1.0), jnp.ones(5), jax.random.PRNGKey(0))
        x_eps, _ = ddim_scan_step(*args, parameterization="eps")
        x_v, _ = ddim_scan_step(*args, parameterization="v")
        # model output is ~0 for random-init (zero out conv) -> v-param
        # collapses to pure x-scaling; check exact closed forms
        a_t, a_prev = 0.6, 0.7
        sq1m = np.sqrt(1 - a_t)
        xf = np.asarray(x)
        # eps path with eps=0: x' = sqrt(a_prev) * x / sqrt(a_t)
        np.testing.assert_allclose(
            np.asarray(x_eps), np.sqrt(a_prev) * xf / np.sqrt(a_t), rtol=1e-5
        )
        # v path with v=0: eps = sq1m * x; x0 = sqrt(a_t) x
        expect = np.sqrt(a_prev) * (np.sqrt(a_t) * xf) + np.sqrt(1 - a_prev) * (sq1m * xf)
        np.testing.assert_allclose(np.asarray(x_v), expect, rtol=1e-5)

    def test_sd21_config(self):
        cfg = sd21_pipeline()
        assert cfg.diffusion.parameterization == "v"
        assert cfg.unet.context_dim == 1024
        assert cfg.unet.heads_for(640) == 10  # 640 / 64
        assert cfg.clip.layer == "penultimate" and cfg.clip.act == "gelu"


class TestHeadChannels:
    def test_unet_forward_with_head_channels(self, rng):
        cfg = UNetConfig(
            model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), context_dim=64,
            num_head_channels=16, groups=8,
        )
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        ctx = jnp.asarray(rng.standard_normal((1, 5, 64), dtype=np.float32))
        out = unet_apply(params, cfg, x, jnp.asarray([3.0]), ctx)
        assert out.shape == x.shape


class TestOpenCLIP:
    def test_convert_and_penultimate(self, rng):
        cfg = CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_length=8,
            layer="penultimate", act="gelu",
        )
        d = cfg.hidden_size
        sd = {}
        sd["token_embedding.weight"] = rng.standard_normal(
            (cfg.vocab_size, d)).astype(np.float32) * 0.02
        sd["positional_embedding"] = rng.standard_normal(
            (cfg.max_length, d)).astype(np.float32) * 0.01
        sd["ln_final.weight"] = np.ones(d, np.float32)
        sd["ln_final.bias"] = np.zeros(d, np.float32)
        for i in range(cfg.num_layers):
            b = f"transformer.resblocks.{i}"
            sd[f"{b}.attn.in_proj_weight"] = rng.standard_normal((3 * d, d)).astype(np.float32) * 0.05
            sd[f"{b}.attn.in_proj_bias"] = rng.standard_normal(3 * d).astype(np.float32) * 0.05
            sd[f"{b}.attn.out_proj.weight"] = rng.standard_normal((d, d)).astype(np.float32) * 0.05
            sd[f"{b}.attn.out_proj.bias"] = np.zeros(d, np.float32)
            for ln in ("ln_1", "ln_2"):
                sd[f"{b}.{ln}.weight"] = np.ones(d, np.float32)
                sd[f"{b}.{ln}.bias"] = np.zeros(d, np.float32)
            sd[f"{b}.mlp.c_fc.weight"] = rng.standard_normal(
                (cfg.intermediate_size, d)).astype(np.float32) * 0.05
            sd[f"{b}.mlp.c_fc.bias"] = np.zeros(cfg.intermediate_size, np.float32)
            sd[f"{b}.mlp.c_proj.weight"] = rng.standard_normal(
                (d, cfg.intermediate_size)).astype(np.float32) * 0.05
            sd[f"{b}.mlp.c_proj.bias"] = np.zeros(d, np.float32)
        params = convert_openclip_text(sd, cfg, prefix="")
        ids = jnp.asarray(rng.integers(0, 100, (2, 8)).astype(np.int32))
        out = clip_text_apply(params, cfg, ids)
        assert out.shape == (2, 8, d)
        # penultimate != last
        last = clip_text_apply(params, cfg, ids, layer="last")
        assert not np.allclose(np.asarray(out), np.asarray(last))

    def test_qkv_split_parity_vs_torch_mha(self, rng):
        """Packed in_proj split must reproduce torch's MultiheadAttention."""
        d, h, t = 32, 2, 6
        mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
        torch.manual_seed(0)
        x = torch.from_numpy(rng.standard_normal((1, t, d)).astype(np.float32))
        mask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
        with torch.no_grad():
            ref, _ = mha(x, x, x, attn_mask=mask, need_weights=False)
        sd = {k: v.detach().numpy() for k, v in mha.state_dict().items()}
        in_w = np.transpose(sd["in_proj_weight"])
        qw, kw, vw = np.split(in_w, 3, axis=1)
        qb, kb, vb = np.split(sd["in_proj_bias"], 3)
        from stablediffusioneo_tpu.models.clip import _self_attn

        p = {
            "q": {"w": jnp.asarray(qw), "b": jnp.asarray(qb)},
            "k": {"w": jnp.asarray(kw), "b": jnp.asarray(kb)},
            "v": {"w": jnp.asarray(vw), "b": jnp.asarray(vb)},
            "out": {
                "w": jnp.asarray(np.transpose(sd["out_proj.weight"])),
                "b": jnp.asarray(sd["out_proj.bias"]),
            },
        }
        cfg = CLIPTextConfig(num_heads=h, hidden_size=d)
        causal = jnp.asarray(np.triu(np.full((t, t), -1e9, np.float32), k=1))[None, None]
        out = _self_attn(p, cfg, jnp.asarray(x.numpy()), causal)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)
