"""SDXL conditioning + txt2img sampler at the tiny topology: dual-tower
context concat, pooled/projected output (manual-math equivalence),
micro-conditioning fourier ids, and the end-to-end scan + VAE decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.models import init_clip_text, init_unet, init_vae
from stablediffusioneo_tpu.models.clip import clip_text_apply, clip_text_pooled
from stablediffusioneo_tpu.models.sdxl import (
    SDXLConfig,
    add_time_ids,
    sdxl_conditioning,
    sdxl_txt2img_scan,
    sdxl_unet,
    tiny_sdxl,
)
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule

CFG = tiny_sdxl()


@pytest.fixture(scope="module")
def params():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    cnt = iter(jax.random.split(ks[0], 8192))
    return {
        # randomized so eps depends on conditioning (zero_module gates)
        "unet": jax.tree.map(
            lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * 0.02,
            init_unet(ks[0], CFG.unet)),
        "clip_l": init_clip_text(ks[1], CFG.clip_l),
        "clip_g": init_clip_text(ks[2], CFG.clip_g),
        "vae": init_vae(ks[3], CFG.vae),
    }


class TestConditioning:
    def test_real_config_widths(self):
        """The real SDXL constants line up: ctx 768+1280=2048, ADM
        1280 + 6x256 = 2816."""
        u = sdxl_unet()
        assert u.context_dim == 2048 and u.adm_in_channels == 2816
        assert u.depth_for(0) == 0 and u.depth_for(2) == 10
        t = add_time_ids((1024, 1024), (0, 0), (1024, 1024), 2)
        assert t.shape == (2, 1536)
        np.testing.assert_array_equal(t[0], t[1])

    def test_context_and_y_shapes(self, params):
        ids = np.zeros((2, 16), np.int32)
        ctx, y = sdxl_conditioning(params, CFG, jnp.asarray(ids),
                                   jnp.asarray(ids), size_hw=(64, 64))
        assert ctx.shape == (2, 16, CFG.unet.context_dim)
        assert y.shape == (2, CFG.unet.adm_in_channels)

    def test_pooled_matches_manual_math(self, params):
        """pooled == final-LN hidden gathered at the row-wise argmax id,
        through text_projection."""
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 900, (2, 16)).astype(np.int32)
        ids[0, 7] = 999  # max id = the OpenCLIP EOT convention
        ids[1, 3] = 999
        pooled = clip_text_pooled(params["clip_g"], CFG.clip_g,
                                  jnp.asarray(ids))
        full = clip_text_apply(params["clip_g"], CFG.clip_g,
                               jnp.asarray(ids), layer="last")
        want = np.stack([np.asarray(full)[0, 7], np.asarray(full)[1, 3]])
        want = want @ np.asarray(params["clip_g"]["text_projection"]["w"])
        np.testing.assert_allclose(np.asarray(pooled), want,
                                   rtol=1e-5, atol=1e-6)

    def test_penultimate_raw_skips_final_ln(self, params):
        ids = jnp.zeros((1, 16), jnp.int32)
        raw = clip_text_apply(params["clip_l"], CFG.clip_l, ids,
                              layer="penultimate_raw")
        ln = clip_text_apply(params["clip_l"], CFG.clip_l, ids,
                             layer="penultimate")
        assert np.abs(np.asarray(raw) - np.asarray(ln)).max() > 1e-4


@pytest.mark.slow
class TestTxt2Img:
    def test_scan_runs_and_cfg_matters(self, params):
        from stablediffusioneo_tpu.models.vae import vae_decode

        sched = DiffusionSchedule().ddim(3)
        rng = np.random.default_rng(1)
        ids = rng.integers(5, 900, (1, 16)).astype(np.int32)
        uncond = np.zeros((1, 16), np.int32)
        ctx_c, y_c = sdxl_conditioning(params, CFG, jnp.asarray(ids),
                                       jnp.asarray(ids), size_hw=(64, 64))
        ctx_u, y_u = sdxl_conditioning(params, CFG, jnp.asarray(uncond),
                                       jnp.asarray(uncond), size_hw=(64, 64))
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        z1 = sdxl_txt2img_scan(params["unet"], CFG, sched, x_T,
                               ctx_c, ctx_u, y_c, y_u,
                               jnp.asarray(5.0), jax.random.PRNGKey(2))
        z2 = sdxl_txt2img_scan(params["unet"], CFG, sched, x_T,
                               ctx_c, ctx_u, y_c, y_u,
                               jnp.asarray(1.0), jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(z1)).all()
        assert np.abs(np.asarray(z1) - np.asarray(z2)).max() > 1e-5
        img = vae_decode(params["vae"], CFG.vae, z1, scaled=True)
        assert img.shape == (1, 64, 64, 3)
        # micro-conditioning matters: different target size -> different y
        # -> different eps
        _, y_big = sdxl_conditioning(params, CFG, jnp.asarray(ids),
                                     jnp.asarray(ids), size_hw=(128, 128))
        z3 = sdxl_txt2img_scan(params["unet"], CFG, sched, x_T,
                               ctx_c, ctx_u, y_big, y_u,
                               jnp.asarray(5.0), jax.random.PRNGKey(2))
        assert np.abs(np.asarray(z3) - np.asarray(z1)).max() > 1e-6


@pytest.mark.slow
class TestImg2ImgInpaint:
    def _cond(self, params, rng):
        ids = rng.integers(5, 900, (1, 16)).astype(np.int32)
        uncond = np.zeros((1, 16), np.int32)
        ctx_c, y_c = sdxl_conditioning(params, CFG, jnp.asarray(ids),
                                       jnp.asarray(ids), size_hw=(64, 64))
        ctx_u, y_u = sdxl_conditioning(params, CFG, jnp.asarray(uncond),
                                       jnp.asarray(uncond), size_hw=(64, 64))
        return ctx_c, ctx_u, y_c, y_u

    def test_img2img_matches_manual_tail(self, params):
        """sdxl_img2img_latents == stochastic_tail_entry + txt2img on the
        tail (the shared img2img convention), and t_enc depth matters."""
        from stablediffusioneo_tpu.models.sdxl import sdxl_img2img_latents
        from stablediffusioneo_tpu.pipeline.ddim import stochastic_tail_entry

        rng = np.random.default_rng(3)
        ctx_c, ctx_u, y_c, y_u = self._cond(params, rng)
        sched = DiffusionSchedule().ddim(4)
        z0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        key = jax.random.PRNGKey(9)
        got = sdxl_img2img_latents(
            params["unet"], CFG, sched, z0, 2, ctx_c, ctx_u, y_c, y_u,
            jnp.asarray(5.0), key)
        tail, x_T, k2 = stochastic_tail_entry(sched, 2, z0, key)
        want = sdxl_txt2img_scan(params["unet"], CFG, tail, x_T,
                                 ctx_c, ctx_u, y_c, y_u,
                                 jnp.asarray(5.0), k2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        deeper = sdxl_img2img_latents(
            params["unet"], CFG, sched, z0, 4, ctx_c, ctx_u, y_c, y_u,
            jnp.asarray(5.0), key)
        assert np.abs(np.asarray(deeper) - np.asarray(got)).max() > 1e-5

    def test_inpaint_mask_extremes(self, params):
        """mask == 1 is bit-identical to plain sampling; mask == 0 returns
        the source latent exactly; a mixed mask keeps the masked-off region."""
        rng = np.random.default_rng(4)
        ctx_c, ctx_u, y_c, y_u = self._cond(params, rng)
        sched = DiffusionSchedule().ddim(3)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        src = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        key = jax.random.PRNGKey(5)
        plain = sdxl_txt2img_scan(params["unet"], CFG, sched, x_T,
                                  ctx_c, ctx_u, y_c, y_u,
                                  jnp.asarray(5.0), key)
        ones = jnp.ones((1, 8, 8, 1), jnp.float32)
        all_gen = sdxl_txt2img_scan(params["unet"], CFG, sched, x_T,
                                    ctx_c, ctx_u, y_c, y_u,
                                    jnp.asarray(5.0), key,
                                    inpaint_latent=src, inpaint_mask=ones)
        np.testing.assert_array_equal(np.asarray(all_gen), np.asarray(plain))
        none_gen = sdxl_txt2img_scan(params["unet"], CFG, sched, x_T,
                                     ctx_c, ctx_u, y_c, y_u,
                                     jnp.asarray(5.0), key,
                                     inpaint_latent=src,
                                     inpaint_mask=ones * 0.0)
        np.testing.assert_array_equal(np.asarray(none_gen), np.asarray(src))
        half = ones.at[:, :4].set(0.0)
        mixed = sdxl_txt2img_scan(params["unet"], CFG, sched, x_T,
                                  ctx_c, ctx_u, y_c, y_u,
                                  jnp.asarray(5.0), key,
                                  inpaint_latent=src, inpaint_mask=half)
        np.testing.assert_array_equal(np.asarray(mixed)[:, :4],
                                      np.asarray(src)[:, :4])
        assert np.abs(np.asarray(mixed)[:, 4:]
                      - np.asarray(src)[:, 4:]).max() > 1e-5


@pytest.mark.slow
class TestCheckpointLoader:
    def test_load_sdxl_pipeline_sgm_layout(self, tmp_path):
        """A real-prefix sgm checkpoint (model.diffusion_model /
        conditioner.embedders.0/1 / first_stage_model) loads with strict
        per-tree key accounting and drives the txt2img scan."""
        import os
        import sys

        import torch

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

        from stablediffusioneo_tpu.checkpoint.convert import (
            load_sdxl_pipeline,
        )
        from test_key_accounting import _openclip_text_mirror
        from torch_ref import TorchUNet, TorchVAE

        cfg = CFG
        sd = {}
        for k, v in TorchUNet(cfg.unet).state_dict().items():
            sd["model.diffusion_model." + k] = v
        hf = CLIPTextModel(HFConfig(
            vocab_size=cfg.clip_l.vocab_size,
            hidden_size=cfg.clip_l.hidden_size,
            intermediate_size=cfg.clip_l.intermediate_size,
            num_hidden_layers=cfg.clip_l.num_layers,
            num_attention_heads=cfg.clip_l.num_heads,
            max_position_embeddings=cfg.clip_l.max_length,
            hidden_act="gelu")).eval()
        for k, v in hf.state_dict().items():
            sd["conditioner.embedders.0.transformer." + k] = v
        for k, v in _openclip_text_mirror(cfg.clip_g).state_dict().items():
            sd["conditioner.embedders.1.model." + k] = v
        for k, v in TorchVAE(cfg.vae).state_dict().items():
            sd["first_stage_model." + k] = v
        path = str(tmp_path / "sd_xl_tiny.pth")
        torch.save(sd, path)

        params = load_sdxl_pipeline(path, cfg)
        assert set(params) == {"unet", "clip_l", "clip_g", "vae"}
        assert "label_emb" in params["unet"]
        assert "text_projection" in params["clip_g"]

        # drive one txt2img through the loaded weights
        ids = np.zeros((1, cfg.clip_l.max_length), np.int32)
        ctx_c, y_c = sdxl_conditioning(params, cfg, jnp.asarray(ids),
                                       jnp.asarray(ids), size_hw=(64, 64))
        sched = DiffusionSchedule().ddim(2)
        x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 8, 8, 4)).astype(np.float32))
        z = sdxl_txt2img_scan(params["unet"], cfg, sched, x_T,
                              ctx_c, ctx_c, y_c, y_c,
                              jnp.asarray(5.0), jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(z)).all()

        # a foreign key INSIDE a scope fails that tree's accounting
        sd["model.diffusion_model.extra.weight"] = torch.zeros(3)
        torch.save(sd, path)
        with pytest.raises(Exception, match="extra|orphan|sdxl.unet"):
            load_sdxl_pipeline(path, cfg)
        del sd["model.diffusion_model.extra.weight"]
        # ...and a foreign TOP-LEVEL tree fails the global coverage check
        sd["lora_unet_something.weight"] = torch.zeros(3)
        torch.save(sd, path)
        with pytest.raises(ValueError, match="outside every model scope"):
            load_sdxl_pipeline(path, cfg)


class TestTokenize:
    def test_dual_padding_conventions(self):
        from stablediffusioneo_tpu.models.sdxl import sdxl_tokenize
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

        tok = toy_tokenizer(vocab_size=1000, max_length=16)
        ids_l, ids_g = sdxl_tokenize(tok, ["a bird", "a dog on grass"])
        assert ids_l.shape == ids_g.shape == (2, 16)
        # tower 1 pads with EOT, tower 2 zero-pads AFTER the first EOT
        for l_row, g_row in zip(ids_l, ids_g):
            e = np.nonzero(l_row == tok.eot)[0][0]
            np.testing.assert_array_equal(l_row[:e + 1], g_row[:e + 1])
            assert (l_row[e + 1:] == tok.eot).all()
            assert (g_row[e + 1:] == 0).all()
        # argmax pooling still lands on the EOT for the zero-padded tower
        assert (np.argmax(ids_g, axis=-1)
                == [np.nonzero(r == tok.eot)[0][0] for r in ids_l]).all()
