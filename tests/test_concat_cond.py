"""Concat-conditioned SD families (depth2img 5-ch / inpainting 9-ch):
scan math, conditioning helpers, torch-mirror parity of the widened
conv_in, and strict checkpoint accounting for both loaders."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import (
    CLIPTextConfig,
    PipelineConfig,
    UNetConfig,
    VAEConfig,
    tiny_pipeline,
)
from stablediffusioneo_tpu.models import init_unet, init_vae
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.concat_cond import (
    depth_to_concat,
    inpaint_to_concat,
    sd_concat_sample_scan,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_ref import TorchUNet  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def _tiny_unet_cfg(in_channels):
    base = tiny_pipeline().unet
    import dataclasses
    return dataclasses.replace(base, in_channels=in_channels)


def _randomize_out(up, key):
    out = dict(up["out"])
    conv = dict(out["conv"])
    kw, kb = jax.random.split(key)
    conv["w"] = 0.05 * jax.random.normal(kw, conv["w"].shape, jnp.float32)
    conv["b"] = 0.01 * jax.random.normal(kb, conv["b"].shape, jnp.float32)
    out["conv"] = conv
    return {**up, "out": out}


class TestScan:
    def test_zero_eps_analytic_parity(self, rng):
        """Zero-init out conv -> eps_hat == 0 -> the DDIM recursion has a
        closed numpy form: x' = sqrt(a_prev) * x / sqrt(a_t)."""
        ucfg = _tiny_unet_cfg(5)
        up = init_unet(jax.random.PRNGKey(0), ucfg)
        sched = DiffusionSchedule().ddim(4)
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        cc = rng.standard_normal((1, 8, 8, 1), dtype=np.float32)
        ctx = rng.standard_normal((1, 5, ucfg.context_dim), dtype=np.float32)
        out = np.asarray(sd_concat_sample_scan(
            up, ucfg, sched, jnp.asarray(x_T), jnp.asarray(cc),
            jnp.asarray(ctx), jnp.asarray(ctx), jnp.asarray(9.0),
            jax.random.PRNGKey(0)))
        x = x_T.astype(np.float64)
        for i in range(4):
            a_t = sched["alphas"][i]
            a_prev = sched["alphas_prev"][i]
            x = np.sqrt(a_prev) * x / np.sqrt(a_t)
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5)

    def test_concat_channels_change_output(self, rng):
        ucfg = _tiny_unet_cfg(5)
        up = _randomize_out(init_unet(jax.random.PRNGKey(0), ucfg),
                            jax.random.PRNGKey(9))
        sched = DiffusionSchedule().ddim(2)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        ctx = jnp.asarray(
            rng.standard_normal((1, 5, ucfg.context_dim)).astype(np.float32))
        def run(cc):
            return np.asarray(sd_concat_sample_scan(
                up, ucfg, sched, x_T, jnp.asarray(cc), ctx, ctx,
                jnp.asarray(9.0), jax.random.PRNGKey(0)))
        a = run(np.zeros((1, 8, 8, 1), np.float32))
        b = run(np.ones((1, 8, 8, 1), np.float32))
        assert np.abs(a - b).max() > 1e-4

    def test_channel_count_validated(self, rng):
        ucfg = _tiny_unet_cfg(5)
        up = init_unet(jax.random.PRNGKey(0), ucfg)
        sched = DiffusionSchedule().ddim(2)
        with pytest.raises(ValueError, match="expects 1"):
            sd_concat_sample_scan(
                up, ucfg, sched,
                jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 8, 8, 2)),
                jnp.zeros((1, 5, ucfg.context_dim)),
                jnp.zeros((1, 5, ucfg.context_dim)),
                jnp.asarray(9.0), jax.random.PRNGKey(0))


class TestMirrorParity:
    @pytest.mark.parametrize("in_ch", [5, 9])
    def test_widened_conv_in_converts_and_matches(self, rng, in_ch):
        """The 5/9-channel UNet converted from a torch state dict matches
        the torch forward on a concat input — gates the conv_in mapping at
        non-4 widths AND the eps parity of the hybrid families."""
        from stablediffusioneo_tpu.checkpoint.convert import convert_unet
        from stablediffusioneo_tpu.models.unet import unet_apply

        ucfg = _tiny_unet_cfg(in_ch)
        torch.manual_seed(in_ch)
        tm = TorchUNet(ucfg).eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_unet(sd, ucfg, prefix="")
        x = rng.standard_normal((2, 8, 8, in_ch), dtype=np.float32)
        t = np.asarray([3.0, 7.0], np.float32)
        ctx = rng.standard_normal((2, 5, ucfg.context_dim), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(t), torch.from_numpy(ctx))
        got = np.asarray(unet_apply(params, ucfg, jnp.asarray(x),
                                    jnp.asarray(t), jnp.asarray(ctx)))
        np.testing.assert_allclose(
            got, ref.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4)


class TestConditioningHelpers:
    def test_depth_to_concat_normalization(self, rng):
        d = rng.random((2, 32, 32), dtype=np.float32) * 1000 + 50
        cc = np.asarray(depth_to_concat(jnp.asarray(d), (8, 8)))
        assert cc.shape == (2, 8, 8, 1)
        for b in range(2):
            assert cc[b].min() == pytest.approx(-1.0, abs=1e-3)
            assert cc[b].max() == pytest.approx(1.0, abs=1e-3)
        # per-sample: scaling one sample's depth must not change the other
        d2 = d.copy()
        d2[0] *= 7.0
        cc2 = np.asarray(depth_to_concat(jnp.asarray(d2), (8, 8)))
        np.testing.assert_allclose(cc2[1], cc[1], rtol=1e-5)
        np.testing.assert_allclose(cc2[0], cc[0], rtol=1e-4, atol=1e-5)

    def test_inpaint_to_concat(self, rng):
        cfg = tiny_pipeline()
        vp = init_vae(jax.random.PRNGKey(1), cfg.vae)
        img = (rng.random((1, 32, 32, 3), dtype=np.float32) * 2 - 1)
        mask = np.zeros((1, 32, 32), np.float32)
        mask[:, 8:24, 8:24] = 1.0
        cc = np.asarray(inpaint_to_concat(
            vp, cfg.vae, jnp.asarray(img), jnp.asarray(mask)))
        assert cc.shape == (1, 4, 4, 5)
        assert set(np.unique(cc[..., 0])) <= {0.0, 1.0}   # mask channel
        # mask == 0 everywhere: masked image IS the image -> latent equals
        # the plain encode mode
        from stablediffusioneo_tpu.models.vae import vae_encode
        cc0 = np.asarray(inpaint_to_concat(
            vp, cfg.vae, jnp.asarray(img), jnp.zeros((1, 32, 32))))
        want = np.asarray(vae_encode(vp, cfg.vae, jnp.asarray(img)).mode()
                          ) * cfg.vae.scale_factor
        np.testing.assert_allclose(cc0[..., 1:], want, rtol=1e-5, atol=1e-6)
        assert np.all(cc0[..., 0] == 0.0)


def _tiny_depth_pipeline_cfg():
    base = tiny_pipeline()
    import dataclasses
    return dataclasses.replace(
        base,
        unet=_tiny_unet_cfg(5),
        clip=CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_length=16,
            layer="penultimate", act="gelu"),
    )


def _openclip_sd(cfg, prefix):
    from test_key_accounting import _openclip_text_mirror

    tower = _openclip_text_mirror(cfg)
    return {prefix + k: v.detach().numpy()
            for k, v in tower.state_dict().items()}


class TestLoaders:
    def _depth_ckpt(self, tmp_path, extra=None):
        from test_dpt_hybrid_mirror import Mirror

        cfg = _tiny_depth_pipeline_cfg()
        torch.manual_seed(0)
        sd = {}
        for k, v in TorchUNet(cfg.unet).eval().state_dict().items():
            sd["model.diffusion_model." + k] = v.detach().numpy()
        from torch_ref import TorchVAE
        for k, v in TorchVAE(cfg.vae).eval().state_dict().items():
            sd["first_stage_model." + k] = v.detach().numpy()
        sd.update(_openclip_sd(cfg.clip, "cond_stage_model.model."))
        for k, v in Mirror().eval().state_dict().items():
            sd["depth_model.model." + k] = v.detach().numpy()
        sd["betas"] = np.zeros(10, np.float32)   # DDPM buffer, known-unused
        if extra:
            sd.update(extra)
        path = str(tmp_path / "depth.pth")
        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                                   for k, v in sd.items()}}, path)
        return path, cfg

    def test_depth2img_strict_load(self, tmp_path):
        from stablediffusioneo_tpu.checkpoint import load_depth2img_pipeline

        path, cfg = self._depth_ckpt(tmp_path)
        params = load_depth2img_pipeline(path, cfg)
        assert set(params) == {"unet", "vae", "clip", "depth"}
        # 5-channel conv_in arrived intact
        assert params["unet"]["input_blocks"][0]["conv"]["w"].shape[2] == 5

    def test_depth2img_foreign_key_fails(self, tmp_path):
        from stablediffusioneo_tpu.checkpoint import load_depth2img_pipeline

        path, cfg = self._depth_ckpt(
            tmp_path, extra={"lora_unet.alpha": np.zeros(1, np.float32)})
        with pytest.raises(ValueError, match="outside every model scope"):
            load_depth2img_pipeline(path, cfg)

    @pytest.mark.parametrize("family", ["sd15", "sd2"])
    def test_inpaint_strict_load(self, tmp_path, family):
        from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

        from stablediffusioneo_tpu.checkpoint import load_inpaint_pipeline

        import dataclasses
        base = tiny_pipeline()
        if family == "sd2":
            cfg = dataclasses.replace(
                base, unet=_tiny_unet_cfg(9),
                clip=_tiny_depth_pipeline_cfg().clip)
        else:
            cfg = dataclasses.replace(base, unet=_tiny_unet_cfg(9))
        torch.manual_seed(1)
        sd = {}
        for k, v in TorchUNet(cfg.unet).eval().state_dict().items():
            sd["model.diffusion_model." + k] = v.detach().numpy()
        from torch_ref import TorchVAE
        for k, v in TorchVAE(cfg.vae).eval().state_dict().items():
            sd["first_stage_model." + k] = v.detach().numpy()
        if family == "sd2":
            sd.update(_openclip_sd(cfg.clip, "cond_stage_model.model."))
        else:
            hf = CLIPTextModel(HFConfig(
                vocab_size=cfg.clip.vocab_size,
                hidden_size=cfg.clip.hidden_size,
                intermediate_size=cfg.clip.intermediate_size,
                num_hidden_layers=cfg.clip.num_layers,
                num_attention_heads=cfg.clip.num_heads,
                max_position_embeddings=cfg.clip.max_length,
                hidden_act="quick_gelu")).eval()
            for k, v in hf.state_dict().items():
                sd["cond_stage_model.transformer." + k] = v.detach().numpy()
        path = str(tmp_path / "inpaint.pth")
        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                                   for k, v in sd.items()}}, path)
        params = load_inpaint_pipeline(path, cfg)
        assert set(params) == {"unet", "vae", "clip"}
        assert params["unet"]["input_blocks"][0]["conv"]["w"].shape[2] == 9


class TestPlainTxt2Img:
    def test_zero_eps_analytic_and_cfg(self, rng):
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
        from stablediffusioneo_tpu.pipeline.concat_cond import sd_txt2img_scan

        ucfg = tiny_pipeline().unet
        up = init_unet(jax.random.PRNGKey(0), ucfg)
        sched = DiffusionSchedule().ddim(3)
        x_T = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
        ctx = rng.standard_normal((2, 5, ucfg.context_dim), dtype=np.float32)
        out = np.asarray(sd_txt2img_scan(
            up, ucfg, sched, jnp.asarray(x_T), jnp.asarray(ctx),
            jnp.asarray(ctx), jnp.asarray(9.0), jax.random.PRNGKey(0)))
        x = x_T.astype(np.float64)
        for i in range(3):
            x = np.sqrt(sched["alphas_prev"][i]) * x / np.sqrt(sched["alphas"][i])
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5)

    def test_matches_controlled_scan_at_zero_strength(self, rng):
        """With control_scales == 0 the ControlNet taps vanish, so the
        plain txt2img scan must equal the controlled scan bit-for-bit
        (same UNet weights, same schedule, same x_T/ctx)."""
        from stablediffusioneo_tpu.models import init_controlnet
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
        from stablediffusioneo_tpu.pipeline.concat_cond import sd_txt2img_scan
        from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan

        cfg = tiny_pipeline()
        ks = jax.random.split(jax.random.PRNGKey(1), 2)
        up = init_unet(ks[0], cfg.unet)
        kw, kb = jax.random.split(jax.random.PRNGKey(8))
        out_t = dict(up["out"]); conv = dict(out_t["conv"])
        conv["w"] = 0.05 * jax.random.normal(kw, conv["w"].shape, jnp.float32)
        conv["b"] = 0.01 * jax.random.normal(kb, conv["b"].shape, jnp.float32)
        out_t["conv"] = conv
        up = {**up, "out": out_t}
        cp = init_controlnet(ks[1], cfg.controlnet)
        sched = DiffusionSchedule().ddim(2)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        hint = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        ctx = jnp.asarray(
            rng.standard_normal((1, 5, cfg.unet.context_dim)).astype(np.float32))
        key = jax.random.PRNGKey(0)
        plain = np.asarray(sd_txt2img_scan(
            up, cfg.unet, sched, x_T, ctx, ctx, jnp.asarray(9.0), key))
        controlled = np.asarray(ddim_sample_scan(
            up, cp, cfg.controlnet, sched, x_T, hint, ctx, ctx,
            jnp.asarray(9.0), jnp.zeros(5, jnp.float32), key))
        np.testing.assert_allclose(controlled, plain, rtol=1e-5, atol=1e-6)

    def test_load_sd_pipeline_strict(self, tmp_path):
        from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

        from stablediffusioneo_tpu.checkpoint import load_sd_pipeline

        cfg = tiny_pipeline()
        torch.manual_seed(2)
        sd = {}
        for k, v in TorchUNet(cfg.unet).eval().state_dict().items():
            sd["model.diffusion_model." + k] = v
        from torch_ref import TorchVAE
        for k, v in TorchVAE(cfg.vae).eval().state_dict().items():
            sd["first_stage_model." + k] = v
        hf = CLIPTextModel(HFConfig(
            vocab_size=cfg.clip.vocab_size, hidden_size=cfg.clip.hidden_size,
            intermediate_size=cfg.clip.intermediate_size,
            num_hidden_layers=cfg.clip.num_layers,
            num_attention_heads=cfg.clip.num_heads,
            max_position_embeddings=cfg.clip.max_length,
            hidden_act="quick_gelu")).eval()
        for k, v in hf.state_dict().items():
            sd["cond_stage_model.transformer." + k] = v
        path = str(tmp_path / "sd.pth")
        torch.save({"state_dict": sd}, path)
        params = load_sd_pipeline(path, cfg)
        assert set(params) == {"unet", "vae", "clip"}
        # a stray control_model scope must NOT load silently
        sd["control_model.zero_convs.0.0.weight"] = torch.zeros(1)
        torch.save({"state_dict": sd}, path)
        with pytest.raises(ValueError, match="outside every model scope"):
            load_sd_pipeline(path, cfg)


class TestConcatImg2Img:
    def test_zero_eps_analytic_and_tail_slice(self, rng):
        """eps == 0: output = noised entry latent through the closed-form
        tail recursion; full-depth t_enc == n with the same noise bits
        differs from txt2img only by the entry state construction."""
        from stablediffusioneo_tpu.pipeline.concat_cond import (
            sd_concat_img2img,
        )

        ucfg = _tiny_unet_cfg(5)
        up = init_unet(jax.random.PRNGKey(0), ucfg)
        sched = DiffusionSchedule().ddim(6)
        z0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        cc = jnp.asarray(rng.standard_normal((1, 8, 8, 1), dtype=np.float32))
        ctx = jnp.asarray(
            rng.standard_normal((1, 5, ucfg.context_dim)).astype(np.float32))
        key = jax.random.PRNGKey(3)
        t_enc = 4
        out = np.asarray(sd_concat_img2img(
            up, ucfg, sched, z0, t_enc, cc, ctx, ctx, jnp.asarray(9.0), key))
        _, kn = jax.random.split(key)
        n = len(sched["timesteps"])
        tail = {k: np.asarray(v)[n - t_enc:] for k, v in sched.items()}
        noise = np.asarray(jax.random.normal(kn, z0.shape, jnp.float32))
        x = (np.sqrt(tail["alphas"][0]) * np.asarray(z0, np.float64)
             + np.sqrt(1 - tail["alphas"][0]) * noise)
        for i in range(t_enc):
            x = np.sqrt(tail["alphas_prev"][i]) * x / np.sqrt(tail["alphas"][i])
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5)

    def test_t_enc_validated(self, rng):
        from stablediffusioneo_tpu.pipeline.concat_cond import (
            sd_concat_img2img,
        )

        ucfg = _tiny_unet_cfg(5)
        up = init_unet(jax.random.PRNGKey(0), ucfg)
        sched = DiffusionSchedule().ddim(3)
        with pytest.raises(ValueError, match="t_enc"):
            sd_concat_img2img(
                up, ucfg, sched, jnp.zeros((1, 8, 8, 4)), 4,
                jnp.zeros((1, 8, 8, 1)),
                jnp.zeros((1, 5, ucfg.context_dim)),
                jnp.zeros((1, 5, ucfg.context_dim)),
                jnp.asarray(9.0), jax.random.PRNGKey(0))
