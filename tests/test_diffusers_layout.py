"""Diffusers-layout checkpoint maps (VERDICT r3 #8): the sgm/ldm and
diffusers namings must load to IDENTICAL trees on a synthetic universe,
with the strict accounting gates intact for the diffusers side."""

import numpy as np
import pytest
import torch

import jax

from stablediffusioneo_tpu.checkpoint.accounting import (
    ConversionAccountingError, account,
)
from stablediffusioneo_tpu.checkpoint.convert import (
    convert_unet, convert_vae,
)
from stablediffusioneo_tpu.checkpoint.diffusers import (
    convert_clip_g_diffusers,
    convert_unet_diffusers,
    convert_vae_diffusers,
    rename_sgm_to_diffusers,
)
from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.testing.torch_ref import (
    TorchUNet, TorchVAE, state_dict_numpy,
)

CFG = tiny_pipeline()
KEY = jax.random.PRNGKey(0)


def _trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb, "tree structures differ"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def unet_sgm_sd():
    torch.manual_seed(0)
    return state_dict_numpy(TorchUNet(CFG.unet).eval())


@pytest.fixture(scope="module")
def vae_sgm_sd():
    torch.manual_seed(1)
    return state_dict_numpy(TorchVAE(CFG.vae).eval())


class TestUNetLayout:
    def test_both_layouts_identical_trees(self, unet_sgm_sd):
        diff_sd = rename_sgm_to_diffusers(unet_sgm_sd, CFG.unet, "unet")
        # renaming is a bijection with canonical diffusers block names
        assert len(diff_sd) == len(unet_sgm_sd)
        assert any(k.startswith("down_blocks.0.resnets.0.norm1")
                   for k in diff_sd)
        assert "time_embedding.linear_1.weight" in diff_sd
        assert "conv_norm_out.weight" in diff_sd
        t_sgm = convert_unet(unet_sgm_sd, CFG.unet, prefix="")
        t_diff = convert_unet_diffusers(diff_sd, CFG.unet)
        _trees_equal(t_sgm, t_diff)

    def test_accounting_complete_and_orphan_raises(self, unet_sgm_sd):
        from stablediffusioneo_tpu.models import init_unet

        diff_sd = rename_sgm_to_diffusers(unet_sgm_sd, CFG.unet, "unet")
        rep = account(convert_unet_diffusers, diff_sd, CFG.unet,
                      expect=jax.eval_shape(
                          lambda k: init_unet(k, CFG.unet), KEY))
        rep.assert_complete("unet_diffusers")
        assert not rep.multi_reads

        bad = dict(diff_sd)
        bad["down_blocks.0.mystery.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ConversionAccountingError, match="mystery"):
            account(convert_unet_diffusers, bad,
                    CFG.unet).assert_complete("unet_diffusers")

    def test_sdxl_adm_add_embedding(self):
        from stablediffusioneo_tpu.models.sdxl import tiny_sdxl

        xcfg = tiny_sdxl()
        torch.manual_seed(2)
        sd = state_dict_numpy(TorchUNet(xcfg.unet).eval())
        diff_sd = rename_sgm_to_diffusers(sd, xcfg.unet, "unet")
        assert "add_embedding.linear_1.weight" in diff_sd
        _trees_equal(convert_unet(sd, xcfg.unet, prefix=""),
                     convert_unet_diffusers(diff_sd, xcfg.unet))


class TestVAELayout:
    def test_both_layouts_identical_trees(self, vae_sgm_sd):
        diff_sd = rename_sgm_to_diffusers(vae_sgm_sd, CFG.vae, "vae")
        assert len(diff_sd) == len(vae_sgm_sd)
        # attention weights travel as the diffusers LINEAR layout
        q = diff_sd["encoder.mid_block.attentions.0.to_q.weight"]
        assert q.ndim == 2
        # decoder level indices are REVERSED between the namings
        n = len(CFG.vae.ch_mult)
        assert f"decoder.up_blocks.{n-1}.resnets.0.conv1.weight" in diff_sd
        t_sgm = convert_vae(vae_sgm_sd, CFG.vae, prefix="")
        t_diff = convert_vae_diffusers(diff_sd, CFG.vae)
        _trees_equal(t_sgm, t_diff)

    def test_accounting_complete(self, vae_sgm_sd):
        from stablediffusioneo_tpu.models import init_vae

        diff_sd = rename_sgm_to_diffusers(vae_sgm_sd, CFG.vae, "vae")
        rep = account(convert_vae_diffusers, diff_sd, CFG.vae,
                      expect=jax.eval_shape(
                          lambda k: init_vae(k, CFG.vae), KEY))
        rep.assert_complete("vae_diffusers")

    def test_decode_matches_torch(self, vae_sgm_sd, rng):
        """Functional check through the renamed tree: decode parity vs the
        torch mirror (same gate the sgm layout passes)."""
        from stablediffusioneo_tpu.models.vae import vae_decode

        torch.manual_seed(1)
        ref = TorchVAE(CFG.vae).eval()
        diff_sd = rename_sgm_to_diffusers(vae_sgm_sd, CFG.vae, "vae")
        params = convert_vae_diffusers(diff_sd, CFG.vae)
        z = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        out = np.asarray(vae_decode(params, CFG.vae, z, scaled=False))
        with torch.no_grad():
            want = ref.decode(torch.from_numpy(
                np.transpose(z, (0, 3, 1, 2)))).numpy()
        np.testing.assert_allclose(
            out, np.transpose(want, (0, 2, 3, 1)), rtol=2e-4, atol=2e-4)


class TestClipGDiffusers:
    @pytest.mark.slow  # fast-tier budget: needs HF download-free transformers; 6 other diffusers tests stay fast
    def test_pooled_parity_vs_hf(self, rng):
        """text_encoder_2 (CLIPTextModelWithProjection) -> clip_g tree:
        projected pooled output must match HF's text_embeds."""
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModelWithProjection

        from stablediffusioneo_tpu.models.clip import clip_text_pooled

        cfg = CFG.clip
        torch.manual_seed(3)
        hf = CLIPTextModelWithProjection(HFConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            max_position_embeddings=cfg.max_length,
            hidden_act="quick_gelu",
            projection_dim=cfg.hidden_size // 2,
            eos_token_id=cfg.vocab_size - 1,
        )).eval()
        sd = state_dict_numpy(hf)
        params = convert_clip_g_diffusers(sd, cfg)
        assert params["text_projection"]["w"].shape == (
            cfg.hidden_size, cfg.hidden_size // 2)
        ids = rng.integers(5, cfg.vocab_size - 5,
                           (2, cfg.max_length)).astype(np.int32)
        # HF pools at the FIRST eos_token_id occurrence (the config's eos
        # must lie inside the tiny vocab, hence the explicit id above);
        # ours pools at the first eot_id occurrence — same position
        ids[:, 5] = cfg.vocab_size - 1
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(
                ids.astype(np.int64))).text_embeds.numpy()
        got = np.asarray(clip_text_pooled(
            params, cfg, ids, eot_id=cfg.vocab_size - 1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
