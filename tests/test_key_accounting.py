"""Converter key-accounting gates: every checkpoint converter must consume
its full source state dict and produce exactly the init_* tree structure.

This is the strongest real-weight proxy a zero-egress environment allows
(reference analog: `onnxruntime_check` at every conversion boundary,
export_onnx_all.py:60-100): the key universes come from torch mirrors with
upstream state-dict naming (tests/torch_ref.py + the annotator mirror
modules) or from HF's own model classes (CLIP, T5), so a misread of
upstream naming surfaces as loudly-named orphan keys instead of silently
uninitialized weights.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax

from stablediffusioneo_tpu.checkpoint.accounting import (
    ConversionAccountingError,
    account,
    account_pipeline,
)
from stablediffusioneo_tpu.checkpoint.convert import (
    convert_clip,
    convert_controlnet,
    convert_openclip_text,
    convert_unet,
    convert_vae,
)
from stablediffusioneo_tpu.config import (
    CLIPTextConfig,
    ControlNetConfig,
    VAEConfig,
)

from torch_ref import TorchControlNet, TorchUNet, TorchVAE, state_dict_numpy
from test_full_topology_parity import SD15_TOPO, SD2X_TOPO


def eval_shape(fn, *args):
    return jax.eval_shape(fn, *args)


KEY = jax.random.PRNGKey(0)


# -------------------------------------------------------------- SD models


class TestSDConverters:
    def test_unet_sd15_topology(self):
        from stablediffusioneo_tpu.models import init_unet

        torch.manual_seed(0)
        sd = state_dict_numpy(TorchUNet(SD15_TOPO).eval())
        rep = account(
            convert_unet, sd, SD15_TOPO, prefix="",
            expect=eval_shape(lambda k: init_unet(k, SD15_TOPO), KEY),
        )
        rep.assert_complete("unet_sd15")
        assert not rep.multi_reads

    def test_unet_sd2x_head_channels(self):
        from stablediffusioneo_tpu.models import init_unet

        torch.manual_seed(1)
        sd = state_dict_numpy(TorchUNet(SD2X_TOPO).eval())
        account(
            convert_unet, sd, SD2X_TOPO, prefix="",
            expect=eval_shape(lambda k: init_unet(k, SD2X_TOPO), KEY),
        ).assert_complete("unet_sd2x")

    def test_controlnet(self):
        from stablediffusioneo_tpu.models import init_controlnet

        ccfg = ControlNetConfig(unet=SD15_TOPO)
        torch.manual_seed(2)
        sd = state_dict_numpy(TorchControlNet(ccfg).eval())
        rep = account(
            convert_controlnet, sd, ccfg, prefix="",
            expect=eval_shape(lambda k: init_controlnet(k, ccfg), KEY),
        )
        rep.assert_complete("controlnet")
        assert not rep.multi_reads

    def test_vae(self):
        from stablediffusioneo_tpu.models import init_vae

        vcfg = VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                         groups=8)
        torch.manual_seed(3)
        sd = {k: v.detach().numpy()
              for k, v in TorchVAE(vcfg).eval().state_dict().items()}
        account(
            convert_vae, sd, vcfg, prefix="",
            expect=eval_shape(lambda k: init_vae(k, vcfg), KEY),
        ).assert_complete("vae")

    def test_clip_hf_universe(self):
        """Key universe from transformers' own CLIPTextModel — the exact
        class the checkpoint's cond_stage_model wraps — not a mirror."""
        from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

        from stablediffusioneo_tpu.models import init_clip_text

        cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                             intermediate_size=64, num_layers=2, num_heads=2,
                             max_length=16)
        hf = CLIPTextModel(HFConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            max_position_embeddings=cfg.max_length,
            hidden_act="quick_gelu")).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        rep = account(
            convert_clip, sd, cfg, prefix="",
            # persistent int buffer in older transformers; static arange here
            ignore=(r"text_model\.embeddings\.position_ids",),
            expect=eval_shape(lambda k: init_clip_text(k, cfg), KEY),
        )
        rep.assert_complete("clip")

    def test_openclip_text_tower(self):
        """OpenCLIP naming via torch's own MultiheadAttention (authentic
        in_proj packing) — SD-2.x cond_stage_model.model.* layout."""
        from stablediffusioneo_tpu.models import init_clip_text

        cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                             intermediate_size=64, num_layers=2, num_heads=2,
                             max_length=16, projection_dim=32)
        torch.manual_seed(4)
        m = _openclip_text_mirror(cfg)
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        rep = account(
            convert_openclip_text, sd, cfg, prefix="",
            # serialized causal mask + similarity scale — never used.
            # text_projection IS consumed now (clip_text_pooled / SDXL).
            ignore=(r"attn_mask", r"logit_scale"),
            expect=eval_shape(lambda k: init_clip_text(k, cfg), KEY),
        )
        rep.assert_complete("openclip_text")
        assert rep.ignored == {"attn_mask", "logit_scale"}
        assert "text_projection" in rep.tree  # pooled-output projection

    def test_t5_hf_universe(self):
        from stablediffusioneo_tpu.models.t5 import convert_t5, init_t5, tiny_t5
        from test_t5 import _hf_t5

        cfg = tiny_t5()
        hf = _hf_t5(cfg)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        account(
            convert_t5, sd, cfg,
            # HF serializes the tied embedding twice; `shared.weight` is the
            # canonical copy convert_t5 reads
            ignore=(r"encoder\.embed_tokens\.weight",),
            expect=eval_shape(lambda k: init_t5(k, cfg), KEY),
        ).assert_complete("t5")


def _openclip_text_mirror(cfg):
    d, ctx = cfg.hidden_size, cfg.max_length

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(d)
            self.attn = nn.MultiheadAttention(d, cfg.num_heads)
            self.ln_2 = nn.LayerNorm(d)
            self.mlp = nn.Module()
            self.mlp.c_fc = nn.Linear(d, cfg.intermediate_size)
            self.mlp.c_proj = nn.Linear(cfg.intermediate_size, d)

    class Tower(nn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = nn.Embedding(cfg.vocab_size, d)
            self.positional_embedding = nn.Parameter(torch.zeros(ctx, d))
            self.transformer = nn.Module()
            self.transformer.resblocks = nn.ModuleList(
                [Block() for _ in range(cfg.num_layers)])
            self.ln_final = nn.LayerNorm(d)
            self.register_buffer("attn_mask", torch.zeros(ctx, ctx))
            self.text_projection = nn.Parameter(torch.zeros(d, d))
            self.logit_scale = nn.Parameter(torch.zeros(()))

    return Tower().eval()


# -------------------------------------------------- full checkpoint gates


class TestFullCheckpointAccounting:
    @pytest.fixture(scope="class")
    def full_sd(self):
        """Tiny full-checkpoint state dict with the real top-level layout:
        four model prefixes + DDPM schedule buffers + EMA leftovers."""
        from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

        from stablediffusioneo_tpu.config import tiny_pipeline

        cfg = tiny_pipeline()
        torch.manual_seed(0)
        sd = {}
        for mod, pre in (
            (TorchUNet(cfg.unet).eval(), "model.diffusion_model."),
            (TorchControlNet(cfg.controlnet).eval(), "control_model."),
            (TorchVAE(cfg.vae).eval(), "first_stage_model."),
        ):
            for k, v in mod.state_dict().items():
                sd[pre + k] = v.numpy()
        hf = CLIPTextModel(HFConfig(
            vocab_size=cfg.clip.vocab_size, hidden_size=cfg.clip.hidden_size,
            intermediate_size=cfg.clip.intermediate_size,
            num_hidden_layers=cfg.clip.num_layers,
            num_attention_heads=cfg.clip.num_heads,
            max_position_embeddings=cfg.clip.max_length,
            hidden_act="quick_gelu")).eval()
        for k, v in hf.state_dict().items():
            sd["cond_stage_model.transformer." + k] = v.numpy()
        # LatentDiffusion registers these buffers in every real checkpoint
        for k in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                  "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                  "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
                  "sqrt_recipm1_alphas_cumprod", "posterior_variance",
                  "posterior_log_variance_clipped", "posterior_mean_coef1",
                  "posterior_mean_coef2", "logvar"):
            sd[k] = np.zeros(10, np.float32)
        sd["model_ema.decay"] = np.zeros((), np.float32)
        sd["cond_stage_model.transformer.text_model.embeddings.position_ids"] \
            = np.arange(cfg.clip.max_length)[None]
        return sd, cfg

    def test_pipeline_accounting_complete(self, full_sd):
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )

        sd, cfg = full_sd
        rep = account_pipeline(sd, cfg, expect={
            "unet": eval_shape(lambda k: init_unet(k, cfg.unet), KEY),
            "controlnet": eval_shape(
                lambda k: init_controlnet(k, cfg.controlnet), KEY),
            "vae": eval_shape(lambda k: init_vae(k, cfg.vae), KEY),
            "clip": eval_shape(lambda k: init_clip_text(k, cfg.clip), KEY),
        })
        rep.assert_complete("pipeline")
        # schedule buffers + EMA + position_ids land in ignored, not orphans
        assert "betas" in rep.ignored and "model_ema.decay" in rep.ignored
        assert not rep.multi_reads  # each key consumed by exactly one model

    def test_orphan_key_fails_loudly(self, full_sd):
        sd, cfg = full_sd
        bad = dict(sd)
        bad["control_model.mystery_block.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ConversionAccountingError,
                           match="mystery_block"):
            account_pipeline(bad, cfg).assert_complete("pipeline")

    def test_missing_key_fails_loudly(self, full_sd):
        sd, cfg = full_sd
        bad = {k: v for k, v in sd.items()
               if k != "control_model.middle_block_out.0.weight"}
        with pytest.raises(KeyError, match="middle_block_out"):
            account_pipeline(bad, cfg)

    def test_structure_mismatch_fails(self, full_sd):
        """Wrong target config at same source: converter raises (KeyError on
        absent deeper blocks) or accounting flags structure drift."""
        sd, cfg = full_sd
        from stablediffusioneo_tpu.models import init_unet

        wrong = eval_shape(
            lambda k: init_unet(k, SD15_TOPO), KEY)  # deeper than tiny cfg
        rep = account(convert_unet, sd, cfg.unet,
                      scope_prefix="model.diffusion_model.", expect=wrong)
        with pytest.raises(ConversionAccountingError, match="missing"):
            rep.assert_complete("unet_wrong_cfg")


def _yolov5s_sd():
    """Upstream yolov5s state-dict universe from torch modules: nn.Conv2d +
    nn.BatchNorm2d per conv block (model.{i}.conv/.bn naming), nn.Identity
    for the parameterless upsample/concat slots so indices match upstream's
    model.0..24 ModuleList (practice_yolov5 engine shape source)."""
    from stablediffusioneo_tpu.yolo.model import _d, _w

    def cb(cin, cout, k):
        m = nn.Module()
        m.conv = nn.Conv2d(cin, cout, k, bias=False)
        m.bn = nn.BatchNorm2d(cout)
        return m

    def c3(cin, cout, n):
        m = nn.Module()
        ch = cout // 2
        m.cv1, m.cv2, m.cv3 = cb(cin, ch, 1), cb(cin, ch, 1), cb(2 * ch, cout, 1)
        blocks = []
        for _ in range(n):
            b = nn.Module()
            b.cv1, b.cv2 = cb(ch, ch, 1), cb(ch, ch, 3)
            blocks.append(b)
        m.m = nn.ModuleList(blocks)
        return m

    c1, c2, c3_, c4, c5 = _w(64), _w(128), _w(256), _w(512), _w(1024)
    no = 3 * 85
    det = nn.Module()
    det.m = nn.ModuleList([nn.Conv2d(c, no, 1) for c in (c3_, c4, c5)])
    det.register_buffer("anchors", torch.zeros(3, 3, 2))
    sppf = nn.Module()
    sppf.cv1, sppf.cv2 = cb(c5, c5 // 2, 1), cb(c5 * 2, c5, 1)
    root = nn.Module()
    root.model = nn.ModuleList([
        cb(3, c1, 6), cb(c1, c2, 3), c3(c2, c2, _d(3)), cb(c2, c3_, 3),
        c3(c3_, c3_, _d(6)), cb(c3_, c4, 3), c3(c4, c4, _d(9)),
        cb(c4, c5, 3), c3(c5, c5, _d(3)), sppf,
        cb(c5, c4, 1), nn.Identity(), nn.Identity(), c3(c5, c4, _d(3)),
        cb(c4, c3_, 1), nn.Identity(), nn.Identity(), c3(c4, c3_, _d(3)),
        cb(c3_, c3_, 3), nn.Identity(), c3(c4, c4, _d(3)),
        cb(c4, c4, 3), nn.Identity(), c3(c5, c5, _d(3)), det,
    ])
    return {k: v.detach().numpy() for k, v in root.state_dict().items()}


# ----------------------------------------------------- secondary networks


class TestSecondaryConverters:
    def test_hed(self, monkeypatch):
        import stablediffusioneo_tpu.annotators.hed as hed_mod
        from test_annotators_text import _TorchHED

        monkeypatch.setattr(
            hed_mod, "_BLOCKS",
            [(3, 8, 2), (8, 16, 2), (16, 32, 3), (32, 64, 3), (64, 64, 3)])
        torch.manual_seed(0)
        sd = {k: v.detach().numpy()
              for k, v in _TorchHED().eval().state_dict().items()}
        account(
            hed_mod.convert_hed, sd,
            expect=eval_shape(hed_mod.init_hed, KEY),
        ).assert_complete("hed")

    def test_dpt_large(self):
        from stablediffusioneo_tpu.annotators.midas import convert_dpt
        from test_pose_depth_mlsd import TestMidasDPT

        sd = TestMidasDPT()._tiny_sd()
        # structure gate for convert_dpt/init_dpt alignment lives in
        # test_pose_depth_mlsd.py::test_init_dpt_random_fallback
        account(convert_dpt, sd).assert_complete("dpt_large")

    def test_yolov5(self):
        from stablediffusioneo_tpu.yolo.model import convert_yolov5, init_yolov5

        sd = _yolov5s_sd()
        account(
            convert_yolov5, sd,
            # fixed anchor table: hard-coded in yolov5_apply's decode;
            # BN bookkeeping counters are not weights
            ignore=(r"model\.24\.anchors", r"model\.24\.anchor_grid",
                    r".*\.num_batches_tracked"),
            expect=eval_shape(lambda k: init_yolov5(k), KEY),
        ).assert_complete("yolov5")

    def test_inception(self):
        from stablediffusioneo_tpu.scoring.inception import convert_inception
        from test_yolo_scoring import TestInceptionV3

        sd = TestInceptionV3()._random_sd()
        account(convert_inception, sd).assert_complete("inception")


@pytest.mark.slow
class TestHeavyMirrorConverters:
    """Full-architecture mirrors (tens of millions of params) — slow tier."""

    def test_openpose_body(self):
        from stablediffusioneo_tpu.annotators.openpose import (
            convert_body, init_body,
        )
        from test_pose_depth_mlsd import _torch_body

        torch.manual_seed(0)
        sd = {k: v.detach().numpy()
              for k, v in _torch_body().eval().state_dict().items()}
        account(
            convert_body, sd, expect=eval_shape(init_body, KEY),
        ).assert_complete("openpose_body")

    def test_openpose_hand(self):
        from stablediffusioneo_tpu.annotators.openpose import (
            convert_hand, init_hand,
        )
        from test_pose_depth_mlsd import _torch_hand

        torch.manual_seed(0)
        sd = {k: v.detach().numpy()
              for k, v in _torch_hand().eval().state_dict().items()}
        account(
            convert_hand, sd, expect=eval_shape(init_hand, KEY),
        ).assert_complete("openpose_hand")

    def test_mlsd_large(self):
        import stablediffusioneo_tpu.annotators.mlsd_net as mn
        from test_pose_depth_mlsd import _torch_mlsd_large

        torch.manual_seed(0)
        tm = _torch_mlsd_large().eval()
        # num_batches_tracked buffers: BN folding uses mean/var/weight/bias
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        account(
            mn.convert_mlsd_large, sd,
            ignore=(r".*\.num_batches_tracked",),
        ).assert_complete("mlsd_large")

    def test_dpt_hybrid(self):
        import stablediffusioneo_tpu.annotators.midas_hybrid as mh
        from test_dpt_hybrid_mirror import Mirror

        torch.manual_seed(0)
        sd = {k: v.detach().numpy()
              for k, v in Mirror().eval().state_dict().items()}
        account(mh.convert_dpt_hybrid, sd).assert_complete("dpt_hybrid")

    def test_uniformer_upernet(self):
        import stablediffusioneo_tpu.annotators.uniformer as uf
        from test_uniformer_mirror import Segmentor

        torch.manual_seed(0)
        m = Segmentor().eval()
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        account(
            uf.convert_uniformer_upernet, sd,
            ignore=(r".*\.num_batches_tracked",),
        ).assert_complete("uniformer_upernet")
