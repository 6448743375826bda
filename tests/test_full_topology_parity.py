"""Parity at REAL SD-1.5 / SD-2.x topology (reduced width).

The tiny_pipeline() config used by test_model_parity.py has channel_mult
(1, 2) and attention at every level, so several checkpoint-converter
branches are never exercised there — most importantly the no-attention
upsample path in `convert_unet` (`output_blocks.{i}.1.conv`, hit only at
SD-1.5's ds=8 decoder level where attention is absent) and plan/key
alignment at full (1, 2, 4, 4) depth with 2 res blocks.

These tests run the torch mirrors (tests/torch_ref.py, real checkpoint key
naming) at the FULL SD-1.5 plan — channel_mult (1,2,4,4), 2 res blocks,
attention_resolutions (4,2,1) — with model_channels shrunk 320->32 so the
whole thing runs in seconds on CPU. Every encoder_plan/decoder_plan/
convert_unet branch that the real `control_sd15_canny.pth` exercises is
exercised here, through the same key names
(reference: ldm/modules/diffusionmodules/openaimodel.py:443-788,
cldm/cldm.py:48-305).

A second config covers the SD-2.x head-channel mode (num_head_channels
instead of num_heads — openaimodel.py's per-block head computation).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stablediffusioneo_tpu.config import ControlNetConfig, UNetConfig
from stablediffusioneo_tpu.checkpoint.convert import (
    convert_controlnet,
    convert_unet,
)
from stablediffusioneo_tpu.models import (
    controlled_unet_apply,
    controlnet_apply,
    unet_apply,
)
from stablediffusioneo_tpu.models.unet import decoder_plan, encoder_plan

from torch_ref import TorchControlNet, TorchUNet, state_dict_numpy

# SD-1.5 topology, width 320 -> 32. Latent 32x32 so ds reaches 8 and the
# deepest level genuinely has no attention (32/8=4 ... ds 1,2,4 attend, 8
# does not — exactly the real model's shape).
SD15_TOPO = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2, 4, 4),
    num_res_blocks=2,
    attention_resolutions=(4, 2, 1),
    transformer_depth=1,
    context_dim=64,
    num_heads=4,
    groups=8,
)

# SD-2.x mode: per-head channel count fixed, heads vary per level
# (32/8=4, 64/8=8, 128/8=16 heads), v-param checkpoints use this.
SD2X_TOPO = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2, 4, 4),
    num_res_blocks=2,
    attention_resolutions=(4, 2, 1),
    transformer_depth=1,
    context_dim=64,
    num_head_channels=8,
    groups=8,
)

ATOL = 5e-4
RTOL = 5e-4


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_plans_match_sd15_shape():
    """Structural gate: the plan at full topology must produce SD-1.5's
    block counts — 12 input blocks + conv_in = 13 taps, 12 output blocks."""
    enc = encoder_plan(SD15_TOPO)
    dec = decoder_plan(SD15_TOPO)
    assert len(enc) == 12  # conv + 4 levels x 2 res + 3 downs
    assert len(dec) == 12  # 4 levels x 3
    kinds = [d["kind"] for d in enc]
    assert kinds == ["conv", "res", "res", "down", "res", "res", "down",
                     "res", "res", "down", "res", "res"]
    # attention exactly at ds in (1, 2, 4): first three levels
    assert [d.get("attn", False) for d in enc] == [
        False, True, True, False, True, True, False, True, True, False,
        False, False,
    ]
    # decoder: deepest level (ds=8) has up but NO attn -> the up_idx=1
    # converter branch; mid levels have attn AND up -> up_idx=2.
    ups = [d["up"] for d in dec]
    attns = [d["attn"] for d in dec]
    assert ups == [False, False, True, False, False, True, False, False,
                   True, False, False, False]
    assert attns == [False, False, False, True, True, True, True, True,
                     True, True, True, True]
    # the load-bearing combination: up=True with attn=False exists (ds=8)
    assert any(u and not a for u, a in zip(ups, attns))
    # and up=True with attn=True exists (ds=4, ds=2)
    assert any(u and a for u, a in zip(ups, attns))


@pytest.fixture(scope="module")
def sd15_torch_unet():
    torch.manual_seed(0)
    return TorchUNet(SD15_TOPO).eval()


@pytest.fixture(scope="module")
def sd15_torch_controlnet():
    torch.manual_seed(1)
    return TorchControlNet(ControlNetConfig(unet=SD15_TOPO)).eval()


class TestSD15Topology:
    def test_unet_parity(self, rng, sd15_torch_unet):
        """Covers every convert_unet branch at full depth, incl. the
        no-attn upsample (output_blocks.{i}.1.conv) at ds=8."""
        sd = state_dict_numpy(sd15_torch_unet)
        # the real checkpoint has exactly these keys for the no-attn upsample
        assert "output_blocks.2.1.conv.weight" in sd       # ds=8: up at .1
        assert "output_blocks.5.2.conv.weight" in sd       # ds=4: attn at .1, up at .2
        params = convert_unet(sd, SD15_TOPO, prefix="")
        x = rng.standard_normal((1, 32, 32, 4), dtype=np.float32)
        t = np.array([500.0], np.float32)
        ctx = rng.standard_normal((1, 5, SD15_TOPO.context_dim), dtype=np.float32)
        with torch.no_grad():
            ref = sd15_torch_unet(
                torch.from_numpy(nchw(x)), torch.from_numpy(t),
                torch.from_numpy(ctx),
            ).numpy()
        out = np.asarray(unet_apply(params, SD15_TOPO, jnp.asarray(x),
                                    jnp.asarray(t), jnp.asarray(ctx)))
        np.testing.assert_allclose(out, nhwc(ref), rtol=RTOL, atol=ATOL)

    def test_controlnet_13_taps(self, rng, sd15_torch_controlnet):
        ccfg = ControlNetConfig(unet=SD15_TOPO)
        params = convert_controlnet(
            state_dict_numpy(sd15_torch_controlnet), ccfg, prefix="")
        x = rng.standard_normal((1, 32, 32, 4), dtype=np.float32)
        hint = rng.random((1, 256, 256, 3), dtype=np.float32)
        t = np.array([42.0], np.float32)
        ctx = rng.standard_normal((1, 5, SD15_TOPO.context_dim), dtype=np.float32)
        with torch.no_grad():
            refs = sd15_torch_controlnet(
                torch.from_numpy(nchw(x)), torch.from_numpy(nchw(hint)),
                torch.from_numpy(t), torch.from_numpy(ctx),
            )
        assert len(refs) == 13  # the real SD-1.5 tap count (cldm.py)
        outs = controlnet_apply(params, ccfg, jnp.asarray(x), jnp.asarray(hint),
                                jnp.asarray(t), jnp.asarray(ctx))
        assert len(outs) == 13
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(o), nhwc(r.numpy()),
                                       rtol=RTOL, atol=ATOL)

    def test_controlled_unet_parity(self, rng, sd15_torch_unet,
                                    sd15_torch_controlnet):
        """Full ControlledUnetModel semantics at real depth: control list
        consumed from the END, middle tap added before decode
        (cldm/cldm.py:22-45)."""
        ccfg = ControlNetConfig(unet=SD15_TOPO)
        uparams = convert_unet(state_dict_numpy(sd15_torch_unet),
                               SD15_TOPO, prefix="")
        cparams = convert_controlnet(
            state_dict_numpy(sd15_torch_controlnet), ccfg, prefix="")
        x = rng.standard_normal((1, 32, 32, 4), dtype=np.float32)
        hint = rng.random((1, 256, 256, 3), dtype=np.float32)
        t = np.array([123.0], np.float32)
        ctx = rng.standard_normal((1, 5, SD15_TOPO.context_dim), dtype=np.float32)
        scales = [0.825 ** (12 - i) for i in range(13)]
        with torch.no_grad():
            ctrl = sd15_torch_controlnet(
                torch.from_numpy(nchw(x)), torch.from_numpy(nchw(hint)),
                torch.from_numpy(t), torch.from_numpy(ctx))
            ctrl = [c * s for c, s in zip(ctrl, scales)]
            ref = sd15_torch_unet(
                torch.from_numpy(nchw(x)), torch.from_numpy(t),
                torch.from_numpy(ctx), control=ctrl,
            ).numpy()
        out = np.asarray(controlled_unet_apply(
            uparams, cparams, ccfg, jnp.asarray(x), jnp.asarray(hint),
            jnp.asarray(t), jnp.asarray(ctx), control_scales=scales,
        ))
        np.testing.assert_allclose(out, nhwc(ref), rtol=RTOL, atol=1e-3)


class TestVAEFullTopology:
    def test_vae_parity_sd15_mult(self, rng):
        """VAE at SD-1.5 channel multipliers (1,2,4,4): exercises the
        nin_shortcut converter branch (channel-changing res blocks), which
        the tiny (1,1,1,1) config never hits, plus the asymmetric
        downsample pad at every level (model.py Encoder/Decoder)."""
        from stablediffusioneo_tpu.config import VAEConfig
        from stablediffusioneo_tpu.checkpoint.convert import convert_vae
        from stablediffusioneo_tpu.models import vae_decode, vae_encode
        from torch_ref import TorchVAE

        vcfg = VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                         groups=8)
        torch.manual_seed(5)
        tv = TorchVAE(vcfg).eval()
        sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
        # channel-changing blocks must exist in the real naming
        assert any("nin_shortcut" in k for k in sd)
        params = convert_vae(sd, vcfg, prefix="")
        x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
        with torch.no_grad():
            ref_m = tv.encode_moments(torch.from_numpy(nchw(x))).numpy()
        dist = vae_encode(params, vcfg, jnp.asarray(x))
        moments = np.concatenate(
            [np.asarray(dist.mean), np.asarray(2.0 * jnp.log(dist.std))],
            axis=-1)
        np.testing.assert_allclose(moments, nhwc(ref_m), rtol=ATOL, atol=ATOL)

        z = rng.standard_normal((1, 8, 8, vcfg.z_channels), dtype=np.float32)
        with torch.no_grad():
            ref_img = tv.decode(torch.from_numpy(nchw(z))).numpy()
        img = np.asarray(vae_decode(params, vcfg, jnp.asarray(z), scaled=False))
        np.testing.assert_allclose(img, nhwc(ref_img), rtol=ATOL, atol=ATOL)


class TestSD2xTopologyHeadChannels:
    def test_unet_parity_head_channels(self, rng):
        """SD-2.x num_head_channels mode at full depth: heads computed
        per-block (openaimodel.py num_head_channels branch) must agree
        between the torch mirror and the JAX model through the converter."""
        torch.manual_seed(7)
        tm = TorchUNet(SD2X_TOPO).eval()
        params = convert_unet(state_dict_numpy(tm), SD2X_TOPO, prefix="")
        x = rng.standard_normal((1, 32, 32, 4), dtype=np.float32)
        t = np.array([77.0], np.float32)
        ctx = rng.standard_normal((1, 5, SD2X_TOPO.context_dim), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(nchw(x)), torch.from_numpy(t),
                     torch.from_numpy(ctx)).numpy()
        out = np.asarray(unet_apply(params, SD2X_TOPO, jnp.asarray(x),
                                    jnp.asarray(t), jnp.asarray(ctx)))
        np.testing.assert_allclose(out, nhwc(ref), rtol=RTOL, atol=ATOL)

    def test_heads_vary_per_level(self):
        assert SD2X_TOPO.heads_for(32) == 4
        assert SD2X_TOPO.heads_for(64) == 8
        assert SD2X_TOPO.heads_for(128) == 16
