"""End-to-end model parity: JAX models (via checkpoint converter) vs torch.

The equivalent of the reference's conversion-boundary checks
(`onnxruntime_check`, export_onnx_all.py:60-100): every model is run in an
independent executor (torch-cpu) and the JAX output must match at fp32
tolerances. The state dicts use REAL SD checkpoint key naming, so these also
test checkpoint/convert.py end to end.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.checkpoint.convert import (
    convert_clip,
    convert_controlnet,
    convert_unet,
    convert_vae,
)
from stablediffusioneo_tpu.models import (
    controlled_unet_apply,
    controlnet_apply,
    clip_text_apply,
    unet_apply,
    vae_decode,
    vae_encode,
)

from torch_ref import TorchControlNet, TorchUNet, TorchVAE, state_dict_numpy

CFG = tiny_pipeline()
ATOL = 2e-4  # fp32 parity (reference guidance: fp32 ~1e-6..1e-5, but we
RTOL = 2e-4  # accumulate across a full UNet; still far below bf16 noise)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def torch_unet():
    torch.manual_seed(0)
    m = TorchUNet(CFG.unet).eval()
    return m


@pytest.fixture(scope="module")
def torch_controlnet():
    torch.manual_seed(1)
    m = TorchControlNet(CFG.controlnet).eval()
    return m


class TestUNetParity:
    def test_forward(self, rng, torch_unet):
        params = convert_unet(state_dict_numpy(torch_unet), CFG.unet, prefix="")
        x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
        t = np.array([3.0, 500.0], np.float32)
        ctx = rng.standard_normal((2, 5, CFG.unet.context_dim), dtype=np.float32)
        with torch.no_grad():
            ref = torch_unet(
                torch.from_numpy(nchw(x)), torch.from_numpy(t), torch.from_numpy(ctx)
            ).numpy()
        out = np.asarray(unet_apply(params, CFG.unet, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
        np.testing.assert_allclose(out, nhwc(ref), rtol=RTOL, atol=ATOL)

    @pytest.mark.slow  # fast-tier budget: covered at fast tier by test_full_topology_parity controlled_unet
    def test_forward_with_control(self, rng, torch_unet, torch_controlnet):
        """Full ControlledUnet path incl. control skip additions (cldm.py:22-45)."""
        uparams = convert_unet(state_dict_numpy(torch_unet), CFG.unet, prefix="")
        cparams = convert_controlnet(
            state_dict_numpy(torch_controlnet), CFG.controlnet, prefix=""
        )
        x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        hint = rng.random((1, 64, 64, 3), dtype=np.float32)
        t = np.array([123.0], np.float32)
        ctx = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        scales = [0.7 * (0.825 ** (12 - i)) for i in range(13)][: None]
        # tiny config has fewer taps; build matching-length scales
        with torch.no_grad():
            ctrl_ref = torch_controlnet(
                torch.from_numpy(nchw(x)),
                torch.from_numpy(nchw(hint)),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
            )
            n_taps = len(ctrl_ref)
            scales = [0.5 + 0.5 * i / n_taps for i in range(n_taps)]
            ctrl_scaled = [c * s for c, s in zip(ctrl_ref, scales)]
            ref = torch_unet(
                torch.from_numpy(nchw(x)),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
                control=ctrl_scaled,
            ).numpy()
        out = np.asarray(
            controlled_unet_apply(
                uparams, cparams, CFG.controlnet,
                jnp.asarray(x), jnp.asarray(hint), jnp.asarray(t), jnp.asarray(ctx),
                control_scales=scales,
            )
        )
        np.testing.assert_allclose(out, nhwc(ref), rtol=RTOL, atol=5e-4)


class TestControlNetParity:
    def test_13_outputs(self, rng, torch_controlnet):
        params = convert_controlnet(
            state_dict_numpy(torch_controlnet), CFG.controlnet, prefix=""
        )
        x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        hint = rng.random((1, 64, 64, 3), dtype=np.float32)
        t = np.array([42.0], np.float32)
        ctx = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        with torch.no_grad():
            refs = torch_controlnet(
                torch.from_numpy(nchw(x)),
                torch.from_numpy(nchw(hint)),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
            )
        outs = controlnet_apply(
            params, CFG.controlnet, jnp.asarray(x), jnp.asarray(hint),
            jnp.asarray(t), jnp.asarray(ctx),
        )
        assert len(outs) == len(refs)
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(o), nhwc(r.numpy()), rtol=RTOL, atol=ATOL)


class TestVAEParity:
    @pytest.mark.slow  # fast-tier budget: covered at fast tier by TestVAEFullTopology
    def test_encode_decode(self, rng):
        torch.manual_seed(2)
        tv = TorchVAE(CFG.vae).eval()
        params = convert_vae(state_dict_numpy(tv), CFG.vae, prefix="")
        x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
        with torch.no_grad():
            ref_moments = tv.encode_moments(torch.from_numpy(nchw(x))).numpy()
        dist = vae_encode(params, CFG.vae, jnp.asarray(x))
        moments = np.concatenate(
            [np.asarray(dist.mean), np.asarray(2.0 * jnp.log(dist.std))], axis=-1
        )
        np.testing.assert_allclose(moments, nhwc(ref_moments), rtol=RTOL, atol=ATOL)

        z = rng.standard_normal((1, 16, 16, CFG.vae.z_channels), dtype=np.float32)
        with torch.no_grad():
            ref_img = tv.decode(torch.from_numpy(nchw(z))).numpy()
        img = np.asarray(vae_decode(params, CFG.vae, jnp.asarray(z), scaled=False))
        np.testing.assert_allclose(img, nhwc(ref_img), rtol=RTOL, atol=ATOL)


class TestCLIPParity:
    def test_vs_hf_transformers(self, rng):
        """Golden: HF CLIPTextModel (the exact class FrozenCLIPEmbedder wraps)."""
        from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

        hf_cfg = HFConfig(
            vocab_size=CFG.clip.vocab_size,
            hidden_size=CFG.clip.hidden_size,
            intermediate_size=CFG.clip.intermediate_size,
            num_hidden_layers=CFG.clip.num_layers,
            num_attention_heads=CFG.clip.num_heads,
            max_position_embeddings=CFG.clip.max_length,
            hidden_act="quick_gelu",
        )
        torch.manual_seed(3)
        hf = CLIPTextModel(hf_cfg).eval()
        params = convert_clip(state_dict_numpy(hf), CFG.clip, prefix="")
        ids = rng.integers(0, CFG.clip.vocab_size, (2, CFG.clip.max_length)).astype(np.int32)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
        out = np.asarray(clip_text_apply(params, CFG.clip, jnp.asarray(ids)))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
