"""SDXL-topology UNet: per-LEVEL transformer depth + ADM (label_emb)
conditioning, A/B against the torch mirror through the converter with
strict key accounting — tiny widths, real SDXL structure
((0, d1, d2) depth ladder, no attention at the top level, y input)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.checkpoint.convert import convert_unet
from stablediffusioneo_tpu.config import UNetConfig
from stablediffusioneo_tpu.models import init_unet
from stablediffusioneo_tpu.models.unet import (
    decoder_plan,
    encoder_plan,
    unet_apply,
)

from torch_ref import TorchUNet, state_dict_numpy

# tiny SDXL shape: 3 levels, NO attention at level 0 (depth 0), deeper
# transformers at the lower levels, head-channel attention, ADM input
XL = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2, 4),
    num_res_blocks=2,
    attention_resolutions=(2, 4),
    transformer_depth=(0, 2, 3),
    context_dim=64,
    num_head_channels=16,
    adm_in_channels=48,
    groups=8,
)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestSDXLTopology:
    def test_plans_follow_per_level_depth(self):
        enc = encoder_plan(XL)
        # level 0 has depth 0 -> no attention despite ds=1 not being in
        # attention_resolutions anyway; level 1 (ds=2) depth 2; level 2 des 4
        res = [d for d in enc if d["kind"] == "res"]
        assert [d["attn"] for d in res] == [False, False, True, True,
                                            True, True]
        assert [d["depth"] for d in res if d["attn"]] == [2, 2, 3, 3]
        dec = decoder_plan(XL)
        assert sum(1 for d in dec if d["attn"]) == 6  # (nrb+1) x 2 levels
        assert {d["depth"] for d in dec if d["attn"]} == {2, 3}

    def test_param_tree_has_label_emb_and_depths(self):
        p = init_unet(jax.random.PRNGKey(0), XL)
        assert "label_emb" in p
        assert p["label_emb"]["l1"]["w"].shape == (48, 128)
        # middle block carries the deepest level's transformer count
        assert len(p["middle_block"]["attn"]["blocks"]) == 3

    def test_requires_y(self):
        p = init_unet(jax.random.PRNGKey(0), XL)
        x = jnp.zeros((1, 8, 8, 4))
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 5, 64))
        with pytest.raises(ValueError, match="adm"):
            unet_apply(p, XL, x, t, ctx)


@pytest.mark.slow
class TestSDXLParity:
    def test_forward_matches_torch_mirror(self, rng):
        tu = TorchUNet(XL).eval()
        params = convert_unet(state_dict_numpy(tu), XL, prefix="")
        x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
        t = np.array([3.0, 500.0], np.float32)
        ctx = rng.standard_normal((2, 5, XL.context_dim)).astype(np.float32)
        y = rng.standard_normal((2, XL.adm_in_channels)).astype(np.float32)
        with torch.no_grad():
            ref = tu(torch.from_numpy(nchw(x)), torch.from_numpy(t),
                     torch.from_numpy(ctx), y=torch.from_numpy(y)).numpy()
        out = np.asarray(unet_apply(
            params, XL, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            y=jnp.asarray(y)))
        np.testing.assert_allclose(out, nhwc(ref), rtol=2e-4, atol=2e-4)
        # y must matter (the ADM path is live)
        out2 = np.asarray(unet_apply(
            params, XL, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            y=jnp.asarray(y + 1.0)))
        assert np.abs(out2 - out).max() > 1e-4

    def test_converter_key_accounting(self, rng):
        """Every torch key consumed exactly once, tree structure matches
        init (the round-3 accounting gate, applied to the SDXL topology —
        a per-level-depth misread would orphan transformer-block keys)."""
        from stablediffusioneo_tpu.checkpoint.accounting import account

        tu = TorchUNet(XL).eval()
        account(
            convert_unet, state_dict_numpy(tu), XL, prefix="",
            expect=jax.eval_shape(lambda k: init_unet(k, XL),
                                  jax.random.PRNGKey(0)),
        ).assert_complete("sdxl-unet")


@pytest.mark.slow
class TestSDXLControlNet:
    def test_controlled_forward_and_accounting(self, rng):
        """An ADM-conditioned (SDXL-style) ControlNet: y threads through
        both branches, the full controlled forward matches the torch
        mirrors, and the converter consumes label_emb exactly."""
        from stablediffusioneo_tpu.checkpoint.accounting import account
        from stablediffusioneo_tpu.checkpoint.convert import (
            convert_controlnet,
        )
        from stablediffusioneo_tpu.config import ControlNetConfig
        from stablediffusioneo_tpu.models import init_controlnet
        from stablediffusioneo_tpu.models.controlnet import (
            controlled_unet_apply,
        )

        import torch

        from torch_ref import TorchControlNet

        ccfg = ControlNetConfig(unet=XL)
        torch.manual_seed(5)
        tu = TorchUNet(XL).eval()
        tc = TorchControlNet(ccfg).eval()
        uparams = convert_unet(state_dict_numpy(tu), XL, prefix="")
        rep = account(
            convert_controlnet, state_dict_numpy(tc), ccfg, prefix="",
            expect=jax.eval_shape(lambda k: init_controlnet(k, ccfg),
                                  jax.random.PRNGKey(0)),
        )
        rep.assert_complete("sdxl-controlnet")
        cparams = rep.tree

        x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        hint = rng.random((1, 64, 64, 3)).astype(np.float32)
        t = np.array([123.0], np.float32)
        ctx = rng.standard_normal((1, 5, XL.context_dim)).astype(np.float32)
        y = rng.standard_normal((1, XL.adm_in_channels)).astype(np.float32)
        with torch.no_grad():
            taps = tc(torch.from_numpy(nchw(x)), torch.from_numpy(nchw(hint)),
                      torch.from_numpy(t), torch.from_numpy(ctx),
                      y=torch.from_numpy(y))
            ref = tu(torch.from_numpy(nchw(x)), torch.from_numpy(t),
                     torch.from_numpy(ctx), control=list(taps),
                     y=torch.from_numpy(y)).numpy()
        out = np.asarray(controlled_unet_apply(
            uparams, cparams, ccfg, jnp.asarray(x), jnp.asarray(hint),
            jnp.asarray(t), jnp.asarray(ctx), y=jnp.asarray(y)))
        np.testing.assert_allclose(out, nhwc(ref), rtol=2e-4, atol=2e-4)
