"""SDXL-refiner tests: 4-level no-top-attn topology mirror parity,
bigG-only conditioning with aesthetic-score micro-conditioning, the
latent-space refine handoff, and strict checkpoint accounting."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.models import init_unet
from stablediffusioneo_tpu.models.sdxl import (
    refiner_add_time_ids,
    sdxl_refine_latents,
    sdxl_refiner_conditioning,
    sdxl_refiner_unet,
    tiny_sdxl_refiner,
)
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_ref import TorchUNet  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_sdxl_refiner()


class TestTopology:
    def test_real_config_dims(self):
        u = sdxl_refiner_unet()
        assert u.adm_in_channels == 2560
        assert u.context_dim == 1280
        # level 3 (ds 8) has no attention sites but feeds the middle depth
        from stablediffusioneo_tpu.models.unet import encoder_plan
        plan = encoder_plan(u)
        ds8 = [d for d in plan if d.get("ds") == 8]
        assert ds8 and all(not d["attn"] for d in ds8)
        assert u.depth_for(len(u.channel_mult) - 1) == 4  # middle block

    def test_mirror_parity_with_adm(self, rng):
        """Converted refiner-topology UNet matches the torch mirror —
        gates the (0,1,1,1) ladder + no-attn top level + transformer
        middle block + ADM y path in one forward."""
        from stablediffusioneo_tpu.checkpoint.convert import convert_unet
        from stablediffusioneo_tpu.models.unet import unet_apply

        torch.manual_seed(0)
        tm = TorchUNet(CFG.unet).eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_unet(sd, CFG.unet, prefix="")
        x = rng.standard_normal((2, 16, 16, 4), dtype=np.float32)
        t = np.asarray([3.0, 7.0], np.float32)
        ctx = rng.standard_normal((2, 5, CFG.unet.context_dim),
                                  dtype=np.float32)
        y = rng.standard_normal((2, CFG.unet.adm_in_channels),
                                dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(t), torch.from_numpy(ctx),
                     y=torch.from_numpy(y))
        got = np.asarray(unet_apply(params, CFG.unet, jnp.asarray(x),
                                    jnp.asarray(t), jnp.asarray(ctx),
                                    y=jnp.asarray(y)))
        np.testing.assert_allclose(
            got, ref.permute(0, 2, 3, 1).numpy(), rtol=3e-4, atol=3e-4)


class TestConditioning:
    def _params(self):
        from stablediffusioneo_tpu.models import init_clip_text

        return {"clip_g": init_clip_text(jax.random.PRNGKey(0), CFG.clip_g)}

    def test_shapes_and_widths(self):
        params = self._params()
        ids = jnp.asarray(np.full((2, CFG.clip_g.max_length), 3, np.int32))
        ctx, y = sdxl_refiner_conditioning(params, CFG, ids, (64, 64))
        assert ctx.shape == (2, CFG.clip_g.max_length, CFG.clip_g.hidden_size)
        assert y.shape == (2, CFG.unet.adm_in_channels)

    def test_aesthetic_score_changes_y_not_ctx(self):
        params = self._params()
        ids = jnp.asarray(np.full((1, CFG.clip_g.max_length), 3, np.int32))
        c1, y1 = sdxl_refiner_conditioning(params, CFG, ids, (64, 64),
                                           aesthetic_score=6.0)
        c2, y2 = sdxl_refiner_conditioning(params, CFG, ids, (64, 64),
                                           aesthetic_score=2.5)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-3
        # pooled half identical; only the fourier tail moves
        proj = CFG.clip_g.projection_dim
        np.testing.assert_array_equal(np.asarray(y1[:, :proj]),
                                      np.asarray(y2[:, :proj]))

    def test_add_time_ids_width(self):
        t = refiner_add_time_ids((64, 64), (0, 0), 6.0, batch=3,
                                 fourier_dim=8)
        assert t.shape == (3, 40)
        np.testing.assert_array_equal(t[0], t[2])  # per-batch broadcast


class TestRefine:
    def test_zero_eps_analytic_parity(self, rng):
        """Zero-init out conv -> eps == 0: the refine output is the noised
        entry latent carried through the closed-form DDIM recursion."""
        up = init_unet(jax.random.PRNGKey(0), CFG.unet)
        sched = DiffusionSchedule().ddim(6)
        z0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        ctx = jnp.asarray(rng.standard_normal(
            (1, 5, CFG.unet.context_dim)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal(
            (1, CFG.unet.adm_in_channels)).astype(np.float32))
        key = jax.random.PRNGKey(3)
        t_enc = 4
        out = np.asarray(sdxl_refine_latents(
            up, CFG, sched, z0, t_enc, ctx, ctx, y, y,
            jnp.asarray(5.0), key))
        # replicate: key split -> noise -> closed-form recursion over tail
        _, kn = jax.random.split(key)
        n = len(sched["timesteps"])
        tail = {k: np.asarray(v)[n - t_enc:] for k, v in sched.items()}
        a0 = tail["alphas"][0]
        noise = np.asarray(jax.random.normal(kn, z0.shape, jnp.float32))
        x = np.sqrt(a0) * np.asarray(z0, np.float64) \
            + np.sqrt(1 - a0) * noise
        for i in range(t_enc):
            x = np.sqrt(tail["alphas_prev"][i]) * x / np.sqrt(tail["alphas"][i])
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5)

    def test_t_enc_validation(self, rng):
        up = init_unet(jax.random.PRNGKey(0), CFG.unet)
        sched = DiffusionSchedule().ddim(4)
        z0 = jnp.zeros((1, 8, 8, 4))
        ctx = jnp.zeros((1, 5, CFG.unet.context_dim))
        y = jnp.zeros((1, CFG.unet.adm_in_channels))
        with pytest.raises(ValueError, match="t_enc"):
            sdxl_refine_latents(up, CFG, sched, z0, 5, ctx, ctx, y, y,
                                jnp.asarray(5.0), jax.random.PRNGKey(0))


class TestLoader:
    def _ckpt(self, tmp_path, extra=None):
        from test_key_accounting import _openclip_text_mirror

        torch.manual_seed(0)
        sd = {}
        for k, v in TorchUNet(CFG.unet).eval().state_dict().items():
            sd["model.diffusion_model." + k] = v
        from torch_ref import TorchVAE
        for k, v in TorchVAE(CFG.vae).eval().state_dict().items():
            sd["first_stage_model." + k] = v
        for k, v in _openclip_text_mirror(CFG.clip_g).state_dict().items():
            sd["conditioner.embedders.0.model." + k] = v
        sd["betas"] = torch.zeros(10)
        if extra:
            sd.update(extra)
        path = str(tmp_path / "refiner.pth")
        torch.save({"state_dict": sd}, path)
        return path

    def test_strict_load(self, tmp_path):
        from stablediffusioneo_tpu.checkpoint import (
            load_sdxl_refiner_pipeline,
        )

        params = load_sdxl_refiner_pipeline(self._ckpt(tmp_path), CFG)
        assert set(params) == {"unet", "clip_g", "vae"}
        assert "text_projection" in params["clip_g"]

    def test_foreign_key_fails(self, tmp_path):
        from stablediffusioneo_tpu.checkpoint import (
            load_sdxl_refiner_pipeline,
        )

        path = self._ckpt(
            tmp_path,
            extra={"conditioner.embedders.3.model.w": torch.zeros(2)})
        with pytest.raises(ValueError, match="outside every model scope"):
            load_sdxl_refiner_pipeline(path, CFG)
