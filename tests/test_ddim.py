"""DDIM sampler parity: JAX lax.scan loop vs an explicit torch loop.

Deterministic setting (eta=0, shared x_T) — the analog of the reference's
seeded end-to-end checks (compute_score fixtures, seed 2946901). The torch
side re-implements p_sample_ddim's update math directly from the equations
(ddim_hacked.py:208-231) on the torch reference models.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.checkpoint.convert import convert_controlnet, convert_unet
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.ddim import DDIMSampler

from torch_ref import TorchControlNet, TorchUNet, state_dict_numpy
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def torch_ddim_loop(
    unet, ctrl, sched, x_T, hint, ctx_c, ctx_u, scale, scales, guess_mode=False
):
    x = torch.from_numpy(nchw(x_T))
    hint_t = torch.from_numpy(nchw(hint))
    cc = torch.from_numpy(ctx_c)
    cu = torch.from_numpy(ctx_u)
    n = len(sched["timesteps"])
    with torch.no_grad():
        for i in range(n):
            t = torch.full((x.shape[0],), float(sched["timesteps"][i]))
            ctrl_out = ctrl(x, hint_t, t, cc)
            ctrl_sc = [c * s for c, s in zip(ctrl_out, scales)]
            e_c = unet(x, t, cc, control=ctrl_sc)
            if guess_mode:
                e_u = unet(x, t, cu, control=None)
            else:
                ctrl_out_u = ctrl(x, hint_t, t, cu)
                ctrl_sc_u = [c * s for c, s in zip(ctrl_out_u, scales)]
                e_u = unet(x, t, cu, control=ctrl_sc_u)
            e = e_u + scale * (e_c - e_u)
            a_t = float(sched["alphas"][i])
            a_prev = float(sched["alphas_prev"][i])
            sq1m = float(sched["sqrt_one_minus_alphas"][i])
            pred_x0 = (x - sq1m * e) / np.sqrt(a_t)
            dir_xt = np.sqrt(1.0 - a_prev) * e
            x = np.sqrt(a_prev) * pred_x0 + dir_xt
    return np.transpose(x.numpy(), (0, 2, 3, 1))


class TestDDIMSampler:
    def _setup(self):
        torch.manual_seed(0)
        unet_t = TorchUNet(CFG.unet).eval()
        torch.manual_seed(1)
        ctrl_t = TorchControlNet(CFG.controlnet).eval()
        up = convert_unet(state_dict_numpy(unet_t), CFG.unet, prefix="")
        cp = convert_controlnet(state_dict_numpy(ctrl_t), CFG.controlnet, prefix="")
        sampler = DDIMSampler(CFG, up, cp)
        return unet_t, ctrl_t, sampler

    def test_three_step_parity(self, rng):
        unet_t, ctrl_t, sampler = self._setup()
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        hint = rng.random((1, 64, 64, 3), dtype=np.float32)
        ctx_c = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        ctx_u = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        scale = 9.0
        scales = sampler.control_scales(1.0, False)
        sched = sampler.schedule.ddim(3, eta=0.0)

        ref = torch_ddim_loop(unet_t, ctrl_t, sched, x_T, hint, ctx_c, ctx_u, scale, scales)
        out = np.asarray(
            sampler.sample(
                3, x_T.shape, jnp.asarray(hint), jnp.asarray(ctx_c), jnp.asarray(ctx_u),
                jax.random.PRNGKey(0), guidance_scale=scale, eta=0.0, strength=1.0,
                x_T=jnp.asarray(x_T),
            )
        )
        # CFG scale 9 amplifies small fp diffs; per-step latent MSE is the
        # reference metric (BASELINE.md: < 1e-3)
        mse = float(np.mean((out - ref) ** 2))
        assert mse < 1e-6, f"latent MSE {mse}"

    def test_guess_mode_parity(self, rng):
        unet_t, ctrl_t, sampler = self._setup()
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        hint = rng.random((1, 64, 64, 3), dtype=np.float32)
        ctx_c = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        ctx_u = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        scales = sampler.control_scales(1.0, True)
        sched = sampler.schedule.ddim(2, eta=0.0)
        ref = torch_ddim_loop(
            unet_t, ctrl_t, sched, x_T, hint, ctx_c, ctx_u, 9.0, scales, guess_mode=True
        )
        out = np.asarray(
            sampler.sample(
                2, x_T.shape, jnp.asarray(hint), jnp.asarray(ctx_c), jnp.asarray(ctx_u),
                jax.random.PRNGKey(0), guidance_scale=9.0, eta=0.0, strength=1.0,
                guess_mode=True, x_T=jnp.asarray(x_T),
            )
        )
        mse = float(np.mean((out - ref) ** 2))
        assert mse < 1e-6, f"latent MSE {mse}"

    def test_eta_noise_shape(self, rng):
        """eta>0 path runs and produces different (stochastic) output."""
        _, _, sampler = self._setup()
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        hint = rng.random((1, 64, 64, 3), dtype=np.float32)
        ctx = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        kwargs = dict(
            hint=jnp.asarray(hint), ctx_cond=jnp.asarray(ctx), ctx_uncond=jnp.asarray(ctx),
            guidance_scale=1.0, strength=1.0, x_T=jnp.asarray(x_T),
        )
        a = np.asarray(sampler.sample(2, x_T.shape, key=jax.random.PRNGKey(0), eta=1.0, **kwargs))
        b = np.asarray(sampler.sample(2, x_T.shape, key=jax.random.PRNGKey(1), eta=1.0, **kwargs))
        c = np.asarray(sampler.sample(2, x_T.shape, key=jax.random.PRNGKey(0), eta=1.0, **kwargs))
        assert a.shape == x_T.shape
        assert not np.allclose(a, b)  # different keys -> different noise
        np.testing.assert_allclose(a, c)  # same key -> deterministic
