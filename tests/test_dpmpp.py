"""DPM-Solver++(2M) sampler tests: analytic recursion parity with the model
output forced to zero, determinism, and pipeline integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.dpm_solver import dpmpp_sample_scan, dpmpp_schedule

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


def numpy_dpmpp_zero_eps(sched, x):
    """Analytic 2M recursion when eps_hat == 0 (=> x0 = x / alpha_cur)."""
    x = x.astype(np.float64)
    prev_x0, prev_lam, have = None, None, False
    n = len(sched["t"])
    for i in range(n):
        a_c, s_c, l_c = sched["alpha_cur"][i], sched["sigma_cur"][i], sched["lambda_cur"][i]
        a_n, s_n, l_n = sched["alpha_next"][i], sched["sigma_next"][i], sched["lambda_next"][i]
        x0 = x / a_c
        h = l_n - l_c
        if have:
            r = (l_c - prev_lam) / max(h, 1e-12)
            c = 1.0 / (2.0 * max(r, 1e-12))
            d = (1 + c) * x0 - c * prev_x0
        else:
            d = x0
        x = (s_n / s_c) * x - a_n * np.expm1(-h) * d
        prev_x0, prev_lam, have = x0, l_c, True
    return x


class TestDPMpp:
    def test_schedule_monotone(self):
        sched = dpmpp_schedule(DiffusionSchedule(), 10)
        assert len(sched["t"]) == 10
        assert (np.diff(sched["t"]) < 0).all()  # sampling order
        assert (sched["lambda_next"] > sched["lambda_cur"]).all()  # denoising

    def test_zero_eps_analytic_parity(self, rng):
        """With the UNet's zero-init out conv (faithful init), eps_hat == 0,
        so the scan must reproduce the analytic recursion exactly."""
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        up = init_unet(ks[0], CFG.unet)           # out conv zero-init
        cp = init_controlnet(ks[1], CFG.controlnet)
        sched = dpmpp_schedule(DiffusionSchedule(), 6)
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        hint = rng.random((1, 64, 64, 3), dtype=np.float32)
        ctx = rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32)
        out = np.asarray(
            dpmpp_sample_scan(
                up, cp, CFG.controlnet, sched, jnp.asarray(x_T),
                jnp.asarray(hint), jnp.asarray(ctx), jnp.asarray(ctx),
                jnp.asarray(9.0), jnp.ones(5, jnp.float32),
            )
        )
        ref = numpy_dpmpp_zero_eps(sched, x_T)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_pipeline_integration(self, rng):
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {
            "unet": init_unet(ks[0], CFG.unet),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        pipe = Canny2ImagePipeline(
            params, toy_tokenizer(max_length=CFG.clip.max_length), CFG,
            persistent_cache=False,
        )
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kwargs = dict(num_samples=1, image_resolution=64, ddim_steps=2, seed=5)
        a = pipe.process(img, "a bird", sampler="dpmpp", **kwargs)[1]
        b = pipe.process(img, "a bird", sampler="dpmpp", **kwargs)[1]
        np.testing.assert_array_equal(a, b)  # ODE sampler: deterministic
        assert a.dtype == np.uint8


class TestEncoderCache:
    def _setup(self, rng):
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        up = init_unet(ks[0], CFG.unet)
        cp = init_controlnet(ks[1], CFG.controlnet)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        hint = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        ctx = jnp.asarray(rng.standard_normal((1, 5, CFG.unet.context_dim), dtype=np.float32))
        return up, cp, x_T, hint, ctx

    def test_all_full_steps_match_baseline(self, rng):
        """With every step a key step, the cached variant must reproduce
        the plain scan exactly (validates the encode/middle/decode split)."""
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
        from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan

        up, cp, x_T, hint, ctx = self._setup(rng)
        sched = DiffusionSchedule().ddim(2)
        args = (up, cp, CFG.controlnet, sched, x_T, hint, ctx, ctx,
                jnp.asarray(9.0), jnp.ones(5, jnp.float32), jax.random.PRNGKey(0))
        base = np.asarray(ddim_sample_scan(*args))
        # 2 steps + interval 2: run_full = [True, True] (last-2 rule)
        cached = np.asarray(ddim_sample_scan(*args, encoder_cache_interval=2))
        np.testing.assert_allclose(cached, base, rtol=1e-5, atol=1e-5)

    def test_cached_steps_run(self, rng):
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
        from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan

        up, cp, x_T, hint, ctx = self._setup(rng)
        sched = DiffusionSchedule().ddim(6)
        args = (up, cp, CFG.controlnet, sched, x_T, hint, ctx, ctx,
                jnp.asarray(9.0), jnp.ones(5, jnp.float32), jax.random.PRNGKey(0))
        base = np.asarray(ddim_sample_scan(*args))
        fast = np.asarray(ddim_sample_scan(*args, encoder_cache_interval=3))
        assert np.isfinite(fast).all()
        assert fast.shape == base.shape


class TestKarrasSpacing:
    def test_schedule_properties(self):
        """Karras rho-7 spacing: same keys/shapes as uniform (engine reuse),
        monotone-descending VE sigmas spanning the trained range, steps
        denser at the low-noise end."""
        ds = DiffusionSchedule()
        n = 10
        uni = dpmpp_schedule(ds, n)
        kar = dpmpp_schedule(ds, n, spacing="karras")
        assert set(kar) == set(uni)
        for k in kar:
            assert kar[k].shape == uni[k].shape, k
        sig_k = kar["sigma_cur"] / kar["alpha_cur"]  # VE sigma, descending
        assert (np.diff(sig_k) < 0).all()
        abar = ds.alphas_cumprod
        sig_max = float(np.sqrt((1 - abar[-1]) / abar[-1]))
        np.testing.assert_allclose(sig_k[0], sig_max, rtol=1e-4)
        # alpha^2 + sigma^2 == 1 (VP identity holds exactly)
        np.testing.assert_allclose(
            kar["alpha_cur"] ** 2 + kar["sigma_cur"] ** 2, 1.0, rtol=1e-5)
        # rho-7 clusters steps near sigma_min: the last VE-sigma gap is far
        # smaller than the first
        assert sig_k[-1] - kar["sigma_next"][-1] / kar["alpha_next"][-1] \
            < 0.05 * (sig_k[0] - sig_k[1])
        # model-eval times are fractional but inside the trained range
        assert (kar["t"] >= 0).all() and (kar["t"] <= len(abar) - 1).all()
        with pytest.raises(ValueError, match="spacing"):
            dpmpp_schedule(ds, n, spacing="nope")

    def test_runtime_karras_sampler(self, rng):
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        cnt = iter(jax.random.split(ks[0], 4096))
        params = {
            "unet": jax.tree.map(
                lambda x: jax.random.normal(next(cnt), x.shape, x.dtype)
                * 0.05, init_unet(ks[0], CFG.unet)),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        rt = CNSDRuntime(params, CFG, persistent_cache=False)
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        key = jax.random.PRNGKey(3)
        out_u = np.asarray(rt.sample_decode(
            4, None, hint, ctx, ctx, key, sampler="dpmpp"))
        out_k = np.asarray(rt.sample_decode(
            4, None, hint, ctx, ctx, key, sampler="dpmpp-karras"))
        assert out_k.shape == out_u.shape and out_k.dtype == np.uint8
        assert np.any(out_k != out_u), "spacing change had no effect"

    def test_karras_shares_the_dpmpp_engine(self, rng):
        """The spacing is schedule-only: both sampler strings must resolve
        to the SAME Engine object (no duplicate multi-minute compile)."""
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        params = {
            "unet": init_unet(ks[0], CFG.unet),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        rt = CNSDRuntime(params, CFG, persistent_cache=False)
        e1 = rt.sample_decode_engine(2, 1, 64, 64, sampler="dpmpp")
        e2 = rt.sample_decode_engine(2, 1, 64, 64, sampler="dpmpp-karras")
        assert e1 is e2
