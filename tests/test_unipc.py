"""UniPC sampler tests: zero-eps analytic parity against a numpy
re-implementation, convergence to the shared probability-flow ODE,
corrector benefit, and engine/pipeline integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.dpm_solver import (
    dpmpp_sample_scan,
    dpmpp_schedule,
)
from stablediffusioneo_tpu.pipeline.unipc import unipc_sample_scan

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


def numpy_unipc_zero_eps(sched, x):
    """The bh2 order-2 recursion when eps_hat == 0 (=> every x0 prediction
    is state / alpha at its eval point) — mirrors unipc_sample_scan."""
    x = x.astype(np.float64)
    n = len(sched["t"])
    m_cur = x / sched["alpha_cur"][0]
    lam_prev, m_prev, have = 0.0, np.zeros_like(x), False

    def coeffs(i):
        h = sched["lambda_next"][i] - sched["lambda_cur"][i]
        hh = -h
        phi_1 = np.expm1(hh)
        B_h = phi_1
        b1 = (phi_1 / hh - 1.0) / B_h
        b2 = 2.0 * ((phi_1 / hh - 1.0) / hh - 0.5) / B_h
        return h, phi_1, B_h, b1, b2

    for i in range(n - 1):
        h, phi_1, B_h, b1, b2 = coeffs(i)
        a_n = sched["alpha_next"][i]
        s_c, s_n = sched["sigma_cur"][i], sched["sigma_next"][i]
        x_base = (s_n / s_c) * x - a_n * phi_1 * m_cur
        r1 = (lam_prev - sched["lambda_cur"][i]) / h
        d1_prev = (m_prev - m_cur) / (r1 if abs(r1) > 1e-12 else 1.0)
        x_p = x_base - a_n * B_h * (0.5 * d1_prev if have else 0.0)
        m_t = x_p / a_n                      # eps == 0: x0 = x / alpha
        d1_t = m_t - m_cur
        if have:
            c1 = (b1 - b2) / (1.0 - r1)
            corr = c1 * d1_prev + (b1 - c1) * d1_t
        else:
            corr = 0.5 * d1_t
        x_t = x_base - a_n * B_h * corr
        lam_prev, m_prev, m_cur, have = sched["lambda_cur"][i], m_cur, m_t, True
        x = x_t
    # final predictor-only step
    h, phi_1, B_h, b1, b2 = coeffs(n - 1)
    a_n = sched["alpha_next"][n - 1]
    s_c, s_n = sched["sigma_cur"][n - 1], sched["sigma_next"][n - 1]
    x_base = (s_n / s_c) * x - a_n * phi_1 * m_cur
    r1 = (lam_prev - sched["lambda_cur"][n - 1]) / h
    d1_prev = (m_prev - m_cur) / (r1 if abs(r1) > 1e-12 else 1.0)
    return x_base - a_n * B_h * (0.5 * d1_prev if have else 0.0)


def _sample(up, cp, sched, x_T, fn):
    rng = np.random.default_rng(3)
    hint = jnp.asarray(rng.random((x_T.shape[0], 64, 64, 3), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal(
        (x_T.shape[0], 5, CFG.unet.context_dim)).astype(np.float32))
    return np.asarray(fn(
        up, cp, CFG.controlnet, sched, x_T, hint, ctx, ctx,
        jnp.asarray(9.0), jnp.ones(5, jnp.float32)))


def _randomized_unet(key):
    up = init_unet(key, CFG.unet)
    kw, kb = jax.random.split(jax.random.fold_in(key, 7))
    out = dict(up["out"])
    conv = dict(out["conv"])
    conv["w"] = 0.05 * jax.random.normal(kw, conv["w"].shape, jnp.float32)
    conv["b"] = 0.01 * jax.random.normal(kb, conv["b"].shape, jnp.float32)
    out["conv"] = conv
    return {**up, "out": out}


class TestUniPC:
    def test_zero_eps_analytic_parity(self, rng):
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        up = init_unet(ks[0], CFG.unet)      # zero-init out conv: eps == 0
        cp = init_controlnet(ks[1], CFG.controlnet)
        for spacing in ("uniform", "karras"):
            sched = dpmpp_schedule(DiffusionSchedule(), 5, spacing=spacing)
            x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
            out = _sample(up, cp, sched, jnp.asarray(x_T), unipc_sample_scan)
            ref = numpy_unipc_zero_eps(sched, x_T)
            np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_convergence_to_shared_ode(self):
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        up = _randomized_unet(ks[0])
        cp = init_controlnet(ks[1], CFG.controlnet)
        rng = np.random.default_rng(0)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        ds = DiffusionSchedule()
        gold = _sample(up, cp, dpmpp_schedule(ds, 160, spacing="karras"),
                       x_T, dpmpp_sample_scan)

        def err(n):
            out = _sample(up, cp, dpmpp_schedule(ds, n, spacing="karras"),
                          x_T, unipc_sample_scan)
            return float(np.linalg.norm(out - gold) / np.linalg.norm(gold))

        e6, e24 = err(6), err(24)
        assert e24 < e6 / 2, (e6, e24)
        assert e24 < 0.05

    def test_corrector_improves_on_dpmpp_at_low_steps(self):
        """At 5 steps the corrector should keep UniPC at least in DPM++'s
        error neighborhood (typically better); a broken corrector shows up
        as a multiple-x regression."""
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        up = _randomized_unet(ks[0])
        cp = init_controlnet(ks[1], CFG.controlnet)
        rng = np.random.default_rng(0)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        ds = DiffusionSchedule()
        gold = _sample(up, cp, dpmpp_schedule(ds, 160, spacing="karras"),
                       x_T, dpmpp_sample_scan)
        sched5 = dpmpp_schedule(ds, 5, spacing="karras")
        e_uni = np.linalg.norm(_sample(up, cp, sched5, x_T,
                                       unipc_sample_scan) - gold)
        e_dpm = np.linalg.norm(_sample(up, cp, sched5, x_T,
                                       dpmpp_sample_scan) - gold)
        assert e_uni < 1.5 * e_dpm, (e_uni, e_dpm)

    def test_single_step(self, rng):
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        up = init_unet(ks[0], CFG.unet)
        cp = init_controlnet(ks[1], CFG.controlnet)
        sched = dpmpp_schedule(DiffusionSchedule(), 1)
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        out = _sample(up, cp, sched, jnp.asarray(x_T), unipc_sample_scan)
        ref = numpy_unipc_zero_eps(sched, x_T)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_grad_finite_through_sampler(self):
        """Round-4 advisor fix: the first-step corrector coefficient
        c1 = (b1-b2)/(1-r1) is value-masked by jnp.where but its
        UNGUARDED denominator would propagate NaN cotangents through the
        unselected branch under vjp — the sampler must be differentiable."""
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        up = _randomized_unet(ks[0])
        cp = init_controlnet(ks[1], CFG.controlnet)
        sched = dpmpp_schedule(DiffusionSchedule(), 3)
        rng = np.random.default_rng(0)
        hint = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        ctx = jnp.asarray(rng.standard_normal(
            (1, 5, CFG.unet.context_dim)).astype(np.float32))

        def loss(x_T):
            out = unipc_sample_scan(
                up, cp, CFG.controlnet, sched, x_T, hint, ctx, ctx,
                jnp.asarray(9.0), jnp.ones(5, jnp.float32))
            return jnp.sum(out ** 2)

        x_T = jnp.asarray(
            rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        g = jax.grad(loss)(x_T)
        assert bool(jnp.isfinite(g).all()), "NaN/inf gradient through UniPC"

    def test_pipeline_integration_and_program_sharing(self):
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )

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
        rng = np.random.default_rng(4)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kwargs = dict(num_samples=1, image_resolution=64, ddim_steps=3, seed=5)
        a = pipe.process(img, "a bird", sampler="unipc", **kwargs)[1]
        b = pipe.process(img, "a bird", sampler="unipc", **kwargs)[1]
        np.testing.assert_array_equal(a, b)       # deterministic ODE
        n_engines = len(pipe.runtime._engines)
        c = pipe.process(img, "a bird", sampler="unipc-karras", **kwargs)[1]
        assert len(pipe.runtime._engines) == n_engines  # shared program
        assert c.dtype == np.uint8
