"""PLMS sampler tests: analytic parity of the priming + Adams-Bashforth
ladder against a numpy mirror (via the v-param zero-model linear
recursion), convergence vs DDIM, and pipeline integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan
from stablediffusioneo_tpu.pipeline.plms import plms_sample_scan

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


def numpy_plms(sched, x, eps_fn):
    """Mirror of plms_sample_scan for an analytically known eps(x, i)."""
    ts = sched["timesteps"]
    a = sched["alphas"]
    ap = sched["alphas_prev"]
    s1m = sched["sqrt_one_minus_alphas"]
    n = len(ts)
    x = x.astype(np.float64)

    def transfer(x, e, a_t, a_prev, s1m_t):
        pred_x0 = (x - s1m_t * e) / np.sqrt(a_t)
        return np.sqrt(a_prev) * pred_x0 + np.sqrt(max(1 - a_prev, 0)) * e

    e0 = eps_fn(x, 0)
    x_probe = transfer(x, e0, a[0], ap[0], s1m[0])
    idx_next = 1 if n > 1 else 0
    e_next = eps_fn(x_probe, idx_next)
    x_cur = transfer(x, 0.5 * (e0 + e_next), a[0], ap[0], s1m[0])
    if n == 1:
        return x_cur
    olds = [e0]
    for i in range(1, n):
        e_t = eps_fn(x_cur, i)
        if len(olds) == 1:
            e_p = (3 * e_t - olds[-1]) / 2
        elif len(olds) == 2:
            e_p = (23 * e_t - 16 * olds[-1] + 5 * olds[-2]) / 12
        else:
            e_p = (55 * e_t - 59 * olds[-1] + 37 * olds[-2]
                   - 9 * olds[-3]) / 24
        x_cur = transfer(x_cur, e_p, a[i], ap[i], s1m[i])
        olds.append(e_t)
        olds = olds[-3:]
    return x_cur


def _run(up, cp, sched, x_T, parameterization="eps"):
    rng = np.random.default_rng(3)
    hint = jnp.asarray(rng.random((x_T.shape[0], 64, 64, 3), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal(
        (x_T.shape[0], 5, CFG.unet.context_dim)).astype(np.float32))
    return np.asarray(plms_sample_scan(
        up, cp, CFG.controlnet, sched, x_T, hint, ctx, ctx,
        jnp.asarray(9.0), jnp.ones(5, jnp.float32),
        parameterization=parameterization))


class TestPLMS:
    def _nets(self):
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        return (init_unet(ks[0], CFG.unet),
                init_controlnet(ks[1], CFG.controlnet))

    def test_zero_eps_analytic(self, rng):
        """Zero-init out conv: eps == 0 at every eval (incl. the priming
        probe), so the ladder collapses to the pure sqrt(a_prev/a_t) chain."""
        up, cp = self._nets()
        for steps in (1, 5):
            sched = DiffusionSchedule().ddim(steps)
            x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
            out = _run(up, cp, sched, jnp.asarray(x_T))
            ref = numpy_plms(sched, x_T, lambda x, i: np.zeros_like(x))
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_v_param_linear_recursion(self, rng):
        """v-param with model output 0: eps(x, i) = s1m_i * x — nonzero
        and state-dependent, exercising the priming probe AND every
        Adams-Bashforth ladder rung against the numpy mirror."""
        up, cp = self._nets()
        sched = DiffusionSchedule().ddim(6)
        x_T = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        out = _run(up, cp, sched, jnp.asarray(x_T), parameterization="v")
        s1m = sched["sqrt_one_minus_alphas"]
        ref = numpy_plms(sched, x_T, lambda x, i: s1m[i] * x)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_beats_ddim_at_low_steps(self):
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        up = init_unet(ks[0], CFG.unet)
        kw, kb = jax.random.split(jax.random.PRNGKey(7))
        out = dict(up["out"])
        conv = dict(out["conv"])
        conv["w"] = 0.05 * jax.random.normal(kw, conv["w"].shape, jnp.float32)
        conv["b"] = 0.01 * jax.random.normal(kb, conv["b"].shape, jnp.float32)
        out["conv"] = conv
        up = {**up, "out": out}
        cp = init_controlnet(ks[1], CFG.controlnet)
        rng = np.random.default_rng(0)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        ds = DiffusionSchedule()
        hint = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        ctx = jnp.asarray(rng.standard_normal(
            (1, 5, CFG.unet.context_dim)).astype(np.float32))

        def ddim(n):
            return np.asarray(ddim_sample_scan(
                up, cp, CFG.controlnet, ds.ddim(n), x_T, hint, ctx, ctx,
                jnp.asarray(9.0), jnp.ones(5, jnp.float32),
                jax.random.PRNGKey(0)))

        gold = ddim(192)
        e_ddim = np.linalg.norm(ddim(8) - gold)
        e_plms = np.linalg.norm(_run(up, cp, ds.ddim(8), x_T) - gold)
        assert e_plms < e_ddim, (e_plms, e_ddim)

    def test_pipeline_integration(self):
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
        a = pipe.process(img, "a bird", sampler="plms", **kwargs)[1]
        b = pipe.process(img, "a bird", sampler="plms", **kwargs)[1]
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.uint8
