"""k-diffusion sampler tests (Euler / Euler-ancestral / Heun): schedule
properties, zero-eps analytic parity, convergence order, v-param math,
engine program sharing, and pipeline integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.k_diffusion import (
    kdiff_sample_scan,
    kdiff_schedule,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


def _randomized_unet(key):
    """tiny UNet with the zero-init out conv replaced by small random
    weights, so eps_hat is a nonzero smooth function of (x, t)."""
    up = init_unet(key, CFG.unet)
    kw, kb = jax.random.split(jax.random.fold_in(key, 7))
    out = dict(up["out"])
    conv = dict(out["conv"])
    conv["w"] = 0.05 * jax.random.normal(kw, conv["w"].shape, jnp.float32)
    conv["b"] = 0.01 * jax.random.normal(kb, conv["b"].shape, jnp.float32)
    out["conv"] = conv
    return {**up, "out": out}


def _sample(up, cp, sched, x_T, sampler, key=None, parameterization="eps"):
    rng = np.random.default_rng(3)
    hint = jnp.asarray(rng.random((x_T.shape[0], 64, 64, 3), dtype=np.float32))
    ctx = jnp.asarray(
        rng.standard_normal((x_T.shape[0], 5, CFG.unet.context_dim)).astype(np.float32))
    return np.asarray(kdiff_sample_scan(
        up, cp, CFG.controlnet, sched, x_T, hint, ctx, ctx,
        jnp.asarray(9.0), jnp.ones(5, jnp.float32),
        jax.random.PRNGKey(0) if key is None else key,
        sampler=sampler, parameterization=parameterization,
    ))


class TestSchedule:
    def test_shapes_and_monotonicity(self):
        for spacing in ("karras", "uniform"):
            s = kdiff_schedule(DiffusionSchedule(), 12, spacing=spacing)
            assert all(len(v) == 12 for v in s.values())
            assert (np.diff(s["sigk_cur"]) < 0).all()     # denoising order
            assert s["sigk_next"][-1] == 0.0              # ends at clean x0
            assert s["alpha_next"][-1] == 1.0
            np.testing.assert_allclose(                    # boundary chain
                s["sigk_next"][:-1], s["sigk_cur"][1:], rtol=1e-6)
            # ancestral split preserves total step variance:
            # down^2 + up^2 == sigk_next^2
            np.testing.assert_allclose(
                s["sigk_down"] ** 2 + s["sigk_up"] ** 2,
                s["sigk_next"] ** 2, rtol=1e-5, atol=1e-12)

    def test_uniform_matches_trained_grid(self):
        sched = DiffusionSchedule()
        s = kdiff_schedule(sched, 10, spacing="uniform")
        ts = s["t"].astype(int)
        abar = sched.alphas_cumprod[ts]
        np.testing.assert_allclose(
            s["sigk_cur"], np.sqrt((1 - abar) / abar), rtol=1e-5)
        np.testing.assert_allclose(
            s["alpha_cur"], np.sqrt(abar), rtol=1e-6)

    def test_karras_rho_endpoints(self):
        sched = DiffusionSchedule()
        s = kdiff_schedule(sched, 8, spacing="karras")
        abar = sched.alphas_cumprod
        sigk = np.sqrt((1 - abar) / abar)
        np.testing.assert_allclose(s["sigk_cur"][0], sigk[-1], rtol=1e-5)
        np.testing.assert_allclose(s["sigk_cur"][-1], sigk[0], rtol=1e-5)


class TestAnalyticParity:
    """With the UNet's zero-init out conv (faithful init) eps_hat == 0, so
    every update has a closed numpy form."""

    def _setup(self, rng):
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        up = init_unet(ks[0], CFG.unet)     # out conv zero-init -> eps == 0
        cp = init_controlnet(ks[1], CFG.controlnet)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        return up, cp, x_T

    def test_euler_zero_eps(self, rng):
        up, cp, x_T = self._setup(rng)
        s = kdiff_schedule(DiffusionSchedule(), 5)
        out = _sample(up, cp, s, x_T, "euler")
        # eps == 0: xhat never moves; x_i = xhat * alpha_i -> final x = x_T/a0
        ref = np.asarray(x_T, np.float64) / s["alpha_cur"][0]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_heun_zero_eps(self, rng):
        up, cp, x_T = self._setup(rng)
        s = kdiff_schedule(DiffusionSchedule(), 5)
        out = _sample(up, cp, s, x_T, "heun")
        ref = np.asarray(x_T, np.float64) / s["alpha_cur"][0]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_euler_a_zero_eps(self, rng):
        """euler-a with eps == 0: xhat' = xhat + sigk_up * noise, with the
        noise bits from _step_noise — replicated here call-for-call."""
        from stablediffusioneo_tpu.pipeline.ddim import _step_noise

        up, cp, x_T = self._setup(rng)
        s = kdiff_schedule(DiffusionSchedule(), 4)
        key = jax.random.PRNGKey(11)
        out = _sample(up, cp, s, x_T, "euler-a", key=key)
        xhat = np.asarray(x_T, np.float64) / s["alpha_cur"][0]
        for i in range(4):
            noise = np.asarray(_step_noise(
                key, jnp.asarray(i, jnp.int32), x_T.shape))
            xhat = xhat + s["sigk_up"][i] * noise
        ref = xhat * s["alpha_next"][-1]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_v_param_zero_model(self, rng):
        """v-param with model output 0: eps = sigma_vp * x, a linear
        recursion with a closed numpy form."""
        up, cp, x_T = self._setup(rng)
        s = kdiff_schedule(DiffusionSchedule(), 5)
        out = _sample(up, cp, s, x_T, "euler", parameterization="v")
        x = np.asarray(x_T, np.float64)
        for i in range(5):
            a_c, sk_c, sk_n = s["alpha_cur"][i], s["sigk_cur"][i], s["sigk_next"][i]
            eps = (sk_c * a_c) * x
            xhat = x / a_c + (sk_n - sk_c) * eps
            x = xhat * s["alpha_next"][i]
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5)


class TestConvergence:
    """Integration-order checks on a smooth nonzero model: Euler is
    1st-order, Heun 2nd-order; both integrate the same probability-flow
    ODE, so they converge to the same x0 as steps grow."""

    def _setup(self):
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        up = _randomized_unet(ks[0])
        cp = init_controlnet(ks[1], CFG.controlnet)
        rng = np.random.default_rng(0)
        x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        return up, cp, x_T

    def test_self_convergence_and_heun_order(self):
        up, cp, x_T = self._setup()
        sched = DiffusionSchedule()
        gold = _sample(up, cp, kdiff_schedule(sched, 192), x_T, "euler")

        def err(sampler, n):
            out = _sample(up, cp, kdiff_schedule(sched, n), x_T, sampler)
            return float(np.linalg.norm(out - gold) / np.linalg.norm(gold))

        e8, e48 = err("euler", 8), err("euler", 48)
        assert e48 < e8 / 2, (e8, e48)        # 1st order: err ~ 1/N
        h8 = err("heun", 8)
        assert h8 < e8 / 2, (e8, h8)          # Heun beats Euler at equal N
        assert h8 < 0.05 and e48 < 0.05       # both near the ODE solution

    def test_heun_more_accurate_than_euler_same_evals(self):
        """Heun at N steps costs 2N-1 evals; compare against Euler at 2N
        steps (>= evals): Heun should still be competitive (2nd order)."""
        up, cp, x_T = self._setup()
        sched = DiffusionSchedule()
        gold = _sample(up, cp, kdiff_schedule(sched, 192), x_T, "euler")
        heun = _sample(up, cp, kdiff_schedule(sched, 12), x_T, "heun")
        e_h = np.linalg.norm(heun - gold)
        euler = _sample(up, cp, kdiff_schedule(sched, 24), x_T, "euler")
        e_e = np.linalg.norm(euler - gold)
        assert e_h < 2.0 * e_e, (e_h, e_e)


class TestEulerAncestral:
    def test_per_sample_keys_batch_invariance(self):
        """(B, 2) per-sample keys: each row's noise bits depend only on its
        own key, so a request's output matches batch-1 to XLA's
        batch-dependent rounding (~1 f32 LSB; a wrong-key bug would be O(1))
        — the serving per-request reproducibility contract."""
        ks = jax.random.split(jax.random.PRNGKey(5), 2)
        up = _randomized_unet(ks[0])
        cp = init_controlnet(ks[1], CFG.controlnet)
        rng = np.random.default_rng(1)
        x3 = jnp.asarray(rng.standard_normal((3, 8, 8, 4), dtype=np.float32))
        keys3 = jax.vmap(jax.random.PRNGKey)(jnp.asarray([7, 8, 9]))
        s = kdiff_schedule(DiffusionSchedule(), 4)
        hint3 = jnp.asarray(rng.random((3, 64, 64, 3), dtype=np.float32))
        ctx3 = jnp.asarray(
            rng.standard_normal((3, 5, CFG.unet.context_dim)).astype(np.float32))
        out3 = np.asarray(kdiff_sample_scan(
            up, cp, CFG.controlnet, s, x3, hint3, ctx3, ctx3,
            jnp.asarray(9.0), jnp.ones(5, jnp.float32), keys3,
            sampler="euler-a"))
        out1 = np.asarray(kdiff_sample_scan(
            up, cp, CFG.controlnet, s, x3[1:2], hint3[1:2], ctx3[1:2],
            ctx3[1:2], jnp.asarray(9.0), jnp.ones(5, jnp.float32),
            keys3[1:2], sampler="euler-a"))
        np.testing.assert_allclose(out3[1:2], out1, rtol=1e-4, atol=1e-4)

    def test_stochastic_across_keys(self):
        ks = jax.random.split(jax.random.PRNGKey(5), 2)
        up = init_unet(ks[0], CFG.unet)
        cp = init_controlnet(ks[1], CFG.controlnet)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        s = kdiff_schedule(DiffusionSchedule(), 3)
        a = _sample(up, cp, s, x, "euler-a", key=jax.random.PRNGKey(1))
        b = _sample(up, cp, s, x, "euler-a", key=jax.random.PRNGKey(2))
        assert np.abs(a - b).max() > 1e-3


class TestEngineIntegration:
    def _pipe(self):
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
        return Canny2ImagePipeline(
            params, toy_tokenizer(max_length=CFG.clip.max_length), CFG,
            persistent_cache=False,
        )

    def test_process_and_spacing_shares_program(self):
        pipe = self._pipe()
        rng = np.random.default_rng(4)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kwargs = dict(num_samples=1, image_resolution=64, ddim_steps=2, seed=5)
        outs = {}
        for sampler in ("euler", "euler-a", "heun"):
            a = pipe.process(img, "a bird", sampler=sampler, **kwargs)[1]
            b = pipe.process(img, "a bird", sampler=sampler, **kwargs)[1]
            np.testing.assert_array_equal(a, b)   # seeded: deterministic
            assert a.dtype == np.uint8
            outs[sampler] = a
        # the spacing suffix must NOT compile a second program
        n_engines = len(pipe.runtime._engines)
        c = pipe.process(img, "a bird", sampler="euler-uniform", **kwargs)[1]
        assert len(pipe.runtime._engines) == n_engines
        assert c.shape == outs["euler"].shape

    def test_unknown_sampler_rejected(self):
        pipe = self._pipe()
        img = np.zeros((64, 64, 3), np.uint8)
        with pytest.raises(ValueError, match="unknown sampler"):
            pipe.process(img, "x", num_samples=1, image_resolution=64,
                         ddim_steps=1, seed=0, sampler="ddpm")


class TestImg2ImgGuard:
    def test_img2img_requires_ddim(self):
        """init_image + a non-DDIM sampler must fail with the clean guard,
        not a KeyError from the schedule dict (review finding)."""
        pipe = TestEngineIntegration()._pipe()
        img = np.zeros((64, 64, 3), np.uint8)
        with pytest.raises(ValueError, match="DDIM-path"):
            pipe.process(img, "x", num_samples=1, image_resolution=64,
                         ddim_steps=2, seed=0, sampler="euler",
                         init_image=img, denoise_strength=0.5)
