"""Guidance rescale (arXiv:2305.08891 §3.4, diffusers' guidance_rescale):
unit math of the combine, the zero-is-a-no-op contract the engine-variant
design relies on, and the runtime engine keying.

The reference has no analog (its CFG combine is plain, cldm/ddim_hacked.py
p_sample_ddim); this is a beyond-reference capability matching mainstream
SD UIs, critical for v-prediction checkpoints (SD-2.1-v) at high scales.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.pipeline.ddim import _bc_scale, _cfg_combine


class TestCfgCombineMath:
    def test_zero_rescale_is_plain_combine(self, rng):
        e_c = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        e_u = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        scale = jnp.asarray([7.5, 3.0], np.float32)
        plain = e_u + _bc_scale(scale, e_c) * (e_c - e_u)
        out = _cfg_combine(e_c, e_u, scale, e_c, 0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))

    def test_rescale_matches_numpy_reference(self, rng):
        e_c = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)
        e_u = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)
        scale, w = 9.0, 0.7
        cfg = e_u + scale * (e_c - e_u)
        # per-sample std over all non-batch dims (ddof=0, matching jnp.std)
        std_pos = e_c.reshape(3, -1).std(axis=1).reshape(3, 1, 1, 1)
        std_cfg = cfg.reshape(3, -1).std(axis=1).reshape(3, 1, 1, 1)
        want = w * (cfg * std_pos / std_cfg) + (1.0 - w) * cfg
        got = _cfg_combine(
            jnp.asarray(e_c), jnp.asarray(e_u),
            jnp.asarray(scale, np.float32), jnp.asarray(e_c), w)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6)

    def test_full_rescale_restores_conditional_std(self, rng):
        e_c = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
        e_u = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
        got = np.asarray(_cfg_combine(
            jnp.asarray(e_c), jnp.asarray(e_u),
            jnp.asarray(12.0, np.float32), jnp.asarray(e_c), 1.0))
        np.testing.assert_allclose(
            got.reshape(2, -1).std(axis=1),
            e_c.reshape(2, -1).std(axis=1), rtol=1e-4)

    def test_bf16_dtype_preserved(self, rng):
        e_c = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.bfloat16)
        e_u = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.bfloat16)
        out = _cfg_combine(e_c, e_u, jnp.asarray(5.0, jnp.float32), e_c, 0.7)
        assert out.dtype == jnp.bfloat16


@pytest.mark.slow
class TestCfgRescaleEngine:
    @pytest.fixture(scope="class")
    def rt(self):
        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        cfg = tiny_pipeline()
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        cnt = iter(jax.random.split(ks[0], 4096))

        def rnd(tree):
            return jax.tree.map(
                lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * .05,
                tree)

        params = {
            "unet": rnd(init_unet(ks[0], cfg.unet)),
            "controlnet": rnd(init_controlnet(ks[1], cfg.controlnet)),
            "vae": rnd(init_vae(ks[2], cfg.vae)),
            "clip": init_clip_text(ks[3], cfg.clip),
        }
        return CNSDRuntime(params, cfg, persistent_cache=False)

    def test_engine_keying_and_effect(self, rng, rt):
        cfg = rt.cfg
        # cond and uncond contexts must DIFFER for rescale to matter
        # (e_c == e_u makes the combine rescale-invariant by construction)
        ctx_c = rt.encode_prompt(
            np.arange(cfg.clip.max_length, dtype=np.int32)[None, :]
            % cfg.clip.vocab_size)
        ctx_u = rt.encode_prompt(np.zeros((1, cfg.clip.max_length), np.int32))
        hint = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        key = jax.random.PRNGKey(1)

        # default (no kwarg) and explicit 0.0 share ONE cached engine
        e_default = rt.sample_decode_engine(2, 1, 64, 64)
        e_zero = rt.sample_decode_engine(2, 1, 64, 64, cfg_rescale=0.0)
        assert e_default is e_zero
        # nonzero is a distinct variant
        e_on = rt.sample_decode_engine(2, 1, 64, 64, cfg_rescale=0.7)
        assert e_on is not e_zero

        base = np.asarray(rt.sample_decode(2, None, hint, ctx_c, ctx_u, key,
                                           guidance_scale=9.0))
        on = np.asarray(rt.sample_decode(2, None, hint, ctx_c, ctx_u, key,
                                         guidance_scale=9.0,
                                         cfg_rescale=0.7))
        assert base.shape == on.shape == (1, 64, 64, 3)
        assert not np.array_equal(base, on), "rescale=0.7 had no effect"

        # scale=1 ==> combined prediction IS the conditional branch, so
        # rescale renormalizes to its own std: exact no-op at any weight.
        a = np.asarray(rt.sample_decode(2, None, hint, ctx_c, ctx_u, key,
                                        guidance_scale=1.0))
        b = np.asarray(rt.sample_decode(2, None, hint, ctx_c, ctx_u, key,
                                        guidance_scale=1.0,
                                        cfg_rescale=0.7))
        frac_off = (np.abs(a.astype(np.int16) - b.astype(np.int16)) > 1).mean()
        assert frac_off < 0.02, f"scale=1 rescale not a no-op: {frac_off}"

    def test_all_samplers_accept_rescale(self, rng, rt):
        cfg = rt.cfg
        ids = np.zeros((1, cfg.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        key = jax.random.PRNGKey(1)
        for sampler in ("ddim", "plms", "dpmpp", "euler", "unipc"):
            out = np.asarray(rt.sample_decode(
                2, None, hint, ctx, ctx, key, guidance_scale=9.0,
                sampler=sampler, cfg_rescale=0.7))
            assert out.shape == (1, 64, 64, 3), sampler
