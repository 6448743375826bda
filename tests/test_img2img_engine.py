"""img2img through the fused engine path: parity vs the eager
DDIMSampler.img2img (both re-noise to the entry step of the SAME full
discretization and decode the schedule tail), plus the process() surface.

Complements tests/test_ddim.py (eager img2img semantics vs torch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import (
    init_clip_text, init_controlnet, init_unet, init_vae,
)

pytestmark = pytest.mark.slow  # compile-heavy

CFG = tiny_pipeline()


@pytest.fixture(scope="module")
def rt_and_params():
    from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    # re-randomize so outputs depend on the weights (zero_module gates)
    cnt = iter(jax.random.split(ks[0], 4096))

    def rnd(tree):
        return jax.tree.map(
            lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * 0.05,
            tree)

    params = {
        "unet": rnd(init_unet(ks[0], CFG.unet)),
        "controlnet": init_controlnet(ks[1], CFG.controlnet),
        "vae": init_vae(ks[2], CFG.vae),
        "clip": init_clip_text(ks[3], CFG.clip),
    }
    return CNSDRuntime(params, CFG, persistent_cache=False), params


class TestImg2ImgEngine:
    def test_engine_matches_eager_sampler(self, rng, rt_and_params):
        from stablediffusioneo_tpu.pipeline.ddim import DDIMSampler

        rt, params = rt_and_params
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        lat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        key = jax.random.PRNGKey(5)
        steps, strength = 4, 0.5  # t_enc = 2 of 4

        eager = DDIMSampler(CFG, params["unet"], params["controlnet"])
        z_ref = eager.img2img(lat, strength, steps, hint, ctx, ctx, key,
                              guidance_scale=9.0)
        ref_img = rt.decode_latent(z_ref.astype(rt.dtype))

        out = np.asarray(rt.sample_decode(
            steps, None, hint, ctx, ctx, key,
            init_latent=lat, t_enc=2, guidance_scale=9.0))
        frac_off = (np.abs(out.astype(np.int16)
                           - ref_img.astype(np.int16)) > 1).mean()
        assert frac_off < 0.02, f"engine img2img diverged: {frac_off}"

    def test_strength_extremes_and_validation(self, rng, rt_and_params):
        rt, _ = rt_and_params
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        lat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        key = jax.random.PRNGKey(5)
        # t_enc = 1 (minimal denoise) and t_enc = num_steps both run
        for t_enc in (1, 2):
            out = np.asarray(rt.sample_decode(
                2, None, hint, ctx, ctx, key, init_latent=lat, t_enc=t_enc))
            assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
        with pytest.raises(ValueError, match="t_enc"):
            rt.sample_decode(2, None, hint, ctx, ctx, key,
                             init_latent=lat, t_enc=3)
        # seeds + init_latent is VALID (the serving img2img-seeds variant);
        # an explicit x_T is the remaining exclusivity
        with pytest.raises(ValueError, match="x_T"):
            rt.sample_decode(2, lat, hint, ctx, ctx, key,
                             init_latent=lat, t_enc=1)

    def test_process_img2img_surface(self, rng, rt_and_params):
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )

        rt, params = rt_and_params
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        pipe = Canny2ImagePipeline(params, tok, CFG, persistent_cache=False)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        src = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        outs = pipe.process(img, "a bird", num_samples=1,
                            image_resolution=64, ddim_steps=2, seed=3,
                            init_image=src, denoise_strength=0.5)
        assert outs[1].shape == (64, 64, 3) and outs[1].dtype == np.uint8
        # deterministic given the seed
        outs2 = pipe.process(img, "a bird", num_samples=1,
                             image_resolution=64, ddim_steps=2, seed=3,
                             init_image=src, denoise_strength=0.5)
        np.testing.assert_array_equal(outs[1], outs2[1])
        # low denoise strength stays closer to the source's VAE roundtrip
        # than high (the random-weight VAE makes raw-source distance
        # meaningless — the roundtrip is the identity img2img converges to)
        src_f = (src.astype(np.float32) / 127.5 - 1.0)[None]
        lat = rt.encode_image(jnp.asarray(src_f), deterministic=True)
        roundtrip = rt.decode_latent(lat.astype(rt.dtype))[0]
        hi = pipe.process(img, "a bird", num_samples=1,
                          image_resolution=64, ddim_steps=20, seed=3,
                          init_image=src, denoise_strength=1.0)[1]
        lo = pipe.process(img, "a bird", num_samples=1,
                          image_resolution=64, ddim_steps=20, seed=3,
                          init_image=src, denoise_strength=0.05)[1]
        d_lo = np.abs(lo.astype(np.int16) - roundtrip.astype(np.int16)).mean()
        d_hi = np.abs(hi.astype(np.int16) - roundtrip.astype(np.int16)).mean()
        assert d_lo < d_hi, (d_lo, d_hi)


@pytest.mark.slow
class TestHiresFix:
    def test_two_pass_upscale(self, rng, rt_and_params):
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )

        rt, params = rt_and_params
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        pipe = Canny2ImagePipeline(params, tok, CFG, persistent_cache=False)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        outs = pipe.process(img, "a bird", num_samples=1,
                            image_resolution=64, ddim_steps=2, seed=5,
                            hires_upscale=2.0, hires_denoise=0.5)
        det, gen = outs[0], outs[1]
        assert gen.shape == (128, 128, 3) and gen.dtype == np.uint8
        assert det.shape == (128, 128, 3)  # the hi-res hint that shaped it
        # deterministic given the seed
        outs2 = pipe.process(img, "a bird", num_samples=1,
                             image_resolution=64, ddim_steps=2, seed=5,
                             hires_upscale=2.0, hires_denoise=0.5)
        np.testing.assert_array_equal(gen, outs2[1])
        with pytest.raises(ValueError, match="hires_upscale"):
            pipe.process(img, "a bird", num_samples=1, image_resolution=64,
                         ddim_steps=2, seed=5, hires_upscale=2.0,
                         init_image=img)
