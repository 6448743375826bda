"""Blended-latent inpainting (pipeline/ddim.py, beyond the reference;
arXiv:2206.02779 semantics): mask==1 everywhere is bit-identical to plain
sampling, mask==0 everywhere returns the original latent exactly, and a
mixed mask keeps the kept region while regenerating the rest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan

CFG = tiny_pipeline()


@pytest.fixture(scope="module")
def setup(rng_mod=np.random.default_rng(0)):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    # re-randomize: at true random init the zero_module output heads make
    # eps_hat == 0 (x-independent), which would make the mixed-mask
    # feedback assertion vacuous
    cnt = iter(jax.random.split(ks[0], 4096))
    up = jax.tree.map(
        lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * 0.05,
        init_unet(ks[0], CFG.unet))
    cp = init_controlnet(ks[1], CFG.controlnet)
    sched = DiffusionSchedule().ddim(3)
    b = 2
    args = dict(
        x_T=jnp.asarray(rng_mod.standard_normal((b, 8, 8, 4), np.float32)),
        hint=jnp.asarray(rng_mod.random((b, 64, 64, 3), np.float32)),
        ctx_cond=jnp.asarray(rng_mod.standard_normal(
            (b, 5, CFG.unet.context_dim), np.float32)),
        scale=jnp.asarray(9.0),
        control_scales=jnp.ones(5, jnp.float32),
        key=jax.random.PRNGKey(3),
    )
    args["ctx_uncond"] = args["ctx_cond"]
    lat = jnp.asarray(rng_mod.standard_normal((b, 8, 8, 4), np.float32))
    return up, cp, sched, args, lat


class TestInpaintScan:
    def test_mask_all_ones_bitwise_equals_plain(self, setup):
        up, cp, sched, args, lat = setup
        plain = ddim_sample_scan(up, cp, CFG.controlnet, sched, **args)
        ones = jnp.ones(lat.shape[:-1] + (1,), jnp.float32)
        inp = ddim_sample_scan(up, cp, CFG.controlnet, sched, **args,
                               inpaint_latent=lat, inpaint_mask=ones)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(inp))

    def test_mask_all_zeros_returns_original_latent(self, setup):
        up, cp, sched, args, lat = setup
        zeros = jnp.zeros(lat.shape[:-1] + (1,), jnp.float32)
        inp = ddim_sample_scan(up, cp, CFG.controlnet, sched, **args,
                               inpaint_latent=lat, inpaint_mask=zeros)
        np.testing.assert_array_equal(np.asarray(inp), np.asarray(lat))

    @pytest.mark.slow  # fast-tier budget: all-zeros + all-ones cover the invariants
    def test_mixed_mask_keeps_and_regenerates(self, setup):
        up, cp, sched, args, lat = setup
        plain = np.asarray(
            ddim_sample_scan(up, cp, CFG.controlnet, sched, **args))
        m = np.zeros((1, 8, 8, 1), np.float32)
        m[:, :, 4:, :] = 1.0  # regenerate the right half
        m = jnp.asarray(np.repeat(m, lat.shape[0], axis=0))
        inp = np.asarray(ddim_sample_scan(
            up, cp, CFG.controlnet, sched, **args,
            inpaint_latent=lat, inpaint_mask=m))
        np.testing.assert_array_equal(inp[:, :, :4], np.asarray(lat)[:, :, :4])
        # the generated half must NOT be the original latent
        assert np.abs(inp[:, :, 4:] - np.asarray(lat)[:, :, 4:]).max() > 1e-3
        # ...and must differ from unconstrained sampling too (the per-step
        # blend feeds the kept region back through the model)
        assert np.abs(inp[:, :, 4:] - plain[:, :, 4:]).max() > 0

    def test_rejects_encoder_cache(self, setup):
        up, cp, sched, args, lat = setup
        ones = jnp.ones(lat.shape[:-1] + (1,), jnp.float32)
        with pytest.raises(ValueError, match="encoder caching"):
            ddim_sample_scan(up, cp, CFG.controlnet, sched, **args,
                             encoder_cache_interval=2,
                             inpaint_latent=lat, inpaint_mask=ones)


@pytest.mark.slow
class TestInpaintRuntime:
    def test_runtime_and_pipeline_inpaint(self, rng):
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        params = {
            "unet": init_unet(ks[0], CFG.unet),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        pipe = Canny2ImagePipeline(params, tok, CFG,
                                   persistent_cache=False)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        src = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[:, 32:] = 255  # regenerate the right half
        outs = pipe.process(img, "a bird", num_samples=1,
                            image_resolution=64, ddim_steps=2, seed=5,
                            inpaint_image=src, inpaint_mask=mask)
        assert len(outs) == 2
        gen = outs[1]
        assert gen.shape == (64, 64, 3) and gen.dtype == np.uint8

        # engine-level: mask==0 everywhere reproduces the VAE roundtrip of
        # the source exactly (final blend returns the original latent; the
        # fused decode is the same function as decode_latent)
        rt = pipe.runtime
        key = jax.random.PRNGKey(1)
        src_f = (src.astype(np.float32) / 127.5 - 1.0)[None]
        lat = rt.encode_image(jnp.asarray(src_f), jax.random.PRNGKey(2))
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        zeros = jnp.zeros((1, 8, 8, 1), jnp.float32)
        out = np.asarray(rt.sample_decode(
            2, None, hint, ctx, ctx, key,
            inpaint_latent=lat, inpaint_mask=zeros))
        ref = rt.decode_latent(lat.astype(rt.dtype))
        np.testing.assert_allclose(out.astype(np.int32)[0],
                                   ref.astype(np.int32)[0], atol=1)

    def test_inpaint_with_seeds_variant_reproducible(self, rng):
        """Per-request seeds compose with inpainting: a request's output is
        identical at batch 1 and inside a batch (the serving contract)."""
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime
        from stablediffusioneo_tpu.models import init_clip_text, init_vae

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        params = {
            "unet": init_unet(ks[0], CFG.unet),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        rt = CNSDRuntime(params, CFG, persistent_cache=False)
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx1 = rt.encode_prompt(ids)
        ctx2 = jnp.repeat(ctx1, 2, axis=0)
        hint1 = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        hint2 = jnp.zeros((2, 64, 64, 3), jnp.uint8)
        lat1 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        lat2 = jnp.repeat(lat1, 2, axis=0)
        m = np.zeros((1, 8, 8, 1), np.float32)
        m[:, :, 4:] = 1.0
        m1, m2 = jnp.asarray(m), jnp.asarray(np.repeat(m, 2, axis=0))
        kw = dict(eta=0.5, key=None)
        one = np.asarray(rt.sample_decode(
            2, None, hint1, ctx1, ctx1, seeds=[11],
            inpaint_latent=lat1, inpaint_mask=m1, **kw))
        two = np.asarray(rt.sample_decode(
            2, None, hint2, ctx2, ctx2, seeds=[7, 11],
            inpaint_latent=lat2, inpaint_mask=m2, **kw))
        np.testing.assert_array_equal(one[0], two[1])

    def test_rejects_dpmpp(self, rng):
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime
        from stablediffusioneo_tpu.models import init_clip_text, init_vae

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        params = {
            "unet": init_unet(ks[0], CFG.unet),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        rt = CNSDRuntime(params, CFG, persistent_cache=False)
        lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
        zeros = jnp.zeros((1, 8, 8, 1), jnp.float32)
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        with pytest.raises(ValueError, match="DDIM"):
            rt.sample_decode(2, None, hint, ctx, ctx, jax.random.PRNGKey(0),
                             sampler="dpmpp",
                             inpaint_latent=lat, inpaint_mask=zeros)
