"""Multi-ControlNet composition (beyond the reference): N nets' residual
taps sum into the UNet. Correctness anchors: linearity (same net at split
strengths == one net at the summed strength), manual-sum equivalence for
distinct nets, and the scan/runtime/pipeline surfaces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.models.controlnet import (
    controlled_unet_apply,
    controlnet_apply,
    scale_control,
)
from stablediffusioneo_tpu.models.unet import unet_apply

CFG = tiny_pipeline()


@pytest.fixture(scope="module")
def nets():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)

    # randomize everything: the zero_module gates (UNet out heads, CN
    # zero-convs) otherwise make eps independent of the taps
    def rnd(tree, key):
        cnt = iter(jax.random.split(key, 4096))
        return jax.tree.map(
            lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * 0.05,
            tree)
    up = rnd(init_unet(ks[0], CFG.unet), ks[0])
    cp1 = rnd(init_controlnet(ks[1], CFG.controlnet), ks[1])
    cp2 = rnd(init_controlnet(ks[2], CFG.controlnet), ks[2])
    return up, cp1, cp2


def _inputs(rng, b=2):
    return dict(
        x=jnp.asarray(rng.standard_normal((b, 8, 8, 4)).astype(np.float32)),
        hint=jnp.asarray(rng.random((b, 64, 64, 3)).astype(np.float32)),
        t=jnp.full((b,), 500.0, jnp.float32),
        ctx=jnp.asarray(rng.standard_normal(
            (b, 5, CFG.unet.context_dim)).astype(np.float32)),
    )


class TestComposition:
    def test_split_strength_linearity(self, rng, nets):
        """Same net at (0.6, 0.4) == one net at 1.0 (taps are linear in
        the scale)."""
        up, cp1, _ = nets
        a = _inputs(rng)
        n_taps = 5
        one = controlled_unet_apply(
            up, cp1, CFG.controlnet, a["x"], a["hint"], a["t"], a["ctx"],
            control_scales=jnp.full((n_taps,), 1.0))
        two = controlled_unet_apply(
            up, (cp1, cp1), CFG.controlnet, a["x"], (a["hint"], a["hint"]),
            a["t"], a["ctx"],
            control_scales=(jnp.full((n_taps,), 0.6),
                            jnp.full((n_taps,), 0.4)))
        np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                                   rtol=2e-5, atol=2e-5)

    def test_zero_strength_net_is_noop(self, rng, nets):
        up, cp1, cp2 = nets
        a = _inputs(rng)
        n_taps = 5
        one = controlled_unet_apply(
            up, cp1, CFG.controlnet, a["x"], a["hint"], a["t"], a["ctx"],
            control_scales=jnp.full((n_taps,), 1.0))
        two = controlled_unet_apply(
            up, (cp1, cp2), CFG.controlnet, a["x"], (a["hint"], a["hint"]),
            a["t"], a["ctx"],
            control_scales=(jnp.full((n_taps,), 1.0),
                            jnp.zeros((n_taps,))))
        np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                                   rtol=1e-6, atol=1e-6)

    def test_distinct_nets_equal_manual_sum(self, rng, nets):
        up, cp1, cp2 = nets
        a = _inputs(rng)
        n_taps = 5
        s1, s2 = jnp.full((n_taps,), 0.8), jnp.full((n_taps,), 0.5)
        got = controlled_unet_apply(
            up, (cp1, cp2), CFG.controlnet, a["x"], (a["hint"], a["hint"]),
            a["t"], a["ctx"], control_scales=(s1, s2))
        t1 = scale_control(controlnet_apply(
            cp1, CFG.controlnet, a["x"], a["hint"], a["t"], a["ctx"]), s1)
        t2 = scale_control(controlnet_apply(
            cp2, CFG.controlnet, a["x"], a["hint"], a["t"], a["ctx"]), s2)
        control = [u + v for u, v in zip(t1, t2)]
        want = unet_apply(up, CFG.unet, a["x"], a["t"], a["ctx"],
                          control=control)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
class TestScanAndRuntime:
    def test_scan_multi_equals_single_at_split_strength(self, rng, nets):
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
        from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan

        up, cp1, _ = nets
        sched = DiffusionSchedule().ddim(2)
        b = 2
        x_T = jnp.asarray(rng.standard_normal((b, 8, 8, 4)).astype(np.float32))
        hint = jnp.asarray(rng.random((b, 64, 64, 3)).astype(np.float32))
        ctx = jnp.asarray(rng.standard_normal(
            (b, 5, CFG.unet.context_dim)).astype(np.float32))
        kw = dict(scale=jnp.asarray(9.0), key=jax.random.PRNGKey(0))
        one = ddim_sample_scan(
            up, cp1, CFG.controlnet, sched, x_T, hint, ctx, ctx,
            control_scales=jnp.full((5,), 1.0), **kw)
        two = ddim_sample_scan(
            up, (cp1, cp1), CFG.controlnet, sched, x_T, (hint, hint),
            ctx, ctx,
            control_scales=(jnp.full((5,), 0.25), jnp.full((5,), 0.75)),
            **kw)
        np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                                   rtol=2e-4, atol=2e-4)

    def test_runtime_and_pipeline_multi(self, rng, nets):
        from stablediffusioneo_tpu.annotators.canny import CannyDetector
        from stablediffusioneo_tpu.annotators.hed import HEDdetector
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )

        up, cp1, cp2 = nets
        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        params = {
            "unet": up, "controlnet": (cp1, cp2),
            "vae": init_vae(ks[0], CFG.vae),
            "clip": init_clip_text(ks[1], CFG.clip),
        }
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        pipe = Canny2ImagePipeline(
            params, tok, CFG, persistent_cache=False,
            annotator=[CannyDetector(), HEDdetector()])
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        outs = pipe.process(img, "a bird", num_samples=1,
                            image_resolution=64, ddim_steps=2, seed=1,
                            strength=(1.0, 0.5))
        assert outs[1].shape == (64, 64, 3) and outs[1].dtype == np.uint8
        assert len(pipe.last_detected_maps) == 2
        # per-net strength matters: dropping net 2 changes the output
        outs2 = pipe.process(img, "a bird", num_samples=1,
                             image_resolution=64, ddim_steps=2, seed=1,
                             strength=(1.0, 0.0))
        assert np.any(outs[1] != outs2[1])
        # engines compiled AOT (no silent jit fallback)
        fell = [e.name for e in pipe.runtime._engines.values()
                if not e.get_engine_infor().get("compiled")]
        assert not fell, fell

    def test_serving_multi_matches_process(self, rng, nets):
        """Multi-CN requests batch through DiffusionServer with per-request
        per-net strengths and match the process() path."""
        from stablediffusioneo_tpu.annotators.canny import CannyDetector
        from stablediffusioneo_tpu.annotators.hed import HEDdetector
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )
        from stablediffusioneo_tpu.serving import DiffusionServer, GenRequest

        up, cp1, cp2 = nets
        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        params = {
            "unet": up, "controlnet": (cp1, cp2),
            "vae": init_vae(ks[0], CFG.vae),
            "clip": init_clip_text(ks[1], CFG.clip),
        }
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        pipe = Canny2ImagePipeline(
            params, tok, CFG, persistent_cache=False,
            annotator=[CannyDetector(), HEDdetector()])
        server = DiffusionServer(pipe, batch_buckets=(1, 2),
                                 max_wait_ms=200.0).start()
        try:
            def img(s):
                return (np.random.default_rng(s).random((64, 64, 3))
                        * 255).astype(np.uint8)

            reqs = [
                GenRequest(image=img(1), prompt="a bird",
                           image_resolution=64, ddim_steps=2, seed=11,
                           strength=(1.0, 0.3)),
                GenRequest(image=img(2), prompt="a dog",
                           image_resolution=64, ddim_steps=2, seed=12,
                           strength=0.7),
            ]
            futures = [server.submit(r) for r in reqs]
            results = [f.result(timeout=900) for f in futures]
            assert server.stats.batches <= 2
            for r, (det, im) in zip(reqs, results):
                outs = pipe.process(
                    r.image, r.prompt, a_prompt=r.a_prompt,
                    n_prompt=r.n_prompt, num_samples=1,
                    image_resolution=64, ddim_steps=2, seed=r.seed,
                    strength=r.strength)
                frac_off = (np.abs(outs[1].astype(np.int16)
                                   - im.astype(np.int16)) > 1).mean()
                assert frac_off < 0.02, f"multi serving diverged: {frac_off}"
        finally:
            server.stop(drain=False)

    def test_hint_arity_validation(self, rng, nets):
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        up, cp1, cp2 = nets
        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        params = {
            "unet": up, "controlnet": (cp1, cp2),
            "vae": init_vae(ks[0], CFG.vae),
            "clip": init_clip_text(ks[1], CFG.clip),
        }
        rt = CNSDRuntime(params, CFG, persistent_cache=False)
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        with pytest.raises(ValueError, match="multi-ControlNet"):
            rt.sample_decode(2, None, jnp.zeros((1, 64, 64, 3), jnp.uint8),
                             ctx, ctx, jax.random.PRNGKey(0))
