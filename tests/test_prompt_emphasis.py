"""A1111-style prompt emphasis: parser grammar, weight grid alignment,
no-op exactness at weight 1, and the process() surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models.text_encoding import (
    apply_emphasis,
    parse_prompt_attention,
    tokenize_weighted,
)
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

CFG = tiny_pipeline()


class TestParser:
    @pytest.mark.parametrize("text,want", [
        ("a bird", [("a bird", 1.0)]),
        ("(a) bird", [("a", 1.1), (" bird", 1.0)]),
        ("((a)) b", [("a", 1.1 * 1.1), (" b", 1.0)]),
        ("(a:1.5) b", [("a", 1.5), (" b", 1.0)]),
        ("(a:0.25) b", [("a", 0.25), (" b", 1.0)]),
        ("[a] b", [("a", 1 / 1.1), (" b", 1.0)]),
        ("[[a]] b", [("a", 1 / 1.21), (" b", 1.0)]),
        (r"\(x\) b", [("(x) b", 1.0)]),
        ("", [("", 1.0)]),
    ])
    def test_grammar(self, text, want):
        got = parse_prompt_attention(text)
        assert len(got) == len(want)
        for (gs, gw), (ws, ww) in zip(got, want):
            assert gs == ws
            assert abs(gw - ww) < 1e-9

    def test_nesting_multiplies(self):
        got = dict(parse_prompt_attention("(outer (inner) t:2.0) end"))
        assert abs(got["inner"] - 2.2) < 1e-9
        assert abs(got["outer "] - 2.0) < 1e-9
        assert got[" end"] == 1.0

    def test_malformed_weight_does_not_crash(self):
        # '(x:1..5)' and '(x:.)' must degrade to literal-ish text, not
        # crash float() deep inside a serving submit
        for t in ("(x:1..5)", "(x:.)", "(x:)"):
            frags = parse_prompt_attention(t)
            assert frags  # parsed without raising

    def test_unbalanced_brackets_are_literalish(self):
        # a stray ')' emits as text; an unclosed '(' keeps its multiplier
        frags = parse_prompt_attention("a ) b")
        assert any(")" in s for s, _ in frags)
        frags = parse_prompt_attention("(a b")
        assert abs(dict(frags)["a b"] - 1.1) < 1e-9


class TestWeightGrid:
    def test_alignment_and_padding(self):
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        ids, w = tokenize_weighted(tok, ["(hello:2.0) world", "plain"])
        n_hello = len(tok.encode("hello"))
        assert (w[0, 1:1 + n_hello] == 2.0).all()
        assert w[0, 0] == 1.0  # SOT
        assert (w[1] == 1.0).all()
        assert ids.shape == w.shape

    def test_weight_one_is_exact_noop(self):
        ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 16, 32)).astype(np.float32))
        w = np.ones((2, 16), np.float32)
        assert apply_emphasis(ctx, w) is ctx

    def test_emphasis_preserves_row_mean(self):
        rng = np.random.default_rng(0)
        ctx = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
        w = np.ones((2, 16), np.float32)
        w[0, 3:6] = 1.8
        out = apply_emphasis(ctx, w)
        np.testing.assert_allclose(
            np.asarray(out[0]).mean(), np.asarray(ctx[0]).mean(), rtol=1e-5)
        assert np.abs(np.asarray(out[0] - ctx[0])).max() > 0
        np.testing.assert_array_equal(np.asarray(out[1]),
                                      np.asarray(ctx[1]))


@pytest.mark.slow
class TestProcessSurface:
    def test_process_prompt_emphasis(self, rng):
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        cnt = iter(jax.random.split(ks[0], 4096))
        params = {
            # randomized: zero_module gates make eps prompt-independent
            # at true random init
            "unet": jax.tree.map(
                lambda x: jax.random.normal(next(cnt), x.shape, x.dtype)
                * 0.05, init_unet(ks[0], CFG.unet)),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        pipe = Canny2ImagePipeline(params, tok, CFG, persistent_cache=False)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kw = dict(num_samples=1, image_resolution=64, ddim_steps=2, seed=1)
        plain = pipe.process(img, "a red bird", **kw)[1]
        # emphasis on with weight-1 prompt: identical encoder math
        same = pipe.process(img, "a red bird", prompt_emphasis=True, **kw)[1]
        np.testing.assert_array_equal(plain, same)
        boosted = pipe.process(img, "a (red:1.8) bird",
                               prompt_emphasis=True, **kw)[1]
        assert np.any(boosted != plain)
        with pytest.raises(ValueError, match="long_prompt"):
            pipe.process(img, "x", prompt_emphasis=True, long_prompt=True,
                         **kw)
