"""Textual inversion: tokenizer placeholder runs, embedding-table growth,
semantic equivalence (a concept initialized from an existing token's row
encodes identically to that token), file-format loaders, live-runtime
injection with engine eviction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.checkpoint.textual_inversion import (
    add_concepts,
    apply_textual_inversion,
    load_concept,
)
from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_clip_text
from stablediffusioneo_tpu.models.clip import clip_text_apply
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

CFG = tiny_pipeline()


def _tok():
    return toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                         max_length=CFG.clip.max_length)


class TestTokenizer:
    def test_placeholder_id_runs(self):
        tok = _tok()
        tok.add_placeholder("<cat-toy>", [500, 501, 502])
        ids = tok.encode("a photo of <cat-toy> here")
        i = ids.index(500)
        assert ids[i:i + 3] == [500, 501, 502]
        # surrounding text still BPE-encodes
        assert ids[:i] == tok.encode("a photo of ")
        # case-insensitive whole-word match
        assert 500 in tok.encode("A PHOTO OF <CAT-TOY>")

    def test_multiple_placeholders(self):
        tok = _tok()
        tok.add_placeholder("<a>", [900])
        tok.add_placeholder("<b>", [901, 902])
        ids = tok.encode("<a> and <b>")
        assert 900 in ids and 901 in ids and 902 in ids

    def test_whole_word_and_longest_match(self):
        tok = _tok()
        # the canonical TI token name must not fire inside ordinary words
        tok.add_placeholder("sks", [950])
        assert 950 not in tok.encode("tasks on the desk")
        assert 950 in tok.encode("a sks plushie")
        # longest placeholder wins regardless of registration order
        tok.add_placeholder("<a>", [960])
        tok.add_placeholder("<ab>", [961])
        ids = tok.encode("x <ab> y")
        assert 961 in ids and 960 not in ids


class TestInjection:
    def test_concept_from_existing_row_encodes_identically(self):
        """A concept whose vector IS token t's embedding row must produce
        the same text encoding as token t itself — the strongest cheap
        correctness check for the whole injection path."""
        tok = _tok()
        params = init_clip_text(jax.random.PRNGKey(0), CFG.clip)
        t = 42  # arbitrary base-vocab token id
        vec = np.asarray(params["token_embedding"][t])[None]
        new = add_concepts(params, tok, {"<clone>": vec})
        assert new["token_embedding"].shape[0] == CFG.clip.vocab_size + 1
        cid = tok.added_tokens["<clone>"][0]
        L = CFG.clip.max_length
        ids_ref = np.full((1, L), tok.eot, np.int32)
        ids_ref[0, :3] = [tok.sot, t, tok.eot]
        ids_new = ids_ref.copy()
        ids_new[0, 1] = cid
        out_ref = clip_text_apply(new, CFG.clip, jnp.asarray(ids_ref))
        out_new = clip_text_apply(new, CFG.clip, jnp.asarray(ids_new))
        np.testing.assert_array_equal(np.asarray(out_ref),
                                      np.asarray(out_new))

    def test_width_mismatch_raises(self):
        tok = _tok()
        params = init_clip_text(jax.random.PRNGKey(0), CFG.clip)
        with pytest.raises(ValueError, match="hidden size"):
            add_concepts(params, tok,
                         {"<bad>": np.zeros((1, 9999), np.float32)})


class TestLoaders:
    def test_npz_and_torch_formats(self, tmp_path):
        d = CFG.clip.hidden_size
        vec = np.random.default_rng(0).standard_normal((2, d)).astype(
            np.float32)
        p_npz = str(tmp_path / "c.npz")
        np.savez(p_npz, **{"<npz-concept>": vec})
        got = load_concept(p_npz)
        np.testing.assert_array_equal(got["<npz-concept>"], vec)

        import torch

        p_a1111 = str(tmp_path / "a1111.pt")
        torch.save({"string_to_param": {"*": torch.from_numpy(vec)},
                    "name": "<sd-concept>"}, p_a1111)
        got = load_concept(p_a1111)
        np.testing.assert_array_equal(got["<sd-concept>"], vec)

        p_diff = str(tmp_path / "diff.bin")
        torch.save({"<diff-concept>": torch.from_numpy(vec[0])}, p_diff)
        got = load_concept(p_diff)
        assert got["<diff-concept>"].shape == (1, d)  # (d,) -> (1, d)

        p_bad = str(tmp_path / "bad.pt")
        torch.save({"not_an_embedding": 3}, p_bad)
        with pytest.raises(ValueError, match="no embedding"):
            load_concept(p_bad)


@pytest.mark.slow
class TestLiveRuntime:
    def test_apply_to_live_runtime(self, rng):
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        # randomize the unet so the output depends on the prompt (at true
        # random init the zero_module gates make eps_hat prompt-independent)
        cnt = iter(jax.random.split(ks[0], 4096))
        params = {
            "unet": jax.tree.map(
                lambda x: jax.random.normal(next(cnt), x.shape, x.dtype)
                * 0.05, init_unet(ks[0], CFG.unet)),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        tok = _tok()
        pipe = Canny2ImagePipeline(params, tok, CFG, persistent_cache=False)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        # warm a clip engine, then inject (must evict + recompile lazily)
        pipe.process(img, "a bird", num_samples=1, image_resolution=64,
                     ddim_steps=2, seed=1)
        d = CFG.clip.hidden_size
        vec = rng.standard_normal((2, d)).astype(np.float32) * 0.02
        n = apply_textual_inversion(pipe.runtime, tok, {"<thing>": vec})
        assert n == 2
        assert not any(k[0] == "clip" for k in pipe.runtime._engines)
        out_a = pipe.process(img, "a photo of <thing>", num_samples=1,
                             image_resolution=64, ddim_steps=2, seed=1)[1]
        out_b = pipe.process(img, "a photo of", num_samples=1,
                             image_resolution=64, ddim_steps=2, seed=1)[1]
        assert out_a.shape == (64, 64, 3)
        assert np.any(out_a != out_b), "concept had no effect on the prompt"
