"""T5 v1.1 encoder parity vs HF transformers (the exact class
FrozenT5Embedder wraps — ldm/modules/encoders/modules.py:60-87) and the
FrozenCLIPT5Encoder dual-tower contract (modules.py:209-225)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.models.t5 import (
    T5Config, _rel_pos_buckets, convert_t5, init_t5, t5_encode, tiny_t5,
)


def _hf_t5(cfg: T5Config):
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",  # the v1_1 family
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return T5EncoderModel(hf_cfg).eval()


class TestT5Parity:
    def test_vs_hf_encoder(self, rng):
        cfg = tiny_t5()
        hf = _hf_t5(cfg)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = convert_t5(sd, cfg)
        ids = rng.integers(0, cfg.vocab_size, (2, cfg.max_length)).astype(np.int32)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64))
                     ).last_hidden_state.numpy()
        out = np.asarray(t5_encode(params, cfg, jnp.asarray(ids)))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_vs_hf_with_padding_mask(self, rng):
        """padding='max_length' semantics: masked positions must not leak
        into attention (the FrozenT5Embedder tokenizer path)."""
        cfg = tiny_t5()
        hf = _hf_t5(cfg)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = convert_t5(sd, cfg)
        ids = rng.integers(1, cfg.vocab_size, (2, cfg.max_length)).astype(np.int32)
        mask = np.ones_like(ids)
        mask[0, 10:] = 0
        ids[0, 10:] = 0  # pad token
        with torch.no_grad():
            ref = hf(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        out = np.asarray(t5_encode(params, cfg, jnp.asarray(ids),
                                   mask=jnp.asarray(mask)))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_rel_pos_buckets_vs_hf(self):
        """Bucketing must match HF's _relative_position_bucket exactly."""
        from transformers.models.t5.modeling_t5 import T5Attention

        q = k = 77
        ctx = torch.arange(q)[:, None]
        mem = torch.arange(k)[None, :]
        ref = T5Attention._relative_position_bucket(
            mem - ctx, bidirectional=True, num_buckets=32, max_distance=128
        ).numpy()
        ours = _rel_pos_buckets(q, k, 32, 128)
        np.testing.assert_array_equal(ours, ref)

    def test_init_shapes_roundtrip(self):
        """init_t5 produces the same tree shape as the converter output."""
        cfg = tiny_t5()
        a = init_t5(jax.random.PRNGKey(0), cfg)
        hf = _hf_t5(cfg)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        b = convert_t5(sd, cfg)
        sa = jax.tree.map(lambda x: x.shape, a)
        sb = jax.tree.map(lambda x: x.shape, b)
        assert sa == sb


class TestCLIPT5:
    def test_dual_tower(self, rng):
        from stablediffusioneo_tpu.config import CLIPTextConfig
        from stablediffusioneo_tpu.models import init_clip_text
        from stablediffusioneo_tpu.models.t5 import clip_t5_encode

        ccfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                              intermediate_size=64, num_layers=2,
                              num_heads=2, max_length=8)
        tcfg = tiny_t5()
        cp = init_clip_text(jax.random.PRNGKey(0), ccfg)
        tp = init_t5(jax.random.PRNGKey(1), tcfg)
        cids = jnp.asarray(rng.integers(0, 100, (2, 8)).astype(np.int32))
        tids = jnp.asarray(
            rng.integers(0, tcfg.vocab_size, (2, tcfg.max_length)).astype(np.int32))
        zs = clip_t5_encode(cp, ccfg, tp, tcfg, cids, tids)
        assert len(zs) == 2  # [clip_z, t5_z], modules.py:224-225
        assert zs[0].shape == (2, 8, 32)
        assert zs[1].shape == (2, tcfg.max_length, tcfg.d_model)
