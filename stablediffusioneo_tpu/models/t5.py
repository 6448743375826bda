"""T5 v1.1 text encoder — functional JAX, HF-checkpoint-compatible.

Covers the reference's `FrozenT5Embedder` and `FrozenCLIPT5Encoder`
(ldm/modules/encoders/modules.py:60-87, 209-225): the HF `T5EncoderModel`
tower (google/t5-v1_1-{large,xl,xxl}) used as an alternative/secondary
conditioning stack. Architecture (T5 v1.1):

  embed -> N x [ RMSNorm -> self-attn(+shared relative-position bias)
                 -> residual;
                 RMSNorm -> gated-GELU MLP (wi_0 * gelu, wi_1 gate? see
                 below) -> residual ]
        -> final RMSNorm

T5 quirks faithfully kept:
  - attention logits are NOT scaled by 1/sqrt(d_head) (the scale is folded
    into the init; HF T5Attention has no `* scale`);
  - the relative-position bias table lives on block 0 and is shared by all
    blocks;
  - v1.1 MLP is gated: hidden = gelu_new(wi_0(x)) * wi_1(x), out = wo(hidden);
  - RMSNorm (no mean subtraction, no bias), eps 1e-6;
  - no biases on any linear; embeddings are not scaled.

TPU notes: for a fixed max_length the relative-position bucket table is a
compile-time numpy constant, so the bias is one static gather per forward;
everything else is batched matmuls on bf16-friendly shapes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class T5Config:
    """Defaults = google/t5-v1_1-large (the reference's default version)."""

    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    max_length: int = 77


def tiny_t5() -> T5Config:
    return T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_heads=4, max_length=16)


# ----------------------------------------------------------------- init


def _lin(key, cin, cout, scale):
    return {"w": jax.random.normal(key, (cin, cout), jnp.float32) * scale}


def init_t5(key, cfg: T5Config) -> Dict:
    ks = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))
    inner = cfg.num_heads * cfg.d_kv
    params: Dict = {
        "token_embedding": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.d_model), jnp.float32),
        "rel_bias": jax.random.normal(
            next(ks), (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32) * 0.05,
        "blocks": [],
        "final_norm": {"g": jnp.ones((cfg.d_model,), jnp.float32)},
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "norm1": {"g": jnp.ones((cfg.d_model,), jnp.float32)},
            "q": _lin(next(ks), cfg.d_model, inner, (cfg.d_model * cfg.d_kv) ** -0.5),
            "k": _lin(next(ks), cfg.d_model, inner, cfg.d_model ** -0.5),
            "v": _lin(next(ks), cfg.d_model, inner, cfg.d_model ** -0.5),
            "o": _lin(next(ks), inner, cfg.d_model, inner ** -0.5),
            "norm2": {"g": jnp.ones((cfg.d_model,), jnp.float32)},
            "wi_0": _lin(next(ks), cfg.d_model, cfg.d_ff, cfg.d_model ** -0.5),
            "wi_1": _lin(next(ks), cfg.d_model, cfg.d_ff, cfg.d_model ** -0.5),
            "wo": _lin(next(ks), cfg.d_ff, cfg.d_model, cfg.d_ff ** -0.5),
        })
    return params


# ------------------------------------------------------------- converter


def convert_t5(sd: Dict[str, np.ndarray], cfg: T5Config,
               prefix: str = "", dtype=None) -> Dict:
    """HF T5EncoderModel state dict -> param tree. Key naming
    (transformers T5EncoderModel):
      shared.weight                                        token embedding
      encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}.weight
      encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight
      encoder.block.{i}.layer.{0,1}.layer_norm.weight
      encoder.block.{i}.layer.1.DenseReluDense.{wi_0,wi_1,wo}.weight
      encoder.final_layer_norm.weight
    """
    if prefix:
        from stablediffusioneo_tpu.checkpoint.accounting import PrefixView

        sd = PrefixView(sd, prefix)

    def lin(name):
        return {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"]), dtype)}

    emb_key = "shared.weight" if "shared.weight" in sd else \
        "encoder.embed_tokens.weight"
    params: Dict = {
        "token_embedding": jnp.asarray(sd[emb_key], dtype),
        "rel_bias": jnp.asarray(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"], dtype),
        "blocks": [],
        "final_norm": {"g": jnp.asarray(sd["encoder.final_layer_norm.weight"],
                                        dtype)},
    }
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        params["blocks"].append({
            "norm1": {"g": jnp.asarray(sd[f"{b}.layer.0.layer_norm.weight"], dtype)},
            "q": lin(f"{b}.layer.0.SelfAttention.q"),
            "k": lin(f"{b}.layer.0.SelfAttention.k"),
            "v": lin(f"{b}.layer.0.SelfAttention.v"),
            "o": lin(f"{b}.layer.0.SelfAttention.o"),
            "norm2": {"g": jnp.asarray(sd[f"{b}.layer.1.layer_norm.weight"], dtype)},
            "wi_0": lin(f"{b}.layer.1.DenseReluDense.wi_0"),
            "wi_1": lin(f"{b}.layer.1.DenseReluDense.wi_1"),
            "wo": lin(f"{b}.layer.1.DenseReluDense.wo"),
        })
    return params


# --------------------------------------------------------------- forward


def _rel_pos_buckets(q_len: int, k_len: int, num_buckets: int,
                     max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing, evaluated host-side:
    for fixed (static) sequence lengths this is a compile-time constant,
    so the per-layer bias is a single static gather on device."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx  # key pos - query pos
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    with np.errstate(divide="ignore"):
        val_large = max_exact + (
            np.log(np.maximum(n, 1) / max_exact)
            / math.log(max_distance / max_exact)
            * (nb - max_exact)
        ).astype(np.int64)
    val_large = np.minimum(val_large, nb - 1)
    buckets += np.where(is_small, n, val_large)
    return buckets  # (q_len, k_len) int


def _rms_norm(x, g, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * g.astype(x.dtype)


def t5_encode(
    params: Dict,
    cfg: T5Config,
    ids: jax.Array,
    mask: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """(B, T) int token ids [+ (B, T) 0/1 attention mask] -> (B, T, d_model)
    last hidden state (T5EncoderModel.forward semantics)."""
    B, T = ids.shape
    H, dk = cfg.num_heads, cfg.d_kv
    x = params["token_embedding"][ids].astype(dtype)

    buckets = jnp.asarray(_rel_pos_buckets(
        T, T, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance))
    # (T, T, H) -> (1, H, T, T), shared across all blocks (HF layer-0 table)
    bias = params["rel_bias"][buckets].astype(jnp.float32)
    bias = jnp.transpose(bias, (2, 0, 1))[None]
    if mask is not None:
        neg = jnp.where(mask[:, None, None, :].astype(bool), 0.0, -1e9)
        bias = bias + neg.astype(jnp.float32)

    block = _block_fn(cfg, dtype)
    for p in params["blocks"]:
        x = block(p, x, bias)
    return _rms_norm(x, params["final_norm"]["g"], cfg.layer_norm_eps)


def _block_fn(cfg: T5Config, dtype):
    """One T5 encoder block as a pure (params, x, bias) -> x function —
    shape-agnostic (batch/seq read from x), shared by the sequential loop
    above and the pipeline-parallel path so the two can never drift."""
    H, dk = cfg.num_heads, cfg.d_kv

    def attn(p, h, bias):
        b, t = h.shape[0], h.shape[1]
        q = (h @ p["q"]["w"].astype(dtype)).reshape(b, t, H, dk)
        k = (h @ p["k"]["w"].astype(dtype)).reshape(b, t, H, dk)
        v = (h @ p["v"]["w"].astype(dtype)).reshape(b, t, H, dk)
        # T5: no 1/sqrt(dk) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) + bias
        w = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, H * dk)
        return out @ p["o"]["w"].astype(dtype)

    def mlp(p, h):
        hidden = jax.nn.gelu(h @ p["wi_0"]["w"].astype(dtype), approximate=True)
        hidden = hidden * (h @ p["wi_1"]["w"].astype(dtype))
        return hidden @ p["wo"]["w"].astype(dtype)

    def block(p, x, bias):
        x = x + attn(p, _rms_norm(x, p["norm1"]["g"], cfg.layer_norm_eps),
                     bias)
        return x + mlp(p, _rms_norm(x, p["norm2"]["g"], cfg.layer_norm_eps))

    return block


def t5_encode_pp(
    params: Dict,
    cfg: T5Config,
    ids: jax.Array,
    mesh,
    mask: Optional[jax.Array] = None,
    dtype=jnp.float32,
    microbatches: Optional[int] = None,
    remat: bool = False,
) -> jax.Array:
    """t5_encode with the block stack pipeline-parallel over the mesh's
    `pp` axis (parallel/pipeline.py). T5-XXL-class encoders (the
    imagen-style conditioner this tower exists for) outgrow one chip's
    HBM; stage-sharding the 24-block stack is how they run at all.

    The relative-position bias is the GPipe-subtle part: without a mask
    it is batch-independent and broadcasts to every stage (`extra`);
    with a padding mask it is per-sample, so it must be microbatched
    WITH the activations (`batched_extra` — each stage indexes the
    microbatch it is working on this tick, not tick-0's).

    params["blocks"] may be the usual list or pre-stacked
    (parallel.stack_layer_params); numerics match t5_encode."""
    from stablediffusioneo_tpu.parallel.pipeline import (
        pipeline_apply, stack_layer_params)

    B, T = ids.shape
    x = params["token_embedding"][ids].astype(dtype)
    buckets = jnp.asarray(_rel_pos_buckets(
        T, T, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance))
    bias = params["rel_bias"][buckets].astype(jnp.float32)
    bias = jnp.transpose(bias, (2, 0, 1))[None]
    stacked = params["blocks"]
    if isinstance(stacked, (list, tuple)):
        stacked = stack_layer_params(stacked)
    if mask is not None:
        neg = jnp.where(mask[:, None, None, :].astype(bool), 0.0, -1e9)
        bias = jnp.broadcast_to(bias + neg.astype(jnp.float32),
                                (B, *bias.shape[1:]))
        x = pipeline_apply(_block_fn(cfg, dtype), stacked, x, mesh,
                           batched_extra=(bias,),
                           microbatches=microbatches, remat=remat)
    else:
        x = pipeline_apply(_block_fn(cfg, dtype), stacked, x, mesh,
                           extra=(bias,),
                           microbatches=microbatches, remat=remat)
    return _rms_norm(x, params["final_norm"]["g"], cfg.layer_norm_eps)


def clip_t5_encode(
    clip_params: Dict,
    clip_cfg,
    t5_params: Dict,
    t5_cfg: T5Config,
    clip_ids: jax.Array,
    t5_ids: jax.Array,
    t5_mask: Optional[jax.Array] = None,
):
    """FrozenCLIPT5Encoder.forward (modules.py:209-225): encode the prompt
    with both towers and return [clip_z, t5_z]."""
    from stablediffusioneo_tpu.models.clip import clip_text_apply

    clip_z = clip_text_apply(clip_params, clip_cfg, clip_ids)
    t5_z = t5_encode(t5_params, t5_cfg, t5_ids, mask=t5_mask)
    return [clip_z, t5_z]
