"""CLIP ViT-L/14 text encoder — functional JAX.

Re-design of the reference's `FrozenCLIPEmbedder`
(ldm/modules/encoders/modules.py:90-144), which wraps HF
`openai/clip-vit-large-patch14` `CLIPTextModel` and returns
`last_hidden_state` for SD-1.5 conditioning (layer="last"), or hidden state
-(1+layer_idx) for SD-2.x style "penultimate" selection.

Architecture (matches HF CLIPTextModel exactly so the original checkpoint
weights load 1:1): token+position embeddings; N pre-LN transformer layers
(self-attention with q/k/v/out all biased, quick_gelu MLP); final LayerNorm;
causal attention mask.

bf16 safety: the causal mask uses a large negative finite constant instead
of -inf — the native analog of the reference's ONNX graph surgery replacing
Trilu -inf with -10000 for fp16 (surgeon_graph.py:7-27).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.config import CLIPTextConfig
from stablediffusioneo_tpu.ops.layers import linear, linear_init
from stablediffusioneo_tpu.ops.norms import layer_norm
from stablediffusioneo_tpu.ops.attention import attention

MASK_NEG = -10000.0  # fp16/bf16-safe "-inf" (surgeon_graph.py:18-27)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _act(cfg):
    return quick_gelu if cfg.act == "quick_gelu" else (
        lambda x: jax.nn.gelu(x, approximate=False)
    )


def init_clip_text(key, cfg: CLIPTextConfig) -> Dict:
    ks = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))
    d = cfg.hidden_size
    params: Dict = {
        "token_embedding": jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02,
        "position_embedding": jax.random.normal(next(ks), (cfg.max_length, d)) * 0.01,
        "layers": [],
        "final_ln": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "q": linear_init(next(ks), d, d),
                "k": linear_init(next(ks), d, d),
                "v": linear_init(next(ks), d, d),
                "out": linear_init(next(ks), d, d),
                "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "fc1": linear_init(next(ks), d, cfg.intermediate_size),
                "fc2": linear_init(next(ks), cfg.intermediate_size, d),
            }
        )
    if cfg.projection_dim:
        # pooled-output projection (OpenCLIP text_projection; SDXL bigG)
        params["text_projection"] = {
            "w": jax.random.normal(next(ks),
                                   (d, cfg.projection_dim)) * d ** -0.5}
    return params


def _self_attn(p: dict, cfg: CLIPTextConfig, x, mask):
    b, t, d = x.shape
    h = cfg.num_heads
    hd = d // h
    q = linear(x, p["q"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = linear(x, p["k"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    o = attention(q, k, v, mask=mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return linear(o, p["out"])


def clip_text_apply(
    params: dict,
    cfg: CLIPTextConfig,
    input_ids: jax.Array,
    layer: Optional[str] = None,
) -> jax.Array:
    """input_ids: (B, T) int32. Returns (B, T, hidden) conditioning.

    layer: "last" (SD-1.5, default from cfg) returns final-LN output;
    "penultimate" returns the hidden state before the last block, LN'd
    (FrozenOpenCLIPEmbedder-style, modules.py:147-225).
    """
    layer = layer or cfg.layer
    b, t = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][None, :t, :].astype(x.dtype)

    causal = np.triu(np.full((t, t), MASK_NEG, np.float32), k=1)
    mask = jnp.asarray(causal)[None, None]

    hidden_states = []
    block = _layer_fn(cfg)
    for p in params["layers"]:
        hidden_states.append(x)
        x = block(p, x, mask)

    if layer == "penultimate":
        h = hidden_states[-1]
        return layer_norm(
            h, params["final_ln"]["g"], params["final_ln"]["b"], cfg.layer_norm_eps
        )
    if layer == "penultimate_raw":
        # SDXL conditioner towers: the penultimate hidden WITHOUT the
        # final LN (sgm FrozenCLIPEmbedder layer='hidden' /
        # FrozenOpenCLIPEmbedder2 — only the POOLED path sees ln_final)
        return hidden_states[-1]
    return layer_norm(
        x, params["final_ln"]["g"], params["final_ln"]["b"], cfg.layer_norm_eps
    )


def _layer_fn(cfg: CLIPTextConfig):
    """One pre-LN CLIP block as a pure (params, x, mask) -> x function —
    the exact body of clip_text_apply's layer loop, shared with the
    pipeline-parallel path so the two can never drift."""
    def f(p, x, mask):
        h = layer_norm(x, p["ln1"]["g"], p["ln1"]["b"], cfg.layer_norm_eps)
        x = x + _self_attn(p, cfg, h, mask)
        h = layer_norm(x, p["ln2"]["g"], p["ln2"]["b"], cfg.layer_norm_eps)
        return x + linear(_act(cfg)(linear(h, p["fc1"])), p["fc2"])
    return f


def clip_text_apply_pp(
    params: dict,
    cfg: CLIPTextConfig,
    input_ids: jax.Array,
    mesh,
    layer: Optional[str] = None,
    microbatches: Optional[int] = None,
    remat: bool = False,
) -> jax.Array:
    """clip_text_apply with the transformer stack pipeline-parallel over
    the mesh's `pp` axis (parallel/pipeline.py — GPipe schedule, stage
    params sharded over pp, batch over dp). Numerically identical to the
    sequential path; pp is the scale-out story for towers that outgrow
    one chip's HBM (OpenCLIP bigG / T5-XXL-class conditioners), not a
    latency win at SD-1.5 text sizes (the bubble dominates 77-token
    encodes). params["layers"] may be the usual list or a pre-stacked
    tree (stack_layer_params) — pre-stack once for repeated calls."""
    from stablediffusioneo_tpu.parallel.pipeline import (
        pipeline_apply, stack_layer_params)

    layer = layer or cfg.layer
    b, t = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][None, :t, :].astype(x.dtype)
    mask = np.triu(np.full((t, t), MASK_NEG, np.float32), k=1)[None, None]

    stacked = params["layers"]
    if isinstance(stacked, (list, tuple)):
        stacked = stack_layer_params(stacked)
    out, pen = pipeline_apply(
        _layer_fn(cfg), stacked, x, mesh, extra=(mask,),
        microbatches=microbatches, capture_last_input=True, remat=remat)

    if layer == "penultimate":
        return layer_norm(pen, params["final_ln"]["g"],
                          params["final_ln"]["b"], cfg.layer_norm_eps)
    if layer == "penultimate_raw":
        return pen
    return layer_norm(out, params["final_ln"]["g"],
                      params["final_ln"]["b"], cfg.layer_norm_eps)


def clip_text_apply_with_pooled(
    params: dict,
    cfg: CLIPTextConfig,
    input_ids: jax.Array,
    eot_id: Optional[int] = None,
):
    """ONE tower forward -> (hidden per cfg.layer, pooled).

    The SDXL bigG tower needs both the penultimate-raw hidden (context
    half) and the pooled/projected output (ADM half); running
    clip_text_apply twice would double the heaviest text-encode cost."""
    hidden = clip_text_apply(params, cfg, input_ids)
    if cfg.layer == "penultimate_raw":
        # 'last' = one more transformer block + final LN on top of the
        # SAME residual stream — recompute only that tail for pooling
        x = hidden
        p = params["layers"][-1]
        b, t = input_ids.shape
        causal = np.triu(np.full((t, t), MASK_NEG, np.float32), k=1)
        mask = jnp.asarray(causal)[None, None]
        x = _layer_fn(cfg)(p, x, mask)
        last = layer_norm(x, params["final_ln"]["g"], params["final_ln"]["b"],
                          cfg.layer_norm_eps)
    else:
        last = clip_text_apply(params, cfg, input_ids, layer="last")
    pooled = _pool_projected(params, last, input_ids, eot_id)
    return hidden, pooled


def _pool_projected(params, last, input_ids, eot_id):
    if eot_id is None:
        pos = jnp.argmax(input_ids, axis=-1)
    else:
        is_eot = (input_ids == eot_id).astype(jnp.int32)
        pos = jnp.argmax(is_eot, axis=-1)
    pooled = jnp.take_along_axis(last, pos[:, None, None].astype(jnp.int32),
                                 axis=1)[:, 0]
    proj = params.get("text_projection")
    if proj is not None:
        pooled = (pooled.astype(jnp.float32)
                  @ proj["w"].astype(jnp.float32)).astype(last.dtype)
    return pooled


def clip_text_pooled(
    params: dict,
    cfg: CLIPTextConfig,
    input_ids: jax.Array,
    eot_id: Optional[int] = None,
) -> jax.Array:
    """Pooled text embedding: the FINAL-LN hidden state at each row's EOT
    position, through text_projection when present — the SDXL conditioner's
    pooled output (sgm FrozenOpenCLIPEmbedder2 pooling; OpenCLIP
    text_global_pool 'argmax'). Returns (B, proj_dim-or-hidden).

    eot_id: the EOT token id; default = the row-wise argmax id (OpenCLIP's
    convention — EOT is the largest id in the vocabulary)."""
    x = clip_text_apply(params, cfg, input_ids, layer="last")  # (B, T, d)
    return _pool_projected(params, x, input_ids, eot_id)
