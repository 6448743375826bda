"""Attention ops.

Replaces the reference's CrossAttention einsum path
(ldm/modules/attention.py:227-250), its fused-QKV ONNX-export rewrite
(export_onnx_attention.py:48-216), the xformers memory-efficient path
(attention.py:306-352), and the `enable_sliced_attention` low-VRAM hack
(cldm/hack.py:72-111). On TPU all four collapse into one design:

  * a single batched `q @ k^T -> fp32 softmax -> @ v` with the softmax kept
    in fp32 (the bf16 analog of the reference's ATTN_PRECISION fp32 island,
    attention.py:229-233) — XLA fuses this well for the 77-token and
    <=4096-latent-token shapes of SD-1.5;
  * Pallas blockwise flash-attention kernels (ops/pallas/attention.py)
    for larger latent grids — the principled version of sliced attention.

Projections (to_q/to_k/to_v/to_out) are kept in the model layer; the ops here
consume already-projected q/k/v shaped (B, H, Tq, D) / (B, H, Tk, D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import os

from stablediffusioneo_tpu.ops.layers import matmul2d, mm_precision

# Minimum query-token count for the Pallas kernels. 1024 is the measured
# e2e winner on v5e (round 2: below it XLA keeps everything fused on-chip);
# env-tunable for A/B experiments (SDEO_ATTN_MIN_TQ). Read at call time so
# a monkeypatch.setenv after import still takes effect (traces are cached
# per call site anyway, so the per-call getenv is trace-time only).


def _min_tq() -> int:
    return int(os.environ.get("SDEO_ATTN_MIN_TQ", "1024"))


def _use_flash(q, k, mask) -> bool:
    from stablediffusioneo_tpu.ops.dispatch import kernels_enabled
    from stablediffusioneo_tpu.ops.pallas.attention import fused_attention_supported

    return (
        mask is None
        and q.ndim == 4
        # measured on v5e: the kernel wins once logits would be HBM-sized;
        # below 1024 query tokens XLA keeps everything fused on-chip anyway
        and q.shape[-2] >= _min_tq()
        # NOTE kv is deliberately NOT gated: restricting the kernel to
        # long-KV self-attention (kv >= 1024) measured SLOWER e2e
        # (0.787 vs 0.750 s) — the kernel beats XLA even at kv=77 here
        and kernels_enabled("flash_attention")
        and fused_attention_supported(q.shape, k.shape[-2], q.dtype)
    )


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Scaled dot-product attention with fp32 softmax island.

    q: (..., Tq, D), k/v: (..., Tk, D). mask broadcastable to (..., Tq, Tk),
    additive (use large negative, NOT -inf — the bf16-safe analog of the
    reference's Trilu -inf -> -10000 graph surgery, surgeon_graph.py:18-27).

    Large self-attention (latent tokens >= 1024) dispatches to the Pallas
    flash-attention kernel on TPU — the principled form of the reference's
    sliced-attention/xformers memory paths (cldm/hack.py:72-111,
    attention.py:306-352): no (Tq, Tk) logits materialization in HBM.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    if _use_flash(q, k, mask):
        from stablediffusioneo_tpu.ops.pallas.attention import fused_attention

        return fused_attention(q, k, v, float(scale))
    logits = jnp.einsum(
        "...qd,...kd->...qk",
        q,
        k,
        precision=mm_precision(q.dtype),
        preferred_element_type=jnp.float32,
    )
    logits = logits * jnp.float32(scale)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...qk,...kd->...qd",
        weights.astype(v.dtype),
        v,
        precision=mm_precision(v.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def context_kv(
    context: jax.Array, wk: jax.Array, wv: jax.Array
) -> tuple:
    """Cross-attention K/V projection: (B, Tk, Ck) -> ((B, Tk, inner) x 2).

    One fused matmul against the concatenated weights (same composition the
    in-loop path uses, so hoisted and inline K/V are bit-identical). Samplers
    call this ONCE per context outside the denoise scan — the context is
    step-invariant, so re-projecting it every step (as the reference's
    per-step engines must, cldm_trt/ddim_hacked.py:88-197) is pure waste.
    """
    wkv = jnp.concatenate([wk, wv], axis=1)  # (Ck, 2*inner)
    kv = matmul2d(context, wkv)
    k, v = jnp.split(kv, 2, axis=-1)
    return k, v


def multi_head_attention(
    x: jax.Array,
    context: Optional[jax.Array],
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    bo: Optional[jax.Array],
    num_heads: int,
    mask: Optional[jax.Array] = None,
    kv: Optional[tuple] = None,
) -> jax.Array:
    """Full (cross-)attention block: project, attend, merge heads, out-proj.

    x: (B, Tq, C); context: (B, Tk, Ck) or None for self-attention.
    wq: (C, inner), wk/wv: (Ck, inner), wo: (inner, C). SD's to_q/to_k/to_v
    have no bias; to_out does (ldm/modules/attention.py:159-176).

    For self-attention, q/k/v projections run as one fused matmul against the
    concatenated weights — the TPU-native form of the reference's fused-QKV
    export (export_onnx_attention.py:99-134): one MXU pass instead of three.

    kv: optional precomputed (k, v) from `context_kv` — samplers hoist the
    step-invariant context projection out of the denoise scan.
    """
    b, tq, _ = x.shape
    inner = wq.shape[1]
    head_dim = inner // num_heads

    if kv is not None:
        q = matmul2d(x, wq)
        k, v = kv
        tk = k.shape[1]
    elif context is None:
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # (C, 3*inner)
        qkv = matmul2d(x, wqkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tk = tq
    else:
        q = matmul2d(x, wq)
        k, v = context_kv(context, wk, wv)
        tk = context.shape[1]

    from stablediffusioneo_tpu.ops.dispatch import kernels_enabled
    from stablediffusioneo_tpu.ops.pallas.attention import (
        fused_attention_packed,
        fused_attention_packed_supported,
    )

    if (mask is None
            and tq >= _min_tq()
            and kernels_enabled("flash_attention")
            and fused_attention_packed_supported(
                (b, tq, inner), tk, num_heads, q.dtype)):
        # head-packed kernel: per-head column slicing happens in the kernel's
        # BlockSpecs, so the (B,T,H,D)<->(B,H,T,D) relayouts disappear
        out = fused_attention_packed(q, k, v, num_heads,
                                     scale=head_dim ** -0.5)
    else:
        qh = q.reshape(b, tq, num_heads, head_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(b, tk, num_heads, head_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(b, tk, num_heads, head_dim).transpose(0, 2, 1, 3)
        out = attention(qh, kh, vh, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, inner)
    out = matmul2d(out, wo)
    if bo is not None:
        out = out + bo
    return out
