"""Fused attention Pallas kernel for SD's latent self-attention shapes.

Why not jax's stock flash_attention: SD head dims are 40/80/160 (C/8 at
320/640/1280 channels). The stock kernel needs lane-aligned head dims, and
padding d 40->128 costs 3.2x on both MXU passes — measured SLOWER than
plain XLA attention on v5e (ablation r1: unet 55ms w/ padded-flash vs 37ms
w/ XLA). Plain XLA in turn materializes the fp32 logits in HBM
((2,8,4096,4096) fp32 = 2.1 GB per level-0 block) — that traffic is the
actual cost.

This kernel exploits what's special about the SD shapes: K and V for a
whole (batch*head) slice fit comfortably in VMEM (4096 x 40 bf16 = 320 KB),
so there is no need for online-softmax streaming at all:

  grid = (B*H, Tq/block_q); each step loads one q tile + full K,V,
  computes fp32 logits (block_q, S) IN VMEM, does an exact row softmax
  (keeping the reference's fp32-softmax island, attention.py:229-233),
  and one AV matmul. Logits never touch HBM; head dim stays 40 (it is the
  CONTRACTION dim of QK^T and the minor dim of the small AV output, so no
  128-lane padding happens on the big (block_q, S) tiles).

Supported when S*d and block_q*S fit the VMEM budget (true for SD up to
1024px latents); dispatch in ops/attention.py falls back to XLA otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from stablediffusioneo_tpu.ops.layers import mm_precision

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# v5e physical VMEM is 128M; the compiler's default scoped limit is 16M.
# We raise the kernel's limit via CompilerParams(vmem_limit_bytes) and size
# blocks against our own budget (leaving room for Mosaic double-buffering).
_VMEM_BUDGET = 14 * 1024 * 1024
# Big-S tier: shapes whose K/V slab alone approaches the 14M budget (768^2
# latents: S=9216, C=320 -> 11.8M of K+V) get a second chance under a 20M
# naive working set + the raised scoped limit. Measured on v5e at the
# (B=8, T=S=9216, C=320, H=8) CFG batch-4 768^2 site: packed bq=128 runs
# 46.3 ms vs the per-head split fallback's 76.5 ms (1.65x, bit-identical) —
# and the split path additionally pays two (B,T,C) relayouts per site.
# Shapes that fit the standard budget keep their existing block pick.
_VMEM_BUDGET_BIG = 20 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def _compiler_params(batch: int = 1, head_dim: int = 40, itemsize: int = 2,
                     oversize: bool = False):
    """Raised scoped-vmem limit ONLY where Mosaic's stack accounting can
    overflow the default 16M: batch > 2 (measured OOM at batch 8), a
    head dim outside SD-1.5's {40, 80, 160} (SD-2.x head-channel mode
    d=64 OOMs at compile: 18.57M needed for the (2,1024,640) h=10 site —
    Mosaic's per-head buffer liveness doesn't follow the naive estimate,
    so this is keyed on the measured shape family, not a size model),
    f32 inputs (training-path VJP recompute at 384^2 measured 18.78M for
    the (2,2304,320) f32 site under the 16M default), or an oversize
    (big-S tier) working set that exceeds the standard budget by design.
    The raised limit is not free: unconditionally setting it changed
    Mosaic's scheduling and cost ~40 ms e2e on the batch-1 flagship
    (0.688->0.725 s), so the measured bf16 SD-1.5 shapes keep the
    default."""
    if ((batch > 2 or head_dim not in (40, 80, 160) or itemsize > 2
         or oversize)
            and _HAS_PLTPU and hasattr(pltpu, "CompilerParams")):
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return None


def fused_attention_supported(q_shape, kv_len: int, dtype) -> bool:
    if not _HAS_PLTPU or len(q_shape) != 4:
        return False
    b, h, tq, d = q_shape
    if tq % 128:
        return False
    return _pick_block_q(tq, kv_len, d, jnp.dtype(dtype).itemsize) > 0


def _pick_block_q(tq: int, s: int, d: int, itemsize: int = 2) -> int:
    # per-step VMEM: fp32 logits + dtype exp weights (block_q, S), K+V
    # slabs (S, d) in dtype, q/out tiles negligible. itemsize keeps the
    # accounting honest for f32 inputs (training-path VJP recompute).
    kv_bytes = 2 * s * d * itemsize
    for bq in (512, 256, 128):
        if tq % bq:
            continue
        if bq * s * (4 + itemsize) + kv_bytes <= _VMEM_BUDGET:
            return bq
    return 0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (bq, d) — scale pre-applied by the caller (fuses into
    # the projection epilogue; a scalar mul here would cost a full VPU pass
    # over the (bq, S) logits tile instead of (bq, d))
    k = k_ref[0]  # (S, d)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, S) fp32, lives in VMEM only
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # normalize AFTER the AV matmul: the divide runs over (bq, d) instead
    # of (bq, S) — one less VPU pass over the big logits tile (S/d ~ 100x
    # fewer divides), numerically identical up to fp rounding
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, heads: int):
    """One q tile, ALL heads: q (1, bq, C), k/v (1, S, C). The head loop is
    unrolled in-kernel over 40/80/160-wide column slices — the packed (B, T,
    C) layout never leaves the kernel, so no (B,T,H,D)<->(B,H,T,D) relayout
    ever materializes in HBM."""
    q = q_ref[0]  # (bq, C) — scale pre-applied by the caller
    k = k_ref[0]  # (S, C)
    v = v_ref[0]
    d = q.shape[-1] // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, S) fp32 in VMEM
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.dot(p.astype(v.dtype), v[:, sl],
                      preferred_element_type=jnp.float32)
        outs.append((acc / denom).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _attn_kernel_packed_stream(q_ref, k_ref, v_ref, o_ref,
                               acc_ref, m_ref, l_ref, *, heads: int):
    """K-blocked online-softmax (flash) form of the packed kernel, for
    self-attention whose full K/V slab cannot live in VMEM (1024² hires:
    S=16384, C=320 → 21M of K+V). Grid (B, Tq/bq, S/bk) with the K dim
    innermost; the classic flash recurrence carries per-head running
    (rowmax m, denom l) and the unnormalized accumulator across K blocks
    in VMEM scratch. Heads stay unrolled over column slices exactly like
    _attn_kernel_packed, so the (B, T, C) layout never leaves the kernel.
    Same fp32-softmax island; normalization happens once at the last K
    block (divide over (bq, C), not per block)."""
    jk = pl.program_id(2)
    nk = pl.num_programs(2)
    q = q_ref[0]  # (bq, C) — scale pre-applied by the caller
    k = k_ref[0]  # (bk, C)
    v = v_ref[0]
    c = q.shape[-1]
    d = c // heads

    @pl.when(jk == 0)
    def _init():
        # -1e30, not -inf: a fresh row does exp(m_old - m_new) and
        # -inf - finite = -inf is fine, but -inf - (-inf) = nan would
        # poison the accumulator if a block's logits ever hit -inf.
        m_ref[...] = jnp.full_like(m_ref[...], -1e30)
        l_ref[...] = jnp.zeros_like(l_ref[...])
        acc_ref[...] = jnp.zeros_like(acc_ref[...])

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk) fp32 in VMEM
        m_old = m_ref[h]                                   # (bq,)
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m_old - m_new)                     # (bq,)
        p = jnp.exp(logits - m_new[:, None])
        m_ref[h] = m_new
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=-1)
        pv = jnp.dot(p.astype(v.dtype), v[:, sl],
                     preferred_element_type=jnp.float32)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha[:, None] + pv

    @pl.when(jk == nk - 1)
    def _finish():
        outs = [
            (acc_ref[:, h * d:(h + 1) * d] / l_ref[h][:, None])
            for h in range(heads)
        ]
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _pick_block_q_packed(tq: int, s: int, c: int, batch: int = 1,
                         itemsize: int = 2) -> int:
    # K+V slabs are full-C here; logits/p buffers are per-head (bq, S).
    # Block sizing targets the 14M working-set budget — measured FASTER
    # than maximizing block size (bq=512 at the 4096-token self-attn shape
    # benched 0.770 s e2e vs 0.683 s at bq=256). Mosaic double-buffering
    # can exceed the naive accounting (OOM at batch 8 under the default
    # 16M scoped limit); the raised vmem_limit_bytes absorbs that.
    # itemsize keeps the accounting honest for f32 (training VJP) inputs.
    # Two budget tiers: shapes that fit the standard 14M budget keep their
    # existing pick; shapes that fit NO block under it (the 768^2 S=9216
    # family, where the K/V slab alone is 11.8M) retry under the big tier,
    # whose callers raise the scoped vmem limit (see _compiler_params).
    kv_bytes = 2 * s * c * itemsize
    # The big tier is bf16-only: it exists for the measured 768^2 inference
    # shape; f32 (training VJP recompute) keeps its round-3 behavior (split
    # fallback) rather than silently switching kernels on an unmeasured path.
    tiers = ((_VMEM_BUDGET, _VMEM_BUDGET_BIG) if itemsize == 2
             else (_VMEM_BUDGET,))
    for budget in tiers:
        for bq in (512, 256, 128):
            if tq % bq:
                continue
            # bq=512 only at small logits tiles: Mosaic's real stack exceeds
            # this naive model ~2.6x on the logits term — measured 24.71M
            # (OOM over the 20.5M scoped limit) at (bq=512, s=2048, c=320),
            # the ToMe-merged 512² shape, while the production
            # (bq=512, s=1024, c=640) site compiles and runs. The cap keeps
            # the latter and rejects the former; larger shapes fall to 256
            # (which also measured FASTER at s=4096: 0.683 vs 0.770 s e2e;
            # and at the big-tier S=9216 shape bq=128 measured faster than
            # bq=256: 46.3 vs 48.3 ms).
            if bq == 512 and bq * s * (4 + itemsize) > 3_500_000:
                continue
            if (bq * s * (4 + itemsize) + kv_bytes
                    + 2 * bq * c * itemsize <= budget):
                return bq
    return 0


def _packed_working_set(bq: int, s: int, c: int, itemsize: int) -> int:
    """Naive per-step VMEM accounting for the packed kernel (logits + exp
    weights tile, K+V slabs, q/out tiles) — the quantity the budget tiers
    in _pick_block_q_packed gate on."""
    return bq * s * (4 + itemsize) + 2 * s * c * itemsize \
        + 2 * bq * c * itemsize


def _pick_blocks_stream(tq: int, s: int, c: int, itemsize: int):
    """(bq, bk) for the K-blocked streaming kernel, or None.

    The streaming kernel exists for shapes whose FULL K/V slab cannot live
    in VMEM at all (1024² hires: S=16384, C=320 → 21M of K+V; Mosaic needs
    a >100M scoped limit for the full-slab kernel there, nearly all of the
    chip's 128M). bf16-only: the f32 path (training VJP recompute) never
    reaches these token counts in practice and stays on the XLA fallback.
    Block choice is measured on v5e at (B=2, T=S=16384, C=320, H=8) — see
    docs/xplane_768.md round-4 addendum. Sweep (ms/call): (256,4096) 50.0,
    (512,2048) 50.0, (128,2048) 51.7, (256,2048) 52.5, (512,4096) 52.5,
    (512,1024) 56.8, (256,1024) 64.9. Of the two winners, (512,2048)'s
    Mosaic stack fits standalone but OOMs inside the full e2e program
    (22.86M vs a 20.5M scoped limit — its 12.8M naive estimate stays
    under the 14M threshold, so the raised limit never kicks in);
    (256,4096)'s 17.5M estimate exceeds the threshold, so its call sites
    always carry the raised 64M limit and it compiles everywhere —
    that's the pick."""
    if itemsize != 2:
        return None
    for bq in (256, 512, 128):
        if tq % bq:
            continue
        for bk in (4096, 2048, 1024, 512):
            if s % bk == 0:
                return bq, bk
    return None


def fused_attention_packed_supported(q_shape, kv_len: int, heads: int,
                                     dtype) -> bool:
    if not _HAS_PLTPU or len(q_shape) != 3:
        return False
    b, tq, c = q_shape
    if tq % 128 or c % heads:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if _pick_block_q_packed(tq, kv_len, c, b, itemsize) > 0:
        return True
    # self-attention beyond full-K/V-in-VMEM capacity: streaming kernel
    return (tq == kv_len
            and _pick_blocks_stream(tq, kv_len, c, itemsize) is not None)


def fused_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float,
    interpret: Optional[bool] = None,
    spmd: Optional[bool] = None,
) -> jax.Array:
    """Head-packed layout: q (B, Tq, H*D), k/v (B, Tk, H*D) -> (B, Tq, H*D).

    Heads are sliced INSIDE the kernel (full-C blocks; TPU lowering needs
    128-aligned or full-width lane dims, and D=40 is neither), so the
    caller never transposes the activations: the two relayouts of the full
    (B, T, C) tensor around every attention site measured ~170 us each
    (xplane round 2) and vanish here. Bonus: K/V slabs load once per q tile
    for ALL heads instead of once per (head, q tile).

    Differentiable: reverse-mode uses a custom VJP whose backward is the
    gradient of the mathematically-identical XLA attention (recompute
    form) — the Pallas forward has no native autodiff rule, and without
    this, training at >=1024 latent tokens fails to trace.

    spmd (None = dispatch flag/scope): lower via custom_partitioning so
    GSPMD/shardy shard the kernel over a mesh — batch stays dp-sharded,
    heads tp-sharded (per-shard head slice), query tokens sp-shardable;
    K/V sequence is gathered (replicated) per the attention math. Resolved
    at TRACE time; mesh engines enable it via spmd_attention_scope."""
    from stablediffusioneo_tpu.ops.dispatch import (
        pallas_interpret_default,
        spmd_partitioning_enabled,
    )

    if interpret is None:
        interpret = pallas_interpret_default()
    if spmd is None:
        spmd = spmd_partitioning_enabled()
    return _packed_vjp(q, k, v, heads, float(scale), bool(interpret),
                       bool(spmd))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _packed_vjp(q, k, v, heads, scale, interpret, spmd):
    return _packed_call(q, k, v, heads, scale, interpret, spmd)


# KV lengths up to this use the plain one-shot XLA backward; beyond it the
# chunked (flash-style) backward below keeps peak memory at
# O(Tq * chunk) instead of O(Tq * Tk) — at SD 512^2 (Tq=Tk=4096) the
# one-shot form's 4096^2 fp32 logits buffers crash the TPU compiler.
_BWD_CHUNK_THRESHOLD = 1024
_BWD_CHUNK = 512


def _attn_bwd_chunked(q, k, v, out, g, scale):
    """Memory-efficient attention backward on (B, H, T, D) tensors.

    Recomputes softmax statistics with a running logsumexp over KV chunks
    (the flash-attention backward recurrence), then accumulates
    dQ across chunks and emits per-chunk dK/dV — no (Tq, Tk) buffer is
    ever materialized. Matmuls run in the input dtype with fp32
    accumulation, matching the forward kernel's precision layout.
    """
    bh_dtype = q.dtype
    s = k.shape[2]
    nc = s // _BWD_CHUNK
    assert s % _BWD_CHUNK == 0
    b, h, tq, d = q.shape
    qs = q * jnp.asarray(scale, q.dtype)          # S = qs @ k^T (as in fwd)
    kc = k.reshape(b, h, nc, _BWD_CHUNK, d)
    vc = v.reshape(b, h, nc, _BWD_CHUNK, d)
    prec = mm_precision(q.dtype)

    def s_block(j):
        return jnp.einsum("bhqd,bhkd->bhqk", qs, kc[:, :, j],
                          precision=prec, preferred_element_type=jnp.float32)

    # pass 1: running (rowmax, sumexp) over chunks
    def stats_step(carry, j):
        m_run, l_run = carry
        sj = s_block(j)
        m_new = jnp.maximum(m_run, sj.max(axis=-1))
        l_run = l_run * jnp.exp(m_run - m_new) + jnp.exp(
            sj - m_new[..., None]).sum(axis=-1)
        return (m_new, l_run), None

    m0 = jnp.full((b, h, tq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, tq), jnp.float32)
    (m, l), _ = jax.lax.scan(stats_step, (m0, l0), jnp.arange(nc))

    # D_i = sum_d dO*O (rowwise), fp32
    dD = jnp.einsum("bhqd,bhqd->bhq", g.astype(jnp.float32),
                    out.astype(jnp.float32))

    # pass 2: dq accumulation + per-chunk dk/dv
    def grad_step(dq_acc, j):
        sj = s_block(j)
        pj = jnp.exp(sj - m[..., None]) / l[..., None]          # fp32
        pj_c = pj.astype(bh_dtype)
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", pj_c, g,
                          precision=prec,
                          preferred_element_type=jnp.float32)
        dp_j = jnp.einsum("bhqd,bhkd->bhqk", g, vc[:, :, j],
                          precision=prec,
                          preferred_element_type=jnp.float32)
        ds_j = (pj * (dp_j - dD[..., None])).astype(bh_dtype)
        dq_acc = dq_acc + jnp.einsum(
            "bhqk,bhkd->bhqd", ds_j, kc[:, :, j], precision=prec,
            preferred_element_type=jnp.float32)
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds_j, qs, precision=prec,
                          preferred_element_type=jnp.float32)
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((b, h, tq, d), jnp.float32)
    dqs, (dk_c, dv_c) = jax.lax.scan(grad_step, dq0, jnp.arange(nc))
    dq = (dqs * scale).astype(q.dtype)            # d/dq of qs = q*scale
    dk = jnp.moveaxis(dk_c, 0, 2).reshape(b, h, s, d).astype(k.dtype)
    dv = jnp.moveaxis(dv_c, 0, 2).reshape(b, h, s, d).astype(v.dtype)
    return dq, dk, dv


def _packed_math(q, k, v, heads, scale):
    """XLA reference of the packed kernel's math (same composition: scale
    applied to q in its own dtype, fp32 logits/softmax, dtype-out)."""
    b, tq, c = q.shape
    s = k.shape[1]
    d = c // heads
    qs = (q * jnp.asarray(scale, q.dtype)).reshape(b, tq, heads, d)
    kh = k.reshape(b, s, heads, d)
    vh = v.reshape(b, s, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qs, kh,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, tq, c)


def _packed_fwd(q, k, v, heads, scale, interpret, spmd):
    out = _packed_call(q, k, v, heads, scale, interpret, spmd)
    return out, (q, k, v, out)


def _split_heads(x, heads):
    b, t, c = x.shape
    return x.reshape(b, t, heads, c // heads).transpose(0, 2, 1, 3)


def _packed_bwd(heads, scale, interpret, spmd, res, g):
    # backward is XLA math (recompute form) — GSPMD partitions it natively,
    # so the spmd flag only affects the forward lowering
    q, k, v, out = res
    s = k.shape[1]
    if s > _BWD_CHUNK_THRESHOLD and s % _BWD_CHUNK == 0:
        dq, dk, dv = _attn_bwd_chunked(
            _split_heads(q, heads), _split_heads(k, heads),
            _split_heads(v, heads), _split_heads(out, heads),
            _split_heads(g, heads), scale)
        merge = lambda x: x.transpose(0, 2, 1, 3).reshape(q.shape[0], -1,
                                                          q.shape[2])
        return merge(dq), merge(dk), merge(dv)
    _, vjp = jax.vjp(lambda a, b_, c_: _packed_math(a, b_, c_, heads, scale),
                     q, k, v)
    return vjp(g)


_packed_vjp.defvjp(_packed_fwd, _packed_bwd)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret", "spmd"))
def _packed_call(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float,
    interpret: bool = False,
    spmd: bool = False,
) -> jax.Array:
    # spmd is STATIC (part of every jit cache key on the path down), so a
    # mesh-engine trace and a single-chip trace can never alias.
    if spmd:
        return _packed_part(q, k, v, heads, scale, interpret)
    return _packed_impl(q, k, v, heads, scale, interpret)


# ------------------------------------------------------ SPMD partitioning
#
# pl.pallas_call lowers to an opaque custom call: without a partitioning
# rule, GSPMD/shardy must fully replicate its operands — on a real
# multi-chip mesh that all-gathers q/k/v (undoing the Megatron TP sharding
# of the qkv projections, parallel/mesh.py) and replicates the attention
# FLOPs on every chip. custom_partitioning teaches the partitioner the
# kernel's algebra instead:
#
#   batch        -> shardable (dp): q tiles are independent per image
#   query tokens -> shardable (sp): the grid is independent per q tile
#   channels     -> shardable at head granularity (tp): the kernel slices
#                   heads by column, so a c-shard IS a head-slice — each
#                   device runs the same kernel with heads/n_tp heads
#   K/V sequence -> replicated: every q row attends over all of K
#
# The partition callback degrades unsupported suggestions (head-indivisible
# c shards, <128-token q tiles) back to replicated rather than failing, so
# any mesh layout compiles; the sharding_rule drives shardy propagation and
# the callbacks drive the GSPMD lowering.


def _nshards(mesh, entry) -> int:
    if entry is None:
        return 1
    names = entry if isinstance(entry, tuple) else (entry,)
    n = 1
    for nm in names:
        n *= mesh.shape[nm]
    return n


def _norm_spec(sharding, ndim):
    spec = list(getattr(sharding, "spec", None) or ())
    spec += [None] * (ndim - len(spec))
    return spec[:ndim]


def _packed_rule(heads, scale, interpret, mesh, value_types, result_types):
    del scale, interpret, mesh, result_types
    c = value_types[0].shape[-1]
    # need_replication order matters: shardy requires special factors
    # sorted by factor index (first appearance: b, tq, h, d, s)
    return ("b tq (h d), b s (h d), b s (h d) -> b tq (h d)",
            {"need_replication_factors": ("d", "s"),
             "h": heads, "d": c // heads})


def _packed_partition(heads, scale, interpret, mesh, arg_shapes,
                      result_shape):
    del result_shape
    q_a, k_a, _ = arg_shapes
    b, tq, c = q_a.shape
    s = k_a.shape[1]
    itemsize = jnp.dtype(q_a.dtype).itemsize
    spec = _norm_spec(q_a.sharding, 3)

    def shard_ok(sp):
        nb, ntq, nc = (_nshards(mesh, sp[0]), _nshards(mesh, sp[1]),
                       _nshards(mesh, sp[2]))
        if b % nb or tq % ntq or c % nc or heads % nc:
            return False
        ltq, lc, lh = tq // ntq, c // nc, heads // nc
        if ltq % 128 or lc % lh:
            return False
        if _pick_block_q_packed(ltq, s, lc, b // nb, itemsize) > 0:
            return True
        return (ltq == s
                and _pick_blocks_stream(ltq, s, lc, itemsize) is not None)

    # degrade toward replicated until the PER-SHARD shape is supported;
    # the all-replicated candidate equals the global shape, which the
    # dispatch layer already vetted via fused_attention_packed_supported
    for cand in (spec,
                 [spec[0], None, spec[2]],
                 [spec[0], spec[1], None],
                 [spec[0], None, None],
                 [None, None, None]):
        if shard_ok(cand):
            spec = cand
            break
    else:
        raise ValueError(
            f"packed attention unsupported even replicated: "
            f"q {(b, tq, c)} x kv_len {s}, heads={heads}")

    lheads = heads // _nshards(mesh, spec[2])
    q_sh = NamedSharding(mesh, P(*spec))
    kv_sh = NamedSharding(mesh, P(spec[0], None, spec[2]))

    def lower_fn(q, k, v):
        return _packed_impl(q, k, v, lheads, scale, interpret)

    return mesh, lower_fn, q_sh, (q_sh, kv_sh, kv_sh)


def _packed_infer(heads, scale, interpret, mesh, arg_shapes, result_shape):
    del heads, scale, interpret, result_shape
    return NamedSharding(mesh, P(*_norm_spec(arg_shapes[0].sharding, 3)))


@functools.partial(custom_partitioning, static_argnums=(3, 4, 5))
def _packed_part(q, k, v, heads, scale, interpret):
    return _packed_impl(q, k, v, heads, scale, interpret)


_packed_part.def_partition(
    partition=_packed_partition,
    infer_sharding_from_operands=_packed_infer,
    sharding_rule=_packed_rule,
)


def _packed_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    b, tq, c = q.shape
    s = k.shape[1]
    itemsize = jnp.dtype(q.dtype).itemsize
    bq = _pick_block_q_packed(tq, s, c, b, itemsize)
    if bq <= 0:
        blocks = _pick_blocks_stream(tq, s, c, itemsize)
        assert tq == s and blocks is not None, (
            f"unsupported packed attention shape {q.shape} x {k.shape}")
        return _packed_stream_call(q, k, v, heads, scale, blocks, interpret)
    # d=160 long-S self-attention (1024² hires level-2: bq=512, s=1024,
    # c=1280, h=8) measured a Mosaic stack of 18.38M vs this naive
    # model's 11.0M — per-head fp32 staging at d=160 breaks the model,
    # so the family joins the measured raised-limit keys. It only exists
    # at >=1024² images (at 512²/768² the d=160 levels sit under the
    # kernel's 1024-token dispatch gate), so no measured config changes.
    oversize = (_packed_working_set(bq, s, c, itemsize) > _VMEM_BUDGET
                or (c // heads == 160 and s >= 1024))
    q = q * jnp.asarray(scale, q.dtype)

    def spec(block, index_map):
        if _HAS_PLTPU:
            return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, index_map)

    return pl.pallas_call(
        functools.partial(_attn_kernel_packed, heads=heads),
        grid=(b, tq // bq),
        compiler_params=(None if interpret
                         else _compiler_params(b, c // heads, itemsize,
                                               oversize)),
        in_specs=[
            spec((1, bq, c), lambda bi, j: (bi, j, 0)),
            spec((1, s, c), lambda bi, j: (bi, 0, 0)),
            spec((1, s, c), lambda bi, j: (bi, 0, 0)),
        ],
        out_specs=spec((1, bq, c), lambda bi, j: (bi, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tq, c), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _packed_stream_call(q, k, v, heads, scale, blocks, interpret=False):
    b, tq, c = q.shape
    s = k.shape[1]
    bq, bk = blocks
    q = q * jnp.asarray(scale, q.dtype)

    def spec(block, index_map):
        if _HAS_PLTPU:
            return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, index_map)

    assert _HAS_PLTPU  # the pickers never select streaming without pltpu
    scratch = [
        pltpu.VMEM((bq, c), jnp.float32),       # unnormalized acc
        pltpu.VMEM((heads, bq), jnp.float32),   # running rowmax
        pltpu.VMEM((heads, bq), jnp.float32),   # running denom
    ]
    itemsize = jnp.dtype(q.dtype).itemsize
    # per-step naive working set: per-head logits+p tile, double-buffered
    # K/V blocks, q/out tiles, fp32 acc scratch
    ws = (bq * bk * (4 + itemsize) + 4 * bk * c * itemsize
          + 2 * bq * c * itemsize + 4 * bq * c)
    params = pltpu.CompilerParams(
        # B and q-tile dims are embarrassingly parallel; the flash
        # carry lives along the innermost (K) dim only.
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=(_VMEM_LIMIT if ws > _VMEM_BUDGET else None),
    )

    return pl.pallas_call(
        functools.partial(_attn_kernel_packed_stream, heads=heads),
        grid=(b, tq // bq, s // bk),
        compiler_params=None if interpret else params,
        in_specs=[
            spec((1, bq, c), lambda bi, jq, jk: (bi, jq, 0)),
            spec((1, bk, c), lambda bi, jq, jk: (bi, jk, 0)),
            spec((1, bk, c), lambda bi, jq, jk: (bi, jk, 0)),
        ],
        out_specs=spec((1, bq, c), lambda bi, jq, jk: (bi, jq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tq, c), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    interpret: Optional[bool] = None,
    spmd: Optional[bool] = None,
) -> jax.Array:
    """q: (B, H, Tq, d), k/v: (B, H, S, d) -> (B, H, Tq, d). No mask
    (SD latent self-attention is unmasked). Differentiable via a custom
    VJP (XLA-recompute backward, see fused_attention_packed). spmd: see
    fused_attention_packed — here batch and heads shard directly (dp/tp),
    query tokens shard (sp), K/V sequence + head dim replicate."""
    from stablediffusioneo_tpu.ops.dispatch import (
        pallas_interpret_default,
        spmd_partitioning_enabled,
    )

    if interpret is None:
        interpret = pallas_interpret_default()
    if spmd is None:
        spmd = spmd_partitioning_enabled()
    return _split_vjp(q, k, v, float(scale), bool(interpret), bool(spmd))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _split_vjp(q, k, v, scale, interpret, spmd):
    return _split_call(q, k, v, scale, interpret, spmd)


def _split_math(q, k, v, scale):
    qs = q * jnp.asarray(scale, q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qs, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _split_fwd(q, k, v, scale, interpret, spmd):
    out = _split_call(q, k, v, scale, interpret, spmd)
    return out, (q, k, v, out)


def _split_bwd(scale, interpret, spmd, res, g):
    q, k, v, out = res
    s = k.shape[2]
    if s > _BWD_CHUNK_THRESHOLD and s % _BWD_CHUNK == 0:
        return _attn_bwd_chunked(q, k, v, out, g, scale)
    _, vjp = jax.vjp(lambda a, b_, c_: _split_math(a, b_, c_, scale),
                     q, k, v)
    return vjp(g)


_split_vjp.defvjp(_split_fwd, _split_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "spmd"))
def _split_call(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    interpret: bool = False,
    spmd: bool = False,
) -> jax.Array:
    if spmd:
        return _split_part(q, k, v, scale, interpret)
    return _split_impl(q, k, v, scale, interpret)


def _split_rule(scale, interpret, mesh, value_types, result_types):
    del scale, interpret, mesh, value_types, result_types
    # sorted by factor index: d first appears before s (see _packed_rule)
    return ("b h tq d, b h s d, b h s d -> b h tq d",
            {"need_replication_factors": ("d", "s")})


def _split_partition(scale, interpret, mesh, arg_shapes, result_shape):
    del result_shape
    q_a, k_a, _ = arg_shapes
    b, h, tq, d = q_a.shape
    s = k_a.shape[2]
    itemsize = jnp.dtype(q_a.dtype).itemsize
    spec = _norm_spec(q_a.sharding, 4)
    spec[3] = None  # head dim is the QK^T contraction: never sharded

    def shard_ok(sp):
        nb, nh, ntq = (_nshards(mesh, sp[0]), _nshards(mesh, sp[1]),
                       _nshards(mesh, sp[2]))
        if b % nb or h % nh or tq % ntq or (tq // ntq) % 128:
            return False
        return _pick_block_q(tq // ntq, s, d, itemsize) > 0

    for cand in (spec,
                 [spec[0], spec[1], None, None],
                 [None, None, None, None]):
        if shard_ok(cand):
            spec = cand
            break
    else:
        raise ValueError(
            f"split attention unsupported even replicated: "
            f"q {(b, h, tq, d)} x kv_len {s}")

    q_sh = NamedSharding(mesh, P(*spec))
    kv_sh = NamedSharding(mesh, P(spec[0], spec[1], None, None))

    def lower_fn(q, k, v):
        return _split_impl(q, k, v, scale, interpret)

    return mesh, lower_fn, q_sh, (q_sh, kv_sh, kv_sh)


def _split_infer(scale, interpret, mesh, arg_shapes, result_shape):
    del scale, interpret, result_shape
    return NamedSharding(mesh, P(*_norm_spec(arg_shapes[0].sharding, 4)))


@functools.partial(custom_partitioning, static_argnums=(3, 4))
def _split_part(q, k, v, scale, interpret):
    return _split_impl(q, k, v, scale, interpret)


_split_part.def_partition(
    partition=_split_partition,
    infer_sharding_from_operands=_split_infer,
    sharding_rule=_split_rule,
)


def _split_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    b, h, tq, d = q.shape
    s = k.shape[2]
    itemsize = jnp.dtype(q.dtype).itemsize
    bq = _pick_block_q(tq, s, d, itemsize)
    assert bq > 0, f"unsupported attention shape {q.shape} x {k.shape}"
    bh = b * h
    # scale q up front (bf16 q values ~O(1), scale ~1/sqrt(d): no range risk)
    q3 = (q * jnp.asarray(scale, q.dtype)).reshape(bh, tq, d)
    k3 = k.reshape(bh, s, d)
    v3 = v.reshape(bh, s, d)

    def spec(block, index_map):
        if _HAS_PLTPU:
            return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, index_map)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(bh, tq // bq),
        compiler_params=(None if interpret
                         else _compiler_params(b, d, itemsize)),
        in_specs=[
            spec((1, bq, d), lambda i, j: (i, j, 0)),
            spec((1, s, d), lambda i, j: (i, 0, 0)),
            spec((1, s, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=spec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, tq, d)
