"""Normalization ops (NHWC, channels-last — the TPU-native layout).

GroupNorm(+optional SiLU) replaces the reference's fused CUDA TRT plugin
(plugin/groupNormPlugin/groupNormKernel.cu:50-266): there the fusion was a
two-kernel NHWC fp16 block-scan; on TPU the statistics are a single fused
reduction that XLA keeps on-chip, with an optional Pallas kernel
(ops/pallas/groupnorm.py) for the fully-fused one-pass version.

Statistics are always computed in fp32 regardless of activation dtype — the
bf16 analog of the reference's fp16-safety measures (fp32 softmax island
ldm/modules/attention.py:229-233, mask clamping surgeon_graph.py:18-27).

Note GroupNorm eps differs between subsystems in SD-1.5: UNet uses 1e-5
(ldm/modules/diffusionmodules/util.py GroupNorm32 default) while the VAE
uses 1e-6 (ldm/modules/diffusionmodules/model.py:46-47).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
    swish: bool = False,
) -> jax.Array:
    """GroupNorm over NHWC (or N...C) input. gamma/beta shape (C,).

    Reduces over all spatial dims and the within-group channel dim, in fp32.
    Dispatches to the fused Pallas kernel on TPU when the slab fits VMEM
    (ops/pallas/groupnorm.py); this XLA path is the reference/fallback.
    """
    from stablediffusioneo_tpu.ops.dispatch import (
        kernels_enabled,
        pallas_interpret_default,
    )

    if kernels_enabled("groupnorm") and x.ndim == 4:
        from stablediffusioneo_tpu.ops.pallas.groupnorm import (
            fused_group_norm,
            group_norm_pallas_supported,
        )

        if group_norm_pallas_supported(x.shape, x.dtype, groups):
            # interpret follows SDEO_PALLAS_INTERPRET so the kernel runs on
            # non-TPU backends (kernels_enabled admits them in that mode)
            return fused_group_norm(
                x, gamma, beta, groups=groups, eps=eps, swish=swish,
                interpret=pallas_interpret_default(),
            )
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    cg = c // groups
    if orig_dtype == jnp.float32:
        # exact two-pass fp32 form: bit-stable vs the torch reference
        # (the e2e integration parity runs 20 chaotic CFG steps in fp32 —
        # any stats reassociation diverges it)
        xf = x.reshape(n, -1, groups, cg)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
        xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
        out = xhat.reshape(n, *spatial, c) * gamma + beta
        if swish:
            out = out * jax.nn.sigmoid(out)
        return out
    xg = x.reshape(n, -1, groups, cg)
    cnt = xg.shape[1] * cg
    # One-pass stats with fp32 ACCUMULATION over the low-precision tensor
    # (fuses to a single convert+reduce over the producer's bf16 output).
    # Crucially the producer (usually a conv) is consumed at its own dtype:
    # with the old astype(f32)-then-normalize form, XLA materialized every
    # conv-feeding-a-norm in fp32 — 2x the HBM write+read bytes (measured:
    # f32[...] conv fusions in the 512x512 xplane profile, ~12 ms/step).
    # square in the input dtype, accumulate in fp32. NOTE four alternatives
    # measured SLOWER e2e (ledger in docs/performance.md):
    # astype(f32)-then-square (XLA CSEs the convert and materializes f32),
    # MXU-dot stats via einsum (0.742 s — operand relayouts), and two
    # optimization_barrier variants meant to stop the square+convert
    # producer-fusing into the upstream conv (0.777/0.791 s). XLA's dual
    # (f32, bf16) conv outputs look wasteful in the HLO but beat every
    # attempt to force a single bf16 materialization: the x^2 write hides
    # in the conv's compute, while a separate stats pass costs a
    # serialized full re-read. Closed as NOT headroom.
    s1 = jnp.sum(xg, axis=(1, 3), dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(xg), axis=(1, 3), dtype=jnp.float32)
    mean = s1 / cnt                        # (n, groups) fp32
    var = s2 / cnt - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    # fold gamma/beta into per-(sample, channel) scale/shift so the
    # normalize is one fused multiply-add over the bf16 input
    g2 = gamma.astype(jnp.float32).reshape(groups, cg)
    b2 = beta.astype(jnp.float32).reshape(groups, cg)
    scale = (rstd[:, :, None] * g2[None]).reshape(n, c)
    shift = (b2[None] - (mean * rstd)[:, :, None] * g2[None]).reshape(n, c)
    bshape = (n,) + (1,) * len(spatial) + (c,)
    # scale/shift computed in fp32 then cast to the activation dtype, so the
    # normalize is a pure orig-dtype FMA (no fp32 view of x that XLA could
    # CSE with the stats convert and re-materialize)
    out = (x * scale.reshape(bshape).astype(orig_dtype)
           + shift.reshape(bshape).astype(orig_dtype))
    if swish:
        out = out * jax.nn.sigmoid(out)
    return out


def group_norm_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """Fused GroupNorm+SiLU — the TRT `GroupNorm(bSwish=1)` plugin equivalent."""
    return group_norm(x, gamma, beta, groups=groups, eps=eps, swish=True)


def layer_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the last dim, fp32 statistics.

    Same bandwidth discipline as group_norm: one-pass fp32-accumulated
    stats over the input at its own dtype, then an orig-dtype FMA with the
    per-row scale/shift — no fp32 materialization of x.

    An opt-in fused Pallas kernel exists for big bf16 sites
    (ops/pallas/layernorm.py, SDEO_FORCE_LN_PALLAS=1) but is OFF by
    default: the r5 same-session SDXL A/B measured it ~260 ms/image
    slower e2e — the custom-call fusion barrier costs more than the
    stats re-read it saves (docs/performance.md ledger)."""
    from stablediffusioneo_tpu.ops.dispatch import (
        kernels_enabled,
        pallas_interpret_default,
        spmd_partitioning_enabled,
    )

    # spmd gate: the LN pallas_call has no partitioning rule yet, so inside
    # a mesh-engine trace GSPMD would have to replicate its operands
    # (all-gathering dp/sp-sharded activations); mesh engines keep the XLA
    # form, which GSPMD partitions natively.
    if kernels_enabled("layernorm") and not spmd_partitioning_enabled():
        from stablediffusioneo_tpu.ops.pallas.layernorm import (
            fused_layer_norm,
            layer_norm_pallas_supported,
        )

        if layer_norm_pallas_supported(x.shape, x.dtype):
            return fused_layer_norm(
                x, gamma, beta, eps=eps,
                interpret=pallas_interpret_default(),
            )
    orig_dtype = x.dtype
    c = x.shape[-1]
    if orig_dtype == jnp.float32:
        # exact two-pass form (see group_norm)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    s1 = jnp.sum(x, axis=-1, keepdims=True, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True, dtype=jnp.float32)
    mean = s1 / c
    var = s2 / c - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    scale = (rstd * gamma.astype(jnp.float32)).astype(orig_dtype)
    shift = (beta.astype(jnp.float32) - mean * rstd * gamma.astype(jnp.float32)
             ).astype(orig_dtype)
    return x * scale + shift
