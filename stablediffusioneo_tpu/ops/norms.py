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
    from stablediffusioneo_tpu.ops.dispatch import kernels_enabled

    if kernels_enabled("groupnorm") and x.ndim == 4:
        from stablediffusioneo_tpu.ops.pallas.groupnorm import (
            fused_group_norm,
            group_norm_pallas_supported,
        )

        if group_norm_pallas_supported(x.shape, x.dtype, groups):
            return fused_group_norm(
                x, gamma, beta, groups=groups, eps=eps, swish=swish
            )
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    xf = x.astype(jnp.float32).reshape(n, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    xhat = xhat.reshape(n, *spatial, c)
    out = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if swish:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype)


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
    """LayerNorm over the last dim, fp32 statistics."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(orig_dtype)
