"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Replaces the reference's TensorRT CUDA plugin (two-kernel NHWC fp16
block-scan + normalize, plugin/groupNormPlugin/groupNormKernel.cu:50-266)
with a TPU-shaped redesign (SURVEY §7 "Pallas GroupNorm"):

  * one kernel, one grid step per batch element: the whole (H*W, C) slab
    lives in VMEM, so x is read from HBM exactly once and written once —
    2/3 of the CUDA plugin's traffic (which reads x twice);
  * statistics are fp32 and computed on the MXU: per-channel Σx/Σx² via a
    ones-vector matmul reduction, then channel→group aggregation via a
    static 0/1 group-membership matrix (C, G). This sidesteps the
    lane-misaligned (C,)→(G, C/G) reshape that a naive port would hit
    (C/G = 10/20/40 for SD's 320/640/1280 channels, none lane-aligned);
  * group→channel broadcast is the transposed matmul, then one fused
    normalize·γ+β·SiLU VPU pass.

Shapes that don't fit the VMEM budget (large VAE slabs) fall back to the
XLA implementation (ops/norms.py) — chunked two-phase kernel is a later
optimization. Dispatch happens in ops/norms.group_norm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# VMEM working-set budget per grid step: in-bf16 + out-bf16 + fp32 temps.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def group_norm_pallas_supported(shape, dtype, groups: int) -> bool:
    """True if the single-pass kernel can run this (N,H,W,C) input."""
    if not _HAS_PLTPU or len(shape) != 4:
        return False
    n, h, w, c = shape
    if c % groups or c % 8:
        return False
    elem = np.dtype(dtype).itemsize
    # x block + out block + fp32 temp
    working = h * w * c * (2 * elem + 4)
    return working <= _VMEM_BUDGET_BYTES


def _gn_kernel(x_ref, g_ref, b_ref, m_ref, o_ref, *, eps: float, swish: bool,
               inv_count: float):
    xf = x_ref[0].astype(jnp.float32)  # (HW, C)
    ones = jnp.ones((1, xf.shape[0]), jnp.float32)
    s = jnp.dot(ones, xf, preferred_element_type=jnp.float32)  # (1, C)
    ss = jnp.dot(ones, xf * xf, preferred_element_type=jnp.float32)
    m = m_ref[:]  # (C, G) 0/1 membership
    gs = jnp.dot(s, m, preferred_element_type=jnp.float32)  # (1, G)
    gss = jnp.dot(ss, m, preferred_element_type=jnp.float32)
    mean_g = gs * inv_count
    var_g = gss * inv_count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: (1,G) @ (G,C) == dot with M^T
    mean_c = jax.lax.dot_general(
        mean_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, C)
    rstd_c = jax.lax.dot_general(
        rstd_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = (xf - mean_c) * rstd_c
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    if swish:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "swish")
)
def fused_group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
    swish: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """x: (N, H, W, C) -> GroupNorm(+SiLU), single-pass Pallas kernel."""
    n, h, w, c = x.shape
    hw = h * w
    cg = c // groups
    membership = np.zeros((c, groups), np.float32)
    membership[np.arange(c), np.arange(c) // cg] = 1.0

    kernel = functools.partial(
        _gn_kernel, eps=eps, swish=swish, inv_count=1.0 / (hw * cg)
    )
    mem = pltpu.VMEM if _HAS_PLTPU else None

    def spec(block, index_map=None):
        if mem is None:
            return pl.BlockSpec(block, index_map)
        return pl.BlockSpec(block, index_map, memory_space=mem)

    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            spec((1, hw, c), lambda i: (i, 0, 0)),
            spec((1, c), lambda i: (0, 0)),
            spec((1, c), lambda i: (0, 0)),
            spec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=spec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(
        x.reshape(n, hw, c),
        gamma.reshape(1, c),
        beta.reshape(1, c),
        jnp.asarray(membership),
    )
    return out.reshape(n, h, w, c)
