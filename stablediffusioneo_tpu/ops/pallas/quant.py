"""Int8 weight-only quantization ops (Pallas TPU kernel + helpers).

The TPU-native counterpart of the reference's quantization teaching example
(abroute_examples quantization/QAT with pytorch-quantization): per-channel
symmetric int8 weights with a fused dequantize-matmul kernel — weights
stream from HBM at 1 byte/element (4x less bandwidth than fp32, 2x less
than bf16) and are dequantized in VMEM right before the MXU pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def quantize_weights(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K, N) float -> (int8 values, (1, N) float scales), symmetric
    per-output-channel."""
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantized_linear(x: jax.Array, p: dict) -> jax.Array:
    """Linear layer with int8 weights: {'w_q': (K,N) int8, 'scale': (1,N),
    'b'?: (N,)}. Dispatches to the Pallas fused dequant-matmul on TPU,
    plain XLA dequant+matmul elsewhere. Accepts any leading batch dims."""
    from stablediffusioneo_tpu.ops.dispatch import (
        kernels_enabled,
        pallas_interpret_default,
    )

    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    n_out = p["w_q"].shape[1]
    m = x2.shape[0]
    # blocks must tile M/N exactly; pick the largest 128-multiple divisors
    bn = next((b for b in (512, 256, 128) if n_out % b == 0), None)
    bm = next((b for b in (512, 256, 128, 64, 32, 16, 8) if m % b == 0), None)
    if kernels_enabled("int8_linear") and bm and bm >= 8 and bn:
        # interpret follows SDEO_PALLAS_INTERPRET so the kernel runs on
        # non-TPU backends (kernels_enabled admits them in that mode)
        out = quantized_matmul(
            x2, p["w_q"], p["scale"], block_m=bm, block_n=bn,
            interpret=pallas_interpret_default(),
        )
    else:
        w = (p["w_q"].astype(jnp.float32) * p["scale"]).astype(x.dtype)
        out = jnp.matmul(x2, w)
    out = out.reshape(*lead, -1)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


# attention projections are consumed as raw arrays by the fused-QKV path
# (models/unet.py transformer_block_apply / models/clip.py), not through
# ops.layers.linear — leave them in bf16
_QUANT_EXCLUDE = frozenset({"wq", "wk", "wv", "wo", "q", "k", "v", "out"})


def quantize_linear_tree(params, min_dim: int = 256):
    """Walk a param tree and convert eligible linear leaves
    ({'w': 2D, 'b'?}) to int8 weight-only form. Only weights with both
    dims >= min_dim are converted (tiny projections gain nothing and lose
    accuracy), and only leaves consumed through ops.layers.linear (the
    GEGLU FF pair — the largest transformer weights — plus time/emb
    projections). Returns (new_tree, n_converted)."""
    n = 0

    def rec(node, name=""):
        nonlocal n
        if isinstance(node, dict):
            keys = set(node)
            w = node.get("w")
            if (w is not None and keys <= {"w", "b"}
                    and name not in _QUANT_EXCLUDE
                    and getattr(w, "ndim", 0) == 2
                    and min(w.shape) >= min_dim):
                q, scale = quantize_weights(jnp.asarray(w, jnp.float32))
                out = {"w_q": q, "scale": scale}
                if "b" in node:
                    out["b"] = node["b"]
                n += 1
                return out
            return {k: rec(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(rec(v, name) for v in node)
        return node

    return rec(params), n


def _qmm_kernel(x_ref, wq_ref, scale_ref, o_ref):
    x = x_ref[:]
    w = wq_ref[:].astype(jnp.float32) * scale_ref[:]
    o_ref[:] = jnp.dot(
        x.astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def quantized_matmul(
    x: jax.Array,
    w_q: jax.Array,
    scales: jax.Array,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x: (M, K) bf16/f32; w_q: (K, N) int8; scales: (1, N) -> (M, N).

    2D grid over (M, N) blocks so the x slab, int8 weight block, and output
    block all fit scoped VMEM even for the GEGLU ff shapes (K up to 5120)."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2
    block_n = min(block_n, n)
    block_m = min(block_m, m)
    assert n % block_n == 0, f"N={n} not divisible by block_n={block_n}"
    assert m % block_m == 0, f"M={m} not divisible by block_m={block_m}"

    def spec(block, index_map):
        if _HAS_PLTPU:
            return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, index_map)

    return pl.pallas_call(
        _qmm_kernel,
        grid=(m // block_m, n // block_n),
        in_specs=[
            spec((block_m, k), lambda i, j: (i, 0)),
            spec((k, block_n), lambda i, j: (0, j)),
            spec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=spec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, w_q, scales)
