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


def _qmm_kernel(x_ref, wq_ref, scale_ref, o_ref):
    x = x_ref[:]
    w = wq_ref[:].astype(jnp.float32) * scale_ref[:]
    o_ref[:] = jnp.dot(
        x.astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def quantized_matmul(
    x: jax.Array,
    w_q: jax.Array,
    scales: jax.Array,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x: (M, K) bf16/f32; w_q: (K, N) int8; scales: (1, N) -> (M, N)."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2
    block_n = min(block_n, n)
    assert n % block_n == 0, f"N={n} not divisible by block_n={block_n}"

    def spec(block, index_map):
        if _HAS_PLTPU:
            return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, index_map)

    return pl.pallas_call(
        _qmm_kernel,
        grid=(n // block_n,),
        in_specs=[
            spec((m, k), lambda j: (0, 0)),
            spec((k, block_n), lambda j: (0, j)),
            spec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=spec((m, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, w_q, scales)
