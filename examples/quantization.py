"""Int8 weight-only quantization example — the QAT/pytorch-quantization
teaching example equivalent (abroute_examples quantization_aware_training).

Quantize a linear layer's weights to per-channel int8, run the fused Pallas
dequant-matmul, and report the quantization error.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.ops.pallas.quant import quantize_weights, quantized_matmul


def main():
    interpret = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (128, 768), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (768, 3072), jnp.float32) * 0.02

    w_q, scales = quantize_weights(w)
    print(f"weights: {w.nbytes/1e6:.1f} MB fp32 -> {w_q.nbytes/1e6:.1f} MB int8")

    ref = x @ w
    out = quantized_matmul(x, w_q, scales, interpret=interpret)
    err = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    print(f"max relative error vs fp32: {err:.4f}")


if __name__ == "__main__":
    main()
