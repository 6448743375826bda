"""Primitive parameterized layers as pure functions over param dicts.

Layout conventions (TPU-native, fixed across the framework):
  - activations: NHWC (channels-last = lane dimension)
  - conv kernels: HWIO  (torch OIHW checkpoints are transposed at load time,
    checkpoint/convert.py)
  - linear weights: (in, out)  (torch (out, in) transposed at load)

Params are plain nested dicts of jnp arrays; initializers mirror torch
defaults (kaiming-uniform fan-in for conv/linear, zeros for the ControlNet
zero-convs) so random-init parity tests against torch modules are exact in
distribution and checkpoint loads are exact in value.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- initializers


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch's default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3) gain for
    # kaiming_uniform(a=sqrt(5)) reduces to bound = 1/sqrt(fan_in)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_init(key, kh, kw, cin, cout, zero: bool = False, dtype=jnp.float32):
    """HWIO conv kernel + bias, torch-default init (or zero-init)."""
    if zero:
        return {
            "w": jnp.zeros((kh, kw, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype),
        }
    kw_, kb_ = jax.random.split(key)
    fan_in = kh * kw * cin
    return {
        "w": _kaiming_uniform(kw_, (kh, kw, cin, cout), fan_in, dtype),
        "b": _kaiming_uniform(kb_, (cout,), fan_in, dtype),
    }


def linear_init(key, cin, cout, bias: bool = True, zero: bool = False, dtype=jnp.float32):
    if zero:
        p = {"w": jnp.zeros((cin, cout), dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p
    kw_, kb_ = jax.random.split(key)
    p = {"w": _kaiming_uniform(kw_, (cin, cout), cin, dtype)}
    if bias:
        p["b"] = _kaiming_uniform(kb_, (cout,), cin, dtype)
    return p


def norm_init(c, dtype=jnp.float32):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


# ---------------------------------------------------------------- application


def mm_precision(dtype) -> jax.lax.Precision:
    """Matmul/conv precision policy: fp32 inputs use HIGHEST (true fp32 —
    the parity/golden path; XLA's default would silently run bf16-grade
    passes), bf16 inputs use DEFAULT (native single-pass bf16 x bf16 -> fp32
    on the MXU; HIGHEST would force multi-pass fp32 emulation, ~6x slower)."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def conv2d(
    x: jax.Array,
    p: dict,
    stride: int | Tuple[int, int] = 1,
    padding: int | str | Sequence[Tuple[int, int]] = 1,
) -> jax.Array:
    """NHWC conv with HWIO kernel. padding int means symmetric SAME-style pad."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    w = p["w"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=mm_precision(x.dtype),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def matmul2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """Matmul with leading dims flattened to one row dim.

    A 3D (B, T, C) x (C, N) dot makes XLA's TPU backend treat dim 0 as a
    batch dim and pick the batch-in-lanes emitter with a token-minor
    {1,2,0} output layout — measured ~10x below matmul speed-of-light at
    the SD (2, 4096, 320) shapes, plus a relayout copy back to {2,1,0} at
    every attention/FF site (xplane round 2: add_add_fusion ~2.7 ms/step +
    copies ~1.8 ms/step). Flattening to (B*T, C) gets the canonical
    row-major MXU emitter and a bitcast-compatible layout throughout."""
    if x.ndim == 2:
        return jnp.matmul(x, w, precision=mm_precision(x.dtype))
    lead = x.shape[:-1]
    out = jnp.matmul(x.reshape(-1, x.shape[-1]), w,
                     precision=mm_precision(x.dtype))
    return out.reshape(*lead, w.shape[-1])


def linear(x: jax.Array, p: dict) -> jax.Array:
    if "w_q" in p:  # int8 weight-only (ops/pallas/quant.py wiring)
        from stablediffusioneo_tpu.ops.pallas.quant import quantized_linear

        return quantized_linear(x, p)
    out = matmul2d(x, p["w"].astype(x.dtype))
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def avg_pool2d(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    ) / float(window * window)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample, NHWC."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def geglu(x: jax.Array, p: dict) -> jax.Array:
    """GEGLU feed-forward gate (ldm/modules/attention.py GEGLU)."""
    h = linear(x, p)
    a, b = jnp.split(h, 2, axis=-1)
    return a * gelu(b)
