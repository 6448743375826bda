"""Annotator-net compute dtype policy.

The reference runs every annotator net in fp32 on GPU (e.g.
annotator/midas/__init__.py:13-42, annotator/hed/__init__.py:57-81). On
TPU fp32 matmuls/convs pay a 2-3x MXU rate penalty vs bfloat16, and the
annotator nets (HED VGG, DPT ViT-L, CMU pose, MLSD, UniFormer) are
conditioning preprocessors whose outputs are quantized to uint8 hints —
the same precision argument that runs the diffusion UNet in bf16 applies
here with even more headroom.

Policy: bfloat16 when the default backend is TPU, float32 elsewhere
(keeps the CPU-based torch-mirror A/B parity tests exact). Override with
SDEO_ANNOTATOR_DTYPE=float32|bfloat16.

Stats-sensitive ops stay safe by construction: the annotator nets use
ops.norms.layer_norm / ops.attention.attention, which carry their own
fp32 islands (norm moments, softmax) for bf16 inputs — the identical
path the UNet's parity tests pin down.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def annotator_dtype():
    """Compute dtype for annotator nets (see module docstring)."""
    env = os.environ.get("SDEO_ANNOTATOR_DTYPE")
    if env:
        return jnp.dtype(env)
    return (jnp.dtype(jnp.bfloat16)
            if jax.default_backend() == "tpu" else jnp.dtype(jnp.float32))


def cast_params(params, dtype=None):
    """Cast the float leaves of a param tree to the annotator dtype.

    Non-float leaves (ints, bools) pass through. When dtype resolves to
    float32 this is an identity on converter/init output (already f32),
    so CPU test paths see bit-identical params.
    """
    dtype = annotator_dtype() if dtype is None else jnp.dtype(dtype)

    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree.map(cast, params)
