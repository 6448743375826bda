"""Serialized engine artifacts — the `.plan` file equivalent.

The reference's deployment artifact is a serialized TensorRT engine written
once by the offline toolchain and deserialized at startup
(onnx2trt.py:57-65 -> Engine.load, Engine.py:99-101). The TPU-native
equivalent is two-layered:

  1. `jax.export` StableHLO artifacts (.sdeo files): portable, versioned,
     shape-checked program serializations written by `save_engine` and
     reloaded by `load_engine` — the direct .plan analog (they pin the
     traced program; loading never re-traces Python).
  2. the persistent XLA compilation cache (runtime/cache.py), which makes
     re-COMPILING a loaded artifact on the same topology a disk hit.

Together a warm start costs deserialization only, like the reference.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
from jax import export as jax_export


def save_engine(
    path: str,
    fn: Callable,
    abstract_args: Sequence[Any],
    static_argnums: Sequence[int] = (),
) -> str:
    """Trace + serialize `fn` at the given abstract shapes to `path`."""
    exported = jax_export.export(jax.jit(fn, static_argnums=tuple(static_argnums)))(
        *abstract_args
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_engine(path: str) -> Callable:
    """Deserialize an engine artifact; returns a callable that executes the
    pinned program (re-jitted so the persistent compile cache applies)."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)
