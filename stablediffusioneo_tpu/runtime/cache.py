"""Persistent XLA compilation cache — the `.plan` file analog.

The reference serializes TRT engines to `.plan` files once and deserializes
at startup (onnx2trt.py:57-65, Engine.py:99-101). On TPU the compiled-
program artifact is the XLA executable; JAX's persistent compilation cache
stores it on disk keyed by (HLO, flags, platform), so a warm process start
skips the 20-40s compile exactly like loading a plan.
"""

from __future__ import annotations

import os

import jax

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the on-disk compilation cache."""
    global _enabled
    cache_dir = cache_dir or os.environ.get(
        "SDEO_CACHE_DIR", os.path.expanduser("~/.cache/stablediffusioneo_tpu/xla")
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return cache_dir
