"""Shared ctypes loading for the native/ C++ libraries.

One thread-safe, attempted-once loader used by every native binding
(serving/scheduler.py, training/data.py, annotators/native.py pattern):
resolve `native/build/lib<name>.so` relative to the repo, CDLL it, run the
caller's one-time signature configuration, and cache the handle. A missing
build returns None — callers fall back to their Python mirrors.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Callable, Dict, Optional

_BUILD_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build"))

_lock = threading.Lock()
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def load_native_lib(
    name: str,
    configure: Optional[Callable[[ctypes.CDLL], None]] = None,
) -> Optional[ctypes.CDLL]:
    """Load native/build/lib<name>.so once (thread-safe); None if absent.

    `configure` runs exactly once on first successful load — set argtypes/
    restypes there so concurrent first callers never race half-configured
    signatures."""
    with _lock:
        if name in _cache:
            return _cache[name]
        path = os.path.join(_BUILD_DIR, f"lib{name}.so")
        lib: Optional[ctypes.CDLL] = None
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            if configure is not None:
                configure(lib)
        _cache[name] = lib
        return lib
