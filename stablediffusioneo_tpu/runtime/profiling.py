"""Profiling / tracing utilities.

The reference's observability is ad-hoc: cudaEvent-free wall-clock brackets
around engine calls (cldm_trt/ddim_hacked.py:134-155), engine binding
introspection (Engine.py:122-129), and the vendored `trtexec` binary as the
implied kernel profiler (SURVEY §5). TPU-native equivalents:

  - `trace(dir)`: jax.profiler xplane trace context (view in TensorBoard /
    xprof) — the trtexec analog;
  - `timed(fn)`: wall-clock bracket with `block_until_ready`, the honest
    version of the reference's stream-sync + time.time brackets;
  - Engine.get_engine_infor (runtime/engine.py) carries the binding/cost
    introspection role.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sdeo_trace"):
    """Capture an XLA/TPU profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _hard_sync(result) -> None:
    """Device barrier that provably completes: fetch one scalar to host.

    `jax.block_until_ready` alone can return before execution finishes on
    tunneled/proxied backends (observed on the axon v5e tunnel — timing
    loops read microseconds for multi-GFLOP programs); a device->host
    scalar copy cannot."""
    import numpy as np

    leaves = [l for l in jax.tree.leaves(result) if hasattr(l, "dtype")]
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[0:1]))


def timed(fn: Callable, *args, iters: int = 1, warmup: int = 1, **kwargs
          ) -> Tuple[float, Any]:
    """Median wall-clock seconds per call (device-synchronized) and result."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    _hard_sync(result)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        _hard_sync(result)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], result


def device_memory_stats() -> Dict[str, int]:
    """Per-device HBM stats where the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
