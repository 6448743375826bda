"""Numerical sanitizers.

The reference's closest analogs (SURVEY §5 "race detection / sanitizers"):
NaN scans inside every conversion parity check (export_onnx_all.py:81-82)
and the fp16-overflow guards (fp32 softmax island, mask clamping). Here:

- assert_finite / nan_report: explicit pytree scans for tests and
  debugging sessions;
- enable_debug_nans(): flips jax's global NaN debugger (the runtime
  sanitizer; compiles with checks, so dev-only).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def nan_report(tree, max_entries: int = 10) -> List[str]:
    """Paths of non-finite leaves in a pytree (empty == all finite)."""
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype"):
            continue
        arr = np.asarray(leaf, np.float32) if leaf.dtype != np.bool_ else None
        if arr is not None and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
            if len(bad) >= max_entries:
                break
    return bad


def assert_finite(tree, what: str = "tree") -> None:
    bad = nan_report(tree)
    assert not bad, f"non-finite values in {what}: {bad}"


def enable_debug_nans(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)
