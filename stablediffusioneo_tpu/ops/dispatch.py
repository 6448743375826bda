"""Kernel dispatch: Pallas fused kernels vs XLA reference implementations.

The analog of the reference's plugin wiring (`ctypes.CDLL(libplugin.so)` +
graph surgery deciding which nodes become plugin ops,
onnx2trt_static_plugin.py:7-10, surgeon_graph.py:46-86): a central switch
that the model layer consults per-op. Defaults: Pallas on TPU, XLA
elsewhere; override with set_kernels(...) or SDEO_DISABLE_PALLAS=1.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Dict

import jax

_FLAGS: Dict[str, bool] = {
    # OFF by default: the fused GN kernel wins in isolated micro-benches
    # (0.60 vs 0.66 ms chained) but LOSES ~5% e2e — the custom call blocks
    # XLA's fusion of the norm into surrounding elementwise ops. Enable via
    # set_kernels(groupnorm=True) / SDEO_FORCE_GN_PALLAS=1 for experiments.
    "groupnorm": os.environ.get("SDEO_FORCE_GN_PALLAS", "0") == "1",
    # fused single-read LayerNorm (ops/pallas/layernorm.py): OFF by default,
    # same verdict as the GN kernel. The single-read premise is sound in
    # isolation, but the r5 same-session SDXL A/B measured it ~260 ms/image
    # SLOWER e2e (p50 2.97 s ON vs 2.71 s OFF at 1024^2/20-step) — the
    # custom call is a fusion/scheduling barrier at 60+ sites/step that
    # costs more than the stats re-read it saves (ledger in
    # docs/performance.md). Enable via SDEO_FORCE_LN_PALLAS=1 /
    # set_kernels(layernorm=True) for experiments.
    "layernorm": os.environ.get("SDEO_FORCE_LN_PALLAS", "0") == "1",
    "flash_attention": os.environ.get("SDEO_DISABLE_PALLAS", "0") != "1",
    # rematerialize UNet blocks under grad (training memory <-> +compute);
    # off for inference (no residuals are stored anyway)
    "remat": os.environ.get("SDEO_REMAT", "0") == "1",
    # int8 weight-only linears: Pallas fused dequant-matmul kernel for
    # params converted via quantize_linear_tree (off = XLA dequant+matmul)
    "int8_linear": os.environ.get("SDEO_INT8_PALLAS", "0") == "1",
    # partition-aware attention: wrap the Pallas attention kernels in
    # jax.custom_partitioning so GSPMD/shardy can shard them over a mesh
    # (batch->dp, heads->tp, query tokens->sp) instead of treating the
    # pallas_call as an opaque custom call that forces replication. OFF on
    # the single-chip path (the wrapper is pure overhead there); mesh
    # engines enable it contextually via spmd_attention_scope.
    "spmd_attention": os.environ.get("SDEO_SPMD_ATTN", "0") == "1",
}

# Contextual override for spmd_attention, set by mesh engines around
# TRACING (jit body execution) so concurrent single-chip engines in the
# same process keep the plain kernel path. contextvars (not a bare global)
# because serving compiles engines from worker threads.
_SPMD_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "sdeo_spmd_attention", default=None)


def spmd_partitioning_enabled() -> bool:
    """True when attention kernels should lower via custom_partitioning.
    Contextual scope (mesh engines) wins over the global flag."""
    ctx = _SPMD_CTX.get()
    if ctx is not None:
        return bool(ctx)
    return _FLAGS["spmd_attention"]


@contextlib.contextmanager
def spmd_attention_scope(enabled: bool = True):
    """Scope the partition-aware attention lowering to one trace. Wrap the
    BODY of a to-be-jitted function (trace-time state), not the jit call."""
    tok = _SPMD_CTX.set(bool(enabled))
    try:
        yield
    finally:
        _SPMD_CTX.reset(tok)


def pallas_interpret_default() -> bool:
    """Default `interpret` for Pallas entry points: SDEO_PALLAS_INTERPRET=1
    forces interpret mode so the REAL kernel code paths run on the virtual
    CPU mesh (multichip tests / dryrun) where no TPU exists."""
    return os.environ.get("SDEO_PALLAS_INTERPRET", "0") == "1"


def remat_enabled() -> bool:
    return _FLAGS["remat"]


def set_kernels(**kwargs: bool) -> None:
    for k, v in kwargs.items():
        if k not in _FLAGS:
            raise KeyError(f"unknown kernel flag {k!r}; have {sorted(_FLAGS)}")
        _FLAGS[k] = bool(v)


def kernels_enabled(name: str) -> bool:
    """True when the Pallas path should be used for `name` (TPU, or any
    backend under SDEO_PALLAS_INTERPRET=1 — the kernels then run in Pallas
    interpret mode, used by the virtual-CPU-mesh multichip validation)."""
    if not _FLAGS.get(name, False):
        return False
    return jax.default_backend() == "tpu" or pallas_interpret_default()
