"""Kernel dispatch: Pallas fused kernels vs XLA reference implementations.

The analog of the reference's plugin wiring (`ctypes.CDLL(libplugin.so)` +
graph surgery deciding which nodes become plugin ops,
onnx2trt_static_plugin.py:7-10, surgeon_graph.py:46-86): a central switch
that the model layer consults per-op. Defaults: Pallas on TPU, XLA
elsewhere; override with set_kernels(...) or SDEO_DISABLE_PALLAS=1.
"""

from __future__ import annotations

import os
from typing import Dict

import jax

_FLAGS: Dict[str, bool] = {
    # OFF by default: the fused GN kernel wins in isolated micro-benches
    # (0.60 vs 0.66 ms chained) but LOSES ~5% e2e — the custom call blocks
    # XLA's fusion of the norm into surrounding elementwise ops. Enable via
    # set_kernels(groupnorm=True) / SDEO_FORCE_GN_PALLAS=1 for experiments.
    "groupnorm": os.environ.get("SDEO_FORCE_GN_PALLAS", "0") == "1",
    "flash_attention": os.environ.get("SDEO_DISABLE_PALLAS", "0") != "1",
    # rematerialize UNet blocks under grad (training memory <-> +compute);
    # off for inference (no residuals are stored anyway)
    "remat": os.environ.get("SDEO_REMAT", "0") == "1",
    # int8 weight-only linears: Pallas fused dequant-matmul kernel for
    # params converted via quantize_linear_tree (off = XLA dequant+matmul)
    "int8_linear": os.environ.get("SDEO_INT8_PALLAS", "0") == "1",
}


def remat_enabled() -> bool:
    return _FLAGS["remat"]


def set_kernels(**kwargs: bool) -> None:
    for k, v in kwargs.items():
        if k not in _FLAGS:
            raise KeyError(f"unknown kernel flag {k!r}; have {sorted(_FLAGS)}")
        _FLAGS[k] = bool(v)


def kernels_enabled(name: str) -> bool:
    """True when the Pallas path should be used for `name` (TPU only)."""
    return _FLAGS.get(name, False) and jax.default_backend() == "tpu"
