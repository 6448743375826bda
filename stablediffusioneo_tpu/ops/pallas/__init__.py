"""Pallas TPU kernels for the hot ops.

The TPU-native equivalents of the reference's native-kernel layer:
  - fused GroupNorm+SiLU  <- CUDA TRT plugin
    (plugin/groupNormPlugin/groupNormKernel.cu:50-266)
  - flash attention       <- fused-QKV export + xformers path
    (export_onnx_attention.py, ldm/modules/attention.py:306-352)
"""

from stablediffusioneo_tpu.ops.pallas.groupnorm import (
    fused_group_norm,
    group_norm_pallas_supported,
)

__all__ = ["fused_group_norm", "group_norm_pallas_supported"]
