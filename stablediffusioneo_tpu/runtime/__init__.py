"""Runtime layer: AOT-compiled engines per shape bucket + persistent cache.

The TPU-native equivalent of the reference's TensorRT Engine runtime
(Engine.py:45-161) and its offline engine-build toolchain (onnx2trt*.py).
"""

from stablediffusioneo_tpu.runtime.engine import Engine, CNSDRuntime, resolution_buckets
from stablediffusioneo_tpu.runtime.cache import enable_persistent_cache

__all__ = ["Engine", "CNSDRuntime", "resolution_buckets", "enable_persistent_cache"]
