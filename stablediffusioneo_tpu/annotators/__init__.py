"""Annotator (control-hint extraction) layer — reference `annotator/`.

Host-side preprocessing producing control hints from input images:
  canny  -> annotators.canny   (annotator/canny/__init__.py:4-6)
  HED    -> annotators.hed     (annotator/hed/__init__.py:15-105)
  MiDaS  -> annotators.midas   (annotator/midas/)
  OpenPose -> annotators.openpose (annotator/openpose/)
plus the shared HWC3/resize utilities (annotator/util.py:9-38).
"""

from stablediffusioneo_tpu.annotators.util import HWC3, resize_image, nms_edge
from stablediffusioneo_tpu.annotators.canny import CannyDetector


def __getattr__(name):
    """Lazy detector exports (each pulls its own model module)."""
    lazy = {
        "HEDdetector": "stablediffusioneo_tpu.annotators.hed",
        "MidasDetector": "stablediffusioneo_tpu.annotators.midas",
        "MLSDdetector": "stablediffusioneo_tpu.annotators.mlsd",
        "OpenposeDetector": "stablediffusioneo_tpu.annotators.openpose",
        "UniformerDetector": "stablediffusioneo_tpu.annotators.uniformer",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(name)


__all__ = [
    "HWC3", "resize_image", "nms_edge", "CannyDetector",
    "HEDdetector", "MidasDetector", "MLSDdetector",
    "OpenposeDetector", "UniformerDetector",
]
