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

__all__ = ["HWC3", "resize_image", "nms_edge", "CannyDetector"]
