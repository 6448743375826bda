"""YOLOv5 practice pipeline (reference practice_yolov5/)."""

from stablediffusioneo_tpu.yolo.pipeline import (
    PreProcessor,
    PostProcessor,
    nms,
    draw_boxes,
)

__all__ = ["PreProcessor", "PostProcessor", "nms", "draw_boxes"]
