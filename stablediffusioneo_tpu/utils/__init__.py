"""Shared utilities (reference ldm/util.py + scattered helpers)."""

from stablediffusioneo_tpu.utils.misc import (
    seed_everything,
    log_txt_as_img,
    count_params,
)
from stablediffusioneo_tpu.utils.debug import assert_finite, nan_report

__all__ = [
    "seed_everything",
    "log_txt_as_img",
    "count_params",
    "assert_finite",
    "nan_report",
]
