"""Misc utilities.

- seed_everything: the pytorch-lightning seed_everything the app layer
  calls per request (canny2image_TRT.py:42) — here it seeds numpy/python
  and returns a jax PRNGKey (jax keys are explicit, not global).
- log_txt_as_img: prompt-text rendering for training grids
  (ldm/util.py log_txt_as_img equivalent).
- count_params: param census (ldm/util.py count_params).
"""

from __future__ import annotations

import random
from typing import List, Tuple

import numpy as np


def seed_everything(seed: int):
    import jax

    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def log_txt_as_img(wh: Tuple[int, int], captions: List[str]) -> np.ndarray:
    """Render captions onto white canvases -> (B, H, W, 3) uint8."""
    import cv2

    w, h = wh
    out = np.full((len(captions), h, w, 3), 255, np.uint8)
    for i, text in enumerate(captions):
        chars_per_line = max(1, w // 12)
        lines = [
            text[j : j + chars_per_line]
            for j in range(0, len(text), chars_per_line)
        ][: max(1, h // 24)]
        for li, line in enumerate(lines):
            cv2.putText(
                out[i], line, (8, 24 + 24 * li),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1,
            )
    return out


def count_params(tree, verbose: bool = False) -> int:
    import jax

    n = sum(
        int(np.prod(x.shape))
        for x in jax.tree.leaves(tree)
        if hasattr(x, "shape")
    )
    if verbose:
        print(f"{n / 1e6:.2f}M parameters")
    return n
