"""`hackathon` — exact-surface compatibility shim.

The reference's de-facto public entry is a class named `hackathon` with
`initialize()` and a 14-positional-arg `process()` returning the list of
generated images (canny2image_TRT.py:18-92; consumed by
compute_score.py:42-61). This wrapper reproduces that surface verbatim on
top of Canny2ImagePipeline so reference callers port with zero changes
(the detected map, which Canny2ImagePipeline prepends, is dropped here to
match the reference's return convention).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from stablediffusioneo_tpu.config import PipelineConfig
from stablediffusioneo_tpu.models.tokenizer import CLIPTokenizer
from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline


class hackathon:  # noqa: N801 — reference-exact name
    def __init__(
        self,
        params: Dict,
        tokenizer: CLIPTokenizer,
        cfg: Optional[PipelineConfig] = None,
    ):
        self._params = params
        self._tokenizer = tokenizer
        self._cfg = cfg
        self.pipe: Optional[Canny2ImagePipeline] = None

    def initialize(self):
        self.pipe = Canny2ImagePipeline(self._params, self._tokenizer, self._cfg)
        self.pipe.initialize()

    def process(
        self,
        input_image: np.ndarray,
        prompt: str,
        a_prompt: str,
        n_prompt: str,
        num_samples: int,
        image_resolution: int,
        ddim_steps: int,
        guess_mode: bool,
        strength: float,
        scale: float,
        seed: int,
        eta: float,
        low_threshold: int,
        high_threshold: int,
    ) -> List[np.ndarray]:
        assert self.pipe is not None, "call initialize() first"
        results = self.pipe.process(
            input_image, prompt, a_prompt=a_prompt, n_prompt=n_prompt,
            num_samples=num_samples, image_resolution=image_resolution,
            ddim_steps=ddim_steps, guess_mode=guess_mode, strength=strength,
            scale=scale, seed=seed, eta=eta, low_threshold=low_threshold,
            high_threshold=high_threshold,
        )
        return results[1:]  # reference returns generated images only
