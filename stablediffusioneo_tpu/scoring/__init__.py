"""Scoring / benchmark harness (reference compute_score.py)."""

from stablediffusioneo_tpu.scoring.score import (
    get_score,
    perceptual_distance,
    PixelFeatureExtractor,
    ScoreHarness,
)

__all__ = [
    "get_score",
    "perceptual_distance",
    "PixelFeatureExtractor",
    "ScoreHarness",
]
