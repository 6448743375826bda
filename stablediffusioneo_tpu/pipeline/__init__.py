"""Sampler + application pipeline layers."""

from stablediffusioneo_tpu.pipeline.ddim import DDIMSampler, ddim_scan_step, ddim_sample_scan

__all__ = ["DDIMSampler", "ddim_scan_step", "ddim_sample_scan"]
