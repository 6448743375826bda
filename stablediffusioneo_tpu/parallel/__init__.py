"""Device-mesh parallelism layer.

The reference is a single-GPU, single-process stack whose only concurrency
constructs are two CUDA streams + CUDA graphs + a batch-2 engine variant
(SURVEY §2 "Parallelism strategies"). The TPU rebuild's scaling story is
greenfield and idiomatic: a `jax.sharding.Mesh` with
  - `dp` (data/batch) sharding for independent images — replaces the
    batch-2 engines and multi-process fan-out,
  - `tp` (tensor) sharding of attention heads / MLP channels over ICI,
  - `sp` (spatial) sharding of one image's latent rows for single-image
    latency (latent_sharding; tests/test_mesh_sp.py),
  - FSDP (ZeRO-3) sharding of params/grads/optimizer state over `dp`
    for training (fsdp_shard_params),
with XLA GSPMD inserting the collectives, plus
  - `pp` (pipeline) GPipe scheduling for homogeneous transformer stacks
    (parallel/pipeline.py — explicit shard_map + ppermute, since stage
    scheduling is the one thing GSPMD annotations can't express).

Where pp applies is deliberately narrow: SD-1.5's full bf16 pipeline
(~1.7 GB weights + peak activations at 512^2) fits one TPU chip with
room to spare, and the UNet's skip connections make every stage cut
carry the whole encoder activation set across the wire — so the UNet
scales by dp/tp/sp, never model splitting. pp exists for the
conditioner towers (OpenCLIP bigG / T5-XXL-class stacks that outgrow
one chip's HBM): `models.clip.clip_text_apply_pp`. Expert parallelism
has no target (no MoE in the SD family).
"""

from stablediffusioneo_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    latent_sharding,
    replicate,
    unet_param_sharding_rules,
    shard_params,
    fsdp_param_sharding_rules,
    fsdp_shard_params,
)
from stablediffusioneo_tpu.parallel.pipeline import (
    pipeline_apply,
    pp_shard_params,
    pp_stage_sharding,
    stack_layer_params,
    unstack_layer_params,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "latent_sharding",
    "replicate",
    "unet_param_sharding_rules",
    "shard_params",
    "fsdp_param_sharding_rules",
    "fsdp_shard_params",
    "pipeline_apply",
    "pp_shard_params",
    "pp_stage_sharding",
    "stack_layer_params",
    "unstack_layer_params",
]
