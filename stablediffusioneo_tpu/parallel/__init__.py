"""Device-mesh parallelism layer.

The reference is a single-GPU, single-process stack whose only concurrency
constructs are two CUDA streams + CUDA graphs + a batch-2 engine variant
(SURVEY §2 "Parallelism strategies"). The TPU rebuild's scaling story is
greenfield and idiomatic: a `jax.sharding.Mesh` with
  - `dp` (data/batch) sharding for independent images — replaces the
    batch-2 engines and multi-process fan-out,
  - `tp` (tensor) sharding of attention heads / MLP channels over ICI,
  - FSDP (ZeRO-3) sharding of params/grads/optimizer state over `dp`
    for training (fsdp_shard_params),
with XLA GSPMD inserting the collectives.

Pipeline parallelism is deliberately absent: SD-1.5's full bf16 pipeline
(~1.7 GB weights + peak activations at 512^2) fits one TPU chip with
room to spare, so pp would only add bubble overhead to a 20-step scan of
small per-step graphs; scaling wants MORE IMAGES per step (dp), faster
steps (tp over ICI), or bigger trainable state (FSDP) — never model
splitting. Expert parallelism has no target (no MoE in the SD family).
"""

from stablediffusioneo_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicate,
    unet_param_sharding_rules,
    shard_params,
    fsdp_param_sharding_rules,
    fsdp_shard_params,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate",
    "unet_param_sharding_rules",
    "shard_params",
    "fsdp_param_sharding_rules",
    "fsdp_shard_params",
]
