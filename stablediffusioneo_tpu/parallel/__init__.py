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
