"""Core compute ops: norms, attention, convolutions, diffusion schedule math.

Every op has a pure-jnp reference implementation here; the hot-path fused
variants live in `ops.pallas` and are selected by `ops.dispatch` based on
backend + config.
"""

from stablediffusioneo_tpu.ops.norms import group_norm, group_norm_silu, layer_norm
from stablediffusioneo_tpu.ops.attention import (
    attention,
    multi_head_attention,
)
from stablediffusioneo_tpu.ops.schedule import (
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    timestep_embedding,
)

__all__ = [
    "group_norm",
    "group_norm_silu",
    "layer_norm",
    "attention",
    "multi_head_attention",
    "make_beta_schedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "timestep_embedding",
]
