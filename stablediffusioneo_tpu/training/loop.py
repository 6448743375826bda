"""Training loop driver: ControlNet fine-tuning over a device mesh.

The reference delegates its loop to pytorch-lightning (vendored, unused in
the snapshot); this is the TPU-native equivalent: one jitted train_step
(training/trainer.py) iterated host-side, with dp-sharded batches, EMA,
periodic checkpointing (orbax), and the ImageLogger/MetricsLogger hooks.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from stablediffusioneo_tpu.config import PipelineConfig
from stablediffusioneo_tpu.parallel.mesh import data_sharding, make_mesh, shard_params
from stablediffusioneo_tpu.training.ema import ema_init, ema_update
from stablediffusioneo_tpu.training.logger import ImageLogger, MetricsLogger
from stablediffusioneo_tpu.training.trainer import (
    TrainState,
    create_train_state,
    make_schedule_buffers,
    train_step,
)


def save_checkpoint(path: str, state: TrainState) -> None:
    """Orbax checkpoint of the full ControlNet train state — params AND
    optimizer moments, so training resumes exactly (the TPU-native analog
    of the torch .pth save in export_onnx_all.py:173-181 and mmcv's
    runner/checkpoint.py)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        },
        force=True,
    )
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, like_state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        {
            "params": like_state.params,
            "opt_state": like_state.opt_state,
            "step": np.asarray(like_state.step),
        },
    )
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
    )


def train(
    cfg: PipelineConfig,
    unet_params: Dict,
    controlnet_params: Dict,
    data_iter: Iterator[Dict[str, np.ndarray]],
    num_steps: int,
    learning_rate: float = 1e-5,
    dp: Optional[int] = None,
    tp: int = 1,
    seed: int = 0,
    ema_decay: Optional[float] = 0.9999,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 1000,
    image_logger: Optional[ImageLogger] = None,
    metrics_path: Optional[str] = "train_metrics.jsonl",
    lora_rank: Optional[int] = None,
    lora_scale: float = 1.0,
    fsdp: bool = False,
) -> TrainState:
    """Run `num_steps` of ControlNet fine-tuning. data_iter yields
    {x0: (B,h,w,4), hint: (B,H,W,3), ctx: (B,T,768)} host batches.

    lora_rank: train rank-r LoRA adapters on the (frozen) ControlNet
    branch instead of the full branch (training/lora.py); the returned
    state's params are the adapter tree — `merge_lora` / `save_lora` it.
    fsdp: ZeRO-3-shard params/grads/optimizer moments over the dp axis
    (parallel/mesh.py) for widths where replicated training state does
    not fit per chip."""
    from stablediffusioneo_tpu.parallel.mesh import fsdp_shard_params

    mesh = make_mesh(dp=dp, tp=tp)
    shard = fsdp_shard_params if fsdp else shard_params
    unet_params = shard(unet_params, mesh)
    controlnet_params = shard(controlnet_params, mesh)
    sqrt_a, sqrt_1ma = make_schedule_buffers(cfg)
    if lora_rank:
        from stablediffusioneo_tpu.training.lora import (
            init_lora, lora_train_step,
        )

        lora = init_lora(jax.random.PRNGKey(seed + 1), controlnet_params,
                         rank=lora_rank)
        state, tx = create_train_state(lora, learning_rate)
        frozen = {"unet": unet_params, "controlnet": controlnet_params}
        step_fn = jax.jit(functools.partial(
            lora_train_step, tx=tx, cfg=cfg, frozen=frozen,
            on="controlnet", scale=lora_scale))
    else:
        state, tx = create_train_state(controlnet_params, learning_rate)
        step_fn = jax.jit(functools.partial(train_step, tx=tx, cfg=cfg,
                                            unet_params=unet_params))
    ema_state = ema_init(state.params) if ema_decay else None
    metrics = MetricsLogger(metrics_path) if metrics_path else None
    key = jax.random.PRNGKey(seed)

    with mesh:
        for step in range(num_steps):
            host_batch = next(data_iter)
            batch = {
                k: jax.device_put(v, data_sharding(mesh, np.ndim(v)))
                for k, v in host_batch.items()
            }
            state, loss = step_fn(
                state,
                sqrt_abar=sqrt_a,
                sqrt_one_minus_abar=sqrt_1ma,
                batch=batch,
                key=key,
            )
            if ema_state is not None:
                ema_state = ema_update(ema_state, state.params, ema_decay)
            if metrics:
                metrics.log(step, loss=float(loss))
            if image_logger:
                image_logger.on_step(step)
            if ckpt_dir and (step + 1) % ckpt_every == 0:
                save_checkpoint(
                    os.path.join(ckpt_dir, f"step_{step + 1:09d}"), state
                )
    return state
