"""ControlNet fine-tuning: diffusion loss + AdamW train step.

The reference trains only the ControlNet branch (and optionally the UNet
decoder when `sd_locked` is off) with AdamW (cldm/cldm.py:416-423); the loss
is the standard DDPM eps-prediction MSE (the missing
ldm.models.diffusion.ddpm `p_losses` with `parameterization="eps"`,
l_simple weight 1):

    x_t  = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps,   eps ~ N(0,1)
    loss = mean || eps_hat(x_t, t, ctx, hint) - eps ||^2

TPU-first: the step is one jitted function over a (dp, tp) mesh — batch
sharded over dp (gradient psum inserted by GSPMD), attention/MLP params
optionally TP-sharded (parallel/mesh.py). Frozen params (UNet/CLIP/VAE)
ride along as inputs and receive no optimizer state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from stablediffusioneo_tpu.config import PipelineConfig
from stablediffusioneo_tpu.models.controlnet import controlled_unet_apply
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Trainable ControlNet params + AdamW state + step counter."""

    params: Dict  # controlnet params (trainable)
    opt_state: Any
    step: jax.Array


def create_train_state(
    controlnet_params: Dict,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return (
        TrainState(
            params=controlnet_params,
            opt_state=tx.init(controlnet_params),
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


def diffusion_loss(
    controlnet_params: Dict,
    unet_params: Dict,
    cfg: PipelineConfig,
    sqrt_abar: jax.Array,          # (T,) precomputed schedule buffers
    sqrt_one_minus_abar: jax.Array,
    x0: jax.Array,                 # (B, h, w, 4) clean latents
    hint: jax.Array,               # (B, H, W, 3)
    ctx: jax.Array,                # (B, T, 768)
    t: jax.Array,                  # (B,) int32 timesteps
    noise: jax.Array,              # (B, h, w, 4)
) -> jax.Array:
    a = sqrt_abar[t][:, None, None, None]
    s = sqrt_one_minus_abar[t][:, None, None, None]
    x_t = a * x0 + s * noise  # noising at input precision
    # Mixed precision (cfg.dtype, default bf16): forward/backward compute
    # in the hot-path dtype while AdamW keeps the f32 master params — the
    # standard TPU recipe. The cast lives INSIDE the differentiated
    # function, so grads convert back to f32 per-leaf on the way out.
    # Before this, an f32 batch silently upcast the whole step: the r5
    # train xplane showed every conv/fusion at f32 (docs/xplane_train.md).
    dt = jnp.dtype(cfg.dtype)

    def cast(tree):
        return jax.tree.map(
            lambda p: p.astype(dt)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree)

    eps_hat = controlled_unet_apply(
        cast(unet_params), cast(controlnet_params), cfg.controlnet,
        x_t.astype(dt), hint.astype(dt), t.astype(jnp.float32),
        ctx.astype(dt),
    )
    return jnp.mean(jnp.square(eps_hat.astype(jnp.float32) - noise.astype(jnp.float32)))


def train_step(
    state: TrainState,
    tx: optax.GradientTransformation,
    unet_params: Dict,
    cfg: PipelineConfig,
    sqrt_abar: jax.Array,
    sqrt_one_minus_abar: jax.Array,
    batch: Dict[str, jax.Array],
    key: jax.Array,
) -> Tuple[TrainState, jax.Array]:
    """One AdamW step on the ControlNet branch. batch: {x0, hint, ctx}.

    A uint8 hint is normalized in-graph (/255) — the data pipeline ships
    raw pixels and the device does the cast, the same uint8-upload
    discipline as the inference engines."""
    b = batch["x0"].shape[0]
    if batch["hint"].dtype == jnp.uint8:
        batch = dict(batch)
        batch["hint"] = (batch["hint"].astype(jnp.float32)
                         / 255.0).astype(batch["x0"].dtype)
    kt, kn = jax.random.split(jax.random.fold_in(key, state.step))
    t = jax.random.randint(kt, (b,), 0, cfg.diffusion.timesteps)
    noise = jax.random.normal(kn, batch["x0"].shape, jnp.float32).astype(
        batch["x0"].dtype
    )
    loss, grads = jax.value_and_grad(diffusion_loss)(
        state.params, unet_params, cfg,
        sqrt_abar, sqrt_one_minus_abar,
        batch["x0"], batch["hint"], batch["ctx"], t, noise,
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), loss


def make_schedule_buffers(cfg: PipelineConfig):
    d = cfg.diffusion
    sched = DiffusionSchedule(d.timesteps, d.linear_start, d.linear_end, d.schedule)
    return (
        jnp.asarray(sched.sqrt_alphas_cumprod),
        jnp.asarray(sched.sqrt_one_minus_alphas_cumprod),
    )
