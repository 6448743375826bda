"""Training subsystem: ControlNet fine-tuning on TPU meshes.

Re-design of the reference's (vendored, upstream-ControlNet) training hooks:
`ControlLDM.configure_optimizers` — AdamW over ControlNet params with the
`sd_locked` gate (cldm/cldm.py:416-423), the DDPM eps-prediction loss from
the missing ldm.models.diffusion.ddpm, `LitEma` (ldm/modules/ema.py:5-76),
and the `ImageLogger` callback (cldm/logger.py:11-77).
"""

from stablediffusioneo_tpu.training.trainer import (
    TrainState,
    create_train_state,
    train_step,
    diffusion_loss,
)
from stablediffusioneo_tpu.training.ema import ema_init, ema_update
from stablediffusioneo_tpu.training.lora import (
    init_lora,
    load_lora,
    lora_sites,
    lora_train_step,
    merge_lora,
    save_lora,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "train_step",
    "diffusion_loss",
    "ema_init",
    "ema_update",
    "init_lora",
    "lora_sites",
    "lora_train_step",
    "merge_lora",
    "save_lora",
    "load_lora",
]
