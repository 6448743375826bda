"""Exponential moving average of params (LitEma, ldm/modules/ema.py:5-76).

Functional: the EMA state is a (shadow_params, num_updates) tuple; decay
warms up as min(decay, (1+n)/(10+n)) exactly like the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ema_init(params) -> Tuple:
    return (jax.tree.map(jnp.asarray, params), jnp.zeros((), jnp.int32))


def ema_update(ema_state: Tuple, params, decay: float = 0.9999) -> Tuple:
    shadow, n = ema_state
    n = n + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    new_shadow = jax.tree.map(lambda s, p: s * d + (1.0 - d) * p, shadow, params)
    return (new_shadow, n)
