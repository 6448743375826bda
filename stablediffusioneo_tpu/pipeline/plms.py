"""PLMS sampler — pseudo linear multistep (PNDM), the upstream SD-1 default.

The reference's snapshot gitignored `ldm/models/diffusion/` (SURVEY §0);
upstream that package ships DDIMSampler AND PLMSSampler (Liu et al. 2022,
arXiv:2202.09778 — "pseudo numerical methods for diffusion models"). The
DDIM equivalent lives in pipeline/ddim.py; this module completes the
sampler set with PLMS, in the same TPU shape: one `lax.scan`, CFG
batch-2, hoisted hint embedding + context K/V.

Method (plms.py::p_sample_plms): a 4th-order Adams-Bashforth ladder over
eps predictions, stepped through the deterministic (eta = 0) DDIM
transfer function x' = sqrt(a_prev) x0 + sqrt(1 - a_prev) e':

    step 0 : e' = (e_t + e(x', t_next)) / 2      (Heun-style priming,
                                                  2 model evals)
    step 1 : e' = (3 e_t - e_{-1}) / 2
    step 2 : e' = (23 e_t - 16 e_{-1} + 5 e_{-2}) / 12
    step 3+: e' = (55 e_t - 59 e_{-1} + 37 e_{-2} - 9 e_{-3}) / 24

Step 0 (its second eval is a different call graph) is traced before the
scan; steps 1..N-1 share a uniform 1-eval body with the ladder
coefficients where-selected by the step counter. Eval count: N + 1.
PLMS is eta-0 only (upstream asserts ddim_eta == 0).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import ControlNetConfig
from stablediffusioneo_tpu.models.controlnet import hint_block_apply
from stablediffusioneo_tpu.pipeline.ddim import (
    _cfg_combine,
    _cfg_eval,
    _hoist_context_kv,
)


def plms_sample_scan(
    unet_params,
    controlnet_params,
    cfg: ControlNetConfig,
    sched: Dict,
    x_T: jax.Array,
    hint: jax.Array,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    scale: jax.Array,
    control_scales: jax.Array,
    guess_mode: bool = False,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """PLMS loop over a DiffusionSchedule.ddim(steps, eta=0) schedule.
    Deterministic; returns x0 latents."""
    if isinstance(controlnet_params, (tuple, list)):
        guided_hint = tuple(
            hint_block_apply(cp["input_hint_block"], h.astype(x_T.dtype))
            for cp, h in zip(controlnet_params, hint))
    else:
        guided_hint = hint_block_apply(
            controlnet_params["input_hint_block"], hint.astype(x_T.dtype)
        )
    hoisted_kv = _hoist_context_kv(
        unet_params, controlnet_params, cfg, ctx_cond, ctx_uncond, guess_mode
    )

    def eps_at(x, t, a_t, sqrt_1m_at):
        """CFG-combined eps prediction (v-param converted), f32."""
        b = x.shape[0]
        tb = jnp.full((b,), t, jnp.float32)
        e_c, e_u = _cfg_eval(
            unet_params, controlnet_params, cfg, x, guided_hint, tb,
            ctx_cond, ctx_uncond, control_scales, guess_mode,
            hoisted_kv=hoisted_kv,
        )
        m = _cfg_combine(e_c, e_u, scale, x, cfg_rescale).astype(jnp.float32)
        if parameterization == "v":
            return jnp.sqrt(a_t) * m + sqrt_1m_at * x.astype(jnp.float32)
        return m

    def transfer(x, e, a_t, a_prev, sqrt_1m_at):
        """Deterministic DDIM update (get_x_prev_and_pred_x0, eta = 0)."""
        xf = x.astype(jnp.float32)
        pred_x0 = (xf - sqrt_1m_at * e) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    dtype = x_T.dtype
    # schedule arrays may be engine INPUTS (tracers) — index with jnp only
    ts = jnp.asarray(sched["timesteps"], jnp.float32)
    al = jnp.asarray(sched["alphas"], jnp.float32)
    ap = jnp.asarray(sched["alphas_prev"], jnp.float32)
    s1m = jnp.asarray(sched["sqrt_one_minus_alphas"], jnp.float32)
    n = ts.shape[0]

    # --- step 0: Heun-style priming (2 evals, unique graph)
    e0 = eps_at(x_T, ts[0], al[0], s1m[0])
    x_probe = transfer(x_T, e0, al[0], ap[0], s1m[0]).astype(dtype)
    # eval at (x_probe, t_next) with t_next's alpha for the v conversion
    if n > 1:
        t_next0, a_next0, s1m_next0 = ts[1], al[1], s1m[1]
    else:
        t_next0 = jnp.zeros((), jnp.float32)
        a_next0 = ap[0]
        s1m_next0 = jnp.sqrt(jnp.maximum(1.0 - ap[0], 0.0))
    e_next = eps_at(x_probe, t_next0, a_next0, s1m_next0)
    e_prime = 0.5 * (e0 + e_next)
    x = transfer(x_T, e_prime, al[0], ap[0], s1m[0]).astype(dtype)

    if n == 1:
        return x

    # --- steps 1..N-1: uniform multistep body
    consts = (
        ts[1:], al[1:], ap[1:], s1m[1:],
        jnp.arange(1, n, dtype=jnp.int32),
    )

    def body(carry, per_step):
        x, e1, e2, e3 = carry           # e1 newest ... e3 oldest
        t, a_t, a_prev, s1m, idx = per_step
        e_t = eps_at(x, t, a_t, s1m)
        ab2 = (3.0 * e_t - e1) / 2.0
        ab3 = (23.0 * e_t - 16.0 * e1 + 5.0 * e2) / 12.0
        ab4 = (55.0 * e_t - 59.0 * e1 + 37.0 * e2 - 9.0 * e3) / 24.0
        e_p = jnp.where(idx == 1, ab2, jnp.where(idx == 2, ab3, ab4))
        x_next = transfer(x, e_p, a_t, a_prev, s1m).astype(dtype)
        return (x_next, e_t, e1, e2), ()

    init = (x, e0, jnp.zeros_like(e0), jnp.zeros_like(e0))
    (x, _, _, _), _ = jax.lax.scan(body, init, consts)
    return x
