"""k-diffusion sampler family — Euler, Euler-ancestral, Heun.

Beyond-reference feature (the reference ships DDIM only,
cldm/ddim_hacked.py): the three most widely used samplers of the
k-diffusion / Karras et al. (arXiv:2206.00364) family, in the same TPU
shape as pipeline/ddim.py — the whole loop is one `lax.scan`, CFG runs as
a batch-2 concat through a single ControlNet+UNet eval per step, the hint
embedding and every cross-attention K/V projection are hoisted out of the
loop, and per-step schedule constants are scan inputs. Karras vs uniform
sigma spacing therefore shares ONE compiled program per sampler (the
spacing only changes the schedule arrays), exactly like
pipeline/dpm_solver.py's dpmpp/dpmpp-karras pair.

Coordinates: the latent state x stays in VP space (the model's native
input). The k-diffusion updates are written over the VE ("karras") sigma
sigk = sigma_t / alpha_t with the scaled latent xhat = x / alpha_t:

    eps     = model eps-prediction (v-param converted via the VP identity)
    Euler   : xhat' = xhat + (sigk_next - sigk_cur) * eps
    Euler-a : xhat' = xhat + (sigk_down - sigk_cur) * eps + sigk_up * noise
              sigk_up   = sigk_next * sqrt(sigk_cur^2 - sigk_next^2) / sigk_cur
              sigk_down = sqrt(sigk_next^2 - sigk_up^2)
    Heun    : d1 = eps(xhat, t); xhat_e = xhat + dk * d1
              d2 = eps(xhat_e, t_next); xhat' = xhat + dk * (d1 + d2) / 2
              (final step: plain Euler — sigk_next == 0 has no model eval)
    then      x' = xhat' * alpha_next

The boundary grid ends at sigma == 0 (alpha == 1), so the final state IS
the clean x0 prediction — the k-diffusion convention. Model-eval t comes
from log-sigma interpolation over the trained discrete schedule for the
Karras spacing (fractional t; the sinusoidal timestep embedding is
continuous) and from the exact grid for uniform spacing.

Eval counts: Euler/Euler-a = N, Heun = 2N - 1 (the last step's midpoint
would sit at sigma 0 where eps is undefined, so it is a plain Euler step
traced OUTSIDE the scan — no wasted eval, at the cost of one extra UNet
instance in the program).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.config import ControlNetConfig
from stablediffusioneo_tpu.models.controlnet import hint_block_apply
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.ddim import (
    _cfg_combine,
    _cfg_eval,
    _hoist_context_kv,
    _step_noise,
)

KDIFF_SAMPLERS = ("euler", "euler-a", "heun")


def kdiff_schedule(
    schedule: DiffusionSchedule, num_steps: int,
    spacing: str = "karras", rho: float = 7.0,
) -> Dict[str, np.ndarray]:
    """Per-step boundary constants in SAMPLING order.

    Keys (each (num_steps,) float32): t / t_next (model-eval times at the
    step's start/end boundary; t_next of the final step is 0 and unused —
    sigk_next there is 0), alpha_cur/alpha_next (VP alphas), sigk_cur/
    sigk_next (VE sigmas; sigk_next[-1] == 0), sigk_down/sigk_up (the
    ancestral noise split; zero wherever sigk_next is 0 — with eta_a = 1,
    sigk_down collapses to sigk_next^2 / sigk_cur), step_idx (int32).

    spacing="karras": rho-7 power ramp over [sigk_max, sigk_min] then a
    final 0 (k-diffusion's get_sigmas_karras convention). spacing="uniform":
    eval points on the round(linspace(T-1, 0, N)) grid, final boundary 0.
    Same shapes/keys either way -> one compiled program per sampler.
    """
    abar = schedule.alphas_cumprod
    log_sig = 0.5 * (np.log1p(-abar) - np.log(abar))  # increasing in t
    if spacing == "karras":
        sig_min, sig_max = np.exp(log_sig[0]), np.exp(log_sig[-1])
        ramp = np.linspace(0.0, 1.0, num_steps)
        sig_eval = (sig_max ** (1 / rho)
                    + ramp * (sig_min ** (1 / rho) - sig_max ** (1 / rho))
                    ) ** rho                           # descending, N points
        ts_eval = np.interp(np.log(sig_eval), log_sig,
                            np.arange(len(abar), dtype=np.float64))
    elif spacing == "uniform":
        ts_eval = np.linspace(schedule.num_timesteps - 1, 0,
                              num_steps).round().astype(np.float64)
        sig_eval = np.exp(np.interp(ts_eval, np.arange(len(abar)), log_sig))
    else:
        raise ValueError(f"unknown kdiff spacing {spacing!r}")
    sigk = np.concatenate([sig_eval, [0.0]])           # N+1 boundaries
    a = 1.0 / np.sqrt(1.0 + sigk ** 2)                 # VP alpha; a[-1]=1
    sk_c, sk_n = sigk[:-1], sigk[1:]
    # ancestral split (eta_a = 1): up = sk_n * sqrt(sk_c^2 - sk_n^2) / sk_c
    with np.errstate(invalid="ignore", divide="ignore"):
        sk_up = np.where(
            sk_n > 0.0,
            sk_n * np.sqrt(np.maximum(sk_c ** 2 - sk_n ** 2, 0.0))
            / np.maximum(sk_c, 1e-20),
            0.0,
        )
    sk_down = np.sqrt(np.maximum(sk_n ** 2 - sk_up ** 2, 0.0))
    t_next = np.concatenate([ts_eval[1:], [0.0]])
    f32 = lambda v: np.asarray(v, np.float32)  # noqa: E731
    return {
        "t": f32(ts_eval), "t_next": f32(t_next),
        "alpha_cur": f32(a[:-1]), "alpha_next": f32(a[1:]),
        "sigk_cur": f32(sk_c), "sigk_next": f32(sk_n),
        "sigk_down": f32(sk_down), "sigk_up": f32(sk_up),
        "step_idx": np.arange(num_steps, dtype=np.int32),
    }


def kdiff_sample_scan(
    unet_params,
    controlnet_params,
    cfg: ControlNetConfig,
    sched: Dict[str, np.ndarray],
    x_T: jax.Array,
    hint: jax.Array,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    scale: jax.Array,
    control_scales: jax.Array,
    key: jax.Array,
    sampler: str = "euler",
    guess_mode: bool = False,
    parameterization: str = "eps",
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """Euler / Euler-ancestral / Heun loop. Returns x0 latents.

    key: one PRNGKey (2,) or (B, 2) per-sample keys (the serving seeds
    variant) — used only by "euler-a"; the other two are deterministic ODE
    solvers. Multi-ControlNet composes as in ddim_sample_scan (tuple
    params/hints/scales, taps summed in controlled_unet_apply)."""
    if sampler not in KDIFF_SAMPLERS:
        raise ValueError(f"unknown k-diffusion sampler {sampler!r}")
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
    consts = jax.tree.map(jnp.asarray, sched)

    def eps_at(x, t, alpha_c, sigk_c):
        """CFG-combined eps prediction at VP state x, in f32."""
        b = x.shape[0]
        tb = jnp.full((b,), t, jnp.float32)
        e_c, e_u = _cfg_eval(
            unet_params, controlnet_params, cfg, x, guided_hint, tb,
            ctx_cond, ctx_uncond, control_scales, guess_mode,
            hoisted_kv=hoisted_kv,
        )
        m = _cfg_combine(e_c, e_u, scale, x, cfg_rescale).astype(jnp.float32)
        if parameterization == "v":
            # eps = alpha * v + sigma_vp * x, with sigma_vp = sigk * alpha
            return alpha_c * m + (sigk_c * alpha_c) * x.astype(jnp.float32)
        return m

    dtype = x_T.dtype

    def euler_body(x, ps):
        a_c, a_n = ps["alpha_cur"], ps["alpha_next"]
        sk_c, sk_n = ps["sigk_cur"], ps["sigk_next"]
        eps = eps_at(x, ps["t"], a_c, sk_c)
        xhat = x.astype(jnp.float32) / a_c
        xhat = xhat + (sk_n - sk_c) * eps
        return (xhat * a_n).astype(dtype), ()

    def euler_a_body(x, ps):
        a_c, a_n = ps["alpha_cur"], ps["alpha_next"]
        sk_c = ps["sigk_cur"]
        eps = eps_at(x, ps["t"], a_c, sk_c)
        xhat = x.astype(jnp.float32) / a_c
        xhat = xhat + (ps["sigk_down"] - sk_c) * eps
        noise = _step_noise(key, ps["step_idx"], xhat.shape)
        xhat = xhat + ps["sigk_up"] * noise
        return (xhat * a_n).astype(dtype), ()

    def heun_body(x, ps):
        a_c, a_n = ps["alpha_cur"], ps["alpha_next"]
        sk_c, sk_n = ps["sigk_cur"], ps["sigk_next"]
        eps1 = eps_at(x, ps["t"], a_c, sk_c)
        xhat = x.astype(jnp.float32) / a_c
        dk = sk_n - sk_c
        x_e = ((xhat + dk * eps1) * a_n).astype(dtype)    # Euler predictor
        eps2 = eps_at(x_e, ps["t_next"], a_n, sk_n)       # corrector eval
        xhat = xhat + dk * 0.5 * (eps1 + eps2)
        return (xhat * a_n).astype(dtype), ()

    if sampler == "heun":
        # 2-eval body over the first N-1 steps; the final step (to sigma 0)
        # is plain Euler, traced once outside the scan.
        head = jax.tree.map(lambda v: v[:-1], consts)
        tail = jax.tree.map(lambda v: v[-1], consts)
        x, _ = jax.lax.scan(heun_body, x_T, head)
        x, _ = euler_body(x, tail)
        return x
    body = euler_a_body if sampler == "euler-a" else euler_body
    x, _ = jax.lax.scan(body, x_T, consts)
    return x
