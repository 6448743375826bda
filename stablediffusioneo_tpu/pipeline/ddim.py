"""DDIM sampler — the denoise loop as a single `lax.scan`.

Re-design of the reference's two samplers:
  - torch `DDIMSampler.sample -> ddim_sampling -> p_sample_ddim`
    (cldm/ddim_hacked.py:54-231)
  - TRT `sample_simple` — the flattened loop driving ControlNet+UNet engines
    on two CUDA streams with CUDA graphs (cldm_trt/ddim_hacked.py:88-197)

TPU-first mapping:
  * the whole loop is ONE compiled XLA program (`lax.scan`) — the principled
    version of CUDA-graph capture/replay;
  * classifier-free guidance runs as a batch-2 concat through a single
    ControlNet+UNet evaluation per step, instead of the reference's two
    sequential passes / two overlapped streams — on TPU the batch dimension
    feeds the MXU directly and needs no stream choreography;
  * guess-mode (uncond WITHOUT control, cldm/cldm.py:334-335) changes the
    traced graph, so it is a distinct compiled variant, exactly as the
    reference builds distinct engines;
  * per-step schedule constants are scan inputs (stacked arrays), noise is
    folded from one PRNG key per step.

Update equations (p_sample_ddim, ddim_hacked.py:208-231):
    e_t    = e_uncond + scale * (e_cond - e_uncond)
    pred_x0 = (x - sqrt(1-a_t) * e_t) / sqrt(a_t)
    dir_xt = sqrt(1 - a_prev - sigma_t^2) * e_t
    x_prev = sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise * temperature
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.config import ControlNetConfig, PipelineConfig
from stablediffusioneo_tpu.models.controlnet import (
    controlled_unet_apply,
    guess_mode_scales,
)
from stablediffusioneo_tpu.models.unet import encoder_plan, unet_apply
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule


def _cfg_eval(
    unet_params,
    controlnet_params,
    cfg: ControlNetConfig,
    x,
    guided_hint,
    t,
    ctx_cond,
    ctx_uncond,
    control_scales,
    guess_mode: bool,
    hoisted_kv=None,
):
    """One CFG step: returns (e_cond, e_uncond).

    Normal mode: batch-2 concat through one ControlNet+UNet eval (both
    branches consume the hint, matching canny2image_TRT.py:72 where un_cond
    also carries c_concat). Guess mode: cond with control, uncond without
    (different graph, cldm/cldm.py:334-335).

    guided_hint is the PRECOMPUTED hint-block embedding (constant across
    steps — hoisted out of the scan by the caller). hoisted_kv: optional
    precomputed cross-attention K/V trees from _hoist_context_kv — like the
    hint embedding, the context projections are step-invariant.
    """
    b = x.shape[0]
    if guess_mode:
        ukv_c, ckv_c, ukv_u = hoisted_kv if hoisted_kv is not None else (None,) * 3
        e_cond = controlled_unet_apply(
            unet_params, controlnet_params, cfg, x, None, t, ctx_cond,
            control_scales=control_scales, guided_hint=guided_hint,
            unet_ctx_kv=ukv_c, ctrl_ctx_kv=ckv_c,
        )
        e_uncond = controlled_unet_apply(
            unet_params, controlnet_params, cfg, x, None, t, ctx_uncond,
            unet_ctx_kv=ukv_u,
        )
        return e_cond, e_uncond
    ukv2, ckv2 = hoisted_kv if hoisted_kv is not None else (None, None)
    x2 = jnp.concatenate([x, x], axis=0)
    # guided_hint is one embedding or (multi-ControlNet) a tuple of them
    gh2 = jax.tree.map(lambda g: jnp.concatenate([g, g], axis=0),
                       guided_hint)
    t2 = jnp.concatenate([t, t], axis=0)
    ctx2 = jnp.concatenate([ctx_cond, ctx_uncond], axis=0)
    eps2 = controlled_unet_apply(
        unet_params, controlnet_params, cfg, x2, None, t2, ctx2,
        control_scales=_tile_cfg(control_scales), guided_hint=gh2,
        unet_ctx_kv=ukv2, ctrl_ctx_kv=ckv2,
    )
    return eps2[:b], eps2[b:]


def _hoist_context_kv(unet_params, controlnet_params, cfg: ControlNetConfig,
                      ctx_cond, ctx_uncond, guess_mode: bool):
    """Precompute every cross-attention K/V projection outside the denoise
    scan (they depend only on the step-invariant context). Returns the
    `hoisted_kv` structure _cfg_eval expects for the given mode:
    normal -> (unet_kv, ctrl_kv) over the CFG batch-2 concat context;
    guess -> (unet_kv_cond, ctrl_kv_cond, unet_kv_uncond)."""
    from stablediffusioneo_tpu.models.controlnet import (
        precompute_controlnet_context_kv,
    )
    from stablediffusioneo_tpu.models.unet import precompute_context_kv

    ucfg = cfg.unet

    def ctrl_kv(ctx):
        if isinstance(controlnet_params, (tuple, list)):
            return tuple(precompute_controlnet_context_kv(cp, cfg, ctx)
                         for cp in controlnet_params)
        return precompute_controlnet_context_kv(controlnet_params, cfg, ctx)

    if guess_mode:
        return (
            precompute_context_kv(unet_params, ucfg, ctx_cond),
            ctrl_kv(ctx_cond),
            precompute_context_kv(unet_params, ucfg, ctx_uncond),
        )
    ctx2 = jnp.concatenate([ctx_cond, ctx_uncond], axis=0)
    return (
        precompute_context_kv(unet_params, ucfg, ctx2),
        ctrl_kv(ctx2),
    )


def _tile_cfg(control_scales):
    """Per-sample (B, 13) control scales tiled to the CFG batch-2B concat;
    shared (13,)/list scales pass through (broadcast over batch). A tuple
    (multi-ControlNet: one entry per net) tiles per net."""
    if isinstance(control_scales, tuple):
        return tuple(_tile_cfg(c) for c in control_scales)
    if isinstance(control_scales, jax.Array) and control_scales.ndim == 2:
        return jnp.concatenate([control_scales, control_scales], axis=0)
    return control_scales


def _step_noise(key, step_idx, shape):
    """Per-step stochastic noise (eta > 0). key is either one PRNGKey (2,)
    shared by the batch, or (B, 2) per-sample keys — then each sample's
    noise depends only on its own key, so a request's output is identical
    whether it runs at batch 1 or inside a serving batch (per-request
    reproducibility; the reference's per-request torch generator analog,
    cldm_trt/ddim_hacked.py:119-121)."""
    idx = step_idx.astype(jnp.int32)
    if key.ndim == 2:  # (B, 2) per-sample keys
        return jax.vmap(
            lambda k: jax.random.normal(
                jax.random.fold_in(k, idx), shape[1:], jnp.float32)
        )(key)
    return jax.random.normal(jax.random.fold_in(key, idx), shape, jnp.float32)


def _bc_scale(scale, x):
    """Guidance scale as a scalar (shared) or (B,) vector (per-sample,
    serving-layer batches) broadcast against (B, H, W, C)."""
    s = jnp.asarray(scale, x.dtype)
    if s.ndim == 1:
        return s.reshape(-1, *([1] * (x.ndim - 1)))
    return s


def _cfg_combine(e_c, e_u, scale, x, rescale: float = 0.0):
    """CFG combine with optional guidance rescale (Lin et al.,
    arXiv:2305.08891 §3.4; diffusers' guidance_rescale): renormalize the
    combined prediction's per-sample std toward the conditional branch's,
    then lerp by `rescale` — fixes v-prediction over-saturation at high
    scales. rescale is a STATIC trace-time float; 0.0 (default) traces
    the plain combine, so existing engines are bit-identical."""
    out = e_u + _bc_scale(scale, x) * (e_c - e_u)
    if rescale:
        dims = tuple(range(1, out.ndim))
        of = out.astype(jnp.float32)
        std_pos = jnp.std(e_c.astype(jnp.float32), axis=dims, keepdims=True)
        std_cfg = jnp.std(of, axis=dims, keepdims=True)
        renorm = of * (std_pos / jnp.maximum(std_cfg, 1e-8))
        out = (rescale * renorm + (1.0 - rescale) * of).astype(out.dtype)
    return out


def ddim_scan_step(
    unet_params,
    controlnet_params,
    cfg: ControlNetConfig,
    guess_mode: bool,
    temperature: float,
    x,
    step_consts,
    guided_hint,
    ctx_cond,
    ctx_uncond,
    scale,
    control_scales,
    key,
    parameterization: str = "eps",
    hoisted_kv=None,
    cfg_rescale: float = 0.0,
):
    """One DDIM step (p_sample_ddim equivalent). step_consts =
    (t, a_t, a_prev, sigma_t, sqrt_one_minus_at, step_idx). guided_hint is
    the precomputed hint embedding (see ddim_sample_scan).

    parameterization: "eps" (SD-1.5) or "v" (SD-2.x v-prediction;
    p_sample_ddim's predict_eps/start_from_z_and_v branches,
    ddim_hacked.py:194-218)."""
    t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx = step_consts
    b = x.shape[0]
    tb = jnp.full((b,), t, jnp.float32)
    e_cond, e_uncond = _cfg_eval(
        unet_params, controlnet_params, cfg, x, guided_hint, tb,
        ctx_cond, ctx_uncond, control_scales, guess_mode,
        hoisted_kv=hoisted_kv,
    )
    model_out = _cfg_combine(e_cond, e_uncond, scale, x, cfg_rescale)
    # fp32 island for the state update: tiny per-step errors compound over
    # the scan, so x is carried in fp32 even when the nets run bf16.
    xf = x.astype(jnp.float32)
    mf = model_out.astype(jnp.float32)
    sqrt_at = jnp.sqrt(a_t)
    if parameterization == "v":
        ef = sqrt_at * mf + sqrt_1m_at * xf           # predict_eps_from_z_and_v
        pred_x0 = sqrt_at * xf - sqrt_1m_at * mf      # predict_start_from_z_and_v
    else:
        ef = mf
        pred_x0 = (xf - sqrt_1m_at * ef) / sqrt_at
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * ef
    noise = sigma_t * _step_noise(key, step_idx, xf.shape) * temperature
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
    return x_prev.astype(x.dtype), pred_x0


def ddim_sample_scan(
    unet_params,
    controlnet_params,
    cfg: ControlNetConfig,
    schedule: Dict[str, np.ndarray],
    x_T: jax.Array,
    hint: jax.Array,
    ctx_cond: jax.Array,
    ctx_uncond: jax.Array,
    scale: jax.Array,
    control_scales: jax.Array,
    key: jax.Array,
    guess_mode: bool = False,
    temperature: float = 1.0,
    parameterization: str = "eps",
    encoder_cache_interval: int = 1,
    inpaint_latent: Optional[jax.Array] = None,
    inpaint_mask: Optional[jax.Array] = None,
    cfg_rescale: float = 0.0,
) -> jax.Array:
    """Full DDIM sampling loop as one lax.scan. Returns x_0 latents.
    cfg_rescale: static guidance-rescale weight (see _cfg_combine).

    schedule: dict from DiffusionSchedule.ddim() (already in sampling order).

    inpaint_latent/inpaint_mask enable blended-latent inpainting (beyond
    the reference; Avrahami et al., arXiv:2206.02779): after every DDIM
    update the kept region (mask == 0) is replaced by the original latent
    forward-diffused to the step's noise level, and the final x_0 blends
    the clean original back in. mask is (B, h, w, 1) in [0, 1] with 1 =
    generate; with mask == 1 everywhere the output is bit-identical to
    plain sampling. Not supported together with encoder_cache_interval.

    encoder_cache_interval > 1 enables encoder-feature caching ("Faster
    Diffusion", Li et al. 2023, arXiv:2312.09608): the UNet encoder +
    ControlNet run only on key steps; in between, the cached (control-
    merged) skip features are reused and only the decoder runs with the
    fresh timestep embedding. Training-free acceleration with a small
    fidelity cost — off by default, not supported in guess mode.
    """
    from stablediffusioneo_tpu.models.controlnet import hint_block_apply

    # the hint embedding depends only on the hint: compute ONCE, outside the
    # scan (the reference's per-step engines recompute it every step).
    # Multi-ControlNet: tuple params + tuple hints -> tuple embeddings.
    if isinstance(controlnet_params, (tuple, list)):
        if encoder_cache_interval > 1:
            raise ValueError("multi-ControlNet + encoder caching is "
                             "unsupported")
        guided_hint = tuple(
            hint_block_apply(cp["input_hint_block"], h.astype(x_T.dtype))
            for cp, h in zip(controlnet_params, hint))
    else:
        guided_hint = hint_block_apply(
            controlnet_params["input_hint_block"], hint.astype(x_T.dtype)
        )
    # likewise every cross-attention K/V projection of the step-invariant
    # context — hoisted out of the loop (XLA's LICM does not lift dots)
    hoisted_kv = _hoist_context_kv(
        unet_params, controlnet_params, cfg, ctx_cond, ctx_uncond, guess_mode
    )

    n_steps = len(schedule["timesteps"])
    consts = (
        jnp.asarray(schedule["timesteps"], jnp.float32),
        jnp.asarray(schedule["alphas"], jnp.float32),
        jnp.asarray(schedule["alphas_prev"], jnp.float32),
        jnp.asarray(schedule["sigmas"], jnp.float32),
        jnp.asarray(schedule["sqrt_one_minus_alphas"], jnp.float32),
        jnp.arange(n_steps, dtype=jnp.int32),
    )

    if inpaint_latent is not None and encoder_cache_interval > 1:
        raise ValueError("inpainting + encoder caching is unsupported "
                         "(the cached-step features would mix blended and "
                         "unblended latents)")

    if encoder_cache_interval > 1 and not guess_mode:
        return _ddim_scan_enc_cached(
            unet_params, controlnet_params, cfg, consts, n_steps, x_T,
            guided_hint, ctx_cond, ctx_uncond, scale, control_scales, key,
            temperature, parameterization, encoder_cache_interval,
            hoisted_kv, cfg_rescale,
        )

    # per-step forward-diffusion noise for the kept region derives from a
    # key decorrelated from the eta noise (distinct fold tag); key may be
    # one PRNGKey (2,) or (B, 2) per-sample keys (the seeds engine variant)
    if inpaint_latent is not None:
        ikey = (jax.vmap(lambda k: jax.random.fold_in(k, 0x1B9A1))(key)
                if key.ndim == 2 else jax.random.fold_in(key, 0x1B9A1))
    else:
        ikey = None

    def body(x, per_step):
        x_next, _ = ddim_scan_step(
            unet_params, controlnet_params, cfg, guess_mode, temperature,
            x, per_step, guided_hint, ctx_cond, ctx_uncond, scale,
            control_scales, key, parameterization=parameterization,
            hoisted_kv=hoisted_kv, cfg_rescale=cfg_rescale,
        )
        if inpaint_latent is not None:
            a_prev, step_idx = per_step[2], per_step[5]
            noised = (jnp.sqrt(a_prev)
                      * inpaint_latent.astype(jnp.float32)
                      + jnp.sqrt(1.0 - a_prev)
                      * _step_noise(ikey, step_idx, x_next.shape))
            m = inpaint_mask.astype(jnp.float32)
            x_next = (m * x_next.astype(jnp.float32)
                      + (1.0 - m) * noised).astype(x_next.dtype)
        return x_next, ()

    x0, _ = jax.lax.scan(body, x_T, consts)
    if inpaint_latent is not None:
        m = inpaint_mask.astype(jnp.float32)
        x0 = (m * x0.astype(jnp.float32)
              + (1.0 - m) * inpaint_latent.astype(jnp.float32)
              ).astype(x0.dtype)
    return x0


def _ddim_update(x, model_out, per_step, key, temperature, parameterization):
    """The p_sample_ddim state update, shared by all scan variants."""
    t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx = per_step
    xf = x.astype(jnp.float32)
    mf = model_out.astype(jnp.float32)
    sqrt_at = jnp.sqrt(a_t)
    if parameterization == "v":
        ef = sqrt_at * mf + sqrt_1m_at * xf
        pred_x0 = sqrt_at * xf - sqrt_1m_at * mf
    else:
        ef = mf
        pred_x0 = (xf - sqrt_1m_at * ef) / sqrt_at
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * ef
    noise = sigma_t * _step_noise(key, step_idx, xf.shape) * temperature
    return (jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise).astype(x.dtype)


def _ddim_scan_enc_cached(
    unet_params, controlnet_params, cfg, consts, n_steps, x_T,
    guided_hint, ctx_cond, ctx_uncond, scale, control_scales, key,
    temperature, parameterization, interval, hoisted_kv=None,
    cfg_rescale: float = 0.0,
):
    """Encoder-cached DDIM loop (arXiv:2312.09608): key steps run
    ControlNet + full UNet and refresh the cached control-merged features;
    non-key steps run ONLY the UNet decoder on the cache with the fresh
    timestep embedding. The last two steps always run full."""
    from stablediffusioneo_tpu.models.controlnet import controlnet_apply
    from stablediffusioneo_tpu.models.unet import (
        _embed_timesteps, unet_decode, unet_encode, unet_middle, unet_out,
    )

    ucfg = cfg.unet
    b = x_T.shape[0]
    x2_T = jnp.concatenate([x_T, x_T], axis=0)
    gh2 = jnp.concatenate([guided_hint, guided_hint], axis=0)
    ctx2 = jnp.concatenate([ctx_cond, ctx_uncond], axis=0)
    ukv2, ckv2 = hoisted_kv if hoisted_kv is not None else (None, None)

    run_full = np.zeros(n_steps, bool)
    run_full[::interval] = True
    run_full[-2:] = True
    consts = consts + (jnp.asarray(run_full),)

    def full_parts(x2, t2):
        emb = _embed_timesteps(unet_params, ucfg, t2, x2.dtype)
        ctrl = controlnet_apply(
            controlnet_params, cfg, x2, None, t2, ctx2, guided_hint=gh2,
            ctx_kv=ckv2,
        )
        from stablediffusioneo_tpu.models.controlnet import scale_control
        ctrl = scale_control(ctrl, _tile_cfg(control_scales))
        h, hs = unet_encode(unet_params, ucfg, x2, emb, ctx2, ctx_kv=ukv2)
        h = unet_middle(unet_params, ucfg, h, emb, ctx2,
                        ctx_kv=ukv2) + ctrl[-1].astype(x2.dtype)
        merged = [s + c.astype(s.dtype) for s, c in zip(hs, ctrl[:-1])]
        return h, merged

    def decode_eps(h, merged, t2):
        emb = _embed_timesteps(unet_params, ucfg, t2, h.dtype)
        out = unet_decode(unet_params, ucfg, h, merged, emb, ctx2,
                          ctx_kv=ukv2)
        return unet_out(unet_params, ucfg, out)

    # initialize the carry cache with zeros of the right shapes/dtypes
    # (step 0 is itself a full step, so the init value is never read;
    # eval_shape avoids paying a real UNet+ControlNet forward for it)
    t0 = jnp.full((2 * b,), consts[0][0], jnp.float32)
    cache0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(full_parts, x2_T, t0),
    )

    def body(carry, per_step_all):
        x, cache = carry
        per_step, is_full = per_step_all[:-1], per_step_all[-1]
        t2 = jnp.full((2 * b,), per_step[0], jnp.float32)
        x2 = jnp.concatenate([x, x], axis=0)

        def do_full(_):
            return full_parts(x2, t2)

        def do_cached(c):
            return c

        cache = jax.lax.cond(is_full, do_full, do_cached, cache)
        eps2 = decode_eps(cache[0], cache[1], t2)
        e_cond, e_uncond = eps2[:b], eps2[b:]
        model_out = _cfg_combine(e_cond, e_uncond, scale, x, cfg_rescale)
        x_next = _ddim_update(x, model_out, per_step, key, temperature,
                              parameterization)
        return (x_next, cache), ()

    (x0, _), _ = jax.lax.scan(body, (x_T, cache0), consts)
    return x0


def stochastic_encode(
    x0: jax.Array,
    alpha_cumprod_t: float,
    key: jax.Array,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward-diffuse x0 to timestep t (DDIMSampler.stochastic_encode,
    ddim_hacked.py:257-269): sqrt(abar_t) x0 + sqrt(1-abar_t) eps."""
    if noise is None:
        noise = jax.random.normal(key, x0.shape, jnp.float32).astype(x0.dtype)
    a = jnp.asarray(alpha_cumprod_t, jnp.float32)
    return (jnp.sqrt(a) * x0.astype(jnp.float32)
            + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)).astype(x0.dtype)


def stochastic_tail_entry(schedule, t_enc: int, z0: jax.Array, key: jax.Array):
    """Shared img2img/refine entry: slice the LAST t_enc entries of a
    DDIM-schedule dict (sampling order) and forward-diffuse z0 to the
    entry step's noise level. Returns (tail_schedule, x_T, scan_key).
    The key-split order (key, kn = split(key); noise from kn) is pinned
    bit-exactly by the engine/serving parity tests — keep it."""
    n = len(schedule["timesteps"])
    if not 0 < t_enc <= n:
        raise ValueError(f"t_enc must be in (0, {n}], got {t_enc}")
    tail = {k: np.asarray(v)[n - t_enc:] for k, v in schedule.items()}
    key, kn = jax.random.split(key)
    a0 = jnp.asarray(tail["alphas"][0], jnp.float32)
    noise = jax.random.normal(kn, z0.shape, jnp.float32)
    x_T = (jnp.sqrt(a0) * z0.astype(jnp.float32)
           + jnp.sqrt(1.0 - a0) * noise).astype(z0.dtype)
    return tail, x_T, key


class DDIMSampler:
    """User-facing sampler wrapper (DDIMSampler, cldm/ddim_hacked.py:10-120).

    Holds the DDPM schedule; `sample()` assembles the scan inputs and runs
    the (optionally jitted) loop. Engine-level AOT compilation per shape
    bucket lives in runtime/engine.py; this class is the eager/debug path.
    """

    def __init__(self, pipeline_cfg: PipelineConfig, unet_params, controlnet_params):
        self.cfg = pipeline_cfg
        self.unet_params = unet_params
        self.controlnet_params = controlnet_params
        d = pipeline_cfg.diffusion
        self.schedule = DiffusionSchedule(
            d.timesteps, d.linear_start, d.linear_end, d.schedule
        )
        self.n_taps = len(encoder_plan(pipeline_cfg.unet)) + 1

    def control_scales(self, strength: float, guess_mode: bool) -> np.ndarray:
        """[strength]*13, or the guess-mode decay (canny2image_TRT.py:76-78)."""
        if guess_mode:
            return np.asarray(guess_mode_scales(strength, self.n_taps), np.float32)
        return np.full((self.n_taps,), strength, np.float32)

    def sample(
        self,
        num_steps: int,
        shape: Tuple[int, int, int, int],
        hint: jax.Array,
        ctx_cond: jax.Array,
        ctx_uncond: jax.Array,
        key: jax.Array,
        guidance_scale: float = 9.0,
        eta: float = 0.0,
        strength: float = 1.0,
        guess_mode: bool = False,
        x_T: Optional[jax.Array] = None,
        temperature: float = 1.0,
    ) -> jax.Array:
        sched = self.schedule.ddim(num_steps, eta=eta)
        if x_T is None:
            key, sub = jax.random.split(key)
            x_T = jax.random.normal(sub, shape, jnp.float32)
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        return ddim_sample_scan(
            self.unet_params,
            self.controlnet_params,
            self.cfg.controlnet,
            sched,
            x_T.astype(dtype),
            hint.astype(dtype),
            ctx_cond.astype(dtype),
            ctx_uncond.astype(dtype),
            jnp.asarray(guidance_scale, jnp.float32),
            jnp.asarray(self.control_scales(strength, guess_mode)),
            key,
            guess_mode=guess_mode,
            temperature=temperature,
            parameterization=self.cfg.diffusion.parameterization,
        )

    def img2img(
        self,
        init_latent: jax.Array,
        denoise_strength: float,
        num_steps: int,
        hint: jax.Array,
        ctx_cond: jax.Array,
        ctx_uncond: jax.Array,
        key: jax.Array,
        guidance_scale: float = 9.0,
        eta: float = 0.0,
        strength: float = 1.0,
        guess_mode: bool = False,
    ) -> jax.Array:
        """img2img: stochastic_encode to step t_enc, then DDIM-decode the
        remaining steps (DDIMSampler.encode/decode, ddim_hacked.py:233-317).

        denoise_strength in (0, 1]: fraction of the schedule re-noised and
        re-denoised (1.0 == full txt2img from pure noise on init shape).
        """
        sched = self.schedule.ddim(num_steps, eta=eta)
        t_enc = max(1, min(num_steps, int(round(denoise_strength * num_steps))))
        # arrays are in sampling (descending-t) order; take the LAST t_enc
        # entries' starting point == index num_steps - t_enc
        start = num_steps - t_enc
        sub_sched = {k: v[start:] for k, v in sched.items()}
        key, kn = jax.random.split(key)
        x_t = stochastic_encode(init_latent, float(sub_sched["alphas"][0]), kn)
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        return ddim_sample_scan(
            self.unet_params,
            self.controlnet_params,
            self.cfg.controlnet,
            sub_sched,
            x_t.astype(dtype),
            hint.astype(dtype),
            ctx_cond.astype(dtype),
            ctx_uncond.astype(dtype),
            jnp.asarray(guidance_scale, jnp.float32),
            jnp.asarray(self.control_scales(strength, guess_mode)),
            key,
            guess_mode=guess_mode,
            parameterization=self.cfg.diffusion.parameterization,
        )
