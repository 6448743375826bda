"""ControlNet + ControlledUNet composition — functional JAX, NHWC.

Re-design of the reference's `ControlNet` (cldm/cldm.py:48-305),
`ControlledUnetModel` (cldm/cldm.py:22-45) and the composition in
`ControlLDM.apply_model` (cldm/cldm.py:328-341).

ControlNet is the UNet-encoder "copy branch": same input blocks + middle
block, plus
  - `input_hint_block` (cldm.py:209-225): 8 conv+SiLU stages, three of them
    stride-2 (256x384 hint -> 32x48 = latent resolution), ending in a
    ZERO-initialized conv to model_channels;
  - one zero-init 1x1 conv tap per input block (12 for SD-1.5) and one for
    the middle block -> 13 outputs (cldm.py:284-305).

The hint embedding is added to h after the FIRST input block
(cldm.py:295-299). Zero convs are plain convs whose params start at zero
(`make_zero_conv`, cldm.py:227-229) — they train away from zero, so they are
ordinary convs at inference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import ControlNetConfig, UNetConfig
from stablediffusioneo_tpu.ops.layers import conv2d, conv_init, silu
from stablediffusioneo_tpu.models.unet import (
    _embed_timesteps,
    encoder_plan,
    init_resblock,
    init_spatial_transformer,
    init_unet,
    resblock_apply,
    spatial_transformer_apply,
    unet_apply,
    unet_middle,
)

# (cin, cout, stride) chain of the hint block, cldm/cldm.py:209-225
_HINT_CHAIN = [
    (None, 16, 1),
    (16, 16, 1),
    (16, 32, 2),
    (32, 32, 1),
    (32, 96, 2),
    (96, 96, 1),
    (96, 256, 2),
]


def init_controlnet(key, cfg: ControlNetConfig) -> Dict:
    ucfg = cfg.unet
    ks = iter(jax.random.split(key, 256))
    unet_params = init_unet(next(ks), ucfg)

    hint = []
    cin = cfg.hint_channels
    for _, cout, stride in _HINT_CHAIN:
        hint.append(conv_init(next(ks), 3, 3, cin, cout))
        cin = cout
    hint.append(conv_init(next(ks), 3, 3, cin, ucfg.model_channels, zero=True))

    zero_convs = [
        conv_init(next(ks), 1, 1, desc["cout"], desc["cout"], zero=True)
        for desc in encoder_plan(ucfg)
    ]
    mid_ch = ucfg.model_channels * ucfg.channel_mult[-1]

    out = {
        "time_embed": unet_params["time_embed"],
        "input_blocks": unet_params["input_blocks"],
        "middle_block": unet_params["middle_block"],
        "input_hint_block": hint,
        "zero_convs": zero_convs,
        "middle_block_out": conv_init(next(ks), 1, 1, mid_ch, mid_ch, zero=True),
    }
    if ucfg.adm_in_channels:
        # SDXL-style ControlNet: the control branch carries its own ADM MLP
        out["label_emb"] = unet_params["label_emb"]
    return out


def hint_block_apply(p_list: list, hint: jax.Array) -> jax.Array:
    """input_hint_block: conv+SiLU x7 (three stride-2) then zero conv."""
    h = hint
    for p, (_, _, stride) in zip(p_list[:-1], _HINT_CHAIN):
        h = conv2d(h, p, stride=stride, padding=1)
        h = silu(h)
    return conv2d(h, p_list[-1], padding=1)


def precompute_controlnet_context_kv(
    params: dict, cfg: ControlNetConfig, context: jax.Array
):
    """Cross-attention (k, v) tree for controlnet_apply from the
    step-invariant context: {"input": [site|None], "middle": site} — the
    encoder+middle subset of unet.precompute_context_kv."""
    from stablediffusioneo_tpu.ops.attention import context_kv as _ckv

    def site(st):
        return [
            _ckv(context, blk["attn2"]["wk"]["w"], blk["attn2"]["wv"]["w"])
            for blk in st["blocks"]
        ]

    return {
        "input": [
            site(p["attn"]) if "attn" in p else None
            for p in params["input_blocks"]
        ],
        "middle": site(params["middle_block"]["attn"]),
    }


def controlnet_apply(
    params: dict,
    cfg: ControlNetConfig,
    x: jax.Array,
    hint: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    guided_hint: Optional[jax.Array] = None,
    ctx_kv=None,
    y: Optional[jax.Array] = None,
) -> List[jax.Array]:
    """ControlNet.forward (cldm/cldm.py:284-305) -> 13 NHWC tensors.

    x: (N, H/8, W/8, 4); hint: (N, H, W, 3) in [0,1]; context: (N, T, 768).
    guided_hint: optional precomputed hint_block output — it depends only on
    the hint, so samplers hoist it out of the denoise loop (an optimization
    the reference's per-step TRT engine cannot make). ctx_kv: optional
    precompute_controlnet_context_kv tree (hoisted context K/V).
    """
    ucfg = cfg.unet
    kvs = ctx_kv["input"] if ctx_kv is not None else None
    emb = _embed_timesteps(params, ucfg, timesteps, x.dtype, y=y)
    if guided_hint is None:
        guided_hint = hint_block_apply(
            params["input_hint_block"], hint.astype(x.dtype)
        )

    outs = []
    h = x
    first = True
    for i, (desc, p, zc) in enumerate(zip(
        encoder_plan(ucfg), params["input_blocks"], params["zero_convs"]
    )):
        if desc["kind"] == "conv":
            h = conv2d(h, p["conv"], padding=1)
        elif desc["kind"] == "down":
            h = conv2d(h, p["down"], stride=2, padding=1)
        else:
            h = resblock_apply(p["res"], ucfg, h, emb)
            if "attn" in p:
                h = spatial_transformer_apply(
                    p["attn"], ucfg, h, context,
                    ctx_kv=None if kvs is None else kvs[i],
                )
        if first:
            h = h + guided_hint
            first = False
        outs.append(conv2d(h, zc, padding=0))

    h = unet_middle(params, ucfg, h, emb, context,
                    ctx_kv=ctx_kv)
    outs.append(conv2d(h, params["middle_block_out"], padding=0))
    return outs


def controlled_unet_apply(
    unet_params: dict,
    controlnet_params: dict,
    cfg: ControlNetConfig,
    x: jax.Array,
    hint: Optional[jax.Array],
    timesteps: jax.Array,
    context: jax.Array,
    control_scales: Optional[Sequence[float]] = None,
    only_mid_control: bool = False,
    guided_hint: Optional[jax.Array] = None,
    unet_ctx_kv=None,
    ctrl_ctx_kv=None,
    y: Optional[jax.Array] = None,
) -> jax.Array:
    """ControlLDM.apply_model (cldm/cldm.py:328-341): ControlNet -> scaled
    13 taps -> UNet eps prediction.

    hint=None reproduces guess-mode's uncond branch (c_concat None,
    cldm.py:334-335): the UNet runs WITHOUT control (a distinct traced
    graph, as in the reference where it changes the ONNX graph).

    unet_ctx_kv / ctrl_ctx_kv: optional hoisted context K/V trees
    (precompute_context_kv / precompute_controlnet_context_kv).

    Multi-ControlNet (beyond the reference; the residual taps enter the
    UNet linearly, so N nets compose by summation): pass
    `controlnet_params` as a tuple of N trees, with `hint`/`guided_hint`,
    `control_scales`, and `ctrl_ctx_kv` tuples of matching length.
    """
    if hint is None and guided_hint is None:
        return unet_apply(unet_params, cfg.unet, x, timesteps, context,
                          control=None, ctx_kv=unet_ctx_kv, y=y)
    if isinstance(controlnet_params, (tuple, list)):
        n = len(controlnet_params)

        # per-net values are TUPLES (a plain list of 13 floats is a shared
        # single-net scale vector, not a per-net container)
        def pick(v, i):
            return v[i] if isinstance(v, tuple) else v

        control = None
        for i in range(n):
            taps = controlnet_apply(
                controlnet_params[i], cfg, x, pick(hint, i), timesteps,
                context, guided_hint=pick(guided_hint, i),
                ctx_kv=pick(ctrl_ctx_kv, i), y=y,
            )
            if control_scales is not None:
                taps = scale_control(taps, pick(control_scales, i))
            control = taps if control is None else [
                a + b for a, b in zip(control, taps)]
    else:
        control = controlnet_apply(
            controlnet_params, cfg, x, hint, timesteps, context,
            guided_hint=guided_hint, ctx_kv=ctrl_ctx_kv, y=y,
        )
        if control_scales is not None:
            control = scale_control(control, control_scales)
    return unet_apply(
        unet_params, cfg.unet, x, timesteps, context,
        control=control, only_mid_control=only_mid_control,
        ctx_kv=unet_ctx_kv, y=y,
    )


def scale_control(control: List[jax.Array], control_scales) -> List[jax.Array]:
    """Apply per-tap control strengths (cldm/cldm.py:338 `outs x scales`).

    control_scales: a length-13 sequence / (13,) array (one strength per
    tap, shared across the batch — the reference semantics), or a
    (B, 13) array for PER-SAMPLE strengths — the serving layer batches
    requests with different `strength` values into one engine call."""
    if isinstance(control_scales, jax.Array) and control_scales.ndim == 2:
        return [
            c * control_scales[:, i].astype(c.dtype)[:, None, None, None]
            for i, c in enumerate(control)
        ]
    return [c * jnp.asarray(s, c.dtype) for c, s in zip(control, control_scales)]


def guess_mode_scales(strength: float, n: int = 13) -> List[float]:
    """Guess-mode decay schedule strength * 0.825^(12-i) (canny2image_TRT.py:78)."""
    return [strength * (0.825 ** (float(n - 1 - i))) for i in range(n)]
