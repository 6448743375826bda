"""SD-1.5 UNet — functional JAX, NHWC.

Re-design of the reference's `UNetModel`
(ldm/modules/diffusionmodules/openaimodel.py:443-788) with its building
blocks: `ResBlock` (openaimodel.py:162-276), `SpatialTransformer` /
`BasicTransformerBlock` / `CrossAttention` (ldm/modules/attention.py:152-450),
`Upsample`/`Downsample` (openaimodel.py:91-160), and the sinusoidal
`timestep_embedding` (diffusionmodules/util.py:154-174).

Differences from the reference by design (TPU-first):
  - NHWC activations / HWIO kernels (MXU/VPU lane layout) instead of NCHW;
  - fused QKV projection inside self-attention (one MXU pass) — the shipped
    form of the reference's fused-QKV ONNX export (export_onnx_attention.py);
  - fp32 softmax + fp32 norm statistics islands inside a bf16 graph
    (analog of ATTN_PRECISION, attention.py:229-233);
  - no data-dependent control flow: the block structure is static Python
    derived from the frozen config, so `jax.jit` traces a flat graph.

Eps notes: ResBlock GroupNorm32 eps=1e-5 (torch default), but the
SpatialTransformer's entry `Normalize` is GroupNorm(32, eps=1e-6)
(ldm/modules/attention.py Normalize).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import UNetConfig
from stablediffusioneo_tpu.ops.attention import multi_head_attention
from stablediffusioneo_tpu.ops.layers import (
    conv2d,
    conv_init,
    geglu,
    linear,
    linear_init,
    norm_init,
    silu,
    upsample_nearest_2x,
)
from stablediffusioneo_tpu.ops.norms import group_norm, layer_norm
from stablediffusioneo_tpu.ops.schedule import timestep_embedding

ATTN_NORM_EPS = 1e-6  # ldm/modules/attention.py Normalize eps
LN_EPS = 1e-5


# =============================================================== init helpers


def init_resblock(key, cin: int, cout: int, emb_dim: int, use_scale_shift: bool):
    ks = jax.random.split(key, 4)
    return {
        "norm1": norm_init(cin),
        "conv1": conv_init(ks[0], 3, 3, cin, cout),
        "emb": linear_init(ks[1], emb_dim, 2 * cout if use_scale_shift else cout),
        "norm2": norm_init(cout),
        "conv2": conv_init(ks[2], 3, 3, cout, cout, zero=True),  # zero_module'd
        **(
            {"skip": conv_init(ks[3], 1, 1, cin, cout)}
            if cin != cout
            else {}
        ),
    }


def init_transformer_block(key, c: int, heads: int, context_dim: int):
    ks = jax.random.split(key, 10)
    return {
        "norm1": norm_init(c),
        "attn1": {
            "wq": linear_init(ks[0], c, c, bias=False),
            "wk": linear_init(ks[1], c, c, bias=False),
            "wv": linear_init(ks[2], c, c, bias=False),
            "wo": linear_init(ks[3], c, c),
        },
        "norm2": norm_init(c),
        "attn2": {
            "wq": linear_init(ks[4], c, c, bias=False),
            "wk": linear_init(ks[5], context_dim, c, bias=False),
            "wv": linear_init(ks[6], context_dim, c, bias=False),
            "wo": linear_init(ks[7], c, c),
        },
        "norm3": norm_init(c),
        "ff1": linear_init(ks[8], c, 8 * c),  # GEGLU proj (2 * 4c)
        "ff2": linear_init(ks[9], 4 * c, c),
    }


def init_spatial_transformer(key, c: int, heads: int, depth: int, context_dim: int):
    ks = jax.random.split(key, depth + 2)
    return {
        "norm": norm_init(c),
        "proj_in": conv_init(ks[0], 1, 1, c, c),
        "blocks": [
            init_transformer_block(ks[1 + i], c, heads, context_dim)
            for i in range(depth)
        ],
        "proj_out": conv_init(ks[depth + 1], 1, 1, c, c, zero=True),
    }


def encoder_plan(cfg: UNetConfig) -> List[dict]:
    """Static plan of the UNet encoder ("input_blocks"): list of block descs.

    Mirrors openaimodel.py:496-563 construction. Each entry:
      {"kind": "conv"|"res"|"down", "cin", "cout", "attn": bool, "ds": int}
    """
    plan = [
        {"kind": "conv", "cin": cfg.in_channels, "cout": cfg.model_channels, "attn": False, "ds": 1}
    ]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            cout = mult * cfg.model_channels
            attn = ds in cfg.attention_resolutions and cfg.depth_for(level) > 0
            plan.append(
                {
                    "kind": "res",
                    "cin": ch,
                    "cout": cout,
                    "attn": attn,
                    "depth": cfg.depth_for(level),
                    "ds": ds,
                }
            )
            ch = cout
        if level != len(cfg.channel_mult) - 1:
            plan.append({"kind": "down", "cin": ch, "cout": ch, "attn": False, "ds": ds})
            ds *= 2
    return plan


def decoder_plan(cfg: UNetConfig) -> List[dict]:
    """Static plan of "output_blocks" (openaimodel.py:606-661).

    Each entry: {"cin": h_ch + skip_ch, "cout", "attn", "up": bool, "ds"}.
    """
    enc = encoder_plan(cfg)
    skip_chs = [e["cout"] for e in enc]
    plan = []
    ch = cfg.model_channels * cfg.channel_mult[-1]
    ds = 2 ** (len(cfg.channel_mult) - 1)
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            skip = skip_chs.pop()
            cout = cfg.model_channels * mult
            attn = ds in cfg.attention_resolutions and cfg.depth_for(level) > 0
            plan.append(
                {
                    "cin": ch + skip,
                    "cout": cout,
                    "attn": attn,
                    "depth": cfg.depth_for(level),
                    "up": (level != 0 and i == cfg.num_res_blocks),
                    "ds": ds,
                }
            )
            ch = cout
        if level != 0:
            ds //= 2
    return plan


def init_unet(key, cfg: UNetConfig) -> Dict:
    emb_dim = cfg.time_embed_dim
    ks = iter(jax.random.split(key, 256))

    params: Dict = {
        "time_embed": {
            "l1": linear_init(next(ks), cfg.model_channels, emb_dim),
            "l2": linear_init(next(ks), emb_dim, emb_dim),
        }
    }

    blocks = []
    for desc in encoder_plan(cfg):
        if desc["kind"] == "conv":
            blocks.append({"conv": conv_init(next(ks), 3, 3, desc["cin"], desc["cout"])})
        elif desc["kind"] == "down":
            blocks.append({"down": conv_init(next(ks), 3, 3, desc["cin"], desc["cout"])})
        else:
            b = {
                "res": init_resblock(
                    next(ks), desc["cin"], desc["cout"], emb_dim, cfg.use_scale_shift_norm
                )
            }
            if desc["attn"]:
                b["attn"] = init_spatial_transformer(
                    next(ks), desc["cout"], cfg.num_heads, desc["depth"], cfg.context_dim
                )
            blocks.append(b)
    params["input_blocks"] = blocks

    if cfg.adm_in_channels:
        # SDXL label_emb: ADM vector (pooled text + time-id fourier
        # features) through the same MLP shape as time_embed
        params["label_emb"] = {
            "l1": linear_init(next(ks), cfg.adm_in_channels, emb_dim),
            "l2": linear_init(next(ks), emb_dim, emb_dim),
        }

    mid_ch = cfg.model_channels * cfg.channel_mult[-1]
    params["middle_block"] = {
        "res1": init_resblock(next(ks), mid_ch, mid_ch, emb_dim, cfg.use_scale_shift_norm),
        "attn": init_spatial_transformer(
            next(ks), mid_ch, cfg.num_heads,
            cfg.depth_for(len(cfg.channel_mult) - 1), cfg.context_dim
        ),
        "res2": init_resblock(next(ks), mid_ch, mid_ch, emb_dim, cfg.use_scale_shift_norm),
    }

    out_blocks = []
    for desc in decoder_plan(cfg):
        b = {
            "res": init_resblock(
                next(ks), desc["cin"], desc["cout"], emb_dim, cfg.use_scale_shift_norm
            )
        }
        if desc["attn"]:
            b["attn"] = init_spatial_transformer(
                next(ks), desc["cout"], cfg.num_heads, desc["depth"], cfg.context_dim
            )
        if desc["up"]:
            b["up"] = conv_init(next(ks), 3, 3, desc["cout"], desc["cout"])
        out_blocks.append(b)
    params["output_blocks"] = out_blocks

    params["out"] = {
        "norm": norm_init(cfg.model_channels),
        "conv": conv_init(next(ks), 3, 3, cfg.model_channels, cfg.out_channels, zero=True),
    }
    return params


# =============================================================== apply


def _maybe_remat(fn):
    """Per-block rematerialization (jax.checkpoint) for training: residuals
    recompute in the backward pass instead of living in HBM — the TPU way
    to trade FLOPs for memory (SDEO_REMAT=1 / dispatch.set_kernels(remat=...)).
    The reference's analog is low_vram module paging (cldm/cldm.py:425-435)."""
    from stablediffusioneo_tpu.ops.dispatch import remat_enabled

    if remat_enabled():
        return jax.checkpoint(fn, static_argnums=(1,))
    return fn


def resblock_apply(p: dict, cfg: UNetConfig, x, emb):
    """ResBlock (openaimodel.py:162-276): GN+SiLU+conv, +time-emb, GN+SiLU+conv, skip."""
    return _maybe_remat(_resblock_apply)(p, cfg, x, emb)


def _resblock_apply(p: dict, cfg: UNetConfig, x, emb):
    h = group_norm(x, p["norm1"]["g"], p["norm1"]["b"], cfg.groups, cfg.norm_eps, swish=True)
    h = conv2d(h, p["conv1"], padding=1)
    emb_out = linear(silu(emb), p["emb"])  # (N, cout) or (N, 2*cout)
    if cfg.use_scale_shift_norm:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = group_norm(h, p["norm2"]["g"], p["norm2"]["b"], cfg.groups, cfg.norm_eps)
        h = h * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
        h = silu(h)
    else:
        h = h + emb_out[:, None, None, :].astype(h.dtype)
        h = group_norm(h, p["norm2"]["g"], p["norm2"]["b"], cfg.groups, cfg.norm_eps, swish=True)
    h = conv2d(h, p["conv2"], padding=1)
    skip = conv2d(x, p["skip"], padding=0) if "skip" in p else x
    return skip + h


def transformer_block_apply(p: dict, cfg: UNetConfig, x, context, ctx_kv=None,
                            grid_hw=None):
    """BasicTransformerBlock (attention.py:355-385): self-attn, cross-attn, GEGLU FF.

    ctx_kv: optional precomputed cross-attention (k, v) for this block (see
    precompute_context_kv) — the context projection is step-invariant, so
    samplers hoist it out of the denoise scan.

    grid_hw: the (h, w) token grid, enabling ToMe token merging around the
    self-attention when cfg.tome_ratio > 0 and the site is large enough
    (ops/tome.py; merge metric = the block input x, per tomesd)."""
    heads = cfg.heads_for(x.shape[-1])
    n_tokens = x.shape[1]
    tome_r = 0
    if (cfg.tome_ratio > 0.0 and grid_hw is not None
            and n_tokens >= cfg.tome_min_tokens):
        from stablediffusioneo_tpu.ops.tome import build_merge, merge_count

        tome_r = merge_count(grid_hw[0], grid_hw[1], cfg.tome_ratio,
                             cfg.tome_sx, cfg.tome_sy)
    h = layer_norm(x, p["norm1"]["g"], p["norm1"]["b"], LN_EPS)
    if tome_r > 0:
        merge, unmerge, _ = build_merge(x, grid_hw[0], grid_hw[1], tome_r,
                                        cfg.tome_sx, cfg.tome_sy)
        a = multi_head_attention(
            merge(h), None,
            p["attn1"]["wq"]["w"], p["attn1"]["wk"]["w"],
            p["attn1"]["wv"]["w"],
            p["attn1"]["wo"]["w"], p["attn1"]["wo"].get("b"), heads,
        )
        x = x + unmerge(a)
    else:
        x = x + multi_head_attention(
            h, None,
            p["attn1"]["wq"]["w"], p["attn1"]["wk"]["w"],
            p["attn1"]["wv"]["w"],
            p["attn1"]["wo"]["w"], p["attn1"]["wo"].get("b"), heads,
        )
    h = layer_norm(x, p["norm2"]["g"], p["norm2"]["b"], LN_EPS)
    x = x + multi_head_attention(
        h, context,
        p["attn2"]["wq"]["w"], p["attn2"]["wk"]["w"], p["attn2"]["wv"]["w"],
        p["attn2"]["wo"]["w"], p["attn2"]["wo"].get("b"), heads,
        kv=ctx_kv,
    )
    h = layer_norm(x, p["norm3"]["g"], p["norm3"]["b"], LN_EPS)
    x = x + linear(geglu(h, p["ff1"]), p["ff2"])
    return x


def spatial_transformer_apply(p: dict, cfg: UNetConfig, x, context, ctx_kv=None):
    """SpatialTransformer (attention.py:388-450), conv proj flavor (SD1.5)."""
    return _maybe_remat(_spatial_transformer_apply)(p, cfg, x, context, ctx_kv)


def _spatial_transformer_apply(p: dict, cfg: UNetConfig, x, context, ctx_kv=None):
    n, h_, w_, c = x.shape
    residual = x
    h = group_norm(x, p["norm"]["g"], p["norm"]["b"], cfg.groups, ATTN_NORM_EPS)
    # proj_in/proj_out are 1x1 convs in the SD-1.5 checkpoint
    # (attention.py:388-450 conv flavor); a 1x1 conv IS a linear over the
    # token view, and applying it after the reshape keeps the whole
    # transformer section in token space — the NHWC<->token boundary then
    # crosses once per site instead of wrapping two convs in relayouts.
    h = h.reshape(n, h_ * w_, c)
    h = linear(h, _conv1x1_as_linear(p["proj_in"]))
    for i, blk in enumerate(p["blocks"]):
        h = transformer_block_apply(
            blk, cfg, h, context,
            ctx_kv=None if ctx_kv is None else ctx_kv[i],
            grid_hw=(h_, w_),
        )
    h = linear(h, _conv1x1_as_linear(p["proj_out"]))
    h = h.reshape(n, h_, w_, c)
    return h + residual


def precompute_context_kv(params: dict, cfg: UNetConfig, context: jax.Array):
    """Per-site cross-attention (k, v) from the step-invariant context.

    Returns {"input": [site|None per input block], "middle": site,
    "output": [site|None per output block]} where site is a per-depth list
    of (k, v) pairs — the same tree shape unet_apply walks. Computed with
    the identical fused K/V matmul the in-loop path uses (ops/attention.py
    context_kv), so hoisting changes no numerics. The reference's per-step
    TRT engines re-project the 77-token context through every
    CrossAttention's to_k/to_v each step (ldm/modules/attention.py:176-180);
    one compiled scan lets us lift all of it out of the loop."""
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
        "output": [
            site(p["attn"]) if "attn" in p else None
            for p in params["output_blocks"]
        ],
    }


def _conv1x1_as_linear(p: dict) -> dict:
    q = {"w": p["w"].reshape(p["w"].shape[-2], p["w"].shape[-1])}
    if "b" in p:
        q["b"] = p["b"]
    return q


def _embed_timesteps(p: dict, cfg: UNetConfig, timesteps, dtype, y=None):
    t_emb = timestep_embedding(timesteps, cfg.model_channels, dtype=jnp.float32)
    emb = linear(t_emb, p["time_embed"]["l1"])
    emb = linear(silu(emb), p["time_embed"]["l2"])
    if cfg.adm_in_channels:
        # SDXL ADM conditioning: label_emb(y) adds to the time embedding
        # (openaimodel.py UNetModel.forward, y branch)
        if y is None:
            raise ValueError("this UNet is ADM-conditioned "
                             "(adm_in_channels set): pass y")
        ye = linear(y.astype(jnp.float32), p["label_emb"]["l1"])
        ye = linear(silu(ye), p["label_emb"]["l2"])
        emb = emb + ye
    return emb.astype(dtype)


def unet_encode(
    params: dict,
    cfg: UNetConfig,
    x: jax.Array,
    emb: jax.Array,
    context: jax.Array,
    ctx_kv=None,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Run input blocks; returns (h, skip stack hs). openaimodel.py:772-780."""
    kvs = ctx_kv["input"] if ctx_kv is not None else None
    hs = []
    h = x
    for i, (desc, p) in enumerate(zip(encoder_plan(cfg), params["input_blocks"])):
        if desc["kind"] == "conv":
            h = conv2d(h, p["conv"], padding=1)
        elif desc["kind"] == "down":
            h = conv2d(h, p["down"], stride=2, padding=1)
        else:
            h = resblock_apply(p["res"], cfg, h, emb)
            if "attn" in p:
                h = spatial_transformer_apply(
                    p["attn"], cfg, h, context,
                    ctx_kv=None if kvs is None else kvs[i],
                )
        hs.append(h)
    return h, hs


def unet_middle(params: dict, cfg: UNetConfig, h, emb, context, ctx_kv=None):
    p = params["middle_block"]
    h = resblock_apply(p["res1"], cfg, h, emb)
    h = spatial_transformer_apply(
        p["attn"], cfg, h, context,
        ctx_kv=None if ctx_kv is None else ctx_kv["middle"],
    )
    h = resblock_apply(p["res2"], cfg, h, emb)
    return h


def unet_decode(
    params: dict,
    cfg: UNetConfig,
    h: jax.Array,
    hs: List[jax.Array],
    emb: jax.Array,
    context: jax.Array,
    control: Optional[List[jax.Array]] = None,
    only_mid_control: bool = False,
    ctx_kv=None,
):
    """Output blocks with optional ControlNet skip addition (cldm/cldm.py:33-41)."""
    kvs = ctx_kv["output"] if ctx_kv is not None else None
    hs = list(hs)
    ctrl = list(control) if control is not None else None
    for i, (desc, p) in enumerate(zip(decoder_plan(cfg), params["output_blocks"])):
        skip = hs.pop()
        if ctrl is not None and not only_mid_control:
            skip = skip + ctrl.pop()
        h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
        h = resblock_apply(p["res"], cfg, h, emb)
        if "attn" in p:
            h = spatial_transformer_apply(
                p["attn"], cfg, h, context,
                ctx_kv=None if kvs is None else kvs[i],
            )
        if "up" in p:
            h = upsample_nearest_2x(h)
            h = conv2d(h, p["up"], padding=1)
    return h


def unet_out(params: dict, cfg: UNetConfig, h):
    h = group_norm(
        h, params["out"]["norm"]["g"], params["out"]["norm"]["b"], cfg.groups,
        cfg.norm_eps, swish=True,
    )
    return conv2d(h, params["out"]["conv"], padding=1)


def unet_apply(
    params: dict,
    cfg: UNetConfig,
    x: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    control: Optional[List[jax.Array]] = None,
    only_mid_control: bool = False,
    ctx_kv=None,
    y: Optional[jax.Array] = None,
) -> jax.Array:
    """Full UNet forward == ControlledUnetModel.forward (cldm/cldm.py:22-45).

    x: (N, H, W, 4) latent; timesteps: (N,); context: (N, T, context_dim);
    control: optional list of 13 NHWC tensors (12 skips + middle, in
    ControlNet output order — consumed from the END like the reference's
    `control.pop()`); ctx_kv: optional precompute_context_kv tree (samplers
    hoist the step-invariant context K/V projections out of the scan);
    y: (N, adm_in_channels) ADM conditioning (SDXL pooled text + time-id
    features) — required iff cfg.adm_in_channels is set.
    """
    emb = _embed_timesteps(params, cfg, timesteps, x.dtype, y=y)
    h, hs = unet_encode(params, cfg, x, emb, context, ctx_kv=ctx_kv)
    h = unet_middle(params, cfg, h, emb, context, ctx_kv=ctx_kv)
    if control is not None:
        ctrl = list(control)
        h = h + ctrl.pop().astype(h.dtype)  # middle-block control
    else:
        ctrl = None
    h = unet_decode(params, cfg, h, hs, emb, context, ctrl, only_mid_control,
                    ctx_kv=ctx_kv)
    return unet_out(params, cfg, h)
