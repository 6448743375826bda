"""MiDaS DPT-hybrid backbone (vit_base_r50_s16_384) — JAX, NHWC.

Completes the reference's default MiDaS variant
(`MiDaSInference(model_type="dpt_hybrid")`, annotator/midas/api.py:98): a
ResNetV2 stem (weight-standardized convs + GroupNorm+ReLU, preact
bottlenecks, stages (3, 4, 9)) feeding a ViT-B/16 tower; DPT reassembles
from the two ResNet stage outputs (256ch @ /4, 512ch @ /8) and two
transformer hook layers (8, 11) — the fusion/head code is shared with
dpt_large (annotators/midas.py).

Validated structurally (shapes/flow) with generated state dicts in the
upstream timm naming (`pretrained.model.patch_embed.backbone.*`); numeric
parity requires the upstream `dpt_hybrid-midas-501f0c75.pt` checkpoint,
which this zero-egress environment cannot fetch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.layers import gelu, linear
from stablediffusioneo_tpu.ops.norms import layer_norm
from stablediffusioneo_tpu.annotators.midas import (
    _fusion_block,
    _readout_project,
    _up2x_align_corners,
    _vit_block,
    _resize_pos_embed,
)

STAGE_BLOCKS = (3, 4, 9)
STAGE_OUT = (256, 512, 1024)
STAGE_MID = (64, 128, 256)
HYBRID_HOOKS = (8, 11)  # transformer layers feeding reassemble 3/4
GN_GROUPS = 32


def _std_conv(x, p, stride=1, pad=0, eps=1e-6):
    """Weight-standardized conv (timm StdConv2d): per-output-channel
    zero-mean/unit-var kernel, then plain conv. HWIO kernels."""
    w = p["w"].astype(jnp.float32)
    mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    w = ((w - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _gn_relu(x, p):
    from stablediffusioneo_tpu.ops.norms import group_norm

    return jax.nn.relu(group_norm(x, p["g"], p["b"], GN_GROUPS, 1e-5))


def _preact_bottleneck(p: Dict, x, stride: int):
    """ResNetV2 preact bottleneck (timm): shared pre-activation feeds both
    the residual branch and the (optional) projection shortcut."""
    x_pre = _gn_relu(x, p["norm1"])
    shortcut = (
        _std_conv(x_pre, p["downsample"], stride=stride)
        if "downsample" in p
        else x
    )
    h = _std_conv(x_pre, p["conv1"])
    h = _std_conv(_gn_relu(h, p["norm2"]), p["conv2"], stride=stride, pad=1)
    h = _std_conv(_gn_relu(h, p["norm3"]), p["conv3"])
    return h + shortcut


def resnetv2_apply(params: Dict, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
    """Stem + 3 stages. Returns (final /16 feature, [stage1 /4, stage2 /8])."""
    h = _std_conv(x, params["stem"]["conv"], stride=2, pad=3)
    h = _gn_relu(h, params["stem"]["norm"])
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )
    taps = []
    for si, blocks in enumerate(params["stages"]):
        for bi, blk in enumerate(blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            h = _preact_bottleneck(blk, h, stride)
        if si < 2:
            taps.append(h)
    return h, taps


def dpt_hybrid_apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, H, W, 3) normalized -> inverse depth (N, H, W)."""
    from stablediffusioneo_tpu.ops.layers import conv2d

    backbone, taps = resnetv2_apply(params["backbone"], x)
    n, gh, gw, _ = backbone.shape
    tokens = conv2d(backbone, params["patch_proj"], padding=0)  # 1x1 to 768
    c = tokens.shape[-1]
    tokens = tokens.reshape(n, gh * gw, c)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (n, 1, c))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + _resize_pos_embed(params["pos_embed"], gh, gw).astype(tokens.dtype)

    hooked = []
    for i, blk in enumerate(params["blocks"]):
        tokens = _vit_block(blk, tokens, num_heads=12)
        if i in HYBRID_HOOKS:
            hooked.append(tokens)

    # reassemble: stages 1/2 from ResNet taps (identity), 3/4 from tokens
    feats = []
    for tap, rn in zip(taps, (params["layer1_rn"], params["layer2_rn"])):
        feats.append(conv2d(tap, rn, padding=1))
    for i, tok in enumerate(hooked):
        p = params[f"post{i + 3}"]
        y = _readout_project(tok, p["project"], gh, gw)
        y = conv2d(y, p["channel"], padding=0)
        if i == 1:  # stage 4: downsample /32
            y = conv2d(y, p["resample"], stride=2, padding=1)
        rn = params["layer3_rn"] if i == 0 else params["layer4_rn"]
        feats.append(conv2d(y, rn, padding=1))

    l1, l2, l3, l4 = feats
    f = params["fusion"]
    path = _fusion_block(f["refine4"], l4, None)
    path = _fusion_block(f["refine3"], path, l3)
    path = _fusion_block(f["refine2"], path, l2)
    path = _fusion_block(f["refine1"], path, l1)
    h = params["head"]
    y = conv2d(path, h["conv1"], padding=1)
    y = _up2x_align_corners(y)  # align_corners=True (dpt_depth.py:94)
    y = jax.nn.relu(conv2d(y, h["conv2"], padding=1))
    y = jax.nn.relu(conv2d(y, h["conv3"], padding=0))
    return y[..., 0]


def convert_dpt_hybrid(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """Map the upstream dpt_hybrid state dict (timm hybrid naming) onto the
    tree. Conv OIHW->HWIO, linear transposed, norms to g/b."""

    def cw(name):
        p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)), dtype)}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def lw(name):
        p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"]), dtype)}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def nw(name):
        return {
            "g": jnp.asarray(sd[f"{name}.weight"], dtype),
            "b": jnp.asarray(sd[f"{name}.bias"], dtype),
        }

    vm = "pretrained.model."
    bb = f"{vm}patch_embed.backbone."
    backbone: Dict = {
        "stem": {"conv": cw(f"{bb}stem.conv"), "norm": nw(f"{bb}stem.norm")},
        "stages": [],
    }
    for si, nblocks in enumerate(STAGE_BLOCKS):
        blocks = []
        for bi in range(nblocks):
            base = f"{bb}stages.{si}.blocks.{bi}"
            blk = {
                "norm1": nw(f"{base}.norm1"),
                "conv1": cw(f"{base}.conv1"),
                "norm2": nw(f"{base}.norm2"),
                "conv2": cw(f"{base}.conv2"),
                "norm3": nw(f"{base}.norm3"),
                "conv3": cw(f"{base}.conv3"),
            }
            if f"{base}.downsample.conv.weight" in sd:
                blk["downsample"] = cw(f"{base}.downsample.conv")
            blocks.append(blk)
        backbone["stages"].append(blocks)

    n_blocks = max(
        int(k.split(".")[3]) for k in sd if k.startswith(f"{vm}blocks.")
    ) + 1
    params: Dict = {
        "backbone": backbone,
        "patch_proj": cw(f"{vm}patch_embed.proj"),
        "cls_token": jnp.asarray(sd[f"{vm}cls_token"], dtype),
        "pos_embed": jnp.asarray(sd[f"{vm}pos_embed"], dtype),
        "blocks": [
            {
                "norm1": nw(f"{vm}blocks.{i}.norm1"),
                "qkv": lw(f"{vm}blocks.{i}.attn.qkv"),
                "proj": lw(f"{vm}blocks.{i}.attn.proj"),
                "norm2": nw(f"{vm}blocks.{i}.norm2"),
                "fc1": lw(f"{vm}blocks.{i}.mlp.fc1"),
                "fc2": lw(f"{vm}blocks.{i}.mlp.fc2"),
            }
            for i in range(n_blocks)
        ],
    }
    for i in (3, 4):
        base = f"pretrained.act_postprocess{i}"
        entry = {"project": lw(f"{base}.0.project.0"), "channel": cw(f"{base}.3")}
        if i == 4:
            entry["resample"] = cw(f"{base}.4")
        params[f"post{i}"] = entry
    for i in range(1, 5):
        params[f"layer{i}_rn"] = cw(f"scratch.layer{i}_rn")
    fusion = {}
    for i in range(1, 5):
        base = f"scratch.refinenet{i}"
        fusion[f"refine{i}"] = {
            "rcu1": {"conv1": cw(f"{base}.resConfUnit1.conv1"),
                     "conv2": cw(f"{base}.resConfUnit1.conv2")},
            "rcu2": {"conv1": cw(f"{base}.resConfUnit2.conv1"),
                     "conv2": cw(f"{base}.resConfUnit2.conv2")},
            "out_conv": cw(f"{base}.out_conv"),
        }
    params["fusion"] = fusion
    params["head"] = {
        "conv1": cw("scratch.output_conv.0"),
        "conv2": cw("scratch.output_conv.2"),
        "conv3": cw("scratch.output_conv.4"),
    }
    return params
