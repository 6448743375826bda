"""UniFormer-S + UperNet semantic-segmentation annotator (ADE20K).

Re-design of the reference's UniFormer annotator
(annotator/uniformer/__init__.py:15-28), which vendors ~32k LoC of
mmcv/mmseg (config registries, CUDA op wrappers) to run ONE inference
path: UniFormer-S backbone -> UperNet decode head -> ADE20K palette
rendering. This module implements exactly that slice (SURVEY §7 step 8),
functional JAX, NHWC, no registry machinery.

Backbone (UniFormer-S): 4 stages, depths (3, 4, 8, 3), dims
(64, 128, 320, 512); stages 1-2 use convolutional token mixers (CBlock:
depthwise positional conv + 1x1 -> DW5x5 -> 1x1 mixer + conv-MLP, BN norms),
stages 3-4 use global self-attention blocks (SABlock: DW positional conv +
LN + MHSA + MLP). UperNet head: PPM over the last stage + FPN laterals,
fused at 1/4 scale, 1x1 classifier to 150 ADE20K classes.

Weight conversion from the upstream `upernet_global_small.pth` follows
mmseg naming (backbone.*, decode_head.*); random init serves flow tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.layers import conv2d, conv_init, gelu, linear, linear_init, norm_init
from stablediffusioneo_tpu.ops.norms import layer_norm
from stablediffusioneo_tpu.ops.attention import attention

DEPTHS = (3, 4, 8, 3)
DIMS = (64, 128, 320, 512)
HEAD_DIM = 64
UPER_CH = 512
NUM_CLASSES = 150


def _bn_init(c):
    # inference-only BN folded to per-channel scale/shift
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _bn(x, p):
    return x * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)


def _dwconv_init(key, k, c):
    # depthwise: HWIO with feature_group_count=c -> kernel (k, k, 1, c)
    return {"w": jax.random.normal(key, (k, k, 1, c)) * 0.02, "b": jnp.zeros((c,))}


def _dwconv(x, p, pad):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    return out + p["b"].astype(x.dtype)


def init_cblock(key, c):
    ks = iter(jax.random.split(key, 8))
    return {
        "pos": _dwconv_init(next(ks), 3, c),
        "norm1": _bn_init(c),
        "mix_in": conv_init(next(ks), 1, 1, c, c),
        "mix_dw": _dwconv_init(next(ks), 5, c),
        "mix_out": conv_init(next(ks), 1, 1, c, c),
        "norm2": _bn_init(c),
        "mlp1": conv_init(next(ks), 1, 1, c, 4 * c),
        "mlp2": conv_init(next(ks), 1, 1, 4 * c, c),
    }


def cblock_apply(p, x):
    x = x + _dwconv(x, p["pos"], 1)
    h = _bn(x, p["norm1"])
    h = conv2d(h, p["mix_in"], padding=0)
    h = _dwconv(h, p["mix_dw"], 2)
    h = conv2d(h, p["mix_out"], padding=0)
    x = x + h
    h = _bn(x, p["norm2"])
    h = gelu(conv2d(h, p["mlp1"], padding=0))
    x = x + conv2d(h, p["mlp2"], padding=0)
    return x


def init_sablock(key, c):
    ks = iter(jax.random.split(key, 8))
    return {
        "pos": _dwconv_init(next(ks), 3, c),
        "norm1": norm_init(c),
        "qkv": linear_init(next(ks), c, 3 * c),
        "proj": linear_init(next(ks), c, c),
        "norm2": norm_init(c),
        "fc1": linear_init(next(ks), c, 4 * c),
        "fc2": linear_init(next(ks), 4 * c, c),
    }


def sablock_apply(p, x):
    x = x + _dwconv(x, p["pos"], 1)
    n, h, w, c = x.shape
    t = x.reshape(n, h * w, c)
    hh = layer_norm(t, p["norm1"]["g"], p["norm1"]["b"], 1e-6)
    qkv = linear(hh, p["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = c // HEAD_DIM
    q = q.reshape(n, h * w, heads, HEAD_DIM).transpose(0, 2, 1, 3)
    k = k.reshape(n, h * w, heads, HEAD_DIM).transpose(0, 2, 1, 3)
    v = v.reshape(n, h * w, heads, HEAD_DIM).transpose(0, 2, 1, 3)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(n, h * w, c)
    t = t + linear(o, p["proj"])
    hh = layer_norm(t, p["norm2"]["g"], p["norm2"]["b"], 1e-6)
    t = t + linear(gelu(linear(hh, p["fc1"])), p["fc2"])
    return t.reshape(n, h, w, c)


def init_uniformer_s(key) -> Dict:
    ks = iter(jax.random.split(key, 64))
    params: Dict = {"stages": []}
    cin = 3
    for si, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        k_patch = 4 if si == 0 else 2
        stage = {
            "patch_embed": conv_init(next(ks), k_patch, k_patch, cin, dim),
            "patch_norm": norm_init(dim),
            "blocks": [
                (init_cblock if si < 2 else init_sablock)(next(ks), dim)
                for _ in range(depth)
            ],
        }
        params["stages"].append(stage)
        cin = dim
    return params


def uniformer_apply(params: Dict, x: jax.Array) -> List[jax.Array]:
    """x: (N, H, W, 3) normalized -> 4 stage features at 1/4..1/32."""
    feats = []
    h = x
    for si, stage in enumerate(params["stages"]):
        k = 4 if si == 0 else 2
        h = conv2d(h, stage["patch_embed"], stride=k, padding=0)
        h = layer_norm(h, stage["patch_norm"]["g"], stage["patch_norm"]["b"], 1e-6)
        apply = cblock_apply if si < 2 else sablock_apply
        for blk in stage["blocks"]:
            h = apply(blk, h)
        feats.append(h)
    return feats


# ------------------------------------------------------------------ UperNet


def init_upernet(key, num_classes: int = NUM_CLASSES) -> Dict:
    ks = iter(jax.random.split(key, 32))
    return {
        "ppm": [conv_init(next(ks), 1, 1, DIMS[-1], UPER_CH) for _ in range(4)],
        "bottleneck": conv_init(next(ks), 3, 3, DIMS[-1] + 4 * UPER_CH, UPER_CH),
        "laterals": [conv_init(next(ks), 1, 1, DIMS[i], UPER_CH) for i in range(3)],
        "fpn_convs": [conv_init(next(ks), 3, 3, UPER_CH, UPER_CH) for _ in range(3)],
        "fusion": conv_init(next(ks), 3, 3, 4 * UPER_CH, UPER_CH),
        "classifier": conv_init(next(ks), 1, 1, UPER_CH, num_classes),
    }


def _resize_to(x, h, w):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, h, w, c), method="bilinear")


def _adaptive_avg_pool(x, bins: int):
    """Exact torch AdaptiveAvgPool2d semantics: cell (i, j) averages rows
    [floor(i*h/b), ceil((i+1)*h/b)). Static shapes -> plain Python loops."""
    import math

    n, h, w, c = x.shape
    rows = []
    for i in range(bins):
        r0, r1 = (i * h) // bins, math.ceil((i + 1) * h / bins)
        cols = []
        for j in range(bins):
            c0, c1 = (j * w) // bins, math.ceil((j + 1) * w / bins)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, bins, bins, C)


def upernet_apply(params: Dict, feats: List[jax.Array]) -> jax.Array:
    """4 stage features -> (N, H/4, W/4, num_classes) logits."""
    f4 = feats[3]
    n, h4, w4, _ = f4.shape
    # pyramid pooling over the last stage
    pooled = [f4]
    for bins, p in zip((1, 2, 3, 6), params["ppm"]):
        g = _adaptive_avg_pool(f4, bins)
        g = jax.nn.relu(conv2d(g, p, padding=0))
        pooled.append(_resize_to(g, h4, w4))
    top = jax.nn.relu(
        conv2d(jnp.concatenate(pooled, axis=-1), params["bottleneck"], padding=1)
    )
    # FPN top-down
    laterals = [
        jax.nn.relu(conv2d(feats[i], params["laterals"][i], padding=0))
        for i in range(3)
    ] + [top]
    for i in range(2, -1, -1):
        n_, h_, w_, _ = laterals[i].shape
        laterals[i] = laterals[i] + _resize_to(laterals[i + 1], h_, w_)
    outs = [
        jax.nn.relu(conv2d(laterals[i], params["fpn_convs"][i], padding=1))
        for i in range(3)
    ] + [top]
    h0, w0 = outs[0].shape[1], outs[0].shape[2]
    outs = [_resize_to(o, h0, w0) for o in outs]
    fused = jax.nn.relu(
        conv2d(jnp.concatenate(outs, axis=-1), params["fusion"], padding=1)
    )
    return conv2d(fused, params["classifier"], padding=0)


# ------------------------------------------------------------------ detector

_IMAGENET_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
_IMAGENET_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


def ade20k_palette() -> np.ndarray:
    """Deterministic 150-color palette (ADE20K rendering convention)."""
    rng = np.random.default_rng(42)
    return rng.integers(0, 255, (NUM_CLASSES, 3)).astype(np.uint8)


class UniformerDetector:
    """Drop-in UniformerDetector (annotator/uniformer/__init__.py:15-28):
    uint8 HWC image -> uint8 color-coded segmentation map."""

    def __init__(self, params: Optional[Dict] = None):
        if params is None:
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            params = {
                "backbone": init_uniformer_s(k1),
                "decode_head": init_upernet(k2),
            }
        from stablediffusioneo_tpu.annotators._dtype import cast_params

        # bf16 on TPU / f32 elsewhere (annotators/_dtype.py); the host
        # argmax over class logits is dtype-insensitive
        self.params = cast_params(params)
        self.palette = ade20k_palette()
        dt = jax.tree.leaves(self.params)[0].dtype

        def fwd(p, x):
            feats = uniformer_apply(p["backbone"], x.astype(dt))
            return upernet_apply(p["decode_head"], feats).astype(jnp.float32)

        self._apply = jax.jit(fwd)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        nh, nw = max(32, (h // 32) * 32), max(32, (w // 32) * 32)
        x = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        x = (x.astype(np.float32) - _IMAGENET_MEAN) / _IMAGENET_STD
        logits = np.asarray(self._apply(self.params, jnp.asarray(x[None])), np.float32)
        seg = logits[0].argmax(-1).astype(np.int32)
        seg = cv2.resize(seg, (w, h), interpolation=cv2.INTER_NEAREST)
        return self.palette[seg]


# ----------------------------------------------------------------- convert


def _fold_bn_conv(sd, name, dtype=None, eps=1e-5):
    """mmseg ConvModule (conv + BN + relu) -> single conv, BN folded."""
    w = sd[f"{name}.conv.weight"]
    g = sd[f"{name}.bn.weight"]
    b = sd[f"{name}.bn.bias"]
    mean = sd[f"{name}.bn.running_mean"]
    var = sd[f"{name}.bn.running_var"]
    scale = g / np.sqrt(var + eps)
    wf = np.transpose(w * scale[:, None, None, None], (2, 3, 1, 0))
    return {"w": jnp.asarray(wf, dtype), "b": jnp.asarray(b - mean * scale, dtype)}


def convert_uniformer_upernet(sd, dtype=None):
    """Map the upstream `upernet_global_small.pth` state dict (mmseg naming:
    backbone.* UniFormer-S, decode_head.* UperNet) onto this module's tree.

    BatchNorms fold into the neighboring affine/conv (inference-only); the
    backbone's CBlock BNs become the pre-mixer/pre-MLP scale-shift pairs.
    Validated structurally with generated state dicts; numeric parity needs
    the upstream checkpoint (zero-egress environment).
    """

    def cw(name):
        p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)), dtype)}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def dw(name):  # depthwise conv: torch (C,1,k,k) -> HWIO (k,k,1,C)
        w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def lw(name):
        return {
            "w": jnp.asarray(np.transpose(sd[f"{name}.weight"]), dtype),
            "b": jnp.asarray(sd[f"{name}.bias"], dtype),
        }

    def ln(name):
        return {
            "g": jnp.asarray(sd[f"{name}.weight"], dtype),
            "b": jnp.asarray(sd[f"{name}.bias"], dtype),
        }

    def bn(name, eps=1e-5):
        g = sd[f"{name}.weight"]
        b = sd[f"{name}.bias"]
        mean = sd[f"{name}.running_mean"]
        var = sd[f"{name}.running_var"]
        scale = g / np.sqrt(var + eps)
        return {"g": jnp.asarray(scale, dtype), "b": jnp.asarray(b - mean * scale, dtype)}

    bb = "backbone."
    backbone: Dict = {"stages": []}
    for si in range(4):
        n_blocks = DEPTHS[si]
        stage = {
            "patch_embed": cw(f"{bb}patch_embed{si + 1}.proj"),
            "patch_norm": ln(f"{bb}patch_embed{si + 1}.norm"),
            "blocks": [],
        }
        for bi in range(n_blocks):
            base = f"{bb}blocks{si + 1}.{bi}"
            if si < 2:  # CBlock: conv mixer, BN norms
                stage["blocks"].append({
                    "pos": dw(f"{base}.pos_embed"),
                    "norm1": bn(f"{base}.norm1"),
                    "mix_in": cw(f"{base}.conv1"),
                    "mix_dw": dw(f"{base}.attn"),
                    "mix_out": cw(f"{base}.conv2"),
                    "norm2": bn(f"{base}.norm2"),
                    "mlp1": cw(f"{base}.mlp.fc1"),
                    "mlp2": cw(f"{base}.mlp.fc2"),
                })
            else:  # SABlock: LN + MHSA + MLP (linear weights)
                stage["blocks"].append({
                    "pos": dw(f"{base}.pos_embed"),
                    "norm1": ln(f"{base}.norm1"),
                    "qkv": lw(f"{base}.attn.qkv"),
                    "proj": lw(f"{base}.attn.proj"),
                    "norm2": ln(f"{base}.norm2"),
                    "fc1": lw(f"{base}.mlp.fc1"),
                    "fc2": lw(f"{base}.mlp.fc2"),
                })
        backbone["stages"].append(stage)

    dh = "decode_head."
    head = {
        "ppm": [
            _fold_bn_conv(sd, f"{dh}psp_modules.{i}.1", dtype) for i in range(4)
        ],
        "bottleneck": _fold_bn_conv(sd, f"{dh}bottleneck", dtype),
        "laterals": [
            _fold_bn_conv(sd, f"{dh}lateral_convs.{i}", dtype) for i in range(3)
        ],
        "fpn_convs": [
            _fold_bn_conv(sd, f"{dh}fpn_convs.{i}", dtype) for i in range(3)
        ],
        "fusion": _fold_bn_conv(sd, f"{dh}fpn_bottleneck", dtype),
        "classifier": {
            "w": jnp.asarray(
                np.transpose(sd[f"{dh}conv_seg.weight"], (2, 3, 1, 0)), dtype
            ),
            "b": jnp.asarray(sd[f"{dh}conv_seg.bias"], dtype),
        },
    }
    return {"backbone": backbone, "decode_head": head}
