"""MobileV2-MLSD-Large network — JAX, NHWC, BN-folded.

The reference imports `MobileV2_MLSD_Large` from a gitignored package
(annotator/mlsd/__init__.py:11-12 — absent from the snapshot; SURVEY §0),
so this re-implements the public navervision/mlsd architecture: a
MobileNetV2 backbone (4-channel input: RGB + ones) tapped at five pyramid
levels, and an FPN-style decoder of A/B blocks (deep-feature 1x1 + upsample
+ concat with shallow 1x1, then 3x3 fuse) ending in a dilated head
(BlockTypeC) producing the 16-channel tpMap at 1/2 resolution that
`annotators/mlsd.py::decode_center_and_displacement` consumes (channel 0
center logit, 1:5 displacements).

`convert_mlsd_large` maps the upstream `mlsd_large_512_fp32.pth` naming
with BN folding. Structurally tested with generated state dicts; numeric
parity needs the upstream checkpoint (zero-egress environment) — the
decoder-block wiring follows the public repo and should be re-verified
against real weights when available.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# MobileNetV2 inverted-residual table: (expand t, out c, repeats n, stride s)
_MBV2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
]
# feature indices tapped by MLSD (after these `features` modules)
_TAPS = (1, 3, 6, 10, 13)  # c1 16@/2, c2 24@/4, c3 32@/8, c4 64@/16, c5 96@/16


def _block_meta():
    """Static per-block (stride, expand) — jit-safe (not in the param tree)."""
    meta = []
    for t, c, n, s in _MBV2_CFG:
        for i in range(n):
            meta.append((s if i == 0 else 1, t != 1))
    return meta


def _conv(x, p, stride=1, pad=0, groups=1):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _inverted_residual(p: Dict, x, stride: int, expand: bool):
    h = x
    if expand:
        h = _relu6(_conv(h, p["expand"]))
    h = _relu6(_conv(h, p["dw"], stride=stride, pad=1, groups=h.shape[-1]))
    h = _conv(h, p["project"])
    if stride == 1 and x.shape[-1] == h.shape[-1]:
        h = x + h
    return h


def mbv2_backbone_apply(params: Dict, x: jax.Array) -> List[jax.Array]:
    """x: (N, H, W, 4) -> [c1, c2, c3, c4, c5] pyramid features."""
    h = _relu6(_conv(x, params["stem"], stride=2, pad=1))  # features.0
    taps = []
    idx = 1
    for block_p, (stride, expand) in zip(params["blocks"], _block_meta()):
        h = _inverted_residual(block_p, h, stride, expand)
        if idx in _TAPS:
            taps.append(h)
        idx += 1
    return taps


def _block_a_apply(p: Dict, shallow, deep, upscale: bool = True):
    """BlockTypeA: 1x1+BN+ReLU on both, upsample deep 2x, concat."""
    a = jax.nn.relu(_conv(deep, p["conv1"]))
    b = jax.nn.relu(_conv(shallow, p["conv2"]))
    if upscale:
        n, h, w, c = a.shape
        a = jax.image.resize(a, (n, h * 2, w * 2, c), method="bilinear")
    return jnp.concatenate([a, b], axis=-1)


def _block_b_apply(p: Dict, x):
    """BlockTypeB: 3x3+BN+ReLU then 3x3+BN."""
    h = jax.nn.relu(_conv(x, p["conv1"], pad=1))
    return _conv(h, p["conv2"], pad=1)


def _block_c_apply(p: Dict, x):
    """BlockTypeC head: dilated 3x3 + 3x3 + 1x1 -> 16 channels."""
    h = jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, p["conv1"]["w"].astype(x.dtype), (1, 1), [(5, 5), (5, 5)],
            rhs_dilation=(5, 5),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["conv1"]["b"].astype(x.dtype)
    )
    h = jax.nn.relu(_conv(h, p["conv2"], pad=1))
    return _conv(h, p["conv3"])


def mlsd_large_apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, H, W, 4) in [-1,1] -> tpMap (N, H/2, W/2, 16)."""
    c1, c2, c3, c4, c5 = mbv2_backbone_apply(params["backbone"], x)
    h = _block_a_apply(params["block15"], c4, c5, upscale=False)  # both /16
    h = _block_b_apply(params["block16"], h)
    h = _block_a_apply(params["block17"], c3, h)  # -> /8
    h = _block_b_apply(params["block18"], h)
    h = _block_a_apply(params["block19"], c2, h)  # -> /4
    h = _block_b_apply(params["block20"], h)
    h = _block_a_apply(params["block21"], c1, h)  # -> /2
    h = _block_b_apply(params["block22"], h)
    return _block_c_apply(params["block23"], h)


# ------------------------------------------------------------------ convert


def _fold(sd, conv_name, bn_name, dtype=None, eps=1e-5, dw=False):
    w = sd[f"{conv_name}.weight"]
    g = sd[f"{bn_name}.weight"]
    b = sd[f"{bn_name}.bias"]
    mean = sd[f"{bn_name}.running_mean"]
    var = sd[f"{bn_name}.running_var"]
    scale = g / np.sqrt(var + eps)
    w = w * scale[:, None, None, None]
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
        "b": jnp.asarray(b - mean * scale, dtype),
    }


def convert_mlsd_large(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """Upstream mlsd_large_512_fp32.pth naming: backbone.features.{i}.conv.*
    (torchvision MobileNetV2 layout), block{15..23}.conv{1,2}.* Sequentials."""
    fb = "backbone.features"
    backbone: Dict = {
        # features.0 = ConvBNReLU: 0.0 conv, 0.1 bn
        "stem": _fold(sd, f"{fb}.0.0", f"{fb}.0.1", dtype),
        "blocks": [],
    }
    idx = 1
    for t, c, n, s in _MBV2_CFG:
        for i in range(n):
            base = f"{fb}.{idx}.conv"
            expand = t != 1
            p = {}
            off = 0
            if expand:
                p["expand"] = _fold(sd, f"{base}.0.0", f"{base}.0.1", dtype)
                off = 1
            p["dw"] = _fold(sd, f"{base}.{off}.0", f"{base}.{off}.1", dtype)
            p["project"] = _fold(sd, f"{base}.{off + 1}", f"{base}.{off + 2}", dtype)
            backbone["blocks"].append(p)
            idx += 1

    def ab(name, n_convs=2):
        out = {}
        for ci in range(1, n_convs + 1):
            # conv Sequential: .0 conv, .1 bn
            out[f"conv{ci}"] = _fold(sd, f"{name}.conv{ci}.0", f"{name}.conv{ci}.1", dtype)
        return out

    params: Dict = {"backbone": backbone}
    for blk in (15, 17, 19, 21):
        params[f"block{blk}"] = ab(f"block{blk}")
    for blk in (16, 18, 20, 22):
        params[f"block{blk}"] = ab(f"block{blk}")
    # BlockTypeC: conv1/conv2 Sequential(conv, bn), conv3 plain conv w/ bias
    c23 = ab("block23", n_convs=2)
    c23["conv3"] = {
        "w": jnp.asarray(np.transpose(sd["block23.conv3.weight"], (2, 3, 1, 0)), dtype),
        "b": jnp.asarray(sd["block23.conv3.bias"], dtype),
    }
    params["block23"] = c23
    return params
