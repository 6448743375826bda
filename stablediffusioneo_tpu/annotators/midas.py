"""MiDaS depth annotator — JAX DPT (dense prediction transformer).

Re-design of the reference's MiDaS stack (annotator/midas/): `MidasDetector`
(annotator/midas/__init__.py:13-42) returning (depth uint8, normal-map
uint8 via Sobel), wrapping `DPTDepthModel` (annotator/midas/midas/
dpt_depth.py:26-107) over a ViT backbone (midas/vit.py).

This implementation covers the **dpt_large (vitl16_384)** variant of the
reference's model zoo (annotator/midas/api.py:16-24): plain ViT-L/16
backbone with activations hooked at layers (5, 11, 17, 23), DPT reassemble
(readout-projection + per-stage resampling to 1/4, 1/8, 1/16, 1/32) and
RefineNet-style feature fusion, monocular-depth head. The reference's
default dpt_hybrid (ResNet50 stem) is a planned variant — the fusion/head
code here is stem-agnostic.

Weights load 1:1 from the upstream `dpt_large-midas-2f21e586.pt` state dict
(convert_dpt). Runs jitted per resolution bucket (inputs are resized to
384-multiples by the detector).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.layers import conv2d, gelu, linear
from stablediffusioneo_tpu.ops.norms import layer_norm
from stablediffusioneo_tpu.ops.attention import attention

HOOKS = (5, 11, 17, 23)
STAGE_CHANNELS = (256, 512, 1024, 1024)
FEATURES = 256


# ------------------------------------------------------------- ViT backbone


def _vit_block(p: Dict, x: jax.Array, num_heads: int) -> jax.Array:
    b, t, c = x.shape
    h = layer_norm(x, p["norm1"]["g"], p["norm1"]["b"], 1e-6)
    qkv = linear(h, p["qkv"])  # (B, T, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = c // num_heads
    q = q.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, c)
    x = x + linear(o, p["proj"])
    h = layer_norm(x, p["norm2"]["g"], p["norm2"]["b"], 1e-6)
    x = x + linear(gelu(linear(h, p["fc1"])), p["fc2"])
    return x


def _resize_pos_embed(pos: jax.Array, gh: int, gw: int) -> jax.Array:
    """Interpolate the (1, 1+G0, C) pos table to a (gh, gw) grid."""
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    g0 = int(round(float(np.sqrt(grid_pos.shape[1]))))
    c = grid_pos.shape[-1]
    grid = grid_pos.reshape(1, g0, g0, c)
    grid = jax.image.resize(grid, (1, gh, gw, c), method="bilinear")
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, c)], axis=1)


def vit_features(
    params: Dict, x: jax.Array, num_heads: int = 16
) -> Tuple[List[jax.Array], int, int]:
    """x: (N, H, W, 3) normalized -> hooked token maps [(N, gh, gw, C)...]."""
    n, h, w, _ = x.shape
    patch = params["patch_embed"]
    tokens = conv2d(x, patch, stride=16, padding=0)  # (N, gh, gw, C)
    gh, gw = tokens.shape[1], tokens.shape[2]
    c = tokens.shape[-1]
    tokens = tokens.reshape(n, gh * gw, c)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (n, 1, c))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + _resize_pos_embed(params["pos_embed"], gh, gw).astype(tokens.dtype)

    hooked = []
    for i, blk in enumerate(params["blocks"]):
        tokens = _vit_block(blk, tokens, num_heads)
        if i in HOOKS:
            hooked.append(tokens)
    return hooked, gh, gw


# --------------------------------------------------------------- reassemble


def _readout_project(tok: jax.Array, p: Dict, gh: int, gw: int) -> jax.Array:
    """DPT 'project' readout: concat cls token onto every patch token,
    linear 2C->C + GELU, reshape to (N, gh, gw, C)."""
    n, t, c = tok.shape
    cls = jnp.broadcast_to(tok[:, :1], (n, t - 1, c))
    cat = jnp.concatenate([tok[:, 1:], cls], axis=-1)
    out = gelu(linear(cat, p))
    return out.reshape(n, gh, gw, c)


def _conv_transpose2d(x, p, stride):
    w = p["w"].astype(x.dtype)  # stored HWIO for transpose: (k, k, cin, cout)
    out = jax.lax.conv_transpose(
        x, w, strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def reassemble(params: Dict, hooked: List[jax.Array], gh: int, gw: int
               ) -> List[jax.Array]:
    """Token maps -> 4 pyramid features at 1/4, 1/8, 1/16, 1/32 of input."""
    outs = []
    for i, tok in enumerate(hooked):
        p = params[f"post{i + 1}"]
        y = _readout_project(tok, p["project"], gh, gw)
        y = conv2d(y, p["channel"], padding=0)  # 1x1 to stage channels
        if i == 0:
            y = _conv_transpose2d(y, p["resample"], 4)
        elif i == 1:
            y = _conv_transpose2d(y, p["resample"], 2)
        elif i == 3:
            y = conv2d(y, p["resample"], stride=2, padding=1)  # 3x3 stride 2
        outs.append(conv2d(y, params[f"layer{i + 1}_rn"], padding=1))
    return outs


# ------------------------------------------------------------- fusion + head


def _up2x_align_corners(x: jax.Array) -> jax.Array:
    """Bilinear 2x upsample with ALIGN_CORNERS=True — the DPT fusion/head
    convention (midas/blocks.py:223,336, dpt_depth.py:94). jax.image.resize
    only does half-pixel (align_corners=False), so interpolate explicitly:
    out coord i maps to src i*(h-1)/(2h-1)."""
    n, h, w, c = x.shape

    def axis_interp(arr, size, axis):
        src = jnp.arange(2 * size) * ((size - 1) / (2 * size - 1))
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size - 1)
        f = (src - i0).astype(arr.dtype)
        shape = [1] * arr.ndim
        shape[axis] = 2 * size
        f = f.reshape(shape)
        a = jnp.take(arr, i0, axis=axis)
        b = jnp.take(arr, i1, axis=axis)
        return a * (1 - f) + b * f

    x = axis_interp(x, h, 1)
    return axis_interp(x, w, 2)


def _residual_conv_unit(p: Dict, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(x)
    h = conv2d(h, p["conv1"], padding=1)
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2"], padding=1)
    return x + h


def _fusion_block(p: Dict, x: jax.Array, skip: Optional[jax.Array]) -> jax.Array:
    if skip is not None:
        x = x + _residual_conv_unit(p["rcu1"], skip)
    x = _residual_conv_unit(p["rcu2"], x)
    x = _up2x_align_corners(x)  # align_corners=True (blocks.py:336)
    return conv2d(x, p["out_conv"], padding=0)


def dpt_apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, H, W, 3) ImageNet-normalized -> inverse depth (N, H, W)."""
    hooked, gh, gw = vit_features(params["vit"], x)
    l1, l2, l3, l4 = reassemble(params["reassemble"], hooked, gh, gw)
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


# ----------------------------------------------------------------- convert


def init_dpt(key, dim: int = 1024, n_blocks: int = 24, grid: int = 24) -> Dict:
    """Random-weight dpt_large tree (same layout as convert_dpt) — for
    benchmarks/smoke tests without a checkpoint; shapes mirror ViT-L/16 +
    the DPT reassemble/fusion/head (run_midas.py model_type dpt_large)."""
    ks = iter(jax.random.split(key, 16 + 6 * n_blocks + 40))

    def conv(kh, kw, cin, cout, bias=True):
        p = {"w": jax.random.normal(next(ks), (kh, kw, cin, cout),
                                    jnp.float32) * 0.02}
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p

    def lin(cin, cout):
        return {"w": jax.random.normal(next(ks), (cin, cout),
                                       jnp.float32) * 0.02,
                "b": jnp.zeros((cout,), jnp.float32)}

    def norm(c):
        return {"g": jnp.ones((c,), jnp.float32),
                "b": jnp.zeros((c,), jnp.float32)}

    vit = {
        "patch_embed": conv(16, 16, 3, dim),
        "cls_token": jax.random.normal(next(ks), (1, 1, dim), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(next(ks), (1, 1 + grid * grid, dim),
                                       jnp.float32) * 0.02,
        "blocks": [
            {"norm1": norm(dim), "qkv": lin(dim, 3 * dim),
             "proj": lin(dim, dim), "norm2": norm(dim),
             "fc1": lin(dim, 4 * dim), "fc2": lin(4 * dim, dim)}
            for _ in range(n_blocks)
        ],
    }
    re_p: Dict = {}
    for i in range(1, 5):
        ch = STAGE_CHANNELS[i - 1]
        entry = {"project": lin(2 * dim, dim), "channel": conv(1, 1, dim, ch)}
        if i == 1:
            entry["resample"] = conv(4, 4, ch, ch)
        elif i == 2:
            entry["resample"] = conv(2, 2, ch, ch)
        elif i == 4:
            entry["resample"] = conv(3, 3, ch, ch)
        re_p[f"post{i}"] = entry
        re_p[f"layer{i}_rn"] = conv(3, 3, ch, FEATURES, bias=False)
    fusion = {
        f"refine{i}": {
            "rcu1": {"conv1": conv(3, 3, FEATURES, FEATURES),
                     "conv2": conv(3, 3, FEATURES, FEATURES)},
            "rcu2": {"conv1": conv(3, 3, FEATURES, FEATURES),
                     "conv2": conv(3, 3, FEATURES, FEATURES)},
            "out_conv": conv(1, 1, FEATURES, FEATURES),
        }
        for i in range(1, 5)
    }
    head = {
        "conv1": conv(3, 3, FEATURES, FEATURES // 2),
        "conv2": conv(3, 3, FEATURES // 2, 32),
        "conv3": conv(1, 1, 32, 1),
    }
    return {"vit": vit, "reassemble": re_p, "fusion": fusion, "head": head}


def convert_dpt(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """Map the upstream dpt_large-midas .pt state dict onto the tree."""

    def cw(name):  # conv OIHW -> HWIO
        p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)), dtype)}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def ct(name):  # transpose-conv IOHW -> HWIO (torch ConvTranspose2d is (in,out,kh,kw))
        p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 0, 1)), dtype)}
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
    n_blocks = max(
        int(k.split(".")[3]) for k in sd if k.startswith(f"{vm}blocks.")
    ) + 1
    vit = {
        "patch_embed": cw(f"{vm}patch_embed.proj"),
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
    re_p: Dict = {}
    for i in range(1, 5):
        base = f"pretrained.act_postprocess{i}"
        entry = {
            "project": lw(f"{base}.0.project.0"),
            "channel": cw(f"{base}.3"),
        }
        if i in (1, 2):
            entry["resample"] = ct(f"{base}.4")
        elif i == 4:
            entry["resample"] = cw(f"{base}.4")
        re_p[f"post{i}"] = entry
        re_p[f"layer{i}_rn"] = cw(f"scratch.layer{i}_rn")
    fusion = {}
    for i in range(1, 5):
        base = f"scratch.refinenet{i}"
        fusion[f"refine{i}"] = {
            "rcu1": {
                "conv1": cw(f"{base}.resConfUnit1.conv1"),
                "conv2": cw(f"{base}.resConfUnit1.conv2"),
            },
            "rcu2": {
                "conv1": cw(f"{base}.resConfUnit2.conv1"),
                "conv2": cw(f"{base}.resConfUnit2.conv2"),
            },
            "out_conv": cw(f"{base}.out_conv"),
        }
    head = {
        "conv1": cw("scratch.output_conv.0"),
        "conv2": cw("scratch.output_conv.2"),
        "conv3": cw("scratch.output_conv.4"),
    }
    return {"vit": vit, "reassemble": re_p, "fusion": fusion, "head": head}


# ---------------------------------------------------------------- detector

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class MidasDetector:
    """Drop-in MidasDetector (annotator/midas/__init__.py:13-42):
    uint8 HWC in -> (depth uint8, normal uint8)."""

    def __init__(
        self,
        params: Optional[Dict] = None,
        ckpt_path: Optional[str] = None,
        model_type: str = "dpt_large",
    ):
        """model_type: "dpt_large" (ViT-L/16) or "dpt_hybrid" (ResNetV2+ViT-B,
        the reference's default — annotators/midas_hybrid.py)."""
        apply_fn = dpt_apply
        convert_fn = convert_dpt
        if model_type == "dpt_hybrid":
            from stablediffusioneo_tpu.annotators.midas_hybrid import (
                convert_dpt_hybrid, dpt_hybrid_apply,
            )

            apply_fn, convert_fn = dpt_hybrid_apply, convert_dpt_hybrid
        if params is None and ckpt_path is not None:
            from stablediffusioneo_tpu.checkpoint.torch_reader import (
                load_torch_state_dict,
            )

            params = convert_fn(load_torch_state_dict(ckpt_path))
        elif params is None and model_type == "dpt_large":
            # random weights (like the other detectors' fallback) — flow
            # tests and benchmarks without a checkpoint
            params = init_dpt(jax.random.PRNGKey(0))
        from stablediffusioneo_tpu.annotators._dtype import cast_params

        # bf16 on TPU / f32 elsewhere (annotators/_dtype.py): the ViT-L
        # trunk + DPT head are MXU-rate-bound; norm/softmax fp32 islands
        # live inside ops.norms/ops.attention. Depth comes back f32 — the
        # host normalizes over min/max before quantizing.
        self.params = cast_params(params)
        dt = jax.tree.leaves(self.params)[0].dtype
        # uint8 upload; ImageNet normalize in-graph (4x cheaper transfer
        # to a network-attached TPU than f32 pixels)
        mean = jnp.asarray(_IMAGENET_MEAN, dt)
        std = jnp.asarray(_IMAGENET_STD, dt)
        self._apply = jax.jit(
            lambda p, u8: apply_fn(
                p, (u8.astype(dt) / 255.0 - mean) / std
            ).astype(jnp.float32))

    def __call__(self, input_image: np.ndarray, a: float = np.pi * 2.0,
                 bg_th: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
        assert input_image.ndim == 3 and self.params is not None
        h, w = input_image.shape[:2]
        # DPT runs on /32-aligned inputs (ViT/16 then 1/2 head upsample)
        nh, nw = max(32, (h // 32) * 32), max(32, (w // 32) * 32)
        img = cv2.resize(input_image, (nw, nh), interpolation=cv2.INTER_AREA)
        depth = np.asarray(
            self._apply(self.params, jnp.asarray(
                np.ascontiguousarray(img[None]))), np.float32
        )[0]
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)

        depth_pt = depth - depth.min()
        depth_pt = depth_pt / max(depth_pt.max(), 1e-8)
        depth_image = (depth_pt * 255.0).clip(0, 255).astype(np.uint8)

        gx = cv2.Sobel(depth, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(depth, cv2.CV_32F, 0, 1, ksize=3)
        z = np.ones_like(gx) * a
        gx[depth_pt < bg_th] = 0
        gy[depth_pt < bg_th] = 0
        normal = np.stack([gx, gy, z], axis=2)
        normal /= np.sum(normal ** 2.0, axis=2, keepdims=True) ** 0.5
        normal_image = (normal * 127.5 + 127.5).clip(0, 255).astype(np.uint8)
        return depth_image, normal_image
