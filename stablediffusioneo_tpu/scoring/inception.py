"""InceptionV3 pool3 (2048-d) feature extractor — functional JAX, NHWC.

The reference scores perceptual distance with pytorch_fid's InceptionV3
activations (compute_score.py:8-17). This is the torchvision
inception_v3 tower up to the global pool (the FID feature layer),
implemented NHWC with BatchNorm folded into the convs at conversion time.

Weights load from a torchvision / pt_inception state dict supplied locally
(`convert_inception`; this framework never downloads). The FID variants'
avg-pool subtleties (count_include_pad=False) are honored.

Preprocessing contract (pytorch_fid): uint8 RGB -> bilinear resize to
299x299 -> scale to [-1, 1].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.layers import conv2d


def _avg_pool_nocount(x, k=3, stride=1, pad=1):
    """avg_pool with count_include_pad=False (FID Inception flavor)."""
    ones = jnp.ones_like(x[..., :1])
    window = (1, k, k, 1)
    strides = (1, stride, stride, 1)
    pads = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, pads)
    return s / c


def _max_pool(x, k=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def _bconv(p, x, stride=1, pad=(0, 0)):
    """BasicConv2d with folded BN: conv + bias + relu."""
    if isinstance(pad, int):
        pad = (pad, pad)
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)
    return jax.nn.relu(out)


def _inception_a(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b5 = _bconv(p["branch5x5_2"], _bconv(p["branch5x5_1"], x), pad=2)
    b3 = _bconv(p["branch3x3dbl_1"], x)
    b3 = _bconv(p["branch3x3dbl_2"], b3, pad=1)
    b3 = _bconv(p["branch3x3dbl_3"], b3, pad=1)
    bp = _bconv(p["branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _bconv(p["branch3x3"], x, stride=2)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=1)
    bd = _bconv(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _inception_c(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b7 = _bconv(p["branch7x7_1"], x)
    b7 = _bconv(p["branch7x7_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7_3"], b7, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_1"], x)
    bd = _bconv(p["branch7x7dbl_2"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_3"], bd, pad=(0, 3))
    bd = _bconv(p["branch7x7dbl_4"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_5"], bd, pad=(0, 3))
    bp = _bconv(p["branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _bconv(p["branch3x3_2"], _bconv(p["branch3x3_1"], x), stride=2)
    b7 = _bconv(p["branch7x7x3_1"], x)
    b7 = _bconv(p["branch7x7x3_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7x3_3"], b7, pad=(3, 0))
    b7 = _bconv(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _inception_e(p, x, pool: str):
    b1 = _bconv(p["branch1x1"], x)
    b3 = _bconv(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [_bconv(p["branch3x3_2a"], b3, pad=(0, 1)),
         _bconv(p["branch3x3_2b"], b3, pad=(1, 0))], axis=-1,
    )
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=1)
    bd = jnp.concatenate(
        [_bconv(p["branch3x3dbl_3a"], bd, pad=(0, 1)),
         _bconv(p["branch3x3dbl_3b"], bd, pad=(1, 0))], axis=-1,
    )
    pooled = (
        _max_pool(x, 3, 1, 1) if pool == "max" else _avg_pool_nocount(x)
    )
    bp = _bconv(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, 299, 299, 3) in [-1, 1] -> (N, 2048) pool3 features."""
    h = _bconv(params["Conv2d_1a_3x3"], x, stride=2)
    h = _bconv(params["Conv2d_2a_3x3"], h)
    h = _bconv(params["Conv2d_2b_3x3"], h, pad=1)
    h = _max_pool(h)
    h = _bconv(params["Conv2d_3b_1x1"], h)
    h = _bconv(params["Conv2d_4a_3x3"], h)
    h = _max_pool(h)
    h = _inception_a(params["Mixed_5b"], h)
    h = _inception_a(params["Mixed_5c"], h)
    h = _inception_a(params["Mixed_5d"], h)
    h = _inception_b(params["Mixed_6a"], h)
    h = _inception_c(params["Mixed_6b"], h)
    h = _inception_c(params["Mixed_6c"], h)
    h = _inception_c(params["Mixed_6d"], h)
    h = _inception_c(params["Mixed_6e"], h)
    h = _inception_d(params["Mixed_7a"], h)
    h = _inception_e(params["Mixed_7b"], h, pool="avg")
    h = _inception_e(params["Mixed_7c"], h, pool="max")  # FID flavor
    return jnp.mean(h, axis=(1, 2))  # global average pool -> (N, 2048)


def convert_inception(sd: Dict[str, np.ndarray], bn_eps: float = 1e-3) -> Dict:
    """torchvision/pt_inception state dict -> folded-BN NHWC tree.

    AuxLogits.* (the training-time auxiliary classifier, present in full
    torchvision checkpoints) is excluded: the FID feature tower stops at
    the global pool."""
    modules = sorted({
        k.split(".conv.")[0] for k in sd
        if ".conv.weight" in k and not k.startswith("AuxLogits.")
    })
    out: Dict = {}
    for mod in modules:
        w = sd[f"{mod}.conv.weight"]
        g = sd[f"{mod}.bn.weight"]
        b = sd[f"{mod}.bn.bias"]
        mean = sd[f"{mod}.bn.running_mean"]
        var = sd[f"{mod}.bn.running_var"]
        scale = g / np.sqrt(var + bn_eps)
        wf = np.transpose(w * scale[:, None, None, None], (2, 3, 1, 0))
        bf = b - mean * scale
        top, _, leaf = mod.partition(".")
        entry = {"w": jnp.asarray(wf), "b": jnp.asarray(bf)}
        if leaf:
            out.setdefault(top, {})[leaf] = entry
        else:
            out[top] = entry
    return out


class InceptionFeatureExtractor:
    """Drop-in extractor for scoring.perceptual_distance: uint8 HWC image ->
    (2048,) activations, pytorch_fid preprocessing."""

    def __init__(self, params: Optional[Dict] = None, ckpt_path: Optional[str] = None):
        if params is None and ckpt_path is not None:
            from stablediffusioneo_tpu.checkpoint.accounting import account
            from stablediffusioneo_tpu.checkpoint.torch_reader import (
                load_torch_state_dict,
            )

            # strict key accounting, like every other converter: a real
            # pt_inception/torchvision file either maps 100% (BN momentum
            # counters aside) or fails naming the orphan keys
            rep = account(
                convert_inception, load_torch_state_dict(ckpt_path),
                ignore=(r".*\.bn\.num_batches_tracked",
                        # torchvision's full inception_v3 carries the
                        # aux-logits head and fc classifier; the FID
                        # feature tower stops at the global pool
                        r"AuxLogits\..*", r"fc\.(weight|bias)"),
            )
            rep.assert_complete("inception")
            params = rep.tree
        assert params is not None, "provide params or ckpt_path"
        self.params = params
        self._apply = jax.jit(inception_features)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        import cv2

        x = cv2.resize(img, (299, 299), interpolation=cv2.INTER_LINEAR)
        x = x.astype(np.float32) / 127.5 - 1.0
        return np.asarray(self._apply(self.params, jnp.asarray(x[None])))[0]
