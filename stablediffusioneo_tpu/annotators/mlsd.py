"""MLSD line-segment annotator — decode utilities + detector surface.

Re-design of the reference's MLSD stack (annotator/mlsd/). NOTE: the
reference snapshot itself is missing the model package
(`annotator/mlsd/models/` gitignored; `annotator/mlsd/__init__.py:11-12`
imports absent files — SURVEY §0), so the runnable surface there is the
decode path, which is fully implemented here:

  - `decode_center_and_displacement` (utils.py:19-44): sigmoid center
    heatmap, 5x5 max-pool NMS, top-k centers, 4-ch displacement map;
  - `pred_lines` (utils.py:47-86): threshold by score and segment length,
    reconstruct endpoints from displacements, rescale to image coords;
  - `MLSDdetector` (annotator/mlsd/__init__.py:21-44): white line rendering
    on black, returns single-channel uint8.

The network is pluggable (`model_fn: (N,H,W,4)->(N,h,w,>=5)` with channel 0
= center logit, 1:5 = displacements at half input resolution). Two nets
honor this contract:
  - `init_tiny_mlsd`/`tiny_mlsd_apply` (here): compact net for flow tests;
  - `annotators/mlsd_net.py`: the full MobileV2-MLSD-Large architecture
    with a BN-folding converter keyed on the public upstream state-dict
    naming. Its wiring follows the public mlsd repo (the reference snapshot
    gitignores the model package) and is A/B-tested numerically against a
    full-architecture torch mirror (tests/test_pose_depth_mlsd.py);
    verification against the real `mlsd_large_512_fp32.pth` still requires
    those weights (unavailable in this zero-egress environment).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.layers import conv2d, conv_init


def decode_center_and_displacement(
    tp_map: np.ndarray, topk: int = 200, ksize: int = 3
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(1, h, w, C>=5) NHWC map -> (pts (k,2) [y,x], scores (k,), disp
    (h, w, 4)). Channel 0 center logit, 1:5 displacement."""
    assert tp_map.shape[0] == 1
    center = tp_map[0, :, :, 0]
    disp = tp_map[0, :, :, 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))
    pad = (ksize - 1) // 2
    padded = np.pad(heat, pad, constant_values=-np.inf)
    windows = np.lib.stride_tricks.sliding_window_view(padded, (ksize, ksize))
    hmax = windows.max(axis=(2, 3))
    heat = np.where(hmax == heat, heat, 0.0).reshape(-1)
    k = min(topk, heat.size)
    idx = np.argpartition(-heat, k - 1)[:k]
    idx = idx[np.argsort(-heat[idx], kind="stable")]
    w = center.shape[1]
    pts = np.stack([idx // w, idx % w], axis=-1)
    return pts, heat[idx], disp


def pred_lines(
    image: np.ndarray,
    model_fn: Callable[[np.ndarray], np.ndarray],
    input_shape=(512, 512),
    score_thr: float = 0.10,
    dist_thr: float = 20.0,
) -> np.ndarray:
    """Run the net + decode into (n, 4) [x0, y0, x1, y1] image-space lines."""
    h, w, _ = image.shape
    h_ratio, w_ratio = h / input_shape[0], w / input_shape[1]
    resized = cv2.resize(
        image, (input_shape[1], input_shape[0]), interpolation=cv2.INTER_AREA
    )
    x = np.concatenate(
        [resized, np.ones([input_shape[0], input_shape[1], 1])], axis=-1
    )[None].astype(np.float32)
    x = x / 127.5 - 1.0
    tp_map = np.asarray(model_fn(x), np.float32)  # (1, h/2, w/2, >=5)
    pts, scores, disp = decode_center_and_displacement(tp_map, 200, 3)
    start = disp[:, :, :2]
    end = disp[:, :, 2:]
    dist_map = np.sqrt(np.sum((start - end) ** 2, axis=-1))

    segments = []
    for (y, x_), score in zip(pts, scores):
        if score > score_thr and dist_map[y, x_] > dist_thr:
            dxs, dys, dxe, dye = disp[y, x_]
            segments.append([x_ + dxs, y + dys, x_ + dxe, y + dye])
    lines = 2.0 * np.asarray(segments, np.float32).reshape(-1, 4)
    lines[:, 0] *= w_ratio
    lines[:, 1] *= h_ratio
    lines[:, 2] *= w_ratio
    lines[:, 3] *= h_ratio
    return lines


# -------------------------------------------------- placeholder contract net


def init_tiny_mlsd(key, width: int = 32) -> Dict:
    ks = iter(jax.random.split(key, 8))
    return {
        "conv1": conv_init(next(ks), 3, 3, 4, width),
        "conv2": conv_init(next(ks), 3, 3, width, width),
        "conv3": conv_init(next(ks), 3, 3, width, width),
        "head": conv_init(next(ks), 1, 1, width, 16),
    }


def tiny_mlsd_apply(params: Dict, x: jax.Array) -> jax.Array:
    """(N, H, W, 4) -> (N, H/2, W/2, 16) honoring the MLSD output contract."""
    h = jax.nn.relu(conv2d(x, params["conv1"], stride=2, padding=1))
    h = jax.nn.relu(conv2d(h, params["conv2"], padding=1))
    h = jax.nn.relu(conv2d(h, params["conv3"], padding=1))
    return conv2d(h, params["head"], padding=0)


class MLSDdetector:
    """Drop-in MLSDdetector (annotator/mlsd/__init__.py:21-44).

    With ckpt_path (upstream `mlsd_large_512_fp32.pth`), runs the full
    MobileV2-MLSD-Large net (annotators/mlsd_net.py); otherwise the tiny
    contract net (flow tests)."""

    def __init__(self, model_fn: Optional[Callable] = None,
                 ckpt_path: Optional[str] = None):
        if model_fn is None and ckpt_path is not None:
            from stablediffusioneo_tpu.annotators.mlsd_net import (
                convert_mlsd_large, mlsd_large_apply,
            )
            from stablediffusioneo_tpu.checkpoint.torch_reader import (
                load_torch_state_dict,
            )

            from stablediffusioneo_tpu.annotators._dtype import cast_params

            # bf16 on TPU / f32 elsewhere (annotators/_dtype.py); the
            # decode thresholds run on the f32 output maps either way
            params = cast_params(
                convert_mlsd_large(load_torch_state_dict(ckpt_path)))
            dt = jax.tree.leaves(params)[0].dtype
            jitted = jax.jit(lambda p, x: mlsd_large_apply(
                p, x.astype(dt)).astype(jnp.float32))
            model_fn = lambda x: jitted(params, jnp.asarray(x))
        elif model_fn is None:
            params = init_tiny_mlsd(jax.random.PRNGKey(0))
            jitted = jax.jit(tiny_mlsd_apply)
            model_fn = lambda x: jitted(params, jnp.asarray(x))
        self.model_fn = model_fn

    def __call__(self, input_image: np.ndarray, thr_v: float, thr_d: float
                 ) -> np.ndarray:
        assert input_image.ndim == 3
        img_output = np.zeros_like(input_image)
        try:
            lines = pred_lines(
                input_image, self.model_fn,
                (input_image.shape[0], input_image.shape[1]), thr_v, thr_d,
            )
            for x0, y0, x1, y1 in lines.astype(int):
                cv2.line(img_output, (x0, y0), (x1, y1), (255, 255, 255), 1)
        except Exception:
            pass
        return img_output[:, :, 0]
