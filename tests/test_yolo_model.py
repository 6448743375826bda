"""YOLOv5 JAX detector tests: shapes, decode ranges, BN folding parity,
end-to-end pipeline integration."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.yolo.model import (
    ANCHORS,
    STRIDES,
    _fold_bn,
    init_yolov5,
    yolov5_apply,
)
from stablediffusioneo_tpu.yolo import PostProcessor, PreProcessor

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


class TestYoloModel:
    @pytest.fixture(scope="class")
    def params(self):
        return init_yolov5(jax.random.PRNGKey(0), num_classes=80)

    def test_output_shape_and_ranges(self, params):
        x = jnp.zeros((1, 256, 256, 3))
        out = np.asarray(yolov5_apply(params, x))
        n_anchors = sum(3 * (256 // s) ** 2 for s in STRIDES)
        assert out.shape == (1, n_anchors, 85)
        # decoded xy within image, wh positive, scores in (0,1)
        assert (out[..., 0] >= -16).all() and (out[..., 0] <= 256 + 16).all()
        assert (out[..., 2:4] > 0).all()
        assert (out[..., 4:] >= 0).all() and (out[..., 4:] <= 1).all()

    def test_detect_topk_matches_full_path(self, params, rng):
        """yolov5_detect (uint8 in, device-side top-k by objectness) must
        reproduce the full-fetch path: with k = all anchors it is exactly
        the objectness-sorted prediction tensor; smaller k is its prefix."""
        from stablediffusioneo_tpu.yolo.model import yolov5_detect

        img = (rng.random((1, 256, 256, 3)) * 255).astype(np.uint8)
        full = np.asarray(yolov5_apply(params, jnp.asarray(img, jnp.float32) / 255.0))
        order = np.argsort(-full[0, :, 4], kind="stable")
        n = full.shape[1]
        top_all = np.asarray(yolov5_detect(params, jnp.asarray(img), k=n))
        np.testing.assert_allclose(top_all[0], full[0, order], rtol=1e-6, atol=1e-6)
        top50 = np.asarray(yolov5_detect(params, jnp.asarray(img), k=50))
        np.testing.assert_allclose(top50[0], full[0, order[:50]], rtol=1e-6, atol=1e-6)

    def test_bn_folding_parity(self, rng):
        conv = nn.Conv2d(3, 8, 3, padding=1, bias=False)
        bn = nn.BatchNorm2d(8, eps=1e-3)
        torch.manual_seed(0)
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.uniform_(-0.5, 0.5)
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2.0)
        conv.eval(); bn.eval()
        x = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)
        with torch.no_grad():
            ref = bn(conv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))).numpy()
        w, b = _fold_bn(
            conv.weight.detach().numpy(),
            bn.weight.detach().numpy(), bn.bias.detach().numpy(),
            bn.running_mean.numpy(), bn.running_var.numpy(),
        )
        from stablediffusioneo_tpu.ops.layers import conv2d

        out = np.asarray(
            conv2d(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}, padding=1)
        )
        np.testing.assert_allclose(out, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5)

    def test_pipeline_end_to_end(self, params, rng):
        """pre -> detector -> post, the trt_yolov5.py flow (misc.py usage)."""
        img = (rng.random((240, 320, 3)) * 255).astype(np.uint8)
        pre = PreProcessor(256, 256)
        x, hw_scale, left, top = pre(img)
        pred = np.asarray(yolov5_apply(params, jnp.asarray(x[None])))
        post = PostProcessor(0.25, 0.45, left, top, 320 / 256, 240 / 256)
        dets = post(pred)
        assert len(dets) == 1
        assert dets[0].shape[1] == 6 or dets[0].shape == (0, 6)
