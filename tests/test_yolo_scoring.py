"""YOLOv5 pipeline + score-harness tests.

NMS/postprocess parity runs against torch reference math re-implemented
inline (torchvision is unavailable; NMS semantics verified against a
brute-force O(n^2) greedy reference)."""

import numpy as np
import pytest

from stablediffusioneo_tpu.yolo import PostProcessor, PreProcessor, nms, draw_boxes
from stablediffusioneo_tpu.yolo.pipeline import iou_matrix
from stablediffusioneo_tpu.scoring import (
    PixelFeatureExtractor,
    ScoreHarness,
    get_score,
    perceptual_distance,
)


def brute_force_nms(boxes, scores, thr):
    idxs = list(np.argsort(-scores, kind="stable"))
    keep = []
    while idxs:
        i = idxs.pop(0)
        keep.append(i)
        rest = []
        for j in idxs:
            if iou_matrix(boxes[i : i + 1], boxes[j : j + 1])[0, 0] <= thr:
                rest.append(j)
        idxs = rest
    return np.asarray(keep)


class TestYolo:
    def test_preprocessor_letterbox(self, rng):
        pre = PreProcessor(640, 640)
        img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        out, hw_scale, left, top = pre(img)
        assert out.shape == (640, 640, 3)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0
        assert hw_scale == 480 / 640
        assert left == 0 and top == 80  # centered vertical padding
        # padding rows are 114/255 gray
        np.testing.assert_allclose(out[:80], 114 / 255.0, atol=1e-6)

    def test_nms_vs_bruteforce(self, rng):
        boxes = rng.random((50, 4)).astype(np.float32) * 100
        boxes[:, 2:] = boxes[:, :2] + rng.random((50, 2)).astype(np.float32) * 50 + 1
        scores = rng.random(50).astype(np.float32)
        for thr in (0.3, 0.5, 0.7):
            np.testing.assert_array_equal(
                nms(boxes, scores, thr), brute_force_nms(boxes, scores, thr)
            )

    def test_postprocessor(self, rng):
        # 2 anchors: one confident box, one below threshold
        pred = np.zeros((1, 3, 5 + 2), np.float32)
        pred[0, 0] = [50, 50, 20, 20, 0.9, 0.8, 0.1]  # class 0
        pred[0, 1] = [50, 50, 22, 22, 0.85, 0.7, 0.2]  # overlapping, suppressed
        pred[0, 2] = [10, 10, 5, 5, 0.01, 0.9, 0.1]  # filtered by obj conf
        post = PostProcessor(0.25, 0.45, left=0, top=0, ratio_w=1.0, ratio_h=1.0)
        out = post(pred)
        assert len(out) == 1
        det = out[0]
        assert det.shape == (1, 6)
        np.testing.assert_allclose(det[0, :4], [40, 40, 60, 60], atol=1e-5)
        assert det[0, 5] == 0  # class
        np.testing.assert_allclose(det[0, 4], 0.9 * 0.8, rtol=1e-6)

    def test_class_filter_and_draw(self, rng):
        pred = np.zeros((1, 2, 7), np.float32)
        pred[0, 0] = [50, 50, 20, 20, 0.9, 0.8, 0.1]  # class 0
        pred[0, 1] = [100, 100, 20, 20, 0.9, 0.1, 0.8]  # class 1
        post = PostProcessor(0.25, 0.45, 0, 0, 1.0, 1.0)
        out = post(pred, classes=[1])[0]
        assert out.shape[0] == 1 and out[0, 5] == 1
        img = np.zeros((200, 200, 3), np.uint8)
        drawn = draw_boxes(img, out, class_names=["a", "b"])
        assert drawn.sum() > 0  # something was rendered


class TestScoring:
    def test_score_formula(self):
        # exact piecewise values (compute_score.py:19-38)
        assert get_score(7000.0, 0.0) == 1.0
        np.testing.assert_allclose(get_score(7000.0, 2.0), 0.8)
        np.testing.assert_allclose(get_score(7000.0, 4.0), 0.6)
        np.testing.assert_allclose(get_score(7000.0, 8.0), 0.55)
        np.testing.assert_allclose(get_score(7000.0, 12.0), 0.0)
        assert get_score(7000.0, 13.0) == 0.0
        np.testing.assert_allclose(get_score(3500.0, 0.0), 2.0)

    def test_perceptual_distance(self, rng):
        a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        assert perceptual_distance(a, a) == 0.0
        b = 255 - a
        assert perceptual_distance(a, b) > perceptual_distance(a, a)

    def test_harness(self, rng):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)

        def fake_process(image, prompt, **kw):
            return [image, image]  # [detected_map, sample]

        h = ScoreHarness(fake_process)
        res = h.run([img], [img])
        assert res["mean_pd"] == 0.0
        assert res["mean_score"] > 0


class TestInceptionV3:
    def _random_sd(self):
        rng = np.random.default_rng(0)
        sd = {}

        def conv(name, cout, cin, kh, kw=None):
            kw = kw if kw is not None else kh
            sd[f"{name}.conv.weight"] = (
                rng.standard_normal((cout, cin, kh, kw)).astype(np.float32) * 0.05
            )
            sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
            sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)

        conv("Conv2d_1a_3x3", 32, 3, 3)
        conv("Conv2d_2a_3x3", 32, 32, 3)
        conv("Conv2d_2b_3x3", 64, 32, 3)
        conv("Conv2d_3b_1x1", 80, 64, 1)
        conv("Conv2d_4a_3x3", 192, 80, 3)
        cin = 192
        for name, pool_f in [("Mixed_5b", 32), ("Mixed_5c", 64), ("Mixed_5d", 64)]:
            conv(f"{name}.branch1x1", 64, cin, 1)
            conv(f"{name}.branch5x5_1", 48, cin, 1)
            conv(f"{name}.branch5x5_2", 64, 48, 5)
            conv(f"{name}.branch3x3dbl_1", 64, cin, 1)
            conv(f"{name}.branch3x3dbl_2", 96, 64, 3)
            conv(f"{name}.branch3x3dbl_3", 96, 96, 3)
            conv(f"{name}.branch_pool", pool_f, cin, 1)
            cin = 64 + 64 + 96 + pool_f
        conv("Mixed_6a.branch3x3", 384, cin, 3)
        conv("Mixed_6a.branch3x3dbl_1", 64, cin, 1)
        conv("Mixed_6a.branch3x3dbl_2", 96, 64, 3)
        conv("Mixed_6a.branch3x3dbl_3", 96, 96, 3)
        cin = 384 + 96 + cin  # 768
        for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160),
                         ("Mixed_6d", 160), ("Mixed_6e", 192)]:
            conv(f"{name}.branch1x1", 192, cin, 1)
            conv(f"{name}.branch7x7_1", c7, cin, 1)
            conv(f"{name}.branch7x7_2", c7, c7, 1, 7)
            conv(f"{name}.branch7x7_3", 192, c7, 7, 1)
            conv(f"{name}.branch7x7dbl_1", c7, cin, 1)
            conv(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
            conv(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
            conv(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
            conv(f"{name}.branch7x7dbl_5", 192, c7, 1, 7)
            conv(f"{name}.branch_pool", 192, cin, 1)
        conv("Mixed_7a.branch3x3_1", 192, cin, 1)
        conv("Mixed_7a.branch3x3_2", 320, 192, 3)
        conv("Mixed_7a.branch7x7x3_1", 192, cin, 1)
        conv("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
        conv("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
        conv("Mixed_7a.branch7x7x3_4", 192, 192, 3)
        cin = 320 + 192 + cin  # 1280
        for name in ("Mixed_7b", "Mixed_7c"):
            conv(f"{name}.branch1x1", 320, cin, 1)
            conv(f"{name}.branch3x3_1", 384, cin, 1)
            conv(f"{name}.branch3x3_2a", 384, 384, 1, 3)
            conv(f"{name}.branch3x3_2b", 384, 384, 3, 1)
            conv(f"{name}.branch3x3dbl_1", 448, cin, 1)
            conv(f"{name}.branch3x3dbl_2", 384, 448, 3)
            conv(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
            conv(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
            conv(f"{name}.branch_pool", 192, cin, 1)
            cin = 320 + 768 + 768 + 192  # 2048
        return sd

    def test_features_shape(self, rng):
        import jax.numpy as jnp

        from stablediffusioneo_tpu.scoring.inception import (
            convert_inception, inception_features,
        )

        params = convert_inception(self._random_sd())
        x = jnp.asarray(rng.standard_normal((1, 128, 128, 3), dtype=np.float32))
        feats = inception_features(params, x)
        assert feats.shape == (1, 2048)
        assert np.isfinite(np.asarray(feats)).all()

    def test_extractor_in_harness(self, rng):
        from stablediffusioneo_tpu.scoring import perceptual_distance
        from stablediffusioneo_tpu.scoring.inception import (
            InceptionFeatureExtractor, convert_inception,
        )

        ext = InceptionFeatureExtractor(params=convert_inception(self._random_sd()))
        a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        assert perceptual_distance(a, a, ext) == 0.0
        b = 255 - a
        assert perceptual_distance(a, b, ext) > 0
