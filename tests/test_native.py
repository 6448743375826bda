"""Native C++ preprocessing library tests (builds it if missing)."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    lib = os.path.join(REPO, "native", "build", "libsdeo_preproc.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True,
                       capture_output=True)
    assert os.path.exists(lib)


class TestNativePreproc:
    def test_available(self):
        from stablediffusioneo_tpu.annotators import native

        assert native.native_available()

    def test_hwc3_parity(self, rng):
        from stablediffusioneo_tpu.annotators import native
        from stablediffusioneo_tpu.annotators.util import HWC3

        gray = (rng.random((16, 16)) * 255).astype(np.uint8)
        np.testing.assert_array_equal(native.hwc3(gray), HWC3(gray))
        rgb = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        np.testing.assert_array_equal(native.hwc3(rgb), HWC3(rgb))
        rgba = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
        diff = np.abs(
            native.hwc3(rgba).astype(int) - HWC3(rgba).astype(int)
        ).max()
        assert diff <= 1  # rounding-mode ulp

    def test_resize_parity_vs_cv2(self, rng):
        import cv2

        from stablediffusioneo_tpu.annotators import native

        x = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
        a = native.resize_bilinear(x, 37, 53)
        b = cv2.resize(x, (53, 37), interpolation=cv2.INTER_LINEAR)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_canny_agreement_vs_cv2(self, rng):
        import cv2

        from stablediffusioneo_tpu.annotators import native

        img = np.zeros((64, 64), np.uint8)
        img[16:48, 16:48] = 200
        img = cv2.GaussianBlur(img, (5, 5), 1.2)
        a = native.canny(img, 100, 200)
        b = cv2.Canny(img, 100, 200)
        inter = ((a > 0) & (b > 0)).sum()
        union = ((a > 0) | (b > 0)).sum()
        assert inter / max(union, 1) == 1.0  # exact on the synthetic box

        nat = cv2.GaussianBlur(
            (rng.random((128, 128)) * 255).astype(np.uint8), (7, 7), 2.0
        )
        a = native.canny(nat, 60, 150)
        b = cv2.Canny(nat, 60, 150)
        inter = ((a > 0) & (b > 0)).sum()
        union = ((a > 0) | (b > 0)).sum()
        # residual disagreement comes from fp-vs-int gradient rounding and
        # tie handling on noise-like texture; structural edges match exactly
        assert inter / max(union, 1) > 0.8
