"""Pinned end-to-end goldens: replay every committed record and
byte-compare (the reference's `base_imgs/` drift check made weight-free —
compute_score.py:68-69; see stablediffusioneo_tpu/testing/goldens.py).

A mismatch means the compute path changed numerically. Either fix the
regression, or — for an INTENDED change — regenerate with
`python scripts/make_fixtures.py --goldens` and justify it in the commit.
"""

import os

import numpy as np
import pytest

from stablediffusioneo_tpu.testing import goldens

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "goldens", goldens.GOLDEN_FILE)


@pytest.fixture(scope="module")
def committed():
    with np.load(_PATH) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def replayed():
    return goldens.build_golden_records()


def test_record_sets_match(committed, replayed):
    assert set(committed) == set(replayed), (
        "golden record set drifted — regenerate via "
        "scripts/make_fixtures.py --goldens")


@pytest.mark.parametrize("name", [
    "sd15_ddim", "sd15_ddim_eta05", "sd15_guess_mode", "sd15_plms",
    "sd15_unipc", "sd15_dpmpp", "sd15_euler_a", "sd15_img2img",
    "sd15_inpaint", "sd21v_ddim", "sdxl_txt2img",
])
def test_golden_replay(committed, replayed, name):
    got, want = replayed[name], committed[name]
    assert got.shape == want.shape and got.dtype == want.dtype
    if not np.array_equal(got, want):
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        pytest.fail(
            f"{name}: output drifted from the committed golden "
            f"(max |d| = {diff.max()}, {np.mean(diff > 0):.1%} of pixels)")
