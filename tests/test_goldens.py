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


# fast tier: one record per model family (3 engine compiles); the full
# sampler/mode sweep runs in the slow tier
_FAST = ("sd15_ddim", "sd15_ddim_eta05", "sd21v_ddim", "sdxl_txt2img")
_SLOW = ("sd15_guess_mode", "sd15_plms", "sd15_unipc", "sd15_dpmpp",
         "sd15_euler_a", "sd15_img2img", "sd15_inpaint")


@pytest.fixture(scope="module")
def committed():
    with np.load(_PATH) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def fast_replayed(committed):
    return goldens.build_fast_records()


@pytest.fixture(scope="module")
def replayed():
    return goldens.build_golden_records()


def _compare(name, got, want):
    assert got.shape == want.shape and got.dtype == want.dtype
    if not np.array_equal(got, want):
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        pytest.fail(
            f"{name}: output drifted from the committed golden "
            f"(max |d| = {diff.max()}, {np.mean(diff > 0):.1%} of pixels)")


def test_record_set_matches_committed(committed):
    assert set(committed) == set(_FAST) | set(_SLOW), (
        "golden record set drifted — regenerate via "
        "scripts/make_fixtures.py --goldens")


@pytest.mark.parametrize("name", _FAST)
def test_golden_replay_fast(committed, fast_replayed, name):
    _compare(name, fast_replayed[name], committed[name])


@pytest.mark.slow
@pytest.mark.parametrize("name", _SLOW)
def test_golden_replay_full(committed, replayed, name):
    _compare(name, replayed[name], committed[name])
