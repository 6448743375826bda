"""Checkpoint reader tests: torch-zip pickle, safetensors (incl. the
torch-free raw bf16 decode path).

Covers the reference's load_state_dict contract (cldm/model.py:8-21):
both formats load to {name: numpy fp32-compatible arrays} with nested
state_dict unwrapping.
"""

import numpy as np
import pytest
import torch

from stablediffusioneo_tpu.checkpoint.torch_reader import (
    _read_safetensors_raw_bf16,
    _read_torch_zip,
    load_torch_state_dict,
)


def _mk_state(seed=0):
    g = torch.Generator().manual_seed(seed)
    return {
        "model.diffusion_model.w": torch.randn(4, 8, generator=g),
        "model.bias": torch.randn(8, generator=g),
        "first_stage_model.conv.weight": torch.randn(2, 3, 3, 3, generator=g),
    }


def test_torch_zip_reader_matches_torch_load(tmp_path):
    sd = _mk_state()
    p = str(tmp_path / "ck.pth")
    torch.save({"state_dict": sd}, p)
    ours = load_torch_state_dict(p, prefer_torch=False)
    assert set(ours) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(ours[k], sd[k].numpy())


def test_torch_zip_reader_bf16(tmp_path):
    sd = {"w": torch.randn(16, 16).bfloat16()}
    p = str(tmp_path / "ck_bf16.pth")
    torch.save(sd, p)
    ours = _read_torch_zip(p)
    np.testing.assert_array_equal(ours["w"], sd["w"].float().numpy())


def test_safetensors_fp32(tmp_path):
    st = pytest.importorskip("safetensors.torch")
    sd = _mk_state(1)
    p = str(tmp_path / "ck.safetensors")
    st.save_file(sd, p)
    ours = load_torch_state_dict(p)
    for k in sd:
        np.testing.assert_array_equal(ours[k], sd[k].numpy())


def test_safetensors_bf16_raw_reader(tmp_path):
    """The torch-free bf16 path: raw uint16<<16 upshift must match torch's
    own bf16->fp32 conversion bit-exactly."""
    st = pytest.importorskip("safetensors.torch")
    sd = {
        "a.weight": torch.randn(8, 12).bfloat16(),
        "b.bias": torch.randn(5).bfloat16(),
    }
    p = str(tmp_path / "ck_bf16.safetensors")
    st.save_file(sd, p)
    out = _read_safetensors_raw_bf16(p, list(sd))
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k].float().numpy())
        assert out[k].dtype == np.float32

    with pytest.raises(KeyError):
        _read_safetensors_raw_bf16(p, ["missing.key"])


def test_safetensors_mixed_dtypes_full_load(tmp_path):
    """load_torch_state_dict on a mixed fp32+bf16 file (torch available, so
    it takes the torch fallback — the raw reader is tested above)."""
    st = pytest.importorskip("safetensors.torch")
    sd = {
        "f32": torch.randn(4, 4),
        "bf16": torch.randn(4, 4).bfloat16(),
    }
    p = str(tmp_path / "mixed.safetensors")
    st.save_file(sd, p)
    ours = load_torch_state_dict(p)
    np.testing.assert_array_equal(ours["f32"], sd["f32"].numpy())
    np.testing.assert_array_equal(ours["bf16"], sd["bf16"].float().numpy())
