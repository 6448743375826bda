"""Weight-acquisition manifest: offline structure gates + integrity
pinning for the external checkpoints (VERDICT r3 #4; the reference only
documents its download list — README setup + annotator URL constants like
annotator/hed/__init__.py:66-70 — and verifies nothing)."""

import json
import os

import numpy as np
import pytest
import torch

from stablediffusioneo_tpu.checkpoint import manifest as mf


@pytest.fixture(scope="module")
def man():
    return mf.load_manifest()


class TestManifestContent:
    def test_all_artifacts_present(self, man):
        assert set(man["artifacts"]) == {
            "control_sd15_canny", "clip_vocab", "clip_merges", "hed",
            "openpose_body", "openpose_hand", "mlsd_large", "dpt_hybrid",
            "dpt_large", "uniformer", "pt_inception", "sdxl_base",
        }

    def test_universes_load_and_digests_match(self, man):
        for name, e in man["artifacts"].items():
            if e.get("universe"):
                uni = mf.load_universe(e["universe"])
                assert len(uni) == e["key_count"], name
                assert mf.key_universe_digest(uni) == \
                    e["key_universe_sha256"], name

    def test_sd15_universe_is_real_width(self):
        uni = mf.load_universe("control_sd15_canny")
        # spot-check real SD-1.5 shapes through all four prefixes
        assert uni["model.diffusion_model.input_blocks.0.0.weight"] \
            == "320x4x3x3"
        assert uni["control_model.input_hint_block.0.weight"] == "16x3x3x3"
        assert uni["first_stage_model.decoder.conv_in.weight"] \
            == "512x4x3x3"
        assert uni["cond_stage_model.transformer.text_model."
                   "embeddings.token_embedding.weight"] == "49408x768"


class TestVerification:
    def test_renamed_file_rejected(self, tmp_path):
        p = tmp_path / "mystery_weights.pth"
        torch.save({"w": torch.zeros(3)}, str(p))
        with pytest.raises(mf.ManifestError, match="renamed"):
            mf.verify_file(str(p))

    def test_wrong_family_rejected_by_name(self, tmp_path):
        # a valid torch file under a manifest filename, but with the wrong
        # net inside: required-universe check must name the gap
        p = tmp_path / "ControlNetHED.pth"
        torch.save({"not_hed.weight": torch.zeros(4, 4)}, str(p))
        with pytest.raises(mf.ManifestError, match="required keys missing"):
            mf.verify_file(str(p))

    def _fake_hed(self, tmp_path):
        uni = mf.load_universe("hed")
        sd = {k: torch.zeros([int(d) for d in shape.split("x")] or [])
              for k, shape in uni.items()}
        p = tmp_path / "ControlNetHED.pth"
        torch.save(sd, str(p))
        return p

    def test_exact_universe_verifies_and_pin_then_tamper(self, tmp_path):
        p = self._fake_hed(tmp_path)
        rep = mf.verify_file(str(p))
        assert rep["ok"] and rep["key_count"] == 37
        assert rep["sha256"] is None  # unpinned: structure-only

        # pin into a local manifest copy, then tamper a payload byte
        local = tmp_path / "manifest.json"
        local.write_text(json.dumps(mf.load_manifest()))
        entry = mf.pin_file(str(p), manifest_path=str(local))
        assert entry["sha256"] and entry["size_bytes"] == os.path.getsize(p)
        rep = mf.verify_file(str(p), manifest_path=str(local))
        assert rep["ok"] and rep["sha256"] == entry["sha256"]

        raw = bytearray(p.read_bytes())
        raw[len(raw) // 2] ^= 0xFF
        p.write_bytes(bytes(raw))
        with pytest.raises(mf.ManifestError, match="sha256"):
            mf.verify_file(str(p), manifest_path=str(local))

    def test_shape_mismatch_rejected(self, tmp_path):
        uni = mf.load_universe("hed")
        sd = {k: torch.zeros([int(d) for d in shape.split("x")] or [])
              for k, shape in uni.items()}
        first = next(iter(sorted(uni)))
        sd[first] = torch.zeros(7, 7)  # wrong shape, right key
        p = tmp_path / "ControlNetHED.pth"
        torch.save(sd, str(p))
        with pytest.raises(mf.ManifestError, match="shape mismatch"):
            mf.verify_file(str(p))

    def test_vocab_and_merges_format_checks(self, tmp_path, man):
        v = tmp_path / "vocab.json"
        v.write_text(json.dumps({f"tok{i}": i for i in range(49408)}))
        assert mf.verify_file(str(v))["ok"]
        v.write_text(json.dumps({"a": 0}))
        with pytest.raises(mf.ManifestError, match="49408"):
            mf.verify_file(str(v))

        m = tmp_path / "merges.txt"
        m.write_text("#version: 0.2\n" + "\n".join(
            f"a{i} b{i}" for i in range(48100)))
        assert mf.verify_file(str(m))["ok"]
        m.write_text("a b\nc d\n")
        with pytest.raises(mf.ManifestError, match="version|lines"):
            mf.verify_file(str(m))

    def test_pin_refuses_wrong_structure(self, tmp_path):
        p = tmp_path / "ControlNetHED.pth"
        torch.save({"junk": torch.zeros(2)}, str(p))
        local = tmp_path / "manifest.json"
        local.write_text(json.dumps(mf.load_manifest()))
        with pytest.raises(mf.ManifestError, match="refusing to pin"):
            mf.pin_file(str(p), manifest_path=str(local))
        # and the manifest was not modified
        assert json.loads(local.read_text())["artifacts"]["hed"]["sha256"] \
            is None
