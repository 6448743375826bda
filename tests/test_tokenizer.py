"""Tokenizer parity vs HF transformers CLIPTokenizer built from the same
vocab files (offline golden — no hub download)."""

import json
import os

import numpy as np
import pytest

from stablediffusioneo_tpu.models.tokenizer import (
    CLIPTokenizer,
    bytes_to_unicode,
    toy_tokenizer,
)


def _write_vocab(tmp_path, merges):
    """Build a small but realistic vocab: bytes, bytes</w>, merge results."""
    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for m in merges:
        vocab.append("".join(m))
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    encoder = {tok: i for i, tok in enumerate(vocab)}
    vj = os.path.join(tmp_path, "vocab.json")
    mt = os.path.join(tmp_path, "merges.txt")
    with open(vj, "w", encoding="utf-8") as f:
        json.dump(encoder, f, ensure_ascii=False)
    with open(mt, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return vj, mt


MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "n"),
    ("an", "d</w>"),
    ("i", "n"),
    ("b", "i"),
    ("bi", "r"),
    ("bir", "d</w>"),
    ("o", "n</w>"),
    ("r", "e"),
]


class TestTokenizer:
    def test_vs_hf(self, tmp_path):
        from transformers import CLIPTokenizer as HFTok

        vj, mt = _write_vocab(str(tmp_path), MERGES)
        hf = HFTok(vocab_file=vj, merges_file=mt, model_max_length=77)
        mine = CLIPTokenizer.from_hf_files(vj, mt, max_length=77)
        prompts = [
            "a bird",
            "the bird on the branch, masterpiece",
            "",
            "best quality, extremely detailed!",
            "UPPER Case MiXeD",
        ]
        for p in prompts:
            ref = hf(
                p, truncation=True, max_length=77, padding="max_length"
            )["input_ids"]
            out = mine([p])[0]
            assert out.tolist() == ref, f"prompt {p!r}: {out.tolist()[:8]} vs {ref[:8]}"

    def test_roundtrip(self):
        tok = toy_tokenizer()
        ids = tok.encode("the bird and the cat")
        assert tok.decode(ids) == "the bird and the cat"

    def test_padding_and_truncation(self):
        tok = toy_tokenizer(max_length=8)
        batch = tok(["x", "a much longer prompt that truncates badly"])
        assert batch.shape == (2, 8)
        assert batch[0, 0] == tok.sot
        assert batch[0, 2] == tok.eot  # 'x' is one token
        assert (batch[0, 3:] == tok.eot).all()  # EOT padding
        assert batch[1, -1] == tok.eot  # truncated row still ends with EOT
