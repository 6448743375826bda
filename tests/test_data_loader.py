"""Native C++ training data loader vs the Python fallback: decode parity,
shuffle/epoch semantics, resize behavior, and the train-batch adapter."""

import json
import os
import subprocess

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_native():
    lib = os.path.join(REPO, "native", "build", "libsdeo_loader.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=True, capture_output=True)


def _make_dataset(root, n=8, size=64, fmt="PNG"):
    os.makedirs(os.path.join(root, "source"), exist_ok=True)
    os.makedirs(os.path.join(root, "target"), exist_ok=True)
    rng = np.random.default_rng(42)
    ext = "png" if fmt == "PNG" else "jpg"
    with open(os.path.join(root, "prompt.json"), "w") as f:
        for i in range(n):
            for sub in ("source", "target"):
                img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(root, sub, f"{i}.{ext}"), format=fmt)
            f.write(json.dumps({
                "source": f"source/{i}.{ext}",
                "target": f"target/{i}.{ext}",
                "prompt": f"a colored circle {i}",
            }) + "\n")
    return root


class TestImagePairLoader:
    def test_native_matches_python_sequential(self, tmp_path):
        """shuffle=False: both backends deliver identical pixel batches in
        identical order, wrapping epochs."""
        _ensure_native()
        from stablediffusioneo_tpu.training.data import (
            fill50k_loader, native_available,
        )

        assert native_available()
        root = _make_dataset(str(tmp_path), n=6, size=64)
        nat, prompts = fill50k_loader(root, batch=4, resolution=64,
                                      shuffle=False, backend="native")
        py, _ = fill50k_loader(root, batch=4, resolution=64,
                               shuffle=False, backend="python")
        with nat, py:
            for _ in range(4):  # 16 samples > 2 epochs of 6
                a, b = nat.next(), py.next()
                np.testing.assert_array_equal(a["indices"], b["indices"])
                np.testing.assert_array_equal(a["source"], b["source"])
                np.testing.assert_array_equal(a["target"], b["target"])
            assert nat.error_count() == 0
        assert prompts[0] == "a colored circle 0"

    def test_native_resize_matches_cv2(self, tmp_path):
        """48->64 upscale: the C++ half-pixel bilinear tracks
        cv2.INTER_LINEAR to rounding (<=1 LSB)."""
        _ensure_native()
        from stablediffusioneo_tpu.training.data import fill50k_loader

        root = _make_dataset(str(tmp_path), n=2, size=48)
        nat, _ = fill50k_loader(root, batch=2, resolution=64,
                                shuffle=False, backend="native")
        py, _ = fill50k_loader(root, batch=2, resolution=64,
                               shuffle=False, backend="python")
        with nat, py:
            a, b = nat.next(), py.next()
        diff = np.abs(a["source"].astype(np.int16)
                      - b["source"].astype(np.int16))
        assert diff.max() <= 1, f"resize mismatch: max {diff.max()}"

    def test_jpeg_decode(self, tmp_path):
        _ensure_native()
        from stablediffusioneo_tpu.training.data import fill50k_loader

        root = _make_dataset(str(tmp_path), n=2, size=64, fmt="JPEG")
        nat, _ = fill50k_loader(root, batch=2, resolution=64,
                                shuffle=False, backend="native")
        py, _ = fill50k_loader(root, batch=2, resolution=64,
                               shuffle=False, backend="python")
        with nat, py:
            a, b = nat.next(), py.next()
        # both decode the same libjpeg stream; allow tiny IDCT variation
        diff = np.abs(a["target"].astype(np.int16)
                      - b["target"].astype(np.int16))
        assert diff.max() <= 2 and nat.error_count() == 0

    def test_shuffle_covers_every_sample_per_epoch(self, tmp_path):
        _ensure_native()
        from stablediffusioneo_tpu.training.data import fill50k_loader

        root = _make_dataset(str(tmp_path), n=8, size=64)
        nat, _ = fill50k_loader(root, batch=4, resolution=64,
                                shuffle=True, seed=3, backend="native")
        with nat:
            epoch1 = np.concatenate([nat.next()["indices"],
                                     nat.next()["indices"]])
            epoch2 = np.concatenate([nat.next()["indices"],
                                     nat.next()["indices"]])
        assert sorted(epoch1.tolist()) == list(range(8))
        assert sorted(epoch2.tolist()) == list(range(8))
        assert epoch1.tolist() != epoch2.tolist()  # reshuffled (8! >> 1)

    def test_missing_file_zero_fills_and_counts(self, tmp_path):
        _ensure_native()
        from stablediffusioneo_tpu.training.data import ImagePairLoader

        root = _make_dataset(str(tmp_path), n=2, size=64)
        good = os.path.join(root, "source", "0.png")
        loader = ImagePairLoader([good, os.path.join(root, "nope.png")],
                                 [good, good], batch=2, resolution=64,
                                 shuffle=False, backend="native")
        with loader:
            out = loader.next()
            # >=1: the prefetcher has already decoded wrapped epochs of the
            # tiny dataset, hitting the missing file once per epoch
            assert loader.error_count() >= 1
        assert out["source"][1].max() == 0  # zero-filled failed sample
        assert out["source"][0].max() > 0

    @pytest.mark.slow
    def test_end_to_end_training_from_native_loader(self, tmp_path):
        """Full data path: native loader -> tokenizer -> CLIP encode ->
        VAE encode -> two train() steps at tiny scale. Loss is finite and
        ControlNet params move."""
        _ensure_native()
        import jax
        import jax.numpy as jnp

        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime
        from stablediffusioneo_tpu.training.data import (
            controlnet_batches, fill50k_loader,
        )
        from stablediffusioneo_tpu.training.loop import train

        cfg = tiny_pipeline()
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {
            "unet": init_unet(ks[0], cfg.unet),
            "controlnet": init_controlnet(ks[1], cfg.controlnet),
            "vae": init_vae(ks[2], cfg.vae),
            "clip": init_clip_text(ks[3], cfg.clip),
        }
        rt = CNSDRuntime(params, cfg, persistent_cache=False)
        tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                            max_length=cfg.clip.max_length)
        root = _make_dataset(str(tmp_path), n=4, size=64)
        loader, prompts = fill50k_loader(root, batch=2, resolution=64,
                                         shuffle=True, backend="native")

        def enc_image(u8, step):
            img = jnp.asarray(u8, jnp.float32) / 127.5 - 1.0
            return rt.encode_image(img, jax.random.PRNGKey(step))

        data = controlnet_batches(loader, prompts, tok, rt.encode_prompt,
                                  enc_image)
        before = jax.tree.leaves(params["controlnet"])[0].copy()
        state = train(cfg, params["unet"], params["controlnet"], data,
                      num_steps=2, dp=1, tp=1, ema_decay=None,
                      metrics_path=None)
        loader.close()
        after = jax.tree.leaves(state.params)[0]
        assert np.isfinite(np.asarray(after)).all()
        # lr 1e-5 x 2 steps: updates are tiny — assert exact movement
        assert (np.asarray(before) != np.asarray(after)).any()

    def test_controlnet_batch_adapter(self, tmp_path):
        from stablediffusioneo_tpu.training.data import (
            controlnet_batches, fill50k_loader,
        )

        root = _make_dataset(str(tmp_path), n=4, size=64)
        loader, prompts = fill50k_loader(root, batch=2, resolution=64,
                                         shuffle=False, backend="python")
        tok = lambda texts: np.zeros((len(texts), 77), np.int32)
        enc_t = lambda ids: np.zeros((ids.shape[0], 77, 768), np.float32)
        enc_i = lambda u8, step: np.zeros(
            (u8.shape[0], u8.shape[1] // 8, u8.shape[2] // 8, 4), np.float32)
        it = controlnet_batches(loader, prompts, tok, enc_t, enc_i)
        batch = next(it)
        assert batch["x0"].shape == (2, 8, 8, 4)
        assert batch["hint"].shape == (2, 64, 64, 3)
        assert batch["hint"].dtype == np.uint8  # normalized in-graph
        assert batch["ctx"].shape == (2, 77, 768)
        loader.close()
