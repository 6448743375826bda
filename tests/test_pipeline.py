"""Runtime + app-layer tests: engine compilation, bucket reuse, and the
14-arg process() surface (canny2image_TRT.py:51 equivalent)."""

import numpy as np
import pytest

import jax

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import (
    init_clip_text,
    init_controlnet,
    init_unet,
    init_vae,
)
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline
from stablediffusioneo_tpu.runtime.engine import CNSDRuntime, snap_to_bucket

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


def _denonzero(tree, key):
    """Faithful init zeroes several convs (zero_module semantics: UNet out
    conv, ControlNet taps, proj_out). Trained checkpoints are non-zero there,
    so tests perturb every all-zero leaf to get non-degenerate dynamics."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        if bool((l == 0).all())
        else l
        for l, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, out)


@pytest.fixture(scope="module")
def tiny_params():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    return {
        "unet": _denonzero(init_unet(ks[0], CFG.unet), ks[4]),
        "controlnet": _denonzero(init_controlnet(ks[1], CFG.controlnet), ks[5]),
        "vae": init_vae(ks[2], CFG.vae),
        "clip": init_clip_text(ks[3], CFG.clip),
    }


class TestEngine:
    def test_bucket_snap(self):
        assert snap_to_bucket(256) == 256
        assert snap_to_bucket(300) == 320
        assert snap_to_bucket(10000) == 768

    def test_runtime_engines_cached(self, tiny_params):
        rt = CNSDRuntime(tiny_params, CFG, persistent_cache=False)
        e1 = rt.clip_engine(2)
        e2 = rt.clip_engine(2)
        assert e1 is e2
        info = e1.get_engine_infor()
        assert info["compiled"]
        assert info["flops"] is None or info["flops"] > 0

    def test_warmup(self, tiny_params):
        rt = CNSDRuntime(tiny_params, CFG, persistent_cache=False)
        shape = rt.warmup(resolution=64, num_steps=1)
        assert shape == (1, 64, 64, 3)
        kinds = {k[0] for k in rt._engines}
        assert kinds == {"clip", "sampler", "decoder", "sample_decode"}

    def test_sampler_knob_guards(self, tiny_params):
        """Round-4 advisor fixes: knobs that only one sampler family reads
        must fail loudly elsewhere instead of minting duplicate engines."""
        rt = CNSDRuntime(tiny_params, CFG, persistent_cache=False)
        # encoder_cache_interval is threaded only into ddim_sample_scan
        with pytest.raises(ValueError, match="encoder_cache_interval"):
            rt.sampler_engine(2, 1, 64, 64, sampler="euler",
                              encoder_cache_interval=3)
        # PLMS is eta-0-only (upstream PLMSSampler asserts ddim_eta == 0)
        with pytest.raises(ValueError, match="PLMS"):
            rt._sched_device(2, "plms", eta=0.5)
        # eta is normalized out of the schedule-cache key for non-DDIM
        # solvers (they never read it); for DDIM it is a real knob
        a = rt._sched_device(2, "dpmpp", eta=0.0)
        b = rt._sched_device(2, "dpmpp", eta=0.3)
        assert a is b
        n = len(rt._sched_cache)
        rt._sched_device(2, "ddim", eta=0.3)
        assert len(rt._sched_cache) == n + 1

    def test_encode_image(self, tiny_params):
        rt = CNSDRuntime(tiny_params, CFG, persistent_cache=False)
        img = jax.numpy.zeros((1, 64, 64, 3))
        z = rt.encode_image(img, jax.random.PRNGKey(0))
        assert z.shape == (1, 8, 8, 4)


class TestCanny2Image:
    def test_warmup_fails_loud_on_aot_fallback(self, tiny_params, monkeypatch):
        """A real AOT failure at warmup must raise, not silently degrade to
        on-demand jit (VERDICT: deliberate shape bug -> warmup raises)."""
        from stablediffusioneo_tpu.runtime import engine as eng_mod

        rt = CNSDRuntime(tiny_params, CFG, persistent_cache=False)

        def broken_load(self, *a, **k):
            self._compiled = None
            self.load_error = "SimulatedError: deliberate AOT failure"
            return self

        monkeypatch.setattr(eng_mod.Engine, "load", broken_load)
        with pytest.raises(RuntimeError, match="on-demand jit"):
            rt.warmup(64, 1)
        # explicit opt-out keeps the graceful-degrade behavior
        rt2 = CNSDRuntime(tiny_params, CFG, persistent_cache=False)
        rt2.warmup(64, 1, allow_fallback=True)
        assert "on-demand jit" in rt2.report()

    def test_process_surface(self, tiny_params, rng):
        pipe = Canny2ImagePipeline(
            tiny_params, toy_tokenizer(max_length=CFG.clip.max_length), CFG,
            persistent_cache=False,
        )
        img = (rng.random((70, 60, 3)) * 255).astype(np.uint8)
        results = pipe.process(
            img, "a bird", num_samples=1, image_resolution=64,
            ddim_steps=2, seed=42,
        )
        # [detected_map, sample_0]
        assert len(results) == 2
        detected, sample = results
        assert detected.dtype == np.uint8 and detected.shape[2] == 3
        assert sample.dtype == np.uint8
        # resize_image rounds to /64: short side 60->64
        assert sample.shape[0] % 64 == 0 and sample.shape[1] % 64 == 0
        assert pipe.last_timings["total_ms"] > 0

    def test_long_prompt_windowed_and_clip_skip(self, tiny_params, rng):
        """A prompt overflowing one CLIP window must auto-route through the
        3x77-style windowed encoder (hack_everything, cldm/hack.py:32-68:
        tiny config -> 3x16 = ctx_len 48) and still produce an image;
        clip_skip=2 must change the conditioning (hack.py:40-44)."""
        pipe = Canny2ImagePipeline(
            tiny_params, toy_tokenizer(max_length=CFG.clip.max_length), CFG,
            persistent_cache=False,
        )
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        big_prompt = " ".join(f"tokenword{i}" for i in range(40))  # >> 14 body tokens
        kwargs = dict(num_samples=1, image_resolution=64, ddim_steps=1,
                      seed=7, a_prompt="", n_prompt="plain")
        out = pipe.process(img, big_prompt, long_prompt=True, **kwargs)
        assert out[1].dtype == np.uint8
        # the windowed bucket produced a ctx-48 (fused) sampler engine
        assert any(k[0] in ("sampler", "sample_decode")
                   and (3 * CFG.clip.max_length) in k  # ctx_len in the key
                   for k in pipe.runtime._engines)
        # same prompt, explicit short path must also work and differ
        short = pipe.process(img, "a bird", **kwargs)
        assert not np.array_equal(out[1], short[1])
        # clip_skip changes conditioning -> different image, same seed
        skipped = pipe.process(img, "a bird", clip_skip=2, **kwargs)
        assert not np.array_equal(short[1], skipped[1])

    def test_int8_weight_only_quality_gate(self, tiny_params, rng):
        """quantize_linears=True must (a) actually quantize linears,
        (b) stay perceptually close to the bf16/fp32 output — the quality
        gate for the int8 weight-only path (ops/pallas/quant.py)."""
        from stablediffusioneo_tpu.scoring.score import perceptual_distance

        tok = toy_tokenizer(max_length=CFG.clip.max_length)
        base = Canny2ImagePipeline(tiny_params, tok, CFG, persistent_cache=False)
        quant = Canny2ImagePipeline(tiny_params, tok, CFG, persistent_cache=False,
                                    quantize_linears=True)
        # eligible linears were converted (tiny config: min_dim 256 would
        # skip everything, so check via a lowered threshold conversion)
        from stablediffusioneo_tpu.ops.pallas.quant import quantize_linear_tree

        _, n = quantize_linear_tree(tiny_params["unet"], min_dim=32)
        assert n > 0  # the walker finds transformer/time-embed linears
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kwargs = dict(num_samples=1, image_resolution=64, ddim_steps=2, seed=11)
        a = base.process(img, "a bird", **kwargs)[1]
        b = quant.process(img, "a bird", **kwargs)[1]
        assert a.shape == b.shape
        # quality gate: int8 weight-only must stay perceptually close
        assert perceptual_distance(a, b) < 10.0

    def test_quantized_linear_correctness(self, rng):
        """quantized_linear (XLA path) vs exact matmul on a well-scaled
        weight: per-channel int8 keeps <1% relative error."""
        import jax.numpy as jnp

        from stablediffusioneo_tpu.ops.pallas.quant import (
            quantize_linear_tree, quantized_linear,
        )

        w = rng.standard_normal((256, 512), dtype=np.float32) * 0.05
        b = rng.standard_normal(512, dtype=np.float32) * 0.01
        tree, n = quantize_linear_tree({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        assert n == 1 and "w_q" in tree and tree["w_q"].dtype == np.int8
        x = rng.standard_normal((4, 7, 256), dtype=np.float32)
        exact = x @ w + b
        q = np.asarray(quantized_linear(jnp.asarray(x), tree))
        rel = np.abs(q - exact) / (np.abs(exact) + 1e-3)
        assert np.median(rel) < 0.01

    def test_seed_determinism_and_guess_mode(self, tiny_params, rng):
        pipe = Canny2ImagePipeline(
            tiny_params, toy_tokenizer(max_length=CFG.clip.max_length), CFG,
            persistent_cache=False,
        )
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kwargs = dict(num_samples=1, image_resolution=64, ddim_steps=1, seed=7)
        a = pipe.process(img, "a bird", **kwargs)[1]
        b = pipe.process(img, "a bird", **kwargs)[1]
        np.testing.assert_array_equal(a, b)
        c = pipe.process(img, "a bird", guess_mode=True, **kwargs)[1]
        assert not np.array_equal(a, c)


class TestPackedHint:
    """Bit-packed binary hint upload (1 bit/pixel for canny's {0,255} maps —
    24x less host->device transfer; engine unpacks in-graph)."""

    def test_pack_hint_detection(self, rng):
        pack = Canny2ImagePipeline._pack_hint
        det = np.zeros((64, 64, 3), np.uint8)
        binary = (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255
        p = pack(det, binary)
        assert p is not None and p.shape == (64, 8)
        np.testing.assert_array_equal(np.unpackbits(p, axis=-1) * 255, binary)
        # grayscale (non-binary) map: plain uint8 path
        gray = (rng.random((64, 64)) * 255).astype(np.uint8)
        gray[0, 0] = 7
        assert pack(det, gray) is None
        # RGB raw output (pose/seg maps): plain uint8 path
        assert pack(det, np.zeros((64, 64, 3), np.uint8)) is None
        # non-/8 width: plain path
        assert pack(np.zeros((60, 60, 3), np.uint8),
                    np.zeros((60, 60), np.uint8)) is None

    def test_packed_engine_matches_u8_engine(self, tiny_params, rng):
        """The packed-ingest engine variant must be BIT-identical to the
        uint8 variant on binary hints (unpack -> {0.,1.} == {0,255}/255)."""
        import jax.numpy as jnp

        rt = CNSDRuntime(tiny_params, CFG, persistent_cache=False)
        b, res = 1, 64
        binary = (rng.random((res, res)) > 0.5).astype(np.uint8) * 255
        hint_u8 = np.repeat(
            np.repeat(binary[..., None], 3, axis=-1)[None], b, axis=0)
        hint_packed = np.repeat(np.packbits(binary > 0, axis=-1)[None],
                                b, axis=0)
        f = CFG.vae.downsample_factor
        x_T = rng.standard_normal((b, res // f, res // f, 4)).astype(np.float32)
        ctx = rng.standard_normal(
            (b, CFG.clip.max_length, CFG.unet.context_dim)).astype(np.float32)
        key = jax.random.PRNGKey(3)
        img_u8 = np.asarray(rt.sample_decode(
            2, jnp.asarray(x_T), jnp.asarray(hint_u8),
            jnp.asarray(ctx), jnp.asarray(ctx), key))
        img_packed = np.asarray(rt.sample_decode(
            2, jnp.asarray(x_T), jnp.asarray(hint_packed),
            jnp.asarray(ctx), jnp.asarray(ctx), key))
        np.testing.assert_array_equal(img_u8, img_packed)

    def test_process_uses_packed_hint_for_canny(self, tiny_params, rng,
                                                monkeypatch):
        """process() must route canny (binary) hints through the packed
        engine variant and produce identical images either way."""
        pipe = Canny2ImagePipeline(
            tiny_params, toy_tokenizer(max_length=CFG.clip.max_length), CFG,
            persistent_cache=False,
        )
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kwargs = dict(num_samples=1, image_resolution=64, ddim_steps=1, seed=7)
        out_packed = pipe.process(img, "a bird", **kwargs)[1]
        assert any("_bithint" in k.name for k in pipe.runtime._engines.values())
        # force the plain path: make the binary check fail
        monkeypatch.setattr(Canny2ImagePipeline, "_pack_hint",
                            staticmethod(lambda det, raw: None))
        out_plain = pipe.process(img, "a bird", **kwargs)[1]
        np.testing.assert_array_equal(out_packed, out_plain)


class TestMultiAnnotator:
    def test_hed_conditioning(self, tiny_params, rng, monkeypatch):
        """Pluggable annotator (BASELINE tracked config 4): HED hint."""
        import stablediffusioneo_tpu.annotators.hed as hed_mod
        from stablediffusioneo_tpu.annotators.hed import HEDdetector
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

        monkeypatch.setattr(
            hed_mod, "_BLOCKS",
            [(3, 8, 2), (8, 16, 2), (16, 32, 3), (32, 64, 3), (64, 64, 3)],
        )
        pipe = Canny2ImagePipeline(
            tiny_params, toy_tokenizer(max_length=CFG.clip.max_length), CFG,
            persistent_cache=False, annotator=HEDdetector(),
        )
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        out = pipe.process(img, "a bird", num_samples=1, image_resolution=64,
                           ddim_steps=1, seed=1)
        assert out[0].shape == (64, 64, 3)  # HED map HWC3-normalized
        assert out[1].dtype == np.uint8


class TestHackathonShim:
    def test_reference_surface(self, tiny_params, rng):
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.hackathon import hackathon

        hk = hackathon(tiny_params, toy_tokenizer(max_length=CFG.clip.max_length), CFG)
        hk.initialize()
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        # the reference's exact 14-positional-arg call (compute_score.py:48-61)
        out = hk.process(img, "a bird", "best quality, extremely detailed",
                         "longbody, lowres", 1, 64, 1, False, 1.0, 9.0,
                         2946901, 0.0, 100, 200)
        assert len(out) == 1
        assert out[0].dtype == np.uint8 and out[0].shape == (64, 64, 3)


class TestPipelineSnapshot:
    def test_save_load_roundtrip(self, tiny_params, tmp_path):
        import jax

        from stablediffusioneo_tpu.checkpoint.store import load_pipeline, save_pipeline

        path = str(tmp_path / "snap")
        save_pipeline(path, tiny_params)
        like = jax.tree.map(np.asarray, tiny_params)
        restored = load_pipeline(path, like)
        for a, b in zip(jax.tree.leaves(tiny_params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
