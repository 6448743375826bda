"""canny2image application pipeline — the `hackathon` class equivalent.

Re-design of the reference's app layer (canny2image_TRT.py:18-92 /
canny2image_torch.py:18-71): `initialize()` builds the runtime and warms it
up; `process(...)` keeps the reference's 14-parameter surface:

  (input_image, prompt, a_prompt, n_prompt, num_samples, image_resolution,
   ddim_steps, guess_mode, strength, scale, seed, eta,
   low_threshold, high_threshold)

Differences by design:
  - the detected map goes to the ControlNet as NHWC [0,1] floats;
  - cond & uncond CLIP contexts are encoded in ONE batched CLIP call
    (the reference runs get_learned_conditioning twice);
  - the whole denoise loop runs as one compiled program per
    (steps, batch, resolution-bucket, guess_mode) — see runtime/engine.py;
  - x_T seeding uses JAX PRNG by default (distributional parity with
    torch.randn); for bit-exact cross-framework comparison pass `x_T`
    explicitly (SURVEY §7 "seeded parity").
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.annotators.canny import CannyDetector
from stablediffusioneo_tpu.annotators.util import HWC3, resize_image
from stablediffusioneo_tpu.config import PipelineConfig, sd15_pipeline
from stablediffusioneo_tpu.models.tokenizer import CLIPTokenizer
from stablediffusioneo_tpu.runtime.engine import CNSDRuntime


class Canny2ImagePipeline:
    """The de-facto public API of the reference (`hackathon`).

    `annotator` is pluggable: any callable mapping a resized uint8 HWC image
    (plus the two threshold args, ignored by most annotators) to a hint map
    — canny (default), HEDdetector, MidasDetector-depth, OpenposeDetector
    canvas, etc. This generalizes the pipeline to all hint2image tasks the
    upstream ControlNet family supports with per-task checkpoints.
    """

    def __init__(
        self,
        params: Dict[str, Dict],
        tokenizer: CLIPTokenizer,
        cfg: Optional[PipelineConfig] = None,
        persistent_cache: bool = True,
        annotator=None,
        quantize_linears: bool = False,
        mesh=None,
    ):
        self.cfg = cfg or sd15_pipeline()
        self.tokenizer = tokenizer
        # multi-ControlNet: params["controlnet"] a tuple of N trees pairs
        # with a list of N annotators (one hint source per net)
        if isinstance(params.get("controlnet"), (tuple, list)):
            n = len(params["controlnet"])
            params = {**params, "controlnet": tuple(params["controlnet"])}
            anns = annotator if isinstance(annotator, (list, tuple)) else (
                [annotator] if annotator else [])
            anns = list(anns) + [CannyDetector()] * (n - len(anns))
            self.annotators = anns[:n]
            self.apply_canny = self.annotators[0]
        else:
            self.annotators = None
            self.apply_canny = annotator or CannyDetector()
        self.runtime = CNSDRuntime(params, self.cfg,
                                   persistent_cache=persistent_cache,
                                   quantize_linears=quantize_linears,
                                   mesh=mesh)
        self.last_timings: Dict[str, float] = {}
        self.last_detected_maps: List[np.ndarray] = []

    # -------------------------------------------------------------- bring-up

    def initialize(self, warmup_resolution: int = 256, warmup_steps: int = 1):
        """Compile+run every engine once (hackathon.initialize + warm_up,
        canny2image_TRT.py:20-50)."""
        self.runtime.warmup(warmup_resolution, warmup_steps)
        return self

    def _annotate(self, img: np.ndarray, low: int, high: int,
                  annotator=None):
        """Run the pluggable annotator; returns (HWC3 uint8 map, raw output).
        Canny consumes the thresholds, other detectors take just the image;
        multi-output detectors (e.g. MiDaS depth+normal) use the first."""
        ann = annotator if annotator is not None else self.apply_canny
        try:
            out = ann(img, low, high)
        except TypeError:
            out = ann(img)
        if isinstance(out, tuple):
            out = out[0]
        out = np.asarray(out)
        return HWC3(out), out

    @staticmethod
    def _pack_hint(detected_map: np.ndarray, raw: np.ndarray):
        """Bit-pack a binary single-channel control map for upload.

        Canny maps are {0, 255} grayscale: 1 bit/pixel instead of 24 is
        lossless and cuts the per-call host->device hint transfer 24x
        (~786 KB -> 98 KB at 512^2 — ~24 ms on the tunneled link). The
        engine's packed-ingest variant unpacks to the exact {0., 1.}
        values `detected / 255.0` would produce. Returns the packed
        (H, W//8) array, or None when the map isn't binary gray (HED /
        depth / pose maps take the plain uint8 path)."""
        if raw.ndim != 2 or raw.dtype != np.uint8:
            return None
        if detected_map.shape[1] % 8:
            return None
        if not ((raw == 0) | (raw == 255)).all():
            return None
        return np.packbits(raw > 0, axis=-1)  # big-endian bit order

    # ---------------------------------------------------------------- process

    def process(
        self,
        input_image: np.ndarray,
        prompt: str,
        a_prompt: str = "best quality, extremely detailed",
        n_prompt: str = "longbody, lowres, bad anatomy, bad hands, missing fingers, extra digit, fewer digits, cropped, worst quality, low quality",
        num_samples: int = 1,
        image_resolution: int = 256,
        ddim_steps: int = 20,
        guess_mode: bool = False,
        strength: float = 1.0,
        scale: float = 9.0,
        seed: int = -1,
        eta: float = 0.0,
        low_threshold: int = 100,
        high_threshold: int = 200,
        x_T: Optional[np.ndarray] = None,
        sampler: str = "ddim",
        encoder_cache_interval: int = 1,
        clip_skip: int = 0,
        long_prompt=False,  # False | True (3x77) | "auto" (minimal windows)
        granular_timings: bool = False,
        inpaint_image: Optional[np.ndarray] = None,
        inpaint_mask: Optional[np.ndarray] = None,
        init_image: Optional[np.ndarray] = None,
        denoise_strength: float = 0.75,
        prompt_emphasis: bool = False,
        hires_upscale: float = 0.0,
        hires_denoise: float = 0.7,
        cfg_rescale: float = 0.0,
        tome_ratio: float = 0.0,
    ) -> List[np.ndarray]:
        """Returns [detected_map] + generated uint8 HWC images
        (canny2image gradio convention).

        inpaint_image + inpaint_mask (uint8 HxW or HxWx1; nonzero = region
        to REGENERATE) enable blended-latent inpainting (beyond the
        reference): the kept region is VAE-encoded and re-imposed at every
        DDIM step's noise level (pipeline/ddim.py). DDIM sampler only.

        init_image + denoise_strength enable img2img (DDIMSampler.encode/
        decode semantics, ddim_hacked.py:233-317): the source is
        VAE-encoded (posterior mode), re-noised in-graph to step
        round(denoise_strength * ddim_steps) of the schedule, and only the
        remaining steps run. DDIM sampler only.

        clip_skip: k>1 takes the -(k)th CLIP hidden state through the final
        LayerNorm (cldm/hack.py:40-44). long_prompt=True routes the prompt
        through the 3x77 windowed encoder (hack_everything, hack.py:32-68)
        instead of truncating — opt-in, exactly like the reference activates
        the hack explicitly (share.py import side effect); the default stays
        truncation so outputs match the un-hacked reference bit-for-bit.

        sampler: "ddim" (reference parity), "plms" (the upstream ldm
        PLMSSampler equivalent, eta-0 only), "dpmpp"/"dpmpp-karras"
        (DPM-Solver++(2M)), "unipc"/"unipc-karras" (order-2 bh2
        predictor-corrector), or the k-diffusion family "euler"/
        "euler-a"/"heun" (Karras rho-7 sigma spacing by default;
        "-uniform" suffix selects the trained-grid spacing). Spacing
        variants share one compiled engine program (schedules ride as
        engine inputs). eta applies to DDIM only; euler-a carries its own
        ancestral noise (per-request reproducible through the serving
        seeds path)."""
        t_start = time.perf_counter()

        img = resize_image(HWC3(input_image), image_resolution)
        H, W = img.shape[:2]

        if self.annotators is not None:
            # multi-ControlNet: one hint per net, per-net annotators; hints
            # ride as a float tuple (the u8/packed ingest optimizations
            # stay single-net)
            pairs = [self._annotate(img, low_threshold, high_threshold, a)
                     for a in self.annotators]
            self.last_detected_maps = [m for m, _ in pairs]
            detected_map = pairs[0][0]
            hint = tuple(
                np.repeat((m.astype(np.float32) / 255.0)[None],
                          num_samples, axis=0)
                for m, _ in pairs)
        else:
            detected_map, raw_map = self._annotate(
                img, low_threshold, high_threshold)
            self.last_detected_maps = [detected_map]

            # uint8 hint: normalized in-graph by the engine's uint8-ingest
            # variant (bit-identical to `detected / 255.0` here, 4x less
            # host->device transfer). Binary gray maps (canny) go further:
            # bit-packed to (B, H, W//8) and unpacked in-graph (24x less).
            packed = self._pack_hint(detected_map, raw_map)
            if packed is not None:
                hint = np.repeat(packed[None], num_samples, axis=0)
            else:
                hint = np.repeat(detected_map[None], num_samples, axis=0)

        if seed == -1:
            seed = int(np.random.randint(0, 2**31 - 1))
        key = jax.random.PRNGKey(seed)

        t_pre = time.perf_counter()

        # batched cond+uncond CLIP encode
        cond_text = prompt + ", " + a_prompt if a_prompt else prompt
        if prompt_emphasis:
            # A1111-style "(word:1.3)" emphasis (beyond the reference):
            # per-token weights scale the hidden states, row mean restored
            if long_prompt:
                raise ValueError("prompt_emphasis + long_prompt is "
                                 "unsupported (pick one encoder path)")
            from stablediffusioneo_tpu.models.text_encoding import (
                apply_emphasis, tokenize_weighted,
            )

            ids, weights = tokenize_weighted(
                self.tokenizer, [cond_text, n_prompt])
            ctx = apply_emphasis(
                self.runtime.encode_prompt(ids, clip_skip=clip_skip),
                weights)
        elif long_prompt:
            # True: fixed 3x77 (exact hack_everything parity). "auto":
            # minimal window count — 78-127-token prompts use ctx 154
            ctx = self.runtime.encode_prompt_windowed(
                self.tokenizer, [cond_text, n_prompt], clip_skip=clip_skip,
                windows="auto" if long_prompt == "auto" else 3)
        else:
            ids = self.tokenizer([cond_text, n_prompt])
            ctx = self.runtime.encode_prompt(ids, clip_skip=clip_skip)
        ctx_cond = jnp.repeat(ctx[0:1], num_samples, axis=0)
        ctx_uncond = jnp.repeat(ctx[1:2], num_samples, axis=0)

        t_clip = time.perf_counter()

        f = self.cfg.vae.downsample_factor
        lat_shape = (num_samples, H // f, W // f, 4)
        if x_T is None:
            if granular_timings:
                # diagnostic path needs a concrete latent for phase timing
                key, sub = jax.random.split(key)
                x_T_arr = jax.random.normal(sub, lat_shape, jnp.float32)
            else:
                # production: the engine derives key/sub and draws x_T
                # in-graph from the root key (same bits, no host dispatch)
                x_T_arr = None
        else:
            x_T_arr = jnp.asarray(x_T)

        # a tuple hint (multi-ControlNet) must stay a tuple of
        # per-net arrays; jnp.asarray would merge it into one
        hint_dev = (tuple(jnp.asarray(hh) for hh in hint)
                    if isinstance(hint, tuple) else
                    jnp.asarray(hint))
        run_kwargs = dict(
            guidance_scale=scale,
            strength=strength,
            eta=eta,
            guess_mode=guess_mode,
            sampler=sampler,
            encoder_cache_interval=encoder_cache_interval,
            cfg_rescale=cfg_rescale,
            tome_ratio=tome_ratio,
        )
        if inpaint_image is not None:
            if inpaint_mask is None:
                raise ValueError("inpaint_image requires inpaint_mask")
            if granular_timings:
                raise ValueError("inpainting is unsupported on the "
                                 "granular-timings diagnostic path")
            from stablediffusioneo_tpu.pipeline.inpaint import prepare_inpaint

            src_f, m = prepare_inpaint(inpaint_image, inpaint_mask, H, W, f)
            # posterior MODE (deterministic): the kept region is a pure
            # function of the source image, and the serving path (batched
            # deterministic encode) matches process() to batch-fusion
            # tolerance (1 uint8 LSB; asserted in tests/test_serving.py)
            lat = self.runtime.encode_image(
                jnp.asarray(np.repeat(src_f[None], num_samples, axis=0)),
                deterministic=True)
            run_kwargs["inpaint_latent"] = lat
            run_kwargs["inpaint_mask"] = jnp.asarray(
                np.repeat(m[None], num_samples, axis=0))
        if init_image is not None:
            if granular_timings:
                raise ValueError("img2img is unsupported on the "
                                 "granular-timings diagnostic path")
            if x_T is not None:
                raise ValueError("init_image and x_T are mutually exclusive")
            import cv2

            src = cv2.resize(HWC3(init_image), (W, H),
                             interpolation=cv2.INTER_AREA)
            src_f = (src.astype(np.float32) / 127.5 - 1.0)[None]
            run_kwargs["init_latent"] = self.runtime.encode_image(
                jnp.asarray(np.repeat(src_f, num_samples, axis=0)),
                deterministic=True)
            run_kwargs["t_enc"] = max(
                1, min(ddim_steps, int(round(denoise_strength * ddim_steps))))
            x_T_arr = None
        from stablediffusioneo_tpu.runtime.profiling import _hard_sync

        if granular_timings:
            # diagnostic path: hard device sync between sample and decode so
            # the phase split is honest (block_until_ready can return early
            # on tunneled backends) — costs two extra host<->device RTTs
            samples = self.runtime.sample(
                ddim_steps, x_T_arr, hint_dev, ctx_cond, ctx_uncond,
                key, **run_kwargs)
            _hard_sync(samples)
            t_sample = time.perf_counter()
            images_dev = self.runtime.decode_latent_device(samples)
            _hard_sync(images_dev)
            t_decode = time.perf_counter()
            images = np.asarray(images_dev)  # device->host (B,H,W,3) uint8
            t_fetch = time.perf_counter()
            self.last_timings = {
                "preprocess_ms": (t_pre - t_start) * 1e3,
                "clip_ms": (t_clip - t_pre) * 1e3,
                "sample_ms": (t_sample - t_clip) * 1e3,
                "decode_ms": (t_decode - t_sample) * 1e3,
                "fetch_ms": (t_fetch - t_decode) * 1e3,
                "total_ms": (t_fetch - t_start) * 1e3,
            }
        elif hires_upscale and hires_upscale > 1.0:
            # hires fix (beyond the reference; the A1111 two-pass recipe):
            # base pass at image_resolution -> bilinear latent upscale ->
            # img2img refinement at the high resolution with a FRESH
            # annotation of the input (sharper than upscaling the hint).
            # Both passes reuse the ordinary resolution-bucket engines.
            if run_kwargs.get("init_latent") is not None or \
                    run_kwargs.get("inpaint_latent") is not None:
                raise ValueError("hires_upscale composes with plain "
                                 "txt2img only (no img2img/inpaint)")
            if self.annotators is not None:
                raise ValueError("hires_upscale + multi-ControlNet is "
                                 "unsupported")
            key, kb = jax.random.split(key)
            if x_T_arr is None:
                kb, sub = jax.random.split(kb)
                x_T_arr = jax.random.normal(
                    sub, (num_samples, H // f, W // f, 4), jnp.float32)
            z = self.runtime.sample(ddim_steps, x_T_arr, hint_dev,
                                    ctx_cond, ctx_uncond, kb, **run_kwargs)
            H2 = int(round(H * hires_upscale / 64)) * 64
            W2 = int(round(W * hires_upscale / 64)) * 64
            z_up = jax.image.resize(
                z.astype(jnp.float32),
                (num_samples, H2 // f, W2 // f, 4), "bilinear")
            import cv2

            img_hi = cv2.resize(HWC3(input_image), (W2, H2),
                                interpolation=cv2.INTER_LANCZOS4)
            det_hi, raw_hi = self._annotate(
                img_hi, low_threshold, high_threshold)
            packed_hi = self._pack_hint(det_hi, raw_hi)
            hint_hi = np.repeat(
                (packed_hi if packed_hi is not None else det_hi)[None],
                num_samples, axis=0)
            t_enc = max(1, min(ddim_steps,
                               int(round(hires_denoise * ddim_steps))))
            images_dev = self.runtime.sample_decode(
                ddim_steps, None, jnp.asarray(hint_hi), ctx_cond, ctx_uncond,
                key, init_latent=z_up, t_enc=t_enc, **run_kwargs)
            images = np.asarray(images_dev)
            t_fetch = time.perf_counter()
            self.last_timings = {
                "preprocess_ms": (t_pre - t_start) * 1e3,
                "clip_ms": (t_clip - t_pre) * 1e3,
                "sample_decode_fetch_ms": (t_fetch - t_clip) * 1e3,
                "total_ms": (t_fetch - t_start) * 1e3,
            }
            detected_map = det_hi  # report the hint that shaped the output
        else:
            # production path: the whole latent->pixels pipeline is ONE
            # compiled program + one fetch (no host in the loop)
            images_dev = self.runtime.sample_decode(
                ddim_steps, x_T_arr, hint_dev, ctx_cond, ctx_uncond,
                key, **run_kwargs)
            # no intermediate sync: np.asarray blocks until done AND fetches
            # in one round-trip (a hard_sync here would cost one extra RTT)
            images = np.asarray(images_dev)
            t_fetch = time.perf_counter()
            self.last_timings = {
                "preprocess_ms": (t_pre - t_start) * 1e3,
                "clip_ms": (t_clip - t_pre) * 1e3,
                "sample_decode_fetch_ms": (t_fetch - t_clip) * 1e3,
                "total_ms": (t_fetch - t_start) * 1e3,
            }
        return [detected_map] + [images[i] for i in range(num_samples)]
