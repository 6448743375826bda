"""DiffusionServer — cross-request batching over compiled engine buckets.

The reference's app layer serves exactly one request per `process()` call
(canny2image_TRT.py:51-92). A TPU deployment leaves most of the MXU idle
at batch 1; this server gathers concurrent requests into batched engine
calls:

  submit(GenRequest) -> Future          (any thread)
       | host preprocess on the caller thread (annotate, tokenize)
       v
  per-compatibility-group queues        (same resolution bucket / steps /
       |                                 sampler / guess-mode / ctx shape
       v                                 = same compiled engine signature)
  dispatcher thread: native batch-cut policy (serving/scheduler.py,
       |             native/scheduler.cpp) decides when to cut and how big
       v
  ONE batched CLIP encode + ONE batched sample_decode engine call,
  per-request prompts / seeds / guidance scales / control strengths
  riding the batch dimension (runtime/engine.py per-sample scales)
       |
       v
  futures resolve with (detected_map, image) per request

While the TPU runs one batch the queues keep accumulating — continuous
batching. Different `scale`/`strength`/`seed`/prompts batch together;
`eta > 0` requests only batch with identical eta (the stochastic-noise
schedule is an engine constant). Each request's x_T and in-loop noise
derive from its own seed in-graph (engine gen_xT="seeds"), so outputs are
per-request reproducible regardless of batch composition — including
eta > 0.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from stablediffusioneo_tpu.serving.scheduler import (
    decide_cut,
    next_deadline_ms,
    pick_group,
)


def _resolve(fut: Future, result=None, exc=None) -> bool:
    """Resolve a request future, tolerating a concurrent cancel().

    An HTTP-timeout `cancel()` can land between a `done()` check and the
    set — set_result/set_exception then raise InvalidStateError, and (when
    raised inside the batch completion loop) would spuriously fail every
    co-batched request. Cancellation simply wins instead."""
    try:
        if fut.done():
            return False
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
        return True
    except InvalidStateError:
        return False


@dataclass
class GenRequest:
    """One generation request — the per-call knobs of `process()`
    (canny2image_TRT.py:51, minus num_samples: one request = one image;
    submit several requests for several samples)."""

    image: np.ndarray
    prompt: str
    a_prompt: str = "best quality, extremely detailed"
    n_prompt: str = ("longbody, lowres, bad anatomy, bad hands, "
                     "missing fingers, extra digit, fewer digits, cropped, "
                     "worst quality, low quality")
    image_resolution: int = 256
    ddim_steps: int = 20
    guess_mode: bool = False
    strength: float = 1.0
    scale: float = 9.0
    seed: int = -1
    eta: float = 0.0
    low_threshold: int = 100
    high_threshold: int = 200
    sampler: str = "ddim"
    encoder_cache_interval: int = 1
    clip_skip: int = 0
    # blended-latent inpainting (pipeline/ddim.py): source image + mask
    # (nonzero = region to REGENERATE). The source is VAE-encoded with the
    # posterior MODE (no batch-position-dependent noise); outputs match the
    # single-request process() path to batch-fusion tolerance (1 uint8 LSB
    # on a small pixel tail — XLA reduction order varies with batch size).
    inpaint_image: Optional[np.ndarray] = None
    inpaint_mask: Optional[np.ndarray] = None
    # img2img (process(init_image=, denoise_strength=)): same deterministic
    # encode; requests batch only with matching t_enc (engine depth)
    init_image: Optional[np.ndarray] = None
    denoise_strength: float = 0.75
    # A1111-style "(word:1.3)" emphasis (models/text_encoding.py)
    prompt_emphasis: bool = False
    # long prompts: False = truncate at 77 (reference parity), True = the
    # fixed 3x77 windowed encoder, "auto" = minimal windows for the pair
    # (models/text_encoding.py). Requests batch per window count.
    long_prompt: Union[bool, str] = False
    # guidance rescale (arXiv:2305.08891; 0 = off). Static per engine, so
    # requests batch per value (distinct values are rare: 0 or ~0.7).
    cfg_rescale: float = 0.0
    # ToMe token-merge ratio (arXiv:2303.17604, ops/tome.py; 0 = off).
    # Static per engine variant, so requests batch per value.
    tome_ratio: float = 0.0


@dataclass
class _Pending:
    req: GenRequest
    future: Future
    t_submit: float
    detected_map: np.ndarray = None
    hint: np.ndarray = None            # (H, W, 3) uint8 (in-graph /255) or
                                       # (H, W//8) bit-packed binary
    ids: np.ndarray = None             # (2, 77) cond/uncond token ids
    hw: Tuple[int, int] = (0, 0)
    seed: int = 0                      # resolved per submission (-1 drawn)
    inpaint_src: np.ndarray = None     # (H, W, 3) f32 in [-1, 1]
    inpaint_mask: np.ndarray = None    # (h, w, 1) f32 latent-res, 1=generate
    init_src: np.ndarray = None        # (H, W, 3) f32 in [-1, 1] (img2img)
    t_enc: int = 0                     # img2img entry step (0 = off)
    weights: np.ndarray = None         # (2, 77) emphasis weights (or None)


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    rows: int = 0
    errors: int = 0
    queue_ms_sum: float = 0.0
    run_ms_sum: float = 0.0
    batch_hist: Dict[int, int] = field(default_factory=dict)
    # engine-health record (warmup census): {engine_name: load_error}.
    # NOT cleared by reset() — it reflects compiled-program state, not
    # request traffic.
    aot_fallbacks: Dict[str, str] = field(default_factory=dict)

    def snapshot(self) -> Dict:
        b = max(self.batches, 1)
        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_batch": self.rows / b,
            "mean_queue_ms": self.queue_ms_sum / max(self.rows, 1),
            "mean_batch_run_ms": self.run_ms_sum / b,
            "errors": self.errors,
            "batch_hist": dict(self.batch_hist),
            "aot_fallbacks": dict(self.aot_fallbacks),
        }

    def reset(self):
        self.requests = self.batches = self.rows = self.errors = 0
        self.queue_ms_sum = self.run_ms_sum = 0.0
        self.batch_hist = {}


class DiffusionServer:
    """Batched serving front-end over a Canny2ImagePipeline.

    pipeline: an initialized Canny2ImagePipeline (owns runtime, tokenizer,
    annotator). batch_buckets: the engine batch sizes to compile/serve
    (each size is one compiled program, like the reference's batch-2 engine
    variants, onnx2trt_static_plugin.py:160-171). max_wait_ms: batching
    window — the extra latency a lone request can pay waiting for company.
    """

    def __init__(
        self,
        pipeline,
        batch_buckets: Tuple[int, ...] = (1, 2, 4),
        max_wait_ms: float = 25.0,
        max_inflight_batches: int = 2,
        preprocess_workers: int = 4,
        max_steps: int = 200,
        max_resolution: int = 1024,
    ):
        self.pipe = pipeline
        # ddim_steps is the scan LENGTH of the compiled sampler — every
        # distinct value is a new multi-second engine compile, and
        # image_resolution picks the shape bucket (arbitrarily large
        # values compile arbitrarily large programs). Bound both at the
        # serving boundary so a client sweeping them cannot mint
        # unbounded compilations (same policy as the cfg_rescale /
        # tome_ratio grid in submit()).
        self.max_steps = int(max_steps)
        self.max_resolution = int(max_resolution)
        self.buckets = tuple(sorted(batch_buckets))
        if self.buckets[0] != 1:
            # without a batch-1 engine a lone request could never dispatch
            raise ValueError("batch_buckets must include 1")
        self.max_batch = self.buckets[-1]
        self.max_wait_ms = float(max_wait_ms)
        # dispatch depth: 1 = cut only when the device is idle; 2 (default)
        # = keep one batch queued behind the running one (hides the
        # dispatch+fetch gap) while still letting the queue grow into full
        # buckets during the ~seconds-long engine runs. Unbounded depth
        # would race ahead of arrivals and fragment the queue into
        # small early batches.
        self.max_inflight_batches = int(max_inflight_batches)
        self._groups: Dict[Tuple, List[_Pending]] = {}
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._stop = False
        self._thread: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        self._done_q: "queue.Queue" = queue.Queue()
        self._inflight: List[Future] = []
        self._inflight_batches = 0
        # worker pool for submit_async: host preprocess (annotate + pack +
        # tokenize, ~13 ms/req) runs here so even a SINGLE-threaded client
        # overlaps annotation of request N+1 with device compute of batch
        # N. Parallel clients get the same overlap for free through
        # submit() (preprocess runs on each caller's thread).
        self._pre_pool = None
        self._preprocess_workers = int(preprocess_workers)
        self.stats = ServerStats()

    # ---------------------------------------------------------------- control

    def start(self) -> "DiffusionServer":
        if self._thread is not None:
            return self
        self._stop = False
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        name="sdeo-dispatch", daemon=True)
        self._completer = threading.Thread(target=self._complete_loop,
                                           name="sdeo-complete", daemon=True)
        self._thread.start()
        self._completer.start()
        return self

    def stop(self, drain: bool = True):
        """Stop the dispatcher. drain=True serves queued requests first."""
        if self._thread is None:
            return
        if drain:
            self.drain()
        with self._wake:
            self._stop = True
            self._wake.notify_all()
        self._thread.join()
        self._thread = None
        self._done_q.put(None)  # completer drains in-flight batches first
        self._completer.join()
        self._completer = None
        if self._pre_pool is not None:
            self._pre_pool.shutdown(wait=True)
            self._pre_pool = None

    def drain(self, timeout: float = 300.0):
        """Block until every queued request has been dispatched+resolved."""
        from concurrent.futures import wait as futures_wait

        deadline = time.perf_counter() + timeout
        futures = []
        while time.perf_counter() < deadline:
            with self._lock:
                futures = [p.future for q in self._groups.values() for p in q]
                futures += [f for f in self._inflight if not f.done()]
            if not futures:
                return
            # wait WITHOUT re-raising: a failed request's stored exception
            # belongs to its submitter, not to whoever drains the server
            futures_wait(futures,
                         timeout=max(0.0, deadline - time.perf_counter()))
        raise TimeoutError("serving queue did not drain")

    def warmup(self, resolutions=(256,), steps=20, sampler="ddim",
               strict_aot=True):
        """Precompile the sample_decode + CLIP engines for every
        (batch bucket, resolution) pair (the reference's warm_up analog).

        strict_aot (default ON): an engine that silently degraded to
        on-demand jit (Engine.load swallowed the AOT failure) means every
        first request at that shape pays a compile cliff and per-shape
        recompiles in production — warmup raises naming the engines and
        their load errors instead. The census is also recorded in
        ``stats.aot_fallbacks`` either way, so /stats exposes engine
        health even with strict_aot=False."""
        from stablediffusioneo_tpu.annotators.canny import CannyDetector

        rt = self.pipe.runtime
        if self.pipe.annotators is not None:
            # multi-ControlNet pipeline: submit() builds per-net float
            # hint tuples, so THAT is the variant to precompile (the
            # packed/u8 single-net variants would silently fail to lower
            # against tuple params and leave the live path cold)
            hint_mode = "multi"
        elif isinstance(self.pipe.apply_canny, CannyDetector):
            # canny produces binary maps -> requests arrive bit-packed
            hint_mode = "packed"
        else:
            hint_mode = True
        engines = []
        for res in resolutions:
            for b in self.buckets:
                engines.append(rt.sample_decode_engine(
                    steps, b, res, res, sampler=sampler,
                    hint_u8=hint_mode, gen_xT="seeds"))
                engines.append(rt.clip_engine(2 * b))
        fell_back = {}
        for eng in engines:
            if eng.get_engine_infor().get("compiled"):
                continue
            if eng.load_error is None and rt.mesh is not None:
                # deliberate: under a mesh, buckets that don't tile the dp
                # axis skip AOT by design (_aot_ready) — not a failure
                continue
            fell_back[eng.name] = eng.load_error or "AOT never attempted"
        self.stats.aot_fallbacks.update(fell_back)
        if fell_back and strict_aot:
            raise RuntimeError(
                "serving warmup: engines degraded to on-demand jit "
                f"instead of AOT-compiling: {fell_back} "
                "(pass strict_aot=False to serve anyway; the degrade is "
                "visible in ServerStats.snapshot()['aot_fallbacks'])")
        return self

    # ---------------------------------------------------------------- submit

    def submit(self, req: GenRequest) -> Future:
        """Enqueue a request; host preprocessing (annotate + tokenize) runs
        on the caller thread so the dispatcher only does device work.
        The Future resolves to (detected_map, image), both uint8 HWC."""
        if self._thread is None:
            raise RuntimeError("server not started — call start()")
        from stablediffusioneo_tpu.annotators.util import HWC3, resize_image

        # cfg_rescale / tome_ratio are CONTINUOUS knobs that are static per
        # compiled engine (they sit in the engine cache key): validate the
        # range and snap to a 0.05 grid so a client sweeping float values
        # cannot force unbounded compilations (each distinct value would
        # otherwise mint a new 20-step program)
        if not (1 <= req.ddim_steps <= self.max_steps):
            raise ValueError(
                f"ddim_steps must be in [1, {self.max_steps}] (every "
                f"distinct value compiles a new engine; raise "
                f"DiffusionServer(max_steps=...) to widen), got "
                f"{req.ddim_steps}")
        if not (64 <= req.image_resolution <= self.max_resolution):
            raise ValueError(
                f"image_resolution must be in [64, {self.max_resolution}] "
                f"(shape buckets compile per /64 value; raise "
                f"DiffusionServer(max_resolution=...) to widen), got "
                f"{req.image_resolution}")
        if not (1 <= req.encoder_cache_interval <= req.ddim_steps):
            raise ValueError(
                f"encoder_cache_interval must be in [1, ddim_steps], got "
                f"{req.encoder_cache_interval}")
        if not (0.0 <= req.cfg_rescale <= 1.0):
            raise ValueError(
                f"cfg_rescale must be in [0, 1], got {req.cfg_rescale}")
        if not (0.0 <= req.tome_ratio <= 0.75):
            raise ValueError(
                f"tome_ratio must be in [0, 0.75], got {req.tome_ratio}")
        quant = {}
        for field in ("cfg_rescale", "tome_ratio"):
            v = getattr(req, field)
            q = round(v * 20.0) / 20.0
            if q != v:
                quant[field] = q
        if quant:
            import dataclasses

            req = dataclasses.replace(req, **quant)  # caller's req untouched

        p = _Pending(req=req, future=Future(), t_submit=time.perf_counter())
        img = resize_image(HWC3(req.image), req.image_resolution)
        p.hw = img.shape[:2]
        if self.pipe.annotators is not None:
            # multi-ControlNet pipeline: one float hint per net (same
            # convention as process(); u8/packed stay single-net)
            pairs = [self.pipe._annotate(img, req.low_threshold,
                                         req.high_threshold, a)
                     for a in self.pipe.annotators]
            p.detected_map = pairs[0][0]
            p.hint = tuple(m.astype(np.float32) / 255.0 for m, _ in pairs)
        else:
            p.detected_map, raw_map = self.pipe._annotate(
                img, req.low_threshold, req.high_threshold)
            # binary gray maps (canny) upload bit-packed (24x less
            # transfer); others as uint8 pixels — engines normalize/unpack
            # in-graph. Packedness is part of the batch key, so batches
            # stay uniform.
            packed = self.pipe._pack_hint(p.detected_map, raw_map)
            p.hint = packed if packed is not None else p.detected_map
        cond_text = (req.prompt + ", " + req.a_prompt
                     if req.a_prompt else req.prompt)
        if req.prompt_emphasis:
            from stablediffusioneo_tpu.models.text_encoding import (
                tokenize_weighted,
            )

            if req.long_prompt:
                raise ValueError("prompt_emphasis + long_prompt is "
                                 "unsupported (pick one encoder path)")
            p.ids, p.weights = tokenize_weighted(
                self.pipe.tokenizer, [cond_text, req.n_prompt])
        elif req.long_prompt:
            from stablediffusioneo_tpu.models.text_encoding import (
                needed_windows, tokenize_windowed,
            )

            tok = self.pipe.tokenizer
            f = (needed_windows(tok, [cond_text, req.n_prompt])
                 if req.long_prompt == "auto" else 3)
            p.ids = tokenize_windowed(tok, [cond_text, req.n_prompt],
                                      windows=f)  # (2, F, 77)
            if f == 1:
                # a 1-window grid IS the truncated grid (same SOT/EOT/pad)
                # — squeeze to rank 2 so it co-batches with plain requests
                # instead of colliding on ctx_len with a mismatched rank
                p.ids = p.ids[:, 0]
        else:
            p.ids = np.asarray(
                self.pipe.tokenizer([cond_text, req.n_prompt]))
        # resolve seed=-1 per SUBMISSION, without mutating the caller's
        # request object (a reused GenRequest must draw fresh seeds)
        p.seed = (int(np.random.randint(0, 2 ** 31 - 1))
                  if req.seed == -1 else int(req.seed))
        if req.inpaint_image is not None:
            if req.inpaint_mask is None:
                raise ValueError("inpaint_image requires inpaint_mask")
            from stablediffusioneo_tpu.pipeline.inpaint import prepare_inpaint

            H, W = p.hw
            p.inpaint_src, p.inpaint_mask = prepare_inpaint(
                req.inpaint_image, req.inpaint_mask, H, W,
                self.pipe.cfg.vae.downsample_factor)
        if req.init_image is not None:
            import cv2

            H, W = p.hw
            src = cv2.resize(HWC3(req.init_image), (W, H),
                             interpolation=cv2.INTER_AREA)
            p.init_src = src.astype(np.float32) / 127.5 - 1.0
            p.t_enc = max(1, min(req.ddim_steps, int(round(
                req.denoise_strength * req.ddim_steps))))
        with self._wake:
            self._groups.setdefault(self._key(p), []).append(p)
            self.stats.requests += 1
            self._wake.notify_all()
        return p.future

    def submit_async(self, req: GenRequest) -> Future:
        """Like :meth:`submit`, but host preprocessing runs on the server's
        worker pool instead of the caller's thread — a single-threaded
        client submitting a stream of requests then overlaps annotation of
        request N+1 with device compute of batch N (the ~13 ms/req
        annotate+tokenize cost leaves the serial path). The returned Future
        resolves to the same (detected_map, image) pair; preprocess-time
        errors (bad emphasis syntax, missing inpaint mask, out-of-range
        knobs) surface through it rather than raising in the caller."""
        if self._thread is None:
            raise RuntimeError("server not started — call start()")
        from concurrent.futures import ThreadPoolExecutor

        if self._pre_pool is None:
            self._pre_pool = ThreadPoolExecutor(
                max_workers=max(1, self._preprocess_workers),
                thread_name_prefix="sdeo-preprocess")
        fut: Future = Future()

        def _chain(inner: Future):
            e = inner.exception()
            if e is not None:
                _resolve(fut, exc=e)
            else:
                _resolve(fut, inner.result())

        def _run():
            try:
                self.submit(req).add_done_callback(_chain)
            except Exception as e:  # noqa: BLE001 — preprocess error -> future
                _resolve(fut, exc=e)

        self._pre_pool.submit(_run)
        return fut

    def generate(self, req: GenRequest, timeout: float = 600.0):
        """Synchronous convenience wrapper."""
        return self.submit(req).result(timeout=timeout)

    # ------------------------------------------------------------- scheduling

    def _key(self, p: _Pending) -> Tuple:
        r = p.req
        hint_kind = (("multi", len(p.hint)) if isinstance(p.hint, tuple)
                     else p.hint.ndim)  # 2 = bit-packed, 3 = uint8 pixels
        ctx_len = int(np.prod(p.ids.shape[1:]))  # rank-3 = windowed F*77
        return (p.hw, r.ddim_steps, r.sampler, r.guess_mode, r.eta,
                r.encoder_cache_interval, r.clip_skip, ctx_len,
                hint_kind,
                p.inpaint_src is not None,  # inpaint = own engine variant
                p.t_enc,  # img2img entry step = own engine depth (0 = off)
                float(r.cfg_rescale),  # static per engine variant
                float(r.tome_ratio))  # static per engine variant

    def _cut_batch(self) -> Optional[List[_Pending]]:
        """Called under the lock. Returns the batch to run now, or None.

        Groups are tried oldest-request-first; a group holding for its
        batching window must NOT block a younger group that is already
        dispatch-ready (e.g. a full max-size bucket at another resolution
        while the lone oldest request still waits for company)."""
        # purge abandoned requests (e.g. HTTP handlers that timed out and
        # cancelled their Future) so they stop consuming batch capacity
        for k in list(self._groups):
            q = [p for p in self._groups[k] if not p.future.cancelled()]
            if q:
                self._groups[k] = q
            else:
                del self._groups[k]
        keys = list(self._groups.keys())
        now = time.perf_counter()
        ages = [
            (now - self._groups[k][0].t_submit) * 1e3 if self._groups[k]
            else -1.0
            for k in keys
        ]
        while True:
            gi = pick_group(ages)
            if gi < 0:
                return None
            q = self._groups[keys[gi]]
            q_ages = [(now - p.t_submit) * 1e3 for p in q]
            n = decide_cut(q_ages, self.buckets, self.max_batch,
                           self.max_wait_ms)
            if n > 0:
                batch, self._groups[keys[gi]] = q[:n], q[n:]
                if not self._groups[keys[gi]]:
                    del self._groups[keys[gi]]
                return batch
            ages[gi] = -1.0  # holding: mask and consult the next group

    def _wait_timeout(self) -> Optional[float]:
        """Called under the lock: seconds until the oldest group's batching
        window expires (None = wait for arrivals only)."""
        best = None
        now = time.perf_counter()
        for q in self._groups.values():
            if not q:
                continue
            d = next_deadline_ms([(now - p.t_submit) * 1e3 for p in q],
                                 self.max_wait_ms)
            if d >= 0 and (best is None or d < best):
                best = d
        return None if best is None else best / 1e3

    def _dispatch_loop(self):
        while True:
            with self._wake:
                batch = (self._cut_batch()
                         if self._inflight_batches < self.max_inflight_batches
                         else None)
                while batch is None and not self._stop:
                    at_depth = (self._inflight_batches
                                >= self.max_inflight_batches)
                    # at depth, only a batch completion can unblock us —
                    # no deadline to honor (the completer notifies _wake)
                    self._wake.wait(timeout=None if at_depth
                                    else self._wait_timeout())
                    if self._inflight_batches < self.max_inflight_batches:
                        batch = self._cut_batch()
                if batch is None and self._stop:
                    return
                self._inflight += [p.future for p in batch]
                self._inflight_batches += 1
            try:
                self._dispatch_batch(batch)
            except Exception as e:  # noqa: BLE001 — fail the requests, not the server
                for p in batch:
                    _resolve(p.future, exc=e)
                with self._wake:
                    self.stats.errors += len(batch)
                    done = {p.future for p in batch}
                    self._inflight = [f for f in self._inflight
                                      if f not in done]
                    self._inflight_batches -= 1
                    self._wake.notify_all()

    # -------------------------------------------------------------- execution

    def _dispatch_batch(self, batch: List[_Pending]):
        """Encode prompts and ENQUEUE the batched engine call. JAX dispatch
        is async: the device array is handed to the completion thread, which
        blocks on the device->host fetch — so the dispatcher can cut and
        enqueue the NEXT batch while this one still computes/transfers
        (the fetch is ~70 ms of tunnel RTT per batch otherwise serialized)."""
        import jax
        import jax.numpy as jnp

        rt = self.pipe.runtime
        t0 = time.perf_counter()
        r0 = batch[0].req
        b = len(batch)

        # one batched CLIP encode: rows [cond_0..cond_{B-1}, uncond_0..]
        ids = np.concatenate([np.stack([p.ids[0] for p in batch]),
                              np.stack([p.ids[1] for p in batch])])
        if ids.ndim == 3:  # long-prompt windows: (2B, F, 77) -> (2B*F, 77)
            n2b, fw, lw = ids.shape
            ctx = rt.encode_prompt(ids.reshape(n2b * fw, lw),
                                   clip_skip=r0.clip_skip)
            ctx = ctx.reshape(n2b, fw * lw, -1)
        else:
            ctx = rt.encode_prompt(ids, clip_skip=r0.clip_skip)
        if any(p.weights is not None for p in batch):
            from stablediffusioneo_tpu.models.text_encoding import (
                apply_emphasis,
            )

            ones = np.ones_like(ids[0], np.float32)
            emph_w = np.concatenate(
                [np.stack([p.weights[0] if p.weights is not None else ones
                           for p in batch]),
                 np.stack([p.weights[1] if p.weights is not None else ones
                           for p in batch])])
            ctx = apply_emphasis(ctx, emph_w)
        ctx_cond, ctx_uncond = ctx[:b], ctx[b:]

        if isinstance(batch[0].hint, tuple):  # multi-ControlNet
            n_nets = len(batch[0].hint)
            hint = tuple(np.stack([p.hint[n] for p in batch])
                         for n in range(n_nets))
        else:
            hint = np.stack([p.hint for p in batch])
        # per-request seeds: x_T AND in-loop eta-noise derive from each
        # row's own seed IN-GRAPH (engine gen_xT="seeds"), so a request's
        # output is bit-identical at batch 1 or inside any batch — incl.
        # eta > 0 (round-2 limitation removed), and the per-request
        # host-side x_T generation dispatches are gone
        seeds = np.asarray([p.seed for p in batch], np.int32)
        scales = np.asarray([p.req.scale for p in batch], np.float32)
        if isinstance(batch[0].hint, tuple):
            # per-net strengths: scalars broadcast to every net, tuples are
            # per-net; each net gets its own per-request (B,) vector
            n_nets = len(batch[0].hint)

            def st(p, n):
                s = p.req.strength
                return s[n] if isinstance(s, (tuple, list)) else s

            strengths = tuple(
                np.asarray([st(p, n) for p in batch], np.float32)
                for n in range(n_nets))
        else:
            strengths = np.asarray([p.req.strength for p in batch],
                                   np.float32)

        extra_kw = {}
        if batch[0].inpaint_src is not None:
            # one batched deterministic VAE encode (posterior mode — no
            # batch-position-dependent noise, so outputs stay per-request
            # reproducible)
            src = jnp.asarray(np.stack([p.inpaint_src for p in batch]))
            extra_kw.update(
                inpaint_latent=rt.encode_image(src, deterministic=True),
                inpaint_mask=jnp.asarray(
                    np.stack([p.inpaint_mask for p in batch])),
            )
        if batch[0].t_enc:
            # img2img: same batched deterministic encode; the per-request
            # seeds ride into the img2img-seeds engine variant (each row's
            # re-noise + eta-noise derive from its own seed)
            src = jnp.asarray(np.stack([p.init_src for p in batch]))
            extra_kw.update(
                init_latent=rt.encode_image(src, deterministic=True),
                t_enc=batch[0].t_enc,
            )

        images_dev = rt.sample_decode(
            r0.ddim_steps, None,
            (tuple(jnp.asarray(hh) for hh in hint)
             if isinstance(hint, tuple) else jnp.asarray(hint)),
            ctx_cond, ctx_uncond,
            None, seeds=seeds,
            guidance_scale=scales, strength=strengths, eta=r0.eta,
            guess_mode=r0.guess_mode, sampler=r0.sampler,
            encoder_cache_interval=r0.encoder_cache_interval,
            cfg_rescale=r0.cfg_rescale,
            tome_ratio=r0.tome_ratio,
            **extra_kw,
        )
        self._done_q.put((batch, images_dev, t0))

    def _complete_loop(self):
        while True:
            item = self._done_q.get()
            if item is None:
                return
            batch, images_dev, t0 = item
            try:
                images = np.asarray(images_dev)  # blocks: compute + fetch
                t1 = time.perf_counter()
                b = len(batch)
                with self._lock:
                    self.stats.batches += 1
                    self.stats.rows += b
                    self.stats.run_ms_sum += (t1 - t0) * 1e3
                    self.stats.queue_ms_sum += sum(
                        (t0 - p.t_submit) * 1e3 for p in batch)
                    self.stats.batch_hist[b] = (
                        self.stats.batch_hist.get(b, 0) + 1)
                for i, p in enumerate(batch):
                    _resolve(p.future, (p.detected_map, images[i]))
            except Exception as e:  # noqa: BLE001
                with self._lock:
                    self.stats.errors += len(batch)
                for p in batch:
                    _resolve(p.future, exc=e)
            finally:
                with self._wake:
                    done = {p.future for p in batch}
                    self._inflight = [f for f in self._inflight
                                      if f not in done]
                    self._inflight_batches -= 1
                    self._wake.notify_all()
