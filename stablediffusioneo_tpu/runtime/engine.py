"""Engine layer: AOT-compiled executables per shape bucket.

Re-design of the reference's TRT runtime (`Engine`, Engine.py:45-161) and
build toolchain (onnx2trt*.py) for XLA:

  TRT concept                          TPU-native equivalent
  -----------------------------------  -----------------------------------
  .plan engine per model+shape         jax.jit(...).lower(shapes).compile()
  min/opt/max optimization profiles    explicit resolution buckets (H,W are
                                       multiples of 64 by construction —
                                       annotator resize_image contract)
  pre-allocated device bindings        buffer donation (donate_argnums) on
                                       the latent state
  CUDA graph capture/replay            the jitted lax.scan program itself
  dual streams for cond/uncond         CFG batch-2 inside one program
  engine deserialization at startup    persistent XLA compilation cache

`Engine` wraps one compiled executable; `CNSDRuntime` owns device params +
the engine dictionary for the full canny2image pipeline (CLIP encode,
sampler loop, VAE decode/encode) and compiles lazily per bucket, exactly as
the reference falls back / selects engines per shape dict (Engine.py:67-91).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.config import PipelineConfig
from stablediffusioneo_tpu.models.clip import clip_text_apply
from stablediffusioneo_tpu.models.unet import encoder_plan
from stablediffusioneo_tpu.models.vae import vae_decode, vae_encode
from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
from stablediffusioneo_tpu.pipeline.k_diffusion import KDIFF_SAMPLERS
from stablediffusioneo_tpu.runtime.cache import enable_persistent_cache


def _canon_sampler(sampler: str) -> str:
    """Engine-program name for a sampler string: sigma-spacing suffixes
    ("-karras"/"-uniform") only change the schedule arrays, which ride as
    engine inputs — so e.g. dpmpp/dpmpp-karras and euler/euler-uniform
    share ONE compiled program each."""
    for suffix in ("-karras", "-uniform"):
        if sampler.endswith(suffix):
            return sampler[: -len(suffix)]
    return sampler

log = logging.getLogger("stablediffusioneo_tpu")

# resize_image rounds to multiples of 64 (annotator/util.py:9-38) so this
# small set covers the reference's dynamic-profile range and then some.
DEFAULT_BUCKETS = (256, 320, 384, 448, 512, 640, 768)


def resolution_buckets(buckets=DEFAULT_BUCKETS):
    return tuple(sorted(buckets))


def snap_to_bucket(value: int, buckets=DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= value (compile-shape selection)."""
    for b in sorted(buckets):
        if b >= value:
            return b
    return sorted(buckets)[-1]


def _spmd_traced(fn: Callable) -> Callable:
    """Wrap a traceable fn so partition-aware Pallas attention lowering is
    active while its body runs (i.e. while jit traces it)."""
    import functools

    from stablediffusioneo_tpu.ops.dispatch import spmd_attention_scope

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with spmd_attention_scope(True):
            return fn(*args, **kwargs)

    return wrapped


class Engine:
    """One AOT-compiled executable (the `.plan`+ExecutionContext analog).

    `load()` lowers+compiles for the given abstract shapes; `infer()`/call
    executes. Introspection mirrors Engine.get_engine_infor
    (Engine.py:122-129) via cost/memory analysis.
    """

    def __init__(
        self,
        fn: Callable,
        name: str = "engine",
        static_argnums: Tuple[int, ...] = (),
        donate_argnums: Tuple[int, ...] = (),
        spmd: bool = False,
    ):
        self.name = name
        if spmd:
            # Mesh engines: trace with partition-aware Pallas attention
            # (custom_partitioning) so GSPMD shards the kernels instead of
            # replicating around opaque custom calls. The scope wraps the
            # fn BODY — contextvar state is consulted at trace time.
            fn = _spmd_traced(fn)
        self._jitted = jax.jit(
            fn, static_argnums=static_argnums, donate_argnums=donate_argnums
        )
        self._compiled = None
        self.compile_seconds: Optional[float] = None
        self.load_error: Optional[str] = None

    def load(self, *abstract_args, **abstract_kwargs) -> "Engine":
        """AOT compile for the given example/abstract arguments.

        Degrades gracefully on AOT failure (falls back to on-demand jit) —
        the analog of the reference's missing-plan torch fallback
        (cldm_trt/ddim_hacked.py:21-23)."""
        t0 = time.perf_counter()
        try:
            lowered = self._jitted.lower(*abstract_args, **abstract_kwargs)
            self._compiled = lowered.compile()
            self.compile_seconds = time.perf_counter() - t0
            log.info("engine %s compiled in %.1fs", self.name, self.compile_seconds)
        except Exception as e:  # noqa: BLE001 — degrade, don't die
            self._compiled = None
            self.load_error = f"{type(e).__name__}: {e}"
            log.warning(
                "engine %s AOT compile failed (%s); falling back to "
                "on-demand jit", self.name, self.load_error,
            )
        return self

    def __call__(self, *args, **kwargs):
        if self._compiled is not None:
            return self._compiled(*args, **kwargs)
        return self._jitted(*args, **kwargs)

    infer = __call__  # reference-API alias (Engine.infer, Engine.py:131)

    def get_engine_infor(self) -> Dict[str, Any]:
        if self._compiled is None:
            return {"compiled": False}
        cost = self._compiled.cost_analysis()
        mem = self._compiled.memory_analysis()
        return {
            "compiled": True,
            "compile_seconds": self.compile_seconds,
            "flops": cost.get("flops") if cost else None,
            "bytes_accessed": cost.get("bytes accessed") if cost else None,
            "memory": {
                "generated_code_bytes": getattr(mem, "generated_code_size_in_bytes", None),
                "argument_bytes": getattr(mem, "argument_size_in_bytes", None),
                "output_bytes": getattr(mem, "output_size_in_bytes", None),
                "temp_bytes": getattr(mem, "temp_size_in_bytes", None),
            },
        }


class CNSDRuntime:
    """Full canny2image runtime: device params + per-bucket engines.

    params: {"unet", "controlnet", "vae", "clip"} trees (from
    checkpoint.convert or random init). Engines compile lazily on first use
    of a (kind, shape-bucket) combination and hit the persistent cache on
    subsequent process starts.
    """

    def __init__(
        self,
        params: Dict[str, Dict],
        cfg: PipelineConfig,
        persistent_cache: bool = True,
        cache_dir: Optional[str] = None,
        mesh=None,
        quantize_linears: bool = False,
    ):
        """mesh: optional jax.sharding.Mesh (from parallel.make_mesh) for
        multi-chip serving — params get tp shardings, batches shard over dp
        (GSPMD inserts the ICI collectives). None = single-chip.

        quantize_linears: int8 weight-only on the UNet/ControlNet
        transformer linears (per-channel symmetric; ops/pallas/quant.py) —
        halves their weight HBM traffic vs bf16. Quality-gated in
        tests/test_pipeline.py; keep off when exact torch parity matters."""
        if persistent_cache:
            enable_persistent_cache(cache_dir)
        self.cfg = cfg
        self.mesh = mesh
        self.dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        # Params are stored in the compute dtype: weights stream from HBM
        # every denoise step, and the bf16 pipeline is HBM-bound — fp32
        # storage would double that traffic. Norm statistics still happen in
        # fp32 (ops/norms.py casts internally), so bf16 gamma/beta only
        # costs ~0.4% rounding, well inside the reference's fp16 envelope.
        cast = jax.tree.map(
            lambda x: x.astype(self.dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            params,
        )
        if quantize_linears:
            # after the bf16 cast so the per-channel scales stay fp32
            from stablediffusioneo_tpu.ops.pallas.quant import (
                quantize_linear_tree,
            )

            cast = dict(cast)
            for name in ("unet", "controlnet"):
                cast[name], n_q = quantize_linear_tree(cast[name])
                log.info("int8 weight-only: %d linears quantized in %s",
                         n_q, name)
        self.quantized = quantize_linears
        if mesh is not None:
            from stablediffusioneo_tpu.parallel.mesh import shard_params

            self.params = shard_params(cast, mesh)
        else:
            self.params = jax.device_put(cast)
        d = cfg.diffusion
        self.schedule = DiffusionSchedule(
            d.timesteps, d.linear_start, d.linear_end, d.schedule
        )
        self.n_taps = len(encoder_plan(cfg.unet)) + 1
        self._engines: Dict[Tuple, Engine] = {}
        self._sched_cache: Dict[Tuple, dict] = {}

    def apply_lora(self, lora: Dict, scale: float = 1.0,
                   on: str = "unet") -> int:
        """Merge a LoRA adapter tree (training/lora.py) into the resident
        `on` param tree. Shapes/dtypes are unchanged, so every compiled
        engine stays valid — the next call simply streams the merged
        weights. One-way: re-load the checkpoint to remove an adapter.
        Returns the number of merged sites."""
        from stablediffusioneo_tpu.training.lora import merge_lora, n_sites

        if self.quantized:
            raise ValueError(
                "apply_lora on an int8-quantized runtime: merge before "
                "quantization (construct with quantize_linears=False, "
                "apply, then quantize)")
        if on not in self.params:
            raise KeyError(f"apply_lora: no {on!r} tree in runtime params")
        merged = merge_lora(self.params[on], lora, scale)
        if self.mesh is not None:
            from stablediffusioneo_tpu.parallel.mesh import shard_params

            merged = shard_params(merged, self.mesh)
        else:
            merged = jax.device_put(merged)
        self.params = {**self.params, on: merged}
        return n_sites(lora)

    # ------------------------------------------------------------- engines

    def _cfg_with_tome(self, tome_ratio: float):
        """ControlNetConfig with ToMe enabled on the shared UNetConfig
        (ops/tome.py) — both the UNet and ControlNet transformer sites
        merge, covering all 7 seq-4096 self-attention sites at 512²."""
        cn = self.cfg.controlnet
        if not tome_ratio:
            return cn
        import dataclasses

        return dataclasses.replace(
            cn, unet=dataclasses.replace(cn.unet,
                                         tome_ratio=float(tome_ratio)))

    def _sampler_fn(self, num_steps: int, guess_mode: bool, sampler: str,
                    encoder_cache_interval: int = 1, inpaint: bool = False,
                    cfg_rescale: float = 0.0, tome_ratio: float = 0.0):
        cfg = self.cfg
        ccfg = self._cfg_with_tome(tome_ratio)

        if encoder_cache_interval != 1 and _canon_sampler(sampler) != "ddim":
            # the interval is threaded only into ddim_sample_scan; letting
            # it through for other solvers would mint a duplicate engine
            # (it is part of the cache key) that behaves like interval=1
            raise ValueError(
                "encoder_cache_interval is a DDIM-path feature "
                f"(sampler='ddim'); got interval {encoder_cache_interval} "
                f"with sampler {sampler!r}")

        if sampler.startswith("dpmpp"):
            from stablediffusioneo_tpu.pipeline.dpm_solver import dpmpp_sample_scan

            if inpaint:
                raise ValueError("inpainting is a DDIM-path feature "
                                 "(sampler='ddim')")

            def run(unet_p, ctrl_p, sched, x_T, hint, ctx_c, ctx_u, scale, cscales, key):
                return dpmpp_sample_scan(
                    unet_p, ctrl_p, ccfg, sched,
                    x_T, hint, ctx_c, ctx_u, scale, cscales,
                    guess_mode=guess_mode,
                    parameterization=cfg.diffusion.parameterization,
                    cfg_rescale=cfg_rescale,
                )

            return run

        if sampler in ("unipc", "plms"):
            if inpaint:
                raise ValueError("inpainting is a DDIM-path feature "
                                 "(sampler='ddim')")
            if sampler == "unipc":
                from stablediffusioneo_tpu.pipeline.unipc import (
                    unipc_sample_scan as scan_fn,
                )
            else:
                from stablediffusioneo_tpu.pipeline.plms import (
                    plms_sample_scan as scan_fn,
                )

            def run(unet_p, ctrl_p, sched, x_T, hint, ctx_c, ctx_u, scale, cscales, key):
                return scan_fn(
                    unet_p, ctrl_p, ccfg, sched,
                    x_T, hint, ctx_c, ctx_u, scale, cscales,
                    guess_mode=guess_mode,
                    parameterization=cfg.diffusion.parameterization,
                    cfg_rescale=cfg_rescale,
                )

            return run

        if sampler in KDIFF_SAMPLERS:
            from stablediffusioneo_tpu.pipeline.k_diffusion import kdiff_sample_scan

            if inpaint:
                raise ValueError("inpainting is a DDIM-path feature "
                                 "(sampler='ddim')")

            def run(unet_p, ctrl_p, sched, x_T, hint, ctx_c, ctx_u, scale, cscales, key):
                return kdiff_sample_scan(
                    unet_p, ctrl_p, ccfg, sched,
                    x_T, hint, ctx_c, ctx_u, scale, cscales, key,
                    sampler=sampler, guess_mode=guess_mode,
                    parameterization=cfg.diffusion.parameterization,
                    cfg_rescale=cfg_rescale,
                )

            return run

        if inpaint:
            # trailing (inpaint_latent, inpaint_mask) args — the hint-variant
            # wrappers pass them through their *rest tail untouched
            def run(unet_p, ctrl_p, sched, x_T, hint, ctx_c, ctx_u, scale,
                    cscales, key, ilat, imask):
                return ddim_sample_scan(
                    unet_p, ctrl_p, ccfg, sched,
                    x_T, hint, ctx_c, ctx_u, scale, cscales, key,
                    guess_mode=guess_mode,
                    parameterization=cfg.diffusion.parameterization,
                    encoder_cache_interval=encoder_cache_interval,
                    inpaint_latent=ilat, inpaint_mask=imask,
                    cfg_rescale=cfg_rescale,
                )

            return run

        def run(unet_p, ctrl_p, sched, x_T, hint, ctx_c, ctx_u, scale, cscales, key):
            return ddim_sample_scan(
                unet_p, ctrl_p, ccfg, sched,
                x_T, hint, ctx_c, ctx_u, scale, cscales, key,
                guess_mode=guess_mode,
                parameterization=cfg.diffusion.parameterization,
                encoder_cache_interval=encoder_cache_interval,
                cfg_rescale=cfg_rescale,
            )

        return run

    def _with_u8_hint(self, fn):
        """Wrap a sampler fn so the hint arg is uint8 pixels, normalized
        in-graph: astype(f32) / 255 then the model dtype — bit-identical
        to the host-side `detected / 255.0` it replaces (uint8->f32 is
        exact and the division happens in f32 either way)."""
        dtype = self.dtype

        def run(unet_p, ctrl_p, sched, x_T, hint_u8, *rest):
            hint = (hint_u8.astype(jnp.float32) / 255.0).astype(dtype)
            return fn(unet_p, ctrl_p, sched, x_T, hint, *rest)

        return run

    def _with_packed_hint(self, fn):
        """Wrap a sampler fn so the hint arg is BIT-PACKED binary pixels:
        (B, H, W//8) uint8, np.packbits big-endian order. Canny hints are
        {0, 255} on every channel, so 1 bit/pixel is lossless — 98 KB
        instead of 786 KB of host->device transfer at 512^2 (the upload
        rides a ~28 MB/s tunnel, so this is ~24 ms off the critical path).
        In-graph unpack to {0., 1.} is bit-identical to the uint8 path's
        `astype(f32) / 255` on {0, 255} inputs."""
        dtype = self.dtype

        def run(unet_p, ctrl_p, sched, x_T, hint_bits, *rest):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (hint_bits[..., None] >> shifts) & jnp.uint8(1)
            b, h, wp, _ = bits.shape
            hint = bits.reshape(b, h, wp * 8).astype(dtype)  # exact {0,1}
            hint = jnp.broadcast_to(hint[..., None], (b, h, wp * 8, 3))
            return fn(unet_p, ctrl_p, sched, x_T, hint, *rest)

        return run

    def sample_decode_engine(
        self, num_steps: int, batch: int, h: int, w: int,
        guess_mode: bool = False, sampler: str = "ddim",
        encoder_cache_interval: int = 1, ctx_len: Optional[int] = None,
        hint_u8=False,  # False | True | "packed"
        gen_xT=False,  # False | True | "seeds"
        inpaint: bool = False,
        cfg_rescale: float = 0.0,
        tome_ratio: float = 0.0,
    ) -> Engine:
        """Sampler + VAE decode + uint8 denorm as ONE compiled program.
        cfg_rescale: static guidance-rescale weight (arXiv:2305.08891;
        a distinct engine variant per value — users pick 0 or ~0.7).

        The production serving path: a single dispatch for the whole
        latent->pixels pipeline. On the tunneled single-chip setup this
        saves two host<->device round-trips (~30 ms each) vs
        sampler_engine + decoder_engine; it also lets XLA schedule the
        decode immediately after the scan with no host in the loop.

        hint_u8="packed": the hint is bit-packed binary (B, H, W//8) uint8
        (see _with_packed_hint) — the canny production path."""
        ctx_len = ctx_len or self.cfg.clip.max_length
        # sigma-spacing suffixes share ONE program: the spacing only
        # changes the schedule arrays, which are engine inputs
        sampler = _canon_sampler(sampler)
        if gen_xT in ("img2img", "img2img-seeds") and sampler != "ddim":
            # the in-graph re-noise reads the DDIM schedule's alphas and
            # consumes a tail slice of the trained discretization — the
            # dpmpp/unipc/kdiff schedule dicts carry different keys (and a
            # Karras tail would need entry-sigma renormalization)
            raise ValueError("img2img (init_image/denoise_strength) is a "
                             f"DDIM-path feature (sampler='ddim', got "
                             f"{sampler!r})")
        key_t = ("sample_decode", sampler, num_steps, batch, h, w, guess_mode,
                 encoder_cache_interval, ctx_len, hint_u8, gen_xT, inpaint,
                 float(cfg_rescale), float(tome_ratio))
        if key_t in self._engines:
            return self._engines[key_t]
        base = self._sampler_fn(num_steps, guess_mode, sampler,
                                encoder_cache_interval, inpaint=inpaint,
                                cfg_rescale=cfg_rescale,
                                tome_ratio=tome_ratio)
        if hint_u8 == "packed":
            sfn = self._with_packed_hint(base)
        elif hint_u8 == "multi" or not hint_u8:
            sfn = base  # float hints (incl. per-net tuples) pass through
        else:
            sfn = self._with_u8_hint(base)
        cfg = self.cfg
        f_ds = cfg.vae.downsample_factor
        lat_shape = (batch, h // f_ds, w // f_ds, 4)
        dtype = self.dtype

        def run(unet_p, ctrl_p, vae_p, sched, x_T, hint, ctx_c, ctx_u,
                scale, cscales, key, *inpaint_args):
            if gen_xT == "seeds":
                # x_T carries PER-REQUEST int32 seeds (B,): derive each
                # request's root key, x_T rows, and in-loop noise keys from
                # its own seed in-graph — a request's bits are identical
                # whether it runs at batch 1 or inside a serving batch
                # (process()'s PRNGKey(seed) -> split -> normal, per row)
                ks = jax.vmap(
                    lambda s: jax.random.split(jax.random.PRNGKey(s)))(x_T)
                key = ks[:, 0]  # (B, 2) per-sample noise keys (ddim._step_noise)
                x_T_v = jax.vmap(
                    lambda k: jax.random.normal(k, lat_shape[1:], jnp.float32)
                )(ks[:, 1]).astype(dtype)
            elif gen_xT == "img2img":
                # x_T carries the INIT LATENT; re-noise it to the entry
                # step's level in-graph, mirroring DDIMSampler.img2img's
                # host sequence bit-for-bit (ddim.py: key, kn = split(key);
                # stochastic_encode(lat, alphas[0], kn); scan gets key)
                key, kn = jax.random.split(key)
                a0 = sched["alphas"][0].astype(jnp.float32)
                noise = jax.random.normal(kn, lat_shape, jnp.float32)
                x_T_v = (jnp.sqrt(a0) * x_T.astype(jnp.float32)
                         + jnp.sqrt(1.0 - a0) * noise).astype(dtype)
            elif gen_xT == "img2img-seeds":
                # serving img2img: x_T carries the init latents, the key
                # slot carries PER-REQUEST int32 seeds — each row's
                # re-noise AND in-loop eta-noise derive from its own seed,
                # row-for-row the batch-1 img2img sequence (normal() bits
                # depend on element count, not leading batch dims)
                ks = jax.vmap(
                    lambda s: jax.random.split(jax.random.PRNGKey(s)))(key)
                a0 = sched["alphas"][0].astype(jnp.float32)
                noise = jax.vmap(lambda k: jax.random.normal(
                    k, lat_shape[1:], jnp.float32))(ks[:, 1])
                x_T_v = (jnp.sqrt(a0) * x_T.astype(jnp.float32)
                         + jnp.sqrt(1.0 - a0) * noise).astype(dtype)
                key = ks[:, 0]  # (B, 2) per-sample scan noise keys
            elif gen_xT:
                # x_T carries the ROOT key (2,) uint32; reproduce exactly
                # the host-side `key, sub = split(root); normal(sub, ...)`
                # sequence in-graph — identical bits, zero host dispatches
                key, sub = jax.random.split(x_T)
                x_T_v = jax.random.normal(sub, lat_shape,
                                          jnp.float32).astype(dtype)
            else:
                x_T_v = x_T
            z = sfn(unet_p, ctrl_p, sched, x_T_v, hint, ctx_c, ctx_u,
                    scale, cscales, key, *inpaint_args)
            img = vae_decode(vae_p, cfg.vae, z, scaled=True)
            img = jnp.clip(img.astype(jnp.float32) * 127.5 + 127.5, 0, 255)
            return img.astype(jnp.uint8)

        eng = Engine(run, spmd=self.mesh is not None,
                     name=f"{sampler}+decode_{num_steps}x{batch}x{h}x{w}"
                     + ("_guess" if guess_mode else "")
                     + ("_bithint" if hint_u8 == "packed" else "")
                     + (f"_genxT-{gen_xT}" if isinstance(gen_xT, str)
                        else ("_genxT" if gen_xT else ""))
                     + ("_inpaint" if inpaint else ""),
                     donate_argnums=() if gen_xT else (4,))  # donate x_T
        sched = self._make_schedule(num_steps, sampler)
        sched_abs = {k: self._abs_rep(v.shape, v.dtype)
                     for k, v in sched.items()}
        f = self.cfg.vae.downsample_factor
        if gen_xT == "seeds":
            lat = self._abs_data((batch,), jnp.int32)
        elif gen_xT in ("img2img", "img2img-seeds"):
            lat = self._abs_data((batch, h // f, w // f, 4), self.dtype,
                                 spatial=True)
        elif gen_xT:
            lat = self._abs_rep((2,), jnp.uint32)
        else:
            lat = self._abs_data((batch, h // f, w // f, 4), self.dtype,
                                 spatial=True)
        if hint_u8 == "packed":
            hint = self._abs_data((batch, h, w // 8), jnp.uint8)
        elif hint_u8 == "multi":
            hint = tuple(self._abs_data((batch, h, w, 3), self.dtype,
                                        spatial=True)
                         for _ in self.params["controlnet"])
        else:
            hint = self._abs_data((batch, h, w, 3),
                                  jnp.uint8 if hint_u8 else self.dtype,
                                  spatial=True)
        ctx = self._abs_data(
            (batch, ctx_len, self.cfg.unet.context_dim), self.dtype)
        scale = self._abs_data((batch,), jnp.float32)
        cscales = (tuple(self._abs_data((batch, self.n_taps),
                                        jnp.float32)
                         for _ in self.params["controlnet"])
                   if hint_u8 == "multi" else
                   self._abs_data((batch, self.n_taps), jnp.float32))
        key = (self._abs_data((batch,), jnp.int32)
               if gen_xT == "img2img-seeds"
               else self._abs_rep((2,), jnp.uint32))
        extra = ()
        if inpaint:
            extra = (self._abs_data((batch, h // f, w // f, 4), self.dtype,
                                    spatial=True),
                     self._abs_data((batch, h // f, w // f, 1), self.dtype,
                                    spatial=True))
        params_abs = self._abs_tree(
            (self.params["unet"], self.params["controlnet"],
             self.params["vae"]))
        if self._aot_ready(batch):
            eng.load(params_abs[0], params_abs[1], params_abs[2], sched_abs,
                     lat, hint, ctx, ctx, scale, cscales, key, *extra)
        self._engines[key_t] = eng
        return eng

    def sample_decode(
        self,
        num_steps: int,
        x_T: Optional[jax.Array],
        hint: jax.Array,
        ctx_cond: jax.Array,
        ctx_uncond: jax.Array,
        key: jax.Array,
        guidance_scale: float = 9.0,
        strength: float = 1.0,
        eta: float = 0.0,
        guess_mode: bool = False,
        sampler: str = "ddim",
        encoder_cache_interval: int = 1,
        seeds=None,
        inpaint_latent: Optional[jax.Array] = None,
        inpaint_mask: Optional[jax.Array] = None,
        init_latent: Optional[jax.Array] = None,
        t_enc: Optional[int] = None,
        cfg_rescale: float = 0.0,
        tome_ratio: float = 0.0,
    ) -> jax.Array:
        """Fused sample+decode: returns uint8 (B, H, W, 3) ON DEVICE.

        inpaint_latent (B, h, w, 4) + inpaint_mask (B, h, w, 1; 1 =
        generate) select the blended-latent inpainting engine variant
        (pipeline/ddim.py) — DDIM only, no encoder caching.

        init_latent + t_enc (img2img, DDIMSampler.encode/decode semantics):
        the init latent rides the x_T slot, is re-noised in-graph to the
        entry step of the num_steps discretization, and a t_enc-step
        engine runs the remaining schedule tail. Requires x_T=None and no
        seeds; num_steps stays the FULL discretization count.

        A uint8 `hint` selects the uint8-ingest engine variant (normalize
        in-graph — 4x less host->device transfer); a RANK-3 uint8 hint
        (B, H, W//8) selects the bit-packed binary variant (np.packbits
        big-endian — 24x less transfer, canny hints are {0,255}); float
        hints keep the float variant. x_T=None selects the gen_xT variant:
        `key` is
        treated as the ROOT key and the engine reproduces
        `key, sub = split(root); x_T = normal(sub, ...)` in-graph —
        identical bits to the host-side sequence, minus two tiny device
        dispatches and the latent upload per call.

        seeds (serving path): per-request int seeds, shape (B,); requires
        x_T=None. Each row's x_T AND in-loop eta-noise derive from its own
        seed in-graph, so a request reproduces bit-identically regardless
        of which batch it was cut into (`key` is then ignored)."""
        multi = isinstance(hint, tuple)
        if multi != isinstance(self.params["controlnet"], tuple):
            raise ValueError("multi-ControlNet: hint must be a tuple of "
                             "per-net float hints iff the runtime holds a "
                             "tuple of controlnet trees")
        h0 = hint[0] if multi else hint
        if multi:
            if isinstance(strength, list):  # JSON surfaces produce lists
                strength = tuple(strength)
            if not isinstance(strength, tuple):
                strength = (strength,) * len(hint)  # shared for all nets
        b = h0.shape[0]
        packed = not multi and h0.ndim == 3
        h = h0.shape[1]
        w = h0.shape[2] * 8 if packed else h0.shape[2]
        if seeds is not None and x_T is not None:
            raise ValueError("seeds requires x_T=None (in-graph generation)")
        if init_latent is not None:
            if x_T is not None:
                raise ValueError("img2img (init_latent) requires x_T=None")
            if t_enc is None or not (1 <= t_enc <= num_steps):
                raise ValueError(f"img2img needs 1 <= t_enc <= {num_steps}")
            gen_xT = "img2img-seeds" if seeds is not None else "img2img"
        else:
            gen_xT = "seeds" if seeds is not None else x_T is None
        if packed and h0.dtype != jnp.uint8:
            raise ValueError("rank-3 (packed) hint must be uint8")
        # the multi path uploads plain float hints (the u8/packed ingest
        # variants stay single-net optimizations)
        hint_u8 = ("multi" if multi
                   else "packed" if packed else h0.dtype == jnp.uint8)
        inpaint = inpaint_latent is not None
        if inpaint and inpaint_mask is None:
            raise ValueError("inpaint_latent requires inpaint_mask")
        img2img = gen_xT in ("img2img", "img2img-seeds")
        eng = self.sample_decode_engine(
            t_enc if img2img else num_steps, b, h, w,
            guess_mode, sampler,
            encoder_cache_interval, ctx_len=ctx_cond.shape[1],
            hint_u8=hint_u8, gen_xT=gen_xT, inpaint=inpaint,
            cfg_rescale=cfg_rescale, tome_ratio=tome_ratio)
        sched = self._sched_device(
            num_steps, sampler, eta, t_enc=t_enc if img2img else None)
        scale_v, cscales = self._per_sample_scales(
            b, guidance_scale, strength, guess_mode)
        if gen_xT == "seeds":
            x_T_arg = self._put_batch(np.asarray(seeds, np.int32))
            if key is None:
                key = jax.random.PRNGKey(0)  # ignored by the seeds variant
        elif gen_xT == "img2img-seeds":
            x_T_arg = self._put_batch(init_latent.astype(self.dtype),
                                      spatial=True)
            # per-request seeds ride the KEY slot for this variant
            key = np.asarray(seeds, np.int32)
        elif gen_xT == "img2img":
            x_T_arg = self._put_batch(init_latent.astype(self.dtype),
                                      spatial=True)
        elif gen_xT:
            x_T_arg = self._put_rep(key)  # root key rides the x_T slot
        else:
            if isinstance(x_T, jax.Array) and x_T.dtype == self.dtype:
                x_T = jnp.copy(x_T)  # donated below; see sample()
            x_T_arg = self._put_batch(x_T.astype(self.dtype), spatial=True)
        extra = ()
        if inpaint:
            extra = (self._put_batch(inpaint_latent.astype(self.dtype),
                                     spatial=True),
                     self._put_batch(inpaint_mask.astype(self.dtype),
                                     spatial=True))
        if hint_u8 == "multi":
            hint_arg = tuple(self._put_batch(self._norm_hint(hh),
                                             spatial=True)
                             for hh in hint)
        else:
            hint_arg = self._put_batch(
                hint if hint_u8 else hint.astype(self.dtype), spatial=True)
        return eng(
            self.params["unet"], self.params["controlnet"],
            self.params["vae"], sched,
            x_T_arg,
            hint_arg,
            self._put_batch(ctx_cond.astype(self.dtype)),
            self._put_batch(ctx_uncond.astype(self.dtype)),
            self._put_batch(scale_v),
            self._put_batch(cscales),
            (self._put_batch(jnp.asarray(key)) if gen_xT == "img2img-seeds"
             else self._put_rep(key)),
            *extra,
        )

    def _sched_device(self, num_steps: int, sampler: str, eta: float,
                      t_enc: Optional[int] = None):
        """Device-resident schedule constants, cached per (sampler, steps,
        eta) — re-uploading the ~10 small schedule arrays on every call
        costs a handful of tunneled transfers each.

        t_enc (img2img): the LAST t_enc entries of the num_steps
        discretization (sampling order) — the entry point of
        DDIMSampler.img2img; a t_enc-step engine consumes it directly
        since schedules are engine inputs, not baked constants."""
        # eta is a DDIM-only knob: the other solvers never read it, so
        # normalize it out of the cache key (a nonzero eta would otherwise
        # cache a second, identical schedule) — and fail loudly for PLMS,
        # whose upstream sampler asserts ddim_eta == 0
        base = _canon_sampler(sampler)
        if base == "plms" and float(eta) != 0.0:
            raise ValueError(
                f"PLMS requires eta == 0 (got {eta}); the upstream "
                "PLMSSampler asserts ddim_eta == 0")
        ck = (sampler, num_steps, float(eta) if base == "ddim" else 0.0,
              t_enc)
        cached = self._sched_cache.get(ck)
        if cached is None:
            sched = self._make_schedule(num_steps, sampler, eta=eta)
            if t_enc is not None:
                sched = {k: v[num_steps - t_enc:] for k, v in sched.items()}
            cached = {k: self._put_rep(v) for k, v in sched.items()}
            self._sched_cache[ck] = cached
        return cached

    def _make_schedule(self, num_steps: int, sampler: str, eta: float = 0.0):
        # "<name>-karras" = the same solver over the rho-7 Karras sigma
        # spacing (same engine program; the spacing only changes the
        # schedule arrays, which ride as engine inputs)
        spacing = "karras" if sampler.endswith("-karras") else "uniform"
        base = _canon_sampler(sampler)
        if base in ("dpmpp", "unipc"):
            # UniPC rides the dpmpp schedule arrays (same (t, alpha, sigma,
            # lambda) boundary grid; only the update rule differs)
            from stablediffusioneo_tpu.pipeline.dpm_solver import dpmpp_schedule

            return dpmpp_schedule(self.schedule, num_steps, spacing=spacing)
        if base in KDIFF_SAMPLERS:
            from stablediffusioneo_tpu.pipeline.k_diffusion import kdiff_schedule

            # k-diffusion convention defaults to the Karras spacing
            # (bare "euler"/"euler-a"/"heun" = the familiar A1111 samplers);
            # "<name>-uniform" selects the trained-grid spacing instead.
            sp = "uniform" if sampler.endswith("-uniform") else "karras"
            return kdiff_schedule(self.schedule, num_steps, spacing=sp)
        if base == "plms":
            # PLMS is eta-0 only (upstream PLMSSampler asserts ddim_eta == 0)
            if float(eta) != 0.0:
                raise ValueError(
                    f"PLMS requires eta == 0 (got {eta}); the upstream "
                    "PLMSSampler asserts ddim_eta == 0")
            return self.schedule.ddim(num_steps, eta=0.0)
        if base != "ddim":
            raise ValueError(f"unknown sampler {sampler!r} (expected 'ddim', "
                             "'plms', 'dpmpp[-karras]', 'unipc[-karras]', "
                             "'euler[-a|-uniform]' or 'heun[-uniform]')")
        return self.schedule.ddim(num_steps, eta=eta)

    def sampler_engine(
        self, num_steps: int, batch: int, h: int, w: int,
        guess_mode: bool = False, sampler: str = "ddim",
        encoder_cache_interval: int = 1, ctx_len: Optional[int] = None,
        hint_u8=False,  # False | True | "packed"
        cfg_rescale: float = 0.0,
        tome_ratio: float = 0.0,
    ) -> Engine:
        """Compiled denoise loop for (steps, batch, HxW). H,W are image-space
        (latent is H/8 x W/8). sampler: "ddim" | "plms" | "dpmpp[-karras]" |
        "unipc[-karras]" | "euler[-a][-uniform]" | "heun[-uniform]"
        (spacing suffixes share one program). ctx_len: context
        token length (default 77; 231 for the 3x77 windowed long-prompt
        bucket). hint_u8: engine ingests the control hint as uint8 pixels
        and divides by 255 in-graph — the production path (a 512^2 f32
        hint is ~3 MB of host->device transfer; uint8 is 4x less, and the
        in-graph f32 division then dtype cast is bit-identical to the old
        host-side normalize)."""
        ctx_len = ctx_len or self.cfg.clip.max_length
        sampler = _canon_sampler(sampler)
        key_t = ("sampler", sampler, num_steps, batch, h, w, guess_mode,
                 encoder_cache_interval, ctx_len, hint_u8,
                 float(cfg_rescale), float(tome_ratio))
        if key_t in self._engines:
            return self._engines[key_t]
        sfn = self._sampler_fn(num_steps, guess_mode, sampler,
                               encoder_cache_interval,
                               cfg_rescale=cfg_rescale,
                               tome_ratio=tome_ratio)
        if hint_u8 == "packed":
            fn = self._with_packed_hint(sfn)
        elif hint_u8 == "multi" or not hint_u8:
            fn = sfn  # float hints (incl. per-net tuples) pass through
        else:
            fn = self._with_u8_hint(sfn)
        eng = Engine(fn, spmd=self.mesh is not None,
                     name=f"{sampler}_{num_steps}x{batch}x{h}x{w}"
                     + ("_guess" if guess_mode else "")
                     + (f"_ctx{ctx_len}" if ctx_len != self.cfg.clip.max_length
                        else ""),
                     donate_argnums=(3,))  # donate x_T
        sched = self._make_schedule(num_steps, sampler)
        sched_abs = {k: self._abs_rep(v.shape, v.dtype) for k, v in sched.items()}
        f = self.cfg.vae.downsample_factor
        lat = self._abs_data((batch, h // f, w // f, 4), self.dtype,
                             spatial=True)
        if hint_u8 == "packed":
            hint = self._abs_data((batch, h, w // 8), jnp.uint8)
        elif hint_u8 == "multi":
            hint = tuple(self._abs_data((batch, h, w, 3), self.dtype,
                                        spatial=True)
                         for _ in self.params["controlnet"])
        else:
            hint = self._abs_data((batch, h, w, 3),
                                  jnp.uint8 if hint_u8 else self.dtype,
                                  spatial=True)
        ctx = self._abs_data(
            (batch, ctx_len, self.cfg.unet.context_dim), self.dtype
        )
        scale = self._abs_data((batch,), jnp.float32)
        cscales = (tuple(self._abs_data((batch, self.n_taps),
                                        jnp.float32)
                         for _ in self.params["controlnet"])
                   if hint_u8 == "multi" else
                   self._abs_data((batch, self.n_taps), jnp.float32))
        key = self._abs_rep((2,), jnp.uint32)
        params_abs = self._abs_tree(
            (self.params["unet"], self.params["controlnet"]))
        if self._aot_ready(batch):
            eng.load(params_abs[0], params_abs[1], sched_abs, lat, hint, ctx, ctx, scale, cscales, key)
        self._engines[key_t] = eng
        return eng

    def clip_engine(self, batch: int, clip_skip: int = 0) -> Engine:
        key_t = ("clip", batch, clip_skip)
        if key_t in self._engines:
            return self._engines[key_t]
        cfg = self.cfg

        def run(clip_p, ids):
            if clip_skip > 1:
                from stablediffusioneo_tpu.models.text_encoding import (
                    clip_text_apply_skip,
                )

                out = clip_text_apply_skip(clip_p, cfg.clip, ids,
                                           clip_skip=clip_skip)
            else:
                out = clip_text_apply(clip_p, cfg.clip, ids)
            return out.astype(self.dtype)

        eng = Engine(run, spmd=self.mesh is not None, name=f"clip_b{batch}"
                     + (f"_skip{clip_skip}" if clip_skip > 1 else ""))
        ids = self._abs_data((batch, cfg.clip.max_length), jnp.int32)
        params_abs = self._abs_tree(self.params["clip"])
        if self._aot_ready(batch):
            eng.load(params_abs, ids)
        self._engines[key_t] = eng
        return eng

    def decoder_engine(self, batch: int, h: int, w: int) -> Engine:
        key_t = ("decoder", batch, h, w)
        if key_t in self._engines:
            return self._engines[key_t]
        cfg = self.cfg

        def run(vae_p, z):
            img = vae_decode(vae_p, cfg.vae, z, scaled=True)
            # denorm to uint8 pixels (canny2image_TRT.py:85-87)
            img = jnp.clip(img.astype(jnp.float32) * 127.5 + 127.5, 0, 255)
            return img.astype(jnp.uint8)

        # no donation: the latent is tiny and users may decode it twice
        eng = Engine(run, spmd=self.mesh is not None,
                     name=f"decoder_b{batch}_{h}x{w}")
        f = self.cfg.vae.downsample_factor
        z = self._abs_data((batch, h // f, w // f, 4), self.dtype,
                           spatial=True)
        params_abs = self._abs_tree(self.params["vae"])
        if self._aot_ready(batch):
            eng.load(params_abs, z)
        self._engines[key_t] = eng
        return eng

    def encoder_engine(self, batch: int, h: int, w: int,
                       deterministic: bool = False) -> Engine:
        """VAE encoder (img2img parity; the reference exports but never wires
        the decoder engine — we wire BOTH, SURVEY §3.3 note).

        deterministic=True takes the posterior mode instead of a sample —
        batch-composition-independent, the serving inpaint path's choice."""
        key_t = ("encoder", batch, h, w, deterministic)
        if key_t in self._engines:
            return self._engines[key_t]
        cfg = self.cfg

        if deterministic:
            def run(vae_p, img):
                dist = vae_encode(vae_p, cfg.vae, img)
                return dist.mode() * jnp.asarray(cfg.vae.scale_factor,
                                                 img.dtype)
        else:
            def run(vae_p, img, key):
                dist = vae_encode(vae_p, cfg.vae, img)
                return dist.sample(key) * jnp.asarray(cfg.vae.scale_factor,
                                                      img.dtype)

        eng = Engine(run, spmd=self.mesh is not None,
                     name=f"encoder_b{batch}_{h}x{w}"
                     + ("_det" if deterministic else ""))
        img = self._abs_data((batch, h, w, 3), self.dtype, spatial=True)
        params_abs = self._abs_tree(self.params["vae"])
        if self._aot_ready(batch):
            if deterministic:
                eng.load(params_abs, img)
            else:
                eng.load(params_abs, img, self._abs_rep((2,), jnp.uint32))
        self._engines[key_t] = eng
        return eng

    # ----------------------------------------------------------- user API

    def _put_batch(self, x, ndim=None, spatial=False):
        """device_put with dp batch sharding when a mesh is configured.
        Batches that don't tile the dp axis (e.g. a serving batch-1 cut on
        a dp=2 mesh) go in replicated — matching _aot_ready's on-demand-jit
        fallback for those shapes (GSPMD re-shards inside the program).
        spatial=True marks NHWC tensors (latents, hints, images) whose dim 1
        is image H, eligible for sp sharding (see _io_sharding)."""
        if isinstance(x, tuple):  # per-net containers (multi-ControlNet)
            return tuple(self._put_batch(v, ndim, spatial) for v in x)
        if self.mesh is None:
            return jnp.asarray(x)
        nd = ndim if ndim is not None else np.ndim(x)
        b = np.shape(x)[0] if nd else 0
        if nd == 0 or b % self.mesh.shape.get("dp", 1) != 0:
            return self._put_rep(x)
        return jax.device_put(np.asarray(x) if not hasattr(x, "sharding") else x,
                              self._io_sharding(np.shape(x), spatial))

    def _io_sharding(self, shape, spatial=False):
        """Input/abstract-arg sharding: batch over dp always; NHWC spatial
        inputs (latents, hints, images — the call site says so explicitly
        via spatial=True, rather than a rank heuristic that would silently
        sp-shard a non-spatial dim of a future rank-4 input) additionally
        shard H over sp when the mesh has the axis and H tiles it — GSPMD
        propagates the sp shard through the UNet (conv halos, norm moments,
        token-sharded attention; see parallel/mesh.py). Non-spatial inputs
        (ids, ctx) and sp-indivisible heights stay dp-only."""
        from stablediffusioneo_tpu.parallel.mesh import (
            data_sharding, latent_sharding)

        nd = len(shape)
        sp = self.mesh.shape.get("sp", 1)
        if spatial and sp > 1 and nd >= 4 and shape[1] % sp == 0:
            return latent_sharding(self.mesh, nd)
        return data_sharding(self.mesh, nd)

    def _norm_hint(self, hh):
        """Per-net hint element (multi-ControlNet): uint8 maps normalize
        exactly as the single-net in-graph path would (/255 in f32),
        floats cast to the compute dtype."""
        if hh.dtype == jnp.uint8:
            return (jnp.asarray(hh).astype(jnp.float32)
                    / 255.0).astype(self.dtype)
        return hh.astype(self.dtype)

    def _put_rep(self, x):
        """device_put replicated when a mesh is configured (AOT-compiled
        mesh executables expect committed, correctly-sharded inputs)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, P()))

    # ---------------------------------------------- abstract-arg builders

    def _aot_ready(self, batch: int) -> bool:
        """AOT under a mesh needs the batch to tile the dp axis; otherwise
        fall back to on-demand jit (GSPMD then specializes at call time)."""
        if self.mesh is None:
            return True
        return batch % self.mesh.shape.get("dp", 1) == 0

    def _abs_tree(self, tree):
        """Abstract tree carrying the params' REAL shardings in mesh mode,
        so mesh engines AOT-compile the same GSPMD program they run."""
        if self.mesh is None:
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), tree)

    def _abs_data(self, shape, dtype, spatial=False):
        """Batch-dp (+ spatial-sp when spatial=True, see _io_sharding)
        abstract array (replicated without a mesh)."""
        if self.mesh is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=self._io_sharding(shape, spatial))

    def _abs_rep(self, shape, dtype):
        if self.mesh is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=NamedSharding(self.mesh, P()))

    def encode_prompt(self, ids: np.ndarray, clip_skip: int = 0) -> jax.Array:
        return self.clip_engine(ids.shape[0], clip_skip)(
            self.params["clip"], self._put_batch(jnp.asarray(ids))
        )

    def encode_prompt_windowed(
        self, tokenizer, texts, windows=3, clip_skip: int = 0
    ) -> jax.Array:
        """Long-prompt conditioning through the compiled CLIP engine: the
        hack_everything 3x77 windowing (cldm/hack.py:32-68). (B, windows, 77)
        ids run as one batch-(B*windows) engine call, reshaped to
        (B, windows*77, hidden) — one extra fixed shape bucket, no dynamic
        token-length profiles.

        windows="auto" picks the minimal count for the texts (1..3): a
        78-127-token prompt then costs the ctx-154 bucket, not ctx-231 —
        the fixed-bucket answer to onnx2trt_dynamic.py's 1-128 profile."""
        from stablediffusioneo_tpu.models.text_encoding import (
            needed_windows, tokenize_windowed,
        )

        if windows == "auto":
            windows = needed_windows(tokenizer, texts)
        ids = tokenize_windowed(tokenizer, texts, windows=windows)
        b, f, l = ids.shape
        y = self.encode_prompt(ids.reshape(b * f, l), clip_skip=clip_skip)
        return y.reshape(b, f * l, -1)

    def _per_sample_scales(self, batch: int, guidance_scale, strength,
                           guess_mode: bool):
        """Normalize guidance_scale / strength (scalar or per-sample
        sequences) to a (B,) scale vector and a (B, n_taps) control-scales
        matrix — one engine signature serves both uniform and mixed-request
        (serving-layer) batches."""
        from stablediffusioneo_tpu.models.controlnet import guess_mode_scales

        if isinstance(strength, tuple):  # multi-ControlNet: one per net
            pairs = [self._per_sample_scales(batch, guidance_scale, s,
                                             guess_mode) for s in strength]
            return pairs[0][0], tuple(cs for _, cs in pairs)
        gs = np.asarray(guidance_scale, np.float32).reshape(-1)
        if gs.size == 1:
            gs = np.full((batch,), gs[0], np.float32)
        st = np.asarray(strength, np.float32).reshape(-1)
        if st.size == 1:
            st = np.full((batch,), st[0], np.float32)
        if guess_mode:
            cs = np.stack([
                np.asarray(guess_mode_scales(float(s), self.n_taps))
                for s in st
            ]).astype(np.float32)
        else:
            cs = np.repeat(st[:, None], self.n_taps, axis=1)
        return jnp.asarray(gs), jnp.asarray(cs)

    def sample(
        self,
        num_steps: int,
        x_T: jax.Array,
        hint: jax.Array,
        ctx_cond: jax.Array,
        ctx_uncond: jax.Array,
        key: jax.Array,
        guidance_scale: float = 9.0,
        strength: float = 1.0,
        eta: float = 0.0,
        guess_mode: bool = False,
        sampler: str = "ddim",
        encoder_cache_interval: int = 1,
        cfg_rescale: float = 0.0,
        tome_ratio: float = 0.0,
    ) -> jax.Array:
        b, lh, lw, _ = x_T.shape
        f = self.cfg.vae.downsample_factor
        multi = isinstance(hint, tuple)
        if multi != isinstance(self.params["controlnet"], tuple):
            raise ValueError("multi-ControlNet: hint must be a tuple of "
                             "per-net float hints iff the runtime holds a "
                             "tuple of controlnet trees")
        if multi:
            hint_u8 = "multi"  # per-net float hints (multi-ControlNet)
            if isinstance(strength, list):
                strength = tuple(strength)
            if not isinstance(strength, tuple):
                strength = (strength,) * len(hint)
        elif hint.ndim == 3:  # bit-packed binary hint (B, H, W//8)
            hint_u8 = "packed"
        else:
            hint_u8 = hint.dtype == jnp.uint8
        eng = self.sampler_engine(num_steps, b, lh * f, lw * f, guess_mode,
                                  sampler, encoder_cache_interval,
                                  ctx_len=ctx_cond.shape[1],
                                  hint_u8=hint_u8,
                                  cfg_rescale=cfg_rescale,
                                  tome_ratio=tome_ratio)
        sched = self._sched_device(num_steps, sampler, eta)
        scale_v, cscales = self._per_sample_scales(
            b, guidance_scale, strength, guess_mode)
        # x_T is donated (donate_argnums=(3,)); .astype is a no-op alias when
        # the dtype already matches, which would invalidate a caller-held x_T
        # reused across sample() calls — force a fresh buffer in that case.
        if isinstance(x_T, jax.Array) and x_T.dtype == self.dtype:
            x_T = jnp.copy(x_T)
        if multi:
            hint_arg = tuple(self._put_batch(self._norm_hint(hh),
                                             spatial=True)
                             for hh in hint)
        else:
            hint_arg = self._put_batch(
                hint if hint_u8 else hint.astype(self.dtype), spatial=True)
        return eng(
            self.params["unet"], self.params["controlnet"], sched,
            self._put_batch(x_T.astype(self.dtype), spatial=True),
            hint_arg,
            self._put_batch(ctx_cond.astype(self.dtype)),
            self._put_batch(ctx_uncond.astype(self.dtype)),
            self._put_batch(scale_v),
            self._put_batch(cscales), self._put_rep(key),
        )

    def decode_latent_device(self, z: jax.Array) -> jax.Array:
        """VAE decode to uint8 pixels, left on device (callers that want to
        time or overlap the host fetch separately use this + np.asarray)."""
        b, lh, lw, _ = z.shape
        f = self.cfg.vae.downsample_factor
        eng = self.decoder_engine(b, lh * f, lw * f)
        return eng(self.params["vae"],
                   self._put_batch(z.astype(self.dtype), spatial=True))

    def decode_latent(self, z: jax.Array) -> np.ndarray:
        return np.asarray(self.decode_latent_device(z))

    def encode_image(self, img: jax.Array, key: Optional[jax.Array] = None,
                     deterministic: bool = False) -> jax.Array:
        """VAE-encode pixels in [-1, 1] to scaled latents. deterministic
        takes the posterior mode (key ignored); otherwise key is required
        for the posterior sample."""
        if not deterministic and key is None:
            raise ValueError("encode_image: key required unless "
                             "deterministic=True")
        b, h, w, _ = img.shape
        eng = self.encoder_engine(b, h, w, deterministic=deterministic)
        img_dev = self._put_batch(img.astype(self.dtype), spatial=True)
        if deterministic:
            return eng(self.params["vae"], img_dev)
        return eng(self.params["vae"], img_dev, self._put_rep(key))

    def report(self) -> str:
        """Engine census: one line per compiled engine with FLOPs/memory
        (the get_engine_infor introspection, aggregated — the trtexec
        --dumpProfile analog at engine granularity)."""
        lines = []
        for key_t, eng in sorted(self._engines.items(), key=str):
            info = eng.get_engine_infor()
            if info.get("compiled"):
                fl = info.get("flops") or 0
                mem = info.get("memory", {}).get("temp_bytes") or 0
                lines.append(
                    f"{eng.name}: compile {info['compile_seconds']:.1f}s, "
                    f"{fl/1e9:.1f} GFLOP, temp {mem/1e6:.0f} MB"
                )
            else:
                reason = f" ({eng.load_error})" if eng.load_error else ""
                lines.append(f"{eng.name}: on-demand jit{reason}")
        return "\n".join(lines)

    def warmup(self, resolution: int = 256, num_steps: int = 1, batch: int = 1,
               allow_fallback: bool = False):
        """Boot-time self-test, mirroring hackathon.warm_up
        (canny2image_TRT.py:33-50): compile + run every engine once.

        Fails LOUDLY if any flagship engine silently degraded to on-demand
        jit (an AOT failure at warmup means a real bug — bad shapes, OOM —
        not a missing plan; pass allow_fallback=True to keep the old
        graceful behavior). Mesh-mode engines AOT-compile too, with sharded
        abstract args (__graft_entry__.dryrun_multichip asserts zero jit
        fallbacks); the fallback census below is skipped for them only
        because their engines live in per-mesh dicts, not self._engines."""
        assert resolution % 64 == 0, "resolutions are /64 by resize_image contract"
        h = w = resolution
        ids = np.zeros((batch, self.cfg.clip.max_length), np.int32)
        ctx = self.encode_prompt(ids)
        key = jax.random.PRNGKey(0)
        f = self.cfg.vae.downsample_factor
        x_T = jax.random.normal(key, (batch, h // f, w // f, 4), self.dtype)
        if isinstance(self.params["controlnet"], tuple):
            # multi-ControlNet runtime: per-net float hints; the u8/packed
            # single-net variants below don't exist on this path
            mh = tuple(jnp.zeros((batch, h, w, 3), self.dtype)
                       for _ in self.params["controlnet"])
            z = self.sample(num_steps, x_T, mh, ctx, ctx, key)
            img = self.decode_latent(z)
            img_fused = np.asarray(self.sample_decode(
                num_steps, None, mh, ctx, ctx, key))
            if img_fused.shape != img.shape:
                raise RuntimeError(
                    f"warmup self-test: fused sample_decode shape "
                    f"{img_fused.shape} != granular path {img.shape}")
            if not allow_fallback:
                fell = [e.name for e in self._engines.values()
                        if not e.get_engine_infor().get("compiled")
                        and self.mesh is None]
                if fell:
                    raise RuntimeError(
                        f"warmup: engines fell back to on-demand jit: {fell}")
            return
        # uint8 hint: warm the uint8-ingest engine variants process() uses
        hint = jnp.zeros((batch, h, w, 3), jnp.uint8)
        z = self.sample(num_steps, x_T, hint, ctx, ctx, key)
        img = self.decode_latent(z)
        # x_T=None: warm the gen_xT fused engine — the variant process()'s
        # production path actually runs (x_T provided warms the other one)
        img_fused = np.asarray(self.sample_decode(
            num_steps, None, hint, ctx, ctx, key))
        if img_fused.shape != img.shape:
            raise RuntimeError(
                f"warmup self-test: fused sample_decode shape "
                f"{img_fused.shape} != granular path {img.shape}")
        # bit-packed binary hint (B, H, W//8): the canny production variant
        # — a packed-path AOT regression must surface here, not on the
        # first real request
        packed = jnp.zeros((batch, h, w // 8), jnp.uint8)
        img_packed = np.asarray(self.sample_decode(
            num_steps, None, packed, ctx, ctx, key))
        if not np.array_equal(img_packed, img_fused):
            raise RuntimeError(
                "warmup self-test: packed-hint engine output differs from "
                "the uint8-hint engine on the all-zero hint (must be "
                "bit-identical)")
        if self.mesh is None and not allow_fallback:
            fell_back = [
                (eng.name, eng.load_error)
                for eng in self._engines.values()
                if eng.get_engine_infor().get("compiled") is False
            ]
            if fell_back:
                raise RuntimeError(
                    "warmup: engines fell back to on-demand jit instead of "
                    f"AOT-compiling: {fell_back}")
        return img.shape
