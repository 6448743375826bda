"""Capture an XLA profiler trace of the flagship 512x512 loop on the real
TPU and print a per-op cost table (the evidence base for kernel work).

Usage:  python scripts/profile_xplane.py [outdir]
Writes the raw trace under outdir (default /tmp/sdeo_xplane) and prints:
  - top HLO ops by self time for the sampler step and the VAE decode
  - category rollup (convolution / dot / elementwise / copy ...)

Parsing uses tensorboard_plugin_profile's hlo_stats converter on the
.xplane.pb produced by jax.profiler (no TensorBoard UI needed).
"""

import glob
import gzip
import io
import json
import os
import sys

try:
    import stablediffusioneo_tpu  # noqa: F401 — installed or on PYTHONPATH
except ImportError:  # repo checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def capture(outdir: str):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stablediffusioneo_tpu.config import sd15_pipeline
    from stablediffusioneo_tpu.models import (
        init_clip_text, init_controlnet, init_unet, init_vae,
    )
    from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
    from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline
    from stablediffusioneo_tpu.runtime.profiling import _hard_sync

    cfg = sd15_pipeline(dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    shapes = {
        "unet": jax.eval_shape(lambda k: init_unet(k, cfg.unet), ks[0]),
        "controlnet": jax.eval_shape(lambda k: init_controlnet(k, cfg.controlnet), ks[1]),
        "vae": jax.eval_shape(lambda k: init_vae(k, cfg.vae), ks[2]),
        "clip": jax.eval_shape(lambda k: init_clip_text(k, cfg.clip), ks[3]),
    }
    params = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size, max_length=cfg.clip.max_length)
    pipe = Canny2ImagePipeline(params, tok, cfg)

    rng = np.random.default_rng(0)
    res = int(os.environ.get("PROFILE_RESOLUTION", "512"))
    img = (rng.random((res, res, 3)) * 255).astype(np.uint8)

    batch = int(os.environ.get("PROFILE_BATCH", "1"))
    tome = float(os.environ.get("PROFILE_TOME", "0"))

    def run():
        return pipe.process(img, "a bird", num_samples=batch,
                            image_resolution=res, ddim_steps=20, seed=1,
                            tome_ratio=tome)

    print("warmup (compile)...", flush=True)
    run()
    print("tracing one full process() ...", flush=True)
    jax.profiler.start_trace(outdir)
    out = run()
    _hard_sync(jnp.asarray(out[1]))
    jax.profiler.stop_trace()
    print("trace written to", outdir, flush=True)


def capture_sdxl(outdir: str):
    """PROFILE_FAMILY=sdxl: trace the fused SDXL-base 1024^2 sample+decode
    engine (the BENCH_FAMILY=sdxl workload) instead of the CNSD flagship."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stablediffusioneo_tpu.models import init_unet, init_vae
    from stablediffusioneo_tpu.models.sdxl import SDXLConfig, sdxl_txt2img_scan
    from stablediffusioneo_tpu.models.vae import vae_decode
    from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
    from stablediffusioneo_tpu.runtime.cache import enable_persistent_cache
    from stablediffusioneo_tpu.runtime.engine import Engine
    from stablediffusioneo_tpu.runtime.profiling import _hard_sync

    enable_persistent_cache(None)
    res = int(os.environ.get("PROFILE_RESOLUTION", "1024"))
    steps = int(os.environ.get("PROFILE_STEPS", "20"))
    xcfg = SDXLConfig()
    sh = {
        "unet": jax.eval_shape(lambda k: init_unet(k, xcfg.unet),
                               jax.random.PRNGKey(0)),
        "vae": jax.eval_shape(lambda k: init_vae(k, xcfg.vae),
                              jax.random.PRNGKey(1)),
    }
    bf16 = lambda s: jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype  # noqa: E731
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, bf16(s)), sh))()
    sched = jax.tree.map(jnp.asarray, DiffusionSchedule().ddim(steps))
    h = res // 8

    def run(up, vp, sc, x_T, ctx2, y2, key):
        z = sdxl_txt2img_scan(up, xcfg, sc, x_T, ctx2[:1], ctx2[1:],
                              y2[:1], y2[1:], jnp.float32(5.0), key)
        img = vae_decode(vp, xcfg.vae, z, scaled=True)
        return jnp.clip(img.astype(jnp.float32) * 127.5 + 127.5,
                        0, 255).astype(jnp.uint8)

    eng = Engine(run, name=f"sdxl_profile_{steps}x1x{res}")
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.standard_normal((1, h, h, 4)).astype(np.float32)
                    ).astype(jnp.bfloat16),
        jnp.asarray(rng.standard_normal((2, 77, xcfg.unet.context_dim)
                                        ).astype(np.float32)
                    ).astype(jnp.bfloat16),
        jnp.asarray(rng.standard_normal((2, xcfg.unet.adm_in_channels)
                                        ).astype(np.float32)
                    ).astype(jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    print("warmup (compile)...", flush=True)
    _hard_sync(eng(params["unet"], params["vae"], sched, *args))
    print("tracing one fused sdxl call...", flush=True)
    jax.profiler.start_trace(outdir)
    out = eng(params["unet"], params["vae"], sched, *args)
    _hard_sync(out)
    jax.profiler.stop_trace()
    print("trace written to", outdir, flush=True)


def capture_hires(outdir: str):
    """PROFILE_MODE=hires: trace one two-pass hires-fix process() —
    base pass at PROFILE_RESOLUTION (default 512), 2x latent upscale,
    img2img refine with fresh annotation (the BENCH_MODE=hires workload;
    the refine leg's self-attention runs the streaming flash kernel)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stablediffusioneo_tpu.config import sd15_pipeline
    from stablediffusioneo_tpu.models import (
        init_clip_text, init_controlnet, init_unet, init_vae,
    )
    from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
    from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline
    from stablediffusioneo_tpu.runtime.cache import enable_persistent_cache
    from stablediffusioneo_tpu.runtime.profiling import _hard_sync

    enable_persistent_cache(None)
    cfg = sd15_pipeline(dtype="bfloat16")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    shapes = {
        "unet": jax.eval_shape(lambda k: init_unet(k, cfg.unet), ks[0]),
        "controlnet": jax.eval_shape(
            lambda k: init_controlnet(k, cfg.controlnet), ks[1]),
        "vae": jax.eval_shape(lambda k: init_vae(k, cfg.vae), ks[2]),
        "clip": jax.eval_shape(lambda k: init_clip_text(k, cfg.clip), ks[3]),
    }
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                        max_length=cfg.clip.max_length)
    pipe = Canny2ImagePipeline(params, tok, cfg)
    res = int(os.environ.get("PROFILE_RESOLUTION", "512"))
    rng = np.random.default_rng(0)
    img = (rng.random((res, res, 3)) * 255).astype(np.uint8)

    def run():
        return pipe.process(img, "a bird", num_samples=1,
                            image_resolution=res, ddim_steps=20, seed=1,
                            hires_upscale=2.0, hires_denoise=0.5)

    print("warmup (compile)...", flush=True)
    run()
    print(f"tracing one hires process() {res}->{2*res} ...", flush=True)
    jax.profiler.start_trace(outdir)
    out = run()
    _hard_sync(jnp.asarray(out[1]))
    jax.profiler.stop_trace()
    print("trace written to", outdir, "timings:", pipe.last_timings,
          flush=True)


def capture_annotators(outdir: str):
    """PROFILE_MODE=annotators: trace one __call__ per annotator family
    (hed / midas dpt_large / openpose body) on a PROFILE_RESOLUTION image,
    with a host-side wall split printed per phase. Canny is host-only and
    not traced."""
    import time as _time

    import numpy as np
    import jax

    from stablediffusioneo_tpu.annotators.hed import HEDdetector
    from stablediffusioneo_tpu.annotators.midas import MidasDetector
    from stablediffusioneo_tpu.annotators.openpose import OpenposeDetector

    res = int(os.environ.get("PROFILE_RESOLUTION", "512"))
    rng = np.random.default_rng(2946901)
    img = (rng.random((res, res, 3)) * 255).astype(np.uint8)
    dets = (
        ("hed", HEDdetector()),
        ("midas", MidasDetector(model_type="dpt_large")),
        ("openpose", OpenposeDetector()),
    )
    for name, det in dets:  # warm outside the trace
        det(img)
    jax.profiler.start_trace(outdir)
    for name, det in dets:
        t0 = _time.perf_counter()
        det(img)
        print(f"[annotators] {name}: wall {1e3*(_time.perf_counter()-t0):.0f}"
              " ms", flush=True)
    jax.profiler.stop_trace()
    print("trace written to", outdir, flush=True)


def capture_train(outdir: str):
    """PROFILE_MODE=train: trace one ControlNet fine-tune step (the
    BENCH_MODE=train workload — forward + flash-attention VJP + AdamW)
    at PROFILE_RESOLUTION (default 256) x PROFILE_BATCH (default 8)."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp

    from stablediffusioneo_tpu.config import sd15_pipeline
    from stablediffusioneo_tpu.models import init_controlnet, init_unet
    from stablediffusioneo_tpu.runtime.profiling import _hard_sync
    from stablediffusioneo_tpu.training.trainer import (
        create_train_state, make_schedule_buffers, train_step,
    )

    cfg = sd15_pipeline(dtype="bfloat16")
    res = int(os.environ.get("PROFILE_RESOLUTION", "256"))
    b = int(os.environ.get("PROFILE_BATCH", "8"))
    f = cfg.vae.downsample_factor
    sh = {
        "unet": jax.eval_shape(lambda k: init_unet(k, cfg.unet),
                               jax.random.PRNGKey(0)),
        "controlnet": jax.eval_shape(
            lambda k: init_controlnet(k, cfg.controlnet),
            jax.random.PRNGKey(1)),
    }
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), sh))()
    state, tx = create_train_state(params["controlnet"])
    sqrt_a, sqrt_1ma = make_schedule_buffers(cfg)
    step_fn = jax.jit(functools.partial(train_step, tx=tx, cfg=cfg))
    rng = np.random.default_rng(0)
    batch = {
        "x0": rng.standard_normal((b, res // f, res // f, 4), np.float32),
        "hint": rng.random((b, res, res, 3)).astype(np.float32),
        "ctx": rng.standard_normal((b, 77, cfg.unet.context_dim),
                                   np.float32),
    }
    key = jax.random.PRNGKey(0)
    print("warmup (compile)...", flush=True)
    state, loss = step_fn(state, unet_params=params["unet"],
                          sqrt_abar=sqrt_a, sqrt_one_minus_abar=sqrt_1ma,
                          batch=batch, key=key)
    _hard_sync(loss)
    print(f"tracing one train step ({res}^2 b{b})...", flush=True)
    jax.profiler.start_trace(outdir)
    state, loss = step_fn(state, unet_params=params["unet"],
                          sqrt_abar=sqrt_a, sqrt_one_minus_abar=sqrt_1ma,
                          batch=batch, key=key)
    _hard_sync(loss)
    jax.profiler.stop_trace()
    print("trace written to", outdir, flush=True)


def _category(name: str) -> str:
    """HLO op name -> coarse category (xprof-style)."""
    base = name.split(".")[0].split("-")[0].lstrip("%")
    for pat, cat in (
        ("fusion", "fusion"), ("convolution", "convolution"),
        ("dot", "dot"), ("copy", "copy"), ("all", "collective"),
        ("dynamic", "dynamic-slice/update"), ("reduce", "reduce"),
        ("custom", "custom-call"), ("transpose", "transpose"),
        ("scatter", "scatter"), ("gather", "gather"),
        ("bitcast", "bitcast"), ("broadcast", "broadcast"),
    ):
        if base.startswith(pat):
            return cat
    return base or "other"


def parse(outdir: str, top: int = 35):
    """Aggregate the TPU device plane: per-module rollup + per-op table.
    Reads the raw .xplane.pb via TF's xplane proto (no tensorboard UI)."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane found under", outdir)
        return
    xp = max(xplanes, key=os.path.getmtime)
    print("parsing", xp, flush=True)
    space = xplane_pb2.XSpace()
    with open(xp, "rb") as fh:
        space.ParseFromString(fh.read())
    plane = next((p for p in space.planes if "TPU" in p.name and p.lines), None)
    if plane is None:
        print("no TPU plane; planes:", [p.name for p in space.planes])
        return
    meta = plane.event_metadata

    # module spans (XLA Modules line) let us attribute ops to programs
    modules = []  # (start_ps, end_ps, name)
    for line in plane.lines:
        if line.name == "XLA Modules":
            for ev in line.events:
                nm = meta[ev.metadata_id].name
                modules.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, nm))
    modules.sort()

    def module_of(ts):
        for s, e, nm in modules:
            if s <= ts < e:
                return nm.split(".")[0]
        return "?"

    per_mod: dict = {}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            nm = meta[ev.metadata_id].name
            mod = module_of(ev.offset_ps)
            d = per_mod.setdefault(mod, {})
            rec = d.setdefault(nm, [0.0, 0])
            rec[0] += ev.duration_ps / 1e6  # ps -> us
            rec[1] += 1

    for mod, ops in sorted(per_mod.items(),
                           key=lambda kv: -sum(v[0] for v in kv[1].values())):
        total = sum(v[0] for v in ops.values())
        print(f"\n#### module {mod}: {total/1e3:.2f} ms device time, "
              f"{sum(v[1] for v in ops.values())} op executions")
        by_cat: dict = {}
        for nm, (t, n) in ops.items():
            c = by_cat.setdefault(_category(nm), [0.0, 0])
            c[0] += t
            c[1] += n
        print("  --- categories ---")
        for cat, (t, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0])[:12]:
            print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  {n:6d} execs  {cat}")
        print(f"  --- top {top} ops ---")
        for nm, (t, n) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top]:
            print(f"  {t/1e3:9.2f} ms  {n:5d}x  {nm[:100]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdeo_xplane"
    if os.environ.get("PARSE_ONLY") != "1":
        if os.environ.get("PROFILE_FAMILY") == "sdxl":
            capture_sdxl(outdir)
        elif os.environ.get("PROFILE_MODE") == "train":
            capture_train(outdir)
        elif os.environ.get("PROFILE_MODE") == "hires":
            capture_hires(outdir)
        elif os.environ.get("PROFILE_MODE") == "annotators":
            capture_annotators(outdir)
        else:
            capture(outdir)
    parse(outdir)
